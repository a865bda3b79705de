"""Packed-MXU bf16 weighted covariance (ops/pallas_wcov.py), interpret mode.

The kernel must agree with the XLA ``wcov="bf16"`` tier (same operand
rounding, f32 accumulation) up to reduction order, and with the exact
f32 covariance up to the bf16 operand-rounding bound.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from overiva_tpu.ops.covariance import weighted_covariance_all
from overiva_tpu.ops.pallas_wcov import BLOCK_BINS, pack_planes, wcov_packed


@pytest.mark.parametrize("m", [4, 8])
@pytest.mark.parametrize("f", [40, 129])
def test_wcov_packed_matches_bf16_tier(m, f):
    rng = np.random.default_rng(3)
    T, K = 64, 3
    X = (
        rng.standard_normal((T, f, m)) + 1j * rng.standard_normal((T, f, m))
    ).astype(np.complex64)
    phi = (rng.random((T, K)) + 0.1).astype(np.float32)

    xpack = pack_planes(jnp.asarray(X))
    V = np.asarray(wcov_packed(xpack, jnp.asarray(phi), f, T, interpret=True))
    assert V.shape == (K, f, m, m)

    V16 = np.asarray(weighted_covariance_all(jnp.asarray(X), jnp.asarray(phi), "bf16"))
    Vf32 = np.asarray(weighted_covariance_all(jnp.asarray(X), jnp.asarray(phi), "f32"))

    scale = np.abs(Vf32).max()
    # vs the XLA bf16 tier: identical operand rounding, different
    # reduction order only
    np.testing.assert_allclose(V, V16, rtol=0, atol=2e-3 * scale)
    # vs exact f32: inside the bf16 operand-rounding bound
    np.testing.assert_allclose(V, Vf32, rtol=0, atol=2e-2 * scale)
    # Hermitian structure preserved per bin
    np.testing.assert_allclose(
        V, np.conj(np.swapaxes(V, 2, 3)), rtol=0, atol=2e-3 * scale
    )


def test_pack_planes_padding_roundtrip():
    rng = np.random.default_rng(5)
    T, F, M = 16, 33, 8  # 33 -> pads to 48
    X = (
        rng.standard_normal((T, F, M)) + 1j * rng.standard_normal((T, F, M))
    ).astype(np.complex64)
    xr, xi, Fp = pack_planes(jnp.asarray(X))
    assert Fp % BLOCK_BINS == 0 and Fp >= F
    assert xr.shape == (Fp * M, T) and xr.dtype == jnp.bfloat16
    # plane content: bin f, mic m row holds X[:, f, m]
    got = np.asarray(xr).reshape(Fp, M, T)[5, 3]
    np.testing.assert_allclose(
        got, np.real(X[:, 5, 3]).astype(np.float32), rtol=0, atol=8e-3
    )
