"""Pallas fused update kernel vs NumPy reference (interpret mode on CPU)."""

import numpy as np
import pytest

import jax.numpy as jnp

from overiva_tpu.ops.pallas_epoch import BLOCK_F, pad_f, pallas_update_rows


def _numpy_update(X, phi, Cx, W, N):
    """Reference: per-source IP update + OC J update, given phi."""
    T, F, M = X.shape
    W = W.astype(np.complex128).copy()
    X = X.astype(np.complex128)
    Cx = Cx.astype(np.complex128)

    def update_J(W):
        tmp = W[:, :N, :] @ Cx
        JH = np.linalg.solve(tmp[:, :, :N], tmp[:, :, N:])
        W[:, N:, :N] = np.conj(np.swapaxes(JH, 1, 2))

    for k in range(N):
        V = np.einsum("t,tfm,tfn->fmn", phi[:, k].astype(np.float64), X, np.conj(X)) / T
        WV = W @ V
        e = np.zeros((M,), np.complex128)
        e[k] = 1
        w = np.linalg.solve(WV, np.tile(e, (F, 1))[:, :, None])[:, :, 0]
        den = np.real(np.einsum("fm,fmn,fn->f", np.conj(w), V, w))
        w = w / np.sqrt(den)[:, None]
        W[:, k, :] = np.conj(w)
        if N < M:
            update_J(W)
    return W


@pytest.mark.parametrize("M,N", [(5, 2), (4, 4), (8, 3)])
def test_kernel_matches_numpy(M, N):
    T, F = 16, BLOCK_F
    rng = np.random.default_rng(7)
    X = (rng.standard_normal((T, F, M)) + 1j * rng.standard_normal((T, F, M))).astype(
        np.complex64
    )
    phi = (rng.random((T, N)) + 0.1).astype(np.float32)
    Cx = (np.einsum("tfm,tfn->fmn", X, np.conj(X)) / T).astype(np.complex64)
    W = np.tile(np.eye(M, dtype=np.complex64), (F, 1, 1))
    if N < M:
        W[:, N:, N:] = -np.eye(M - N, dtype=np.complex64)
        tmp = W[:, :N, :] @ Cx
        JH = np.linalg.solve(tmp[:, :, :N], tmp[:, :, N:])
        W[:, N:, :N] = np.conj(np.swapaxes(JH, 1, 2))

    Wref = _numpy_update(X, phi, Cx, W, N)
    Wr, Wi = pallas_update_rows(
        jnp.asarray(phi),
        jnp.asarray(X.real),
        jnp.asarray(X.imag),
        jnp.asarray(Cx.real),
        jnp.asarray(Cx.imag),
        jnp.asarray(W.real.astype(np.float32)),
        jnp.asarray(W.imag.astype(np.float32)),
        n_src=N,
        interpret=True,
    )
    Wp = np.asarray(Wr) + 1j * np.asarray(Wi)
    rel = np.abs(Wp - Wref).max() / np.abs(Wref).max()
    assert rel < 1e-5, rel


def test_pad_f():
    assert pad_f(2049) % BLOCK_F == 0
    assert pad_f(BLOCK_F) == BLOCK_F
