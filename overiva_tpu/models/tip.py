"""T-IP core — joint dereverberation + separation with exact IP rows.

TPU twin of ``overiva_tpu/oracle/tip.py`` (derivation, provenance, and the
measured warm-start requirement there). Per epoch and per source: one
MJ-dimensional weighted covariance of the augmented input (MJ = M + M*taps
— an MXU-friendly (T, MJ) x (T, MJ) contraction per bin, unlike the
M<=8-tiny IVA wcov), the structured product [P; 0 I] @ V formed as a
(F, M, MJ) GEMM stacked on V's bottom rows (the identity block is free),
one batched MJ-dim :func:`gauss_solve`, and a scatter-free concat row
rebuild (docs/DESIGN.md §2b).

Sharding: bins are independent given phi — same single-psum family as
every other member (§3)."""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import lax

from ..ops.covariance import weighted_covariance_all
from ..ops.linalg import PRECISION, clamp_pow2, gauss_solve
from .overiva import demix
from .source_models import activations_from_power, power
from .tiss import augment_taps  # noqa: F401  (re-export for callers)

__all__ = ["tip_iterations", "_tip_epoch", "augment_taps"]

_EPS = 1e-15


def _tip_epoch(
    Xt, P, model, n_chan, axis_name=None, n_freq=None, bin_mask=None,
    n_src=None, wcov: str = "f32",
):
    """One T-IP epoch. Xt: (T, F, MJ); P: (F, M, MJ) top block."""
    T, F, MJ = Xt.shape
    M = n_chan
    N = M if n_src is None else n_src
    Y = demix(Xt, P)
    pw = power(Y[:, :, :N], bin_mask)
    if axis_name is not None:
        pw = lax.psum(pw, axis_name)
    _, phi = activations_from_power(pw, n_freq or F, model)
    phif = phi.astype(Y.real.dtype)
    if N < M:
        phif = jnp.concatenate(
            [phif, jnp.ones((T, M - N), phif.dtype)], axis=1
        )

    for k in range(M):
        # MJ-dim weighted covariance — unlike the M<=8 IVA wcov this is
        # genuinely MXU-sized, so the bf16/f32x3 serving tiers of
        # ops/covariance.py apply (wcov="f32" is the exact parity path).
        # Deliberately PER SOURCE inside the loop (not the all-K batched
        # pass the IP families hoist): the batched (M, F, MJ, MJ)
        # temporary is ~300 MB at the M=8/taps=5 benchmark shape, while
        # the helper's own A/B found K separate passes perf-neutral.
        V = weighted_covariance_all(Xt, phif[:, k : k + 1], wcov)[0]
        PV_top = jnp.einsum(
            "fmj,fjb->fmb", P, V, precision=PRECISION
        )  # (F, M, MJ)
        PV = jnp.concatenate([PV_top, V[:, M:, :]], axis=1)
        rhs = jnp.zeros((F, MJ, 1), Xt.dtype).at[:, k, 0].set(1.0)
        w = gauss_solve(PV, rhs)[:, :, 0]  # (F, MJ)
        # knife-edge guards (docs/DESIGN.md §4b): exact pow-2 clamp bounds
        # the solve output on near-singular bins, and the normalizer is
        # computed FROM THE DATA, not from V:
        #   w^H V w = (1/T) sum_t phi_t |w^H x_tilde|^2
        # — a sum of NON-NEGATIVE terms with zero cancellation. The
        # V-based quadratic form was tried first and is unusable at
        # MJ=48: legitimately deep nulls cancel it to rounding noise, so
        # a significant-bits gate froze healthy converged rows (a
        # systematic −2.4 dB median SIR at M=8), while the ungated form
        # amplified true dead bins ~1e19x and collapsed 6/20 instances
        # at 20 polish epochs. The data form resolves deep nulls down to
        # f32 underflow; only exactly-dead bins (denom == 0) keep the
        # previous row.
        w = clamp_pow2(w)
        yk = jnp.einsum("fa,tfa->tf", jnp.conj(w), Xt, precision=PRECISION)
        denom = (
            jnp.einsum(
                "t,tf->f", phif[:, k], jnp.abs(yk) ** 2, precision=PRECISION
            )
            / T
        )
        good = denom > 0.0
        w = w / jnp.sqrt(
            jnp.where(good, denom, 1.0)
        ).astype(w.real.dtype)[:, None]
        # re-clamp: an underflow-deep denominator could still push the
        # normalized row past f32 range (exact pow-2, healthy bins
        # untouched)
        w = clamp_pow2(w)
        row = jnp.where(good[:, None], jnp.conj(w), P[:, k, :])
        P = jnp.concatenate(
            [P[:, :k], row[:, None, :], P[:, k + 1 :]], axis=1
        )
    return P


@partial(
    jax.jit,
    static_argnames=(
        "n_iter", "model", "n_chan", "axis_name", "n_freq", "n_src", "wcov"
    ),
)
def tip_iterations(
    Xt,
    P,
    n_iter: int,
    model: str,
    n_chan: int,
    axis_name=None,
    n_freq=None,
    bin_mask=None,
    n_src=None,
    wcov: str = "f32",
):
    """Run n_iter fused T-IP epochs on the augmented input. Returns P."""
    return lax.fori_loop(
        0,
        n_iter,
        lambda _, p: _tip_epoch(
            Xt, p, model, n_chan, axis_name, n_freq, bin_mask, n_src, wcov
        ),
        P,
    )
