"""Pallas TPU kernel: packed-MXU bf16 weighted covariance (single X pass).

DESIGN §2c r4 proved the exact-f32 single-pass epoch is a dead end on
this hardware — XLA's wcov sits on its *materialization* roofline
(phi·X written + re-read), and a VMEM kernel's per-bin (M, T)x(T, M)
products are 8x8 outputs, unusable MXU shapes, unless bins are PACKED
into the matmul dims at a waste factor of the packing width. At bf16
the packed compute is ~6x cheaper and the arithmetic flips: this kernel
is that "REAL single-pass lever is precision" variant, measured in
§2c r5.

Shape strategy (M = 8, BLOCK_BINS = 16 -> 128 MXU rows exactly):

- X is pre-transposed ONCE PER PROGRAM (it is loop-constant across
  epochs) into bf16 planes of shape (F_pad*M, T) — `pack_planes`. The
  per-epoch kernel reads ONLY these planes: one X pass, no phi-weighted
  HBM temporary ever exists (the weighted copy lives in VMEM).
- grid over F tiles of BLOCK_BINS bins: each tile loads A = (128, T)
  bf16 planes, forms the weighted copy in VMEM, and runs 4 real
  (128, T)x(T, 128) dot_generals per source with f32 accumulation —
  full-width MXU tiles. The (128, 128) product computes all cross-bin
  blocks; only the BLOCK_BINS diagonal (M, M) blocks are kept (the
  waste factor the §2c r4 arithmetic prices in).
- phi arrives pre-transposed (K, T) so the per-source weight row is a
  (1, T) slice (rank-1 vectors crash the Mosaic layout engine —
  ops/pallas_epoch.py notes).

Numerics match the XLA ``wcov="bf16"`` tier (same bf16 operand
rounding, f32 accumulation); tests/test_pallas_wcov.py gates both the
interpret-mode exactness vs an equivalent-rounding reference and the
mode's end-to-end quality bound alongside bf16's.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl

__all__ = ["BLOCK_BINS", "auto_block_bins", "pack_planes", "wcov_packed"]

BLOCK_BINS = 16  # bins per MXU tile at M=8 (16*8 = 128 rows exactly)


def auto_block_bins(m: int) -> int:
    """Bins packed per tile so the packed row count tracks the 128-wide
    MXU: 16 at M=8 (exact), 2 at the T-IP family's MJ=48 (96 rows)."""
    return max(1, 128 // int(m))


def pack_planes(X, block_bins: int | None = None):
    """(T, F, M) complex -> ((F_pad*M, T) bf16 re, im planes, F_pad).

    Replicate-pads F to a multiple of ``block_bins`` (same convention as
    the sharded bin padding — the padded bins' V blocks are sliced off by
    the caller). Done once per program: the planes are epoch-constant.
    """
    T, F, M = X.shape
    if block_bins is None:
        block_bins = auto_block_bins(M)
    Fp = -(-F // block_bins) * block_bins
    if Fp != F:
        X = jnp.concatenate(
            [X, jnp.repeat(X[:, -1:, :], Fp - F, axis=1)], axis=1
        )
    xr = jnp.transpose(jnp.real(X), (1, 2, 0)).reshape(Fp * M, T)
    xi = jnp.transpose(jnp.imag(X), (1, 2, 0)).reshape(Fp * M, T)
    return xr.astype(jnp.bfloat16), xi.astype(jnp.bfloat16), Fp


def _wcov_kernel(phi_ref, xr_ref, xi_ref, vr_ref, vi_ref, *, m, k_srcs, bf):
    ar = xr_ref[...]  # (bf*m, T) bf16
    ai = xi_ref[...]
    dn = (((1,), (1,)), ((), ()))  # contract on T without a transpose
    for k in range(k_srcs):
        w = phi_ref[k : k + 1, :].astype(jnp.bfloat16)  # (1, T)
        wr = ar * w
        wi = ai * w
        # V = (phi x) x^H in real planes, f32 accumulation on the MXU
        pr = lax.dot_general(
            wr, ar, dn, preferred_element_type=jnp.float32
        ) + lax.dot_general(wi, ai, dn, preferred_element_type=jnp.float32)
        pi = lax.dot_general(
            wi, ar, dn, preferred_element_type=jnp.float32
        ) - lax.dot_general(wr, ai, dn, preferred_element_type=jnp.float32)
        for j in range(bf):  # keep the diagonal (m, m) bin blocks
            sl = slice(j * m, (j + 1) * m)
            vr_ref[k, j, :, :] = pr[sl, sl]
            vi_ref[k, j, :, :] = pi[sl, sl]


@partial(jax.jit, static_argnames=("m", "interpret"))
def _wcov_packed_planes(xr, xi, phiT, m: int, interpret: bool = False):
    FpM, T = xr.shape
    K = phiT.shape[0]
    Fp = FpM // m
    bf = auto_block_bins(m)
    grid = (Fp // bf,)
    kernel = partial(_wcov_kernel, m=m, k_srcs=K, bf=bf)
    vr, vi = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((K, T), lambda i: (0, 0)),
            pl.BlockSpec((bf * m, T), lambda i: (i, 0)),
            pl.BlockSpec((bf * m, T), lambda i: (i, 0)),
        ],
        out_specs=[
            pl.BlockSpec((K, bf, m, m), lambda i: (0, i, 0, 0)),
            pl.BlockSpec((K, bf, m, m), lambda i: (0, i, 0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((K, Fp, m, m), jnp.float32),
            jax.ShapeDtypeStruct((K, Fp, m, m), jnp.float32),
        ],
        interpret=interpret,
    )(phiT, xr, xi)
    return vr, vi


def wcov_packed(xpack, phi, n_freq: int, n_frames: int, interpret=None):
    """All-source weighted covariances from pre-packed bf16 planes.

    xpack: (xr, xi, F_pad) from :func:`pack_planes` (computed once per
    program); phi: (T, K) f32; returns (K, n_freq, M, M) complex64 —
    drop-in for ``weighted_covariance_all(X, phi, "bf16")`` with one X
    pass and full-width MXU tiles instead of the XLA path's HBM
    phi-weighted temporary and 8x8 batched dots.
    """
    xr, xi, Fp = xpack
    m = xr.shape[0] // Fp
    if interpret is None:  # Mosaic lowering needs a real TPU backend
        interpret = jax.default_backend() not in ("tpu", "axon")
    vr, vi = _wcov_packed_planes(
        xr, xi, jnp.transpose(phi).astype(jnp.float32), m,
        interpret=bool(interpret),
    )
    V = (vr + 1j * vi).astype(jnp.complex64) / n_frames
    return V[:, :n_freq]
