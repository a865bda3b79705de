"""Pallas TPU kernel: fused OverIVA per-bin update phase.

One grid pass over frequency-bin blocks performs, entirely in VMEM, for each
source k: the phi-weighted covariance V_k, WV = W_hat @ V_k, the Gauss-Jordan
solve for the new demixing row, its normalization, and the orthogonal-
constraint J update (SURVEY.md §3.2 — everything in the epoch after the
activations). The cross-bin part (demix + per-frame power -> phi) stays in
jnp outside the kernel: it is the only quantity coupling bins, and it is
tiny.

Mosaic-lowering constraints shape the code: complex is carried as
(real, imag) float32 planes (no complex vregs), and there are NO scatters,
gathers, concatenates, stacks or transposes — small-matrix assembly is done
with broadcasted-iota masks and accumulation, and the Gauss-Jordan solver
keeps its A and RHS tableaus as separate arrays.

Bin blocks are BF=128 wide; callers pad F by replicating the last bin
(well-conditioned updates in the padding, results sliced off afterwards).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["pallas_update_rows", "BLOCK_F", "pad_f"]

BLOCK_F = 128


def pad_f(F: int) -> int:
    return -(-F // BLOCK_F) * BLOCK_F


def _cmul(ar, ai, br, bi):
    return ar * br - ai * bi, ar * bi + ai * br


def _col_mask(shape, axis, j):
    """Float one-hot mask along ``axis`` of ``shape`` selecting index j."""
    return (jax.lax.broadcasted_iota(jnp.int32, shape, axis) == j).astype(
        jnp.float32
    )


def _first_max_mask(mag):
    """(BF, m) float one-hot of the first occurrence of the row-wise max.

    argmax produces rank-1 vectors that crash the Mosaic layout engine;
    a keepdims max + unrolled first-occurrence scan stays 2-D throughout.
    """
    m = mag.shape[1]
    maxv = jnp.max(mag, axis=1, keepdims=True)
    eq = (mag >= maxv).astype(jnp.float32)
    taken = jnp.zeros_like(maxv)
    cols = []
    for j in range(m):
        c = eq[:, j : j + 1] * (1.0 - taken)
        cols.append(c)
        taken = jnp.minimum(taken + c, 1.0)
    out = jnp.zeros_like(mag)
    for j, c in enumerate(cols):
        out = out + c * _col_mask(mag.shape, 1, j)
    return out


def _gauss_solve_planes(Ar, Ai, Br, Bi, m: int, k: int):
    """Masked-pivot Gauss-Jordan on float planes, A and RHS kept separate.

    Ar/Ai: (BF, m, m), Br/Bi: (BF, m, k) -> (Xr, Xi): (BF, m, k).
    """
    BF = Ar.shape[0]
    avail = jnp.ones((BF, m), jnp.float32)
    Xr = jnp.zeros((BF, m, k), jnp.float32)
    Xi = jnp.zeros((BF, m, k), jnp.float32)
    sels = []
    for i in range(m):
        colr = jnp.sum(Ar * _col_mask(Ar.shape, 2, i), axis=2)  # (BF, m)
        coli = jnp.sum(Ai * _col_mask(Ai.shape, 2, i), axis=2)
        mag = jnp.where(avail > 0.5, colr * colr + coli * coli, -1.0)
        sel = _first_max_mask(mag)
        sels.append(sel)

        pivAr = jnp.sum(sel[:, :, None] * Ar, axis=1)  # (BF, m)
        pivAi = jnp.sum(sel[:, :, None] * Ai, axis=1)
        pivBr = jnp.sum(sel[:, :, None] * Br, axis=1)  # (BF, k)
        pivBi = jnp.sum(sel[:, :, None] * Bi, axis=1)
        pr = jnp.sum(sel * colr, axis=1, keepdims=True)  # pivot element (BF,1)
        pi_ = jnp.sum(sel * coli, axis=1, keepdims=True)
        den = pr * pr + pi_ * pi_
        inv = 1.0 / jnp.where(den > 0.0, den, 1.0)
        # normalized pivot row: piv / pivot
        nAr = (pivAr * pr + pivAi * pi_) * inv
        nAi = (pivAi * pr - pivAr * pi_) * inv
        nBr = (pivBr * pr + pivBi * pi_) * inv
        nBi = (pivBi * pr - pivBr * pi_) * inv

        fr = (1.0 - sel) * colr  # elimination factors, zero at pivot row
        fi = (1.0 - sel) * coli
        er, ei = _cmul(fr[:, :, None], fi[:, :, None], nAr[:, None, :], nAi[:, None, :])
        Ar, Ai = Ar - er, Ai - ei
        er, ei = _cmul(fr[:, :, None], fi[:, :, None], nBr[:, None, :], nBi[:, None, :])
        Br, Bi = Br - er, Bi - ei
        s3 = sel[:, :, None]
        Ar = s3 * nAr[:, None, :] + (1.0 - s3) * Ar
        Ai = s3 * nAi[:, None, :] + (1.0 - s3) * Ai
        Br = s3 * nBr[:, None, :] + (1.0 - s3) * Br
        Bi = s3 * nBi[:, None, :] + (1.0 - s3) * Bi
        avail = avail * (1.0 - sel)

    for i, sel in enumerate(sels):
        rowm = _col_mask((BF, m, k), 1, i)
        Xr = Xr + rowm * jnp.sum(sel[:, :, None] * Br, axis=1)[:, None, :]
        Xi = Xi + rowm * jnp.sum(sel[:, :, None] * Bi, axis=1)[:, None, :]
    return Xr, Xi


def _matmul_planes(Ar, Ai, Br, Bi, m: int, l: int, n: int):
    """(BF, m, l) @ (BF, l, n) on planes; output assembled with column masks."""
    BF = Ar.shape[0]
    outr = jnp.zeros((BF, m, n), jnp.float32)
    outi = jnp.zeros((BF, m, n), jnp.float32)
    for j in range(n):
        accr = jnp.zeros((BF, m), jnp.float32)
        acci = jnp.zeros((BF, m), jnp.float32)
        for t in range(l):
            bsel = _col_mask(Br.shape, 2, j) * _col_mask(Br.shape, 1, t)
            bcr = jnp.sum(Br * bsel, axis=2, keepdims=False).sum(axis=1, keepdims=True)
            bci = jnp.sum(Bi * bsel, axis=2, keepdims=False).sum(axis=1, keepdims=True)
            act_r = jnp.sum(Ar * _col_mask(Ar.shape, 2, t), axis=2)
            act_i = jnp.sum(Ai * _col_mask(Ai.shape, 2, t), axis=2)
            r, i_ = _cmul(act_r, act_i, bcr, bci)
            accr = accr + r
            acci = acci + i_
        cm = _col_mask((BF, m, n), 2, j)
        outr = outr + cm * accr[:, :, None]
        outi = outi + cm * acci[:, :, None]
    return outr, outi


def _make_kernel(T: int, M: int, N: int):
    def kernel(phi_ref, xr_ref, xi_ref, cr_ref, ci_ref, wr_in, wi_in, wr_out, wi_out):
        Wr = wr_in[:]
        Wi = wi_in[:]
        Xr = xr_ref[:]  # (T, BF, M)
        Xi = xi_ref[:]
        Cr = cr_ref[:]  # (BF, M, M)
        Ci = ci_ref[:]
        BF = Wr.shape[0]
        inv_T = 1.0 / T

        def update_J(Wr, Wi):
            # tmp = W1 @ Cx: select W1 rows via masks inside _matmul_planes'
            # row dimension by zeroing rows >= N first (they don't matter).
            row_lt_N = (
                jax.lax.broadcasted_iota(jnp.int32, Wr.shape, 1) < N
            ).astype(jnp.float32)
            tr, ti = _matmul_planes(Wr * row_lt_N, Wi * row_lt_N, Cr, Ci, M, M, M)
            # A = tmp[:, :N, :N], B = tmp[:, :N, N:] — emulate by masking:
            # gauss solve works on (BF, N, N) and (BF, N, M-N) slabs; build
            # them by summed extraction (no slicing of lane dims needed for
            # the sublane axis; lane-axis slice is static and allowed).
            Ar = tr[:, :N, :N]
            Ai = ti[:, :N, :N]
            Br = tr[:, :N, N:]
            Bi = ti[:, :N, N:]
            JHr, JHi = _gauss_solve_planes(Ar, Ai, Br, Bi, N, M - N)
            # place J = (JH)^H into rows N.., cols :N via mask accumulation
            newr = jnp.zeros_like(Wr)
            newi = jnp.zeros_like(Wi)
            for r_ in range(M - N):
                for c_ in range(N):
                    jsel = _col_mask(JHr.shape, 1, c_) * _col_mask(JHr.shape, 2, r_)
                    val_r = jnp.sum(JHr * jsel, axis=2).sum(axis=1, keepdims=True)
                    val_i = jnp.sum(JHi * jsel, axis=2).sum(axis=1, keepdims=True)
                    mask = _col_mask(Wr.shape, 1, N + r_) * _col_mask(Wr.shape, 2, c_)
                    newr = newr + mask * val_r[:, :, None]
                    newi = newi - mask * val_i[:, :, None]  # conjugate
            jmask = (
                (jax.lax.broadcasted_iota(jnp.int32, Wr.shape, 1) >= N)
                & (jax.lax.broadcasted_iota(jnp.int32, Wr.shape, 2) < N)
            ).astype(jnp.float32)
            Wr = Wr * (1.0 - jmask) + newr
            Wi = Wi * (1.0 - jmask) + newi
            return Wr, Wi

        for k in range(N):
            ph = phi_ref[:, k : k + 1][:, :, None]  # (T, 1, 1)
            Xwr = Xr * ph
            Xwi = Xi * ph
            # V[b, m, n] = (1/T) sum_t Xw[t,b,m] conj(X[t,b,n])
            Vr = jnp.zeros((BF, M, M), jnp.float32)
            Vi = jnp.zeros((BF, M, M), jnp.float32)
            for n_ in range(M):
                bxr = jnp.sum(Xr * _col_mask(Xr.shape, 2, n_), axis=2)  # (T, BF)
                bxi = jnp.sum(Xi * _col_mask(Xi.shape, 2, n_), axis=2)
                # a * conj(b)
                rr = Xwr * bxr[:, :, None] + Xwi * bxi[:, :, None]
                ii = Xwi * bxr[:, :, None] - Xwr * bxi[:, :, None]
                cm = _col_mask((BF, M, M), 2, n_)
                Vr = Vr + cm * (jnp.sum(rr, axis=0) * inv_T)[:, :, None]
                Vi = Vi + cm * (jnp.sum(ii, axis=0) * inv_T)[:, :, None]

            WVr, WVi = _matmul_planes(Wr, Wi, Vr, Vi, M, M, M)
            er = _col_mask((BF, M, 1), 1, k)
            ei = jnp.zeros_like(er)
            wr_, wi_ = _gauss_solve_planes(WVr, WVi, er, ei, M, 1)
            wr_, wi_ = wr_[:, :, 0], wi_[:, :, 0]  # (BF, M)

            Vwr, Vwi = _matmul_planes(Vr, Vi, wr_[:, :, None], wi_[:, :, None], M, M, 1)
            den = jnp.sum(
                wr_ * Vwr[:, :, 0] + wi_ * Vwi[:, :, 0], axis=1, keepdims=True
            )
            scale = jax.lax.rsqrt(jnp.maximum(den, 1e-30))
            wr_ = wr_ * scale
            wi_ = wi_ * scale

            rowm = _col_mask(Wr.shape, 1, k)
            Wr = Wr * (1.0 - rowm) + rowm * wr_[:, None, :]
            Wi = Wi * (1.0 - rowm) - rowm * wi_[:, None, :]  # conj(w)
            if N < M:
                Wr, Wi = update_J(Wr, Wi)

        wr_out[:] = Wr
        wi_out[:] = Wi

    return kernel


@functools.partial(jax.jit, static_argnames=("n_src", "interpret"))
def pallas_update_rows(phi, Xr, Xi, Cr, Ci, Wr, Wi, n_src: int, interpret: bool = False):
    """Run the fused per-bin update over all bin blocks.

    phi: (T, N) f32; Xr/Xi: (T, F_pad, M); Cr/Ci, Wr/Wi: (F_pad, M, M) with
    F_pad a multiple of BLOCK_F. Returns updated (Wr, Wi).
    """
    T, F_pad, M = Xr.shape
    N = n_src
    grid = (F_pad // BLOCK_F,)
    kernel = _make_kernel(T, M, N)
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((T, N), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((T, BLOCK_F, M), lambda i: (0, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((T, BLOCK_F, M), lambda i: (0, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((BLOCK_F, M, M), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((BLOCK_F, M, M), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((BLOCK_F, M, M), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((BLOCK_F, M, M), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=(
            jax.ShapeDtypeStruct((F_pad, M, M), jnp.float32),
            jax.ShapeDtypeStruct((F_pad, M, M), jnp.float32),
        ),
        out_specs=(
            pl.BlockSpec((BLOCK_F, M, M), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((BLOCK_F, M, M), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ),
        input_output_aliases={5: 0, 6: 1},
        interpret=interpret,
    )(phi, Xr, Xi, Cr, Ci, Wr, Wi)
    return out
