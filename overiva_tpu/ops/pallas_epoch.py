"""Pallas TPU kernel: fused OverIVA per-bin update phase. [SHELVED]

STATUS (round 2): demoted to validated reference material — not on any
production path. The round-1 motivation was the ~60x gap between the XLA
iteration (5.2 ms) and the HBM roofline; the bin-minor layout + scatter-free
update rewrite (docs/DESIGN.md §2b) closed that to 0.44 ms/iter in plain
XLA, leaving a best-case ~1.5x for a fused kernel against 5-10+ minute
Mosaic compiles per shape in this environment (docs/DESIGN.md §5). The
interpret-mode parity tests (tests/test_pallas_epoch.py) keep it honest.

One grid pass over frequency-bin blocks performs, entirely in VMEM, for each
source k: the phi-weighted covariance V_k, WV = W_hat @ V_k, the Gauss-Jordan
solve for the new demixing row, its normalization, and the orthogonal-
constraint J update (SURVEY.md §3.2 — everything in the epoch after the
activations). The cross-bin part (demix + per-frame power -> phi) stays in
jnp outside the kernel: it is the only quantity coupling bins, and it is
tiny.

Mosaic-lowering constraints shape the code:
- complex is carried as (real, imag) float32 planes (no complex vregs);
- no scatter/gather/concat/transpose on values — small-matrix assembly uses
  broadcasted-iota masks, static-index ref stores, and keepdims reductions
  (rank-1 vectors crash the layout engine; argmax is replaced by a
  keepdims-max first-occurrence mask);
- all working matrices live in scratch refs updated in place: a purely
  functional formulation keeps every unrolled intermediate alive and
  overflows the VMEM stack.

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


def _col_mask(shape, axis, j):
    return (jax.lax.broadcasted_iota(jnp.int32, shape, axis) == j).astype(
        jnp.float32
    )


def _first_max_mask(mag):
    """(BF, m) one-hot of the first row-wise max (layout-safe argmax)."""
    m = mag.shape[1]
    maxv = jnp.max(mag, axis=1, keepdims=True)
    eq = (mag >= maxv).astype(jnp.float32)
    taken = jnp.zeros_like(maxv)
    out = jnp.zeros_like(mag)
    for j in range(m):
        c = eq[:, j : j + 1] * (1.0 - taken)
        taken = jnp.minimum(taken + c, 1.0)
        out = out + c * _col_mask(mag.shape, 1, j)
    return out


def _gauss_solve_refs(ar_s, ai_s, br_s, bi_s, m: int, k: int):
    """In-place Gauss-Jordan on scratch tableau refs.

    A lives in ar_s/ai_s[:, :m, :m], RHS in br_s/bi_s[:, :m, :k]. Afterwards
    the solution is extracted with the saved pivot masks. Returns
    (Xr, Xi): (BF, m, k) values.
    """
    sels = []
    for i in range(m):
        Ar = ar_s[:, :m, :m]
        Ai = ai_s[:, :m, :m]
        Br = br_s[:, :m, :k]
        Bi = bi_s[:, :m, :k]
        colr = Ar[:, :, i]  # (BF, m) — static slice, stays 2-D
        coli = Ai[:, :, i]
        mag = colr * colr + coli * coli
        for s in sels:  # exclude already-used pivot rows
            mag = mag - s * (mag + 1.0)
        sel = _first_max_mask(mag)
        sels.append(sel)

        s3 = sel[:, :, None]
        pivAr = jnp.sum(s3 * Ar, axis=1)  # (BF, m)
        pivAi = jnp.sum(s3 * Ai, axis=1)
        pivBr = jnp.sum(s3 * Br, axis=1)  # (BF, k)
        pivBi = jnp.sum(s3 * Bi, axis=1)
        pr = jnp.sum(sel * colr, axis=1, keepdims=True)  # (BF, 1)
        pi_ = jnp.sum(sel * coli, axis=1, keepdims=True)
        den = pr * pr + pi_ * pi_
        inv = 1.0 / jnp.where(den > 0.0, den, 1.0)
        nAr = (pivAr * pr + pivAi * pi_) * inv  # normalized pivot row
        nAi = (pivAi * pr - pivAr * pi_) * inv
        nBr = (pivBr * pr + pivBi * pi_) * inv
        nBi = (pivBi * pr - pivBr * pi_) * inv

        fr = (1.0 - sel) * colr  # elimination factors
        fi = (1.0 - sel) * coli
        fr3 = fr[:, :, None]
        fi3 = fi[:, :, None]
        one = 1.0 - s3
        ar_s[:, :m, :m] = (
            Ar - (fr3 * nAr[:, None, :] - fi3 * nAi[:, None, :])
        ) * one + s3 * nAr[:, None, :]
        ai_s[:, :m, :m] = (
            Ai - (fr3 * nAi[:, None, :] + fi3 * nAr[:, None, :])
        ) * one + s3 * nAi[:, None, :]
        br_s[:, :m, :k] = (
            Br - (fr3 * nBr[:, None, :] - fi3 * nBi[:, None, :])
        ) * one + s3 * nBr[:, None, :]
        bi_s[:, :m, :k] = (
            Bi - (fr3 * nBi[:, None, :] + fi3 * nBr[:, None, :])
        ) * one + s3 * nBi[:, None, :]

    Br = br_s[:, :m, :k]
    Bi = bi_s[:, :m, :k]
    Xr = jnp.zeros_like(Br)
    Xi = jnp.zeros_like(Bi)
    for i, sel in enumerate(sels):
        rowm = _col_mask(Br.shape, 1, i)
        Xr = Xr + rowm * jnp.sum(sel[:, :, None] * Br, axis=1)[:, None, :]
        Xi = Xi + rowm * jnp.sum(sel[:, :, None] * Bi, axis=1)[:, None, :]
    return Xr, Xi


def _make_kernel(T: int, M: int, N: int):
    def kernel(
        phi_ref, xr_ref, xi_ref, cr_ref, ci_ref, wr_in, wi_in,
        wr_out, wi_out,
        vr_s, vi_s, ar_s, ai_s, br_s, bi_s, xwr_s, xwi_s,
    ):
        # working demixing matrix lives in the (input-aliased) output refs
        wr_out[:] = wr_in[:]
        wi_out[:] = wi_in[:]
        inv_T = 1.0 / T

        def matmul_into(ar, ai, Ar, Ai, Br, Bi, m, l, n):
            """ar[:, :m, :n] = (A @ B) for (BF,m,l)@(BF,l,n) value operands.

            Contracts as an l-step broadcast FMA: A's column t (BF, m, 1)
            times B's row t (BF, 1, n) — static slices stay >= 2-D."""
            accr = jnp.zeros((Ar.shape[0], m, n), jnp.float32)
            acci = jnp.zeros((Ai.shape[0], m, n), jnp.float32)
            for t in range(l):
                acr = Ar[:, :m, t : t + 1]  # (BF, m, 1)
                aci = Ai[:, :m, t : t + 1]
                brr = Br[:, t : t + 1, :n]  # (BF, 1, n)
                bri = Bi[:, t : t + 1, :n]
                accr = accr + (acr * brr - aci * bri)
                acci = acci + (acr * bri + aci * brr)
            ar[:, :m, :n] = accr
            ai[:, :m, :n] = acci

        def update_J():
            # tmp = W1 @ Cx into the tableau scratch (A part cols :N, rhs N:)
            W1r = wr_out[:, :N, :]
            W1i = wi_out[:, :N, :]
            Cr = cr_ref[:]
            Ci = ci_ref[:]
            tr = jnp.zeros((W1r.shape[0], N, M), jnp.float32)
            ti = jnp.zeros((W1i.shape[0], N, M), jnp.float32)
            for t in range(M):
                acr = W1r[:, :, t : t + 1]
                aci = W1i[:, :, t : t + 1]
                brr = Cr[:, t : t + 1, :]
                bri = Ci[:, t : t + 1, :]
                tr = tr + (acr * brr - aci * bri)
                ti = ti + (acr * bri + aci * brr)
            ar_s[:, :N, :N] = tr[:, :, :N]
            ai_s[:, :N, :N] = ti[:, :, :N]
            br_s[:, :N, : M - N] = tr[:, :, N:]
            bi_s[:, :N, : M - N] = ti[:, :, N:]
            JHr, JHi = _gauss_solve_refs(ar_s, ai_s, br_s, bi_s, N, M - N)
            # W[N+r, c] = conj(JH[c, r])
            for r_ in range(M - N):
                for c_ in range(N):
                    wr_out[:, N + r_ : N + r_ + 1, c_ : c_ + 1] = JHr[
                        :, c_ : c_ + 1, r_ : r_ + 1
                    ]
                    wi_out[:, N + r_ : N + r_ + 1, c_ : c_ + 1] = -JHi[
                        :, c_ : c_ + 1, r_ : r_ + 1
                    ]

        for k in range(N):
            ph = phi_ref[:, k : k + 1][:, :, None]  # (T, 1, 1)
            xwr_s[:] = xr_ref[:] * ph
            xwi_s[:] = xi_ref[:] * ph
            # V[:, :, n] = (1/T) sum_t Xw[t,:,:] * conj(X[t,:,n])
            for n_ in range(M):
                bxr = xr_ref[:, :, n_ : n_ + 1]  # (T, BF, 1)
                bxi = xi_ref[:, :, n_ : n_ + 1]
                rr = jnp.sum(xwr_s[:] * bxr + xwi_s[:] * bxi, axis=0) * inv_T
                ii = jnp.sum(xwi_s[:] * bxr - xwr_s[:] * bxi, axis=0) * inv_T
                vr_s[:, :, n_ : n_ + 1] = rr[:, :, None]
                vi_s[:, :, n_ : n_ + 1] = ii[:, :, None]

            # tableau: A = W @ V, rhs = e_k
            matmul_into(ar_s, ai_s, wr_out[:], wi_out[:], vr_s[:], vi_s[:], M, M, M)
            br_s[:, :, 0:1] = _col_mask((wr_out.shape[0], M, 1), 1, k)
            bi_s[:, :, 0:1] = jnp.zeros((wr_out.shape[0], M, 1), jnp.float32)
            wr_, wi_ = _gauss_solve_refs(ar_s, ai_s, br_s, bi_s, M, 1)
            wr_, wi_ = wr_[:, :, 0], wi_[:, :, 0]  # (BF, M)

            # denom = w^H V w
            Vr = vr_s[:]
            Vi = vi_s[:]
            vwr = jnp.sum(Vr * wr_[:, None, :], axis=2) - jnp.sum(
                Vi * wi_[:, None, :], axis=2
            )
            vwi = jnp.sum(Vr * wi_[:, None, :], axis=2) + jnp.sum(
                Vi * wr_[:, None, :], axis=2
            )
            den = jnp.sum(wr_ * vwr + wi_ * vwi, axis=1, keepdims=True)
            scale = jax.lax.rsqrt(jnp.maximum(den, 1e-30))
            wr_ = wr_ * scale
            wi_ = wi_ * scale

            # W[k, :] = conj(w)
            wr_out[:, k : k + 1, :] = wr_[:, None, :]
            wi_out[:, k : k + 1, :] = -wi_[:, None, :]
            if N < M:
                update_J()

    return kernel


@functools.partial(jax.jit, static_argnames=("n_src", "interpret"))
def pallas_update_rows(phi, Xr, Xi, Cr, Ci, Wr, Wi, n_src: int, interpret: bool = False):
    """Run the fused per-bin update over all bin blocks.

    phi: (T, N) f32; Xr/Xi: (T, F_pad, M); Cr/Ci, Wr/Wi: (F_pad, M, M) with
    F_pad a multiple of BLOCK_F. Returns updated (Wr, Wi).
    """
    T, F_pad, M = Xr.shape
    N = n_src
    RHS = max(1, M - N)
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
        scratch_shapes=[
            pltpu.VMEM((BLOCK_F, M, M), jnp.float32),  # vr
            pltpu.VMEM((BLOCK_F, M, M), jnp.float32),  # vi
            pltpu.VMEM((BLOCK_F, M, M), jnp.float32),  # tableau A re
            pltpu.VMEM((BLOCK_F, M, M), jnp.float32),  # tableau A im
            pltpu.VMEM((BLOCK_F, M, RHS), jnp.float32),  # tableau B re
            pltpu.VMEM((BLOCK_F, M, RHS), jnp.float32),  # tableau B im
            pltpu.VMEM((T, BLOCK_F, M), jnp.float32),  # Xw re
            pltpu.VMEM((T, BLOCK_F, M), jnp.float32),  # Xw im
        ],
        input_output_aliases={5: 0, 6: 1},
        interpret=interpret,
    )(phi, Xr, Xi, Cr, Ci, Wr, Wi)
    return out
