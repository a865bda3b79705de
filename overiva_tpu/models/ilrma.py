"""ILRMA core — fused JAX iteration (trace-side).

TPU-native re-design of the ``pyroomacoustics.bss.ilrma`` baseline the
reference sweeps against (SURVEY.md §2.1; Kitamura et al. 2016, ILRMA1).
Mirrors the NumPy oracle (``overiva_tpu/oracle/ilrma.py``): per epoch and
per source, IS-NMF multiplicative updates of the rank-K variance model,
an iterative-projection update with per-(t,f) weights, and unit-power
rescaling. One XLA program for the whole run; the NMF matmuls
(F,K)@(K,T) batch naturally onto the MXU.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import lax

from ..ops.covariance import weighted_covariance_tf
from ..ops.linalg import PRECISION, solve_vec
from .overiva import demix

__all__ = ["ilrma_iterations"]

_EPS = 1e-15


@partial(jax.jit, static_argnames=("n_iter",))
def ilrma_iterations(X, W, B, H, n_iter: int):
    """X: (T,F,M); W: (F,M,M); B: (N,F,K) >= 0; H: (N,K,T) >= 0."""
    T, F, M = X.shape
    N = M

    def epoch(_, state):
        W, B, H = state
        Y = demix(X, W)
        P = jnp.abs(Y) ** 2  # (T, F, N)

        for k in range(N):
            Pk = P[:, :, k].T  # (F, T)
            Bk, Hk = B[k], H[k]
            R = jnp.matmul(Bk, Hk, precision=PRECISION) + _EPS

            Bk = Bk * jnp.sqrt(
                jnp.matmul(Pk / R**2, Hk.T, precision=PRECISION)
                / (jnp.matmul(1.0 / R, Hk.T, precision=PRECISION) + _EPS)
            )
            Bk = jnp.maximum(Bk, _EPS)
            R = jnp.matmul(Bk, Hk, precision=PRECISION) + _EPS
            Hk = Hk * jnp.sqrt(
                jnp.matmul(Bk.T, Pk / R**2, precision=PRECISION)
                / (jnp.matmul(Bk.T, 1.0 / R, precision=PRECISION) + _EPS)
            )
            Hk = jnp.maximum(Hk, _EPS)
            R = jnp.matmul(Bk, Hk, precision=PRECISION) + _EPS

            V = weighted_covariance_tf(X, (1.0 / R).T)
            WV = jnp.matmul(W, V, precision=PRECISION)
            e_k = jnp.zeros((M,), X.dtype).at[k].set(1.0)
            w = solve_vec(WV, jnp.broadcast_to(e_k, (F, M)))
            denom = jnp.einsum(
                "fm,fmn,fn->f", jnp.conj(w), V, w, precision=PRECISION
            )
            w = w / jnp.sqrt(jnp.real(denom)).astype(w.real.dtype)[:, None]

            yk = jnp.einsum("fm,tfm->tf", jnp.conj(w), X, precision=PRECISION)
            lam = jnp.sqrt(jnp.mean(jnp.abs(yk) ** 2)) + _EPS
            w = w / lam.astype(w.real.dtype)
            W = W.at[:, k, :].set(jnp.conj(w))
            B = B.at[k].set(Bk / (lam**2).astype(Bk.dtype))
            H = H.at[k].set(Hk)
            P = P.at[:, :, k].set(jnp.abs(yk / lam.astype(yk.real.dtype)) ** 2)

        return W, B, H

    W, B, H = lax.fori_loop(0, n_iter, epoch, (W, B, H))
    return W, B, H
