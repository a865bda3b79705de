"""PCA + AuxIVA core (trace-side). Mirrors the oracle
(``overiva_tpu/oracle/auxiva_pca.py``, SURVEY.md §2.3.5)."""

from __future__ import annotations

import jax.numpy as jnp

from ..ops.covariance import covariance
from ..ops.linalg import PRECISION, eigh
from .overiva import overiva_run

__all__ = ["pca", "auxiva_pca_run"]


def pca(X, n_src: int, return_basis: bool = False):
    """Per-bin projection onto the top-n_src principal subspace.

    X: (T, F, M) -> (T, F, n_src). Eigenvectors by descending eigenvalue, no
    whitening (matches the oracle's documented choice).
    """
    Cx = covariance(X)
    _, vecs = eigh(Cx)  # ascending
    E_top = vecs[:, :, ::-1][:, :, :n_src]  # (F, M, n_src)
    # deterministic phase (matches the oracle): largest-|.| component of each
    # eigenvector made real-positive, aligning the XLA and LAPACK bases
    idx = jnp.argmax(jnp.abs(E_top), axis=1)  # (F, n_src)
    anchor = jnp.take_along_axis(E_top, idx[:, None, :], axis=1)[:, 0, :]
    phase = anchor / jnp.maximum(jnp.abs(anchor), 1e-30).astype(E_top.real.dtype)
    E_top = E_top * jnp.conj(phase)[:, None, :]
    X_r = jnp.einsum("fmk,tfm->tfk", jnp.conj(E_top), X, precision=PRECISION)
    if return_basis:
        return X_r, E_top
    return X_r


def auxiva_pca_run(X, n_src: int, n_iter: int, model: str):
    """PCA reduce then determined AuxIVA. Returns (Y, W_reduced)."""
    M = X.shape[2]
    X_r = pca(X, n_src) if n_src < M else X
    return overiva_run(X_r, n_src, n_iter, model)
