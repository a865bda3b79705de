"""Batched small-linalg kernels vs LAPACK (SURVEY.md §7.4 hard part #3)."""

import numpy as np
import pytest

import jax.numpy as jnp

from overiva_tpu.ops.linalg import gauss_solve, small_inv


@pytest.mark.parametrize("m,k", [(2, 1), (3, 2), (8, 1), (8, 8), (5, 3)])
@pytest.mark.parametrize("dtype", [np.complex64, np.complex128])
def test_gauss_solve_matches_lapack(rng, m, k, dtype):
    F = 257
    A = (rng.standard_normal((F, m, m)) + 1j * rng.standard_normal((F, m, m))).astype(dtype)
    B = (rng.standard_normal((F, m, k)) + 1j * rng.standard_normal((F, m, k))).astype(dtype)
    X = np.asarray(gauss_solve(jnp.asarray(A), jnp.asarray(B)))
    Xref = np.linalg.solve(A.astype(np.complex128), B.astype(np.complex128))
    tol = 1e-4 if dtype == np.complex64 else 1e-10
    np.testing.assert_allclose(X, Xref, rtol=tol, atol=tol)


def test_gauss_solve_needs_pivoting(rng):
    """Zero leading pivot: fails without row exchanges."""
    F, m = 64, 4
    A = rng.standard_normal((F, m, m)) + 1j * rng.standard_normal((F, m, m))
    A[:, 0, 0] = 0.0
    b = rng.standard_normal((F, m, 1)) + 1j * rng.standard_normal((F, m, 1))
    X = np.asarray(gauss_solve(jnp.asarray(A), jnp.asarray(b)))
    np.testing.assert_allclose(X, np.linalg.solve(A, b), rtol=1e-9, atol=1e-9)


def test_small_inv(rng):
    F, m = 65, 6
    A = rng.standard_normal((F, m, m)) + 1j * rng.standard_normal((F, m, m))
    Ai = np.asarray(small_inv(jnp.asarray(A)))
    np.testing.assert_allclose(Ai @ A, np.tile(np.eye(m), (F, 1, 1)), atol=1e-9)


def test_gauss_solve_hermitian_psd(rng):
    """The hot-loop case: WV with V Hermitian PSD-weighted covariance."""
    F, m = 513, 8
    Xd = rng.standard_normal((200, F, m)) + 1j * rng.standard_normal((200, F, m))
    V = np.einsum("tfm,tfn->fmn", Xd, np.conj(Xd)) / 200
    W = np.tile(np.eye(m, dtype=complex), (F, 1, 1))
    WV = W @ V
    e = np.zeros((F, m, 1), complex)
    e[:, 2, 0] = 1.0
    X = np.asarray(gauss_solve(jnp.asarray(WV), jnp.asarray(e)))
    np.testing.assert_allclose(X, np.linalg.solve(WV, e), rtol=1e-8, atol=1e-10)
