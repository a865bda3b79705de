"""OGIVE core — JAX ``lax.while_loop`` with in-graph early exit (trace-side).

TPU-native re-design of the reference's ``ive.py`` (SURVEY.md §2.3.4, §3.3):
thousands of cheap, fully bin-vectorized gradient steps run inside ONE XLA
while loop whose convergence predicate (max relative step < tol) is evaluated
on-device — no host sync per iteration. Update math mirrors the NumPy oracle
(``overiva_tpu/oracle/ogive.py``) exactly, including the orthogonal-constraint
couplings and the reconstructed switching criterion.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import lax

from ..ops.covariance import covariance
from ..ops.linalg import PRECISION, eigh, matvec, small_inv
from .source_models import activations_from_power, power

__all__ = ["ogive_init", "ogive_iterations", "ogive_demix"]


def _oc_a_from_w(w, Cx):
    v = matvec(Cx, w)
    lam = jnp.real(jnp.einsum("fm,fm->f", jnp.conj(w), v, precision=PRECISION))
    return v / lam.astype(v.real.dtype)[:, None]


def _oc_w_from_a(a, Cx_inv):
    v = matvec(Cx_inv, a)
    lam = jnp.real(jnp.einsum("fm,fm->f", jnp.conj(a), v, precision=PRECISION))
    return v / lam.astype(v.real.dtype)[:, None]


def _switch_mask(a, Cx, Cx_inv):
    """use-mix mask: target-dominant bins (MPDR power > mean channel power)."""
    M = Cx.shape[-1]
    sigma_s2 = 1.0 / jnp.real(
        jnp.einsum("fm,fmn,fn->f", jnp.conj(a), Cx_inv, a, precision=PRECISION)
    )
    mean_pow = jnp.real(jnp.trace(Cx, axis1=1, axis2=2)) / M
    return sigma_s2 > mean_pow


def ogive_init(X, init_eig: bool):
    """Initial (w, a, Cx, Cx_inv). w: (F, M) demixing vectors."""
    T, F, M = X.shape
    Cx = covariance(X)
    Cx_inv = small_inv(Cx)
    if init_eig:
        _, vecs = eigh(Cx)
        w = jnp.conj(vecs[:, :, -1])  # principal component, demix convention
    else:
        w = jnp.zeros((F, M), X.dtype).at[:, 0].set(1.0)
    a = _oc_a_from_w(w, Cx)
    return w, a, Cx, Cx_inv


def ogive_demix(X, w):
    """y[t,f] = w[f]^H x[t,f]."""
    return jnp.einsum("fm,tfm->tf", jnp.conj(w), X, precision=PRECISION)


@partial(
    jax.jit,
    static_argnames=(
        "n_iter", "model", "update", "switch_every", "axis_name", "n_freq",
        "done_pvary_axes",
    ),
)
def ogive_iterations(
    X,
    w,
    a,
    use_mix,
    Cx,
    Cx_inv,
    epoch0,
    step_size,
    tol,
    n_iter: int,
    model: str,
    update: str,
    switch_every: int = 10,
    axis_name=None,
    n_freq=None,
    bin_mask=None,
    done_pvary_axes: tuple = (),
):
    """Run up to ``n_iter`` more epochs (counting from ``epoch0``), stopping
    early when ``step_size * max_f ||step||/||w|| < tol``.

    Returns (w, a, use_mix, epoch, done). Chunk-resumable for callbacks: pass
    the returned state back in with a larger n_iter budget.

    ``axis_name``/``n_freq``/``bin_mask``: bin-sharded execution — the
    per-frame power is psum'd and the convergence max is pmax'd over the
    mesh axis; padded bins are masked out of both (SURVEY.md §2.4).
    """
    T, F, M = X.shape
    limit = epoch0 + n_iter

    def cond(state):
        _, _, _, epoch, done = state
        return jnp.logical_and(jnp.logical_not(done), epoch < limit)

    def body(state):
        w, a, use_mix, epoch, _ = state

        if update == "switching":
            use_mix = lax.cond(
                epoch % switch_every == 0,
                lambda: _switch_mask(a, Cx, Cx_inv),
                lambda: use_mix,
            )

        y = ogive_demix(X, w)
        pw = power(y[:, :, None], bin_mask)  # (T, 1) — partial when sharded
        if axis_name is not None:
            pw = lax.psum(pw, axis_name)
        _, phi = activations_from_power(pw, n_freq or F, model)  # (T, 1)
        wy = phi[:, 0].astype(y.real.dtype)[:, None] * jnp.conj(y)
        xi = jnp.einsum("tf,tfm->fm", wy, X, precision=PRECISION) / T
        nu = jnp.maximum(
            jnp.real(jnp.einsum("tf,tf->f", wy, y, precision=PRECISION)) / T,
            1e-30,
        )
        resid = a - xi / nu.astype(xi.real.dtype)[:, None]

        mu = step_size.astype(resid.real.dtype)
        if update == "demix":
            w_new = w + mu * resid
            a_new = _oc_a_from_w(w_new, Cx)
            step_norm = jnp.linalg.norm(resid, axis=1)
        elif update == "mix":
            delta_a = matvec(Cx_inv, resid)
            a_new = a + mu * delta_a
            w_new = _oc_w_from_a(a_new, Cx_inv)
            step_norm = jnp.linalg.norm(delta_a, axis=1)
        else:  # switching
            delta_a = matvec(Cx_inv, resid)
            w_d = w + mu * resid
            a_d = _oc_a_from_w(w_d, Cx)
            a_m = a + mu * delta_a
            w_m = _oc_w_from_a(a_m, Cx_inv)
            w_new = jnp.where(use_mix[:, None], w_m, w_d)
            a_new = jnp.where(use_mix[:, None], a_m, a_d)
            step_norm = jnp.where(
                use_mix,
                jnp.linalg.norm(delta_a, axis=1),
                jnp.linalg.norm(resid, axis=1),
            )

        rel_f = step_norm / jnp.maximum(jnp.linalg.norm(w_new, axis=1), 1e-30)
        if bin_mask is not None:
            rel_f = rel_f * bin_mask.astype(rel_f.dtype)
        rel = jnp.max(rel_f)
        if axis_name is not None:
            rel = lax.pmax(rel, axis_name)
        done = mu.real * rel < tol
        return (w_new, a_new, use_mix, epoch + 1, done)

    done0 = jnp.asarray(False)
    if done_pvary_axes:
        # under shard_map the loop-exit flag is collective-computed (pmax over
        # the bins axis) and therefore varies over the remaining mesh axes;
        # the initial carry must carry the same varying-axes type.
        done0 = lax.pcast(done0, done_pvary_axes, to="varying")
    state = (w, a, use_mix, epoch0, done0)
    return lax.while_loop(cond, body, state)
