"""Online (streaming) T-ISS core — joint dereverb + separation per block.

Streaming twin of ``models/tiss.py`` in the style of ``models/online_iss.py``
(EW-forgotten steering statistics, rank-1 passes per block), built to answer
the measured-negative OnlineWPE -> OnlineAuxIVAISS cascade
(docs/DESIGN.md §7): there the dereverber's per-block re-solve keeps the
effective channel time-varying under the downstream tracker. Here the taps
live INSIDE the one demixing optimization.

Two tap-update modes, both measured on the 3-seed streaming scene (see the
class docstring in api.py for the numbers):

- ``tap_update="steer"``: EW rank-1 steering per delayed column — the
  literal online analog of the batch tap steps. MEASURED NEGATIVE: the
  steering statistics are built from the RESIDUAL outputs y, which move
  every time a tap column is updated, so the EW sums mix incompatible
  residual generations and the full per-block correction over-subtracts.
- ``tap_update="solve"`` (default): the tap row is re-derived each block
  from STATIONARY statistics — EW sums of the raw delayed inputs
  Rz_m = E[phi_m z z^H] and the instantaneous target
  rp_m = E[phi_m (W_m x) z^H] — via U_m = -rp_m Rz_m^{-1} (per source,
  per bin; trace-relative diagonal load). Nothing in these statistics
  depends on U itself, so there is no residual feedback loop; they drift
  only as slowly as W and phi.

Source steps stay FROZEN-Y within a pass (the shipped online-ISS
convention): the batch-faithful incremental-Y variant was built first and
measured much worse online (last-4s SIR 0.6-1.3 vs 1.3-7.4 dB on the same
scene) — with EW-accumulated statistics, folding the block's own
partially-steered outputs back into the same block's later steps
self-reinforces.

Statistics accumulate ONCE PER PASS (also the online-ISS convention):
with n_pass > 1 each block's data enters the EW sums n_pass times and
the forgetting factor applies n_pass times per block, so the effective
per-block decay is forget**n_pass (tap stats: tap_forget**n_pass). The
measured defaults (n_pass=2 in bench/streaming_ab.py) include this —
retune forget if you change n_pass.

State per stream (all device-resident):
  P        (F, M, M + M*taps)  augmented demixing [W | U]
  num      (M, F, M)   EW sums  E_w[phi_m y_m conj(y_n)]   (source steps)
  den      (M, F, M)   EW sums  E_w[phi_m |y_n|^2]
  steer mode: tnum (MK, F, M) complex / tden (MK, F, M) real tap stats
  solve mode: Rz (M, F, MK, MK) complex / rp (M, F, MK) complex
  zn, zd   (F, M)      EW projection-back statistics vs mic 0
  hist     (taps + delay - 1, F, M)  raw-frame history (cross-block tap
           context, same rule as ``models/online_wpe.py``)
  t_eff    ()          effective frame count (self-scaling term)
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ..ops.linalg import PRECISION, gauss_solve
from ..ops.wpe import delayed_taps
from .overiva import demix
from .source_models import activations_from_power, power

__all__ = ["online_tiss_init", "online_tiss_step"]

_EPS = 1e-15


@partial(
    jax.jit, static_argnames=("F", "M", "taps", "delay", "tap_update", "dtype")
)
def online_tiss_init(F: int, M: int, taps: int, delay: int,
                     tap_update: str = "solve", dtype=jnp.complex64):
    rdtype = jnp.float32 if dtype == jnp.complex64 else jnp.float64
    MK = M * taps
    eye = jnp.eye(M, dtype=rdtype).astype(dtype)
    P = jnp.zeros((F, M, M + MK), dtype)
    P = P.at[:, :, :M].set(eye)
    state = {
        "P": P,
        "num": jnp.zeros((M, F, M), dtype),
        "den": jnp.zeros((M, F, M), rdtype),
        "zn": jnp.zeros((F, M), dtype),
        "zd": jnp.zeros((F, M), rdtype),
        # max(., 0): taps=0 permits delay=0, where no history is needed
        "hist": jnp.zeros((max(taps + delay - 1, 0), F, M), dtype),
        "t_eff": jnp.zeros((), rdtype),
    }
    if taps and tap_update == "steer":
        state["tnum"] = jnp.zeros((MK, F, M), dtype)
        state["tden"] = jnp.zeros((MK, F, M), rdtype)
    elif taps:
        state["Rz"] = jnp.zeros((M, F, MK, MK), dtype)
        state["rp"] = jnp.zeros((M, F, MK), dtype)
    return state


@partial(
    jax.jit,
    static_argnames=("taps", "delay", "model", "n_pass", "tap_update",
                     "axis_name", "n_freq"),
)
def online_tiss_step(
    X_blk, state, forget, taps: int, delay: int, model: str = "laplace",
    n_pass: int = 1, pb_forget=None, tap_update: str = "solve",
    diag_load: float = 1e-5, tap_forget=None, axis_name=None, n_freq=None,
    bin_mask=None,
):
    """Process one STFT block. X_blk: (B, F, M) complex.

    ``tap_forget``: separate (typically longer) forgetting factor for the
    tap statistics Rz/rp — the room's late-reverb structure changes slower
    than the source activity the demixing stats track.

    ``axis_name``/``n_freq``/``bin_mask``: bin-sharded execution
    (parallel/sharded.py) — the per-frame power is the ONE cross-bin
    quantity per pass (a (B, M) real psum; every other statistic,
    including the tap normal-equation solve, is per-bin), exactly the
    online-ISS collective budget.

    Returns (Y_blk projection-back scaled, new state)."""
    B, F, M = X_blk.shape
    MK = M * taps
    lam = forget.astype(state["den"].dtype)
    pb_lam = lam if pb_forget is None else pb_forget.astype(lam.dtype)
    tap_lam = lam if tap_forget is None else tap_forget.astype(lam.dtype)
    P = state["P"]
    num, den = state["num"], state["den"]
    hist = state["hist"]
    t_eff = state["t_eff"] * lam + B

    # tap stack with cross-block context: prepend the history frames, run
    # the batch tap builder, keep this block's rows — bit-identical to the
    # batch alignment once >= taps+delay-1 frames have streamed
    Xcat = jnp.concatenate([hist, X_blk], axis=0)
    Xd = delayed_taps(Xcat, taps, delay)[hist.shape[0]:] if taps else None
    Xt_blk = jnp.concatenate([X_blk, Xd], axis=2) if taps else X_blk

    for _ in range(n_pass):
        Y = demix(Xt_blk, P)
        pw = power(Y, bin_mask)
        if axis_name is not None:
            pw = jax.lax.psum(pw, axis_name)
        _, phi = activations_from_power(pw, n_freq or F, model)  # (B, M)
        phif = phi.astype(Y.real.dtype)

        for n in range(M):  # source steering on the augmented rows
            yn = Y[:, :, n]
            blk_num = jnp.einsum(
                "tm,tfm,tf->fm", phif, Y, jnp.conj(yn), precision=PRECISION
            )
            blk_den = jnp.real(
                jnp.einsum(
                    "tm,tf,tf->fm", phif, yn, jnp.conj(yn), precision=PRECISION
                )
            )
            num = num.at[n].set(lam.astype(num.dtype) * num[n] + blk_num)
            den = den.at[n].set(lam * den[n] + blk_den)

            v = num[n] / jnp.maximum(den[n], _EPS).astype(num.dtype)
            dnn = den[n][:, n] / jnp.maximum(t_eff, 1.0)
            vnn = 1.0 - jax.lax.rsqrt(jnp.maximum(dnn, _EPS))
            col = jnp.arange(M)[None, :] == n
            v = jnp.where(col, vnn.astype(v.dtype)[:, None], v)
            P = P - v[:, :, None] * P[:, n, :][:, None, :]

        if taps and tap_update == "steer":
            tnum, tden = state["tnum"], state["tden"]
            Y = demix(Xt_blk, P)
            blk_tden = jnp.einsum(
                "tm,tfj->jfm", phif, jnp.abs(Xd) ** 2, precision=PRECISION
            )
            tden = tap_lam * tden + blk_tden
            blk_tnum = jnp.einsum(
                "tm,tfm,tfj->jfm", phif, Y, jnp.conj(Xd), precision=PRECISION
            )
            tnum = tap_lam.astype(tnum.dtype) * tnum + blk_tnum
            v = tnum / jnp.maximum(tden, _EPS).astype(tnum.dtype)
            P = P.at[:, :, M:].add(-jnp.moveaxis(v, 0, 2))
            state = {**state, "tnum": tnum, "tden": tden}
        elif taps:
            Rz, rp = state["Rz"], state["rp"]
            # stationary statistics: raw delayed inputs z and the
            # instantaneous target W_m x (current W) — independent of U
            Wx = demix(X_blk, P[:, :, :M])  # (B, F, M)
            Rz = tap_lam.astype(Rz.dtype) * Rz + jnp.einsum(
                "tm,tfa,tfb->mfab", phif, Xd, jnp.conj(Xd),
                precision=PRECISION,
            )
            rp = tap_lam.astype(rp.dtype) * rp + jnp.einsum(
                "tm,tfm,tfa->mfa", phif, Wx, jnp.conj(Xd),
                precision=PRECISION,
            )
            # U_m solves  U_m Rz_m = -rp_m  (normal equations of
            # min E[phi_m |W_m x + U_m z|^2]); transpose to column form
            tr = jnp.real(jnp.trace(Rz, axis1=2, axis2=3)) / MK  # (M, F)
            load = (diag_load * jnp.maximum(tr, 1e-30)).astype(Rz.real.dtype)
            A = jnp.swapaxes(Rz, 2, 3) + load[..., None, None] * jnp.eye(
                MK, dtype=Rz.dtype
            )
            # gauss_solve is (batch, n, n): fold the (source, bin) axes
            U = gauss_solve(
                A.reshape(M * F, MK, MK), -rp.reshape(M * F, MK, 1)
            ).reshape(M, F, MK)
            P = jnp.concatenate(
                [P[:, :, :M], jnp.swapaxes(U, 0, 1)], axis=2
            )
            state = {**state, "Rz": Rz, "rp": rp}

    # output + streaming projection back vs mic 0
    Y = demix(Xt_blk, P)
    zn = state["zn"] * pb_lam.astype(state["zn"].dtype) + jnp.sum(
        jnp.conj(X_blk[:, :, 0])[:, :, None] * Y, axis=0
    )
    zd = state["zd"] * pb_lam + jnp.sum(jnp.abs(Y) ** 2, axis=0)
    z = jnp.where(zd > 0.0, zn / jnp.where(zd > 0.0, zd, 1.0).astype(zn.dtype), 1.0)
    Y_out = Y * jnp.conj(z)[None, :, :]

    H = max(taps + delay - 1, 0)
    new_hist = Xcat[-H:] if H else hist
    state = {
        **state, "P": P, "num": num, "den": den, "zn": zn, "zd": zd,
        "hist": new_hist, "t_eff": t_eff,
    }
    return Y_out, state
