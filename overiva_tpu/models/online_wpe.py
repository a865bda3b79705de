"""Online (streaming) WPE core — block-wise recursive updates (trace-side).

Streaming twin of ``ops.wpe`` in the spirit of the published recursive /
block-online WPE variants (Caroselli et al., Interspeech 2017 lineage;
equations re-derived from the batch objective, no source consulted): STFT
frames arrive in fixed-size blocks; the tap-correlation statistics are
exponentially forgotten and the prediction filter is re-solved once per
block, so the dereverber tracks the room with O(block) latency.

State per stream (all device-resident):
  G      (F, MK, M)  prediction filter (MK = n_chan * taps)
  R      (F, MK, MK) EW tap correlation  sum_t Xd Xd^H / lam
  P      (F, MK, M)  EW cross-correlation sum_t Xd X^H / lam
  hist   (taps+delay-1, F, M) trailing input frames (tap context across
                              block boundaries; zeros before the stream)
  t_eff  ()          effective frame count (gates the first solves)

Per block: (1) dereverb the block with the CURRENT filter to estimate the
PSD weights lam (variance-normalization needs a dereverbed reference —
using the raw input would over-weight reverberant frames), (2) discount
R/P by ``forget`` per frame (applied as forget**B per block) and
accumulate the block's weighted statistics, (3) re-solve G with the same
trace-relative diagonal load as the batch path, (4) emit the block
dereverbed by the UPDATED filter.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ..ops.linalg import PRECISION, gauss_solve
from ..ops.wpe import delayed_taps

__all__ = ["online_wpe_init", "online_wpe_step"]

_EPS = 1e-10


@partial(jax.jit, static_argnames=("F", "M", "taps", "delay", "dtype"))
def online_wpe_init(F: int, M: int, taps: int, delay: int,
                    dtype=jnp.complex64):
    rdtype = jnp.float32 if dtype == jnp.complex64 else jnp.float64
    MK = M * taps
    return {
        "G": jnp.zeros((F, MK, M), dtype),
        "R": jnp.zeros((F, MK, MK), dtype),
        "P": jnp.zeros((F, MK, M), dtype),
        "hist": jnp.zeros((taps + delay - 1, F, M), dtype),
        "t_eff": jnp.zeros((), rdtype),
    }


@partial(jax.jit, static_argnames=("taps", "delay", "diag_load"))
def online_wpe_step(X_blk, state, forget, taps: int, delay: int,
                    diag_load: float = 1e-5):
    """Process one STFT block. X_blk: (B, F, M) complex.

    Returns (Y_blk dereverbed, new state). Blocks must share one shape
    (one compile); the zero-initialized R/P act as a growing window until
    the forget factor's effective memory 1/(1-forget) frames are seen.
    """
    B, F, M = X_blk.shape
    MK = M * taps
    L = taps + delay - 1
    rdt = X_blk.real.dtype
    lam_f = forget.astype(rdt)

    # tap stacks for the block frames, with history providing the context
    Xc = jnp.concatenate([state["hist"], X_blk], axis=0)  # (L+B, F, M)
    Xd = delayed_taps(Xc, taps, delay)[L:]  # (B, F, MK)

    # (1) PSD weights from the current filter's dereverbed estimate
    Y0 = X_blk - jnp.einsum(
        "fam,bfa->bfm", jnp.conj(state["G"]), Xd, precision=PRECISION
    )
    lam = jnp.mean(jnp.abs(Y0) ** 2, axis=2)  # (B, F)
    lam = jnp.maximum(lam, _EPS * jnp.maximum(jnp.mean(lam), 1e-30))
    Xw = Xd / lam[:, :, None].astype(rdt)

    # (2) exponentially-forgotten statistics (block-wise discount)
    decay = lam_f ** B
    R = decay * state["R"] + jnp.einsum(
        "bfa,bfc->fac", Xw, jnp.conj(Xd), precision=PRECISION
    )
    P = decay * state["P"] + jnp.einsum(
        "bfa,bfm->fam", Xw, jnp.conj(X_blk), precision=PRECISION
    )
    t_eff = decay * state["t_eff"] + B

    # (3) re-solve the filter (trace-relative Tikhonov, as the batch path)
    tr = jnp.real(jnp.trace(R, axis1=1, axis2=2)) / MK
    load = diag_load * jnp.maximum(tr, 1e-30)
    eye = jnp.eye(MK, dtype=X_blk.dtype)
    G = gauss_solve(R + load[:, None, None].astype(rdt) * eye, P)

    # (4) emit with the updated filter
    Y = X_blk - jnp.einsum(
        "fam,bfa->bfm", jnp.conj(G), Xd, precision=PRECISION
    )

    new_state = {
        "G": G,
        "R": R,
        "P": P,
        "hist": Xc[-L:] if L > 0 else state["hist"],
        "t_eff": t_eff,
    }
    return Y, new_state
