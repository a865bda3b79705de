"""BSS Eval source-separation metrics (SDR / SIR / SAR), NumPy.

In-repo implementation of the ``bss_eval_sources`` criteria the reference
pipeline gets from ``mir_eval.separation`` (SURVEY.md §5.5; the environment
ships no mir_eval). Implemented from the published definitions:

    E. Vincent, R. Gribonval, C. Fevotte, "Performance measurement in blind
    audio source separation", IEEE TASLP 14(4), 2006 (BSS Eval v3).

Each estimated source is decomposed against time-invariant ``filter_length``-
tap filtered versions of the true sources:

    s_filt   = P_{ref_j}(est)            target with allowed distortion
    e_interf = P_{all refs}(est) - s_filt
    e_artif  = est - P_{all refs}(est)

    SDR = 10 log10 ||s_filt||^2 / ||e_interf + e_artif||^2
    SIR = 10 log10 ||s_filt||^2 / ||e_interf||^2
    SAR = 10 log10 ||s_filt + e_interf||^2 / ||e_artif||^2

where P_S is the least-squares projection onto the span of the 0..flen-1
sample delays of the signals in S. The best permutation of estimates to
references is chosen by maximizing mean SIR (mir_eval convention).
"""

from __future__ import annotations

import itertools

import numpy as np
from scipy.linalg import toeplitz
from scipy.signal import fftconvolve

__all__ = ["bss_eval_sources", "bss_eval_images"]


def _correlations(refs: np.ndarray, est: np.ndarray, flen: int):
    """Gram matrix G of delayed references and cross-correlation D with est.

    refs: (nsrc, T), est: (T,). Returns G (nsrc*flen, nsrc*flen), D (nsrc*flen,).
    Correlations are computed over the zero-padded length T + flen - 1 via FFT.
    """
    nsrc, nsampl = refs.shape
    n = nsampl + flen - 1
    nfft = 1 << (n - 1).bit_length()
    sf = np.fft.rfft(refs, n=nfft, axis=1)
    ef = np.fft.rfft(est, n=nfft)

    G = np.empty((nsrc, flen, nsrc, flen))
    for i in range(nsrc):
        for j in range(i, nsrc):
            # corr_ij[tau] = sum_t s_i[t] s_j[t - tau], tau in (-flen, flen)
            ssf = np.fft.irfft(sf[i] * np.conj(sf[j]), n=nfft)
            # rows: delay of s_i, cols: delay of s_j -> Toeplitz
            block = toeplitz(np.hstack((ssf[:1], ssf[-1 : -flen : -1])), ssf[:flen])
            G[i, :, j, :] = block
            if i != j:
                G[j, :, i, :] = block.T
    G = G.reshape(nsrc * flen, nsrc * flen)

    D = np.empty((nsrc, flen))
    for i in range(nsrc):
        # D_i[tau] = sum_t est[t] s_i[t - tau], tau = 0..flen-1
        cc = np.fft.irfft(ef * np.conj(sf[i]), n=nfft)
        D[i] = cc[:flen]
    return G, D.reshape(-1)


def _project(refs: np.ndarray, est: np.ndarray, flen: int) -> np.ndarray:
    """LS projection of est onto delayed refs; length T + flen - 1."""
    nsrc, nsampl = refs.shape
    G, D = _correlations(refs, est, flen)
    try:
        C = np.linalg.solve(G, D).reshape(nsrc, flen)
    except np.linalg.LinAlgError:
        C = np.linalg.lstsq(G, D, rcond=None)[0].reshape(nsrc, flen)
    sproj = np.zeros(nsampl + flen - 1)
    for i in range(nsrc):
        sproj += fftconvolve(C[i], refs[i])[: nsampl + flen - 1]
    return sproj


def _safe_db(num: float, den: float) -> float:
    if den == 0.0:
        return np.inf
    if num == 0.0:
        return -np.inf
    return 10.0 * np.log10(num / den)


def _decompose(refs: np.ndarray, est: np.ndarray, j: int, flen: int):
    """Decompose est against ref j (target) and all refs (interference)."""
    nsampl = est.shape[0]
    s_filt = _project(refs[j : j + 1], est, flen)  # target + allowed distortion
    p_all = _project(refs, est, flen)
    e_interf = p_all - s_filt
    e_artif = -p_all
    e_artif[:nsampl] += est
    return s_filt, e_interf, e_artif


def _criteria(s_filt, e_interf, e_artif):
    sdr = _safe_db(np.sum(s_filt**2), np.sum((e_interf + e_artif) ** 2))
    sir = _safe_db(np.sum(s_filt**2), np.sum(e_interf**2))
    sar = _safe_db(np.sum((s_filt + e_interf) ** 2), np.sum(e_artif**2))
    return sdr, sir, sar


def bss_eval_sources(
    reference_sources: np.ndarray,
    estimated_sources: np.ndarray,
    compute_permutation: bool = True,
    filter_length: int = 512,
):
    """SDR/SIR/SAR of estimated vs reference sources with permutation search.

    reference_sources, estimated_sources: (nsrc, nsampl) float arrays (the
    estimate count must equal the reference count, as in mir_eval).

    Returns (sdr, sir, sar, perm) — each (nsrc,) arrays ordered by REFERENCE
    source (mir_eval semantics): sdr[j] scores reference j against estimate
    perm[j], and the permutation maximizes mean SIR.
    """
    refs = np.atleast_2d(np.asarray(reference_sources, dtype=np.float64))
    ests = np.atleast_2d(np.asarray(estimated_sources, dtype=np.float64))
    if refs.shape != ests.shape:
        raise ValueError(
            f"shape mismatch: references {refs.shape} vs estimates {ests.shape}"
        )
    if np.any(np.sum(np.abs(refs), axis=1) == 0):
        raise ValueError("reference sources must be non-silent")
    nsrc = refs.shape[0]

    pairs = (
        [(k, j) for k in range(nsrc) for j in range(nsrc)]
        if compute_permutation
        else [(k, k) for k in range(nsrc)]
    )
    sdr_m = np.full((nsrc, nsrc), np.nan)
    sir_m = np.full((nsrc, nsrc), np.nan)
    sar_m = np.full((nsrc, nsrc), np.nan)
    for k, j in pairs:
        s_filt, e_interf, e_artif = _decompose(refs, ests[k], j, filter_length)
        sdr_m[k, j], sir_m[k, j], sar_m[k, j] = _criteria(s_filt, e_interf, e_artif)

    if not compute_permutation:
        idx = np.arange(nsrc)
        return (
            sdr_m[idx, idx],
            sir_m[idx, idx],
            sar_m[idx, idx],
            idx,
        )

    # perm maps reference j -> estimate perm[j] (mir_eval convention)
    best, best_perm = -np.inf, None
    for perm in itertools.permutations(range(nsrc)):
        mean_sir = np.mean(sir_m[perm, np.arange(nsrc)])
        if mean_sir > best:
            best, best_perm = mean_sir, perm
    perm = np.asarray(best_perm)
    idx = np.arange(nsrc)
    return sdr_m[perm, idx], sir_m[perm, idx], sar_m[perm, idx], perm


def bss_eval_images(reference_images: np.ndarray, estimated_images: np.ndarray, **kw):
    """Convenience: evaluate multichannel source images by stacking channels.

    reference_images, estimated_images: (nsrc, nsampl, nchan). Channels are
    concatenated in time (the spatial-image variant of the criteria without
    the ISR term), then scored with :func:`bss_eval_sources`.
    """
    r = np.asarray(reference_images)
    e = np.asarray(estimated_images)
    if r.ndim != 3 or e.shape != r.shape:
        raise ValueError("expected matching (nsrc, nsampl, nchan) arrays")
    nsrc = r.shape[0]
    return bss_eval_sources(
        r.transpose(0, 2, 1).reshape(nsrc, -1),
        e.transpose(0, 2, 1).reshape(nsrc, -1),
        **kw,
    )
