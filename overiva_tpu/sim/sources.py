"""Synthetic speech-like test sources + SNR mixing helpers.

The reference pulls CMU ARCTIC speech via ``pyroomacoustics.datasets``
(SURVEY.md §2.1 "sample data prep"); this environment has no corpus and no
network, so the benchmark harness generates seeded speech-like signals:
Laplacian excitation, slowly-varying syllabic gating, AR(2) formant-ish
coloration. Deterministic per seed.
"""

from __future__ import annotations

import numpy as np

__all__ = ["speech_like", "scale_to_snr", "mix_premix"]


def speech_like(
    n_samples: int,
    fs: float = 16000,
    seed: int | None = None,
    syllable_hz: float = 3.0,
    voiced_ratio: float = 0.55,
) -> np.ndarray:
    """One speech-like source signal, unit variance."""
    rng = np.random.default_rng(seed)
    x = rng.laplace(size=n_samples)

    # syllabic on/off gating with smoothed edges
    block = max(int(fs / syllable_hz / 4), 1)
    n_blocks = -(-n_samples // block)
    gates = np.where(rng.random(n_blocks) < voiced_ratio, 1.0, 0.08)
    env = np.repeat(gates, block)[:n_samples]
    k = np.hanning(int(0.02 * fs) | 1)
    env = np.convolve(env, k / k.sum(), mode="same")
    x *= env

    # AR(2) resonance at a random formant-ish frequency
    f0 = rng.uniform(300.0, 1800.0) / fs
    r = 0.95
    a1, a2 = 2 * r * np.cos(2 * np.pi * f0), -(r**2)
    y = np.empty_like(x)
    y[0], y[1] = x[0], x[1]
    for t in range(2, n_samples):
        y[t] = x[t] + a1 * y[t - 1] + a2 * y[t - 2]
    y /= np.std(y) + 1e-12
    return y


def scale_to_snr(premix: np.ndarray, snr_db: float, ref_mic: int = 0, n_targets=None):
    """Scale background sources so target-vs-rest SNR at ref_mic is snr_db.

    premix: (n_src, n_mics, n_samples); the first ``n_targets`` sources are
    the targets (default all-but-last). Returns a scaled copy.
    """
    premix = premix.copy()
    n_src = premix.shape[0]
    n_targets = n_targets if n_targets is not None else n_src
    if n_targets >= n_src:
        return premix
    p_t = np.sum(premix[:n_targets, ref_mic, :] ** 2)
    p_b = np.sum(premix[n_targets:, ref_mic, :] ** 2)
    if p_b > 0:
        premix[n_targets:] *= np.sqrt(p_t / p_b * 10 ** (-snr_db / 10))
    return premix


def mix_premix(premix: np.ndarray) -> np.ndarray:
    """(n_src, n_mics, n) -> (n, n_mics) mixture, frames-last transposed."""
    return premix.sum(axis=0).T
