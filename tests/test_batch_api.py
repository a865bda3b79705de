"""Batched (vmap) single-chip separation matches the per-mixture path."""

import numpy as np

from overiva_tpu import api

from helpers import make_mixture, stft_mixture


def test_overiva_batch_matches_loop():
    Xs = []
    for seed in (61, 62, 63):
        rng = np.random.default_rng(seed)
        mix, _, _ = make_mixture(rng, n_src=2, n_mics=4, n_samples=12000, snr_db=25)
        Xs.append(stft_mixture(mix, nfft=256))
    batch = np.stack(Xs)
    Yb = api.overiva_batch(batch, n_src=2, n_iter=8, dtype=np.complex128)
    for b in range(3):
        Yref = api.overiva(batch[b], n_src=2, n_iter=8, dtype=np.complex128)
        np.testing.assert_allclose(Yb[b], Yref, rtol=1e-7, atol=1e-9)


def test_overiva_batch_validates():
    import pytest

    X = np.zeros((2, 10, 9, 3), np.complex64)
    with pytest.raises(ValueError):
        api.overiva_batch(X, n_src=5)
