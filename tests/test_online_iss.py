"""Online (streaming) AuxIVA-ISS: convergence over blocks."""

import numpy as np

from overiva_tpu import api
from overiva_tpu.api import OnlineAuxIVAISS

from helpers import make_mixture, stft_mixture
from test_oracle_algos import stft_sir_matrix


def test_online_iss_converges_over_stream():
    rng = np.random.default_rng(99)
    mix, premix, _ = make_mixture(rng, n_src=2, n_mics=2, n_samples=64000, snr_db=25)
    X = stft_mixture(mix, nfft=256)  # (T, 129, 2)
    P = np.stack([stft_mixture(premix[k], nfft=256)[:, :, 0] for k in range(2)])
    T = X.shape[0]
    B = 25
    sep = OnlineAuxIVAISS(n_freq=X.shape[1], n_chan=2, forget=0.985,
                          n_pass=2, dtype=np.complex128)
    outs = []
    for start in range(0, T - B + 1, B):
        outs.append(sep.process(X[start : start + B]))
    n_blocks = len(outs)

    def block_quality(Y_blk, start):
        Pb = P[:, start : start + Y_blk.shape[0]]
        G = stft_sir_matrix(Y_blk, Pb)
        # best-permutation purity: product of max-gains
        return max(G[0, 0] * G[1, 1], G[0, 1] * G[1, 0]) / (
            max(G[0, 0] * G[1, 0] + G[0, 1] * G[1, 1], 1e-12)
        )

    early = np.mean([block_quality(outs[i], i * B) for i in range(2, 5)])
    late = np.mean(
        [block_quality(outs[i], i * B) for i in range(n_blocks - 3, n_blocks)]
    )
    assert late > 3 * early, (early, late)
    # filters accessible and finite
    W = sep.filters
    assert np.all(np.isfinite(W))


def test_online_iss_state_persists():
    rng = np.random.default_rng(100)
    mix, _, _ = make_mixture(rng, n_src=2, n_mics=2, n_samples=16000, snr_db=25)
    X = stft_mixture(mix, nfft=256)
    sep = OnlineAuxIVAISS(n_freq=X.shape[1], n_chan=2)
    W0 = sep.filters.copy()
    sep.process(X[:20])
    W1 = sep.filters
    assert not np.allclose(W0, W1)  # state advanced


def test_online_converged_quality_vs_batch():
    """Stationary scene: the streaming separator's converged tail must
    reach a solid fraction of the batch path's quality, and the new
    options (ramp schedule, pb_forget smoothing) must run and converge
    (VERDICT r2 item 6). Thresholds from the round-3 A/B measurements
    (late purity ~24-27 online vs ~927 batch; see models/online_iss.py)."""
    rng = np.random.default_rng(99)
    mix, premix, _ = make_mixture(rng, n_src=2, n_mics=2, n_samples=64000, snr_db=25)
    X = stft_mixture(mix, nfft=256)
    P = np.stack([stft_mixture(premix[k], nfft=256)[:, :, 0] for k in range(2)])
    T = X.shape[0]
    B = 25

    def purity(Y_blk, start):
        Pb = P[:, start : start + Y_blk.shape[0]]
        G = stft_sir_matrix(Y_blk, Pb)
        return max(G[0, 0] * G[1, 1], G[0, 1] * G[1, 0]) / max(
            G[0, 0] * G[1, 0] + G[0, 1] * G[1, 1], 1e-12
        )

    def late_purity(**kw):
        sep = OnlineAuxIVAISS(
            n_freq=X.shape[1], n_chan=2, forget=0.985, n_pass=2,
            dtype=np.complex128, **kw,
        )
        outs = [sep.process(X[s : s + B]) for s in range(0, T - B + 1, B)]
        nb = len(outs)
        assert all(np.isfinite(o).all() for o in outs)
        return np.mean([purity(outs[i], i * B) for i in range(nb - 5, nb)])

    batch_p = purity(api.auxiva_iss(X, n_iter=20, dtype=np.complex128)[50:], 50)
    base = late_purity()
    smoothed = late_purity(pb_forget=0.9995)
    ramped = late_purity(ramp=True)
    # converged online >= 10 (>= ~10 dB interference suppression) on a
    # scene where batch reaches ~900; every option converges
    assert batch_p > 100, batch_p
    assert base > 10, base
    assert smoothed > 10, smoothed
    assert ramped > 5, ramped


def test_online_iss_matches_numpy_oracle():
    """Trajectory parity vs the float64 NumPy oracle (oracle/online_iss.py)
    — the streaming family's anchor for the hardware certification."""
    from overiva_tpu.oracle.online_iss import online_iss_run

    rng = np.random.default_rng(11)
    mix, _, _ = make_mixture(rng, n_src=2, n_mics=2, n_samples=24000, snr_db=20)
    X = stft_mixture(mix, nfft=256)  # (T, 129, 2)
    B = 16
    T = (X.shape[0] // B) * B
    X = X[:T]

    sep = OnlineAuxIVAISS(n_freq=X.shape[1], n_chan=2, forget=0.97,
                          n_pass=2, pb_forget=0.9995, dtype=np.complex128)
    got = np.concatenate(
        [sep.process(X[s : s + B]) for s in range(0, T, B)], axis=0
    )
    want = online_iss_run(X, B, forget=0.97, n_pass=2, pb_forget=0.9995)
    np.testing.assert_allclose(got, want, rtol=1e-8, atol=1e-10)
