"""Wav-directory source loader (the real-speech hook, SURVEY.md §2.1)."""

import numpy as np
import pytest
from scipy.io import wavfile

from overiva_tpu.sim import load_wav_sources, speech_like


@pytest.fixture()
def wav_dir(tmp_path):
    """Three wavs covering the format matrix: int16 mono @16k, float32 mono
    @8k (needs resampling), int16 stereo @16k (needs mono-izing). One is
    short and must loop."""
    fs = 16000
    s0 = speech_like(fs * 2, fs, seed=1)
    wavfile.write(tmp_path / "a.wav", fs, (s0 * 0.3 * 32767).astype(np.int16))
    s1 = speech_like(8000 * 2, 8000, seed=2).astype(np.float32)
    wavfile.write(tmp_path / "b.wav", 8000, s1 * 0.5)
    s2 = speech_like(fs // 2, fs, seed=3)  # short: 0.5 s
    stereo = np.stack([s2, 0.8 * s2], axis=1)
    wavfile.write(tmp_path / "c.wav", fs, (stereo * 0.3 * 32767).astype(np.int16))
    return tmp_path


def test_loads_shape_and_variance(wav_dir):
    out = load_wav_sources(wav_dir, 3, 16000, fs=16000, seed=0)
    assert out.shape == (3, 16000)
    np.testing.assert_allclose(np.std(out, axis=1), 1.0, rtol=1e-6)
    assert np.isfinite(out).all()


def test_deterministic_per_seed(wav_dir):
    a = load_wav_sources(wav_dir, 2, 8000, seed=7)
    b = load_wav_sources(wav_dir, 2, 8000, seed=7)
    c = load_wav_sources(wav_dir, 2, 8000, seed=8)
    np.testing.assert_array_equal(a, b)
    assert not np.array_equal(a, c)


def test_distinct_files_preferred(wav_dir):
    """With 3 files and 3 sources, each source comes from a different file."""
    out = load_wav_sources(wav_dir, 3, 4000, seed=3)
    for i in range(3):
        for j in range(i + 1, 3):
            c = abs(np.corrcoef(out[i], out[j])[0, 1])
            assert c < 0.9, (i, j, c)


def test_more_sources_than_files(wav_dir):
    out = load_wav_sources(wav_dir, 5, 4000, seed=4)
    assert out.shape == (5, 4000)


def test_empty_dir_raises(tmp_path):
    with pytest.raises(ValueError, match="no .wav files"):
        load_wav_sources(tmp_path, 2, 1000)


def test_sweep_config_hook(wav_dir, tmp_path, monkeypatch):
    """The sweep driver uses wav sources when the config names a directory."""
    import sys
    sys.path.insert(0, "bench")
    import mbss_sim

    cfg = {
        "fs": 8000, "duration": 1.0, "room_dim": [6.0, 5.0, 3.0],
        "source_dir": str(wav_dir),
    }
    mix, premix = mbss_sim.simulate_instance(cfg, 5, n_mics=2, n_src=2, rt60=0.2, snr=25)
    assert mix.shape[1] == 2 and premix.shape[0] == 2
    assert np.isfinite(mix).all()
