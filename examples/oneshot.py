"""One-shot separation demo — mirror of the reference's ``example.py``
(SURVEY.md §3.1): build a room, simulate, separate on the TPU, evaluate.

    python examples/oneshot.py -a overiva -m 5 -s 2 --rt60 0.25 --n_iter 20

Algorithms (reference ``--algo`` choices + model variants): auxiva,
auxiva-gauss, overiva, overiva-gauss, auxiva_pca, ogive, ogive-mix,
ogive-switching.
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from overiva_tpu.utils.cache import enable_persistent_cache

enable_persistent_cache()

import os

if os.environ.get("OVERIVA_FORCE_CPU"):
    # the axon plugin overrides JAX_PLATFORMS at import; config wins
    import jax

    jax.config.update("jax_platforms", "cpu")

from overiva_tpu import api
from overiva_tpu.metrics import bss_eval_sources
from overiva_tpu.oracle import stft_pad
from overiva_tpu.sim import (
    ShoeBox,
    circular_mic_array,
    semi_circle_layout,
    speech_like,
)

from overiva_tpu.registry import ALGORITHMS, get_algorithm

ALGOS = sorted(ALGORITHMS)


def separate(algo: str, X: np.ndarray, n_src: int, n_iter: int, callback=None):
    spec = get_algorithm(algo)
    kw = {"callback": callback}
    if algo.startswith("ogive"):
        # gradient method: needs many cheap steps, not the IP-scale count
        kw.update(n_iter=max(n_iter, 1000), step_size=0.05)
    else:
        kw.update(n_iter=n_iter)
    return spec(X, n_src=n_src, **kw)


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("-a", "--algo", choices=ALGOS, default="overiva")
    p.add_argument("-m", "--mics", type=int, default=5)
    p.add_argument("-s", "--srcs", type=int, default=2)
    p.add_argument("--rt60", type=float, default=0.25)
    p.add_argument("--snr", type=float, default=25.0, help="mic-noise SNR dB")
    p.add_argument("--nfft", type=int, default=4096)
    p.add_argument("--n_iter", type=int, default=20)
    p.add_argument("--duration", type=float, default=5.0, help="seconds")
    p.add_argument("--fs", type=int, default=16000)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--save", type=str, default=None, help="dir for output wavs")
    p.add_argument(
        "--source-dir", type=str, default=None,
        help="directory of .wav files to use as sources (real speech); "
        "synthetic speech-like signals are generated when omitted",
    )
    p.add_argument(
        "--monitor", type=str, default=None, metavar="PNG",
        help="record per-iteration SDR/SIR via the callback and plot to PNG",
    )
    args = p.parse_args(argv)

    rng = np.random.default_rng(args.seed)
    n = int(args.duration * args.fs)
    n_out = 1 if args.algo.startswith("ogive") else args.srcs

    # room: ~WASPAA'19 setup — sources on an arc AROUND the mic array
    # (equidistant: centering the arc away from the array makes per-source
    # levels wildly unequal)
    room_dim = [8.0, 9.0, 3.0]
    room = ShoeBox(room_dim, fs=args.fs, rt60=args.rt60, seed=args.seed)
    src_pos = semi_circle_layout([4.0, 4.0, 1.5], np.pi / 2, 2.5, args.srcs,
                                 rot=np.pi / 2)
    if args.source_dir:
        from overiva_tpu.sim import load_wav_sources

        signals = load_wav_sources(
            args.source_dir, args.srcs, n, args.fs, seed=args.seed
        )
    else:
        signals = np.stack(
            [speech_like(n, args.fs, seed=args.seed * 97 + k)
             for k in range(args.srcs)]
        )
    for k in range(args.srcs):
        room.add_source(src_pos[k], signals[k])
    room.add_mic_array(circular_mic_array([4.0, 4.0, 1.5], 0.05, args.mics))

    premix, noise = room.simulate(return_premix=True, snr=args.snr)
    mix = (premix.sum(axis=0) + noise).T  # (n_samples, M)

    hop = args.nfft // 2
    X = api.stft_analysis(stft_pad(mix, args.nfft, hop), args.nfft)
    print(f"mixture {mix.shape} -> STFT {X.shape}")

    recorder = None
    if args.monitor:
        from overiva_tpu.utils.profiling import ConvergenceRecorder

        recorder = ConvergenceRecorder(
            premix[:, 0, : mix.shape[0]], args.nfft, n_samples=mix.shape[0]
        )

    t0 = time.perf_counter()
    Y = separate(args.algo, X, args.srcs, args.n_iter, callback=recorder)
    dt = time.perf_counter() - t0
    y = api.stft_synthesis(Y, args.nfft)
    start = args.nfft - hop
    y = y[start : start + mix.shape[0]]

    refs = premix[:, 0, : mix.shape[0]]
    if n_out == args.srcs:
        sdr, sir, sar, perm = bss_eval_sources(refs, y.T)
        sdr0, sir0, _, _ = bss_eval_sources(
            refs, np.tile(mix[:, 0], (args.srcs, 1))
        )
        print(f"\n{args.algo}: {dt:.2f}s")
        for j in range(args.srcs):
            # mir_eval convention: row j scores reference j vs estimate perm[j]
            print(
                f"  src {j} <- out {perm[j]}: SDR {sdr[j]:6.2f} dB "
                f"(mix {sdr0[j]:6.2f})  SIR {sir[j]:6.2f} dB "
                f"(mix {sir0[j]:6.2f})"
            )
    else:
        best = max(range(args.srcs), key=lambda j: abs(np.dot(refs[j], y[:, 0])))
        pair = np.stack([refs[best], refs.sum(0) - refs[best]])
        est = np.stack([y[:, 0], mix[:, 0] - y[:, 0]])
        sdr, sir, _, _ = bss_eval_sources(pair, est, compute_permutation=False)
        print(f"\n{args.algo}: {dt:.2f}s  extracted src {best}: "
              f"SDR {sdr[0]:.2f} dB  SIR {sir[0]:.2f} dB")

    if recorder is not None and recorder.sdr:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        fig, ax = plt.subplots(1, 2, figsize=(9, 3.5), sharex=True)
        sdr_c = np.asarray(recorder.sdr)
        sir_c = np.asarray(recorder.sir)
        for k in range(sdr_c.shape[1]):
            ax[0].plot(sdr_c[:, k], marker="o", label=f"src {k}")
            ax[1].plot(sir_c[:, k], marker="o", label=f"src {k}")
        ax[0].set_title("SDR (dB)")
        ax[1].set_title("SIR (dB)")
        ax[0].set_xlabel("callback #")
        ax[1].set_xlabel("callback #")
        ax[0].legend()
        fig.tight_layout()
        fig.savefig(args.monitor, dpi=120)
        print(f"convergence plot -> {args.monitor}")

    if args.save:
        from scipy.io import wavfile

        out = Path(args.save)
        out.mkdir(parents=True, exist_ok=True)
        norm = np.max(np.abs(y)) + 1e-9
        wavfile.write(out / "mix.wav", args.fs,
                      (mix[:, 0] / (np.max(np.abs(mix)) + 1e-9) * 0.9 * 32767).astype(np.int16))
        for k in range(n_out):
            wavfile.write(out / f"sep_{k}.wav", args.fs,
                          (y[:, k] / norm * 0.9 * 32767).astype(np.int16))
        print(f"wavs written to {out}/")


if __name__ == "__main__":
    main()
