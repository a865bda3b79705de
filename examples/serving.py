"""Serving demo: variable-length clips on a bounded executable set.

Simulates a room scene, cuts clips of several different lengths from it,
and serves them through one ``overiva_tpu.serving.Separator``. Shows the
production property the bucket grid buys: a handful of compiled shapes
covers every clip length (first clip per bucket pays the XLA compile,
every later length in that bucket is warm), and the separation quality is
the unpadded pipeline's, exactly.

    python examples/serving.py --algo overiva --mics 5 --srcs 2
    python examples/serving.py --warmup   # pre-compile the grid first
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
    import jax

    jax.config.update("jax_platforms", "cpu")

from overiva_tpu.metrics import bss_eval_sources
from overiva_tpu.serving import SERVABLE, Separator
from overiva_tpu.sim import ShoeBox, circular_mic_array, semi_circle_layout, speech_like


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--algo", default="overiva", choices=SERVABLE)
    p.add_argument("--mics", "-m", type=int, default=5)
    p.add_argument("--srcs", "-s", type=int, default=2)
    p.add_argument("--nfft", type=int, default=2048)
    p.add_argument("--n-iter", type=int, default=20)
    p.add_argument("--fs", type=int, default=16000)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument(
        "--lengths", type=float, nargs="+", default=[6.0, 3.5, 5.7, 2.2, 5.5],
        help="clip lengths in seconds (cut from one simulated scene)",
    )
    p.add_argument(
        "--warmup", action="store_true",
        help="pre-compile every bucket up to the longest clip first",
    )
    p.add_argument(
        "--pcm16", action="store_true",
        help="serve int16 PCM both ways: clips transfer as int16 (scaled "
        "1/32768 on device — bit-identical to the float path) and the "
        "separated samples come back quantized to int16 PCM on device; "
        "half the tunnel bytes each direction (DESIGN §9 r5)",
    )
    args = p.parse_args(argv)

    # one simulated scene; clips are cut from its head
    dur = max(args.lengths)
    n = int(dur * args.fs)
    M, N = args.mics, args.srcs
    room = ShoeBox([7.0, 5.0, 3.0], fs=args.fs, rt60=0.2, seed=args.seed)
    src_pos = semi_circle_layout([3.5, 3.5, 1.5], np.pi / 2, 1.8, N)
    for k in range(N):
        room.add_source(src_pos[k], speech_like(n, args.fs, seed=args.seed * 31 + k))
    room.add_mic_array(circular_mic_array([3.5, 2.2, 1.5], 0.04, M))
    premix, noise = room.simulate(return_premix=True, snr=25.0)
    mix = (premix.sum(axis=0) + noise).T[:n]
    refs = premix[:, 0, :n]  # source images at mic 0

    spec_n_src = None if N == M else N
    sep = Separator(
        args.algo, n_src=spec_n_src, nfft=args.nfft, n_iter=args.n_iter,
        out_dtype=np.int16 if args.pcm16 else None,
    )
    if args.pcm16:
        peak = np.abs(mix).max()
        mix = np.clip(np.round(mix / peak * 24000), -32768, 32767
                      ).astype(np.int16)

    if args.warmup:
        t0 = time.perf_counter()
        touched = sep.warmup(
            n_chan=M, n_samples=n,
            dtype=np.int16 if args.pcm16 else None,
        )
        print(f"warmup: {touched} buckets compiled in {time.perf_counter() - t0:.1f} s")

    for secs in args.lengths:
        n_c = int(secs * args.fs)
        t0 = time.perf_counter()
        y = sep.separate(mix[:n_c])
        dt = time.perf_counter() - t0
        if args.pcm16:
            y = y.astype(np.float64) / 32768.0
        sdr, sir, _, _ = bss_eval_sources(refs[:, :n_c], y.T[: refs.shape[0]])
        bucket = sep._bucket(sep._t_real_of(n_c))
        print(
            f"clip {secs:4.1f} s -> bucket {bucket:4d} frames, "
            f"{dt:6.2f} s wall, SIR {np.mean(sir):6.2f} dB"
        )

    hits = dict(sep.stats["bucket_hits"])
    print(
        f"served {sep.stats['clips']} clips over {sep.n_buckets()} executables "
        f"(bucket -> clips: { {k[0]: v for k, v in sorted(hits.items())} }); "
        f"padding overhead "
        f"{sep.stats['frames_padded'] / max(sep.stats['frames_real'], 1):.1%}"
    )


if __name__ == "__main__":
    main()
