"""Serving tier: variable-length separation on a bounded set of XLA
executables (static-shape frame buckets + exact zero-frame padding).

XLA compiles one executable per input shape (first compile ~20-40 s on a
cold TPU); naive serving of arbitrary-length clips therefore recompiles
per clip length — unusable in production. The reference has no serving
story at all (``example.py`` separates one fixed file — SURVEY.md §3.1);
this module is TPU-added surface shaped by the static-shape constraint.

Design: pad the waveform so the STFT lands on a geometric grid of frame
counts (~``bucket_ratio``-spaced, so padding overhead is bounded by
``bucket_ratio - 1`` and the number of executables is logarithmic in the
clip-length range), zero every frame past the clip's own, and run the
algorithm on the bucketed tensor. Correctness rests on an algebraic
property of the IP/ISS family, not on approximation:

- an all-zero frame contributes nothing to any data statistic — the
  per-frame power and every weighted covariance carry an ``|x|^2``
  factor, so a huge padded-frame weight ``phi`` (the activation floor)
  multiplies zero;
- the only place the padded frame count enters is the ``1/T``
  normalization of ``Cx`` and the weighted covariances — a GLOBAL scalar
  per epoch. The IP normalizer ``w^H V w = 1`` re-pins every row's scale
  each epoch, so the padded trajectory stays a per-source scalar multiple
  of the unpadded one, and projection back (which rescales each source
  against the UNPADDED reference channel) cancels that scalar exactly.

Padding is PREPENDED, which extends exactness to the tap-augmented joint
family (tiss/tip): delayed copies of leading zero frames are themselves
zero, and the first real frames' taps reach back into zeros exactly as
the unpadded run's zero-fill does. Appended padding would place real data
in the padded frames' tap blocks.

NMF-family algorithms (ilrma, ilrma-t, fastmnmf*) are NOT
padding-invariant — their multiplicative-update denominators sum model
terms over frames without an ``|x|^2`` factor, so zero frames shift the
updates — and sparseauxiva's LASSO threshold is scale-absolute.
``SERVABLE`` lists the algorithms whose invariance is gated by
``tests/test_serving.py``; anything else requires
``allow_unverified=True`` (results are then merely plausible, not
bit-matched to the unpadded run).
"""

from __future__ import annotations

import math
from collections import Counter

import numpy as np

from . import api
from .oracle.stft import stft_pad
from .registry import ALGORITHMS, get_algorithm

__all__ = ["SERVABLE", "Separator", "bucket_frames"]

# Padding-invariance of every name here is asserted against the unpadded
# pipeline by tests/test_serving.py::test_padding_invariance. Keep the two
# lists in sync when adding a family.
SERVABLE = (
    "auxiva",
    "auxiva-gauss",
    "auxiva-iss",
    "auxiva-iss-gauss",
    "overiva",
    "overiva-gauss",
    "overiva-iss",
    "overiva-iss-gauss",
    "overiva-ip2",
    "overiva-ip2-gauss",
    "auxiva_pca",
    "auxiva_pca-iss",
    "five",
    # joint dereverberation+separation: exact because padding is
    # PREPENDED — delayed tap copies of leading zero frames are zero, and
    # the first real frames' taps reach into zeros exactly like the
    # unpadded run's zero-fill (ilrma-t stays out: NMF model)
    "tiss",
    "tiss-gauss",
    "tip",
    "tip-gauss",
)


def bucket_frames(
    n_frames: int,
    min_frames: int = 32,
    ratio: float = 1.25,
    multiple: int = 8,
) -> int:
    """Smallest grid frame count >= n_frames.

    The grid starts at ``min_frames`` (rounded up to ``multiple``) and
    grows geometrically by ``ratio`` — compute cost is linear in frames,
    so worst-case padding overhead is ``ratio - 1`` while the number of
    distinct compiled shapes stays logarithmic in the clip-length range.
    """
    if n_frames <= 0:
        raise ValueError("n_frames must be positive")
    b = -(-int(min_frames) // multiple) * multiple
    while b < n_frames:
        b = -(-int(max(b * ratio, b + multiple)) // multiple) * multiple
    return b


class Separator:
    """Fixed-configuration separator for variable-length clips.

    One instance = one algorithm + STFT configuration; every clip routed
    through it reuses the per-bucket executables that jit already cached
    (the bucket grid is what makes the cache finite).

        sep = Separator("overiva", n_src=2, nfft=2048)
        y = sep.separate(x)          # x: (n_samples, n_chan) float
        # y: (n_samples, n_src) — same samples the unpadded pipeline yields

    ``algo_kwargs`` are forwarded to the registry runner on every clip
    (n_iter, model, wcov, ...). ``proj_back=False`` is rejected: projection
    back is what cancels the bucket-dependent global scale (module
    docstring) — without it outputs would differ from the unpadded run by
    a per-source scalar.

    Relationship to :func:`overiva_tpu.api.separate` (the one-XLA-program
    samples-to-samples path): that path is fastest for a FIXED clip shape;
    this class trades two extra host<->device transfers per clip for the
    explicit post-analysis frame zeroing that makes bucketed results
    exactly equal the unpadded pipeline's on every clip length.
    """

    def __init__(
        self,
        algo: str = "overiva",
        n_src: int | None = None,
        nfft: int = 2048,
        hop: int | None = None,
        dtype=None,
        min_frames: int = 32,
        bucket_ratio: float = 1.25,
        bucket_multiple: int = 8,
        allow_unverified: bool = False,
        **algo_kwargs,
    ):
        self.spec = get_algorithm(algo)
        if algo not in SERVABLE and not allow_unverified:
            raise ValueError(
                f"algorithm {algo!r} is not verified padding-invariant "
                f"(servable: {', '.join(SERVABLE)}); NMF-family updates "
                "change under zero-frame padding. Pass "
                "allow_unverified=True to serve it anyway."
            )
        if algo_kwargs.get("proj_back") is False:
            raise ValueError(
                "serving requires proj_back=True: projection back cancels "
                "the bucket-dependent covariance scale (see module docstring)"
            )
        if self.spec.single_output and n_src not in (None, 1):
            raise ValueError(f"{algo!r} always extracts one source")
        self.algo = algo
        self.n_src = n_src
        self.nfft = int(nfft)
        self.hop = int(hop or nfft // 2)
        self.dtype = dtype
        self.min_frames = int(min_frames)
        self.bucket_ratio = float(bucket_ratio)
        self.bucket_multiple = int(bucket_multiple)
        self.algo_kwargs = dict(algo_kwargs)
        self.stats = {
            "clips": 0,
            "frames_real": 0,
            "frames_padded": 0,
            "bucket_hits": Counter(),
        }

    # -- bucket plumbing ---------------------------------------------------

    def _bucket(self, n_frames: int) -> int:
        return bucket_frames(
            n_frames, self.min_frames, self.bucket_ratio, self.bucket_multiple
        )

    def n_buckets(self) -> int:
        """Distinct (frame-bucket, n_chan) shapes seen so far."""
        return len(self.stats["bucket_hits"])

    # -- the clip path -----------------------------------------------------

    def separate(self, x: np.ndarray) -> np.ndarray:
        """(n_samples, n_chan) float -> (n_samples, n_out) float.

        Output samples match the unpadded pipeline
        ``stft_synthesis(algo(stft_analysis(stft_pad(x))))`` trimmed back
        to the input span (tests/test_serving.py gates this per algorithm).
        """
        x = np.asarray(x)
        if x.ndim == 1:
            x = x[:, None]
        if x.ndim != 2:
            raise ValueError(f"expected (n_samples, n_chan), got {x.shape}")
        n, n_chan = x.shape
        nfft, hop = self.nfft, self.hop
        front = nfft - hop

        xp = stft_pad(x, nfft, hop)  # front zeros + frame completion
        t_real = (xp.shape[0] - nfft) // hop + 1
        t_bucket = self._bucket(t_real)
        t_pad = t_bucket - t_real
        # padding goes at the FRONT: a tap-augmented frame (tiss/tip)
        # stacks DELAYED copies, so leading zero frames stay zero in every
        # tap block, and the first real frames' taps reach back into zeros
        # exactly like the unpadded run's zero-fill — appended padding
        # would put real data in the padded frames' tap blocks and break
        # exactness for the joint family. The +hop-1 tail fixes the
        # per-bucket sample count when hop does not divide nfft (analysis
        # ignores samples past the last frame).
        n_bucket = (t_bucket - 1) * hop + nfft + (hop - 1)
        xb = np.zeros((n_bucket, n_chan), dtype=xp.dtype)
        xb[t_pad * hop : t_pad * hop + xp.shape[0]] = xp

        X = api.stft_analysis(xb, nfft, hop, dtype=self.dtype)
        # the last prepended frames straddle the padding/real boundary
        # (hop overlap) — zero them so padding frames are EXACTLY zero,
        # which is what the invariance argument needs
        X[:t_pad] = 0.0

        kw = dict(self.algo_kwargs)
        if self.dtype is not None:
            kw.setdefault("dtype", self.dtype)
        Y = self.spec(X, n_src=self.n_src, **kw)
        if isinstance(Y, tuple):  # return_filters=True passthrough
            Y = Y[0]
        if Y.ndim == 2:  # single-output extractors return (T, F)
            Y = Y[:, :, None]
        y = api.stft_synthesis(Y, nfft, hop, dtype=self.dtype)
        if y.ndim == 1:
            y = y[:, None]

        self.stats["clips"] += 1
        self.stats["frames_real"] += t_real
        self.stats["frames_padded"] += t_pad
        self.stats["bucket_hits"][(t_bucket, n_chan)] += 1
        start = t_pad * hop + front
        return y[start : start + n]

    def separate_batch(self, clips) -> list[np.ndarray]:
        """Separate a sequence of clips, fusing same-bucket clips.

        Clips are grouped by (frame bucket, n_chan); each group runs as
        ONE fused XLA program through the family's batched runner
        (``registry`` ``run_batch`` — gated elsewhere to match per-clip
        runs element-wise), so a traffic mix of similar lengths pays one
        dispatch per bucket instead of one per clip. Returns outputs in
        input order. ``algo_kwargs`` must be ones the family's batch
        runner accepts (no callbacks).
        """
        clips = [np.asarray(c) for c in clips]
        clips = [c[:, None] if c.ndim == 1 else c for c in clips]
        nfft, hop = self.nfft, self.hop
        front = nfft - hop
        kw = dict(self.algo_kwargs)
        if self.dtype is not None:
            kw.setdefault("dtype", self.dtype)

        groups: dict[tuple[int, int], list[int]] = {}
        prepped = []
        for i, x in enumerate(clips):
            if x.ndim != 2:
                raise ValueError(f"clip {i}: expected (n_samples, n_chan)")
            xp = stft_pad(x, nfft, hop)
            t_real = (xp.shape[0] - nfft) // hop + 1
            t_bucket = self._bucket(t_real)
            prepped.append((xp, t_real, t_bucket))
            groups.setdefault((t_bucket, x.shape[1]), []).append(i)

        out: list[np.ndarray | None] = [None] * len(clips)
        for (t_bucket, n_chan), idxs in groups.items():
            n_bucket = (t_bucket - 1) * hop + nfft + (hop - 1)
            xb = np.zeros((len(idxs), n_bucket, n_chan))
            for b, i in enumerate(idxs):
                xp, t_real, _ = prepped[i]
                t_pad = t_bucket - t_real
                xb[b, t_pad * hop : t_pad * hop + xp.shape[0]] = xp
            X = api.stft_analysis_batch(xb, nfft, hop, dtype=self.dtype)
            for b, i in enumerate(idxs):
                X[b, : t_bucket - prepped[i][1]] = 0.0
            Y = self.spec.run_batch(X, n_src=self.n_src, **kw)
            if Y.ndim == 3:  # single-output extractors return (B, T, F)
                Y = Y[:, :, :, None]
            y = api.stft_synthesis_batch(Y, nfft, hop, dtype=self.dtype)
            for b, i in enumerate(idxs):
                _, t_real, _ = prepped[i]
                t_pad = t_bucket - t_real
                start = t_pad * hop + front
                n = clips[i].shape[0]
                out[i] = y[b, start : start + n]
                self.stats["clips"] += 1
                self.stats["frames_real"] += t_real
                self.stats["frames_padded"] += t_pad
                self.stats["bucket_hits"][(t_bucket, n_chan)] += 1
        return out

    def _t_real_of(self, n_samples: int) -> int:
        """Frame count the clip path produces for an ``n_samples`` clip."""
        xp_len = stft_pad(np.empty(n_samples), self.nfft, self.hop).shape[0]
        return (xp_len - self.nfft) // self.hop + 1

    def warmup(self, n_chan: int, n_samples: int, seed: int = 0) -> int:
        """Pre-compile every bucket needed up to ``n_samples``.

        Runs seeded noise clips through each grid bucket up to the one
        covering ``n_samples`` so first real traffic hits warm executables.
        Returns the number of buckets touched.
        """
        rng = np.random.default_rng(seed)
        top = self._bucket(self._t_real_of(max(int(n_samples), self.nfft)))
        # walk clip lengths by a factor strictly below the bucket ratio so
        # no grid bucket is skipped; dedup by the bucket actually hit
        step = 1.0 + (self.bucket_ratio - 1.0) / 2.0
        n = self.nfft
        done: set[int] = set()
        while True:
            b = self._bucket(self._t_real_of(n))
            if b not in done:
                self.separate(rng.standard_normal((n, n_chan)))
                done.add(b)
            if b >= top:
                return len(done)
            n = int(math.ceil(n * step))
