"""Device mesh construction for multi-chip separation.

Mesh axes (SURVEY.md §2.4, §5.8):
- ``mix``  — data parallel over independent mixtures (the Monte-Carlo sweep
  axis; zero collectives)
- ``bins`` — frequency-bin "model parallel": bins are independent given the
  activations, so the hot loop's only collective is one small (T, N) psum of
  per-shard power over this axis per iteration.
"""

from __future__ import annotations

import numpy as np

import jax
from jax.sharding import Mesh

__all__ = ["make_mesh", "AXIS_MIX", "AXIS_BINS"]

AXIS_MIX = "mix"
AXIS_BINS = "bins"


def make_mesh(n_mix: int | None = None, n_bins: int | None = None, devices=None):
    """Build a ('mix', 'bins') mesh over the available devices.

    With no arguments, all devices go on the 'bins' axis (a single mixture
    separated as fast as possible). n_mix * n_bins must equal the device
    count when both given; a missing factor is inferred.
    """
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if n_mix is None and n_bins is None:
        n_mix, n_bins = 1, n
    elif n_mix is None:
        n_mix = n // n_bins
    elif n_bins is None:
        n_bins = n // n_mix
    if n_mix * n_bins != n:
        raise ValueError(f"mesh {n_mix}x{n_bins} != {n} devices")
    arr = np.asarray(devices).reshape(n_mix, n_bins)
    return Mesh(arr, (AXIS_MIX, AXIS_BINS))
