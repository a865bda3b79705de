"""Filter checkpointing (SURVEY.md §5.4).

The reference's checkpoint/resume story is the (``return_filters=True``,
``W0=``) pair — every algorithm can emit its demixing filters and warm-start
from them. These helpers persist that state to disk (npz, complex-safe on
the host side) together with the configuration that produced it.
"""

from __future__ import annotations

import json
from pathlib import Path

import numpy as np

__all__ = ["save_filters", "load_filters"]


def save_filters(path, W, **meta) -> Path:
    """Save demixing filters W (any complex/real ndarray) + JSON metadata."""
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    W = np.asarray(W)
    np.savez(
        path,
        W_real=np.real(W),
        W_imag=np.imag(W),
        meta=json.dumps(meta),
    )
    # np.savez appends .npz when missing
    return path if path.suffix == ".npz" else Path(str(path) + ".npz")


def load_filters(path):
    """Returns (W, meta dict). W reconstructed as complex."""
    with np.load(path, allow_pickle=False) as z:
        W = z["W_real"] + 1j * z["W_imag"]
        meta = json.loads(str(z["meta"]))
    return W, meta
