"""Persistent XLA compilation cache setup.

Compiles through this environment's remote TPU compiler are slow (tens of
seconds to minutes) and highly variable; the JAX persistent cache works with
it (verified: second process reuses the executable), so every CLI entry
point enables it under the repo's ``.jax_cache/``.
"""

from __future__ import annotations

from pathlib import Path

__all__ = ["enable_persistent_cache"]

_DEFAULT = Path(__file__).resolve().parent.parent.parent / ".jax_cache"


def enable_persistent_cache(path: str | Path | None = None) -> Path:
    import jax

    path = Path(path) if path else _DEFAULT
    path.mkdir(parents=True, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", str(path))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    return path
