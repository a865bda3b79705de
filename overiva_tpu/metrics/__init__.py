"""Separation-quality metrics (in-repo bss_eval; mir_eval-compatible API)."""

from .bss_eval import BssEvalReferences, bss_eval_images, bss_eval_sources

__all__ = ["BssEvalReferences", "bss_eval_images", "bss_eval_sources"]
