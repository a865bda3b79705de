"""Utilities: complex/float boundary packing, config plumbing."""
