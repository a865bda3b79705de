"""Separation algorithm cores (trace-side JAX)."""
