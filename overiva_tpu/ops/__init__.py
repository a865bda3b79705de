"""Compute primitives: STFT, covariance, batched linalg, projection back."""
