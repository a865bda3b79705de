"""Benchmark: OverIVA iteration throughput at the BASELINE config.

Measures fused OverIVA iterations/sec at M=8 mics, N=3 sources, 4096-pt STFT
(F=2049 bins), T=128 frames (~16 s of 16 kHz audio) on the default JAX device
(real TPU under the driver). Prints ONE JSON line:

    {"metric": ..., "value": ..., "unit": ..., "vs_baseline": ...}

vs_baseline is against the BASELINE.json target of 100 iterations/sec on one
v5e chip (the reference publishes no machine numbers — BASELINE.md).
"""

import json
import time

import numpy as np


def main():
    import jax

    from overiva_tpu.api import _prepare
    from overiva_tpu.models.overiva import overiva_iterations
    from overiva_tpu.utils.cache import enable_persistent_cache

    enable_persistent_cache()

    T, F, M, N = 128, 2049, 8, 3
    N_ITER = 30

    rng = np.random.default_rng(0)
    re = rng.standard_normal((T, F, M)).astype(np.float32)
    im = rng.standard_normal((T, F, M)).astype(np.float32)
    # speech-like temporal gating so activations are realistic
    gate = np.where(rng.random(T) < 0.5, 1.0, 0.1).astype(np.float32)
    re *= gate[:, None, None]
    im *= gate[:, None, None]

    import jax.numpy as jnp

    X = jax.jit(lambda r, i: r + 1j * i)(re, im)
    W0 = jax.jit(lambda x: x[:0])(X)  # empty placeholder
    W_hat, Cx = _prepare(X, W0, N, False, True, False)

    # block_until_ready does not actually block on the axon backend — force a
    # host fetch of a scalar to synchronize
    fetch = jax.jit(lambda w: jnp.sum(w.real))

    def sync(w):
        return float(np.asarray(fetch(w)))

    # warmup: compile + the axon tunnel's slow first execution
    W = overiva_iterations(X, W_hat, Cx, N, N_ITER, "laplace")
    sync(W)

    best = np.inf
    for _ in range(3):
        t0 = time.perf_counter()
        W = overiva_iterations(X, W_hat, Cx, N, N_ITER, "laplace")
        sync(W)
        best = min(best, time.perf_counter() - t0)

    # never record a timing for a broken program
    re_w, im_w = jax.jit(lambda w: (w.real, w.imag))(W)
    assert np.isfinite(np.asarray(re_w)).all() and np.isfinite(np.asarray(im_w)).all(), (
        "benchmark produced non-finite demixing filters"
    )

    value = N_ITER / best
    print(
        json.dumps(
            {
                "metric": "overiva_iters_per_sec_M8_N3_F2049",
                "value": round(value, 2),
                "unit": "iter/s",
                "vs_baseline": round(value / 100.0, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
