"""Weighted-covariance tier micro-benchmark (DESIGN §2c r5 evidence).

Isolates the wcov op — the stage the §2c r4 arithmetic said the packed
bf16 Pallas kernel makes ~6x cheaper — from the epoch it lives in, at
the T=512 headline config. Method: `lax.scan` over a stack of DISTINCT
phi vectors, accumulating a scalar of each V — every step's work feeds
the output (no dead-code elimination) and no two steps share a phi (no
hoisting). A multiply-by-zero "chain" was tried first and was folded to
nothing by XLA's simplifier — timings from that shape of probe are
garbage; this stack form is the trustworthy one.

Answers: does the kernel win AT THE OP, and what does Amdahl leave for
the EPOCH?

Run on the v5e:  python bench/exp_wcov_tiers.py
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
from jax import lax

from overiva_tpu.ops.covariance import weighted_covariance_all
from overiva_tpu.ops.pallas_wcov import pack_planes, wcov_packed

T, F, M, N = 512, 2049, 8, 3
REPS = 20


def timed(thunk, repeats=3):
    out = thunk()
    float(np.asarray(out))
    best = np.inf
    for _ in range(repeats):
        t0 = time.perf_counter()
        out = thunk()
        float(np.asarray(out))
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    rng = np.random.default_rng(0)
    re = rng.standard_normal((T, F, M)).astype(np.float32)
    im = rng.standard_normal((T, F, M)).astype(np.float32)
    X = jax.jit(lambda r, i: r + 1j * i)(re, im)
    phis = jnp.asarray(rng.random((REPS, T, N)).astype(np.float32) + 0.1)

    def stack_loop(step):
        # the data tensor enters as a jit ARGUMENT (closure capture would
        # embed the complex tensor as an mlir constant, which the axon
        # backend cannot transfer)
        def body(acc, ph):
            V = step(ph)
            return acc + jnp.real(V[0][:, 0, 0].sum()), None

        return lambda phs: lax.scan(body, jnp.float32(0.0), phs)[0]

    for mode in ("f32", "f32x3", "bf16"):
        fn = jax.jit(
            lambda x, phs, m=mode: stack_loop(
                lambda ph: weighted_covariance_all(x, ph, m)
            )(phs)
        )
        t = timed(lambda: fn(X, phis))
        print(f"wcov_all {mode:8s}: {t/REPS*1e3:7.3f} ms per N={N} pass")

    # packed kernel: planes packed ONCE (epoch-constant, as in the epoch)
    xr, xi, Fp = pack_planes(X)
    fn_pk = jax.jit(
        lambda pr, pi, phs: stack_loop(
            lambda ph: wcov_packed((pr, pi, Fp), ph, F, T)
        )(phs)
    )
    t = timed(lambda: fn_pk(xr, xi, phis))
    print(f"wcov_packed bf16 : {t/REPS*1e3:7.3f} ms per N={N} pass")

    # traffic bound: one X read (c64 planes) at ~0.8 TB/s
    xb = T * F * M * 8
    print(f"\nX: {xb/1e6:.0f} MB; single read = {xb/0.8e12*1e3:.3f} ms; "
          f"f32 path traffic (X read + phiX write+read per source) ~ "
          f"{(1+2*N)*xb/0.8e12*1e3:.3f} ms")


if __name__ == "__main__":
    main()
