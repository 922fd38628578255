"""Honest HBM bandwidth + matmul-stream microbenchmarks.

Every iteration depends on the previous one's result (a 1e-30-scaled
perturbation of the input), so XLA can neither hoist the body out of the
scan (LICM/CSE) nor overlap iterations unrealistically. The reduce walks
DIFFERENT slices per iteration, so no caching effect can hide re-reads.
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np


def sync(x):
    return np.asarray(x)


def main():
    key = jax.random.PRNGKey(0)

    # ---- pure-read bandwidth: chained reduce over 16 x 64MiB slices ----
    CH, N = 16, 32 * 1024 * 1024  # bf16 elements per slice (64 MiB)
    a = jax.random.normal(key, (CH, N), jnp.bfloat16)

    @jax.jit
    def red(a, c0):
        def body(c, i):
            s = jnp.sum(a[i].astype(jnp.float32)) + c * 1e-30
            return s, None

        return jax.lax.scan(body, c0, jnp.arange(CH))[0]

    sync(red(a, jnp.float32(0)))
    t0 = time.perf_counter()
    sync(red(a, jnp.float32(1)))
    dt = time.perf_counter() - t0
    print(f"chained reduce {a.nbytes>>20} MiB: {dt*1e3:.2f} ms -> "
          f"{a.nbytes/dt/1e9:.0f} GB/s", flush=True)

    # ---- skinny matmul stream (decode shape), serially dependent ----
    for B in (8, 32):
        I, O = 4096, 16384  # 128 MiB bf16 weights
        x = jax.random.normal(key, (B, I), jnp.bfloat16)
        w = jax.random.normal(key, (I, O), jnp.bfloat16)
        iters = 20

        @jax.jit
        def mm(x, w):
            def body(x, _):
                y = x @ w  # [B, O]
                x2 = x * (1 + y[0, 0].astype(x.dtype) * 1e-30)
                return x2, None

            return jax.lax.scan(body, x, None, length=iters)[0]

        sync(mm(x, w))
        t0 = time.perf_counter()
        sync(mm(x, w))
        dt = (time.perf_counter() - t0) / iters
        print(f"chained skinny matmul B={B} {w.nbytes>>20} MiB weights: "
              f"{dt*1e3:.3f} ms/iter -> {w.nbytes/dt/1e9:.0f} GB/s", flush=True)


if __name__ == "__main__":
    main()
