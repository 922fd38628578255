"""Calibrate the scan-timing harness: dense bf16 XLA matmul vs Pallas
kernels at one 7B shape, two iteration counts, to separate fixed
per-iteration overhead from real kernel time."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from vllm_omni_draft_tpu.ops import quant as q
from vllm_omni_draft_tpu.ops.pallas import quant_matmul as qm


def timed(fn, *args, iters):
    @jax.jit
    def run(*a):
        def body(c, _):
            return c + fn(*a)[0, 0].astype(jnp.float32), None

        return jax.lax.scan(body, jnp.float32(0), None, length=iters)[0]

    np.asarray(run(*args))
    t0 = time.perf_counter()
    np.asarray(run(*args))
    return (time.perf_counter() - t0) / iters


def main():
    B, O, I = 8, 18944, 3584  # gate/up shape
    x = jax.random.normal(jax.random.PRNGKey(0), (B, I), jnp.bfloat16)
    w = jax.random.normal(jax.random.PRNGKey(1), (O, I), jnp.float32) / 60.0
    wbf = w.astype(jnp.bfloat16)
    q4 = q.quantize_int4(w, group_size=128)
    q8 = q.quantize_int8(w)

    dense = lambda x, w: x @ w.T
    for iters in (20, 100):
        t_d = timed(dense, x, wbf, iters=iters)
        t_8 = timed(qm.matmul_int8_pallas, x, q8["w"], q8["s"], iters=iters)
        t_4 = timed(qm.matmul_int4_pallas, x, q4["w"], q4["s"], iters=iters)
        print(
            f"iters={iters:4d} dense_bf16 {t_d*1e6:7.1f}us "
            f"({O*I*2/t_d/1e9:6.0f} GB/s)  int8 {t_8*1e6:7.1f}us "
            f"({O*I/t_8/1e9:6.0f} GB/s)  int4 {t_4*1e6:7.1f}us "
            f"({O*I/2/t_4/1e9:6.0f} GB/s)",
            flush=True,
        )


if __name__ == "__main__":
    main()
