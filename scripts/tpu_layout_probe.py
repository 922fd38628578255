"""Probe: is a [.., BS, Hkv=4, D=128] HBM array physically padded to the
dtype's (sublane, lane) tile — (32,128) for 1-byte, (16,128) for bf16 —
making KV caches with a tiny second-minor dim cost 4-8x their logical
bytes of bandwidth? Times an elementwise add (reads+writes physical
bytes) over the 5-D layout vs a lane-flattened [.., BS, Hkv*D] layout.

Run on the real TPU: `timeout 600 python scripts/tpu_layout_probe.py`.
"""
import time

import jax
import jax.numpy as jnp
import numpy as np

L, NB, BS, H, D = 28, 64, 128, 4, 128  # 117 MB logical at 1 byte


def bench(shape, dtype, iters=30):
    x = jnp.zeros(shape, dtype)
    f = jax.jit(lambda a: a + 1)
    y = f(x)
    np.asarray(y.reshape(-1)[:8])  # force completion
    t0 = time.perf_counter()
    for _ in range(iters):
        y = f(y)
    np.asarray(y.reshape(-1)[:8])
    dt = (time.perf_counter() - t0) / iters
    logical = np.prod(shape) * np.dtype(dtype).itemsize
    gbps = 2 * logical / dt / 1e9
    return dt * 1e3, gbps


for dtype in (jnp.int8, jnp.bfloat16, jnp.float32):
    for shape, tag in (
        ((L, NB, BS, H, D), "5-D (.., 4, 128)"),
        ((L, NB, BS, H * D), "4-D (.., 512)  "),
    ):
        ms, gbps = bench(shape, dtype)
        print(f"{np.dtype(dtype).name:9s} {tag}: {ms:7.3f} ms/pass "
              f"{gbps:7.1f} GB/s apparent")
