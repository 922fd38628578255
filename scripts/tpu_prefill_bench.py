"""Time Pallas prefill kernel vs XLA gather path, 7B-ish attention shape.

Run: PYTHONPATH=/root/repo:/root/.axon_site timeout 1800 python scripts/tpu_prefill_bench.py
"""
import time

import numpy as np
import jax
import jax.numpy as jnp

from vllm_omni_draft_tpu.ops.attention import AttentionMetadata, paged_attention
from vllm_omni_draft_tpu.ops.pallas import paged_attention as pa


def timeit(fn, *args, n=20):
    r = fn(*args)
    np.asarray(jax.tree.leaves(r)[0][0, 0, 0])  # sync
    t0 = time.perf_counter()
    for _ in range(n):
        r = fn(*args)
    np.asarray(jax.tree.leaves(r)[0][0, 0, 0])
    return (time.perf_counter() - t0) / n * 1e3


def main():
    Hq, Hkv, D, BS, NB = 28, 4, 128, 16, 1024
    dtype = jnp.bfloat16
    k_cache = jax.random.normal(jax.random.PRNGKey(1), (NB, BS, Hkv, D), dtype)
    v_cache = jax.random.normal(jax.random.PRNGKey(2), (NB, BS, Hkv, D), dtype)
    for T, kv_len in [(512, 512), (1024, 1024), (512, 4096)]:
        num_real = T
        start = kv_len - num_real
        q = jax.random.normal(jax.random.PRNGKey(T), (1, T, Hq, D), dtype)
        max_blocks = NB - 1
        tables = np.zeros((1, max_blocks), np.int32)
        nb_used = -(-kv_len // BS)
        tables[0, :nb_used] = np.arange(1, nb_used + 1)
        positions = (start + np.arange(T)).astype(np.int32)[None, :]
        meta = AttentionMetadata(
            block_tables=jnp.asarray(tables),
            kv_lens=jnp.asarray([kv_len], jnp.int32),
            positions=jnp.asarray(positions),
            slot_mapping=jnp.full((1, T), -1, jnp.int32),
        )
        scale = D**-0.5
        t_xla = timeit(lambda: paged_attention(q, k_cache, v_cache, meta, scale))
        t_pal = timeit(
            lambda: pa.paged_prefill_pallas(
                q, k_cache, v_cache, meta.block_tables, meta.kv_lens[0],
                jnp.int32(num_real), scale,
            )
        )
        print(f"T={T} kv={kv_len}: xla={t_xla:.2f}ms pallas={t_pal:.2f}ms "
              f"({t_xla / t_pal:.2f}x)")


if __name__ == "__main__":
    main()
