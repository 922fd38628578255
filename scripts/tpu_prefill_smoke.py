"""Real-TPU smoke: Mosaic-compile + numeric check of paged_prefill_pallas.

Run: timeout 900 python scripts/tpu_prefill_smoke.py
"""
import numpy as np
import jax
import jax.numpy as jnp

from vllm_omni_draft_tpu.ops.attention import AttentionMetadata, paged_attention
from vllm_omni_draft_tpu.ops.pallas import paged_attention as pa


def main():
    print("devices:", jax.devices())
    Hq, Hkv, D, BS, NB = 28, 4, 128, 16, 128
    dtype = jnp.bfloat16
    for T, num_real, start in [(256, 256, 0), (512, 389, 117)]:
        kv_len = start + num_real
        key = jax.random.PRNGKey(T)
        q = jax.random.normal(key, (1, T, Hq, D), dtype)
        k_cache = jax.random.normal(jax.random.PRNGKey(1), (NB, BS, Hkv, D), dtype)
        v_cache = jax.random.normal(jax.random.PRNGKey(2), (NB, BS, Hkv, D), dtype)
        max_blocks = NB - 1
        tables = np.zeros((1, max_blocks), np.int32)
        perm = np.random.default_rng(0).permutation(np.arange(1, NB))
        nb_used = -(-kv_len // BS)
        tables[0, :nb_used] = perm[:nb_used]
        positions = np.where(
            np.arange(T) < num_real, start + np.arange(T), -1
        ).astype(np.int32)[None, :]
        meta = AttentionMetadata(
            block_tables=jnp.asarray(tables),
            kv_lens=jnp.asarray([kv_len], jnp.int32),
            positions=jnp.asarray(positions),
            slot_mapping=jnp.full((1, T), -1, jnp.int32),
        )
        scale = D**-0.5
        ref = paged_attention(q, k_cache, v_cache, meta, scale)
        out = pa.paged_prefill_pallas(
            q, k_cache, v_cache, meta.block_tables, meta.kv_lens[0],
            jnp.int32(num_real), scale,
        )
        o = np.asarray(out, np.float32)[0, :num_real]
        r = np.asarray(ref, np.float32)[0, :num_real]
        err = np.max(np.abs(o - r))
        print(f"T={T} num_real={num_real} start={start}: max_err={err:.5f}")
        assert err < 0.05, err
        if num_real < T:
            assert np.all(np.asarray(out, np.float32)[0, num_real:] == 0.0)
    print("PREFILL SMOKE OK")


if __name__ == "__main__":
    main()
