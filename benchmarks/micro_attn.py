"""Microbenchmark: paged-attention kernel cost per decode iteration
(28-layer loop over a 5-D cache) at several batch sizes — isolates the
serial-over-B grid cost that shows up in engine steps at B=32."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from vllm_omni_draft_tpu.ops.pallas import paged_attention as pa


def main():
    BS = int(os.environ.get("BS", "16"))
    L, NB, Hkv, D = 28, 1057 * 16 // BS, 4, 128
    Hq = 28
    ctx = int(os.environ.get("CTX", "512"))
    T = int(os.environ.get("T", "1"))
    key = jax.random.PRNGKey(0)
    dt_name = os.environ.get("DTYPE", "bfloat16")  # bfloat16 | int8 | fp8
    kv_dtype = {
        "bfloat16": jnp.bfloat16,
        "int8": jnp.int8,
        "fp8": jnp.float8_e4m3fn,
    }[dt_name]
    k_cache = jax.random.normal(key, (L, NB, BS, Hkv, D), jnp.bfloat16)
    v_cache = jax.random.normal(key, (L, NB, BS, Hkv, D), jnp.bfloat16)
    if kv_dtype == jnp.int8:
        k_cache = (k_cache * 32).astype(jnp.int8)
        v_cache = (v_cache * 32).astype(jnp.int8)
    elif kv_dtype != jnp.bfloat16:
        k_cache = k_cache.astype(kv_dtype)
        v_cache = v_cache.astype(kv_dtype)

    b_list = tuple(
        int(x) for x in os.environ.get("B", "8,16,32").split(",")
    )
    for B in b_list:
        nb_per = ctx // BS
        bt = np.zeros((B, 32), np.int32)
        rng = np.random.default_rng(0)
        for b in range(B):
            bt[b, :nb_per] = rng.permutation(NB)[:nb_per]
        bt = jnp.asarray(bt)
        kv_lens = jnp.full((B,), ctx, jnp.int32)
        q = jax.random.normal(key, (B, T, Hq, D), jnp.bfloat16)

        @jax.jit
        def run(q, k_cache, v_cache, bt, kv_lens):
            def body(c, layer):
                spp = os.environ.get("SPP")
                slots = os.environ.get("SLOTS")
                o = pa.paged_attention_pallas(
                    q, k_cache, v_cache, bt, kv_lens, 0.0883,
                    chunk_blocks=int(os.environ.get("CHUNK", "8")),
                    seqs_per_program=int(spp) if spp else None,
                    num_slots=int(slots) if slots else None,
                    layer=layer,
                )
                return c + o[0, 0, 0, 0].astype(jnp.float32), None

            return jax.lax.scan(
                body, jnp.float32(0), jnp.arange(L, dtype=jnp.int32)
            )[0]

        np.asarray(run(q, k_cache, v_cache, bt, kv_lens))
        t0 = time.perf_counter()
        reps = 5
        for _ in range(reps):
            r = run(q, k_cache, v_cache, bt, kv_lens)
        np.asarray(r)
        dt = (time.perf_counter() - t0) / reps
        # HBM bytes actually needed: B*ctx*Hkv*D*2(KV)*2(bf16)*L
        bytes_needed = B * ctx * Hkv * D * 2 * 2 * L
        print(
            f"B={B:3d} T={T} ctx={ctx}: {dt*1e3:7.2f} ms per 28-layer iter "
            f"({dt/L*1e6:6.1f} us/layer, {bytes_needed/dt/1e9:6.0f} GB/s eff)",
            flush=True,
        )


if __name__ == "__main__":
    main()
