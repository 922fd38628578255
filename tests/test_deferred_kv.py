"""Deferred KV commit (round 4): attention reads this step's tokens from
a VMEM tail and the cache write is ONE batched all-layer scatter pair
(ops.attention.write_kv_all_layers) instead of a scatter pair per layer.

Invariant: the deferred path is TOKEN-IDENTICAL to the immediate
write-then-attend path — the tail is pre-encoded to the cache dtype so
attention sees exactly what a write-then-read would. These tests pin:
 1. write_kv_all_layers == per-layer write_kv_layer, every cache dtype;
 2. XLA-path attention with tail == write-then-attend;
 3. the Pallas kernel's tail mode (interpret) == write-then-kernel;
 4. engine level: VOT_DEFER_KV=1 emits the same tokens as =0 (greedy,
    sampled, speculative).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vllm_omni_draft_tpu.ops import quant as quant_ops
from vllm_omni_draft_tpu.ops.attention import (
    AttentionMetadata,
    attention_at_layer,
    encode_kv,
    write_kv_all_layers,
    write_kv_layer,
)


def _mk(seed=0, L=3, NB=8, BS=4, Hkv=2, D=8, cache_dtype=jnp.bfloat16):
    rng = np.random.default_rng(seed)
    k_cache = jnp.asarray(
        rng.standard_normal((L, NB, BS, Hkv, D)), jnp.float32
    ).astype(cache_dtype)
    v_cache = jnp.asarray(
        rng.standard_normal((L, NB, BS, Hkv, D)), jnp.float32
    ).astype(cache_dtype)
    return rng, k_cache, v_cache


@pytest.mark.parametrize("cache_dtype", [jnp.bfloat16, jnp.int8, "fp8"])
def test_write_all_layers_matches_per_layer(cache_dtype):
    if cache_dtype == "fp8":
        cache_dtype = quant_ops.FP8_DTYPE
    L, NB, BS, Hkv, D, B, T = 3, 8, 4, 2, 8, 2, 3
    rng, k_cache, v_cache = _mk(cache_dtype=cache_dtype, L=L, NB=NB, BS=BS,
                                Hkv=Hkv, D=D)
    kv_scale = 0.5
    k_new = jnp.asarray(rng.standard_normal((L, B, T, Hkv, D)), jnp.bfloat16)
    v_new = jnp.asarray(rng.standard_normal((L, B, T, Hkv, D)), jnp.bfloat16)
    slots = jnp.asarray([[5, 6, 7], [13, -1, 14]], jnp.int32)

    ka, va = k_cache, v_cache
    for lyr in range(L):
        ka, va = write_kv_layer(ka, va, k_new[lyr], v_new[lyr], slots,
                                jnp.int32(lyr), kv_scale=kv_scale)

    k_enc = jnp.stack([
        encode_kv(k_new[lyr], v_new[lyr], k_cache.dtype, kv_scale)[0]
        for lyr in range(L)
    ])
    v_enc = jnp.stack([
        encode_kv(k_new[lyr], v_new[lyr], k_cache.dtype, kv_scale)[1]
        for lyr in range(L)
    ])
    kb, vb = write_kv_all_layers(k_cache, v_cache, k_enc, v_enc, slots)

    np.testing.assert_array_equal(
        np.asarray(ka).view(np.uint8), np.asarray(kb).view(np.uint8)
    )
    np.testing.assert_array_equal(
        np.asarray(va).view(np.uint8), np.asarray(vb).view(np.uint8)
    )


@pytest.mark.parametrize("cache_dtype", [jnp.bfloat16, jnp.int8])
def test_xla_attention_tail_matches_write_then_attend(cache_dtype):
    L, NB, BS, Hkv, D, B, T, G = 2, 8, 4, 2, 8, 3, 3, 2
    rng, k_cache, v_cache = _mk(cache_dtype=cache_dtype, L=L, NB=NB, BS=BS,
                                Hkv=Hkv, D=D)
    kv_scale = 1.0
    Hq = Hkv * G
    q = jnp.asarray(rng.standard_normal((B, T, Hq, D)), jnp.bfloat16)
    k_new = jnp.asarray(rng.standard_normal((B, T, Hkv, D)), jnp.bfloat16)
    v_new = jnp.asarray(rng.standard_normal((B, T, Hkv, D)), jnp.bfloat16)

    # seqs: lens incl. new tokens; row 2 is a padding row
    kv_lens = jnp.asarray([7, 5, 0], jnp.int32)
    bt = jnp.asarray([[1, 2], [3, 4], [0, 0]], jnp.int32)
    pos = jnp.stack([
        kv_lens[b] - T + jnp.arange(T, dtype=jnp.int32) for b in range(B)
    ])
    pos = jnp.where(kv_lens[:, None] > 0, pos, -1)
    flat_bt = bt * BS
    slots = jnp.where(
        pos >= 0, flat_bt[jnp.arange(B)[:, None], pos // BS] + pos % BS, -1
    )
    meta = AttentionMetadata(block_tables=bt, kv_lens=kv_lens,
                             positions=pos, slot_mapping=slots)

    lyr = jnp.int32(1)
    ka, va = write_kv_layer(k_cache, v_cache, k_new, v_new, slots, lyr,
                            kv_scale=kv_scale)
    out_imm = attention_at_layer(q, ka, va, lyr, meta, 0.3,
                                 kv_scale=kv_scale, backend="xla")

    k_enc, v_enc = encode_kv(k_new, v_new, k_cache.dtype, kv_scale)
    out_def = attention_at_layer(q, k_cache, v_cache, lyr, meta, 0.3,
                                 kv_scale=kv_scale, backend="xla",
                                 k_new=k_enc, v_new=v_enc)
    np.testing.assert_allclose(
        np.asarray(out_imm, np.float32), np.asarray(out_def, np.float32),
        rtol=0, atol=0,
    )


@pytest.mark.parametrize("cache_dtype", [jnp.bfloat16, jnp.int8, "fp8"])
def test_pallas_kernel_tail_matches_write_then_kernel(cache_dtype, monkeypatch):
    if cache_dtype == "fp8":
        cache_dtype = quant_ops.FP8_DTYPE
    from vllm_omni_draft_tpu.ops.pallas import paged_attention as pa
    import jax.experimental.pallas as pl

    orig_call = pl.pallas_call
    monkeypatch.setattr(
        pl, "pallas_call",
        lambda *a, **kw: orig_call(*a, **{**kw, "interpret": True}),
    )

    L, NB, BS, Hkv, D, B, T, G = 2, 10, 4, 2, 128, 3, 3, 2
    rng, k_cache, v_cache = _mk(cache_dtype=cache_dtype, L=L, NB=NB, BS=BS,
                                Hkv=Hkv, D=D)
    kv_scale = 0.7
    Hq = Hkv * G
    q = jnp.asarray(rng.standard_normal((B, T, Hq, D)), jnp.bfloat16)
    k_new = jnp.asarray(rng.standard_normal((B, T, Hkv, D)), jnp.bfloat16)
    v_new = jnp.asarray(rng.standard_normal((B, T, Hkv, D)), jnp.bfloat16)

    kv_lens = jnp.asarray([11, 4, 0], jnp.int32)  # row 2 padding
    bt = jnp.asarray([[1, 2, 3], [4, 5, 0], [0, 0, 0]], jnp.int32)
    pos = jnp.stack([
        kv_lens[b] - T + jnp.arange(T, dtype=jnp.int32) for b in range(B)
    ])
    pos = jnp.where(kv_lens[:, None] > 0, pos, -1)
    slots = jnp.where(
        pos >= 0,
        bt[jnp.arange(B)[:, None], pos // BS] * BS + pos % BS, -1,
    )
    lyr = jnp.int32(0)

    ka, va = write_kv_layer(k_cache, v_cache, k_new, v_new, slots, lyr,
                            kv_scale=kv_scale)
    base = pa.paged_attention_pallas(
        q, ka, va, bt, kv_lens, 0.3, kv_scale=kv_scale, layer=lyr,
        chunk_blocks=1,
    )
    k_enc, v_enc = encode_kv(k_new, v_new, k_cache.dtype, kv_scale)
    got = pa.paged_attention_pallas(
        q, k_cache, v_cache, bt, kv_lens, 0.3, kv_scale=kv_scale, layer=lyr,
        chunk_blocks=1, k_new=k_enc, v_new=v_enc,
    )
    np.testing.assert_allclose(
        np.asarray(base, np.float32), np.asarray(got, np.float32),
        rtol=0, atol=2e-2,
    )
    # padding row emits zeros
    assert np.all(np.asarray(got[2]) == 0)


# ---------------------------------------------------------------------------
# engine level: deferred vs immediate, token-for-token
# ---------------------------------------------------------------------------


def _engine(defer: bool, monkeypatch, spec: bool):
    from vllm_omni_draft_tpu.config import (
        CacheConfig, EngineConfig, ModelConfig, SchedulerConfig,
        SpeculativeConfig,
    )
    from vllm_omni_draft_tpu.core.engine import EngineCore

    monkeypatch.setenv("VOT_DEFER_KV", "1" if defer else "0")
    draft = ModelConfig.tiny(
        vocab_size=512, hidden_size=32, intermediate_size=64,
        num_heads=2, num_kv_heads=2, head_dim=16, max_model_len=128,
    )
    return EngineCore(EngineConfig(
        model=ModelConfig.tiny(
            vocab_size=512, hidden_size=64, intermediate_size=128,
            num_heads=4, num_kv_heads=2, head_dim=16, max_model_len=128,
        ),
        cache=CacheConfig(block_size=8, num_blocks=128),
        scheduler=SchedulerConfig(
            max_num_seqs=4, max_num_batched_tokens=128,
            prefill_buckets=(16,), max_model_len=128,
        ),
        speculative=SpeculativeConfig(draft_model=draft,
                                      num_speculative_tokens=3) if spec
        else None,
        seed=0,
    ))


def _run_tokens(engine, temperature):
    from vllm_omni_draft_tpu.core.request import Request, SamplingParams

    rng = np.random.default_rng(7)
    sp = SamplingParams(max_tokens=24, temperature=temperature,
                        top_k=32 if temperature else 0,
                        top_p=0.95 if temperature else 1.0,
                        ignore_eos=True)
    for i in range(3):
        engine.add_request(Request(
            request_id=f"d{i}",
            prompt_token_ids=rng.integers(1, 500, size=5 + 3 * i).tolist(),
            sampling_params=sp,
        ))
    while engine.has_unfinished():
        engine.step()
    return {
        r.request_id: list(r.output_token_ids)
        for r in engine.scheduler.requests.values()
    }


@pytest.mark.parametrize("spec", [False, True])
@pytest.mark.parametrize("temperature", [0.0, 0.8])
def test_engine_deferred_matches_immediate(spec, temperature, monkeypatch):
    toks_imm = _run_tokens(_engine(False, monkeypatch, spec), temperature)
    toks_def = _run_tokens(_engine(True, monkeypatch, spec), temperature)
    assert toks_imm == toks_def
