"""Logits parity of the JAX Qwen2 against HF transformers (torch CPU).

The reference's accuracy surface is "whatever HF/vLLM compute for Qwen2.5"
(SURVEY.md §2.2); this is the CPU, random-weight version of that gate:
build a tiny HF Qwen2 with random weights, save safetensors, load through
our stacked-layout loader, and compare full-sequence logits.
"""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vllm_omni_draft_tpu.config import ModelConfig
from vllm_omni_draft_tpu.models import qwen2
from vllm_omni_draft_tpu.models.weights import load_params
from vllm_omni_draft_tpu.ops.attention import AttentionMetadata

TINY_HF = dict(
    vocab_size=128,
    hidden_size=32,
    intermediate_size=64,
    num_hidden_layers=2,
    num_attention_heads=4,
    num_key_value_heads=2,
    max_position_embeddings=128,
    rope_theta=10000.0,
    rms_norm_eps=1e-6,
    tie_word_embeddings=False,
)


@pytest.fixture(scope="module")
def hf_checkpoint(tmp_path_factory):
    torch = pytest.importorskip("torch")
    from transformers import Qwen2Config, Qwen2ForCausalLM
    from safetensors.torch import save_file

    path = tmp_path_factory.mktemp("tiny_qwen2")
    cfg = Qwen2Config(**TINY_HF)
    torch.manual_seed(0)
    model = Qwen2ForCausalLM(cfg).eval().to(torch.float32)
    sd = {k: v.contiguous() for k, v in model.state_dict().items()}
    save_file(sd, os.path.join(path, "model.safetensors"))
    with open(os.path.join(path, "config.json"), "w") as f:
        json.dump({**TINY_HF, "model_type": "qwen2"}, f)
    return str(path), model


def _full_prefill_meta(T: int, block_size: int, max_blocks: int):
    """Metadata for a single-sequence full prefill into blocks 1..n."""
    n_blocks = -(-T // block_size)
    table = np.zeros((1, max_blocks), np.int32)
    table[0, :n_blocks] = np.arange(1, n_blocks + 1)
    slots = np.full((1, T), -1, np.int32)
    for t in range(T):
        slots[0, t] = table[0, t // block_size] * block_size + t % block_size
    return AttentionMetadata(
        block_tables=jnp.asarray(table),
        kv_lens=jnp.asarray([T], jnp.int32),
        positions=jnp.arange(T, dtype=jnp.int32)[None, :],
        slot_mapping=jnp.asarray(slots),
    )


def test_logits_parity_with_hf(hf_checkpoint):
    torch = pytest.importorskip("torch")
    path, hf_model = hf_checkpoint
    cfg = ModelConfig.from_hf_config(path, dtype="float32")
    params = load_params(cfg)

    T = 17
    rng = np.random.default_rng(0)
    tokens = rng.integers(0, TINY_HF["vocab_size"], size=(1, T))

    with torch.no_grad():
        ref = hf_model(torch.tensor(tokens)).logits.numpy()  # [1, T, V]

    fwd = qwen2.make_forward(cfg)
    kv = qwen2.init_kv_cache(cfg, num_blocks=8, block_size=16)
    meta = _full_prefill_meta(T, 16, 7)
    hidden, _ = fwd(
        params,
        jnp.asarray(tokens, jnp.int32),
        meta.positions,
        kv,
        meta,
    )
    logits = qwen2.compute_logits(cfg, params, hidden[0])  # [T, V]
    np.testing.assert_allclose(np.asarray(logits), ref[0], rtol=2e-3, atol=2e-3)


def test_incremental_decode_matches_full_prefill(hf_checkpoint):
    """Prefill T tokens then decode one-by-one must reproduce the logits of
    a single full forward (exercises paged KV write + decode attention)."""
    path, _ = hf_checkpoint
    cfg = ModelConfig.from_hf_config(path, dtype="float32")
    params = load_params(cfg)
    fwd = qwen2.make_forward(cfg)

    T = 12
    rng = np.random.default_rng(1)
    tokens = rng.integers(0, TINY_HF["vocab_size"], size=(1, T)).astype(np.int32)

    # reference: full prefill
    kv = qwen2.init_kv_cache(cfg, num_blocks=8, block_size=4)
    meta = _full_prefill_meta(T, 4, 7)
    hidden_full, _ = fwd(params, jnp.asarray(tokens), meta.positions, kv, meta)
    ref_logits = np.asarray(qwen2.compute_logits(cfg, params, hidden_full[0]))

    # incremental: prefill first 5, then decode 7 single tokens
    kv = qwen2.init_kv_cache(cfg, num_blocks=8, block_size=4)
    P = 5
    n_blocks = -(-T // 4)
    table = np.zeros((1, 7), np.int32)
    table[0, :n_blocks] = np.arange(1, n_blocks + 1)

    def slot_of(t):
        return int(table[0, t // 4] * 4 + t % 4)

    meta_p = AttentionMetadata(
        block_tables=jnp.asarray(table),
        kv_lens=jnp.asarray([P], jnp.int32),
        positions=jnp.arange(P, dtype=jnp.int32)[None, :],
        slot_mapping=jnp.asarray([[slot_of(t) for t in range(P)]], jnp.int32),
    )
    hidden_p, kv = fwd(params, jnp.asarray(tokens[:, :P]), meta_p.positions, kv, meta_p)
    got = [np.asarray(qwen2.compute_logits(cfg, params, hidden_p[0]))]

    for t in range(P, T):
        meta_d = AttentionMetadata(
            block_tables=jnp.asarray(table),
            kv_lens=jnp.asarray([t + 1], jnp.int32),
            positions=jnp.asarray([[t]], jnp.int32),
            slot_mapping=jnp.asarray([[slot_of(t)]], jnp.int32),
        )
        hidden_d, kv = fwd(params, jnp.asarray(tokens[:, t : t + 1]), meta_d.positions, kv, meta_d)
        got.append(np.asarray(qwen2.compute_logits(cfg, params, hidden_d[0])))

    got_logits = np.concatenate(got, axis=0)  # [T, V]
    np.testing.assert_allclose(got_logits, ref_logits, rtol=2e-3, atol=2e-3)


def test_padding_rows_are_inert(hf_checkpoint):
    """Batch padding (positions=-1, kv_lens=0, slots=-1) must not disturb
    real rows — the static-shape discipline the engine relies on."""
    path, _ = hf_checkpoint
    cfg = ModelConfig.from_hf_config(path, dtype="float32")
    params = load_params(cfg)
    fwd = qwen2.make_forward(cfg)

    T = 6
    rng = np.random.default_rng(2)
    tokens = rng.integers(0, TINY_HF["vocab_size"], size=(1, T)).astype(np.int32)

    kv = qwen2.init_kv_cache(cfg, num_blocks=8, block_size=4)
    meta = _full_prefill_meta(T, 4, 7)
    hidden_ref, _ = fwd(params, jnp.asarray(tokens), meta.positions, kv, meta)

    # same computation with an extra padding row in the batch
    kv2 = qwen2.init_kv_cache(cfg, num_blocks=8, block_size=4)
    pad_tokens = np.concatenate([tokens, np.zeros((1, T), np.int32)], axis=0)
    meta2 = AttentionMetadata(
        block_tables=jnp.concatenate(
            [meta.block_tables, jnp.zeros((1, 7), jnp.int32)]
        ),
        kv_lens=jnp.asarray([T, 0], jnp.int32),
        positions=jnp.concatenate(
            [meta.positions, jnp.full((1, T), -1, jnp.int32)]
        ),
        slot_mapping=jnp.concatenate(
            [meta.slot_mapping, jnp.full((1, T), -1, jnp.int32)]
        ),
    )
    hidden_pad, _ = fwd(params, jnp.asarray(pad_tokens), meta2.positions, kv2, meta2)
    np.testing.assert_allclose(
        np.asarray(hidden_pad[0]), np.asarray(hidden_ref[0]), rtol=1e-4, atol=1e-4
    )


@pytest.mark.parametrize("quant", [None, "int8", "int4"])
def test_fused_projections_match_unfused(hf_checkpoint, quant):
    """fuse_projection_stacks (qkv / gate_up single matmuls) is a pure
    layout change: forward hidden states must match the unfused layout
    bit-for-bit in f32 (same dots, same order within each projection)."""
    from vllm_omni_draft_tpu.models.weights import (
        fuse_projection_stacks,
        quantize_params,
    )

    path, _ = hf_checkpoint
    cfg = ModelConfig.from_hf_config(path)
    cfg.dtype = "float32"
    params = load_params(cfg)
    if quant:
        params = quantize_params(params, quant, group_size=16)
    fwd = qwen2.make_forward(cfg)

    T = 6
    rng = np.random.default_rng(3)
    tokens = jnp.asarray(
        rng.integers(0, TINY_HF["vocab_size"], size=(1, T)).astype(np.int32)
    )
    meta = _full_prefill_meta(T, 4, 7)

    kv = qwen2.init_kv_cache(cfg, num_blocks=8, block_size=4)
    ref, _ = fwd(params, tokens, meta.positions, kv, meta)

    fused = fuse_projection_stacks(params)
    assert "q" not in fused["layers"] and "qkv" in fused["layers"]
    kv2 = qwen2.init_kv_cache(cfg, num_blocks=8, block_size=4)
    got, _ = fwd(fused, tokens, meta.positions, kv2, meta)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(ref), rtol=1e-5, atol=1e-5
    )


def test_multishard_checkpoint_loads(hf_checkpoint, tmp_path):
    """Multi-shard safetensors as transformers itself writes them
    (model-0000i-of-0000n.safetensors + index.json) must load through our
    loader and match the single-shard logits (VERDICT r1 item 1: the
    loader demonstrated on the real sharded format)."""
    torch = pytest.importorskip("torch")
    path, model = hf_checkpoint
    sharded = tmp_path / "sharded"
    model.save_pretrained(str(sharded), max_shard_size="40KB")
    shards = [f for f in os.listdir(sharded) if f.endswith(".safetensors")]
    assert len(shards) > 1, "fixture too small to shard; lower max_shard_size"
    assert (sharded / "model.safetensors.index.json").exists()

    cfg1 = ModelConfig.from_hf_config(path)
    cfg1.dtype = "float32"
    cfg2 = ModelConfig.from_hf_config(str(sharded))
    cfg2.dtype = "float32"
    p1, p2 = load_params(cfg1), load_params(cfg2)
    for a, b in zip(jax.tree.leaves(p1), jax.tree.leaves(p2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_save_hf_checkpoint_roundtrip(hf_checkpoint, tmp_path):
    """Our checkpoint WRITER (weights.save_hf_checkpoint, the 'state
    saving' EngineCore duty) roundtrips: save multi-shard -> load_params
    identical; and HF transformers can read the artifact."""
    torch = pytest.importorskip("torch")
    from transformers import Qwen2ForCausalLM

    from vllm_omni_draft_tpu.models.weights import save_hf_checkpoint

    path, model = hf_checkpoint
    cfg = ModelConfig.from_hf_config(path)
    cfg.dtype = "float32"
    params = load_params(cfg)

    out = tmp_path / "saved"
    save_hf_checkpoint(params, cfg, str(out), max_shard_bytes=50_000)
    shards = [f for f in os.listdir(out) if f.endswith(".safetensors")]
    assert len(shards) > 1

    cfg2 = ModelConfig.from_hf_config(str(out))
    cfg2.dtype = "float32"
    params2 = load_params(cfg2)
    for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(params2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # cross-ecosystem: HF loads our artifact and agrees with the source
    hf2 = Qwen2ForCausalLM.from_pretrained(str(out)).eval()
    sd1, sd2 = model.state_dict(), hf2.state_dict()
    for k in sd1:
        if k.endswith("rotary_emb.inv_freq"):
            continue
        assert torch.equal(sd1[k].float(), sd2[k].float()), k
