"""Pipeline-parallel stage execution: parity with the single-device
forward (reference capability: inter-stage IntermediateTensors handoff,
`/root/reference/src/doc/VLLM_V1_Interface.md:157` — here a shard_map
microbatch pipeline over a "pp" mesh axis, parallel/pipeline.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vllm_omni_draft_tpu.config import ModelConfig
from vllm_omni_draft_tpu.models import qwen2
from vllm_omni_draft_tpu.ops.attention import AttentionMetadata
from vllm_omni_draft_tpu.parallel.pipeline import (
    make_pipeline_forward,
    make_pp_mesh,
    shard_kv_pp,
    shard_params_pp,
)


def _cfg(num_layers=4):
    return ModelConfig.tiny(num_layers=num_layers)


def _decode_meta(B, block_size, max_blocks, kv_len):
    """Every sequence has kv_len-1 committed tokens and appends 1."""
    table = np.zeros((B, max_blocks), np.int32)
    n_blocks = -(-kv_len // block_size)
    for b in range(B):
        table[b, :n_blocks] = 1 + b * n_blocks + np.arange(n_blocks)
    pos = np.full((B, 1), kv_len - 1, np.int32)
    slots = np.zeros((B, 1), np.int32)
    for b in range(B):
        t = kv_len - 1
        slots[b, 0] = table[b, t // block_size] * block_size + t % block_size
    return AttentionMetadata(
        block_tables=jnp.asarray(table),
        kv_lens=jnp.full((B,), kv_len, jnp.int32),
        positions=jnp.asarray(pos),
        slot_mapping=jnp.asarray(slots),
    )


def _prefill_then_inputs(cfg, B, T0, num_blocks, block_size):
    """Build a populated cache by running a T0-token prefill through the
    REFERENCE forward, returning (params, kv_after_prefill, decode meta,
    token_ids, positions)."""
    rng = np.random.default_rng(0)
    params = qwen2.init_params(cfg, jax.random.PRNGKey(0))
    fwd = qwen2.make_forward(cfg)
    kv = qwen2.init_kv_cache(cfg, num_blocks=num_blocks, block_size=block_size)
    max_blocks = 8
    table = np.zeros((B, max_blocks), np.int32)
    n_blocks = -(-(T0 + 1) // block_size)
    for b in range(B):
        table[b, :n_blocks] = 1 + b * n_blocks + np.arange(n_blocks)
    slots = np.zeros((B, T0), np.int32)
    for b in range(B):
        for t in range(T0):
            slots[b, t] = table[b, t // block_size] * block_size + t % block_size
    meta0 = AttentionMetadata(
        block_tables=jnp.asarray(table),
        kv_lens=jnp.full((B,), T0, jnp.int32),
        positions=jnp.tile(jnp.arange(T0, dtype=jnp.int32)[None], (B, 1)),
        slot_mapping=jnp.asarray(slots),
    )
    prompt = rng.integers(1, cfg.vocab_size, size=(B, T0)).astype(np.int32)
    _, kv = fwd(params, jnp.asarray(prompt), meta0.positions, kv, meta0)
    # decode step: one new token per sequence at position T0
    tok = rng.integers(1, cfg.vocab_size, size=(B, 1)).astype(np.int32)
    meta1_table = table
    slots1 = np.zeros((B, 1), np.int32)
    for b in range(B):
        slots1[b, 0] = (
            meta1_table[b, T0 // block_size] * block_size + T0 % block_size
        )
    meta1 = AttentionMetadata(
        block_tables=jnp.asarray(meta1_table),
        kv_lens=jnp.full((B,), T0 + 1, jnp.int32),
        positions=jnp.full((B, 1), T0, jnp.int32),
        slot_mapping=jnp.asarray(slots1),
    )
    return params, kv, meta1, jnp.asarray(tok), meta1.positions


@pytest.mark.parametrize("pp,microbatches", [(2, 2), (4, 2), (2, 1)])
def test_pipeline_forward_matches_single_device(pp, microbatches):
    if pp > jax.device_count():
        pytest.skip("not enough devices")
    cfg = _cfg(num_layers=4)
    B, T0 = 4, 6
    params, kv, meta, tok, pos = _prefill_then_inputs(cfg, B, T0, 64, 8)

    ref_fwd = qwen2.make_forward(cfg)
    ref_h, ref_kv = ref_fwd(params, tok, pos, jax.tree.map(jnp.copy, kv), meta)

    mesh = make_pp_mesh(pp)
    pparams = shard_params_pp(params, mesh)
    pkv = shard_kv_pp(jax.tree.map(jnp.copy, kv), mesh)
    pp_fwd = make_pipeline_forward(cfg, pp, microbatches, mesh)
    pp_h, pp_kv = jax.jit(pp_fwd)(pparams, tok, pos, pkv, meta)

    np.testing.assert_allclose(
        np.asarray(ref_h), np.asarray(pp_h), rtol=2e-5, atol=2e-5
    )
    # the KV written by the decode step must match too (per layer)
    np.testing.assert_allclose(
        np.asarray(ref_kv["k"]), np.asarray(pp_kv["k"]), rtol=2e-5, atol=2e-5
    )
    np.testing.assert_allclose(
        np.asarray(ref_kv["v"]), np.asarray(pp_kv["v"]), rtol=2e-5, atol=2e-5
    )


def test_pipeline_logits_tokens_match():
    """End of the line: greedy tokens from pipelined logits equal the
    single-device ones."""
    if jax.device_count() < 2:
        pytest.skip("not enough devices")
    cfg = _cfg(num_layers=4)
    B, T0 = 4, 5
    params, kv, meta, tok, pos = _prefill_then_inputs(cfg, B, T0, 64, 8)
    ref_fwd = qwen2.make_forward(cfg)
    ref_h, _ = ref_fwd(params, tok, pos, jax.tree.map(jnp.copy, kv), meta)
    ref_logits = qwen2.compute_logits(cfg, params, ref_h[:, -1])

    mesh = make_pp_mesh(2)
    pp_fwd = make_pipeline_forward(cfg, 2, 2, mesh)
    pp_h, _ = jax.jit(pp_fwd)(
        shard_params_pp(params, mesh), tok, pos,
        shard_kv_pp(jax.tree.map(jnp.copy, kv), mesh), meta,
    )
    pp_logits = qwen2.compute_logits(cfg, params, pp_h[:, -1])
    assert (
        np.asarray(jnp.argmax(ref_logits, -1))
        == np.asarray(jnp.argmax(pp_logits, -1))
    ).all()


def test_pipeline_validates_divisibility():
    cfg = _cfg(num_layers=4)
    with pytest.raises(ValueError, match="divisible"):
        make_pipeline_forward(cfg, 3, 1, make_pp_mesh(1))
