"""Quantization accuracy gate: Δperplexity between full-precision and
quantized weights (BASELINE.json: Δppl ≤ 0.1 for INT8, ≤ 0.3 for INT4 at
7B scale; this CPU gate runs the same measurement on the tiny test model
as a numerics regression test — INT8 must be near-exact, INT4 bounded)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vllm_omni_draft_tpu.config import ModelConfig
from vllm_omni_draft_tpu.models import qwen2
from vllm_omni_draft_tpu.models.weights import quantize_params
from vllm_omni_draft_tpu.ops.attention import AttentionMetadata


def _ppl(cfg, params, tokens):
    """Teacher-forced perplexity over a [B, T] token batch."""
    B, T = tokens.shape
    fwd = qwen2.make_forward(cfg)
    bs = 16
    nb = -(-T // bs)
    kv = qwen2.init_kv_cache(cfg, num_blocks=B * nb + 1, block_size=bs)
    table = (
        np.arange(B)[:, None] * nb + np.arange(nb)[None, :] + 1
    ).astype(np.int32)
    pos = np.broadcast_to(np.arange(T, dtype=np.int32), (B, T))
    slots = table[:, pos[0] // bs] * bs + pos % bs
    meta = AttentionMetadata(
        block_tables=jnp.asarray(table),
        kv_lens=jnp.full((B,), T, jnp.int32),
        positions=jnp.asarray(pos),
        slot_mapping=jnp.asarray(slots.astype(np.int32)),
    )
    hidden, _ = fwd(params, jnp.asarray(tokens), meta.positions, kv, meta)
    logits = qwen2.compute_logits(cfg, params, hidden.reshape(B * T, -1))
    logp = jax.nn.log_softmax(logits.reshape(B, T, -1), axis=-1)
    # predict token t+1 from position t
    tgt = tokens[:, 1:]
    nll = -jnp.take_along_axis(logp[:, :-1], jnp.asarray(tgt)[..., None], axis=-1)
    return float(jnp.exp(jnp.mean(nll)))


@pytest.fixture(scope="module")
def setup():
    cfg = ModelConfig.tiny(
        vocab_size=512, hidden_size=64, intermediate_size=128,
        num_heads=4, num_kv_heads=2, head_dim=16, max_model_len=256,
    )
    params = qwen2.init_params(cfg, jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)
    tokens = rng.integers(0, 512, size=(4, 64)).astype(np.int32)
    base = _ppl(cfg, params, tokens)
    return cfg, params, tokens, base


def test_int8_ppl_delta(setup):
    cfg, params, tokens, base = setup
    q = quantize_params(params, "int8")
    ppl = _ppl(cfg, params | {k: q[k] for k in q}, tokens)
    ppl_q = _ppl(cfg, q, tokens)
    # int8 per-channel on a tiny model: essentially lossless
    assert abs(ppl_q - base) / base < 0.02, (base, ppl_q)


def test_int4_ppl_delta(setup):
    cfg, params, tokens, base = setup
    q = quantize_params(params, "int4", group_size=32)
    ppl_q = _ppl(cfg, q, tokens)
    # int4 group-wise: bounded degradation
    assert abs(ppl_q - base) / base < 0.15, (base, ppl_q)


@pytest.mark.parametrize("kv_dtype", ["fp8", "int8"])
def test_quantized_kv_ppl_delta(setup, kv_dtype):
    cfg, params, tokens, base = setup
    import dataclasses

    cfg8 = dataclasses.replace(cfg, kv_cache_dtype=kv_dtype)
    ppl8 = _ppl(cfg8, params, tokens)
    assert abs(ppl8 - base) / base < 0.05, (base, ppl8)


def test_lm_head_padding_inert(setup):
    """pad_out_rows pads the quantized lm_head with zero-scale rows;
    compute_logits must slice back to the real vocab and the padded rows
    must not change any logit."""
    import jax.numpy as jnp

    from vllm_omni_draft_tpu.models import qwen2
    from vllm_omni_draft_tpu.ops import quant as quant_ops

    cfg, params, tokens, _ = setup
    q = quantize_params(params, "int8")
    assert "lm_head" in q
    padded = q["lm_head"]
    assert padded["w"].shape[0] % 512 == 0
    assert padded["w"].shape[0] >= cfg.vocab_size
    hidden = jnp.ones((3, cfg.hidden_size), jnp.float32)
    logits = qwen2.compute_logits(cfg, q, hidden)
    assert logits.shape == (3, cfg.vocab_size)
    # unpadded head gives identical logits
    unpadded = {k: v[: cfg.vocab_size] for k, v in padded.items()}
    logits_ref = qwen2.compute_logits(cfg, {**q, "lm_head": unpadded}, hidden)
    import numpy as np

    np.testing.assert_allclose(
        np.asarray(logits), np.asarray(logits_ref), rtol=1e-6, atol=1e-6
    )
