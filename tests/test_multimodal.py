"""Multimodal (vision-token) prefill: encoder shapes, embedding splicing,
chunked-prefill consistency, prefix-cache namespacing, spec-decode with
images (ladder config 4 shape)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vllm_omni_draft_tpu.config import (
    CacheConfig,
    EngineConfig,
    ModelConfig,
    SchedulerConfig,
    SpeculativeConfig,
)
from vllm_omni_draft_tpu.core.request import SamplingParams
from vllm_omni_draft_tpu.engine.llm import LLM
from vllm_omni_draft_tpu.models.vision import (
    VisionConfig,
    VisionEncoder,
    build_mm_prompt,
)

IMG_TOKEN = 200  # inside the tiny test vocab (256+)


def _config(**kw):
    return EngineConfig(
        model=ModelConfig.tiny(vocab_size=258, max_model_len=128),
        cache=CacheConfig(block_size=4, num_blocks=128),
        scheduler=SchedulerConfig(
            max_num_seqs=4,
            max_num_batched_tokens=kw.pop("max_num_batched_tokens", 64),
            prefill_buckets=(16, 64),
        ),
        **kw,
    )


def _mm(embeds, key=None):
    return {
        "embeds": np.asarray(embeds, np.float32),
        "image_token_id": IMG_TOKEN,
        "cache_key": key,
    }


def _greedy(n=6):
    return SamplingParams(max_tokens=n, temperature=0.0, ignore_eos=True)


def test_vision_encoder_shapes_and_determinism():
    cfg = VisionConfig(patch_size=4, merge_size=2, hidden_size=32, depth=2,
                       num_heads=4, out_hidden_size=64)
    enc = VisionEncoder(cfg)
    img = jax.random.normal(jax.random.PRNGKey(0), (1, 3, 32, 32))
    out = enc.encode(img)
    assert out.shape == (enc.num_tokens(32, 32), 64)
    assert enc.num_tokens(32, 32) == 16  # (32/4/2)^2
    np.testing.assert_array_equal(np.asarray(out), np.asarray(enc.encode(img)))
    # spatial sensitivity: shifting content changes embeddings
    img2 = jnp.roll(img, 8, axis=3)
    assert np.abs(np.asarray(enc.encode(img2)) - np.asarray(out)).max() > 1e-4


def test_mm_prompt_layout():
    ids = build_mm_prompt([1, 2], 3, [9], image_pad_id=IMG_TOKEN)
    assert ids == [1, 2, IMG_TOKEN, IMG_TOKEN, IMG_TOKEN, 9]


def test_mm_embeddings_change_output():
    llm = LLM(_config())
    D = llm.engine.config.model.hidden_size
    prompt = build_mm_prompt([1, 2, 3], 4, [9, 10], image_pad_id=IMG_TOKEN)
    rng = np.random.default_rng(0)
    e1 = rng.normal(size=(4, D))
    e2 = rng.normal(size=(4, D))
    o1 = llm.generate([prompt], [_greedy()], mm_inputs=[_mm(e1, "img1")])[0]
    o2 = llm.generate([prompt], [_greedy()], mm_inputs=[_mm(e2, "img2")])[0]
    o1b = llm.generate([prompt], [_greedy()], mm_inputs=[_mm(e1, "img1b")])[0]
    assert o1.outputs[0].token_ids == o1b.outputs[0].token_ids  # deterministic
    assert o1.outputs[0].token_ids != o2.outputs[0].token_ids  # image matters


def test_mm_chunked_prefill_matches_single_chunk():
    prompt = build_mm_prompt(list(range(1, 9)), 12, list(range(20, 32)),
                             image_pad_id=IMG_TOKEN)  # 32 tokens
    rng = np.random.default_rng(1)
    e = rng.normal(size=(12, 64))
    big = LLM(_config(max_num_batched_tokens=64))
    small = LLM(_config(max_num_batched_tokens=16))  # image run spans chunks
    o_big = big.generate([prompt], [_greedy()], mm_inputs=[_mm(e, "c1")])[0]
    o_small = small.generate([prompt], [_greedy()], mm_inputs=[_mm(e, "c1")])[0]
    assert o_big.outputs[0].token_ids == o_small.outputs[0].token_ids


def test_prefix_cache_respects_image_content():
    """Same token ids, different image => must NOT share cached blocks."""
    llm = LLM(_config())
    prompt = build_mm_prompt([1, 2, 3, 4], 8, [5, 6, 7, 8],
                             image_pad_id=IMG_TOKEN)
    rng = np.random.default_rng(2)
    e1, e2 = rng.normal(size=(8, 64)), rng.normal(size=(8, 64))
    o1 = llm.generate([prompt], [_greedy()], mm_inputs=[_mm(e1, "imgA")])[0]
    o2 = llm.generate([prompt], [_greedy()], mm_inputs=[_mm(e2, "imgB")])[0]
    assert o2.num_cached_tokens == 0  # different image: no hits
    o3 = llm.generate([prompt], [_greedy()], mm_inputs=[_mm(e1, "imgA")])[0]
    assert o3.num_cached_tokens > 0  # same image: hits
    assert o3.outputs[0].token_ids == o1.outputs[0].token_ids


def test_mm_with_spec_decode_stays_lossless():
    """Greedy spec decode over a multimodal request must match the
    non-spec engine exactly (draft never sees the image — verify-side
    embeds only)."""
    prompt = build_mm_prompt([1, 2, 3], 4, [9], image_pad_id=IMG_TOKEN)
    rng = np.random.default_rng(3)
    e = rng.normal(size=(4, 64))
    base = LLM(_config())
    ref = base.generate([prompt], [_greedy(8)], mm_inputs=[_mm(e, "s1")])[0]

    spec = SpeculativeConfig(
        draft_model=ModelConfig.tiny(
            vocab_size=258, hidden_size=32, intermediate_size=64,
            num_heads=2, num_kv_heads=1, head_dim=16, max_model_len=128,
        ),
        num_speculative_tokens=2,
    )
    llm = LLM(_config(speculative=spec))
    got = llm.generate([prompt], [_greedy(8)], mm_inputs=[_mm(e, "s2")])[0]
    assert got.outputs[0].token_ids == ref.outputs[0].token_ids


def test_end_to_end_with_real_encoder():
    """pixels -> VisionEncoder -> prompt splice -> generate."""
    llm = LLM(_config())
    D = llm.engine.config.model.hidden_size
    enc = VisionEncoder(VisionConfig(patch_size=4, merge_size=2, hidden_size=32,
                                     depth=1, num_heads=4, out_hidden_size=D))
    img = jax.random.normal(jax.random.PRNGKey(0), (1, 3, 16, 16))
    embeds = np.asarray(enc.encode(img))
    n = embeds.shape[0]
    prompt = build_mm_prompt([1, 2], n, [3], image_pad_id=IMG_TOKEN)
    out = llm.generate([prompt], [_greedy(5)],
                       mm_inputs=[_mm(embeds, "real")])[0]
    assert len(out.outputs[0].token_ids) == 5


def test_mm_batched_prefill_matches_sequential():
    """Round-4 batched mm prefill: N image prompts admitted in ONE step
    must emit exactly the tokens of one-at-a-time admission (the
    batched program is token-identical to the per-request path)."""
    prompts, mms = [], []
    rng = np.random.default_rng(7)
    llm_probe = LLM(_config())
    D = llm_probe.engine.config.model.hidden_size
    for i in range(4):
        prompt = build_mm_prompt(
            [1 + i, 2, 3], 4, [9, 10 + i], image_pad_id=IMG_TOKEN
        )
        prompts.append(prompt)
        mms.append(_mm(rng.normal(size=(4, D)), f"bm{i}"))

    # sequential: tiny token budget admits one mm prefill per step
    seq_llm = LLM(_config(max_num_batched_tokens=16))
    seq = [
        seq_llm.generate([p], [_greedy(8)], mm_inputs=[m])[0]
        for p, m in zip(prompts, mms)
    ]
    # batched: all four admit in one step -> one grouped mm program
    bat_llm = LLM(_config(max_num_batched_tokens=256))
    bat = bat_llm.generate(prompts, [_greedy(8)] * 4, mm_inputs=mms)
    for s, b in zip(seq, bat):
        assert s.outputs[0].token_ids == b.outputs[0].token_ids
