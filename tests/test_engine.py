"""Engine integration tests: continuous batching, chunked prefill, prefix
caching, preemption, stop conditions, and spec-decode losslessness —
all CPU, tiny random models (reference test strategy, SURVEY.md §4)."""

import json
import os

import numpy as np
import pytest

from vllm_omni_draft_tpu.config import (
    CacheConfig,
    EngineConfig,
    ModelConfig,
    SchedulerConfig,
    SpeculativeConfig,
)
from vllm_omni_draft_tpu.core.request import OutputKind, SamplingParams
from vllm_omni_draft_tpu.engine.llm import LLM

TINY_HF = dict(
    vocab_size=128,
    hidden_size=32,
    intermediate_size=64,
    num_hidden_layers=2,
    num_attention_heads=4,
    num_key_value_heads=2,
    max_position_embeddings=256,
    rope_theta=10000.0,
    rms_norm_eps=1e-6,
    tie_word_embeddings=False,
)


@pytest.fixture(scope="module")
def hf_checkpoint(tmp_path_factory):
    torch = pytest.importorskip("torch")
    from transformers import Qwen2Config, Qwen2ForCausalLM
    from safetensors.torch import save_file

    path = tmp_path_factory.mktemp("tiny_qwen2_eng")
    cfg = Qwen2Config(**TINY_HF)
    torch.manual_seed(0)
    model = Qwen2ForCausalLM(cfg).eval().to(torch.float32)
    save_file(
        {k: v.contiguous() for k, v in model.state_dict().items()},
        os.path.join(path, "model.safetensors"),
    )
    with open(os.path.join(path, "config.json"), "w") as f:
        json.dump({**TINY_HF, "model_type": "qwen2"}, f)
    return str(path), model


def _config(path, **kw):
    return EngineConfig(
        model=ModelConfig.from_hf_config(path, dtype="float32", max_model_len=128),
        cache=CacheConfig(block_size=4, num_blocks=kw.pop("num_blocks", 256),
                          num_cpu_blocks=kw.pop("num_cpu_blocks", 0)),
        scheduler=SchedulerConfig(
            max_num_seqs=kw.pop("max_num_seqs", 4),
            max_num_batched_tokens=kw.pop("max_num_batched_tokens", 64),
            prefill_buckets=(16, 64),
        ),
        speculative=kw.pop("speculative", None),
        seed=0,
        **kw,
    )


def _hf_greedy(model, prompt_ids, n):
    import torch

    with torch.no_grad():
        out = model.generate(
            torch.tensor([prompt_ids]),
            max_new_tokens=n,
            do_sample=False,
            pad_token_id=0,
        )
    return out[0, len(prompt_ids) :].tolist()


GREEDY = lambda n: SamplingParams(max_tokens=n, temperature=0.0, ignore_eos=True)


def test_batch_greedy_matches_hf(hf_checkpoint):
    path, hf = hf_checkpoint
    llm = LLM(_config(path))
    rng = np.random.default_rng(0)
    prompts = [rng.integers(1, 100, size=n).tolist() for n in (5, 11, 23)]
    outs = llm.generate(prompts, [GREEDY(8)] * 3)
    for p, o in zip(prompts, outs):
        assert o.finished
        assert o.outputs[0].token_ids == _hf_greedy(hf, p, 8), p


def test_chunked_prefill_matches_hf(hf_checkpoint):
    path, hf = hf_checkpoint
    llm = LLM(_config(path, max_num_batched_tokens=16))
    rng = np.random.default_rng(1)
    prompt = rng.integers(1, 100, size=50).tolist()  # forces 4 chunks
    out = llm.generate([prompt], [GREEDY(6)])[0]
    assert out.outputs[0].token_ids == _hf_greedy(hf, prompt, 6)


def test_prefix_caching_hits_and_matches(hf_checkpoint):
    path, hf = hf_checkpoint
    llm = LLM(_config(path))
    rng = np.random.default_rng(2)
    prompt = rng.integers(1, 100, size=33).tolist()
    out1 = llm.generate([prompt], [GREEDY(5)])[0]
    out2 = llm.generate([prompt], [GREEDY(5)])[0]
    assert out2.num_cached_tokens >= 16  # whole blocks of 4, minus last
    assert out1.outputs[0].token_ids == out2.outputs[0].token_ids
    assert out1.outputs[0].token_ids == _hf_greedy(hf, prompt, 5)


def test_preemption_recovers(hf_checkpoint):
    path, hf = hf_checkpoint
    # tiny pool: 3 requests of ~30+ tokens can't all fit at once
    llm = LLM(_config(path, num_blocks=24, max_num_seqs=3))
    rng = np.random.default_rng(3)
    prompts = [rng.integers(1, 100, size=20).tolist() for _ in range(3)]
    outs = llm.generate(prompts, [GREEDY(12)] * 3)
    assert llm.engine.scheduler.stats.num_preempted_total > 0, (
        "test should actually force preemption"
    )
    for p, o in zip(prompts, outs):
        assert o.outputs[0].token_ids == _hf_greedy(hf, p, 12)


def test_preemption_swaps_to_host_pool(hf_checkpoint):
    """With num_cpu_blocks > 0, preempted requests save their KV blocks to
    the host pool and resume by restoring them (no prefill recompute) —
    the vLLM swap capability (`VLLM_V1_Interface.md:64`). Outputs must be
    identical to the recompute path (= HF greedy)."""
    path, hf = hf_checkpoint
    llm = LLM(_config(path, num_blocks=24, max_num_seqs=3, num_cpu_blocks=64))
    rng = np.random.default_rng(3)
    prompts = [rng.integers(1, 100, size=20).tolist() for _ in range(3)]
    outs = llm.generate(prompts, [GREEDY(12)] * 3)
    stats = llm.engine.scheduler.stats
    assert stats.num_preempted_total > 0, "test should force preemption"
    assert stats.num_swapped_out_total > 0, "preemptions should swap out"
    assert stats.num_swapped_in_total == stats.num_swapped_out_total
    # pool accounting balanced, no host arrays leaked
    assert llm.engine.scheduler.cpu_blocks_free == 64
    assert not llm.engine._swap_store
    for p, o in zip(prompts, outs):
        assert o.outputs[0].token_ids == _hf_greedy(hf, p, 12)


def test_swap_pool_too_small_falls_back_to_recompute(hf_checkpoint):
    """A CPU pool smaller than a victim's block count must fall back to
    recompute-preemption, still producing exact outputs."""
    path, hf = hf_checkpoint
    llm = LLM(_config(path, num_blocks=24, max_num_seqs=3, num_cpu_blocks=1))
    rng = np.random.default_rng(3)
    prompts = [rng.integers(1, 100, size=20).tolist() for _ in range(3)]
    outs = llm.generate(prompts, [GREEDY(12)] * 3)
    stats = llm.engine.scheduler.stats
    assert stats.num_preempted_total > 0
    assert stats.num_swapped_out_total == 0  # victims never fit 1 block
    for p, o in zip(prompts, outs):
        assert o.outputs[0].token_ids == _hf_greedy(hf, p, 12)


def test_stop_token_and_max_tokens(hf_checkpoint):
    path, hf = hf_checkpoint
    llm = LLM(_config(path))
    prompt = [5, 6, 7, 8]
    ref = _hf_greedy(hf, prompt, 10)
    stop_tok = ref[3]
    out = llm.generate(
        [prompt],
        [SamplingParams(max_tokens=10, temperature=0.0, stop_token_ids=(stop_tok,))],
    )[0]
    assert out.outputs[0].finish_reason == "stop"
    assert out.outputs[0].token_ids == ref[: 4]  # includes the stop token


def test_sampled_generation_reproducible_across_batching(hf_checkpoint):
    path, _ = hf_checkpoint
    llm = LLM(_config(path))
    prompt = [3, 1, 4, 1, 5]
    sp = SamplingParams(max_tokens=6, temperature=0.8, top_p=0.9, ignore_eos=True)
    out = llm.generate([prompt], [sp])[0]
    assert len(out.outputs[0].token_ids) == 6
    assert all(0 <= t < TINY_HF["vocab_size"] for t in out.outputs[0].token_ids)


def test_batch_queue_pipelined_matches_hf(hf_checkpoint):
    """step_with_batch_queue (PP batch queue / lag-1 overlap,
    `engine_core.md:97, 124-126`): two in-flight slot-disjoint batches must
    produce exactly the sequential greedy output."""
    path, hf = hf_checkpoint
    cfg = _config(path, max_num_seqs=4)
    cfg.scheduler.max_concurrent_batches = 2
    # one request per batch so the queue actually pipelines
    cfg.scheduler.max_num_batched_tokens = 16
    llm = LLM(cfg)
    assert llm.engine.step_fn == llm.engine.step_with_batch_queue
    rng = np.random.default_rng(11)
    prompts = [rng.integers(1, 100, size=n).tolist() for n in (5, 9, 13)]
    outs = llm.generate(prompts, [GREEDY(10)] * 3)
    for p, o in zip(prompts, outs):
        assert o.outputs[0].token_ids == _hf_greedy(hf, p, 10), p
    assert not llm.engine.batch_queue


# ---------------------------------------------------------------------------
# speculative decoding
# ---------------------------------------------------------------------------


def _draft_checkpoint(tmp_path_factory, seed):
    torch = pytest.importorskip("torch")
    from transformers import Qwen2Config, Qwen2ForCausalLM
    from safetensors.torch import save_file

    cfg_kw = dict(TINY_HF, num_hidden_layers=1, hidden_size=16, intermediate_size=32,
                  num_attention_heads=2, num_key_value_heads=1)
    path = tmp_path_factory.mktemp(f"tiny_draft_{seed}")
    torch.manual_seed(seed)
    model = Qwen2ForCausalLM(Qwen2Config(**cfg_kw)).eval().to(torch.float32)
    save_file(
        {k: v.contiguous() for k, v in model.state_dict().items()},
        os.path.join(path, "model.safetensors"),
    )
    with open(os.path.join(path, "config.json"), "w") as f:
        json.dump({**cfg_kw, "model_type": "qwen2"}, f)
    return str(path)


@pytest.mark.parametrize("k", [1, 3])
def test_spec_decode_greedy_is_exactly_lossless(hf_checkpoint, tmp_path_factory, k):
    """Greedy spec decode must equal target-only greedy decode token-for-
    token, no matter how bad the draft is (BASELINE.json correctness gate)."""
    path, hf = hf_checkpoint
    draft_path = _draft_checkpoint(tmp_path_factory, seed=99)
    spec = SpeculativeConfig(
        draft_model=ModelConfig.from_hf_config(draft_path, dtype="float32",
                                               max_model_len=128),
        num_speculative_tokens=k,
    )
    llm = LLM(_config(path, speculative=spec))
    rng = np.random.default_rng(4)
    prompts = [rng.integers(1, 100, size=n).tolist() for n in (7, 19)]
    outs = llm.generate(prompts, [GREEDY(12)] * 2)
    for p, o in zip(prompts, outs):
        assert o.outputs[0].token_ids == _hf_greedy(hf, p, 12), p
    stats = llm.get_stats()["spec_decode"]
    assert stats.num_draft_tokens > 0


def test_spec_decode_quantized_draft_is_lossless(hf_checkpoint, tmp_path_factory):
    """An int8-quantized draft is just another (worse) proposal
    distribution: greedy spec output must still equal target-only greedy
    exactly (losslessness never depends on draft quality; quantizing the
    draft halves its weight-bandwidth cost per proposal step)."""
    path, hf = hf_checkpoint
    draft_path = _draft_checkpoint(tmp_path_factory, seed=99)
    spec = SpeculativeConfig(
        draft_model=ModelConfig.from_hf_config(draft_path, dtype="float32",
                                               max_model_len=128,
                                               quantization="int8"),
        num_speculative_tokens=3,
    )
    llm = LLM(_config(path, speculative=spec))
    rng = np.random.default_rng(4)
    prompts = [rng.integers(1, 100, size=n).tolist() for n in (7, 19)]
    outs = llm.generate(prompts, [GREEDY(12)] * 2)
    for p, o in zip(prompts, outs):
        assert o.outputs[0].token_ids == _hf_greedy(hf, p, 12), p
    stats = llm.get_stats()["spec_decode"]
    assert stats.num_draft_tokens > 0


@pytest.mark.parametrize("temperature", [0.0, 0.8])
def test_spec_decode_pruned_draft_vocab_is_lossless(
    hf_checkpoint, tmp_path_factory, temperature
):
    """A draft restricted to a vocab prefix (draft_vocab_size) is still a
    valid proposal distribution: greedy output must STILL equal target-only
    greedy exactly; sampled output must only contain valid ids and the
    emitted proposals must come from the prefix or be target corrections."""
    path, hf = hf_checkpoint
    draft_path = _draft_checkpoint(tmp_path_factory, seed=99)
    spec = SpeculativeConfig(
        draft_model=ModelConfig.from_hf_config(draft_path, dtype="float32",
                                               max_model_len=128),
        num_speculative_tokens=3,
        draft_vocab_size=32,  # vocab is 128: prune to a quarter
    )
    llm = LLM(_config(path, speculative=spec))
    rng = np.random.default_rng(4)
    prompts = [rng.integers(1, 100, size=n).tolist() for n in (7, 19)]
    if temperature == 0.0:
        outs = llm.generate(prompts, [GREEDY(12)] * 2)
        for p, o in zip(prompts, outs):
            assert o.outputs[0].token_ids == _hf_greedy(hf, p, 12), p
    else:
        sp = SamplingParams(max_tokens=12, temperature=temperature,
                            top_p=0.95, ignore_eos=True)
        outs = llm.generate(prompts, [sp] * 2)
        for o in outs:
            toks = o.outputs[0].token_ids
            assert len(toks) == 12
            assert all(0 <= t < TINY_HF["vocab_size"] for t in toks)
    stats = llm.get_stats()["spec_decode"]
    assert stats.num_draft_tokens > 0


def test_spec_decode_with_self_draft_accepts_everything(hf_checkpoint):
    """Draft == target ⇒ greedy proposals always match ⇒ acceptance 100%."""
    path, hf = hf_checkpoint
    spec = SpeculativeConfig(
        draft_model=ModelConfig.from_hf_config(path, dtype="float32",
                                               max_model_len=128),
        num_speculative_tokens=3,
    )
    llm = LLM(_config(path, speculative=spec))
    prompt = [11, 22, 33, 44, 55]
    out = llm.generate([prompt], [GREEDY(12)])[0]
    assert out.outputs[0].token_ids == _hf_greedy(hf, prompt, 12)
    stats = llm.get_stats()["spec_decode"]
    assert stats.acceptance_rate == pytest.approx(1.0)


def test_spec_decode_sampled_runs(hf_checkpoint, tmp_path_factory):
    path, _ = hf_checkpoint
    draft_path = _draft_checkpoint(tmp_path_factory, seed=7)
    spec = SpeculativeConfig(
        draft_model=ModelConfig.from_hf_config(draft_path, dtype="float32",
                                               max_model_len=128),
        num_speculative_tokens=2,
    )
    llm = LLM(_config(path, speculative=spec))
    sp = SamplingParams(max_tokens=10, temperature=0.7, top_p=0.95, ignore_eos=True)
    out = llm.generate([[1, 2, 3]], [sp])[0]
    assert len(out.outputs[0].token_ids) == 10


def test_spec_decode_unfiltered_draft_greedy_lossless(
    hf_checkpoint, tmp_path_factory
):
    """draft_sampling_filter=False (skip per-iter draft threshold
    searches): rejection sampling is lossless for ANY proposal q, so
    greedy output must still equal target-only greedy token-for-token,
    and the sampled path must still run."""
    path, hf = hf_checkpoint
    draft_path = _draft_checkpoint(tmp_path_factory, seed=7)
    spec = SpeculativeConfig(
        draft_model=ModelConfig.from_hf_config(draft_path, dtype="float32",
                                               max_model_len=128),
        num_speculative_tokens=2,
        draft_sampling_filter=False,
    )
    llm = LLM(_config(path, speculative=spec))
    prompt = [11, 22, 33, 44, 55]
    out = llm.generate([prompt], [GREEDY(12)])[0]
    assert out.outputs[0].token_ids == _hf_greedy(hf, prompt, 12)
    sp = SamplingParams(max_tokens=10, temperature=0.7, top_p=0.95,
                        top_k=32, ignore_eos=True)
    out = llm.generate([[1, 2, 3]], [sp])[0]
    assert len(out.outputs[0].token_ids) == 10


def test_n_greater_than_one_sampling(hf_checkpoint):
    """n>1 fan-out: one prompt, n completions in one RequestOutput
    (parent/child aggregation; children share prompt KV via prefix cache)."""
    path, hf = hf_checkpoint
    llm = LLM(_config(path, max_num_seqs=6))
    prompt = [3, 14, 15, 9, 26]
    sp = SamplingParams(n=3, max_tokens=6, temperature=0.8, top_p=0.9,
                        seed=0, ignore_eos=True)
    out = llm.generate([prompt], [sp])[0]
    assert len(out.outputs) == 3
    assert [c.index for c in out.outputs] == [0, 1, 2]
    assert all(len(c.token_ids) == 6 for c in out.outputs)
    # sampled children should not all be identical
    uniq = {tuple(c.token_ids) for c in out.outputs}
    assert len(uniq) >= 2

    # greedy n>1: all children identical, and match target-only greedy
    spg = SamplingParams(n=2, max_tokens=6, temperature=0.0, ignore_eos=True)
    outg = llm.generate([prompt], [spg])[0]
    ref = _hf_greedy(hf, prompt, 6)
    assert [c.token_ids for c in outg.outputs] == [ref, ref]


@pytest.mark.parametrize("kv_dtype", ["fp8", "int8"])
def test_quantized_kv_cache_engine(kv_dtype, hf_checkpoint):
    """Ladder config 3 shape on CPU: 1-byte KV (fp8 e4m3 / int8 fixed-point)
    through the whole engine — runs and stays close to the bf16-KV output
    (quantization noise only)."""
    path, hf = hf_checkpoint
    cfg = _config(path)
    import dataclasses

    cfg = dataclasses.replace(cfg, model=dataclasses.replace(
        cfg.model, kv_cache_dtype=kv_dtype))
    llm = LLM(cfg)
    prompt = [7, 8, 9, 10, 11]
    out = llm.generate([prompt], [GREEDY(8)])[0]
    assert len(out.outputs[0].token_ids) == 8
    # most greedy tokens should survive fp8 KV noise on this tiny model
    ref = _hf_greedy(hf, prompt, 8)
    agree = sum(a == b for a, b in zip(out.outputs[0].token_ids, ref))
    assert agree >= 4, (out.outputs[0].token_ids, ref)


# ---------------------------------------------------------------------------
# pooling / encode (reference: AsyncLLM.generate()/encode(),
# engine_core.md:187, 800-813)
# ---------------------------------------------------------------------------


def test_encode_pooling(hf_checkpoint):
    path, _ = hf_checkpoint
    llm = LLM(_config(path))
    outs = llm.encode(["hello world", "hi"])
    assert len(outs) == 2
    for o in outs:
        assert o.finished
        assert o.data.shape == (TINY_HF["hidden_size"],)
        assert o.data.dtype == np.float32
    # bucket padding is inert: the same prompt through a bigger bucket
    # yields the same embedding
    ids = llm.tokenizer.encode("hello world")
    e_small = llm.engine.runner.encode(ids)
    e_big = llm.engine.runner.encode(ids + [0] * 0)  # same bucket sanity
    big_bucket = llm.engine.runner._make_encode_fn(64)
    import jax.numpy as jnp

    toks = np.zeros((1, 64), np.int32)
    toks[0, : len(ids)] = ids
    mean_big, _ = big_bucket(
        llm.engine.runner.target_params, jnp.asarray(toks), jnp.int32(len(ids))
    )
    np.testing.assert_allclose(e_small, np.asarray(mean_big), rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(e_small, e_big, rtol=0, atol=0)
    # last-token pooling differs from mean for multi-token prompts
    e_last = llm.engine.runner.encode(ids, pooling="last")
    assert e_last.shape == e_small.shape


def test_async_encode(hf_checkpoint):
    import asyncio

    from vllm_omni_draft_tpu.engine.async_llm import AsyncLLM

    path, _ = hf_checkpoint
    allm = AsyncLLM(_config(path))

    async def run():
        out = await allm.encode("hello world")
        return out

    out = asyncio.run(run())
    allm.shutdown()
    assert out.data.shape == (TINY_HF["hidden_size"],)


# ---------------------------------------------------------------------------
# lag-1 decode streak (async scheduling)
# ---------------------------------------------------------------------------


def _gen_tokens(path, prompts, sps, *, streak, spec=None, decode_steps=1,
                max_tokens_budget=64):
    cfg = _config(path, speculative=spec,
                  max_num_batched_tokens=max(
                      max_tokens_budget,
                      4 * decode_steps
                      * (1 + (spec.num_speculative_tokens if spec else 0)),
                  ))
    cfg.scheduler.decode_steps = decode_steps
    cfg.scheduler.async_decode_streak = streak
    llm = LLM(cfg)
    outs = llm.generate(prompts, sps)
    return [o.outputs[0].token_ids for o in outs], llm


@pytest.mark.parametrize("decode_steps", [1, 4])
def test_streak_greedy_identical_to_sync(hf_checkpoint, decode_steps):
    """Lag-1 streak must emit token-for-token what the synchronous path
    emits (a streak of S steps == one fused S*M decode)."""
    path, hf = hf_checkpoint
    rng = np.random.default_rng(7)
    prompts = [rng.integers(1, 100, size=n).tolist() for n in (5, 11, 8)]
    sps = [GREEDY(17)] * 3
    got_on, llm_on = _gen_tokens(path, prompts, sps, streak=True,
                                 decode_steps=decode_steps)
    got_off, _ = _gen_tokens(path, prompts, sps, streak=False,
                             decode_steps=decode_steps)
    assert got_on == got_off
    for p, toks in zip(prompts, got_on):
        assert toks == _hf_greedy(hf, p, 17), p
    # the streak actually engaged (pending state was used at least once)
    assert llm_on.engine.config.scheduler.async_decode_streak


def test_streak_sampled_identical_to_sync(hf_checkpoint):
    path, _ = hf_checkpoint
    rng = np.random.default_rng(13)
    prompts = [rng.integers(1, 100, size=n).tolist() for n in (6, 9)]
    sps = [SamplingParams(max_tokens=15, temperature=0.9, top_p=0.95,
                          ignore_eos=True)] * 2
    got_on, _ = _gen_tokens(path, prompts, sps, streak=True, decode_steps=2)
    got_off, _ = _gen_tokens(path, prompts, sps, streak=False, decode_steps=2)
    assert got_on == got_off


def test_streak_spec_greedy_lossless(hf_checkpoint, tmp_path_factory):
    """Streak + spec decode: still exactly lossless vs HF greedy."""
    path, hf = hf_checkpoint
    draft_path = _draft_checkpoint(tmp_path_factory, seed=31)
    spec = SpeculativeConfig(
        draft_model=ModelConfig.from_hf_config(draft_path, dtype="float32",
                                               max_model_len=128),
        num_speculative_tokens=2,
    )
    rng = np.random.default_rng(17)
    prompts = [rng.integers(1, 100, size=n).tolist() for n in (7, 12)]
    sps = [GREEDY(14)] * 2
    got, _ = _gen_tokens(path, prompts, sps, streak=True, spec=spec,
                         decode_steps=2)
    for p, toks in zip(prompts, got):
        assert toks == _hf_greedy(hf, p, 14), p


def test_streak_breaks_for_admission(hf_checkpoint):
    """A request added mid-streak must still get scheduled (the streak
    yields to the waiting queue) and produce correct output."""
    path, hf = hf_checkpoint
    cfg = _config(path)
    cfg.scheduler.decode_steps = 2
    llm = LLM(cfg)
    eng = llm.engine
    rng = np.random.default_rng(23)
    p1 = rng.integers(1, 100, size=6).tolist()
    p2 = rng.integers(1, 100, size=9).tolist()
    from vllm_omni_draft_tpu.core.request import Request

    r1 = Request("r1", p1, GREEDY(20))
    eng.add_request(r1)
    # run a few steps so a streak is in flight, then add the second request
    for _ in range(4):
        eng.step()
    r2 = Request("r2", p2, GREEDY(10))
    eng.add_request(r2)
    while eng.has_unfinished():
        eng.step()
    assert r1.output_token_ids == _hf_greedy(hf, p1, 20)
    assert r2.output_token_ids == _hf_greedy(hf, p2, 10)


def test_streak_stop_token_truncates(hf_checkpoint):
    """EOS inside an in-flight streak step: output truncated at the stop
    token even though the device ran past it."""
    path, hf = hf_checkpoint
    ref = _hf_greedy(hf, [5, 17, 42, 9, 33], 24)
    stop = ref[9]
    cfg = _config(path)
    cfg.scheduler.decode_steps = 4
    llm = LLM(cfg)
    sp = SamplingParams(max_tokens=24, temperature=0.0, stop_token_ids=[stop])
    out = llm.generate([[5, 17, 42, 9, 33]], [sp])[0]
    toks = out.outputs[0].token_ids
    assert toks == ref[: ref.index(stop) + 1]


def test_batched_prefill_group_matches_hf(hf_checkpoint):
    """A cold burst admitted in ONE step groups N=8 prompt chunks into a
    single batched-prefill program (runner cap 2048//T rows, round-4
    row-tiled kernels); tokens must match HF greedy exactly, same as the
    one-at-a-time path."""
    path, hf = hf_checkpoint
    llm = LLM(_config(path, max_num_seqs=8, max_num_batched_tokens=512))
    rng = np.random.default_rng(7)
    prompts = [rng.integers(1, 100, size=n).tolist()
               for n in (9, 14, 16, 5, 12, 16, 7, 11)]
    outs = llm.generate(prompts, [GREEDY(6)] * 8)
    for p, o in zip(prompts, outs):
        assert o.finished
        assert o.outputs[0].token_ids == _hf_greedy(hf, p, 6), p
