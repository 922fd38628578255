"""Logprobs API: per-token top-k logprobs + the sampled token's logprob,
spec-decode coexistence, and prompt logprobs."""

import math

import numpy as np

from vllm_omni_draft_tpu.config import (
    CacheConfig,
    EngineConfig,
    ModelConfig,
    SchedulerConfig,
    SpeculativeConfig,
)
from vllm_omni_draft_tpu.core.request import SamplingParams
from vllm_omni_draft_tpu.engine.llm import LLM


def _llm(spec=False):
    speculative = None
    if spec:
        draft = ModelConfig.tiny(
            vocab_size=258, hidden_size=32, intermediate_size=64,
            num_heads=2, num_kv_heads=2, head_dim=8, max_model_len=128,
        )
        speculative = SpeculativeConfig(
            draft_model=draft, num_speculative_tokens=2
        )
    return LLM(EngineConfig(
        model=ModelConfig.tiny(vocab_size=258, max_model_len=128),
        cache=CacheConfig(block_size=4, num_blocks=64),
        scheduler=SchedulerConfig(max_num_seqs=4, max_num_batched_tokens=64,
                                  prefill_buckets=(16, 64)),
        speculative=speculative,
    ))


def test_logprobs_returned_per_token():
    llm = _llm()
    sp = SamplingParams(max_tokens=5, temperature=0.0, logprobs=3,
                        ignore_eos=True)
    out = llm.generate(["logprob test"], [sp])[0]
    comp = out.outputs[0]
    # first token comes from prefill (no logprobs yet); decode tokens have them
    assert comp.logprobs is not None
    assert len(comp.logprobs) >= len(comp.token_ids) - 1
    for tok, lp in zip(comp.token_ids[1:], comp.logprobs):
        assert tok in lp  # sampled token always present
        assert all(v <= 0.0 for v in lp.values())
        # greedy: sampled token's logprob is ~0 (one-hot distribution)
        assert math.isclose(lp[tok], 0.0, abs_tol=1e-3)


def test_logprobs_mixed_batch_only_requested():
    llm = _llm()
    sp_with = SamplingParams(max_tokens=4, temperature=0.7, logprobs=2,
                             ignore_eos=True)
    sp_without = SamplingParams(max_tokens=4, temperature=0.0, ignore_eos=True)
    outs = llm.generate(["a", "b"], [sp_with, sp_without])
    assert outs[0].outputs[0].logprobs
    assert outs[1].outputs[0].logprobs is None
    for lp in outs[0].outputs[0].logprobs:
        assert 2 <= len(lp) <= 3  # top-2 plus possibly the sampled token


def test_logprobs_coexist_with_spec_decode():
    """One logprobs request must NOT disable spec decode for the batch
    (VERDICT r1 item 8): draft tokens keep flowing, every row still gets
    its output, and the logprobs row gets per-token payloads."""
    llm = _llm(spec=True)
    sp_lp = SamplingParams(max_tokens=8, temperature=0.0, logprobs=3,
                           ignore_eos=True)
    sp_free = SamplingParams(max_tokens=8, temperature=0.0, ignore_eos=True)
    outs = llm.generate(["alpha", "beta"], [sp_lp, sp_free])
    stats = llm.get_stats()["spec_decode"]
    assert stats.num_draft_tokens > 0  # speculation stayed on
    comp = outs[0].outputs[0]
    assert comp.logprobs is not None
    assert len(comp.logprobs) >= len(comp.token_ids) - 1
    for tok, lp in zip(comp.token_ids[1:], comp.logprobs):
        assert tok in lp
        assert all(v <= 0.0 for v in lp.values())
    assert outs[1].outputs[0].logprobs is None


def test_spec_logprobs_output_matches_nonspec_greedy():
    """Greedy + spec + logprobs: token stream must still equal the
    target-only greedy stream (losslessness with the logprobs program)."""
    ref = _llm(spec=False).generate(
        ["gamma delta"], [SamplingParams(max_tokens=8, temperature=0.0,
                                         ignore_eos=True)]
    )[0]
    out = _llm(spec=True).generate(
        ["gamma delta"], [SamplingParams(max_tokens=8, temperature=0.0,
                                         logprobs=2, ignore_eos=True)]
    )[0]
    assert out.outputs[0].token_ids == ref.outputs[0].token_ids


def test_prompt_logprobs():
    llm = _llm()
    prompt_ids = [5, 10, 15, 20, 25, 30]
    sp = SamplingParams(max_tokens=2, temperature=0.0, prompt_logprobs=3,
                        ignore_eos=True)
    out = llm.generate([prompt_ids], [sp])[0]
    plp = out.prompt_logprobs
    assert plp is not None and len(plp) == len(prompt_ids)
    assert plp[0] is None  # no distribution for the first prompt token
    for pos in range(1, len(prompt_ids)):
        d = plp[pos]
        assert d is not None
        assert prompt_ids[pos] in d  # actual token's logprob present
        assert all(v <= 0.0 for v in d.values())
        assert len(d) >= 3


def test_prompt_logprobs_chunked_prefill():
    """Chunked prefill must produce prompt logprobs for every position
    across chunk boundaries."""
    llm = LLM(EngineConfig(
        model=ModelConfig.tiny(vocab_size=258, max_model_len=128),
        cache=CacheConfig(block_size=4, num_blocks=64),
        scheduler=SchedulerConfig(max_num_seqs=2, max_num_batched_tokens=16,
                                  prefill_buckets=(16, 64)),
    ))
    prompt_ids = list(range(2, 42))  # 40 tokens -> 3 chunks of <=16
    sp = SamplingParams(max_tokens=2, temperature=0.0, prompt_logprobs=2,
                        ignore_eos=True)
    out = llm.generate([prompt_ids], [sp])[0]
    plp = out.prompt_logprobs
    assert plp is not None and len(plp) == 40
    assert plp[0] is None
    assert all(plp[i] is not None for i in range(1, 40))
