"""Logprobs API: per-token top-k logprobs + the sampled token's logprob."""

import math

import numpy as np

from vllm_omni_draft_tpu.config import (
    CacheConfig,
    EngineConfig,
    ModelConfig,
    SchedulerConfig,
)
from vllm_omni_draft_tpu.core.request import SamplingParams
from vllm_omni_draft_tpu.engine.llm import LLM


def _llm():
    return LLM(EngineConfig(
        model=ModelConfig.tiny(vocab_size=258, max_model_len=128),
        cache=CacheConfig(block_size=4, num_blocks=64),
        scheduler=SchedulerConfig(max_num_seqs=4, max_num_batched_tokens=64,
                                  prefill_buckets=(16, 64)),
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
