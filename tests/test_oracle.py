"""Oracle constructions used by bench.py and the multichip dryrun:
acceptance-1.0 (ceiling) and acceptance-p (realistic mode) must deliver
their promised acceptance rates through the REAL engine."""

import numpy as np
import pytest

from vllm_omni_draft_tpu.config import (
    CacheConfig,
    EngineConfig,
    ModelConfig,
    SchedulerConfig,
    SpeculativeConfig,
)
from vllm_omni_draft_tpu.core.engine import EngineCore
from vllm_omni_draft_tpu.core.request import Request, SamplingParams
from vllm_omni_draft_tpu.utils.oracle import (
    apply_oracle,
    apply_oracle_acceptance_p,
)


K = 4


def _engine(vocab=4096):
    # draft hidden >= 64: the acceptance-p oracle's argmax maps need
    # the matched-row margin (D) to clear the max cross-talk over V^2
    # near-Gaussian dots (~4.1*sqrt(2D) at V=4096). At D=32 ~4% of ids
    # mis-map and silently deflate the acceptance statistic; at D=64
    # the maps are exact (verified numerically, round 4).
    draft = ModelConfig.tiny(
        vocab_size=vocab, hidden_size=64, intermediate_size=128,
        num_heads=2, num_kv_heads=2, head_dim=16, max_model_len=512,
    )
    return EngineCore(EngineConfig(
        model=ModelConfig.tiny(
            vocab_size=vocab, hidden_size=64, intermediate_size=128,
            num_heads=4, num_kv_heads=2, head_dim=16, max_model_len=512,
        ),
        cache=CacheConfig(block_size=8, num_blocks=512),
        scheduler=SchedulerConfig(
            max_num_seqs=4, max_num_batched_tokens=256,
            prefill_buckets=(16,), max_model_len=512,
        ),
        speculative=SpeculativeConfig(draft_model=draft,
                                      num_speculative_tokens=K),
        seed=0,
    ))


def _run(engine, n_tokens=220, lo=1, hi=2000):
    rng = np.random.default_rng(3)
    sp = SamplingParams(max_tokens=n_tokens, temperature=0.0, ignore_eos=True)
    for i in range(4):
        engine.add_request(Request(
            request_id=f"o{i}",
            prompt_token_ids=rng.integers(lo, hi, size=8).tolist(),
            sampling_params=sp,
        ))
    while engine.has_unfinished():
        engine.step()
    emitted = sum(
        len(r.output_token_ids) for r in engine.scheduler.requests.values()
    )
    return engine.scheduler.spec_stats, emitted


def test_oracle_ceiling_acceptance_is_one():
    engine = _engine(vocab=512)
    apply_oracle(engine.runner)
    stats, _ = _run(engine, n_tokens=96, hi=200)
    assert stats.acceptance_rate >= 0.99, stats.acceptance_rate


@pytest.mark.parametrize("p", [0.5, 0.8])
def test_oracle_acceptance_p_tracks_target(p):
    """The cyclic-walk acceptance-p oracle sets PER-POSITION agreement p.
    Under the prefix-truncation rule the observable laws are

      accepted/drafted      = p(1-p^K) / (K(1-p))
      emitted tokens / iter = (1-p^(K+1)) / (1-p)

    — the real spec-decode statistics at per-position acceptance p."""
    engine = _engine()
    apply_oracle_acceptance_p(engine.runner, p)
    # spread the walk starts over the WHOLE vocab: the statistic is a
    # sample of the hashed agree set along each walk, and four 220-token
    # walks packed into one narrow id window share (correlated) sample
    # noise — seed-3 starts in [1,2000) read 0.50 at p=0.8 (law 0.59)
    # with a CORRECT engine (round-4 diagnosis).
    stats, emitted = _run(engine, hi=3800)
    expect_ratio = p * (1 - p ** K) / (K * (1 - p))
    # walk-sampling sigma at ~350 iters is ~0.02; 0.06 = 3 sigma.
    # (The round-3 0.1 tolerance hid two compensating biases: hash
    # stride autocorrelation inflating runs and tiny-dim map errors
    # deflating them — both fixed in round 4.)
    assert abs(stats.acceptance_rate - expect_ratio) < 0.06, (
        f"accept ratio {stats.acceptance_rate:.3f}, "
        f"expected {expect_ratio:.3f} (p={p})"
    )
    iters = stats.num_draft_tokens / K
    expect_tokens = (1 - p ** (K + 1)) / (1 - p)
    assert abs(emitted / iters - expect_tokens) < 0.5, (
        emitted / iters, expect_tokens
    )
