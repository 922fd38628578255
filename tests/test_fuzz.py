"""Randomized engine stress: mixed request sizes, aborts, tiny KV pools
(constant preemption), mixed sampling configs — with global invariants
checked every step. The reference has no equivalent; this is the fake-
cluster-style hardening SURVEY.md §4 calls out as missing upstream."""

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


def _invariants(engine: EngineCore):
    sched = engine.scheduler
    owned = {}
    for req in sched.requests.values():
        if req.is_finished:
            assert not req.block_ids, req.request_id
            continue
        for b in req.block_ids:
            assert b != 0, "null block allocated"
            assert b not in owned, f"block {b} double-owned"
            owned[b] = req.request_id
    # every running request has a coherent computed/token relationship
    for req in sched.running:
        assert req.num_computed_tokens <= req.num_tokens
        assert len(req.block_ids) * sched.kv.block_size >= req.num_computed_tokens
    # runner slots: one per running-resident request
    slots = [r.slot for r in sched.running if r.slot >= 0]
    assert len(slots) == len(set(slots)), "slot double-assignment"


@pytest.mark.parametrize("spec", [False, True])
def test_fuzz_engine(spec):
    rng = np.random.default_rng(0 if not spec else 1)
    speculative = None
    if spec:
        speculative = SpeculativeConfig(
            draft_model=ModelConfig.tiny(
                vocab_size=258, hidden_size=32, intermediate_size=64,
                num_heads=2, num_kv_heads=1, head_dim=16, max_model_len=96,
            ),
            num_speculative_tokens=2,
        )
    engine = EngineCore(EngineConfig(
        model=ModelConfig.tiny(vocab_size=258, max_model_len=96),
        # tight pool: constant preemptions; small host pool: both the
        # swap-out and the recompute preemption paths get exercised
        cache=CacheConfig(block_size=4, num_blocks=40, num_cpu_blocks=12),
        scheduler=SchedulerConfig(max_num_seqs=3, max_num_batched_tokens=32,
                                  prefill_buckets=(16, 32)),
        speculative=speculative,
        seed=0,
    ))

    next_id = 0
    live: list[str] = []
    done: set[str] = set()
    for step in range(120):
        # random arrivals
        if rng.random() < 0.4 and next_id < 25:
            rid = f"f{next_id}"
            next_id += 1
            plen = int(rng.integers(1, 40))
            temp = float(rng.choice([0.0, 0.0, 0.9]))
            engine.add_request(Request(
                request_id=rid,
                prompt_token_ids=rng.integers(1, 250, size=plen).tolist(),
                sampling_params=SamplingParams(
                    max_tokens=int(rng.integers(1, 15)),
                    temperature=temp,
                    top_p=0.9 if temp else 1.0,
                    ignore_eos=bool(rng.random() < 0.8),
                    stop_token_ids=() if rng.random() < 0.7 else (int(rng.integers(1, 250)),),
                ),
            ))
            live.append(rid)
        # random aborts
        if live and rng.random() < 0.1:
            victim = live.pop(int(rng.integers(len(live))))
            engine.abort_requests([victim])
            done.add(victim)
        updated = engine.step()
        for r in updated:
            if r.is_finished:
                done.add(r.request_id)
                if r.request_id in live:
                    live.remove(r.request_id)
        _invariants(engine)

    # drain
    for _ in range(300):
        if not engine.has_unfinished():
            break
        for r in engine.step():
            if r.is_finished:
                done.add(r.request_id)
        _invariants(engine)
    assert not engine.has_unfinished()
    assert len(done) == next_id
    # pool fully reclaimed
    assert engine.scheduler.kv.num_free_blocks == 39  # 40 minus null block
    # all slots free
    assert sorted(engine.runner.free_slots) == [0, 1, 2]
