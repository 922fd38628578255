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
    # host swap pool conservation: free + held == capacity, and the
    # engine's stored payloads track the scheduler's accounting
    cap = sched.cache_config.num_cpu_blocks
    held = sum(sched.swapped_out.values())
    assert sched.cpu_blocks_free + held == cap, (
        sched.cpu_blocks_free, held, cap
    )
    assert set(engine._swap_store.keys()) >= set(sched.swapped_out.keys())


@pytest.mark.parametrize("spec,seed", [
    (False, 0), (True, 1), (False, 7), (True, 11),
])
def test_fuzz_engine(spec, seed):
    rng = np.random.default_rng(seed)
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
    # host swap pool fully reclaimed
    assert engine.scheduler.cpu_blocks_free == 12
    assert not engine.scheduler.swapped_out and not engine._swap_store


def test_fuzz_preemption_swap_preserves_greedy_outputs():
    """The strongest invariant: a greedy request's tokens must be
    IDENTICAL whether or not it was preempted/swapped/recomputed along
    the way. Stress a tiny pool, then replay every greedy request in an
    unconstrained engine and compare token-for-token."""
    rng = np.random.default_rng(42)

    def _model():
        return ModelConfig.tiny(vocab_size=258, max_model_len=96)

    stressed = EngineCore(EngineConfig(
        model=_model(),
        # pool so tight that decode growth forces evictions: 3 residents
        # x (prompt + up to 28 generated) >> 15 usable blocks
        cache=CacheConfig(block_size=4, num_blocks=16, num_cpu_blocks=6),
        scheduler=SchedulerConfig(max_num_seqs=3, max_num_batched_tokens=32,
                                  prefill_buckets=(16, 32)),
        seed=0,
    ))
    prompts: dict[str, list[int]] = {}
    sps: dict[str, SamplingParams] = {}
    for i in range(10):
        rid = f"g{i}"
        prompts[rid] = rng.integers(1, 250, size=int(rng.integers(2, 16))).tolist()
        sps[rid] = SamplingParams(
            max_tokens=int(rng.integers(8, 28)), temperature=0.0,
            ignore_eos=True,
        )
        stressed.add_request(Request(
            request_id=rid, prompt_token_ids=prompts[rid],
            sampling_params=sps[rid],
        ))
    for _ in range(500):
        if not stressed.has_unfinished():
            break
        stressed.step()
        _invariants(stressed)
    assert not stressed.has_unfinished()
    assert stressed.scheduler.stats.num_preempted_total > 0  # stress real

    calm = EngineCore(EngineConfig(
        model=_model(),
        cache=CacheConfig(block_size=4, num_blocks=256),
        scheduler=SchedulerConfig(max_num_seqs=10, max_num_batched_tokens=128,
                                  prefill_buckets=(16, 64)),
        seed=0,
    ))
    for rid in prompts:
        calm.add_request(Request(
            request_id=rid, prompt_token_ids=prompts[rid],
            sampling_params=sps[rid],
        ))
    while calm.has_unfinished():
        calm.step()
    for rid in prompts:
        got = stressed.scheduler.requests[rid].output_token_ids
        want = calm.scheduler.requests[rid].output_token_ids
        assert got == want, (rid, got, want)
