"""Engine-level DP: replica load balancing and wave coordination."""

import pytest

from vllm_omni_draft_tpu.config import (
    CacheConfig,
    EngineConfig,
    ModelConfig,
    SchedulerConfig,
)
from vllm_omni_draft_tpu.core.request import SamplingParams

pytest.importorskip("zmq")


@pytest.mark.integration
def test_dp_group_balances_and_tracks_waves():
    from vllm_omni_draft_tpu.engine.dp import DPEngineGroup

    cfg = EngineConfig(
        model=ModelConfig.tiny(vocab_size=258, max_model_len=128),
        cache=CacheConfig(block_size=8, num_blocks=64),
        scheduler=SchedulerConfig(max_num_seqs=4, max_num_batched_tokens=64,
                                  prefill_buckets=(16, 64)),
    )
    group = DPEngineGroup(cfg, dp_size=2)
    try:
        sp = SamplingParams(max_tokens=5, temperature=0.0, ignore_eos=True)
        ranks = [group.add_request(f"r{i}", [1 + i, 2, 3], sp) for i in range(4)]
        # least-loaded routing alternates across replicas
        assert sorted(ranks) == [0, 0, 1, 1]
        assert group.stats()["current_wave"] == 1

        got: dict[str, list[int]] = {}
        finished = set()
        waves = []
        for _ in range(400):
            outs, wave_events = group.poll(timeout=0.1)
            waves.extend(wave_events)
            for rank, rid, toks, fin, _ in outs:
                got.setdefault(rid, []).extend(toks)
                if fin:
                    finished.add(rid)
            if len(finished) == 4:
                break
        assert finished == {"r0", "r1", "r2", "r3"}
        assert all(len(v) == 5 for v in got.values())
        # drain: wave 1 completed exactly once
        for _ in range(10):
            if waves:
                break
            _, wave_events = group.poll(timeout=0.1)
            waves.extend(wave_events)
        assert waves == [1]
        assert group.stats()["waves_completed"] == 1

        # second wave starts on the next request
        group.add_request("r9", [9, 9], sp)
        assert group.stats()["current_wave"] == 2
    finally:
        group.shutdown()
