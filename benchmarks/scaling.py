"""Multi-device scaling benchmark harness (BASELINE: >=80% efficiency at
2 hosts).

Runs the same decode workload at TP=1 and TP=N over the available devices
and reports per-chip efficiency. On this container only one TPU chip is
attached, so real numbers need a slice; run with JAX_PLATFORMS=cpu and
--devices 8 to validate mechanics on the fake mesh, or on a v5e pod:

    python benchmarks/scaling.py --devices 4 --layers 28

Multi-host: launch one process per host with VOT coordinator env
(parallel/mesh.py:init_distributed) and the same arguments.
"""

from __future__ import annotations

import argparse
import json
import sys
import time

import numpy as np


def run(tp: int, layers: int, batch: int, steps: int, width: int) -> float:
    import jax

    from vllm_omni_draft_tpu.config import (
        CacheConfig,
        EngineConfig,
        ModelConfig,
        ParallelConfig,
        SchedulerConfig,
    )
    from vllm_omni_draft_tpu.core.engine import EngineCore
    from vllm_omni_draft_tpu.core.request import Request, SamplingParams

    cfg = EngineConfig(
        model=ModelConfig(
            vocab_size=151_936,
            hidden_size=width,
            intermediate_size=int(width * 5.3) // 128 * 128,
            num_layers=layers,
            num_heads=width // 128,
            num_kv_heads=max(4, width // 896),
            head_dim=128,
            max_model_len=512,
            dtype="bfloat16",
            quantization="int8",
        ),
        cache=CacheConfig(block_size=16, gpu_memory_utilization=0.8),
        scheduler=SchedulerConfig(
            max_num_seqs=batch, max_num_batched_tokens=256,
            prefill_buckets=(128,), decode_steps=8, max_model_len=512,
        ),
        parallel=ParallelConfig(tensor_parallel_size=tp),
        seed=0,
    )
    engine = EngineCore(cfg)
    rng = np.random.default_rng(0)
    sp = SamplingParams(max_tokens=4096, temperature=0.0, ignore_eos=True)
    for i in range(batch):
        engine.add_request(Request(
            request_id=f"s{i}",
            prompt_token_ids=rng.integers(1, 150_000, size=128).tolist(),
            sampling_params=sp,
        ))
    warm = 0
    while warm < 3:
        if engine.step():
            warm += 1
    gen0 = sum(len(r.output_token_ids) for r in engine.scheduler.requests.values())
    t0 = time.perf_counter()
    for _ in range(steps):
        engine.step()
    dt = time.perf_counter() - t0
    gen1 = sum(len(r.output_token_ids) for r in engine.scheduler.requests.values())
    return (gen1 - gen0) / dt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--devices", type=int, default=None)
    ap.add_argument("--layers", type=int, default=8)
    ap.add_argument("--width", type=int, default=3584)
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--steps", type=int, default=10)
    args = ap.parse_args()

    import jax

    n = args.devices or len(jax.devices())
    tps1 = run(1, args.layers, args.batch, args.steps, args.width)
    tpsN = run(n, args.layers, args.batch, args.steps, args.width)
    eff = tpsN / (tps1 * n)
    print(json.dumps({
        "metric": f"tp{n}_scaling_efficiency",
        "tok_s_tp1": round(tps1, 1),
        f"tok_s_tp{n}": round(tpsN, 1),
        "per_chip_efficiency": round(eff, 3),
    }))
    return 0 if eff > 0 else 1


if __name__ == "__main__":
    sys.exit(main())
