"""Benchmark driver: tokens/sec/chip decode throughput on a Qwen2.5-7B-
shaped INT8 target with continuous batching (BASELINE ladder config 2),
measured through the real engine (scheduler + runner + paged KV).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

vs_baseline: the reference's measured vLLM TPOT is 0.0101 s/token at bs8
(A100-class GPU; BASELINE.md "vLLM Qwen2.5-VL TPOT") -> 8/0.0101 =
792 tok/s aggregate. We report ours / 792.

Env knobs: VOT_BENCH_LAYERS, VOT_BENCH_BATCH, VOT_BENCH_STEPS,
VOT_BENCH_QUANT (int8|int4|none), VOT_BENCH_SPEC=1 (add draft + spec loop).
"""

import json
import os
import sys
import time

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    import jax

    from vllm_omni_draft_tpu.config import (
        CacheConfig,
        EngineConfig,
        ModelConfig,
        SchedulerConfig,
        SpeculativeConfig,
    )
    from vllm_omni_draft_tpu.core.engine import EngineCore
    from vllm_omni_draft_tpu.core.request import Request, SamplingParams

    layers = int(os.environ.get("VOT_BENCH_LAYERS", "28"))
    B = int(os.environ.get("VOT_BENCH_BATCH", "32"))
    steps = int(os.environ.get("VOT_BENCH_STEPS", "20"))
    # int4 is the BASELINE ladder's named headline config (Qwen2.5-7B INT4)
    quant = os.environ.get("VOT_BENCH_QUANT", "int4")
    quant = None if quant in ("none", "") else quant
    spec_mode = os.environ.get("VOT_BENCH_SPEC", "0")  # 0 | 1 | oracle
    use_spec = spec_mode in ("1", "oracle")
    prompt_len = int(os.environ.get("VOT_BENCH_PROMPT", "128"))
    kv_dtype = os.environ.get("VOT_BENCH_KV_DTYPE", "bfloat16")
    sampled = os.environ.get("VOT_BENCH_SAMPLED", "0") == "1"
    max_model_len = int(os.environ.get("VOT_BENCH_MODEL_LEN", "1024"))

    target = ModelConfig(
        vocab_size=151_936,
        hidden_size=3584,
        intermediate_size=18944,
        num_layers=layers,
        num_heads=28,
        num_kv_heads=4,
        head_dim=128,
        max_model_len=max_model_len,
        dtype="bfloat16",
        quantization=quant,
        kv_cache_dtype=kv_dtype,
    )
    spec = None
    if spec_mode == "oracle":
        # acceptance-controlled machinery benchmark: the draft is the
        # target's first layers/4 layers (shared weights) and the target's
        # later layers are zeroed out (identity residuals) after engine
        # build, so draft logits == target logits exactly -> acceptance 1.0.
        # This measures the spec-decode machinery's speedup ceiling with
        # REAL relative draft/target costs; real-weight acceptance rates
        # land between this and the 0%-acceptance floor (VOT_BENCH_SPEC=1
        # with an unrelated random draft).
        draft = ModelConfig(
            vocab_size=151_936,
            hidden_size=3584,
            intermediate_size=18944,
            num_layers=max(layers // 4, 1),
            num_heads=28,
            num_kv_heads=4,
            head_dim=128,
            max_model_len=max_model_len,
            dtype="bfloat16",
            quantization=quant,
        )
        spec = SpeculativeConfig(draft_model=draft, num_speculative_tokens=4)
    elif use_spec:
        draft = ModelConfig(
            vocab_size=151_936,
            hidden_size=896,
            intermediate_size=4864,
            num_layers=max(layers // 4, 2),
            num_heads=14,
            num_kv_heads=2,
            head_dim=64,
            max_model_len=max_model_len,
            dtype="bfloat16",
        )
        dv = int(os.environ.get("VOT_BENCH_DRAFT_VOCAB", "0")) or None
        spec = SpeculativeConfig(
            draft_model=draft, num_speculative_tokens=4, draft_vocab_size=dv
        )

    M = int(os.environ.get("VOT_BENCH_DECODE_STEPS", "8"))
    K = spec.num_speculative_tokens if spec else 0
    cfg = EngineConfig(
        model=target,
        cache=CacheConfig(block_size=16, gpu_memory_utilization=0.85),
        scheduler=SchedulerConfig(
            max_num_seqs=B,
            # the token budget must cover a FULL decode batch's worst case
            # (every slot advancing M*(K+1) tokens) or the scheduler
            # silently halves the decode batch per step
            max_num_batched_tokens=max(prompt_len, 256, B * M * (K + 1)),
            prefill_buckets=(prompt_len,),
            decode_steps=M,
            max_model_len=max_model_len,
        ),
        speculative=spec,
        seed=0,
    )

    t0 = time.perf_counter()
    engine = EngineCore(cfg)
    log(f"engine up in {time.perf_counter()-t0:.1f}s; "
        f"num_blocks={engine.runner.num_blocks} layers={layers} quant={quant} "
        f"spec={spec_mode}")

    if spec_mode == "oracle":
        import jax
        import jax.numpy as jnp

        runner = engine.runner
        Ld = spec.draft_model.num_layers

        from functools import partial

        @partial(jax.jit, donate_argnums=0)
        def zero_late(params):
            lyr = dict(params["layers"])
            for name in ("o", "down"):
                d = dict(lyr[name])
                key = "s" if "s" in d else "w"
                d[key] = d[key].at[Ld:].set(
                    jnp.zeros_like(d[key][Ld:])
                )
                lyr[name] = d
            return {**params, "layers": lyr}

        runner.target_params = zero_late(runner.target_params)

        @jax.jit
        def make_draft(params):
            lyr = jax.tree.map(lambda a: a[:Ld], params["layers"])
            return {**params, "layers": lyr}

        runner.draft_params = make_draft(runner.target_params)
        jax.block_until_ready(runner.draft_params)
        log(f"oracle spec: draft = first {Ld} target layers (shared), "
            f"target layers >= {Ld} zeroed")

    rng = np.random.default_rng(0)
    sp = SamplingParams(
        max_tokens=4096,
        temperature=0.7 if sampled else 0.0,
        top_p=0.95 if sampled else 1.0,
        top_k=64 if sampled else 0,
        ignore_eos=True,
    )
    for i in range(B):
        engine.add_request(
            Request(
                request_id=f"bench-{i}",
                prompt_token_ids=rng.integers(1, 150_000, size=prompt_len).tolist(),
                sampling_params=sp,
            )
        )

    # prefill + first decodes (compile happens here); wait until EVERY
    # request is past prefill so the measured steps are pure full-batch
    # decode (prefill admission is token-budget-limited and trickles)
    t0 = time.perf_counter()
    warm = 0
    while warm < 2:
        engine.step()
        reqs = engine.scheduler.requests.values()
        if reqs and all(r.output_token_ids for r in reqs):
            warm += 1
    log(f"warmup (incl. compile) {time.perf_counter()-t0:.1f}s")

    if os.environ.get("VOT_BENCH_PROFILE") == "1":
        sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
        from benchmarks.prof_util import print_top

        log("=== device-time breakdown of one engine step ===")
        print_top(lambda: engine.step(), n=25, warmup=1)

    # steady-state decode
    gen0 = sum(len(r.output_token_ids) for r in engine.scheduler.requests.values())
    t0 = time.perf_counter()
    for _ in range(steps):
        engine.step()
    dt = time.perf_counter() - t0
    gen1 = sum(len(r.output_token_ids) for r in engine.scheduler.requests.values())
    toks = gen1 - gen0
    tps = toks / dt
    log(f"{toks} tokens in {dt:.2f}s over {steps} steps "
        f"({dt/steps*1000:.1f} ms/step, batch={B})")
    if use_spec:
        s = engine.scheduler.spec_stats
        log(f"spec acceptance={s.acceptance_rate:.2f} "
            f"tokens/step={s.mean_tokens_per_step:.2f}")

    baseline_tps = 8 / 0.0101  # reference TPOT at bs8 (BASELINE.md)
    print(
        json.dumps(
            {
                "metric": f"decode_tokens_per_sec_per_chip_qwen7b_{quant or 'bf16'}"
                + ("_fp8kv" if kv_dtype == "fp8" else "")
                + ("_sampled" if sampled else "")
                + (f"_spec_{spec_mode}" if use_spec else ""),
                "value": round(tps, 1),
                "unit": "tokens/s/chip",
                "vs_baseline": round(tps / baseline_tps, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
