"""Benchmark driver: tokens/sec/chip decode throughput on a Qwen2.5-7B-
shaped INT4 target with draft-model speculative decoding and continuous
batching (the BASELINE north-star config), measured through the real
engine (scheduler + runner + paged KV).

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
    # default = the BASELINE north-star config: Qwen2.5-7B INT4 WITH spec
    # decode (acceptance-1.0 oracle, clearly labeled in the metric name;
    # the 0-acceptance floor is VOT_BENCH_SPEC=1, spec off is =0)
    spec_mode = os.environ.get("VOT_BENCH_SPEC", "oracle")  # 0 | 1 | oracle
    use_spec = spec_mode in ("1", "oracle")
    prompt_len = int(os.environ.get("VOT_BENCH_PROMPT", "128"))
    kv_dtype = os.environ.get("VOT_BENCH_KV_DTYPE", "bfloat16")
    sampled = os.environ.get("VOT_BENCH_SAMPLED", "0") == "1"
    max_model_len = int(os.environ.get("VOT_BENCH_MODEL_LEN", "1024"))
    fuse = os.environ.get("VOT_BENCH_FUSE", "0") == "1"
    # the DRAFT's linears are launch-bound at its tiny shapes (the
    # round-3 deep profile prices its kernel pool at ~12 ms/step), so
    # qkv/gate_up fusion defaults ON for the draft even though it was a
    # wash for the target's int4 shapes; VOT_BENCH_FUSE_DRAFT=0 to A/B
    dfuse = os.environ.get("VOT_BENCH_FUSE_DRAFT", "1") == "1"

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
        fuse_projections=fuse,
    )
    spec = None
    if use_spec:
        # Qwen2.5-0.5B-shaped draft (the BASELINE ladder's draft class).
        dquant = os.environ.get("VOT_BENCH_DRAFT_QUANT", "")
        dquant = None if dquant in ("none", "") else dquant
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
            quantization=dquant,
            # NOTE: 1-byte draft KV (int8/fp8) is blocked by Mosaic
            # tiling — the draft's Hkv=2 sublane dim is below int8's
            # 4-sublane tile and the whole-block DMA slice fails to
            # compile ("Slice shape along dimension 3 must be aligned
            # to tiling (4), but is 2"); needs the flat (Hkv*D) cache
            # layout first. Knob kept for A/B once that lands.
            kv_cache_dtype=os.environ.get("VOT_BENCH_DRAFT_KV", "bfloat16"),
            fuse_projections=dfuse,
        )
        dv = int(os.environ.get("VOT_BENCH_DRAFT_VOCAB", "16384")) or None
        spec = SpeculativeConfig(
            draft_model=draft,
            num_speculative_tokens=int(os.environ.get("VOT_BENCH_SPEC_K", "4")),
            draft_vocab_size=dv,
            draft_sampling_filter=(
                os.environ.get("VOT_BENCH_DRAFT_FILTER", "1") == "1"
            ),
        )

    M = int(os.environ.get("VOT_BENCH_DECODE_STEPS", "8"))
    K = spec.num_speculative_tokens if spec else 0
    cfg = EngineConfig(
        model=target,
        cache=CacheConfig(
            # block 128 measured best for EVERY KV dtype since the N-slot
            # attention DMA pipeline landed (round 2): bf16 6397, fp8
            # 6115, at 128 vs fp8 5481@16. The round-1 small-block
            # preference for 1-byte KV was a double-buffering underlap
            # artifact (PERF_NOTES round-2 TPU findings).
            # fp8 KV prefers block 32 with the round-5 shared-semaphore
            # kernels (5640 vs 5370 at block 16 — PERF_NOTES round-5
            # ladder-3 probe); other dtypes keep the round-1 sweep's 128
            block_size=int(os.environ.get(
                "VOT_BENCH_BLOCK", "32" if kv_dtype == "fp8" else "128"
            )),
            gpu_memory_utilization=0.85,
        ),
        scheduler=SchedulerConfig(
            max_num_seqs=B,
            # the token budget must cover a FULL decode batch's worst case
            # (every slot advancing M*(K+1) tokens) or the scheduler
            # silently halves the decode batch per step. TTFT mode raises
            # it further: admission (not step length) dominates cold-burst
            # TTFT — at the default budget only ~10 prompts prefill per
            # step (round-3 finding; the budget is host-side scheduling
            # state, so this costs no recompilation)
            max_num_batched_tokens=int(os.environ.get(
                "VOT_BENCH_TOKEN_BUDGET",
                str(max(prompt_len, 256, B * M * (K + 1))),
            )),
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

    accept_p = float(os.environ.get("VOT_BENCH_ACCEPT", "1.0"))
    if spec_mode == "oracle":
        # Acceptance-controlled machinery benchmark with REAL draft/verify
        # compute+bandwidth costs (utils/oracle.py). VOT_BENCH_ACCEPT=1.0
        # (default): both models deterministically propose "repeat last
        # token" => greedy acceptance exactly 1.0 (the machinery
        # CEILING). VOT_BENCH_ACCEPT=p<1: cyclic-walk heads with a hashed
        # agree-set => PER-POSITION agreement p, i.e. the real spec
        # statistics at acceptance p: accepted/drafted =
        # p(1-p^K)/(K(1-p)), tokens/iter = (1-p^(K+1))/(1-p)
        # (tests/test_oracle.py). Real Qwen pairs measure ~0.6-0.8
        # per-position; p=0.7 is the honest realistic mode.
        from vllm_omni_draft_tpu.utils import oracle as oracle_mod

        if accept_p >= 1.0:
            oracle_mod.apply_oracle(engine.runner)
            log("oracle spec: identity residuals + embedding-tied heads "
                "(acceptance 1.0 by construction)")
        else:
            oracle_mod.apply_oracle_acceptance_p(engine.runner, accept_p)
            log(f"oracle spec: cyclic-walk heads, target acceptance "
                f"p={accept_p}")

    rng = np.random.default_rng(0)
    # oracle + pruned draft vocab: proposals repeat prompt tokens, so the
    # ids must be proposable (inside the pruned prefix) to keep
    # acceptance at the 1.0 ceiling
    tok_hi = (
        spec.draft_vocab_size
        if (spec_mode == "oracle" and spec and spec.draft_vocab_size)
        else 150_000
    )
    if spec_mode == "oracle" and accept_p < 1.0:
        # acceptance-p oracle: the emitted walk increments token ids, so
        # keep starts far enough from the pruned-draft-vocab edge that no
        # row leaves the draft's head rows mid-measurement
        vd = (spec.draft_vocab_size or target.vocab_size) if spec else 150_000
        tok_hi = max(vd - 4096, vd // 2)
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
                prompt_token_ids=rng.integers(1, tok_hi, size=prompt_len).tolist(),
                sampling_params=sp,
            )
        )

    def active_reqs():
        # finished/aborted requests LINGER in scheduler.requests (kept
        # for post-hoc inspection; purge_finished drops them) — every
        # accounting loop below must look at live requests only
        return [
            r for r in engine.scheduler.requests.values()
            if not r.is_finished
        ]

    # prefill + first decodes (compile happens here); wait until EVERY
    # request is past prefill so the measured steps are pure full-batch
    # decode (prefill admission is token-budget-limited and trickles)
    t0 = time.perf_counter()
    warm = 0
    while warm < 2:
        engine.step()
        reqs = active_reqs()
        if reqs and all(r.output_token_ids for r in reqs):
            warm += 1
    log(f"warmup (incl. compile) {time.perf_counter()-t0:.1f}s")

    if os.environ.get("VOT_BENCH_PROFILE") == "1":
        sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
        from benchmarks.prof_util import print_top

        log("=== device-time breakdown of one engine step ===")
        print_top(lambda: engine.step(),
                  n=int(os.environ.get("VOT_BENCH_PROFILE_N", "25")),
                  warmup=1)

    if os.environ.get("VOT_BENCH_MODE") == "prefill":
        # pure prefill throughput: B one-token requests; wall time from
        # burst-add to all-finished is prefill + one sampling step per
        # request. 3 independent windows (same discipline as decode).
        sp1 = SamplingParams(max_tokens=1, temperature=0.0, ignore_eos=True)
        rates = []
        for w in range(3):
            for r in list(engine.scheduler.requests.values()):
                engine.abort_requests([r.request_id])
            while engine.has_unfinished() or engine.batch_queue:
                engine.step()
            engine.scheduler.purge_finished()
            prompts = [
                rng.integers(1, tok_hi, size=prompt_len).tolist()
                for _ in range(B)
            ]
            if w == 0:  # compile any new prefill-group shapes off-clock
                for i, p in enumerate(prompts):
                    engine.add_request(Request(
                        request_id=f"pwarm-{i}", prompt_token_ids=p,
                        sampling_params=sp1,
                    ))
                while engine.has_unfinished():
                    engine.step()
                engine.scheduler.purge_finished()
            if w == 0 and os.environ.get("VOT_BENCH_PROFILE") == "1":
                sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
                from benchmarks.prof_util import print_top

                def burst():
                    for i, p in enumerate(prompts):
                        engine.add_request(Request(
                            request_id=f"pprof-{i}", prompt_token_ids=p,
                            sampling_params=sp1,
                        ))
                    while engine.has_unfinished():
                        engine.step()
                    engine.scheduler.purge_finished()

                log("=== device-time breakdown of one prefill burst ===")
                print_top(burst,
                          n=int(os.environ.get("VOT_BENCH_PROFILE_N", "30")),
                          warmup=0)
            t0 = time.perf_counter()
            for i, p in enumerate(prompts):
                engine.add_request(Request(
                    request_id=f"pre-{w}-{i}", prompt_token_ids=p,
                    sampling_params=sp1,
                ))
            while engine.has_unfinished():
                engine.step()
            dt = time.perf_counter() - t0
            engine.scheduler.purge_finished()
            rates.append(B * prompt_len / dt)
            log(f"prefill window {w}: {B}x{prompt_len} tokens in "
                f"{dt*1000:.0f}ms = {rates[-1]:.0f} tok/s")
        mean = sum(rates) / len(rates)
        sigma = (sum((r - mean) ** 2 for r in rates) / len(rates)) ** 0.5
        print(json.dumps({
            "metric": f"prefill_tokens_per_sec_qwen7b_{quant or 'bf16'}",
            "value": round(mean, 1),
            "unit": "tokens/s/chip",
            "vs_baseline": round(mean / 2300.0, 3),
            "sigma": round(sigma, 1),
            "windows": [round(r, 1) for r in rates],
        }))
        return

    if os.environ.get("VOT_BENCH_MODE") == "ttft":
        # p50 time-to-first-token under a cold B-request burst (BASELINE
        # metric). The engine is warm (compiled) from the phase above; a
        # fresh burst of B requests measures scheduler+prefill latency.
        # 3 independent bursts (single-burst numbers vary ~±10% across
        # runs), reported as mean p50/p99 ± sigma.
        import statistics

        p50s, p99s = [], []
        for w in range(3):
            for r in list(engine.scheduler.requests.values()):
                engine.abort_requests([r.request_id])
            while engine.has_unfinished() or engine.batch_queue:
                engine.step()
            engine.scheduler.purge_finished()
            t_start = time.perf_counter()
            first: dict[str, float] = {}
            for i in range(B):
                engine.add_request(
                    Request(
                        request_id=f"ttft-{w}-{i}",
                        prompt_token_ids=rng.integers(
                            1, tok_hi, size=prompt_len
                        ).tolist(),
                        sampling_params=sp,
                    )
                )
            while len(first) < B:
                engine.step()
                now = time.perf_counter()
                for r in active_reqs():
                    if r.output_token_ids and r.request_id not in first:
                        first[r.request_id] = now - t_start
            p50s.append(statistics.median(first.values()))
            p99s.append(max(first.values()))
            log(f"TTFT burst {w}: p50={p50s[-1]*1000:.1f}ms "
                f"p99={p99s[-1]*1000:.1f}ms "
                f"(burst of {B}, prompt_len={prompt_len})")
        p50 = sum(p50s) / len(p50s)
        sigma = (sum((x - p50) ** 2 for x in p50s) / len(p50s)) ** 0.5
        log(f"TTFT p50 mean={p50*1000:.1f}ms sigma={sigma*1000:.1f} "
            f"p99 mean={sum(p99s)/3*1000:.1f}ms")
        print(
            json.dumps(
                {
                    "metric": f"ttft_p50_qwen7b_{quant or 'bf16'}_burst{B}",
                    "value": round(p50 * 1000, 1),
                    "unit": "ms",
                    "vs_baseline": round(0.346 / max(p50, 1e-9), 3),
                    "sigma": round(sigma * 1000, 1),
                    "p99_ms": round(sum(p99s) / 3 * 1000, 1),
                    "windows": [round(x * 1000, 1) for x in p50s],
                }
            )
        )
        return

    # steady-state decode, measured over VOT_BENCH_WINDOWS independent
    # windows (default 3). Every window measures the IDENTICAL work: all
    # requests are aborted, a fresh batch of B prompt_len-token requests
    # is added (same shapes -> no recompile), warmed past prefill, and
    # `steps` full-batch decode steps are timed. Reporting mean +- sigma
    # converts the round-2 "unexplained 6.8% drift" (BENCH_r01 6393.6 vs
    # BENCH_r02 5961.6, one window each) into a quantified spread.
    n_windows = int(os.environ.get("VOT_BENCH_WINDOWS", "3"))
    per_step = M * (K + 1 if use_spec else 1)

    def fresh_batch(tag):
        for r in list(engine.scheduler.requests.values()):
            engine.abort_requests([r.request_id])
        while engine.has_unfinished() or engine.batch_queue:
            engine.step()
        engine.scheduler.purge_finished()
        for i in range(B):
            engine.add_request(
                Request(
                    request_id=f"{tag}-{i}",
                    prompt_token_ids=rng.integers(
                        1, tok_hi, size=prompt_len
                    ).tolist(),
                    sampling_params=sp,
                )
            )
        # run until every request is past prefill PLUS two steady steps
        # (same criterion as the initial warmup): measured steps are pure
        # full-batch decode with the fused-step pipeline primed
        warm = 0
        while warm < 2:
            engine.step()
            reqs = active_reqs()
            if reqs and all(r.output_token_ids for r in reqs):
                warm += 1

    window_tps = []
    window_ms = []
    for w in range(n_windows):
        if w > 0:
            fresh_batch(f"win{w}")
        # cap measured steps so no sequence can hit max_model_len
        # mid-measurement (capped slots go inert and deflate tokens/step)
        max_len_now = max(
            len(r.prompt_token_ids) + len(r.output_token_ids)
            for r in active_reqs()
        )
        fit = max(1, (max_model_len - max_len_now - per_step) // per_step)
        wsteps = min(steps, fit)
        if wsteps < steps and w == 0:
            log(f"capping measured steps {steps} -> {fit} (max_model_len)")
        gen0 = sum(len(r.output_token_ids) for r in active_reqs())
        t0 = time.perf_counter()
        for _ in range(wsteps):
            engine.step()
        dt = time.perf_counter() - t0
        gen1 = sum(len(r.output_token_ids) for r in active_reqs())
        toks = gen1 - gen0
        window_tps.append(toks / dt)
        window_ms.append(dt / wsteps * 1000)
        log(f"window {w}: {toks} tokens in {dt:.2f}s over {wsteps} steps "
            f"({dt/wsteps*1000:.1f} ms/step, batch={B}, "
            f"{toks/dt:.1f} tok/s)")
    if use_spec:
        s = engine.scheduler.spec_stats
        log(f"spec acceptance={s.acceptance_rate:.2f} "
            f"tokens/step={s.mean_tokens_per_step:.2f}")

    tps = float(np.mean(window_tps))
    sigma = float(np.std(window_tps))
    log(f"mean {tps:.1f} tok/s sigma {sigma:.1f} "
        f"({100*sigma/max(tps,1e-9):.1f}%) over {len(window_tps)} windows; "
        f"ms/step {' '.join(f'{m:.1f}' for m in window_ms)}")

    baseline_tps = 8 / 0.0101  # reference TPOT at bs8 (BASELINE.md)
    print(
        json.dumps(
            {
                "metric": f"decode_tokens_per_sec_per_chip_qwen7b_{quant or 'bf16'}"
                + (f"_{kv_dtype}kv" if kv_dtype != "bfloat16" else "")
                + (f"_draft{dquant}" if use_spec and dquant else "")
                + ("_sampled" if sampled else "")
                + (f"_spec_{spec_mode}" if use_spec else "")
                + (
                    f"_accept{accept_p:g}"
                    if use_spec and spec_mode == "oracle" and accept_p < 1.0
                    else ""
                ),
                "value": round(tps, 1),
                "unit": "tokens/s/chip",
                "vs_baseline": round(tps / baseline_tps, 3),
                "sigma": round(sigma, 1),
                "windows": [round(x, 1) for x in window_tps],
            }
        )
    )


if __name__ == "__main__":
    main()
