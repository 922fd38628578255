"""TPU multimodal benchmark — ladder-4 (Qwen2-VL-7B-shaped multimodal +
text draft; VERDICT r3 item 4: the mm path was CPU-tested but never
timed on chip).

Three timed components, 3 windows each:
  1. ViT encode: Qwen2-VL-shaped vision tower (32 layers, 1280 wide,
     patch 14, 2x2 merge) on a 448^2 image -> 1024 patches -> 256 LLM
     tokens.
  2. MM prefill: burst of B prompts (text + 256 image tokens + text,
     ~320 tokens) through the engine's embed-splice prefill path.
  3. Spec decode with the mm context resident: steady-state tok/s and
     TPOT (s/token/request).

Reference numbers (`/root/reference/src/doc/benchmark_results.md:45-55`):
vLLM Qwen2.5-VL TPOT 0.0101-0.0115 s/token at bs2-8 x seq128-512 on
>=80 GB GPUs; text-encode E2E 0.346 s at bs2x512.

Env: VOT_MM_BATCH (8), VOT_MM_IMG (448), VOT_MM_ACCEPT (1.0),
VOT_MM_LAYERS (28), VOT_MM_VIT_LAYERS (32).
Prints one JSON line per component.
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
    import jax.numpy as jnp

    from vllm_omni_draft_tpu.config import (
        CacheConfig,
        EngineConfig,
        ModelConfig,
        SchedulerConfig,
        SpeculativeConfig,
    )
    from vllm_omni_draft_tpu.core.engine import EngineCore
    from vllm_omni_draft_tpu.core.request import Request, SamplingParams
    from vllm_omni_draft_tpu.models.vision import (
        VisionConfig,
        VisionEncoder,
        build_mm_prompt,
    )
    from vllm_omni_draft_tpu.utils import oracle as oracle_mod

    B = int(os.environ.get("VOT_MM_BATCH", "8"))
    img = int(os.environ.get("VOT_MM_IMG", "448"))
    layers = int(os.environ.get("VOT_MM_LAYERS", "28"))
    vit_layers = int(os.environ.get("VOT_MM_VIT_LAYERS", "32"))
    accept_p = float(os.environ.get("VOT_MM_ACCEPT", "1.0"))
    K, M = 4, 8

    # ---- 1. ViT encode ----------------------------------------------------
    vcfg = VisionConfig(depth=vit_layers, dtype="bfloat16")
    enc = VisionEncoder(vcfg)
    n_vis_params = sum(
        int(np.prod(x.shape)) for x in jax.tree.leaves(enc.params)
    )
    pixels = jax.random.normal(
        jax.random.PRNGKey(0), (1, 3, img, img), jnp.float32
    )
    t0 = time.time()
    e = enc.encode(pixels)
    np.asarray(e[0, 0])
    log(f"ViT ({vit_layers}L, {n_vis_params/1e6:.0f}M params) compile+run "
        f"{time.time()-t0:.1f}s; tokens={e.shape[0]}")
    vit_ms = []
    for _ in range(3):
        t0 = time.time()
        e = enc.encode(pixels)
        np.asarray(e[0, 0])
        vit_ms.append((time.time() - t0) * 1000)
    n_img_tok = e.shape[0]
    log(f"ViT encode {img}^2 -> {n_img_tok} tokens: "
        f"{[f'{v:.0f}' for v in vit_ms]} ms")

    # ---- engine (7B-shaped int4 target + 0.5B-shaped bf16 draft) ----------
    target = ModelConfig(
        vocab_size=151_936, hidden_size=3584, intermediate_size=18944,
        num_layers=layers, num_heads=28, num_kv_heads=4, head_dim=128,
        max_model_len=2048, dtype="bfloat16", quantization="int4",
    )
    draft = ModelConfig(
        vocab_size=151_936, hidden_size=896, intermediate_size=4864,
        num_layers=max(layers // 4, 2), num_heads=14, num_kv_heads=2,
        head_dim=64, max_model_len=2048, dtype="bfloat16",
    )
    cfg = EngineConfig(
        model=target,
        cache=CacheConfig(block_size=128, gpu_memory_utilization=0.85),
        scheduler=SchedulerConfig(
            max_num_seqs=B,
            max_num_batched_tokens=4096,
            prefill_buckets=(512,),
            decode_steps=M,
            max_model_len=2048,
        ),
        speculative=SpeculativeConfig(
            draft_model=draft, num_speculative_tokens=K,
            draft_vocab_size=16384,
        ),
        seed=0,
    )
    t0 = time.time()
    engine = EngineCore(cfg)
    log(f"engine up in {time.time()-t0:.1f}s; "
        f"num_blocks={engine.runner.num_blocks}")
    if accept_p >= 1.0:
        oracle_mod.apply_oracle(engine.runner)
    else:
        oracle_mod.apply_oracle_acceptance_p(engine.runner, accept_p)

    rng = np.random.default_rng(0)
    embeds_np = np.asarray(e, np.float32)

    def mk_requests(tag, max_tokens):
        sp = SamplingParams(
            max_tokens=max_tokens, temperature=0.0, ignore_eos=True
        )
        reqs = []
        for i in range(B):
            before = rng.integers(1, 12000, size=32).tolist()
            after = rng.integers(1, 12000, size=32).tolist()
            prompt = build_mm_prompt(before, n_img_tok, after)
            reqs.append(Request(
                request_id=f"{tag}-{i}",
                prompt_token_ids=prompt,
                sampling_params=sp,
                mm_inputs={
                    "embeds": embeds_np,
                    "image_token_id": 151655,
                    "cache_key": f"{tag}-{i}",  # unique: no prefix-cache hit
                },
            ))
        return reqs

    def drain():
        for r in list(engine.scheduler.requests.values()):
            engine.abort_requests([r.request_id])
        while engine.has_unfinished() or engine.batch_queue:
            engine.step()
        engine.scheduler.purge_finished()

    # ---- 2. mm prefill throughput (burst, one token each) -----------------
    n_prompt = 32 + n_img_tok + 32
    for r in mk_requests("warm", 1):
        engine.add_request(r)
    t0 = time.time()
    while engine.has_unfinished():
        engine.step()
    log(f"mm prefill warmup (compile) {time.time()-t0:.1f}s")
    drain()
    pf = []
    for w in range(3):
        t0 = time.time()
        for r in mk_requests(f"p{w}", 1):
            engine.add_request(r)
        while engine.has_unfinished():
            engine.step()
        dt = time.time() - t0
        drain()
        pf.append(B * n_prompt / dt)
        log(f"mm prefill window {w}: {B}x{n_prompt} tokens in "
            f"{dt*1000:.0f}ms = {pf[-1]:.0f} tok/s")

    # ---- 3. decode with mm context ---------------------------------------
    for r in mk_requests("d", 1600):
        engine.add_request(r)
    active = lambda: [
        r for r in engine.scheduler.requests.values() if not r.is_finished
    ]
    warm = 0
    while warm < 2:
        engine.step()
        reqs = active()
        if reqs and all(r.output_token_ids for r in reqs):
            warm += 1
    rates = []
    for w in range(3):
        base = {r.request_id: len(r.output_token_ids) for r in active()}
        t0 = time.time()
        for _ in range(10):
            engine.step()
        dt = time.time() - t0
        toks = sum(
            len(r.output_token_ids) - base[r.request_id] for r in active()
        )
        rates.append(toks / dt)
        log(f"decode window {w}: {toks} tokens in {dt:.2f}s = "
            f"{rates[-1]:.0f} tok/s")
    mean_dec = sum(rates) / len(rates)
    tpot = B / mean_dec

    vit_mean = sum(vit_ms) / len(vit_ms)
    pf_mean = sum(pf) / len(pf)
    print(json.dumps({
        "metric": f"mm_vit_encode_ms_{img}px_{vit_layers}L",
        "value": round(vit_mean, 1), "unit": "ms",
        "vs_baseline": round(346.0 / max(vit_mean, 1e-9), 3),
        "windows": [round(v, 1) for v in vit_ms],
    }))
    print(json.dumps({
        "metric": "mm_prefill_tokens_per_sec",
        "value": round(pf_mean, 1), "unit": "tokens/s/chip",
        "vs_baseline": None,
        "windows": [round(v, 1) for v in pf],
    }))
    print(json.dumps({
        "metric": f"mm_decode_tpot_s_b{B}_accept{accept_p}",
        "value": round(tpot, 5), "unit": "s/token/request",
        "vs_baseline": round(0.0101 / max(tpot, 1e-9), 3),
        "decode_tok_s": round(mean_dec, 1),
        "windows": [round(r, 1) for r in rates],
    }))


if __name__ == "__main__":
    main()
