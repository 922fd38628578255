"""TPU throughput + acceptance of a REAL trained draft/target pair
(VERDICT r3 item 8: a headline-style number from trained weights, not
an oracle).

Loads the HF-format pair produced by scripts/train_tiny_pair.py
(--wide: 4L/1024d target, 2L/256d draft, byte vocab 258) through the
real checkpoint path and measures steady-state decode windows on the
chip with the engine's standard 3-window discipline. The pair is tiny
by 7B standards — the value of this number is that the acceptance
statistic comes from two genuinely trained, correlated-but-different
distributions, with no oracle anywhere.

Run:  PYTHONPATH=/root/.axon_site:/root/repo \
      VOT_PAIR_DIR=/tmp/vot_wide_pair timeout 2400 \
      python scripts/tpu_trained_pair.py
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "scripts"
))

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    from train_tiny_pair import make_corpus_hard

    from vllm_omni_draft_tpu.config import (
        CacheConfig, EngineConfig, ModelConfig, SchedulerConfig,
        SpeculativeConfig,
    )
    from vllm_omni_draft_tpu.core.engine import EngineCore
    from vllm_omni_draft_tpu.core.request import Request, SamplingParams

    pair = os.environ.get("VOT_PAIR_DIR", "/tmp/vot_wide_pair")
    K = int(os.environ.get("VOT_PAIR_K", "4"))
    B = int(os.environ.get("VOT_PAIR_BATCH", "16"))
    sampled = os.environ.get("VOT_PAIR_SAMPLED", "0") == "1"

    target = ModelConfig.from_hf_config(
        os.path.join(pair, "target"), dtype="bfloat16", max_model_len=512,
    )
    draft = ModelConfig.from_hf_config(
        os.path.join(pair, os.environ.get("VOT_PAIR_DRAFT", "draft")),
        dtype="bfloat16", max_model_len=512,
    )
    cfg = EngineConfig(
        model=target,
        cache=CacheConfig(block_size=128, num_blocks=128),
        scheduler=SchedulerConfig(
            max_num_seqs=B, max_num_batched_tokens=2048,
            prefill_buckets=(64,), max_model_len=512,
        ),
        speculative=SpeculativeConfig(
            draft_model=draft, num_speculative_tokens=K,
        ),
        seed=0,
    )
    t0 = time.perf_counter()
    engine = EngineCore(cfg)
    log(f"engine up in {time.perf_counter()-t0:.1f}s "
        f"(target {target.num_layers}L/{target.hidden_size}d, "
        f"draft {draft.num_layers}L/{draft.hidden_size}d)")

    eval_text = make_corpus_hard(np.random.default_rng(1), 1500)
    eval_bytes = np.frombuffer(eval_text.encode(), np.uint8).astype(np.int32)
    sp = SamplingParams(
        max_tokens=448,
        temperature=0.7 if sampled else 0.0,
        top_p=0.95 if sampled else 1.0,
        top_k=64 if sampled else 0,
        ignore_eos=True,
    )
    prng = np.random.default_rng(11)
    for i in range(B):
        s = int(prng.integers(0, len(eval_bytes) - 80))
        engine.add_request(Request(
            request_id=f"tp{i}",
            prompt_token_ids=eval_bytes[s:s + 32].tolist(),
            sampling_params=sp,
        ))

    # warm up (compile) then time steady-state windows
    t0 = time.perf_counter()
    for _ in range(4):
        engine.step()
    log(f"warmup (incl. compile) {time.perf_counter()-t0:.1f}s")

    def emitted():
        return sum(len(r.output_token_ids)
                   for r in engine.scheduler.requests.values())

    rates = []
    for w in range(3):
        n0, a0, d0 = (emitted(), engine.scheduler.spec_stats.num_accepted_tokens,
                      engine.scheduler.spec_stats.num_draft_tokens)
        t0 = time.perf_counter()
        for _ in range(10):
            if not engine.has_unfinished():
                break
            engine.step()
        dt = time.perf_counter() - t0
        toks = emitted() - n0
        rates.append(toks / dt)
        st = engine.scheduler.spec_stats
        acc = ((st.num_accepted_tokens - a0)
               / max(st.num_draft_tokens - d0, 1))
        log(f"window {w}: {toks} tokens in {dt:.2f}s "
            f"({rates[-1]:.1f} tok/s, window acceptance {acc:.3f})")

    st = engine.scheduler.spec_stats
    out = {
        "metric": "trained_pair_decode_tokens_per_sec_per_chip",
        "value": round(float(np.mean(rates)), 1),
        "unit": "tokens/s/chip",
        "sigma": round(float(np.std(rates)), 1),
        "acceptance": round(st.acceptance_rate, 3),
        "tokens_per_step": round(st.mean_tokens_per_step, 2),
        "config": {"K": K, "batch": B, "sampled": sampled,
                   "target": f"{target.num_layers}L/{target.hidden_size}d",
                   "draft": f"{draft.num_layers}L/{draft.hidden_size}d"},
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
