"""Distill the wide-pair draft on the TARGET's output distribution
(VERDICT r4 item 2): the corpus-trained draft disagrees with the target
on irreducible-noise spans because each learned its own idiosyncrasies;
distillation trains the draft to mimic the TARGET — the statistic spec
decode actually pays for. Loss = KL(target || draft) on hard-corpus
inputs (soft targets from the frozen target's logits), optionally mixed
with hard-label CE on the target's argmax (the greedy-acceptance
statistic).

Inputs: the HF-format pair saved by train_tiny_pair.py --wide
(default /tmp/vot_wide_pair). The draft warm-starts from its
corpus-trained weights. Output: a distilled draft checkpoint alongside
the originals + engine-measured acceptance per K for both drafts.

Usage: python scripts/distill_draft.py [--steps 1200] [--pair DIR]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "scripts"
))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=1200)
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--seqlen", type=int, default=64)
    ap.add_argument("--pair", default="/tmp/vot_wide_pair")
    ap.add_argument("--hard-mix", type=float, default=0.5,
                    help="weight of the hard-label (target argmax) CE "
                         "term; 1-w goes to soft KL")
    ap.add_argument("--lr", type=float, default=1e-3)
    args = ap.parse_args()

    os.environ.pop("PALLAS_AXON_POOL_IPS", None)
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import optax

    from train_tiny_pair import batches, make_corpus_hard
    from vllm_omni_draft_tpu.config import ModelConfig
    from vllm_omni_draft_tpu.models import qwen2
    from vllm_omni_draft_tpu.models.weights import (
        load_params,
        save_hf_checkpoint,
    )
    from vllm_omni_draft_tpu.ops.attention import AttentionMetadata

    tdir = os.path.join(args.pair, "target")
    ddir = os.path.join(args.pair, "draft")
    tcfg = ModelConfig.from_hf_config(tdir, dtype="float32", max_model_len=256)
    dcfg = ModelConfig.from_hf_config(ddir, dtype="float32", max_model_len=256)
    tparams = load_params(tcfg)
    dparams = load_params(dcfg)

    rng = np.random.default_rng(0)
    train_text = make_corpus_hard(rng, 20000)
    train_bytes = np.frombuffer(train_text.encode(), np.uint8).astype(np.int32)
    B, T = args.batch, args.seqlen

    def seq_logits_fn(cfg, fwd):
        bs = 8
        nb = -(-T // bs)

        def logits_of(params, toks):  # [B, T] -> [B*T, V] f32
            pos = jnp.broadcast_to(jnp.arange(T, dtype=jnp.int32), (B, T))
            table = (
                jnp.arange(B, dtype=jnp.int32)[:, None] * nb
                + jnp.arange(nb, dtype=jnp.int32)[None, :]
                + 1
            )
            slots = (
                jnp.take_along_axis(table, pos // bs, axis=1) * bs + pos % bs
            )
            meta = AttentionMetadata(
                block_tables=table,
                kv_lens=jnp.full((B,), T, jnp.int32),
                positions=pos,
                slot_mapping=slots,
            )
            kv = qwen2.init_kv_cache(cfg, B * nb + 1, bs)
            hidden, _ = fwd(params, toks, pos, kv, meta)
            return qwen2.compute_logits(cfg, params, hidden.reshape(B * T, -1))

        return logits_of

    t_logits = seq_logits_fn(tcfg, qwen2.make_forward(tcfg))
    d_logits = seq_logits_fn(dcfg, qwen2.make_forward(dcfg))
    w_hard = args.hard_mix

    def distill_loss(dp, tp_frozen, toks):
        tl = jax.lax.stop_gradient(t_logits(tp_frozen, toks))
        p_t = jax.nn.softmax(tl.astype(jnp.float32), axis=-1)
        hard = jnp.argmax(tl, axis=-1)
        dl = d_logits(dp, toks)
        logp_d = jax.nn.log_softmax(dl.astype(jnp.float32), axis=-1)
        soft_ce = -jnp.mean(jnp.sum(p_t * logp_d, axis=-1))
        hard_ce = -jnp.mean(
            jnp.take_along_axis(logp_d, hard[:, None], axis=1)
        )
        return w_hard * hard_ce + (1.0 - w_hard) * soft_ce

    opt = optax.adamw(args.lr, weight_decay=0.01)
    opt_state = opt.init(dparams)

    @jax.jit
    def step(dp, opt_state, batch):
        toks = batch[:, :-1]
        l, g = jax.value_and_grad(distill_loss)(dp, tparams, toks)
        updates, opt_state = opt.update(g, opt_state, dp)
        return optax.apply_updates(dp, updates), opt_state, l

    t0 = time.time()
    brng = np.random.default_rng(321)
    for i, b in enumerate(batches(brng, train_bytes, B, T, args.steps)):
        dparams, opt_state, l = step(dparams, opt_state, jnp.asarray(b))
        if i % 100 == 0:
            print(f"  step {i}: distill loss {float(l):.4f} "
                  f"({time.time()-t0:.0f}s)", file=sys.stderr, flush=True)
    print(f"distilled {args.steps} steps in {time.time()-t0:.0f}s, "
          f"final loss {float(l):.4f}", file=sys.stderr)

    outdir = os.path.join(args.pair, "draft_distilled")
    save_hf_checkpoint(dparams, dcfg, outdir)

    # ---- engine-measured acceptance: original vs distilled draft ----
    from vllm_omni_draft_tpu.config import (
        CacheConfig, EngineConfig, SchedulerConfig, SpeculativeConfig,
    )
    from vllm_omni_draft_tpu.core.engine import EngineCore
    from vllm_omni_draft_tpu.core.request import Request, SamplingParams

    eval_text = make_corpus_hard(np.random.default_rng(1), 1500)
    eval_bytes = np.frombuffer(eval_text.encode(), np.uint8).astype(np.int32)

    def acceptance(draft_dir: str, k: int, sampled: bool):
        target = ModelConfig.from_hf_config(
            tdir, dtype="float32", max_model_len=256
        )
        draft = ModelConfig.from_hf_config(
            draft_dir, dtype="float32", max_model_len=256
        )
        cfg = EngineConfig(
            model=target,
            cache=CacheConfig(block_size=8, num_blocks=256),
            scheduler=SchedulerConfig(
                max_num_seqs=8, max_num_batched_tokens=256,
                prefill_buckets=(64,), max_model_len=256,
            ),
            speculative=SpeculativeConfig(
                draft_model=draft, num_speculative_tokens=k
            ),
            seed=0,
        )
        engine = EngineCore(cfg)
        sp = SamplingParams(
            max_tokens=120,
            temperature=0.7 if sampled else 0.0,
            top_p=0.95 if sampled else 1.0,
            top_k=64 if sampled else 0,
            ignore_eos=True,
        )
        prng = np.random.default_rng(11)
        for i in range(8):
            s = int(prng.integers(0, len(eval_bytes) - 40))
            engine.add_request(Request(
                request_id=f"a{i}",
                prompt_token_ids=eval_bytes[s: s + 32].tolist(),
                sampling_params=sp,
            ))
        while engine.has_unfinished():
            engine.step()
        st = engine.scheduler.spec_stats
        return st.acceptance_rate, st.mean_tokens_per_step

    results = {"distill_steps": args.steps, "hard_mix": w_hard,
               "final_loss": round(float(l), 4), "acceptance": {}}
    for tag, dd in (("orig", ddir), ("distilled", outdir)):
        for k in (2, 4, 8):
            for sampled in (False, True):
                acc, tps = acceptance(dd, k, sampled)
                key = f"{tag}_k{k}_{'sampled' if sampled else 'greedy'}"
                results["acceptance"][key] = {
                    "rate": round(acc, 3), "tokens_per_step": round(tps, 2)
                }
                print(f"  {key}: acceptance={acc:.3f} tok/step={tps:.2f}",
                      file=sys.stderr, flush=True)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
