"""Train a tiny draft/target Qwen2 pair on a synthetic corpus and measure
REAL spec-decode acceptance and quantization Δppl through the engine.

Why this exists: this container has zero network egress and no cached
checkpoints, so genuine Qwen2.5 weights are unobtainable (VERDICT r1
item 1 asks for real-checkpoint evidence). The closest obtainable
evidence is a TRAINED pair — two models with genuinely correlated but
different distributions — instead of the synthetic acceptance-1.0
oracle:

  * acceptance: draft (2 layers) and target (4 layers) trained on the
    same structured corpus; acceptance is whatever their learned
    distributions produce — measured greedy AND sampled, per K;
  * Δppl: int8/int4 quantization error measured on TRAINED weight
    distributions (outliers and all), against the BASELINE gates
    (Δppl ≤ 0.1 int8 / ≤ 0.3 int4);
  * loader: the pair is saved as HF-format safetensors (multi-shard for
    the target) and loaded back through ModelConfig.from_hf_config +
    load_params — the real-checkpoint path end-to-end.

Usage:  python scripts/train_tiny_pair.py [--steps 600] [--out DIR]
Prints a JSON result line; paste the table into PERF_NOTES.md.
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


# ---------------------------------------------------------------------------
# synthetic structured corpus (byte-level, vocab 258)
# ---------------------------------------------------------------------------

ADJ = ["red", "big", "old", "tiny", "fast", "cold", "new", "odd"]
NOUN = ["cat", "dog", "ship", "tree", "rock", "bird", "car", "fox"]
VERB = ["sees", "likes", "finds", "takes", "hits", "rides"]


def make_corpus(rng: np.random.Generator, n_sentences: int) -> str:
    out = []
    for _ in range(n_sentences):
        out.append(
            f"the {rng.choice(ADJ)} {rng.choice(NOUN)} "
            f"{rng.choice(VERB)} the {rng.choice(ADJ)} {rng.choice(NOUN)}. "
        )
    return "".join(out)


def make_corpus_hard(rng: np.random.Generator, n_records: int) -> str:
    """Mixed-structure corpus with IRREDUCIBLE entropy (random hex ids,
    numbers) so the trained target's ppl cannot saturate near 1 — the
    round-2 review's criterion for non-trivial Δppl/acceptance evidence
    (dense ppl >= 2.5). Prose, JSON-ish records, and arithmetic lines
    interleave so the models must learn real structure too."""
    out = []
    for _ in range(n_records):
        kind = rng.integers(0, 4)
        if kind == 0:  # prose with a relative clause
            out.append(
                f"the {rng.choice(ADJ)} {rng.choice(NOUN)} that "
                f"{rng.choice(VERB)} the {rng.choice(NOUN)} "
                f"{rng.choice(VERB)} a {rng.choice(ADJ)} {rng.choice(NOUN)}. "
            )
        elif kind == 1:  # JSON-ish record with random id + number
            rid = "".join(rng.choice(list("0123456789abcdef"), size=6))
            out.append(
                f'{{"id":"{rid}","n":{rng.integers(0, 100000)},'
                f'"tag":"{rng.choice(ADJ)}"}} '
            )
        elif kind == 2:  # arithmetic (structured but value-random)
            a, b = rng.integers(0, 1000, size=2)
            out.append(f"{a}+{b}={a + b}; ")
        else:  # key=value log line with hex noise
            rid = "".join(rng.choice(list("0123456789abcdef"), size=8))
            out.append(
                f"user={rid} score={rng.integers(0, 1000)} "
                f"item={rng.choice(NOUN)}\n"
            )
    return "".join(out)


def batches(rng, text_bytes: np.ndarray, B: int, T: int, steps: int):
    n = len(text_bytes) - T - 1
    for _ in range(steps):
        starts = rng.integers(0, n, size=B)
        yield np.stack([text_bytes[s : s + T + 1] for s in starts])


# ---------------------------------------------------------------------------


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=600)
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--seqlen", type=int, default=64)
    ap.add_argument("--out", default="/tmp/vot_tiny_pair")
    ap.add_argument("--hard", action="store_true",
                    help="mixed-structure corpus with irreducible entropy "
                         "+ larger pair + K in {2,4,8} (round-3 evidence)")
    ap.add_argument("--wide", action="store_true",
                    help="1024d/4L target + 256d/2L draft on the hard "
                         "corpus (round-4: int4 Dppl gate evidence at a "
                         "width where group-128 quantization is "
                         "non-trivial; VERDICT r3 item 8). Implies --hard "
                         "corpus; budget ~hours on a 2-core CPU")
    args = ap.parse_args()
    if args.wide:
        args.hard = True

    os.environ.pop("PALLAS_AXON_POOL_IPS", None)
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import optax

    from vllm_omni_draft_tpu.config import ModelConfig
    from vllm_omni_draft_tpu.models import qwen2
    from vllm_omni_draft_tpu.models.weights import (
        load_params,
        quantize_params,
        save_hf_checkpoint,
    )
    from vllm_omni_draft_tpu.ops.attention import AttentionMetadata

    rng = np.random.default_rng(0)
    if args.hard:
        train_text = make_corpus_hard(rng, 20000)
        eval_text = make_corpus_hard(np.random.default_rng(1), 1500)
    else:
        train_text = make_corpus(rng, 4000)
        eval_text = make_corpus(np.random.default_rng(1), 300)
    train_bytes = np.frombuffer(train_text.encode(), np.uint8).astype(np.int32)
    eval_bytes = np.frombuffer(eval_text.encode(), np.uint8).astype(np.int32)

    B, T = args.batch, args.seqlen

    def full_seq_loss_fn(cfg, fwd):
        bs = 8
        nb = -(-T // bs)

        def loss(params, batch):  # batch [B, T+1] int32
            toks, labels = batch[:, :-1], batch[:, 1:]
            pos = jnp.broadcast_to(jnp.arange(T, dtype=jnp.int32), (B, T))
            table = (
                jnp.arange(B, dtype=jnp.int32)[:, None] * nb
                + jnp.arange(nb, dtype=jnp.int32)[None, :]
                + 1
            )
            slots = jnp.take_along_axis(table, pos // bs, axis=1) * bs + pos % bs
            meta = AttentionMetadata(
                block_tables=table,
                kv_lens=jnp.full((B,), T, jnp.int32),
                positions=pos,
                slot_mapping=slots,
            )
            kv = qwen2.init_kv_cache(cfg, B * nb + 1, bs)
            hidden, _ = fwd(params, toks, pos, kv, meta)
            logits = qwen2.compute_logits(
                cfg, params, hidden.reshape(B * T, -1)
            )
            logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
            nll = -jnp.take_along_axis(
                logp, labels.reshape(-1)[:, None], axis=1
            )
            return jnp.mean(nll)

        return loss

    def train(cfg, steps, seed):
        fwd = qwen2.make_forward(cfg)
        loss_fn = full_seq_loss_fn(cfg, fwd)
        params = qwen2.init_params(cfg, jax.random.PRNGKey(seed))
        opt = optax.adamw(3e-3, weight_decay=0.01)
        opt_state = opt.init(params)

        @jax.jit
        def step(params, opt_state, batch):
            l, g = jax.value_and_grad(loss_fn)(params, batch)
            updates, opt_state = opt.update(g, opt_state, params)
            return optax.apply_updates(params, updates), opt_state, l

        t0 = time.time()
        brng = np.random.default_rng(seed + 100)
        for i, b in enumerate(batches(brng, train_bytes, B, T, steps)):
            params, opt_state, l = step(params, opt_state, jnp.asarray(b))
            if i % 100 == 0:
                print(f"  step {i}: loss {float(l):.3f}", file=sys.stderr)
        print(f"  trained {steps} steps in {time.time()-t0:.0f}s, "
              f"final loss {float(l):.3f}", file=sys.stderr)
        return params, loss_fn

    def eval_ppl(cfg, params, loss_fn) -> float:
        tot, cnt = 0.0, 0
        erng = np.random.default_rng(7)
        lf = jax.jit(loss_fn)
        for b in batches(erng, eval_bytes, B, T, 8):
            tot += float(lf(params, jnp.asarray(b)))
            cnt += 1
        return float(np.exp(tot / cnt))

    if args.wide:
        # wide enough that group-128 int4 covers full rows (8 groups
        # per 1024-d input) and the Dppl gate carries information
        tcfg = ModelConfig.tiny(
            vocab_size=258, hidden_size=1024, intermediate_size=4096,
            num_layers=4, num_heads=8, num_kv_heads=2, head_dim=128,
            max_model_len=256, dtype="float32",
        )
        dcfg = ModelConfig.tiny(
            vocab_size=258, hidden_size=256, intermediate_size=1024,
            num_layers=2, num_heads=4, num_kv_heads=2, head_dim=64,
            max_model_len=256, dtype="float32",
        )
    elif args.hard:
        # int4 group quantization needs hidden/intermediate % 128 == 0
        tcfg = ModelConfig.tiny(
            vocab_size=258, hidden_size=256, intermediate_size=1024,
            num_layers=6, num_heads=8, num_kv_heads=2, head_dim=32,
            max_model_len=256, dtype="float32",
        )
        dcfg = ModelConfig.tiny(
            vocab_size=258, hidden_size=128, intermediate_size=512,
            num_layers=2, num_heads=4, num_kv_heads=2, head_dim=32,
            max_model_len=256, dtype="float32",
        )
    else:
        tcfg = ModelConfig.tiny(
            vocab_size=258, hidden_size=128, intermediate_size=512,
            num_layers=4, num_heads=4, num_kv_heads=2, head_dim=32,
            max_model_len=256, dtype="float32",
        )
        dcfg = ModelConfig.tiny(
            vocab_size=258, hidden_size=64, intermediate_size=256,
            num_layers=2, num_heads=2, num_kv_heads=2, head_dim=32,
            max_model_len=256, dtype="float32",
        )

    print(f"training target ({tcfg.num_layers}L/{tcfg.hidden_size}d)...",
          file=sys.stderr)
    tparams, tloss = train(tcfg, args.steps, seed=0)
    print(f"training draft ({dcfg.num_layers}L/{dcfg.hidden_size}d)...", file=sys.stderr)
    dparams, _ = train(dcfg, args.steps, seed=1)

    # ---- Δppl: dense vs int8 vs int4 on the TRAINED target ----
    ppl_dense = eval_ppl(tcfg, tparams, tloss)
    ppl_int8 = eval_ppl(tcfg, quantize_params(tparams, "int8"), tloss)
    ppl_int4 = eval_ppl(tcfg, quantize_params(tparams, "int4"), tloss)
    print(f"ppl dense={ppl_dense:.4f} int8={ppl_int8:.4f} "
          f"int4={ppl_int4:.4f}", file=sys.stderr)

    # ---- save as HF checkpoints (target multi-shard) and reload ----
    tdir, ddir = os.path.join(args.out, "target"), os.path.join(args.out, "draft")
    save_hf_checkpoint(
        tparams, tcfg, tdir,
        # still multi-shard, but don't spray a 280 MB wide target into
        # hundreds of 400 kB files
        max_shard_bytes=100_000_000 if args.wide else 400_000,
    )
    save_hf_checkpoint(dparams, dcfg, ddir)
    n_shards = len([f for f in os.listdir(tdir) if f.endswith(".safetensors")])
    print(f"target saved as {n_shards} shards", file=sys.stderr)

    # ---- real engine: spec acceptance of the trained pair ----
    from vllm_omni_draft_tpu.config import (
        CacheConfig, EngineConfig, SchedulerConfig, SpeculativeConfig,
    )
    from vllm_omni_draft_tpu.core.request import Request, SamplingParams
    from vllm_omni_draft_tpu.core.engine import EngineCore

    def acceptance(k: int, sampled: bool) -> tuple[float, float]:
        target = ModelConfig.from_hf_config(
            tdir, dtype="float32", max_model_len=256
        )
        draft = ModelConfig.from_hf_config(
            ddir, dtype="float32", max_model_len=256
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
                prompt_token_ids=eval_bytes[s : s + 32].tolist(),
                sampling_params=sp,
            ))
        while engine.has_unfinished():
            engine.step()
        st = engine.scheduler.spec_stats
        return st.acceptance_rate, st.mean_tokens_per_step

    results = {"ppl": {"dense": round(ppl_dense, 4),
                       "int8": round(ppl_int8, 4),
                       "int4": round(ppl_int4, 4),
                       "delta_int8": round(ppl_int8 - ppl_dense, 4),
                       "delta_int4": round(ppl_int4 - ppl_dense, 4)},
               "target_shards": n_shards,
               "acceptance": {}}
    for k in ((2, 4, 8) if args.hard else (2, 4)):
        for sampled in (False, True):
            acc, tps = acceptance(k, sampled)
            tag = f"k{k}_{'sampled' if sampled else 'greedy'}"
            results["acceptance"][tag] = {
                "rate": round(acc, 3), "tokens_per_step": round(tps, 2)
            }
            print(f"  {tag}: acceptance={acc:.3f} tok/step={tps:.2f}",
                  file=sys.stderr)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
