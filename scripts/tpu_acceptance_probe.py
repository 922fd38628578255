"""Root-cause the TPU acceptance drift (VERDICT r3 item 5).

Nominal p=0.7 should give engine accepted/drafted = p(1-p^K)/(K(1-p))
= 0.443 at K=4 (CPU-verified law, tests/test_oracle.py); the TPU engine
measures ~0.60. This probe isolates WHERE the drift enters:

  A. MAP LEVEL: evaluate the oracle-modified heads directly — compute
     D(t) (draft argmax) and T(t) (target argmax) for a range of ids
     through the same compute paths the engine uses (int4 lm_head for
     the target, pruned dense head for the draft) and compare against
     the intended maps T(t)=t+1, D(t)=t+1 iff agree(t) else t+2.
  B. WALK LEVEL: simulate the emitted walk with the MEASURED maps and
     compute the expected acceptance statistic, separating map errors
     from engine-accounting errors.

Run: PYTHONPATH=/root/.axon_site:/root/repo timeout 1800 python scripts/tpu_acceptance_probe.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from vllm_omni_draft_tpu.config import (
        CacheConfig, EngineConfig, ModelConfig, SchedulerConfig,
        SpeculativeConfig,
    )
    from vllm_omni_draft_tpu.core.engine import EngineCore
    from vllm_omni_draft_tpu.utils import oracle as oracle_mod

    p = float(os.environ.get("VOT_PROBE_P", "0.7"))
    K = 4
    layers = int(os.environ.get("VOT_PROBE_LAYERS", "4"))  # maps only need heads

    target = ModelConfig(
        vocab_size=151_936, hidden_size=3584, intermediate_size=18944,
        num_layers=layers, num_heads=28, num_kv_heads=4, head_dim=128,
        max_model_len=512, dtype="bfloat16", quantization="int4",
    )
    draft = ModelConfig(
        vocab_size=151_936, hidden_size=896, intermediate_size=4864,
        num_layers=2, num_heads=14, num_kv_heads=2, head_dim=64,
        max_model_len=512, dtype="bfloat16",
    )
    cfg = EngineConfig(
        model=target,
        cache=CacheConfig(block_size=128, num_blocks=64),
        scheduler=SchedulerConfig(
            max_num_seqs=8, max_num_batched_tokens=1024,
            prefill_buckets=(128,), max_model_len=512,
        ),
        speculative=SpeculativeConfig(
            draft_model=draft, num_speculative_tokens=K,
            draft_vocab_size=16384,
        ),
        seed=0,
    )
    engine = EngineCore(cfg)
    runner = engine.runner
    oracle_mod.apply_oracle_acceptance_p(runner, p)

    Vd = runner.draft_vocab or 151_936
    ids = np.arange(0, Vd - 8, dtype=np.int32)

    # intended agree set (mirror of utils/oracle.py — lowbias32 avalanche)
    h = ids.astype(np.uint32)
    h = h ^ (h >> np.uint32(16))
    h = h * np.uint32(0x7FEB352D)
    h = h ^ (h >> np.uint32(15))
    h = h * np.uint32(0x846CA68B)
    h = h ^ (h >> np.uint32(16))
    agree = (h % np.uint32(1000)) < np.uint32(int(round(p * 1000)))
    intended_D = np.where(agree, ids + 1, ids + 2)

    # ---- A. map level ------------------------------------------------------
    # identity residual stream: hidden(last=t) == RMSNorm(embed[t]).
    # Evaluate heads on those hiddens through the engine's module fns.
    tmod, dmod = runner.target_mod, runner.draft_mod
    tcfg, dcfg = runner.config.model, runner.draft_cfg

    @jax.jit
    def target_map(tp, toks):
        hid = tp["embed"][toks]
        from vllm_omni_draft_tpu.ops.layers import rms_norm
        hid = rms_norm(hid, tp["final_norm"], 1e-6)
        logits = tmod.compute_logits(tcfg, tp, hid)
        return jnp.argmax(logits, axis=-1).astype(jnp.int32)

    @jax.jit
    def draft_map(dp, toks):
        hid = dp["embed"][toks]
        from vllm_omni_draft_tpu.ops.layers import rms_norm
        hid = rms_norm(hid, dp["final_norm"], 1e-6)
        logits = dmod.compute_logits(dcfg, dp, hid)
        return jnp.argmax(logits, axis=-1).astype(jnp.int32)

    CH = 4096
    t_map = np.concatenate([
        np.asarray(target_map(runner.target_params,
                              jnp.asarray(ids[i:i + CH])))
        for i in range(0, len(ids), CH)
    ])
    d_map = np.concatenate([
        np.asarray(draft_map(runner.draft_params,
                             jnp.asarray(ids[i:i + CH])))
        for i in range(0, len(ids), CH)
    ])

    t_ok = t_map == ids + 1
    d_ok = d_map == intended_D
    print(f"target map T(t)=t+1 holds: {t_ok.mean():.4f} "
          f"({(~t_ok).sum()} bad of {len(ids)})")
    print(f"draft map matches intent:  {d_ok.mean():.4f} "
          f"({(~d_ok).sum()} bad)")
    if (~d_ok).sum():
        bad = ids[~d_ok][:10]
        print("  first bad draft ids:", bad.tolist())
        print("  D(t) measured:", d_map[~d_ok][:10].tolist())
        print("  D(t) intended:", intended_D[~d_ok][:10].tolist())
        print("  agree(t):     ", agree[~d_ok][:10].tolist())

    # measured per-position agreement along the walk = fraction of ids
    # where the MEASURED maps coincide
    meas_agree = (d_map == t_map)
    print(f"intended agree fraction: {agree.mean():.4f}")
    print(f"measured D(t)==T(t):     {meas_agree.mean():.4f}")

    # ---- B. expected engine statistic from the measured maps --------------
    def law(stat_agree):
        # accepted/drafted with per-position Bernoulli(q)
        q = stat_agree
        return q * (1 - q ** K) / (K * (1 - q)) if q < 1 else 1.0

    print(f"law(accepted/drafted) at intended p: {law(agree.mean()):.4f}")
    print(f"law(accepted/drafted) at measured agreement: "
          f"{law(meas_agree.mean()):.4f}")

    # walk simulation with measured maps (exactly the engine's greedy
    # spec semantics, ignoring vocab-edge effects)
    start = 1000
    t = start
    drafted = accepted = 0
    for _ in range(2000):
        # one spec iteration: draft proposes K from its own chain
        proposals = []
        dt_tok = t
        for _ in range(K):
            nxt = int(d_map[dt_tok]) if dt_tok < len(ids) else dt_tok + 1
            proposals.append(nxt)
            dt_tok = nxt
        # verify: accept prefix while proposal == target argmax
        cur = t
        n_acc = 0
        for j in range(K):
            targ = int(t_map[cur]) if cur < len(ids) else cur + 1
            if proposals[j] == targ:
                n_acc += 1
                cur = proposals[j]
            else:
                break
        drafted += K
        accepted += n_acc
        # recovery/bonus token: target argmax at the first-rejection row
        cur = int(t_map[cur]) if cur < len(ids) else cur + 1
        t = cur
        if t >= len(ids) - K - 2:
            t = start = (start + 7919) % (len(ids) - K - 3)
    print(f"walk-sim accepted/drafted with measured maps: "
          f"{accepted/drafted:.4f}")


if __name__ == "__main__":
    main()
