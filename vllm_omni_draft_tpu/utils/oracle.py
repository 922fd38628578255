"""Acceptance-1.0 oracle construction for spec-decode machinery tests.

Rewrites a runner's draft+target weights so BOTH models deterministically
predict "repeat the last token" with O(sqrt(D)) logit margins:

  * zero the o/down projections of every layer (identity residual stream —
    QKV, attention, gate/up still execute at full cost and KV is still
    written/read), and
  * tie each model's lm_head to its own embedding table,

so hidden == RMSNorm(embed(last)) and argmax == last token. Greedy
acceptance is exactly 1.0 BY CONSTRUCTION, robust to bf16 kernel-path
noise (a shared-prefix-weights oracle is argmax-tie fragile). Used by
bench.py (machinery throughput ceiling) and __graft_entry__.py's
multichip dryrun (nonzero-acceptance + losslessness assertions on a
mesh). Reference surface: vLLM spec-decode acceptance accounting
(SURVEY.md §2.2 "speculative decoding")."""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


def _identity_layers(params):
    lyr = dict(params["layers"])
    for name in ("o", "down"):
        d = dict(lyr[name])
        k = "s" if "s" in d else "w"
        d[k] = jnp.zeros_like(d[k])
        lyr[name] = d
    return {**params, "layers": lyr}


def _tied_head(embed, quantization):
    from vllm_omni_draft_tpu.ops import quant as quant_ops

    if quantization == "int4":
        return quant_ops.pad_out_rows(quant_ops.quantize_int4(embed))
    if quantization == "int8":
        return quant_ops.pad_out_rows(quant_ops.quantize_int8(embed))
    return {"w": embed}


def apply_oracle_to_target(runner) -> None:
    """Make the TARGET model a deterministic last-token repeater."""
    quant = runner.config.model.quantization
    fn = partial(jax.jit, donate_argnums=0)(_identity_layers)
    runner.target_params = fn(runner.target_params)
    runner.target_params["lm_head"] = jax.jit(
        lambda e: _tied_head(e, quant)
    )(runner.target_params["embed"])


def apply_oracle(runner) -> None:
    """Make BOTH models deterministic last-token repeaters (acceptance 1.0
    under greedy spec decode)."""
    apply_oracle_to_target(runner)
    if getattr(runner, "draft_params", None) is None:
        return
    fn = partial(jax.jit, donate_argnums=0)(_identity_layers)
    runner.draft_params = fn(runner.draft_params)
    dhead = {"w": runner.draft_params["embed"]}
    if runner.draft_vocab:
        dhead = {"w": dhead["w"][: runner.draft_vocab]}
    runner.draft_params["lm_head"] = dhead
    jax.block_until_ready(runner.draft_params)


def apply_oracle_acceptance_p(runner, p: float) -> None:
    """Acceptance-p oracle: machinery benchmark at a REALISTIC, tunable
    acceptance rate instead of the 1.0 ceiling.

    Construction: identity residual streams (as apply_oracle), but the
    heads encode token->token MAPS over a cyclic walk of the vocab:

      target:  T(t) = t+1 (mod V)   — head row t+1 := embed[t]
      draft:   D(t) = T(t) where agree(t), else t+2 (mod V)

    with agree() an arithmetic p-fraction of ids. The emitted sequence
    walks the cycle under T (the recovery token after a rejection is the
    target argmax), so successive positions sample agree() at ~p
    frequency — PER-POSITION Bernoulli(p)-like acceptance with geometric
    accepted-prefix lengths, i.e. the real spec-decode token-count law
    E[tokens/iter] = (1-p^(K+1))/(1-p), unlike a per-row 0/1 split.
    Margins are O(|embed_row|^2) vs O(sqrt(D)) cross-talk, so bf16
    kernel noise cannot flip the argmaxes (random embeds are
    near-orthogonal); sampled verify sees near-one-hot distributions and
    tracks the same p."""
    assert 0.0 <= p <= 1.0, p
    quant = runner.config.model.quantization
    fn = partial(jax.jit, donate_argnums=0)(_identity_layers)
    runner.target_params = fn(runner.target_params)
    runner.draft_params = fn(runner.draft_params)

    V = runner.config.model.vocab_size
    Vd = runner.draft_vocab or runner.draft_cfg.vocab_size

    @jax.jit
    def make_heads(t_embed, d_embed):
        # equal-norm embedding rows: the argmax margin for token t is
        # |e_t|^2 while the worst-case cross-talk is the max of ~V^2
        # near-Gaussian dots (~4 sigma at V=4096). Random-init rows have
        # chi^2_D norms, and at test dims (D=32) the weak-row tail loses
        # the argmax for ~12% of ids — which silently DEFLATED the
        # engine acceptance statistic at tiny configs. Normalizing rows
        # pins every margin at the mean, killing the tail (big-model
        # margins are unaffected in distribution).
        def unit_rows(e):
            n = jnp.linalg.norm(e.astype(jnp.float32), axis=1, keepdims=True)
            scale = jnp.sqrt(jnp.asarray(e.shape[1], jnp.float32))
            return (e / jnp.maximum(n, 1e-6) * scale).astype(e.dtype)

        t_embed = unit_rows(t_embed)
        d_embed = unit_rows(d_embed)
        # target: row t+1 := t_embed[t]  (roll along vocab axis)
        t_head = jnp.roll(t_embed, 1, axis=0)
        # draft walks the TARGET's cycle but must stay inside its pruned
        # vocab: operate on the first Vd rows (prompt ids are drawn < Vd
        # by the bench, and the cycle wraps inside [0, Vd))
        de = d_embed[:Vd]
        ids = jnp.arange(Vd, dtype=jnp.uint32)
        # hashed agree-set: the emitted walk visits CONSECUTIVE ids, so
        # the hash must decorrelate NEIGHBORS. A bare multiplicative hash
        # ((id*2654435761)>>17 % 1000) does not: consecutive ids step the
        # residue by a near-constant ~259.17, which lengthens agree runs
        # and inflated the engine statistic to 0.60 at nominal p=0.7
        # (round-4 probe, scripts/tpu_acceptance_probe.py — the TPU maps
        # themselves were exact; the drift was this autocorrelation).
        # Use an avalanche finalizer (lowbias32) instead: walk-simulated
        # accepted/drafted is 0.4421 vs law 0.4433 at p=0.7.
        h = ids ^ (ids >> jnp.uint32(16))
        h = h * jnp.uint32(0x7FEB352D)
        h = h ^ (h >> jnp.uint32(15))
        h = h * jnp.uint32(0x846CA68B)
        h = h ^ (h >> jnp.uint32(16))
        agree = (h % jnp.uint32(1000)) < jnp.uint32(int(round(p * 1000)))
        d_head = jnp.where(
            jnp.roll(agree, 1)[:, None], jnp.roll(de, 1, axis=0), 0.0
        ) + jnp.where(
            jnp.roll(agree, 2)[:, None], 0.0, jnp.roll(de, 2, axis=0)
        )
        return t_head, d_head

    t_head, d_head = make_heads(
        runner.target_params["embed"], runner.draft_params["embed"]
    )
    runner.target_params["lm_head"] = jax.jit(
        lambda e: _tied_head(e, quant)
    )(t_head)
    runner.draft_params["lm_head"] = {"w": d_head}
    jax.block_until_ready(runner.draft_params)
