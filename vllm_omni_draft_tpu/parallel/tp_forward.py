"""shard_map TP executor: per-shard Pallas kernels + explicit collectives.

Why this exists: the engine's default TP path annotates params with
NamedShardings and lets GSPMD partition the program — which works for
pure-XLA ops but NOT for the Pallas quantized-matmul custom calls
(GSPMD cannot partition a custom call: it either all-gathers the weight
operand or, on the CPU fallback, reshards the packed int4 weights every
layer — measured by scripts/collective_bytes.py, PERF_NOTES round-5).
This module routes the whole layer stack through `jax.shard_map` so
every shard runs the SAME single-chip code (Pallas kernels included) on
its LOCAL megatron shard, with the two row-parallel all-reduces (o
proj, down proj) issued explicitly per layer — exactly the collectives
a hand-rolled Megatron engine would move, nothing else.

Sharding (reuses parallel/sharding.param_spec):
  q/k/v/gate/up  column-parallel   (local heads = H/tp)
  o/down         row-parallel      (+ lax.psum, the only comm)
  embed/lm_head  vocab-sharded     (masked local lookup + psum / local
                                    matmul, logits returned vocab-sharded)
  norms          replicated
  KV cache       kv-heads sharded  (attention fully shard-local)

Constraints: num_heads, num_kv_heads, intermediate_size, vocab_size all
divisible by tp (head-replication fallbacks stay on the GSPMD path),
and for int4 the row-parallel quant groups must not straddle shards:
(I/tp) % group == 0 for I in {num_heads*head_dim, intermediate_size}.
Notably the true Qwen-72B intermediate (29568 = 128 x 231 groups, odd
group count) can never align to an even tp at group 128 — an int4 72B
deployment pads the intermediate dim at quantization time (29696 =
128 x 232); tp_supported rejects the unpadded shape so the engine
falls back to gspmd instead of mis-sharding.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding
from jax.sharding import PartitionSpec as P

from vllm_omni_draft_tpu.config import ModelConfig
from vllm_omni_draft_tpu.models.qwen2 import (
    _dtype,
    make_layer_body,
)
from vllm_omni_draft_tpu.ops.attention import AttentionMetadata
from vllm_omni_draft_tpu.ops.layers import linear, rms_norm, rope_cos_sin
from vllm_omni_draft_tpu.parallel.mesh import TP_AXIS
from vllm_omni_draft_tpu.parallel.sharding import (
    _divisible_spec,
    _path_names,
    param_spec,
)


def tp_supported(cfg: ModelConfig, tp: int) -> bool:
    if not (
        tp > 1
        and cfg.num_heads % tp == 0
        and cfg.num_kv_heads % tp == 0
        and cfg.intermediate_size % tp == 0
        and cfg.vocab_size % tp == 0
    ):
        return False
    if cfg.quantization == "int4":
        # row-parallel int4 shards must not straddle quant groups and
        # local widths must stay even for the split-half repack
        # (_repack_int4_row_parallel raises otherwise); check the two
        # row-parallel input dims so unsupported configs fall back to
        # the gspmd path instead of dying at engine startup
        for I in (cfg.num_heads * cfg.head_dim, cfg.intermediate_size):
            if I % tp or (I // tp) % 2:
                return False
            g = min(cfg.quant_group_size, I)
            if g != I and (I // tp) % g != 0:
                return False
    return True


def _param_specs(params: dict, mesh: Mesh) -> dict:
    return jax.tree_util.tree_map_with_path(
        lambda kp, leaf: _divisible_spec(
            mesh, param_spec(_path_names(kp), leaf), leaf.shape
        ),
        params,
    )


def _repack_int4_row_parallel(w: dict, tp: int) -> dict:
    """Make each tp shard of a ROW-PARALLEL int4 weight self-contained.

    The split-half packing pairs column b with column b + I/2 in one
    byte, so slicing the packed dim does NOT select a contiguous column
    range — exactly why GSPMD reshards these weights every layer
    (PERF_NOTES round-5). Repack so shard s's bytes pair columns within
    its own I/tp slice; the local matmul_int4 then reads its shard as a
    normal split-half weight over the local I."""
    packed = w["w"]
    half = packed.shape[-1]
    I = half * 2
    Iloc = I // tp
    if I % tp or Iloc % 2:
        raise ValueError(f"int4 row-parallel I={I} not shardable by tp={tp}")
    s = w["s"]
    n_groups = s.shape[-1]
    if n_groups > 1 and Iloc % (I // n_groups):
        raise ValueError(
            f"int4 group size {I // n_groups} straddles tp={tp} shards "
            f"of I={I} (need (I/tp) % group == 0)"
        )
    lo = packed & 0xF                     # columns [0, I/2)
    hi = packed >> 4                      # columns [I/2, I)
    u = jnp.concatenate([lo, hi], axis=-1)           # [..., O, I] nibbles
    u = u.reshape(*u.shape[:-1], tp, Iloc)
    lo2, hi2 = u[..., : Iloc // 2], u[..., Iloc // 2:]
    repacked = (lo2 | (hi2 << 4)).astype(jnp.uint8)
    return {**w, "w": repacked.reshape(*packed.shape[:-1], half)}


def _prepare_params_tp(params: dict, tp: int) -> dict:
    from vllm_omni_draft_tpu.ops.quant import weight_kind

    lw = dict(params["layers"])
    for name in ("o", "down"):
        if name in lw and isinstance(lw[name], dict) and "s" in lw[name] \
                and weight_kind(lw[name]) == "int4":
            lw[name] = _repack_int4_row_parallel(lw[name], tp)
    return {**params, "layers": lw}


def shard_params_tp(params: dict, mesh: Mesh) -> dict:
    params = _prepare_params_tp(params, mesh.shape[TP_AXIS])
    specs = _param_specs(params, mesh)
    return jax.device_put(
        params,
        jax.tree.map(lambda sp: NamedSharding(mesh, sp), specs,
                     is_leaf=lambda x: isinstance(x, P)),
    )


KV_SPEC = P(None, None, None, TP_AXIS, None)


def shard_kv_tp(kv: dict, mesh: Mesh) -> dict:
    return {
        k: jax.device_put(v, NamedSharding(mesh, KV_SPEC))
        for k, v in kv.items()
    }


def make_forward_tp(cfg: ModelConfig, mesh: Mesh, deferred_kv: bool = False):
    """forward(params, token_ids, positions, kv_cache, meta) with the
    same contract as models.qwen2.make_forward; params/kv must carry
    the megatron shardings (shard_params_tp / shard_kv_tp). Hidden
    states come back replicated."""
    tp = mesh.shape[TP_AXIS]
    if not tp_supported(cfg, tp):
        raise ValueError(
            f"shard_map TP path needs heads/kv_heads/intermediate/vocab "
            f"divisible by tp={tp} (cfg: {cfg.num_heads}/{cfg.num_kv_heads}"
            f"/{cfg.intermediate_size}/{cfg.vocab_size})"
        )
    local_cfg = dataclasses.replace(
        cfg,
        num_heads=cfg.num_heads // tp,
        num_kv_heads=cfg.num_kv_heads // tp,
        intermediate_size=cfg.intermediate_size // tp,
    )
    Dh = cfg.head_dim
    theta = cfg.rope_theta
    eps = cfg.rms_norm_eps
    psum = lambda y: jax.lax.psum(y, TP_AXIS)
    layer_body = make_layer_body(local_cfg, deferred_kv, reduce_fn=psum)

    def forward(params, token_ids, positions, kv_cache, meta,
                input_embeds=None):
        lw = params["layers"]
        lw_specs = _param_specs({"layers": lw}, mesh)["layers"]
        L = cfg.num_layers
        rep = P()

        def local_fwd(lw, embed, fnorm, tokens, pos_ids, kc, vc,
                      bt, kl, mpos, slots, emb_in):
            meta_l = AttentionMetadata(
                block_tables=bt, kv_lens=kl, positions=mpos,
                slot_mapping=slots,
            )
            if emb_in is None:
                # vocab-sharded embedding: masked local lookup + psum
                Vloc = embed.shape[0]
                start = jax.lax.axis_index(TP_AXIS) * Vloc
                ids = jnp.maximum(tokens, 0) - start
                ok = (ids >= 0) & (ids < Vloc)
                x = embed[jnp.clip(ids, 0, Vloc - 1)] * ok[..., None]
                x = jax.lax.psum(x, TP_AXIS).astype(_dtype(cfg))
            else:
                x = emb_in.astype(_dtype(cfg))
            cos, sin = rope_cos_sin(pos_ids, Dh, theta)

            def layer_fn(carry, l):
                return layer_body(lw, cos, sin, meta_l, carry, l)

            (x, kc, vc), ys = jax.lax.scan(
                layer_fn, (x, kc, vc), jnp.arange(L, dtype=jnp.int32),
                unroll=L if L <= 8 else 1,
            )
            if deferred_kv:
                # same batched all-layer commit + WAR barrier as
                # make_forward (see its comment for the copy-insertion
                # trap this avoids)
                from vllm_omni_draft_tpu.ops.attention import (
                    write_kv_all_layers,
                )

                kc, vc, x = jax.lax.optimization_barrier((kc, vc, x))
                kc, vc = write_kv_all_layers(
                    kc, vc, ys[0], ys[1], meta_l.slot_mapping
                )
            x = rms_norm(x, fnorm, eps)
            return x, kc, vc

        args = [lw, params["embed"], params["final_norm"], token_ids,
                positions, kv_cache["k"], kv_cache["v"],
                meta.block_tables, meta.kv_lens, meta.positions,
                meta.slot_mapping]
        specs = [lw_specs, P(TP_AXIS, None), rep, rep, rep,
                 KV_SPEC, KV_SPEC, rep, rep, rep, rep]
        if input_embeds is not None:
            f = lambda *a: local_fwd(*a[:-1], emb_in=a[-1])
            args.append(input_embeds)
            specs.append(rep)
        else:
            f = lambda *a: local_fwd(*a, emb_in=None)
        x, nk, nv = jax.shard_map(
            f, mesh=mesh, in_specs=tuple(specs),
            out_specs=(rep, KV_SPEC, KV_SPEC), check_vma=False,
        )(*args)
        return x, {"k": nk, "v": nv}

    return forward


def compute_logits_tp(cfg: ModelConfig, params: dict, hidden, mesh: Mesh):
    """Vocab-sharded lm_head under shard_map: each shard runs the (Pallas
    or XLA) matmul on its local head rows; returns the FULL [N, V]
    logits as a vocab-sharded global array (slice/gather costs surface
    at the caller, same as GSPMD — greedy callers should prefer
    compute_argmax_tp)."""
    head = params["lm_head"] if "lm_head" in params else {"w": params["embed"]}
    head_specs = jax.tree.map(lambda leaf: P(TP_AXIS, *([None] * (leaf.ndim - 1))), head)

    def local(hd, h):
        return linear(h, hd, out_dtype=jnp.float32)

    logits = jax.shard_map(
        local, mesh=mesh, in_specs=(head_specs, P()),
        out_specs=P(None, TP_AXIS), check_vma=False,
    )(head, hidden)
    return logits[..., : cfg.vocab_size]


class TpModelAdapter:
    """Drop-in replacement for a model module (models.qwen2) that
    routes the forward and lm_head through the shard_map executor —
    the runner swaps this in when VOT_TP_EXECUTOR=shardmap (core/
    runner.py) so none of its ~20 compute_logits/compute_argmax call
    sites change. compute_logits_stats derives the row stats FROM the
    gathered logits, which keeps the rejection-sampler invariant
    (stats-fed == computed-from-logits) by construction."""

    def __init__(self, mod, cfg: ModelConfig, mesh: Mesh):
        self._mod = mod
        self._cfg = cfg
        self._mesh = mesh

    def __getattr__(self, name):  # init_kv_cache, init_params, ...
        return getattr(self._mod, name)

    def make_forward(self, cfg: ModelConfig, deferred_kv: bool = False):
        return make_forward_tp(cfg, self._mesh, deferred_kv=deferred_kv)

    def compute_logits(self, cfg: ModelConfig, params: dict, hidden):
        return compute_logits_tp(cfg, params, hidden, self._mesh)

    def compute_argmax(self, cfg: ModelConfig, params: dict, hidden):
        return compute_argmax_tp(cfg, params, hidden, self._mesh)

    def compute_logits_stats(self, cfg: ModelConfig, params: dict, hidden):
        return compute_logits_stats_tp(cfg, params, hidden, self._mesh)


def compute_logits_stats_tp(cfg: ModelConfig, params: dict, hidden,
                            mesh: Mesh):
    """Sampled-verify lm_head under shard_map: full (vocab-sharded)
    logits plus per-row max/argmax computed from LOCAL shard reductions
    and an [N]-pair combine — no full-width replicated reductions over
    the gathered logits (advisor round-5). Stats are over the same
    logits values the caller receives, preserving the stats-fed ==
    computed-from-logits rejection-sampler invariant."""
    head = params["lm_head"] if "lm_head" in params else {"w": params["embed"]}
    head_specs = jax.tree.map(
        lambda leaf: P(TP_AXIS, *([None] * (leaf.ndim - 1))), head
    )
    Vpad = head["w"].shape[0]
    tp = mesh.shape[TP_AXIS]
    Vloc = Vpad // tp

    def local(hd, h):
        logits = linear(h, hd, out_dtype=jnp.float32)  # [N, Vloc]
        start = jax.lax.axis_index(TP_AXIS) * Vloc
        col = jnp.arange(Vloc)[None, :] + start
        masked = jnp.where(col < cfg.vocab_size, logits, -jnp.inf)
        mx = jnp.max(masked, axis=-1)
        am = jnp.argmax(masked, axis=-1).astype(jnp.int32) + start
        allm = jax.lax.all_gather(mx, TP_AXIS)   # [tp, N]
        alla = jax.lax.all_gather(am, TP_AXIS)
        best = jnp.argmax(allm, axis=0)          # first max wins
        gmx = jnp.take_along_axis(allm, best[None], axis=0)[0]
        gam = jnp.take_along_axis(alla, best[None], axis=0)[0]
        return logits, gmx, gam

    logits, mx, am = jax.shard_map(
        local, mesh=mesh, in_specs=(head_specs, P()),
        out_specs=(P(None, TP_AXIS), P(), P()), check_vma=False,
    )(head, hidden)
    return logits[..., : cfg.vocab_size], mx, am


def compute_argmax_tp(cfg: ModelConfig, params: dict, hidden, mesh: Mesh):
    """Greedy lm_head without materializing global logits: local matmul +
    local argmax per shard, then a cross-shard (max, index) combine —
    the only inter-chip traffic is [N] pairs."""
    head = params["lm_head"] if "lm_head" in params else {"w": params["embed"]}
    head_specs = jax.tree.map(lambda leaf: P(TP_AXIS, *([None] * (leaf.ndim - 1))), head)
    Vpad = head["w"].shape[0]
    tp = mesh.shape[TP_AXIS]
    Vloc = Vpad // tp

    def local(hd, h):
        logits = linear(h, hd, out_dtype=jnp.float32)  # [N, Vloc]
        start = jax.lax.axis_index(TP_AXIS) * Vloc
        # mask rows past the true vocab (quantized heads pad V)
        col = jnp.arange(Vloc)[None, :] + start
        logits = jnp.where(col < cfg.vocab_size, logits, -jnp.inf)
        mx = jnp.max(logits, axis=-1)
        am = jnp.argmax(logits, axis=-1).astype(jnp.int32) + start
        # combine: first shard reaching the max wins, matching
        # jnp.argmax's first-occurrence rule over the full row
        allm = jax.lax.all_gather(mx, TP_AXIS)        # [tp, N]
        alla = jax.lax.all_gather(am, TP_AXIS)        # [tp, N]
        best = jnp.argmax(allm, axis=0)
        return jnp.take_along_axis(alla, best[None], axis=0)[0]

    return jax.shard_map(
        local, mesh=mesh, in_specs=(head_specs, P()),
        out_specs=P(), check_vma=False,
    )(head, hidden)
