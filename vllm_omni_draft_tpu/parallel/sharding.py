"""Sharding rules: map the stacked-parameter pytree onto the (dp, tp) mesh.

Megatron-style tensor parallelism expressed as NamedShardings — XLA emits
the all-gathers/reduce-scatters (the pattern of SNIPPETS.md [1][3]):

  q/k/v/gate/up   column-parallel  -> output features sharded over tp
  o/down          row-parallel     -> input features sharded over tp
  embed/lm_head   vocab-sharded over tp
  norms/bias-free scalars          replicated
  KV cache        sharded over kv heads (tp)

Quantized weight dicts shard the same logical dims: int8/int4 "w" follows
the weight layout, scales follow their leading (output) dim.

The draft model is deliberately REPLICATED over tp (BASELINE.json: draft
replicated per host; it is small and its decode loop is latency-bound).
"""

from __future__ import annotations

import jax
from jax.sharding import Mesh, NamedSharding
from jax.sharding import PartitionSpec as P

from vllm_omni_draft_tpu.parallel.mesh import TP_AXIS


def _spec_for_path(path: tuple[str, ...], ndim: int, tp: str | None) -> P:
    """PartitionSpec for one stacked parameter, keyed by its tree path.
    Paths look like ('layers', 'q', 'w') / ('embed',) / ('lm_head', 's')."""
    name = path[-2] if len(path) >= 2 and path[-1] in ("w", "s", "b") else path[-1]
    leaf = path[-1]

    if name in ("embed", "lm_head"):
        # vocab-sharded [V, D] (and scales [V, G])
        return P(*([tp] + [None] * (ndim - 1)))
    if name in ("q", "k", "v", "gate", "up"):
        if leaf == "b":
            return P(None, tp)  # [L, O]
        # w [L, O, I] / s [L, O, G]: shard O
        return P(None, tp, *([None] * (ndim - 2)))
    if name in ("o", "down"):
        if leaf == "s":
            return P(None, tp, *([None] * (ndim - 2)))  # scales follow O? no:
        # w [L, D, I]: shard the contracted input dim I (row-parallel)
        return P(*([None] * (ndim - 1) + [tp]))
    # norms and anything unrecognized: replicated
    return P(*([None] * ndim))


def _fix_row_parallel_scales(path, ndim, tp):
    """Row-parallel (o/down) scale layout: int8 s is [L, O, 1] (output dim,
    replicated); int4 s is [L, O, I//G] (shard the group dim with I)."""
    leaf = path[-1]
    if leaf != "s":
        return None
    name = path[-2]
    if name not in ("o", "down"):
        return None
    if ndim == 3:
        # distinguish int8 [L, O, 1] from int4 [L, O, G] at call site by
        # the actual size; handled in param_spec below.
        return "row_scale"
    return None


def param_spec(path: tuple[str, ...], leaf) -> P:
    """PartitionSpec for a parameter leaf (by path + shape)."""
    ndim = leaf.ndim
    marker = _fix_row_parallel_scales(path, ndim, TP_AXIS)
    if marker == "row_scale":
        if leaf.shape[-1] == 1:
            return P(None, None, None)  # int8 per-out-channel scale: replicated
        # int4 group scales [L, O, I//G]: groups follow the sharded I
        return P(None, None, TP_AXIS)
    return _spec_for_path(path, ndim, TP_AXIS)


def _path_names(key_path) -> tuple[str, ...]:
    names = []
    for k in key_path:
        if hasattr(k, "key"):
            names.append(str(k.key))
        elif hasattr(k, "idx"):
            names.append(str(k.idx))
        else:
            names.append(str(k))
    return tuple(names)


def _divisible_spec(mesh: Mesh, spec: P, shape) -> P:
    """Drop mesh axes from dims they don't divide (replication is always
    correct under GSPMD auto sharding — just less distributed)."""
    fixed = []
    for dim, axis in enumerate(spec):
        if axis is not None and shape[dim] % mesh.shape[axis] != 0:
            fixed.append(None)
        else:
            fixed.append(axis)
    return P(*fixed)


def param_shardings(mesh: Mesh, params) -> dict:
    """Pytree of NamedShardings matching `params`."""
    return jax.tree_util.tree_map_with_path(
        lambda kp, leaf: NamedSharding(
            mesh, _divisible_spec(mesh, param_spec(_path_names(kp), leaf), leaf.shape)
        ),
        params,
    )


def replicated_shardings(mesh: Mesh, tree) -> dict:
    return jax.tree.map(
        lambda leaf: NamedSharding(mesh, P(*([None] * leaf.ndim))), tree
    )


def kv_cache_sharding(mesh: Mesh) -> NamedSharding:
    """[L, NUM_BLOCKS, BLOCK, Hkv, D]: KV heads follow the TP shards of
    their k/v projections, so attention runs fully local to each shard."""
    return NamedSharding(mesh, P(None, None, None, TP_AXIS, None))


def shard_params(params, mesh: Mesh):
    return jax.device_put(params, param_shardings(mesh, params))


def shard_kv_cache(kv, mesh: Mesh):
    # kv_heads < tp (head replication): drop the indivisible TP axis —
    # same fallback the runner takes (runner._make_kv)
    def put(leaf):
        spec = _divisible_spec(
            mesh, P(None, None, None, TP_AXIS, None), leaf.shape
        )
        return jax.device_put(leaf, NamedSharding(mesh, spec))

    return {"k": put(kv["k"]), "v": put(kv["v"])}


def replicate(tree, mesh: Mesh):
    return jax.device_put(tree, replicated_shardings(mesh, tree))
