"""TP sharding for the dual-stream Qwen-Image DiT (models/qwen_image_dit).

Why: the full 60L/20B DiT is ~40 GB bf16 and cannot exist on one 16 GB
chip (PERF_NOTES round-4 image section; the reference's dual-engine
design assumes a big-memory image engine,
`/root/reference/src/doc/engine_core.md:879-1008`). Megatron-style
specs over the "tp" mesh axis shard every big matmul:

  img/txt q,k,v      column-parallel (attention heads follow their
                     projections, so joint attention runs head-local)
  img/txt out        row-parallel
  img/txt mlp1/mlp2  column / row
  modulation, norms,
  patch/text/time IO replicated (tiny next to the blocks)

XLA/GSPMD inserts the all-reduces after the row-parallel matmuls —
there is no hand-written collective. At tp=8 the 60L blocks' ~40 GB
drop to ~5 GB/chip, putting the full model within a v5e pod slice.
"""

from __future__ import annotations

import jax
from jax.sharding import Mesh, NamedSharding
from jax.sharding import PartitionSpec as P

from vllm_omni_draft_tpu.parallel.mesh import TP_AXIS
from vllm_omni_draft_tpu.parallel.sharding import (
    _divisible_spec,
    replicated_shardings,
)

# column-parallel: output features sharded (heads / mlp hidden)
_COL = ("img_q", "img_k", "img_v", "txt_q", "txt_k", "txt_v",
        "img_mlp1", "txt_mlp1")
# row-parallel: input (contracted) features sharded
_ROW = ("img_out", "txt_out", "img_mlp2", "txt_mlp2")


def dit_block_spec(name: str, leaf_name: str, ndim: int) -> P:
    """PartitionSpec for one [L, ...] stacked block leaf."""
    if name in _COL:
        if leaf_name == "b":
            return P(None, TP_AXIS)          # [L, O]
        return P(None, TP_AXIS, None)        # w [L, O, I]
    if name in _ROW:
        if leaf_name == "b":
            return P(None, None)             # row-parallel bias replicates
        return P(None, None, TP_AXIS)        # w [L, O, I], shard I
    return P(*([None] * ndim))               # mod / qknorm: replicated


def dit_param_shardings(mesh: Mesh, params: dict) -> dict:
    """Pytree of NamedShardings for a qwen_image_dit param tree."""
    def blocks_shard(path, leaf):
        name = path[0]
        leaf_name = path[1] if len(path) > 1 else "w"
        spec = _divisible_spec(
            mesh, dit_block_spec(name, leaf_name, leaf.ndim), leaf.shape
        )
        return NamedSharding(mesh, spec)

    def walk(tree, path=()):
        if isinstance(tree, dict):
            return {k: walk(v, path + (k,)) for k, v in tree.items()}
        return blocks_shard(path, tree)

    out = {}
    for k, v in params.items():
        if k == "blocks":
            out[k] = walk(v)
        else:
            out[k] = replicated_shardings(mesh, v)
    return out


def shard_dit_params(params: dict, mesh: Mesh) -> dict:
    return jax.device_put(params, dit_param_shardings(mesh, params))
