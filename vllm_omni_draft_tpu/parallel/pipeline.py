"""Pipeline parallelism: microbatched stage execution over a "pp" mesh axis.

The TPU-native analog of the reference's inter-stage IntermediateTensors
handoff (`/root/reference/src/doc/VLLM_V1_Interface.md:157`): instead of
NCCL send/recv between stage workers, the stacked layer parameters (and
the paged KV cache) shard their leading L dimension over a "pp" mesh
axis, and a single SPMD program pipelines M microbatches through the
S stages with `jax.lax.ppermute` carrying the inter-stage hidden states
(the "IntermediateTensors") over ICI. XLA compiles the whole pipeline as
one program — there is no per-stage RPC plane to build or fail.

Schedule: the canonical S-stage, M-microbatch fill/drain loop (GPipe
order, M + S - 1 ticks). Stage s processes microbatch m at tick
t = m + s; in-flight activations move one stage down every tick. KV
writes during fill/drain bubbles are dropped through the engine's inert
slot_mapping=-1 invariant, so bubble compute can never corrupt the cache.

Composition: DP replicates this whole program (engine/dp.py); TP *within*
a stage is out of scope here — on TPU, TP over ICI dominates PP for
intra-host scaling (PERF_NOTES), so PP's role is memory capacity across
hosts, where stage boundaries cross the slow axis exactly once per
microbatch per step. See README "Parallelism" for the stance.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding
from jax.sharding import PartitionSpec as P

from vllm_omni_draft_tpu.config import ModelConfig
from vllm_omni_draft_tpu.models.qwen2 import (
    _dtype,
    make_layer_body,
)
from vllm_omni_draft_tpu.ops.attention import AttentionMetadata
from vllm_omni_draft_tpu.ops.layers import rms_norm, rope_cos_sin

PP_AXIS = "pp"


def make_pp_mesh(pp: int, devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    if pp > len(devices):
        raise ValueError(f"pp={pp} needs {pp} devices, have {len(devices)}")
    return Mesh(np.asarray(devices[:pp]).reshape(pp), (PP_AXIS,))


def _stage_spec(leaf) -> P:
    return P(PP_AXIS, *([None] * (leaf.ndim - 1)))


def shard_params_pp(params: dict, mesh: Mesh) -> dict:
    """Stacked [L, ...] layer leaves shard L over pp (each stage holds
    its contiguous L/S layers); embed/final_norm/lm_head replicate."""
    out = dict(params)
    out["layers"] = jax.tree.map(
        lambda leaf: jax.device_put(
            leaf, NamedSharding(mesh, _stage_spec(leaf))
        ),
        params["layers"],
    )
    rep = lambda leaf: jax.device_put(
        leaf, NamedSharding(mesh, P(*([None] * leaf.ndim)))
    )
    for k in params:
        if k != "layers":
            out[k] = jax.tree.map(rep, params[k])
    return out


def shard_kv_pp(kv: dict, mesh: Mesh) -> dict:
    """KV cache [L, NB, BS, Hkv, D]: each stage holds its own layers'
    pages — PP shards KV *capacity*, the reason to use PP at all."""
    return {
        "k": jax.device_put(kv["k"], NamedSharding(mesh, _stage_spec(kv["k"]))),
        "v": jax.device_put(kv["v"], NamedSharding(mesh, _stage_spec(kv["v"]))),
    }


def make_pipeline_forward(cfg: ModelConfig, pp: int, microbatches: int,
                          mesh: Mesh | None = None):
    """Build forward(params, token_ids, positions, kv_cache, meta) with
    the same contract as models.qwen2.make_forward (immediate-KV mode),
    executing the layer stack as a pp-stage pipeline. Token/logit parity
    with the single-device forward is exact: each layer runs the same
    layer_body math in the same order, only placed on a stage.

    Requires cfg.num_layers % pp == 0 and batch % microbatches == 0.
    """
    if cfg.num_layers % pp != 0:
        raise ValueError(f"num_layers={cfg.num_layers} not divisible by pp={pp}")
    mesh = mesh if mesh is not None else make_pp_mesh(pp)
    M = microbatches
    Dh = cfg.head_dim
    theta = cfg.rope_theta
    eps = cfg.rms_norm_eps
    Lp = cfg.num_layers // pp
    layer_body = make_layer_body(cfg)

    def forward(params, token_ids, positions, kv_cache, meta):
        B = token_ids.shape[0]
        if B % M != 0:
            raise ValueError(f"batch {B} not divisible by microbatches {M}")
        Bm = B // M
        x = params["embed"][jnp.maximum(token_ids, 0)].astype(_dtype(cfg))
        cos, sin = rope_cos_sin(positions, Dh, theta)

        def split(a):  # [B, ...] -> [M, Bm, ...]
            return a.reshape(M, Bm, *a.shape[1:])

        x_mbs, cos_mbs, sin_mbs = split(x), split(cos), split(sin)
        bt_mbs = split(meta.block_tables)
        kl_mbs = split(meta.kv_lens)
        pos_mbs = split(meta.positions)
        slot_mbs = split(meta.slot_mapping)
        lw = params["layers"]

        def pipelined(x_mbs, cos_mbs, sin_mbs, bt_mbs, kl_mbs, pos_mbs,
                      slot_mbs, lw, kc, vc):
            s = jax.lax.axis_index(PP_AXIS)
            is_last = s == pp - 1

            def stage_compute(x_in, mb, kc, vc, valid):
                cos_m, sin_m = cos_mbs[mb], sin_mbs[mb]
                meta_m = AttentionMetadata(
                    block_tables=bt_mbs[mb],
                    kv_lens=kl_mbs[mb],
                    positions=pos_mbs[mb],
                    # bubble ticks drop their KV writes (slot -1 is the
                    # engine's inert-row invariant) so garbage in-flight
                    # activations never touch the cache
                    slot_mapping=jnp.where(valid, slot_mbs[mb],
                                           jnp.full_like(slot_mbs[mb], -1)),
                )

                def lf(carry, l):
                    return layer_body(lw, cos_m, sin_m, meta_m, carry, l)

                (y, kc, vc), _ = jax.lax.scan(
                    lf, (x_in, kc, vc), jnp.arange(Lp, dtype=jnp.int32),
                    unroll=Lp if Lp <= 8 else 1,
                )
                return y, kc, vc

            outputs = jnp.zeros_like(x_mbs)
            state = jnp.zeros_like(x_mbs[0])

            def tick(t, carry):
                state, outputs, kc, vc = carry
                m = t - s  # microbatch this stage works on at tick t
                valid = (m >= 0) & (m < M)
                mb = jnp.clip(m, 0, M - 1)
                # stage 0 ingests a fresh microbatch; later stages use
                # the activations ppermuted down at the end of last tick
                x_in = jnp.where(s == 0, x_mbs[mb], state)
                y, kc, vc = stage_compute(x_in, mb, kc, vc, valid)
                outputs = jnp.where(
                    valid & is_last, outputs.at[mb].set(y), outputs
                )
                # IntermediateTensors handoff: one hop down the ring
                state = jax.lax.ppermute(
                    y, PP_AXIS, [(i, (i + 1) % pp) for i in range(pp)]
                )
                return state, outputs, kc, vc

            state, outputs, kc, vc = jax.lax.fori_loop(
                0, M + pp - 1, tick, (state, outputs, kc, vc)
            )
            # only the last stage holds real outputs; broadcast them so
            # the (replicated) lm_head can run anywhere
            outputs = jax.lax.psum(
                jnp.where(is_last, outputs, jnp.zeros_like(outputs)),
                PP_AXIS,
            )
            return outputs, kc, vc

        rep = P()
        stage = P(PP_AXIS)
        lw_specs = jax.tree.map(lambda leaf: _stage_spec(leaf), lw)
        outputs, new_k, new_v = jax.shard_map(
            pipelined,
            mesh=mesh,
            in_specs=(rep, rep, rep, rep, rep, rep, rep, lw_specs,
                      stage, stage),
            out_specs=(rep, stage, stage),
            check_vma=False,
        )(x_mbs, cos_mbs, sin_mbs, bt_mbs, kl_mbs, pos_mbs, slot_mbs,
          lw, kv_cache["k"], kv_cache["v"])

        h = outputs.reshape(B, *outputs.shape[2:])
        h = rms_norm(h, params["final_norm"], eps)
        return h, {"k": new_k, "v": new_v}

    return forward
