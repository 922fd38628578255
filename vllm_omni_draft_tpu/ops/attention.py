"""Unified paged attention (XLA reference path) + paged KV writes.

One attention function serves decode (T=1), verify (T=k+1), and chunked
prefill (T=chunk): masking is position-based, so the same jitted step
handles every phase with static shapes — the discipline TPU demands
(SURVEY.md §7 design stance).

This is the gather-based XLA implementation, used on CPU tests and as the
numerical reference for the Pallas paged-attention kernel
(ops/pallas/paged_attention.py) that replaces it on TPU.

Capability parity: vLLM's CUDA PagedAttention kernel over block-table KV
(reference: `src/doc/test_report.md:118`, SURVEY.md §2.4).
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp

from vllm_omni_draft_tpu.ops import quant as quant_ops

# KV is STORED with head_dim padded to a lane multiple so the Pallas
# paged-attention kernel (whole-block DMAs need lane-aligned head_dim,
# docs/kernels.md rule 1) covers small-head models too — notably spec
# drafts (D=64), whose XLA gather fallback measured ~0.3 ms/layer vs the
# kernel's ~5 us. Zero-padding is exact: padded q/k lanes contribute 0 to
# scores, padded v lanes are sliced off the output.
KV_LANE = 128


def kv_store_dim(head_dim: int) -> int:
    return -(-head_dim // KV_LANE) * KV_LANE


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class AttentionMetadata:
    """Static-shape attention metadata for one engine step.

    block_tables: [B, MAX_BLOCKS] int32 — physical block ids per sequence
                  (block 0 is the reserved null/trash block).
    kv_lens:      [B] int32 — KV length per sequence *including* the tokens
                  written this step. 0 for padding slots.
    positions:    [B, T] int32 — absolute position of each query token;
                  -1 for padding tokens.
    slot_mapping: [B, T] int32 — flat cache slot (block_id * block_size +
                  offset) each new token's KV is written to; -1 to drop.
    """

    block_tables: jax.Array
    kv_lens: jax.Array
    positions: jax.Array
    slot_mapping: jax.Array


def encode_kv(
    k_new: jax.Array,  # [B, T, Hkv, D] compute dtype
    v_new: jax.Array,
    cache_dtype,
    kv_scale: float = 1.0,
) -> tuple[jax.Array, jax.Array]:
    """Convert new KV to the cache's storage dtype — the exact transform
    write_kv applies, split out so the deferred-commit path (attention
    reads the step's tokens from a VMEM tail, cache write batched over
    all layers) sees bit-identical values to a write-then-read."""
    if cache_dtype == quant_ops.FP8_DTYPE:
        return (
            quant_ops.kv_to_fp8(k_new, kv_scale),
            quant_ops.kv_to_fp8(v_new, kv_scale),
        )
    if cache_dtype == jnp.int8:
        return (
            quant_ops.kv_to_int8(k_new, kv_scale),
            quant_ops.kv_to_int8(v_new, kv_scale),
        )
    return k_new.astype(cache_dtype), v_new.astype(cache_dtype)


def write_kv(
    k_cache: jax.Array,  # [NUM_BLOCKS, BLOCK, Hkv, D] (maybe fp8)
    v_cache: jax.Array,
    k_new: jax.Array,  # [B, T, Hkv, D] compute dtype
    v_new: jax.Array,
    slot_mapping: jax.Array,  # [B, T] int32, -1 = drop
    kv_scale: float = 1.0,
) -> tuple[jax.Array, jax.Array]:
    """Scatter new KV into one layer's paged cache. Functional (returns new
    arrays); under jit with donated buffers this compiles to an in-place
    scatter."""
    nb, bs, h, d = k_cache.shape
    if k_cache.dtype == quant_ops.FP8_DTYPE:
        k_new = quant_ops.kv_to_fp8(k_new, kv_scale)
        v_new = quant_ops.kv_to_fp8(v_new, kv_scale)
    elif k_cache.dtype == jnp.int8:
        k_new = quant_ops.kv_to_int8(k_new, kv_scale)
        v_new = quant_ops.kv_to_int8(v_new, kv_scale)
    else:
        k_new = k_new.astype(k_cache.dtype)
        v_new = v_new.astype(v_cache.dtype)
    flat = slot_mapping.reshape(-1)  # [B*T]
    # JAX .at[] wraps negative indices NumPy-style even under mode="drop",
    # so -1 would silently hit the LAST slot; remap to one-past-the-end,
    # which is genuinely out of bounds and therefore dropped.
    flat = jnp.where(flat < 0, nb * bs, flat)
    k_flat = k_cache.reshape(nb * bs, h, d)
    v_flat = v_cache.reshape(nb * bs, h, d)
    k_flat = k_flat.at[flat].set(k_new.reshape(-1, h, d), mode="drop")
    v_flat = v_flat.at[flat].set(v_new.reshape(-1, h, d), mode="drop")
    return k_flat.reshape(nb, bs, h, d), v_flat.reshape(nb, bs, h, d)


def write_kv_layer(
    k_cache: jax.Array,  # [L, NUM_BLOCKS, BLOCK, Hkv, D] full cache
    v_cache: jax.Array,
    k_new: jax.Array,  # [B, T, Hkv, D]
    v_new: jax.Array,
    slot_mapping: jax.Array,  # [B, T] int32, -1 = drop
    layer: jax.Array,  # scalar int32
    kv_scale: float = 1.0,
) -> tuple[jax.Array, jax.Array]:
    """Scatter new KV into layer `layer` of the FULL cache. Keeping the
    whole cache in the layer-scan carry (instead of scan xs/ys) is what
    lets XLA alias it in place — xs/ys would hold two full copies."""
    L, nb, bs, h, d = k_cache.shape
    if k_cache.dtype == quant_ops.FP8_DTYPE:
        k_new = quant_ops.kv_to_fp8(k_new, kv_scale)
        v_new = quant_ops.kv_to_fp8(v_new, kv_scale)
    elif k_cache.dtype == jnp.int8:
        k_new = quant_ops.kv_to_int8(k_new, kv_scale)
        v_new = quant_ops.kv_to_int8(v_new, kv_scale)
    else:
        k_new = k_new.astype(k_cache.dtype)
        v_new = v_new.astype(v_cache.dtype)
    flat = slot_mapping.reshape(-1)
    # scatter directly on the 5-D array (no reshape round-trip: a reshaped
    # scatter result picks a different layout than the scan carry and XLA
    # inserts a full-cache copy per layer). -1 => block index nb (OOB,
    # dropped); negatives must not reach the index math (NumPy wrapping).
    blocks = jnp.where(flat < 0, nb, flat // bs)
    offs = jnp.where(flat < 0, 0, flat % bs)
    k_cache = k_cache.at[layer, blocks, offs].set(
        k_new.reshape(-1, h, d), mode="drop"
    )
    v_cache = v_cache.at[layer, blocks, offs].set(
        v_new.reshape(-1, h, d), mode="drop"
    )
    return k_cache, v_cache


def write_kv_all_layers(
    k_cache: jax.Array,  # [L, NUM_BLOCKS, BLOCK, Hkv, D] full cache
    v_cache: jax.Array,
    k_all: jax.Array,  # [L, B, T, Hkv, D] ALREADY in cache dtype (encode_kv)
    v_all: jax.Array,
    slot_mapping: jax.Array,  # [B, T] int32, -1 = drop (same for every layer)
) -> tuple[jax.Array, jax.Array]:
    """Deferred KV commit: ONE scatter pair for every layer's new tokens.

    The per-layer write_kv_layer pair costs ~2x16 us of launch/fixed
    overhead per layer per iteration (engine deep profile: 7.3 ms/step at
    28 layers x 8 spec iters); batching the commit across layers after
    the layer scan pays that cost once per forward. Requires the
    attention path to read this step's tokens from the VMEM tail
    (attention_at_layer k_new/v_new) since the cache no longer holds
    them mid-scan. Reference surface: vLLM's reshape_and_cache fused
    into PagedAttention (SURVEY.md §2.4)."""
    L, nb, bs, h, d = k_cache.shape
    flat = slot_mapping.reshape(-1)  # [B*T]
    # 1-D row indices into the [L*NB*BS, h, d] flattened cache — the
    # exact scatter form of write_kv, which XLA aliases in place. The
    # multi-dim .at[lidx, blocks, offs] form lowered to gather+copy
    # fusions that COPIED cache regions every iteration (profiled:
    # 11.8 ms/step, worse than the per-layer scatters it replaced).
    # The leading-dims collapse is layout-free, so no copy round-trip.
    rows = jnp.where(flat < 0, nb * bs, flat)  # OOB row, dropped
    rows = rows[None, :] + (
        jnp.arange(L, dtype=jnp.int32) * (nb * bs)
    )[:, None]  # [L, B*T]
    # out-of-range stays out-of-range after the layer offset ONLY for
    # layer 0; re-mask so every layer's pad rows drop
    rows = jnp.where(flat[None, :] < 0, L * nb * bs, rows).reshape(-1)
    k_flat = k_cache.reshape(L * nb * bs, h, d)
    v_flat = v_cache.reshape(L * nb * bs, h, d)
    k_flat = k_flat.at[rows].set(k_all.reshape(-1, h, d), mode="drop")
    v_flat = v_flat.at[rows].set(v_all.reshape(-1, h, d), mode="drop")
    return (
        k_flat.reshape(L, nb, bs, h, d),
        v_flat.reshape(L, nb, bs, h, d),
    )


def paged_attention(
    q: jax.Array,  # [B, T, Hq, D]
    k_cache: jax.Array,  # [NUM_BLOCKS, BLOCK, Hkv, D]
    v_cache: jax.Array,
    meta: AttentionMetadata,
    scale: float,
    kv_scale: float = 1.0,
) -> jax.Array:
    """Gather-based paged attention over a per-layer cache."""
    B = q.shape[0]
    BS = k_cache.shape[1]
    S = meta.block_tables.shape[1] * BS
    Hkv, D = k_cache.shape[2], k_cache.shape[3]
    k = k_cache[meta.block_tables].reshape(B, S, Hkv, D)
    v = v_cache[meta.block_tables].reshape(B, S, Hkv, D)
    return _attention_gathered(q, k, v, meta, scale, kv_scale)


def _attention_gathered(
    q: jax.Array,  # [B, T, Hq, D]
    k: jax.Array,  # [B, S, Hkv, D] (cache dtype)
    v: jax.Array,
    meta: AttentionMetadata,
    scale: float,
    kv_scale: float = 1.0,
    k_tail: jax.Array | None = None,  # [B, T, Hkv, D] cache dtype —
    v_tail: jax.Array | None = None,  # this step's not-yet-committed KV
) -> jax.Array:
    """Position-causal masked attention over gathered KV.

    Query token (b, t) attends to cache index j (within the sequence's block
    table, laid out contiguously) iff j <= positions[b, t] and j < kv_lens[b].
    Padding query rows (positions == -1) see an empty mask and produce zeros.

    Deferred-commit mode (k_tail/v_tail given): the cache does not yet hold
    this step's T tokens; splice them in at columns kv_len-T+t — the exact
    values a write-then-read would see (caller pre-encodes via encode_kv).
    """
    B, T, Hq, D = q.shape
    S, Hkv = k.shape[1], k.shape[2]
    G = Hq // Hkv

    if k_tail is not None:
        # place tail rows at their absolute positions; padding rows
        # (kv_len 0 -> negative col) remap to S (out of bounds, dropped)
        cols = meta.kv_lens[:, None] - T + jnp.arange(T, dtype=jnp.int32)
        cols = jnp.where(cols < 0, S, cols)  # [B, T]
        bb = jnp.arange(B, dtype=jnp.int32)[:, None]
        k = k.at[bb, cols].set(k_tail.astype(k.dtype), mode="drop")
        v = v.at[bb, cols].set(v_tail.astype(v.dtype), mode="drop")

    if k.dtype == quant_ops.FP8_DTYPE:
        k = quant_ops.kv_from_fp8(k, kv_scale, jnp.float32)
        v = quant_ops.kv_from_fp8(v, kv_scale, jnp.float32)
    elif k.dtype == jnp.int8:
        k = quant_ops.kv_from_int8(k, kv_scale, jnp.float32)
        v = quant_ops.kv_from_int8(v, kv_scale, jnp.float32)

    qf = q.reshape(B, T, Hkv, G, D).astype(jnp.float32)
    kf = k.astype(jnp.float32)
    vf = v.astype(jnp.float32)

    # scores: [B, Hkv, G, T, S]
    scores = jnp.einsum("bthgd,bshd->bhgts", qf, kf) * scale

    j = jnp.arange(S, dtype=jnp.int32)
    valid = j[None, None, :] < meta.kv_lens[:, None, None]  # [B, 1, S]
    causal = j[None, None, :] <= meta.positions[:, :, None]  # [B, T, S]
    mask = (valid & causal)[:, None, None, :, :]  # [B, 1, 1, T, S]

    neg = jnp.finfo(jnp.float32).min
    scores = jnp.where(mask, scores, neg)
    # safe softmax: fully-masked rows -> zeros, not NaN
    m = jnp.max(scores, axis=-1, keepdims=True)
    e = jnp.exp(scores - jax.lax.stop_gradient(jnp.maximum(m, neg / 2)))
    e = jnp.where(mask, e, 0.0)
    denom = jnp.sum(e, axis=-1, keepdims=True)
    p = e / jnp.maximum(denom, 1e-30)

    out = jnp.einsum("bhgts,bshd->bthgd", p, vf)  # [B, T, Hkv, G, D]
    return out.reshape(B, T, Hq, D).astype(q.dtype)


# Pallas override hook (set on TPU by ops.pallas.paged_attention).
_PALLAS_PAGED_ATTENTION = None


def use_pallas_kernel(fn) -> None:
    global _PALLAS_PAGED_ATTENTION
    _PALLAS_PAGED_ATTENTION = fn


def attention(
    q: jax.Array,
    k_cache: jax.Array,
    v_cache: jax.Array,
    meta: AttentionMetadata,
    scale: float,
    kv_scale: float = 1.0,
) -> jax.Array:
    """Per-layer-cache dispatch: Pallas kernel on TPU, gather reference
    elsewhere."""
    if _PALLAS_PAGED_ATTENTION is not None:
        return _PALLAS_PAGED_ATTENTION(
            q, k_cache, v_cache, None, meta, scale, kv_scale, None, None
        )
    return paged_attention(q, k_cache, v_cache, meta, scale, kv_scale)


def resolved_attention_backend(cfg) -> str:
    """Resolve ModelConfig.attention_backend. "auto" is the Pallas
    kernel everywhere: routing the spec DRAFT through the XLA gather
    path was A/B'd on the real chip (round 3) and REGRESSED the engine
    13.7% (5860 vs 6787 tok/s) — the gather+masked-softmax over the
    full block-table span costs far more than the kernel's ~55 us/call
    launch overhead even at draft shapes. The explicit "xla" value
    remains for debugging/parity runs."""
    if cfg.attention_backend != "auto":
        return cfg.attention_backend
    return "pallas"


def attention_at_layer(
    q: jax.Array,
    k_cache: jax.Array,  # [L, NB, BS, Hkv, D] full cache
    v_cache: jax.Array,
    layer: jax.Array,  # scalar int32
    meta: AttentionMetadata,
    scale: float,
    kv_scale: float = 1.0,
    backend: str = "pallas",
    k_new: jax.Array | None = None,  # [B, T, Hkv, D] cache dtype:
    v_new: jax.Array | None = None,  # deferred-commit VMEM tail
) -> jax.Array:
    """Attention against layer `layer` of the full cache (the layer-scan
    carry form). The Pallas kernel indexes the layer inside its DMAs; the
    XLA path slices the layer out first. With k_new/v_new the cache does
    NOT yet contain this step's tokens (deferred commit,
    write_kv_all_layers) — they enter as a VMEM tail instead."""
    if backend != "xla" and _PALLAS_PAGED_ATTENTION is not None:
        return _PALLAS_PAGED_ATTENTION(
            q, k_cache, v_cache, layer, meta, scale, kv_scale,
            k_new, v_new,
        )
    # single fused gather (layer, block) — materializing the layer slice
    # first would copy the whole layer (hundreds of MB) every call
    B = q.shape[0]
    BS, Hkv, D = k_cache.shape[2], k_cache.shape[3], k_cache.shape[4]
    S = meta.block_tables.shape[1] * BS
    k = k_cache[layer, meta.block_tables].reshape(B, S, Hkv, D)
    v = v_cache[layer, meta.block_tables].reshape(B, S, Hkv, D)
    return _attention_gathered(q, k, v, meta, scale, kv_scale,
                               k_tail=k_new, v_tail=v_new)
