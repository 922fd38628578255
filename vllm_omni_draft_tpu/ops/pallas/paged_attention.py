"""Pallas paged-attention kernel for decode / verify (small query length).

TPU-native replacement for vLLM's CUDA PagedAttention (reference surface:
`src/doc/test_report.md:118`, SURVEY.md §2.4). Design:

- grid (B,): each program owns one sequence; all its KV-head groups'
  G*T query rows (G = Hq/Hkv grouped queries, T = 1 decode or K+1 verify)
  live in VMEM the whole time.
- the sequence's KV is streamed from HBM in chunks of `CHUNK_BLOCKS`
  whole physical blocks ([BS, Hkv, D] each — a head-sliced DMA would
  violate the (sublane, lane) tiling of the cache and read 4x more
  overall) via double-buffered async DMA driven by the scalar-prefetched
  block table — only `kv_len` tokens are ever read (the XLA gather
  fallback reads the padded maximum).
- online-softmax (flash) accumulation in f32, vectorized over heads;
  fp8 KV is dequantized in-register on the way into the MXU.

Causal rule: query row t attends cache index j iff j <= kv_len - T + t —
matching the engine's position-based masking for decode, verify, and
chunked prefill alike (positions[b, t] == kv_lens[b] - T + t).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from vllm_omni_draft_tpu.ops import quant as quant_ops
from vllm_omni_draft_tpu.ops.attention import AttentionMetadata

# finite large-negative (a true -inf makes exp(m - m_new) NaN for rows
# whose first valid column arrives in a later chunk)
NEG_INF = -1e30


def _kernel(
    # scalar prefetch
    bt_ref,  # [B, NBMAX] int32 block tables (SMEM)
    kvlen_ref,  # [B] int32 (SMEM)
    layer_ref,  # [1] int32 (SMEM) — layer index into a full 5-D cache
    # inputs
    q_ref,  # [1, Hkv, GTP, D] VMEM
    k_hbm,  # [NB, BS, Hkv, D] or [L, NB, BS, Hkv, D] HBM
    v_hbm,
    # outputs
    out_ref,  # [1, Hkv, GTP, D] VMEM
    # scratch
    kbuf,  # [2, CHUNK_T, Hkv, D] VMEM (cache dtype)
    vbuf,
    sem,  # DMA sems [2, 2, CHUNK_BLOCKS]
    *,
    T: int,
    BS: int,
    CHUNK_BLOCKS: int,
    scale: float,
    kv_scale: float,
    fp8: bool,
    full_cache: bool,
):
    b = pl.program_id(0)
    CHUNK_T = CHUNK_BLOCKS * BS
    Hkv, GTP, D = q_ref.shape[1], q_ref.shape[2], q_ref.shape[3]
    kv_len = kvlen_ref[b]
    layer = layer_ref[0]

    @pl.when(kv_len == 0)
    def _():
        out_ref[...] = jnp.zeros_like(out_ref)

    @pl.when(kv_len > 0)
    def _():
        num_chunks = pl.cdiv(kv_len, CHUNK_T)

        def src(hbm, bid):
            # whole-block copy [BS, Hkv, D]: slices only the major dim,
            # so the (sublane, lane) tiling is preserved
            if full_cache:
                return hbm.at[layer, bid]
            return hbm.at[bid]

        def start_load(c, slot):
            base = c * CHUNK_BLOCKS
            for i in range(CHUNK_BLOCKS):
                bid = bt_ref[b, base + i]
                pltpu.make_async_copy(
                    src(k_hbm, bid),
                    kbuf.at[slot, pl.ds(i * BS, BS)],
                    sem.at[slot, 0, i],
                ).start()
                pltpu.make_async_copy(
                    src(v_hbm, bid),
                    vbuf.at[slot, pl.ds(i * BS, BS)],
                    sem.at[slot, 1, i],
                ).start()

        def wait_load(c, slot):
            base = c * CHUNK_BLOCKS
            for i in range(CHUNK_BLOCKS):
                bid = bt_ref[b, base + i]
                pltpu.make_async_copy(
                    src(k_hbm, bid),
                    kbuf.at[slot, pl.ds(i * BS, BS)],
                    sem.at[slot, 0, i],
                ).wait()
                pltpu.make_async_copy(
                    src(v_hbm, bid),
                    vbuf.at[slot, pl.ds(i * BS, BS)],
                    sem.at[slot, 1, i],
                ).wait()

        start_load(0, 0)
        q = q_ref[0].astype(jnp.float32)  # [Hkv, GTP, D]

        # query offset t for each padded row r: t = r % T
        row_t = jax.lax.broadcasted_iota(jnp.int32, (Hkv, GTP, CHUNK_T), 1) % T
        col = jax.lax.broadcasted_iota(jnp.int32, (Hkv, GTP, CHUNK_T), 2)

        def body(c, carry):
            m, l, acc = carry  # [Hkv, GTP, 1] x2, [Hkv, GTP, D]
            slot = c % 2

            @pl.when(c + 1 < num_chunks)
            def _():
                start_load(c + 1, (c + 1) % 2)

            wait_load(c, slot)
            k = kbuf[slot].astype(jnp.float32)  # [CHUNK_T, Hkv, D]
            v = vbuf[slot].astype(jnp.float32)
            if fp8:
                k = k * kv_scale
                v = v * kv_scale

            # per-head scores stacked: [Hkv, GTP, CHUNK_T]
            s = jnp.stack(
                [
                    jax.lax.dot_general(
                        q[h], k[:, h, :], (((1,), (1,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    )
                    for h in range(Hkv)
                ]
            ) * scale

            jg = c * CHUNK_T + col
            mask = (jg < kv_len) & (jg <= kv_len - T + row_t)
            s = jnp.where(mask, s, NEG_INF)

            m_new = jnp.maximum(m, jnp.max(s, axis=-1, keepdims=True))
            p = jnp.where(mask, jnp.exp(s - m_new), 0.0)
            alpha = jnp.exp(m - m_new)
            l_new = l * alpha + jnp.sum(p, axis=-1, keepdims=True)
            pv = jnp.stack(
                [
                    jax.lax.dot_general(
                        p[h], v[:, h, :], (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    )
                    for h in range(Hkv)
                ]
            )
            acc_new = acc * alpha + pv
            return m_new, l_new, acc_new

        m0 = jnp.full((Hkv, GTP, 1), NEG_INF, jnp.float32)
        l0 = jnp.zeros((Hkv, GTP, 1), jnp.float32)
        acc0 = jnp.zeros((Hkv, GTP, D), jnp.float32)
        m, l, acc = jax.lax.fori_loop(0, num_chunks, body, (m0, l0, acc0))
        out = acc / jnp.maximum(l, 1e-30)
        out_ref[0] = out.astype(out_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("scale", "kv_scale", "chunk_blocks")
)
def paged_attention_pallas(
    q: jax.Array,  # [B, T, Hq, D]
    k_cache: jax.Array,  # [NB, BS, Hkv, D] or [L, NB, BS, Hkv, D]
    v_cache: jax.Array,
    block_tables: jax.Array,  # [B, NBMAX] int32
    kv_lens: jax.Array,  # [B] int32
    scale: float,
    kv_scale: float = 1.0,
    chunk_blocks: int | None = None,
    layer: jax.Array | None = None,  # required when cache is 5-D
) -> jax.Array:
    B, T, Hq, D = q.shape
    full_cache = k_cache.ndim == 5
    NB, BS, Hkv, _ = k_cache.shape[1:] if full_cache else k_cache.shape
    layer_arr = jnp.asarray(
        [layer if layer is not None else 0], jnp.int32
    ).reshape(1)
    NBMAX = block_tables.shape[1]
    G = Hq // Hkv
    GT = G * T
    GTP = max(8, -(-GT // 8) * 8)
    fp8 = k_cache.dtype == quant_ops.FP8_DTYPE

    if chunk_blocks is None:
        chunk_blocks = max(1, 128 // BS)
    # pad the block table so chunked indexing never reads past it
    pad_cols = (-NBMAX) % chunk_blocks
    if pad_cols:
        block_tables = jnp.pad(block_tables, ((0, 0), (0, pad_cols)))

    # [B, T, Hkv, G, D] -> [B, Hkv, G, T, D] -> [B, Hkv, GT, D], pad rows
    qr = q.reshape(B, T, Hkv, G, D).transpose(0, 2, 3, 1, 4).reshape(B, Hkv, GT, D)
    if GTP != GT:
        qr = jnp.pad(qr, ((0, 0), (0, 0), (0, GTP - GT), (0, 0)))

    CHUNK_T = chunk_blocks * BS
    kernel = functools.partial(
        _kernel,
        T=T,
        BS=BS,
        CHUNK_BLOCKS=chunk_blocks,
        scale=scale,
        kv_scale=kv_scale,
        fp8=fp8,
        full_cache=full_cache,
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(B,),
        in_specs=[
            pl.BlockSpec(
                (1, Hkv, GTP, D), lambda b, *_: (b, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec(
            (1, Hkv, GTP, D), lambda b, *_: (b, 0, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[
            pltpu.VMEM((2, CHUNK_T, Hkv, D), k_cache.dtype),
            pltpu.VMEM((2, CHUNK_T, Hkv, D), v_cache.dtype),
            pltpu.SemaphoreType.DMA((2, 2, chunk_blocks)),
        ],
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, Hkv, GTP, D), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
        ),
    )(block_tables, kv_lens, layer_arr, qr, k_cache, v_cache)

    out = out[:, :, :GT, :].reshape(B, Hkv, G, T, D)
    return out.transpose(0, 3, 1, 2, 4).reshape(B, T, Hq, D)


# threshold above which we fall back to the XLA path (prefill chunks)
MAX_KERNEL_QLEN = 16


def paged_attention_dispatch(q, k_cache, v_cache, layer,
                             meta: AttentionMetadata, scale: float,
                             kv_scale: float = 1.0):
    """Dispatch adapter for ops.attention.{attention,attention_at_layer}.
    `layer` is None for a per-layer 4-D cache, a traced scalar for the
    full 5-D cache."""
    T = q.shape[1]
    # the kernel's block DMAs require lane-aligned head_dim (Mosaic tiling);
    # small-head models (drafts) take the XLA path — they're cheap anyway
    if T > MAX_KERNEL_QLEN or q.shape[-1] % 128 != 0:
        from vllm_omni_draft_tpu.ops.attention import (
            _attention_gathered,
            paged_attention as xla_ref,
        )

        if k_cache.ndim == 5:
            B = q.shape[0]
            BS, Hkv, D = k_cache.shape[2], k_cache.shape[3], k_cache.shape[4]
            S = meta.block_tables.shape[1] * BS
            k = k_cache[layer, meta.block_tables].reshape(B, S, Hkv, D)
            v = v_cache[layer, meta.block_tables].reshape(B, S, Hkv, D)
            return _attention_gathered(q, k, v, meta, scale, kv_scale)
        return xla_ref(q, k_cache, v_cache, meta, scale, kv_scale)
    return paged_attention_pallas(
        q, k_cache, v_cache, meta.block_tables, meta.kv_lens, scale, kv_scale,
        layer=layer,
    )
