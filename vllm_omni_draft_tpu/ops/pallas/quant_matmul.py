"""Pallas fused dequant+matmul kernels: INT8 (per-out-channel) and INT4
(group-wise, split-half nibble packing).

TPU-native replacement for vLLM's CUDA quant GEMMs (SURVEY.md §2.4).
The weight tile is dequantized in-register on its way into the MXU — the
quantized bytes are the ONLY HBM traffic, which is the whole point of
weight-only quantization (the XLA fallback may materialize a bf16 copy).

Activations are small in decode/verify ([B or B*(K+1), I]); the kernel
keeps x resident in VMEM and pipelines weight tiles over a 1-D grid of
output blocks (pallas auto double-buffers grid-indexed inputs).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


_VMEM_BUDGET = 12 * 1024 * 1024


def _budget_rows(
    BP: int, I: int, x_itemsize: int, row_bytes: int, extra_row_bytes: int = 0
) -> int:
    """Weight-tile rows that fit VMEM next to the resident x: 2 (double-
    buffered) weight buffers of `row_bytes` each, plus `extra_row_bytes`
    of other grid-indexed per-output-row tiles (scales, output)."""
    x_bytes = BP * I * x_itemsize
    avail = _VMEM_BUDGET - x_bytes
    per_row = 2 * (row_bytes + extra_row_bytes)
    return max(128, avail // per_row) if avail > 0 else 128


def _pick_block_o(O: int, cap: int, floor: int = 128) -> int:
    """Largest block_o <= cap that divides O, in multiples of 128 —
    block_o is the LANE dimension of the output (and scale) blocks, so
    Mosaic requires %128 (or the full dim). Grid-step fixed costs dominate
    at small tiles (the 7B lm_head O=151936=2^7*1187 only divides down to
    128 -> 1187 grid steps at 66% of bandwidth — pad such O at
    quantization time, see quantize_int8/int4 pad_out)."""
    cap = min(cap, O)
    if cap >= O:
        return O
    for d in range(cap - cap % 128, 127, -128):
        if O % d == 0:
            return d
    # no 128-aligned divisor <= cap: smallest legal lane block
    return min(128, O)


def _int8_kernel(x_ref, w_ref, s_ref, o_ref):
    # x [BP, I]; w [O_T, I] int8; s [O_T, 1] f32; o [BP, O_T]
    x = x_ref[...]
    w = w_ref[...].astype(x.dtype)
    acc = jax.lax.dot_general(
        x, w, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    o_ref[...] = (acc * s_ref[...][:, 0][None, :]).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("block_o",))
def matmul_int8_pallas(
    x: jax.Array,  # [B, I] bf16/f32
    q: jax.Array,  # [O, I] int8
    s: jax.Array,  # [O, 1] f32
    block_o: int = 512,
) -> jax.Array:
    B, I = x.shape
    O = q.shape[0]
    BP = max(8, -(-B // 8) * 8)
    if BP != B:
        x = jnp.pad(x, ((0, BP - B), (0, 0)))
    # double-buffered weight tiles + the resident x must fit VMEM
    budget_rows = _budget_rows(BP, I, x.dtype.itemsize, row_bytes=I)
    # budget_rows is the VMEM-derived cap; the block_o param only lowers it
    block_o = _pick_block_o(O, min(budget_rows, block_o) if block_o < 512 else budget_rows)

    out = pl.pallas_call(
        _int8_kernel,
        grid=(O // block_o,),
        in_specs=[
            pl.BlockSpec((BP, I), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((block_o, I), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((block_o, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((BP, block_o), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((BP, O), x.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * BP * O * I,
            bytes_accessed=O * I + BP * I * x.dtype.itemsize + BP * O * x.dtype.itemsize,
            transcendentals=0,
        ),
    )(x, q, s)
    return out[:B]


# ---------------------------------------------------------------------------
# Stacked (layer-indexed) variants: the model's layer scan passes the FULL
# stacked weight [L, O, I] plus a traced layer index; the kernel's
# scalar-prefetched index map DMAs tiles of layer l straight out of HBM.
# Without this, XLA materializes a per-layer HBM copy of every weight on
# every scan iteration (dynamic-slice), which measured as ~60% of the
# whole decode step at 7B INT8 (dynamic-slice_bitcast fusions, 91 us per
# 68 MB weight — a full extra read+write of all weights per token).
# ---------------------------------------------------------------------------


def _int8_kernel_stacked(l_ref, x_ref, w_ref, s_ref, o_ref):
    # x [BP, I]; w [1, O_T, I] int8 (layer-sliced by the index map);
    # s [1, O_T, 1] f32; o [BP, O_T]
    x = x_ref[...]
    w = w_ref[0].astype(x.dtype)
    acc = jax.lax.dot_general(
        x, w, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    o_ref[...] = (acc * s_ref[0][:, 0][None, :]).astype(o_ref.dtype)


def _dense_kernel_stacked(l_ref, x_ref, w_ref, o_ref):
    x = x_ref[...]
    w = w_ref[0]
    acc = jax.lax.dot_general(
        x, w.astype(x.dtype), (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    o_ref[...] = acc.astype(o_ref.dtype)


def _stacked_call(kernel, x, w_stacked, extra_specs, extra_args, layer,
                  block_o, itemsize):
    """Shared wrapper: grid over output tiles of one layer of a stacked
    [L, O, ...] weight, layer chosen by scalar prefetch."""
    B, I = x.shape
    L, O = w_stacked.shape[0], w_stacked.shape[1]
    BP = max(8, -(-B // 8) * 8)
    if BP != B:
        x = jnp.pad(x, ((0, BP - B), (0, 0)))
    row_bytes = w_stacked.shape[2] * itemsize
    # the revolving output tile is [BP, block_o] — at batched-prefill row
    # counts it rivals the weight tile, so charge it per row (round-3:
    # the dense draft kernel VMEM-OOMed at BP=1024 without this)
    budget_rows = _budget_rows(
        BP, I, x.dtype.itemsize, row_bytes,
        extra_row_bytes=BP * x.dtype.itemsize,
    )
    block_o = _pick_block_o(O, min(budget_rows, block_o) if block_o < 512 else budget_rows)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(O // block_o,),
        in_specs=[
            pl.BlockSpec((BP, I), lambda i, l: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_o, w_stacked.shape[2]),
                         lambda i, l: (l[0], i, 0), memory_space=pltpu.VMEM),
            *extra_specs(block_o),
        ],
        out_specs=pl.BlockSpec((BP, block_o), lambda i, l: (0, i),
                               memory_space=pltpu.VMEM),
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((BP, O), x.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * BP * O * I,
            bytes_accessed=O * row_bytes + BP * I * x.dtype.itemsize
            + BP * O * x.dtype.itemsize,
            transcendentals=0,
        ),
    )(jnp.reshape(layer, (1,)).astype(jnp.int32), x, w_stacked, *extra_args)
    return out[:B]


@functools.partial(jax.jit, static_argnames=("block_o",))
def matmul_int8_stacked_pallas(
    x: jax.Array,  # [B, I] bf16/f32
    q: jax.Array,  # [L, O, I] int8
    s: jax.Array,  # [L, O, 1] f32
    layer: jax.Array,  # scalar int32
    block_o: int = 512,
) -> jax.Array:
    if max(8, -(-x.shape[0] // 8) * 8) > _INT4_MAX_BP:
        return _matmul_int8_stacked_rowtiled(x, q, s, layer)
    specs = lambda bo: [
        pl.BlockSpec((1, bo, 1), lambda i, l: (l[0], i, 0),
                     memory_space=pltpu.VMEM)
    ]
    return _stacked_call(
        _int8_kernel_stacked, x, q, specs, (s,), layer, block_o, itemsize=1
    )


@functools.partial(jax.jit, static_argnames=("block_o",))
def matmul_dense_stacked_pallas(
    x: jax.Array,  # [B, I]
    w: jax.Array,  # [L, O, I] bf16/f32
    layer: jax.Array,  # scalar int32
    block_o: int = 512,
) -> jax.Array:
    if max(8, -(-x.shape[0] // 8) * 8) > _INT4_MAX_BP:
        return _matmul_dense_stacked_rowtiled(x, w, layer)
    return _stacked_call(
        _dense_kernel_stacked, x, w, lambda bo: [], (), layer, block_o,
        itemsize=w.dtype.itemsize,
    )


@functools.partial(jax.jit, static_argnames=("block_o",))
def matmul_int4_stacked_pallas(
    x: jax.Array,  # [B, I]
    packed: jax.Array,  # [L, O, I//2] uint8 (split-half)
    s: jax.Array,  # [L, O, I//G] f32
    layer: jax.Array,  # scalar int32
    block_o: int = 512,
) -> jax.Array:
    """Layer-indexed int4: the PACKED WEIGHT (the big array) streams
    straight from the stacked HBM tensor via the scalar-prefetched index
    map; the scales (3% of the bytes) are dynamic-sliced outside — a
    negligible copy that avoids changing the [O, G] scale layout the
    rest of the stack uses."""
    B, I = x.shape
    L, O = packed.shape[0], packed.shape[1]
    G = s.shape[2]
    group_size = I // G
    BP = max(8, -(-B // 8) * 8)
    if G % 2 or group_size % 128 or (I // 2) % group_size:
        from vllm_omni_draft_tpu.ops import quant as q

        w = q.dequantize(
            {"w": jnp.take(packed, layer, 0), "s": jnp.take(s, layer, 0)},
            dtype=x.dtype,
        )
        return x @ w.T
    if BP > _INT4_MAX_BP:  # batched-prefill rows: 2-D row-tiled grid
        return _matmul_int4_stacked_rowtiled(x, packed, s, layer)
    if BP != B:
        x = jnp.pad(x, ((0, BP - B), (0, 0)))
    st, Gp = _st16(jnp.take(s, layer, axis=0))  # [Gp, O] f32 = 16*s
    budget_rows = _budget_rows(
        BP, I, x.dtype.itemsize, row_bytes=I // 2,
        # f32 unpack intermediates keep ~14 B/elem live per in-flight
        # chunk (x2): charge them so Mosaic's scoped-vmem stays <16M
        extra_row_bytes=Gp * 4 + BP * x.dtype.itemsize
        + 28 * group_size,
    )
    block_o = _pick_block_o(O, min(budget_rows, block_o))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(O // block_o,),
        in_specs=[
            pl.BlockSpec((BP, I), lambda i, l: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_o, I // 2), lambda i, l: (l[0], i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((Gp, block_o), lambda i, l: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((BP, block_o), lambda i, l: (0, i),
                               memory_space=pltpu.VMEM),
    )
    out = pl.pallas_call(
        functools.partial(_int4_kernel_stacked, group_size=group_size),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((BP, O), x.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * BP * O * I,
            bytes_accessed=O * I // 2 + BP * I * x.dtype.itemsize
            + BP * O * x.dtype.itemsize,
            transcendentals=0,
        ),
    )(jnp.reshape(layer, (1,)).astype(jnp.int32), x, packed, st)
    return out[:B]


def _nib_lo_f32(p32: jax.Array) -> jax.Array:
    """int32 bytes -> f32 = 1 + lo_nibble/16: mantissa bit placement +
    SAME-width bitcast (Mosaic rejects width-changing bitcasts; there
    are no int->float converts on this path)."""
    return jax.lax.bitcast_convert_type(
        ((p32 & 0x0F) << 19) | 0x3F800000, jnp.float32
    )


def _nib_hi_f32(p32: jax.Array) -> jax.Array:
    return jax.lax.bitcast_convert_type(
        ((p32 & 0xF0) << 15) | 0x3F800000, jnp.float32
    )


def _int4_acc(x_ref, w_slice, st_ref, shape, group_size: int):
    """x [BP, I]; w_slice [O_T, I//2] uint8 split-half (ref or loaded
    value); st [Gp, O_T] f32 = 16 * scales (transposed so one group's
    scales are one lane-contiguous row; zero-padded to Gp rows).

    Round-3 form (measured 71% -> 80% of the MXU roofline aggregate at
    the 160-row verify shape, PERF_NOTES): nibbles become EXACT SIGNED
    bf16 values via an f32 mantissa bit-pattern — bitcast of
    ((p & 0xF) << 19) | 0x3F800000 gives 1 + u/16; subtracting 1.5 gives
    (u - 8)/16 exactly — so the zero-point correction dot (and its xsum
    operand) of the round-1/2 kernel disappears, and the unpack chain is
    pure integer ops + one exact f32->bf16 cast. Each group is a STATIC
    slice contracted on the MXU separately with post-dot f32 scaling
    (Mosaic rejects group-scale reshapes at 7B group counts; folding
    scales into the tile in bf16 measured 35% — per-element multiplies
    swamp the win)."""
    half = w_slice.shape[1]
    C = half // group_size  # chunks of packed columns == groups per half
    dt = x_ref.dtype

    x_all = x_ref[...]
    s_all = st_ref[...]  # [Gp, O_T] f32 = 16*s
    acc = jnp.zeros(shape, jnp.float32)
    for c in range(C):
        sl = slice(c * group_size, (c + 1) * group_size)
        p = w_slice[:, sl].astype(jnp.int32)  # no i8 vector arithmetic
        lo = _nib_lo_f32(p) - 1.5  # (u - 8)/16, exact
        hi = _nib_hi_f32(p) - 1.5
        for vals, xs, g in (
            (lo, x_all[:, sl], c),
            (hi, x_all[:, half + c * group_size:
                       half + (c + 1) * group_size], C + c),
        ):
            t = jax.lax.dot_general(
                xs, vals.astype(dt), (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # [BP, O_T]
            acc += t * s_all[g][None, :]
    return acc


def _int4_kernel_stacked(l_ref, x_ref, w_ref, st_ref, o_ref, *,
                         group_size: int):
    y = _int4_acc(x_ref, w_ref[0], st_ref, o_ref.shape, group_size)
    o_ref[...] = y.astype(o_ref.dtype)


def _int4_kernel(x_ref, w_ref, st_ref, o_ref, *, group_size: int):
    y = _int4_acc(x_ref, w_ref, st_ref, o_ref.shape, group_size)
    o_ref[...] = y.astype(o_ref.dtype)


def _st16(s: jax.Array):
    """Transposed 16x scales [G, O] f32 (the kernel consumes 16*s since
    the signed nibble values are (u-8)/16), zero-padded on the group
    axis to a sublane multiple."""
    st = (16.0 * s.T).astype(jnp.float32)
    G = st.shape[0]
    Gp = -(-G // 8) * 8
    if Gp != G:
        st = jnp.pad(st, ((0, Gp - G), (0, 0)))
    return st, Gp


# rows above which the 1-D grid (x fully VMEM-resident) hands over to
# the 2-D row-tiled grid below. 256 rows covers the spec-verify batch
# (B*(K+1) = 32*5 = 160) and B=64..256 plain decode; batched multi-
# sequence prefill (N x bucket rows, e.g. 8*128 = 1024) takes the
# row-tiled path.
_INT4_MAX_BP = 256


# ---------------------------------------------------------------------------
# Row-tiled (2-D grid) variants: batched-prefill row counts (N prompt
# chunks x bucket = 512-4096 rows) can't keep x VMEM-resident — at
# I=18944 even 256 rows of bf16 x is 9.7 MB. Grid (BP//bb, O//bo), rows
# OUTER / output tiles INNER: the x tile's index map is constant across
# the inner o-steps so pallas fetches it once per row tile, while weight
# tiles re-stream once per row tile. At prefill row counts every
# projection is MXU-compute-bound (2*bb*bo*I FLOPs per step vs bo*I/2
# weight bytes), so the re-streamed weight traffic hides under compute
# (gate at BP=1024: 136 MB DMA ~166 us vs 706 us MXU). Replaces the
# round-3 XLA-dequant fallback that made one-seq-per-call prefill run at
# ~2.3k tok/s (VERDICT r3 item 1).
# ---------------------------------------------------------------------------


def _row_block(I: int, itemsize: int) -> int:
    """x row-tile: 256 rows unless the tile would crowd out the weight
    double-buffers (wide-I down proj), then 128."""
    return 256 if 256 * I * itemsize <= 6 * 1024 * 1024 else 128


def _rowtiled_budget_o(
    O: int, bb: int, I: int, x_itemsize: int, row_bytes: int,
    extra_row_bytes: int = 0,
) -> int:
    avail = _VMEM_BUDGET - bb * I * x_itemsize
    per_row = 2 * (row_bytes + extra_row_bytes + bb * x_itemsize)
    rows = max(128, avail // per_row) if avail > 0 else 128
    return _pick_block_o(O, rows)


def _rowtiled_stacked_call(kernel, x, w_stacked, extra_specs, extra_args,
                           layer, itemsize, extra_row_bytes=0):
    """Shared row-tiled wrapper for the stacked [L, O, ...] weights."""
    B, I = x.shape
    L, O = w_stacked.shape[0], w_stacked.shape[1]
    bb = _row_block(I, x.dtype.itemsize)
    BPp = -(-B // bb) * bb
    if BPp != B:
        x = jnp.pad(x, ((0, BPp - B), (0, 0)))
    row_bytes = w_stacked.shape[2] * itemsize
    block_o = _rowtiled_budget_o(
        O, bb, I, x.dtype.itemsize, row_bytes, extra_row_bytes
    )

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(BPp // bb, O // block_o),
        in_specs=[
            pl.BlockSpec((bb, I), lambda b, o, l: (b, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_o, w_stacked.shape[2]),
                         lambda b, o, l: (l[0], o, 0),
                         memory_space=pltpu.VMEM),
            *extra_specs(block_o),
        ],
        out_specs=pl.BlockSpec((bb, block_o), lambda b, o, l: (b, o),
                               memory_space=pltpu.VMEM),
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((BPp, O), x.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * BPp * O * I,
            bytes_accessed=(BPp // bb) * O * row_bytes
            + BPp * I * x.dtype.itemsize
            + BPp * O * x.dtype.itemsize,
            transcendentals=0,
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
        ),
    )(jnp.reshape(layer, (1,)).astype(jnp.int32), x, w_stacked, *extra_args)
    return out[:B]


def _matmul_int8_stacked_rowtiled(x, q, s, layer):
    specs = lambda bo: [
        pl.BlockSpec((1, bo, 1), lambda b, o, l: (l[0], o, 0),
                     memory_space=pltpu.VMEM)
    ]
    return _rowtiled_stacked_call(
        _int8_kernel_stacked, x, q, specs, (s,), layer, itemsize=1
    )


def _matmul_dense_stacked_rowtiled(x, w, layer):
    return _rowtiled_stacked_call(
        _dense_kernel_stacked, x, w, lambda bo: [], (), layer,
        itemsize=w.dtype.itemsize,
    )


def _matmul_int4_stacked_rowtiled(x, packed, s, layer):
    """Row-tiled layer-indexed int4 (same unpack math as the 1-D path;
    scales dynamic-sliced outside, see matmul_int4_stacked_pallas)."""
    B, I = x.shape
    L, O = packed.shape[0], packed.shape[1]
    G = s.shape[2]
    group_size = I // G
    st, Gp = _st16(jnp.take(s, layer, axis=0))  # [Gp, O] f32 = 16*s
    bb = _row_block(I, x.dtype.itemsize)
    BPp = -(-B // bb) * bb
    if BPp != B:
        x = jnp.pad(x, ((0, BPp - B), (0, 0)))
    block_o = _rowtiled_budget_o(
        O, bb, I, x.dtype.itemsize, row_bytes=I // 2,
        extra_row_bytes=Gp * 4 + 28 * group_size,
    )

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(BPp // bb, O // block_o),
        in_specs=[
            pl.BlockSpec((bb, I), lambda b, o, l: (b, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_o, I // 2), lambda b, o, l: (l[0], o, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((Gp, block_o), lambda b, o, l: (0, o),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bb, block_o), lambda b, o, l: (b, o),
                               memory_space=pltpu.VMEM),
    )
    out = pl.pallas_call(
        functools.partial(_int4_kernel_stacked, group_size=group_size),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((BPp, O), x.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * BPp * O * I,
            bytes_accessed=(BPp // bb) * O * I // 2
            + BPp * I * x.dtype.itemsize
            + BPp * O * x.dtype.itemsize,
            transcendentals=0,
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
        ),
    )(jnp.reshape(layer, (1,)).astype(jnp.int32), x, packed, st)
    return out[:B]


# ---------------------------------------------------------------------------
# Fused matmul+argmax: the greedy lm_head. Computes argmax_o(x @ W^T)
# WITHOUT materializing the [B, V] f32 logits (XLA's separate
# iota-reduce argmax over 152k lanes measured 0.36 ms/step at B=40 —
# more than the whole int4 lm_head matmul). A running (max, argmax)
# carry lives in the revisited output block across grid steps; ties
# resolve to the lowest index, matching jnp.argmax. `valid_o` masks the
# zero-scale tile-padding rows appended by quant.pad_out_rows (their
# logit is exactly 0, which would win over all-negative real logits).
# ---------------------------------------------------------------------------


def _argmax_update(y, i, block_o, valid_o, m_ref, a_ref):
    idx = jax.lax.broadcasted_iota(jnp.int32, y.shape, 1) + i * block_o
    y = jnp.where(idx < valid_o, y, -jnp.inf)
    tile_max = jnp.max(y, axis=-1, keepdims=True)  # [BP, 1]
    big = jnp.int32(2**30)
    tile_arg = jnp.min(
        jnp.where(y == tile_max, idx, big), axis=-1, keepdims=True
    )

    @pl.when(i == 0)
    def _():
        m_ref[...] = jnp.full(m_ref.shape, -jnp.inf, m_ref.dtype)
        a_ref[...] = jnp.zeros(a_ref.shape, a_ref.dtype)

    better = tile_max > m_ref[...][:, :1]
    m_ref[...] = jnp.where(better, tile_max, m_ref[...][:, :1])
    a_ref[...] = jnp.where(better, tile_arg, a_ref[...][:, :1])


def _int4_argmax_kernel(x_ref, w_ref, st_ref, m_ref, a_ref, *,
                        group_size: int, block_o: int, valid_o: int):
    i = pl.program_id(0)
    y = _int4_acc(
        x_ref, w_ref, st_ref,
        (x_ref.shape[0], w_ref.shape[0]), group_size,
    )
    _argmax_update(y, i, block_o, valid_o, m_ref, a_ref)


def _int8_argmax_kernel(x_ref, w_ref, s_ref, m_ref, a_ref, *,
                        block_o: int, valid_o: int):
    i = pl.program_id(0)
    x = x_ref[...]
    w = w_ref[...].astype(x.dtype)
    y = jax.lax.dot_general(
        x, w, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * s_ref[...][:, 0][None, :]
    _argmax_update(y, i, block_o, valid_o, m_ref, a_ref)


def _dense_argmax_kernel(x_ref, w_ref, m_ref, a_ref, *,
                         block_o: int, valid_o: int):
    i = pl.program_id(0)
    x = x_ref[...]
    y = jax.lax.dot_general(
        x, w_ref[...].astype(x.dtype), (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    _argmax_update(y, i, block_o, valid_o, m_ref, a_ref)


@functools.partial(jax.jit, static_argnames=("valid_o", "block_o"))
def argmax_matmul_dense_pallas(
    x: jax.Array,  # [B, I]
    w: jax.Array,  # [O, I] bf16/f32
    valid_o: int | None = None,
    block_o: int = 512,
) -> jax.Array:  # [B] int32
    B, I = x.shape
    O = w.shape[0]
    valid_o = O if valid_o is None else valid_o
    BP = max(8, -(-B // 8) * 8)
    if BP != B:
        x = jnp.pad(x, ((0, BP - B), (0, 0)))
    budget_rows = _budget_rows(
        BP, I, x.dtype.itemsize, row_bytes=I * w.dtype.itemsize
    )
    block_o = _pick_block_o(O, min(budget_rows, block_o) if block_o < 512 else budget_rows)

    m, a = pl.pallas_call(
        functools.partial(
            _dense_argmax_kernel, block_o=block_o, valid_o=valid_o
        ),
        grid=(O // block_o,),
        in_specs=[
            pl.BlockSpec((BP, I), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((block_o, I), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((BP, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((BP, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((BP, 1), jnp.float32),
            jax.ShapeDtypeStruct((BP, 1), jnp.int32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * BP * O * I,
            bytes_accessed=O * I * w.dtype.itemsize
            + BP * I * x.dtype.itemsize,
            transcendentals=0,
        ),
    )(x, w)
    return a[:B, 0]


@functools.partial(jax.jit, static_argnames=("valid_o", "block_o"))
def argmax_matmul_int4_pallas(
    x: jax.Array,  # [B, I]
    packed: jax.Array,  # [O, I//2] uint8 (split-half)
    s: jax.Array,  # [O, I//G] f32
    valid_o: int | None = None,
    block_o: int = 512,
) -> jax.Array:  # [B] int32 = argmax over rows < valid_o
    B, I = x.shape
    O = packed.shape[0]
    G = s.shape[1]
    group_size = I // G
    valid_o = O if valid_o is None else valid_o
    BP = max(8, -(-B // 8) * 8)
    if (
        BP > _INT4_MAX_BP
        or G % 2
        or group_size % 128
        or (I // 2) % group_size
    ):
        from vllm_omni_draft_tpu.ops import quant as q

        w = q.dequantize({"w": packed, "s": s}, dtype=x.dtype)
        return jnp.argmax((x @ w.T)[:, :valid_o], axis=-1).astype(jnp.int32)
    if BP != B:
        x = jnp.pad(x, ((0, BP - B), (0, 0)))
    st, Gp = _st16(s)
    budget_rows = _budget_rows(
        BP, I, x.dtype.itemsize, row_bytes=I // 2,
        extra_row_bytes=Gp * 4 + 28 * group_size,
    )
    block_o = _pick_block_o(O, min(budget_rows, block_o))

    m, a = pl.pallas_call(
        functools.partial(
            _int4_argmax_kernel, group_size=group_size, block_o=block_o,
            valid_o=valid_o,
        ),
        grid=(O // block_o,),
        in_specs=[
            pl.BlockSpec((BP, I), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((block_o, I // 2), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((Gp, block_o), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((BP, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((BP, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((BP, 1), jnp.float32),
            jax.ShapeDtypeStruct((BP, 1), jnp.int32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * BP * O * I,
            bytes_accessed=O * I // 2 + BP * I * x.dtype.itemsize,
            transcendentals=0,
        ),
    )(x, packed, st)
    return a[:B, 0]


@functools.partial(jax.jit, static_argnames=("valid_o", "block_o"))
def argmax_matmul_int8_pallas(
    x: jax.Array,  # [B, I]
    q: jax.Array,  # [O, I] int8
    s: jax.Array,  # [O, 1] f32
    valid_o: int | None = None,
    block_o: int = 512,
) -> jax.Array:  # [B] int32
    B, I = x.shape
    O = q.shape[0]
    valid_o = O if valid_o is None else valid_o
    BP = max(8, -(-B // 8) * 8)
    if BP != B:
        x = jnp.pad(x, ((0, BP - B), (0, 0)))
    budget_rows = _budget_rows(BP, I, x.dtype.itemsize, row_bytes=I)
    block_o = _pick_block_o(O, min(budget_rows, block_o) if block_o < 512 else budget_rows)

    m, a = pl.pallas_call(
        functools.partial(
            _int8_argmax_kernel, block_o=block_o, valid_o=valid_o
        ),
        grid=(O // block_o,),
        in_specs=[
            pl.BlockSpec((BP, I), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((block_o, I), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_o, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((BP, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((BP, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((BP, 1), jnp.float32),
            jax.ShapeDtypeStruct((BP, 1), jnp.int32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * BP * O * I,
            bytes_accessed=O * I + BP * I * x.dtype.itemsize,
            transcendentals=0,
        ),
    )(x, q, s)
    return a[:B, 0]


# ---------------------------------------------------------------------------
# logits + row stats (sampled-verify lm_head): emit the f32 logits AND the
# per-row (max, argmax) in the same pass, so the sampled path skips two
# separate full-width [B, V] reductions (~0.25 ms/iter at the 7B verify
# shape). Greedy keeps the argmax-only kernels (no logits write at all).
# ---------------------------------------------------------------------------


def _int4_logits_stats_kernel(x_ref, w_ref, st_ref, y_ref, m_ref, a_ref, *,
                              group_size: int, block_o: int, valid_o: int):
    i = pl.program_id(0)
    y = _int4_acc(
        x_ref, w_ref, st_ref,
        (x_ref.shape[0], w_ref.shape[0]), group_size,
    )
    # stats on the ROUNDED emitted image (the plain matmul kernels emit
    # x.dtype logits and downstream promotes) so max/argmax match what a
    # consumer computes from the written logits bit-for-bit
    yw = y.astype(y_ref.dtype)
    y_ref[...] = yw
    _argmax_update(yw.astype(jnp.float32), i, block_o, valid_o, m_ref, a_ref)


def _int8_logits_stats_kernel(x_ref, w_ref, s_ref, y_ref, m_ref, a_ref, *,
                              block_o: int, valid_o: int):
    i = pl.program_id(0)
    x = x_ref[...]
    w = w_ref[...].astype(x.dtype)
    y = jax.lax.dot_general(
        x, w, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * s_ref[...][:, 0][None, :]
    yw = y.astype(y_ref.dtype)
    y_ref[...] = yw
    _argmax_update(yw.astype(jnp.float32), i, block_o, valid_o, m_ref, a_ref)


@functools.partial(jax.jit, static_argnames=("valid_o", "block_o"))
def logits_stats_matmul_int4_pallas(
    x: jax.Array,  # [B, I]
    packed: jax.Array,  # [O, I//2] uint8 (split-half)
    s: jax.Array,  # [O, I//G] f32
    valid_o: int | None = None,
    block_o: int = 512,
):  # -> (logits [B, O] f32, mx [B] f32, argmax [B] int32)
    B, I = x.shape
    O = packed.shape[0]
    G = s.shape[1]
    group_size = I // G
    valid_o = O if valid_o is None else valid_o
    BP = max(8, -(-B // 8) * 8)
    if (
        BP > _INT4_MAX_BP
        or G % 2
        or group_size % 128
        or (I // 2) % group_size
    ):
        from vllm_omni_draft_tpu.ops import quant as q

        w = q.dequantize({"w": packed, "s": s}, dtype=x.dtype)
        y = x @ w.T
        yv = y[:, :valid_o].astype(jnp.float32)
        return y, jnp.max(yv, -1), jnp.argmax(yv, -1).astype(jnp.int32)
    if BP != B:
        x = jnp.pad(x, ((0, BP - B), (0, 0)))
    st, Gp = _st16(s)
    budget_rows = _budget_rows(
        BP, I, x.dtype.itemsize, row_bytes=I // 2,
        extra_row_bytes=Gp * 4 + 28 * group_size + BP * 4,
    )
    block_o = _pick_block_o(O, min(budget_rows, block_o))

    y, m, a = pl.pallas_call(
        functools.partial(
            _int4_logits_stats_kernel, group_size=group_size,
            block_o=block_o, valid_o=valid_o,
        ),
        grid=(O // block_o,),
        in_specs=[
            pl.BlockSpec((BP, I), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((block_o, I // 2), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((Gp, block_o), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((BP, block_o), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((BP, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((BP, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((BP, O), x.dtype),
            jax.ShapeDtypeStruct((BP, 1), jnp.float32),
            jax.ShapeDtypeStruct((BP, 1), jnp.int32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * BP * O * I,
            bytes_accessed=O * I // 2 + BP * I * x.dtype.itemsize
            + BP * O * x.dtype.itemsize,
            transcendentals=0,
        ),
    )(x, packed, st)
    return y[:B], m[:B, 0], a[:B, 0]


@functools.partial(jax.jit, static_argnames=("valid_o", "block_o"))
def logits_stats_matmul_int8_pallas(
    x: jax.Array,  # [B, I]
    q: jax.Array,  # [O, I] int8
    s: jax.Array,  # [O, 1] f32
    valid_o: int | None = None,
    block_o: int = 512,
):  # -> (logits [B, O] f32, mx [B] f32, argmax [B] int32)
    B, I = x.shape
    O = q.shape[0]
    valid_o = O if valid_o is None else valid_o
    BP = max(8, -(-B // 8) * 8)
    if BP != B:
        x = jnp.pad(x, ((0, BP - B), (0, 0)))
    budget_rows = _budget_rows(
        BP, I, x.dtype.itemsize, row_bytes=I, extra_row_bytes=BP * 4
    )
    block_o = _pick_block_o(
        O, min(budget_rows, block_o) if block_o < 512 else budget_rows
    )

    y, m, a = pl.pallas_call(
        functools.partial(
            _int8_logits_stats_kernel, block_o=block_o, valid_o=valid_o
        ),
        grid=(O // block_o,),
        in_specs=[
            pl.BlockSpec((BP, I), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((block_o, I), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_o, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((BP, block_o), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((BP, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((BP, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((BP, O), x.dtype),
            jax.ShapeDtypeStruct((BP, 1), jnp.float32),
            jax.ShapeDtypeStruct((BP, 1), jnp.int32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * BP * O * I,
            bytes_accessed=O * I + BP * I * x.dtype.itemsize
            + BP * O * x.dtype.itemsize,
            transcendentals=0,
        ),
    )(x, q, s)
    return y[:B], m[:B, 0], a[:B, 0]


@functools.partial(jax.jit, static_argnames=("block_o",))
def matmul_int4_pallas(
    x: jax.Array,  # [B, I]
    packed: jax.Array,  # [O, I//2] uint8 (split-half)
    s: jax.Array,  # [O, I//G] f32
    block_o: int = 512,
) -> jax.Array:
    B, I = x.shape
    O = packed.shape[0]
    G = s.shape[1]
    group_size = I // G
    BP = max(8, -(-B // 8) * 8)
    # the per-group static slices need lane-aligned group boundaries in the
    # packed array and group-aligned halves
    if (
        BP > _INT4_MAX_BP
        or G % 2
        or group_size % 128
        or (I // 2) % group_size
    ):
        from vllm_omni_draft_tpu.ops import quant as q

        w = q.dequantize({"w": packed, "s": s}, dtype=x.dtype)
        return x @ w.T
    if BP != B:
        x = jnp.pad(x, ((0, BP - B), (0, 0)))
    st, Gp = _st16(s)  # [Gp, O] f32 = 16*s
    # budget/row: packed I/2 bytes double-buffered, plus resident x and
    # the f32 unpack intermediates (~14 B/elem x2 in-flight chunks)
    budget_rows = _budget_rows(
        BP, I, x.dtype.itemsize, row_bytes=I // 2,
        extra_row_bytes=Gp * 4 + BP * x.dtype.itemsize + 28 * group_size,
    )
    block_o = _pick_block_o(O, min(budget_rows, block_o))

    out = pl.pallas_call(
        functools.partial(_int4_kernel, group_size=group_size),
        grid=(O // block_o,),
        in_specs=[
            pl.BlockSpec((BP, I), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((block_o, I // 2), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((Gp, block_o), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((BP, block_o), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((BP, O), x.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * BP * O * I,
            bytes_accessed=O * I // 2 + BP * I * x.dtype.itemsize
            + BP * O * x.dtype.itemsize,
            transcendentals=0,
        ),
    )(x, packed, st)
    return out[:B]
