"""Experimental INT4 dequant+matmul kernel variants chasing the >=85%
verify-matmul roofline gate (BASELINE.md; round-2 measured 73% aggregate
at the 160-row verify shape, PERF_NOTES "Verify-matmul roofline").

Levers over ops/pallas/quant_matmul._int4_acc (same split-half packed
format — no repacking):

1. F32 BIT-PATTERN unpack: build the float 1 + u/16 by placing the
   nibble into the f32 mantissa with integer ops and a SAME-WIDTH
   bitcast (Mosaic rejects width-changing bitcasts):
       lo = bitcast_f32(((p & 0x0F) << 19) | 0x3F800000)
       hi = bitcast_f32(((p & 0xF0) << 15) | 0x3F800000)
   Subtracting 1.5 is exact ((u-8)/16 in [-0.5, 0.4375]), giving SIGNED
   values directly — the zero-point xsum-correction dot of the
   production kernel disappears, and the final f32->bf16 convert is
   exact (4 mantissa bits). No int->float converts anywhere.

2. groups_per_dot (gpd): fold 16*s into the signed bf16 tile (one VPU
   multiply per element) and contract gpd groups per half in ONE MXU
   dot — the 7B down-proj's 148 K=128 dots become 148/gpd pairs,
   cutting MXU pipeline-fill and post-dot scale work. bf16 scale
   folding rounds s*val to bf16 (<=0.4% of the weight value, ~6% of one
   int4 quantization step); gpd=1 keeps exact post-dot f32 scaling.

Reference surface being rebuilt: vLLM's CUDA int4 GEMMs (SURVEY.md §2.4).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from vllm_omni_draft_tpu.ops.pallas.quant_matmul import (
    _budget_rows,
    _pick_block_o,
    _INT4_MAX_BP,
)


def _nib_lo_f32(p32: jax.Array) -> jax.Array:
    """int32 bytes -> f32 = 1 + lo_nibble/16 (exact, bitcast only)."""
    return jax.lax.bitcast_convert_type(
        ((p32 & 0x0F) << 19) | 0x3F800000, jnp.float32
    )


def _nib_hi_f32(p32: jax.Array) -> jax.Array:
    return jax.lax.bitcast_convert_type(
        ((p32 & 0xF0) << 15) | 0x3F800000, jnp.float32
    )


def _int4_acc_v2(x_ref, w_slice, st16_ref, shape, group_size: int,
                 gpd: int):
    """x [BP, I]; w_slice [O_T, I//2] uint8 SPLIT-HALF (byte b = col b |
    col b + I/2 << 4); st16 [Gp, O_T] f32 = 16 * scales (transposed,
    zero-padded rows).

    Chunk c of packed columns covers group c (low nibbles) and group
    C + c (high nibbles), C = G/2 — both FULL group_size-wide tiles, so
    every dot contracts K = gpd*group_size with no column shuffling.
    """
    half = w_slice.shape[1]
    C = half // group_size  # groups per half
    dt = x_ref.dtype
    x_all = x_ref[...]
    s_all = st16_ref[...]  # [Gp, O_T] f32 = 16*s
    acc = jnp.zeros(shape, jnp.float32)
    for c0 in range(0, C, gpd):
        n = min(gpd, C - c0)
        p = w_slice[:, c0 * group_size:(c0 + n) * group_size].astype(
            jnp.int32
        )
        lo = _nib_lo_f32(p) - 1.5  # [O_T, n*gs] f32, (u-8)/16 exact
        hi = _nib_hi_f32(p) - 1.5
        xs_lo = x_all[:, c0 * group_size:(c0 + n) * group_size]
        xs_hi = x_all[:, half + c0 * group_size:half + (c0 + n) * group_size]
        if gpd == 1:
            for vals, xs, g in ((lo, xs_lo, c0), (hi, xs_hi, C + c0)):
                t = jax.lax.dot_general(
                    xs, vals.astype(dt), (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                acc += t * s_all[g][None, :]
        else:
            for vals, xs, gbase in ((lo, xs_lo, c0), (hi, xs_hi, C + c0)):
                scaled = jnp.concatenate(
                    [
                        (
                            vals[:, k * group_size:(k + 1) * group_size]
                            * s_all[gbase + k][:, None]
                        ).astype(dt)
                        for k in range(n)
                    ],
                    axis=1,
                )
                acc += jax.lax.dot_general(
                    xs, scaled, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
    return acc


def _int4_v2_kernel(x_ref, w_ref, st_ref, o_ref, *, group_size: int,
                    gpd: int):
    y = _int4_acc_v2(x_ref, w_ref, st_ref, o_ref.shape, group_size, gpd)
    o_ref[...] = y.astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("gpd", "block_o"))
def matmul_int4_v2_pallas(
    x: jax.Array,  # [B, I]
    packed: jax.Array,  # [O, I//2] uint8 split-half (standard format)
    s: jax.Array,  # [O, I//G] f32
    gpd: int = 1,
    block_o: int = 512,
) -> jax.Array:
    B, I = x.shape
    O = packed.shape[0]
    G = s.shape[1]
    group_size = I // G
    BP = max(8, -(-B // 8) * 8)
    assert BP <= _INT4_MAX_BP and G % 2 == 0 and group_size % 128 == 0
    if BP != B:
        x = jnp.pad(x, ((0, BP - B), (0, 0)))
    st16 = (16.0 * s.T).astype(jnp.float32)  # [G, O]
    Gp = -(-G // 8) * 8  # sublane-align the scale rows
    if Gp != G:
        st16 = jnp.pad(st16, ((0, Gp - G), (0, 0)))
    # the f32 unpack intermediates (p int32 + lo/hi f32 + the cast) keep
    # ~14 bytes/element live per in-flight chunk — charge ~2 chunks so
    # Mosaic's scoped-vmem stack stays under its 16M limit
    budget_rows = _budget_rows(
        BP, I, x.dtype.itemsize, row_bytes=I // 2,
        extra_row_bytes=Gp * 4 + BP * x.dtype.itemsize
        + 14 * group_size * max(2, gpd),
    )
    block_o = _pick_block_o(O, min(budget_rows, block_o))

    out = pl.pallas_call(
        functools.partial(
            _int4_v2_kernel, group_size=group_size, gpd=gpd
        ),
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
    )(x, packed, st16)
    return out[:B]
