"""Experimental INT4 dequant+matmul kernel variants chasing the >=85%
verify-matmul roofline gate (BASELINE.md; round-2 measured 73% aggregate
at the 160-row verify shape, PERF_NOTES "Verify-matmul roofline").

Levers over ops/pallas/quant_matmul._int4_acc:

1. PAIRED nibble packing + bf16 BIT-PATTERN unpack. Byte j holds columns
   2j (low nibble) and 2j+1 (high nibble) — both nibbles of a byte land
   in the SAME quantization group, so one int32 op chain builds a bf16
   pair in-lane with NO int->float converts:
       combined = ((p & 0xF) << 3) | ((p & 0xF0) << 15) | 0x3F803F80
   bitcast(int32 -> 2 x bf16, little-endian lo-first) yields
   1 + u/16 exactly (4 mantissa bits needed, bf16 has 7).

2. SIGNED pattern: subtracting 1.5 in bf16 is EXACT (both operands and
   the result (u-8)/16 in [-0.5, 0.4375] are representable), giving the
   signed weight value directly — the zero-point xsum-correction dot of
   the production kernel disappears entirely. (Folding the offset into a
   post-hoc correction instead amplifies bf16 rounding ~4*sqrt(K) by
   cancellation — measured 2.5% error; the signed form is exact.)

3. groups_per_dot (gpd): fold scales into the signed bf16 tile (one VPU
   multiply per element) and contract gpd groups in ONE MXU dot — 148
   small K=128 dots on the 7B down-proj become 148/gpd, cutting MXU
   pipeline-fill and post-dot scale work. bf16 scale folding rounds
   s*val to bf16 (<=0.4% relative on the weight, ~6% of one int4 quant
   step); gpd=1 keeps exact post-dot f32 scaling.

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


def repack_int4_paired(packed: jax.Array) -> jax.Array:
    """Split-half packed [O, I//2] (byte b = col b | col b+I/2 << 4) ->
    paired layout (byte j = col 2j | col 2j+1 << 4). One-time transform
    at weight-load; the group-scale layout is unchanged (it follows
    original column order)."""
    lo = packed & 0xF
    hi = packed >> 4
    u = jnp.concatenate([lo, hi], axis=-1)  # [O, I] unsigned nibbles
    return (u[..., 0::2] | (u[..., 1::2] << 4)).astype(jnp.uint8)


def _unpack_paired_signed_bf16(p32: jax.Array) -> jax.Array:
    """[.., Nb] int32 of paired bytes -> [.., 2*Nb] bf16 = (u - 8) / 16,
    exact (no int->float converts; the 1.5 subtraction is exact in bf16).
    """
    comb = ((p32 & 0xF) << 3) | ((p32 & 0xF0) << 15) | 0x3F803F80
    pair = jax.lax.bitcast_convert_type(comb, jnp.bfloat16)  # [.., Nb, 2]
    vals = pair.reshape(*p32.shape[:-1], p32.shape[-1] * 2)
    return vals - jnp.bfloat16(1.5)


def _int4_acc_paired(x_ref, w_slice, st16_ref, shape,
                     group_size: int, gpd: int):
    """x [BP, I]; w_slice [O_T, I//2] uint8 PAIRED; st16 [Gp, O_T] f32 =
    16 * scales (transposed, zero-padded rows).

    gpd == 1: unpack one group's bytes, one bf16 dot, post-dot f32 scale.
    gpd > 1: unpack gpd groups, fold scale into the bf16 tile (per-
    element multiply), one dot of K = gpd*group_size, no post-dot scale.
    """
    hb = group_size // 2  # bytes per group
    G = w_slice.shape[1] // hb
    dt = x_ref.dtype
    x_all = x_ref[...]
    s_all = st16_ref[...]  # [Gp, O_T] f32, = 16*s
    acc = jnp.zeros(shape, jnp.float32)
    for c0 in range(0, G, gpd):
        n = min(gpd, G - c0)
        p = w_slice[:, c0 * hb:(c0 + n) * hb].astype(jnp.int32)
        vals = _unpack_paired_signed_bf16(p)  # [O_T, n*gs] bf16, (u-8)/16
        xs = x_all[:, c0 * group_size:(c0 + n) * group_size]
        if gpd == 1:
            t = jax.lax.dot_general(
                xs, vals, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            acc += t * s_all[c0][None, :]
        else:
            scaled = jnp.concatenate(
                [
                    vals[:, k * group_size:(k + 1) * group_size]
                    * s_all[c0 + k][:, None].astype(dt)
                    for k in range(n)
                ],
                axis=1,
            )
            acc += jax.lax.dot_general(
                xs, scaled, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
    return acc


def _int4_paired_kernel(x_ref, w_ref, st_ref, o_ref, *,
                        group_size: int, gpd: int):
    y = _int4_acc_paired(
        x_ref, w_ref, st_ref, o_ref.shape, group_size, gpd
    )
    o_ref[...] = y.astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("gpd", "block_o"))
def matmul_int4_paired_pallas(
    x: jax.Array,  # [B, I]
    packed_paired: jax.Array,  # [O, I//2] uint8 PAIRED layout
    s: jax.Array,  # [O, I//G] f32
    gpd: int = 1,
    block_o: int = 512,
) -> jax.Array:
    B, I = x.shape
    O = packed_paired.shape[0]
    G = s.shape[1]
    group_size = I // G
    BP = max(8, -(-B // 8) * 8)
    assert BP <= _INT4_MAX_BP and group_size % 2 == 0
    if BP != B:
        x = jnp.pad(x, ((0, BP - B), (0, 0)))
    st16 = (16.0 * s.T).astype(jnp.float32)  # [G, O]
    Gp = -(-G // 8) * 8  # sublane-align the scale rows
    if Gp != G:
        st16 = jnp.pad(st16, ((0, Gp - G), (0, 0)))
    budget_rows = _budget_rows(
        BP, I, x.dtype.itemsize, row_bytes=I // 2,
        extra_row_bytes=Gp * 4 + BP * x.dtype.itemsize,
    )
    block_o = _pick_block_o(
        O, min(budget_rows, block_o) if block_o < 512 else budget_rows
    )

    out = pl.pallas_call(
        functools.partial(
            _int4_paired_kernel, group_size=group_size, gpd=gpd
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
    )(x, packed_paired, st16)
    return out[:B]
