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
    block_o = min(block_o, O)
    while O % block_o:  # e.g. vocab 151936 = 2^7 * 1187
        block_o //= 2

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


def _int4_kernel(x_ref, w_ref, s_ref, o_ref, *, group_size: int):
    # x [BP, I]; w [O_T, I//2] uint8 split-half; s [O_T, G] f32; o [BP, O_T]
    x = x_ref[...]
    p = w_ref[...].astype(jnp.int32)  # Mosaic has no i8 vector arithmetic
    lo = (p & 0xF) - 8
    hi = (p >> 4) - 8
    # dequantize in the activation dtype (int4 values are bf16-exact;
    # an f32 intermediate would double the VMEM footprint of the tile)
    w = jnp.concatenate([lo, hi], axis=-1).astype(x.dtype)  # [O_T, I]
    O_T, G = s_ref.shape
    I = w.shape[-1]
    # expand group scales to per-column via broadcast+reshape (constant
    # shapes; avoids a repeat op the Mosaic lowering may not like)
    scales = jnp.broadcast_to(
        s_ref[...][:, :, None], (O_T, G, group_size)
    ).reshape(O_T, I)
    wf = w * scales.astype(x.dtype)
    o_ref[...] = jax.lax.dot_general(
        x, wf, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ).astype(o_ref.dtype)


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
    if BP != B:
        x = jnp.pad(x, ((0, BP - B), (0, 0)))
    # VMEM budget: packed (I/2 B) + dequant tile (2I B) + pipeline 2x
    # must stay well under the ~16MB scoped limit alongside x and out
    budget_rows = max(64, (6 * 1024 * 1024) // (5 * I // 2))
    block_o = min(block_o, O, 1 << (budget_rows.bit_length() - 1))
    while O % block_o:
        block_o //= 2

    out = pl.pallas_call(
        functools.partial(_int4_kernel, group_size=group_size),
        grid=(O // block_o,),
        in_specs=[
            pl.BlockSpec((BP, I), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((block_o, I // 2), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_o, G), lambda i: (i, 0),
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
    )(x, packed, s)
    return out[:B]
