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
    """x [BP, I]; w [O_T, I//2] uint8 split-half; s [O_T, G] f32.

    The two nibble spans are dequantized and contracted separately with
    STATIC half-slices (a concatenated [O_T, I] dequant buffer doubles the
    VMEM footprint; static slices at I/2 are lane-aligned for all real
    model widths, which are multiples of 256)."""
    p = w_ref[...].astype(jnp.int32)  # Mosaic has no i8 vector arithmetic
    O_T, G = s_ref.shape
    half = p.shape[1]
    dt = x_ref.dtype
    Gh = G // 2

    def span(vals, x_part, s_part):
        w = vals.astype(dt)  # [O_T, half], bf16-exact for int4
        # group-scale by splitting the weight's minor dim (a reshape of
        # real data; Mosaic rejects broadcast+reshape at some group counts)
        wf = (
            w.reshape(O_T, Gh, group_size) * s_part[:, :, None].astype(dt)
        ).reshape(O_T, half)
        return jax.lax.dot_general(
            x_part, wf, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    s_all = s_ref[...]
    x_all = x_ref[...]
    acc = span((p & 0xF) - 8, x_all[:, :half], s_all[:, :Gh])
    acc += span((p >> 4) - 8, x_all[:, half:], s_all[:, Gh:])
    o_ref[...] = acc.astype(o_ref.dtype)


# activations wider than this take the XLA fallback (VMEM can't hold the
# resident x plus double-buffered weight tiles)
_INT4_MAX_BP = 128


@functools.partial(jax.jit, static_argnames=("block_o",))
def matmul_int4_pallas(
    x: jax.Array,  # [B, I]
    packed: jax.Array,  # [O, I//2] uint8 (split-half)
    s: jax.Array,  # [O, I//G] f32
    block_o: int = 512,
) -> jax.Array:
    # NOTE: K-tiling this kernel is blocked on a Mosaic constraint — scale
    # tiles ([O_T, groups_per_tile]) can't satisfy the (8, 128) block-shape
    # rule for 7B-model group counts. This whole-row kernel dequantizes
    # [block_o, I/2] per span per grid step; block_o adapts to VMEM.
    B, I = x.shape
    O = packed.shape[0]
    G = s.shape[1]
    group_size = I // G
    BP = max(8, -(-B // 8) * 8)
    if BP > _INT4_MAX_BP or G % 2 or (I // 2) % 128:
        from vllm_omni_draft_tpu.ops import quant as q

        w = q.dequantize({"w": packed, "s": s}, dtype=x.dtype)
        return x @ w.T
    if BP != B:
        x = jnp.pad(x, ((0, BP - B), (0, 0)))
    # budget/row: packed I/2 + one dequant span I (bf16), double-buffered
    budget_rows = max(128, (8 * 1024 * 1024) // (3 * I))
    cap = 1 << (budget_rows.bit_length() - 1)
    block_o = max(128, min(block_o, O, cap))
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
