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
    # double-buffered weight tiles must fit the scoped-VMEM budget
    budget_rows = max(128, (12 * 1024 * 1024) // (2 * I))
    block_o = min(block_o, O, 1 << (budget_rows.bit_length() - 1))
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


def _int4_kernel(x_ref, w_ref, st_ref, o_ref, *, group_size: int):
    """x [BP, I]; w [O_T, I//2] uint8 split-half; st [G, O_T] f32
    (scales transposed so one group's scales are one lane-contiguous row).

    No reshapes (Mosaic rejects every group-scale reshape/broadcast at 7B
    group counts — PERF_NOTES.md): each group is a STATIC slice, contracted
    on the MXU separately, and scaled post-dot on the [BP, O_T] partial —
    O(BP*O_T) VPU work per group instead of O(O_T*group_size).

    The int4 zero-point (stored unsigned, value = u - 8) folds into a
    rank-1 correction instead of a per-element subtract:
        y[b,o] = sum_g s[o,g] * (sum_i x[b,i]*u[o,i] - 8 * sum_i x[b,i])
    so unpacking a nibble costs only mask/shift + cast."""
    half = w_ref.shape[1]
    C = half // group_size  # chunks of packed columns == groups per half
    dt = x_ref.dtype

    x_all = x_ref[...]
    s_all = st_ref[...]  # [G, O_T]
    acc = jnp.zeros(o_ref.shape, jnp.float32)
    for c in range(C):
        sl = slice(c * group_size, (c + 1) * group_size)
        p = w_ref[:, sl].astype(jnp.int32)  # no i8 vector arithmetic
        for vals, xs, g in (
            ((p & 0xF), x_all[:, sl], c),
            ((p >> 4), x_all[:, half + c * group_size:
                             half + (c + 1) * group_size], C + c),
        ):
            t = jax.lax.dot_general(
                xs, vals.astype(dt), (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # [BP, O_T]
            xsum = jnp.sum(xs.astype(jnp.float32), axis=1, keepdims=True)
            acc += (t - 8.0 * xsum) * s_all[g][None, :]
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
    # budget/row: packed I/2 bytes double-buffered, plus resident x
    budget_rows = max(128, (12 * 1024 * 1024) // I)
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
            pl.BlockSpec((G, block_o), lambda i: (0, i),
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
    )(x, packed, s.T.astype(jnp.float32))
    return out[:B]
