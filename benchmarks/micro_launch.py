"""Isolate the paged-attention kernel's ~170-195 us/call FIXED cost
(round-3 probe: B=2 ctx=128 costs 174 us/layer — ~92% of the B=32
serving cost is per-CALL, not per-sequence; the int4 matmul kernels pay
<= ~20 us/call in the verify chain, so it is something specific to the
attention kernel's structure).

Builds pallas_calls with increasing ingredient sets, each timed in a
28-iteration scan:
  base      plain VMEM elementwise kernel
  prefetch  + PrefetchScalarGridSpec with block-table-sized scalars
  scratch   + attention-sized VMEM scratch + DMA semaphores
  dma       + one async_copy HBM->VMEM per scratch slot (waited)
  dma_5d    same but from a 5-D [L, NB, BS, H, D] cache with a
            scalar-indexed layer (the attention kernel's source layout)

Run (TPU): timeout 1800 python benchmarks/micro_launch.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

L = 28
B, T, H, D = 32, 5, 4, 128
BS = 128
NB = 132
SLOTS = 4
BQ = 8


def timed(make_call, *args):
    @jax.jit
    def run(*a):
        def body(c, l):
            out = make_call(a[0] + (c * 0.0).astype(a[0].dtype), *a[1:], l)
            return c + out.reshape(-1)[0].astype(jnp.float32), None

        return jax.lax.scan(
            body, jnp.float32(0), jnp.arange(L, dtype=jnp.int32)
        )[0]

    t0 = time.perf_counter()
    np.asarray(run(*args))
    comp = time.perf_counter() - t0
    reps = 20
    t0 = time.perf_counter()
    for _ in range(reps):
        r = run(*args)
    np.asarray(r)
    return (time.perf_counter() - t0) / reps / L, comp


def main():
    q = jax.random.normal(jax.random.PRNGKey(0), (B, 160, D), jnp.bfloat16)
    bt = jnp.zeros((B, 32), jnp.int32)
    kv_lens = jnp.full((B,), 128, jnp.int32)
    cache5 = jnp.zeros((L, NB, BS, H, D), jnp.float8_e4m3fn)
    cache4 = cache5[0]

    # ---- base: plain elementwise ----
    def k_base(x_ref, o_ref):
        o_ref[...] = x_ref[...] + 1.0

    def c_base(x, l):
        return pl.pallas_call(
            k_base,
            grid=(4,),
            in_specs=[pl.BlockSpec((B // 4, 160, D), lambda i: (i, 0, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((B // 4, 160, D), lambda i: (i, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((B, 160, D), jnp.bfloat16),
        )(x)

    # ---- prefetch: scalar-prefetch grid spec ----
    def k_pref(bt_ref, len_ref, lay_ref, x_ref, o_ref):
        o_ref[...] = x_ref[...] + (bt_ref[0, 0] * 0 + 1).astype(x_ref.dtype)

    def c_pref(x, bt, lens, l):
        gs = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3,
            grid=(4,),
            in_specs=[pl.BlockSpec((B // 4, 160, D), lambda i, *_: (i, 0, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((B // 4, 160, D), lambda i, *_: (i, 0, 0),
                                   memory_space=pltpu.VMEM),
        )
        return pl.pallas_call(
            k_pref, grid_spec=gs,
            out_shape=jax.ShapeDtypeStruct((B, 160, D), jnp.bfloat16),
        )(bt, lens, jnp.reshape(l, (1,)), x)

    # ---- scratch: + attention-sized scratch + semaphores ----
    scratch = [
        pltpu.VMEM((SLOTS, BQ, BS * H, D), jnp.float8_e4m3fn),
        pltpu.VMEM((SLOTS, BQ, BS * H, D), jnp.float8_e4m3fn),
        pltpu.SemaphoreType.DMA((SLOTS, 2, BQ, 1)),
    ]

    def k_scr(bt_ref, len_ref, lay_ref, x_ref, o_ref, kbuf, vbuf, sem):
        o_ref[...] = x_ref[...] + 1.0

    def c_scr(x, bt, lens, l):
        gs = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3,
            grid=(4,),
            in_specs=[pl.BlockSpec((B // 4, 160, D), lambda i, *_: (i, 0, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((B // 4, 160, D), lambda i, *_: (i, 0, 0),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=scratch,
        )
        return pl.pallas_call(
            k_scr, grid_spec=gs,
            out_shape=jax.ShapeDtypeStruct((B, 160, D), jnp.bfloat16),
        )(bt, lens, jnp.reshape(l, (1,)), x)

    # ---- dma: + one waited copy per (slot, seq) from a 4-D cache ----
    def k_dma(bt_ref, len_ref, lay_ref, hbm_ref, x_ref, o_ref, kbuf, vbuf,
              sem, *, use_layer):
        def src(sq):
            bid = bt_ref[sq, 0]
            if use_layer == "5d":
                return hbm_ref.at[lay_ref[0], bid]
            if use_layer == "flat":
                # layer folded into the leading block index: 4-D-style
                # single dynamic index into [L*NB, BS*H, D]
                return hbm_ref.at[lay_ref[0] * NB + bid]
            if use_layer == "flat2":
                return hbm_ref.at[(lay_ref[0] % 2) * NB + bid]
            return hbm_ref.at[bid]

        for sq in range(BQ):
            pltpu.make_async_copy(
                src(sq), kbuf.at[0, sq], sem.at[0, 0, sq, 0]
            ).start()
        for sq in range(BQ):
            pltpu.make_async_copy(
                src(sq), kbuf.at[0, sq], sem.at[0, 0, sq, 0]
            ).wait()
        o_ref[...] = x_ref[...] + 1.0

    def c_dma(cache, use_layer):
        def call(x, bt, lens, l):
            gs = pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=3,
                grid=(4,),
                in_specs=[
                    pl.BlockSpec(memory_space=pl.ANY),
                    pl.BlockSpec((B // 4, 160, D), lambda i, *_: (i, 0, 0),
                                 memory_space=pltpu.VMEM),
                ],
                out_specs=pl.BlockSpec((B // 4, 160, D), lambda i, *_: (i, 0, 0),
                                       memory_space=pltpu.VMEM),
                scratch_shapes=[
                    pltpu.VMEM((SLOTS, BQ, BS * H, D), jnp.float8_e4m3fn),
                    pltpu.VMEM((SLOTS, BQ, BS * H, D), jnp.float8_e4m3fn),
                    pltpu.SemaphoreType.DMA((SLOTS, 2, BQ, 1)),
                ],
            )
            kern = functools.partial(k_dma, use_layer=use_layer)
            return pl.pallas_call(
                kern, grid_spec=gs,
                out_shape=jax.ShapeDtypeStruct((B, 160, D), jnp.bfloat16),
            )(bt, lens, jnp.reshape(l, (1,)), cache, x)

        return call

    # reshape caches to the kernel's flat row view [.., BS*H, D]
    cache5f = cache5.reshape(L, NB, BS * H, D)
    cache4f = cache4.reshape(NB, BS * H, D)

    # discriminators: does the cost track the operand SIZE (a per-call
    # whole-operand touch) or the DMA source indexing?
    def k_nodma(bt_ref, len_ref, lay_ref, hbm_ref, x_ref, o_ref, kbuf,
                vbuf, sem):
        o_ref[...] = x_ref[...] + 1.0

    def c_nodma(cache):
        def call(x, bt, lens, l):
            gs = pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=3,
                grid=(4,),
                in_specs=[
                    pl.BlockSpec(memory_space=pl.ANY),
                    pl.BlockSpec((B // 4, 160, D), lambda i, *_: (i, 0, 0),
                                 memory_space=pltpu.VMEM),
                ],
                out_specs=pl.BlockSpec((B // 4, 160, D),
                                       lambda i, *_: (i, 0, 0),
                                       memory_space=pltpu.VMEM),
                scratch_shapes=[
                    pltpu.VMEM((SLOTS, BQ, BS * H, D), jnp.float8_e4m3fn),
                    pltpu.VMEM((SLOTS, BQ, BS * H, D), jnp.float8_e4m3fn),
                    pltpu.SemaphoreType.DMA((SLOTS, 2, BQ, 1)),
                ],
            )
            return pl.pallas_call(
                k_nodma, grid_spec=gs,
                out_shape=jax.ShapeDtypeStruct((B, 160, D), jnp.bfloat16),
                **(
                    dict(compiler_params=pltpu.CompilerParams(
                        dimension_semantics=("parallel",)))
                    if os.environ.get("PAR") == "1" else {}
                ),
            )(bt, lens, jnp.reshape(l, (1,)), cache, x)

        return call

    flat = cache5f.reshape(L * NB, BS * H, D)
    for name, fn, args in [
        ("base", c_base, (q,)),
        ("prefetch", c_pref, (q, bt, kv_lens)),
        ("scratch", c_scr, (q, bt, kv_lens)),
        ("dma_4d", c_dma(cache4f, False), (q, bt, kv_lens)),
        ("dma_5d", c_dma(cache5f, "5d"), (q, bt, kv_lens)),
        ("dma_flat", c_dma(flat, "flat"), (q, bt, kv_lens)),
        ("nodma_big", c_nodma(flat), (q, bt, kv_lens)),
        ("nodma_big_5d", c_nodma(cache5), (q, bt, kv_lens)),
        ("nodma_big_4dflatview", c_nodma(cache5f), (q, bt, kv_lens)),
        ("nodma_big_bf16",
         c_nodma(jnp.zeros((L * NB, BS * H // 2, D), jnp.bfloat16)),
         (q, bt, kv_lens)),
        ("dma_flat2L", c_dma(flat[: 2 * NB], "flat2"), (q, bt, kv_lens)),
    ]:
        per, comp = timed(fn, *args)
        print(f"{name:9s}: {per*1e6:7.1f} us/call (compile {comp:.0f}s)",
              flush=True)


if __name__ == "__main__":
    main()
