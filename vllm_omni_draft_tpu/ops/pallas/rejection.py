"""Pallas kernels for the sampled-verify (rejection sampling) path.

Capability parity: vLLM's rejection-sampler CUDA kernels (SURVEY.md
§2.4). The dominant cost of sampled verify is `apply_top_k_top_p`'s
threshold search: the XLA path bisects with 32 masked reductions over
the full [B*(K+1), V] logits (56 HBM passes measured end-to-end,
PERF_NOTES round-1). This kernel loads each row tile into VMEM ONCE and
runs the *identical* bisection math VMEM-resident — HBM traffic drops
from ~32 passes to 1 — emitting per-row (top-k threshold, top-p
unnormalized-exp threshold, row max). The masking + softmax + rejection
stay in XLA (1-2 fused passes).

Semantics: bit-for-bit the math of ops/sampling.apply_top_k_top_p —
bf16 comparison image, f32 thresholds, 16 bisection iterations, the
conservative ties-inclusive invariant (count >= k, mass >= p*denom) —
so the lossless-rejection distribution tests hold unchanged.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

from vllm_omni_draft_tpu.ops import sampling as _sampling

ITERS = 16  # bisection iterations (matches ops/sampling._bisect_threshold)

# VOT_THRESH_BIND=1: bind ONE f32 promotion of the tile per 4-ary loop
# body (3 counts share it). Risks the round-2 Mosaic materialization
# (RTxVx4B live) — watch compile time; default recomputes the promotion
# per probe, which streams vreg-by-vreg like the binary kernel.
_BIND_PROMO = os.environ.get("VOT_THRESH_BIND", "0") == "1"


def _search(prep, probe, lo, hi, arity):
    """Run the threshold search at the given arity. `prep()` builds any
    per-body shared context (the bind-promotion mode); `probe(ctx, t)`
    -> bool [RT, 1]. The narrowing float math is sampling.quad_step /
    classic bisection verbatim, so results stay bit-identical across
    backends at either arity. `arity` is a STATIC jit argument of the
    kernel — resolved at call time, never captured stale in the jit
    cache (advisor round-5 finding)."""
    if arity == 4:
        def body4(_, carry):
            lo, hi = carry
            ctx = prep()
            return _sampling.quad_step(lambda t: probe(ctx, t), lo, hi)

        lo, hi = jax.lax.fori_loop(0, ITERS // 2, body4, (lo, hi))
        return lo

    def body2(_, carry):
        lo, hi = carry
        mid = 0.5 * (lo + hi)
        ok = probe(prep(), mid)
        return jnp.where(ok, mid, lo), jnp.where(ok, hi, mid)

    lo, hi = jax.lax.fori_loop(0, ITERS, body2, (lo, hi))
    return lo


def _thresholds_kernel(x_ref, k_ref, p_ref, *rest, arity, ext_rowmin):
    """x_ref [RT, V] bf16; k_ref/p_ref [RT, 1]; outputs [RT, 1] f32.

    All comparisons promote the bf16 image to f32 — EXACTLY the XLA
    fallback's semantics (`lx >= t` with f32 t promotes), so the kept
    sets are bit-identical (tests/test_pallas.py thresholds parity).

    VMEM discipline: only the bf16 input and the bf16 exp image are kept
    live across the bisection loops (~0.6 MB/row at V=152k). The f32
    promotions happen INSIDE each masked reduction so Mosaic streams them
    vreg-by-vreg — binding a hoisted f32 copy instead put ~14 MB of
    tensors in scope at RT=8 and the kernel spilled (measured: no speedup
    over the XLA path, 33-minute Mosaic compile)."""
    if ext_rowmin:
        rm_ref, kth_ref, tau_ref, mx_ref = rest
    else:
        kth_ref, tau_ref, mx_ref = rest
        rm_ref = None
    xb = x_ref[...]  # [RT, V] bf16 — the only full-width resident (+e)
    V = xb.shape[-1]

    def xf():
        # f32 image, promoted on the fly inside each consumer
        return xb.astype(jnp.float32)

    row_max = jnp.max(xf(), axis=-1, keepdims=True)
    # external lower bound (gathered fast path: the GLOBAL row min, so
    # the probe trajectory matches the full-width search bit-for-bit)
    row_min = rm_ref[...] if rm_ref is not None else jnp.min(
        xf(), axis=-1, keepdims=True
    )

    k = k_ref[...]  # [RT, 1] int32 (0 => disabled)
    keff = jnp.where(k > 0, k, V)

    # ---- top-k: largest t with count{x >= t} >= k ----
    prep_x = xf if _BIND_PROMO else (lambda: None)

    def count_ok(ctx, t):
        xi = ctx if ctx is not None else xf()
        cnt = jnp.sum((xi >= t).astype(jnp.int32), axis=-1, keepdims=True)
        return cnt >= keff

    kth = _search(prep_x, count_ok, row_min - 1e-3, row_max + 1e-3, arity)
    kth_ref[...] = kth
    mx_ref[...] = row_max

    # ---- top-p over unnormalized exp space, masked by keep_k (bf16 e
    # image, f32-promoted comparisons — the XLA fallback's exact math) --
    e = jnp.where(
        xf() >= kth, jnp.exp(xf() - row_max), 0.0
    ).astype(jnp.bfloat16)

    def ef():
        return e.astype(jnp.float32)

    denom = jnp.sum(ef(), axis=-1, keepdims=True)
    emax = jnp.max(ef(), axis=-1, keepdims=True)
    tp = jnp.minimum(p_ref[...], 1.0)
    target = tp * denom

    prep_e = ef if _BIND_PROMO else (lambda: None)

    def mass_ok(ctx, t):
        if ctx is not None:  # bind mode: one shared promotion
            mass = jnp.sum(
                jnp.where(ctx >= t, ctx, 0.0), axis=-1, keepdims=True
            )
        else:  # stream mode: promote inside the reduction (never bind a
            # large f32 image to a name — the round-2 Mosaic spill trap)
            mass = jnp.sum(
                jnp.where(ef() >= t, ef(), 0.0), axis=-1, keepdims=True
            )
        return mass >= target

    tau_ref[...] = _search(prep_e, mass_ok, jnp.zeros_like(emax), emax,
                           arity)


# row tile: Mosaic requires the sublane block dim divisible by 8, so 8 is
# the floor; with the streaming f32 promotion only ~0.6 MB/row stays live
# (bf16 x + bf16 e), i.e. ~5 MB at RT=8.
_ROW_TILE = 8


def topk_topp_thresholds_pallas(
    logits_bf16: jax.Array,  # [R, V] bf16 (the comparison image)
    top_k: jax.Array,        # [R] int32, 0 => disabled
    top_p: jax.Array,        # [R] f32, 1.0 => disabled
    row_tile: int | None = None,
    arity: int | None = None,  # None => the configured search arity
    row_min: jax.Array | None = None,  # [R] f32 external lower bound
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Returns (kth [R], tau_u [R], row_max [R]) f32 — the top-k logit
    threshold, the top-p unnormalized-exp threshold (both ties-inclusive
    conservative), and the row max used for the exp image. `arity`
    resolves to sampling.search_arity() OUTSIDE the jit so direct
    callers (micro benches) match the engine's configured search."""
    if arity is None:
        arity = _sampling.search_arity()
    return _topk_topp_thresholds_pallas_jit(
        logits_bf16, top_k, top_p, row_tile=row_tile, arity=arity,
        row_min=row_min,
    )


@functools.partial(jax.jit, static_argnames=("row_tile", "arity"))
def _topk_topp_thresholds_pallas_jit(
    logits_bf16, top_k, top_p, row_tile=None, arity=2, row_min=None,
):
    R, V = logits_bf16.shape
    RT = min(row_tile or _ROW_TILE, R)
    pad = (-R) % RT
    if pad:
        logits_bf16 = jnp.pad(logits_bf16, ((0, pad), (0, 0)))
        top_k = jnp.pad(top_k, ((0, pad),))
        top_p = jnp.pad(top_p, ((0, pad),), constant_values=1.0)
    RP = R + pad
    grid = RP // RT

    in_specs = [
        pl.BlockSpec((RT, V), lambda i: (i, 0)),
        pl.BlockSpec((RT, 1), lambda i: (i, 0)),
        pl.BlockSpec((RT, 1), lambda i: (i, 0)),
    ]
    operands = [
        logits_bf16,
        top_k.reshape(RP, 1).astype(jnp.int32),
        top_p.reshape(RP, 1).astype(jnp.float32),
    ]
    if row_min is not None:
        if pad:
            row_min = jnp.pad(row_min, ((0, pad),))
        in_specs.append(pl.BlockSpec((RT, 1), lambda i: (i, 0)))
        operands.append(row_min.reshape(RP, 1).astype(jnp.float32))

    kth, tau, mx = pl.pallas_call(
        functools.partial(_thresholds_kernel, arity=arity,
                          ext_rowmin=row_min is not None),
        grid=(grid,),
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec((RT, 1), lambda i: (i, 0)),
            pl.BlockSpec((RT, 1), lambda i: (i, 0)),
            pl.BlockSpec((RT, 1), lambda i: (i, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((RP, 1), jnp.float32),
            jax.ShapeDtypeStruct((RP, 1), jnp.float32),
            jax.ShapeDtypeStruct((RP, 1), jnp.float32),
        ],
    )(*operands)
    return kth[:R, 0], tau[:R, 0], mx[:R, 0]
