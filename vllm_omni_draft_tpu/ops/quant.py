"""Weight-only quantization: INT8 (per-out-channel) and INT4 (group-wise).

Capability parity with the reference's inherited quant surface
(SURVEY.md §2.4: vLLM CUDA INT8/INT4 dequant+GEMM kernels, FP8 KV) —
rebuilt TPU-native:

- checkpoint-side: `quantize_int8` / `quantize_int4` produce compact
  weights + scales,
- run-side: `matmul_int8` / `matmul_int4` are the XLA fallback paths;
  the Pallas fused dequant+matmul kernels (ops/pallas/quant_matmul.py)
  override them on TPU for the hot verify matmuls.

A linear weight is a plain dict pytree (scan/pjit friendly — no string
leaves); the variant is inferred from dtypes:

  {"w": float [O, I]}                        dense
  {"w": int8 [O, I],  "s": f32 [O, 1]}       int8 per-out-channel
  {"w": uint8 [O, I//2], "s": f32 [O, I//G]} int4 group-wise, nibble-packed

INT8: y[b,o] = sum_i x[b,i]*q[o,i]*s[o] — the scale folds *after* the
matmul, so the MXU sees a plain int8->bf16 cast matmul and XLA fuses the
cast. INT4 group scales cannot fold post-matmul; the fallback dequantizes
to bf16 first, the Pallas kernel dequantizes in-register.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp


def weight_kind(w: dict) -> str:
    if "s" not in w:
        return "dense"
    if w["w"].dtype == jnp.int8:
        return "int8"
    if w["w"].dtype == jnp.uint8:
        return "int4"
    raise ValueError(f"unrecognized quantized weight dtype {w['w'].dtype}")


# ---------------------------------------------------------------------------
# Checkpoint-side quantization
# ---------------------------------------------------------------------------


def quantize_int8(w: jax.Array) -> dict:
    """Per-out-channel symmetric INT8. w: [O, I] float."""
    wf = w.astype(jnp.float32)
    s = jnp.max(jnp.abs(wf), axis=1, keepdims=True) / 127.0  # [O, 1]
    s = jnp.maximum(s, 1e-8)
    q = jnp.clip(jnp.round(wf / s), -127, 127).astype(jnp.int8)
    return {"w": q, "s": s}


def quantize_int4(w: jax.Array, group_size: int = 128) -> dict:
    """Group-wise symmetric INT4, packed two nibbles per byte in
    SPLIT-HALF layout: byte b holds column b (low nibble) and column
    b + I/2 (high nibble). Unpacking is then a concat — layout-friendly
    on TPU (an interleaved layout would need an expensive shuffle in the
    Pallas dequant kernel). w: [O, I]; I divisible by group_size and 2."""
    O, I = w.shape
    assert I % group_size == 0 and I % 2 == 0, (O, I, group_size)
    wf = w.astype(jnp.float32).reshape(O, I // group_size, group_size)
    s = jnp.max(jnp.abs(wf), axis=-1, keepdims=True) / 7.0  # [O, G, 1]
    s = jnp.maximum(s, 1e-8)
    q = jnp.clip(jnp.round(wf / s), -8, 7).astype(jnp.int32).reshape(O, I)
    u = (q + 8).astype(jnp.uint8)  # [0, 15]
    half = I // 2
    packed = (u[:, :half] | (u[:, half:] << 4)).astype(jnp.uint8)  # [O, I//2]
    return {"w": packed, "s": s.reshape(O, I // group_size)}


def pad_out_rows(w: dict, multiple: int = 512) -> dict:
    """Pad a quantized weight's output rows to `multiple` with zero-scale
    rows (dequantized value exactly 0). Odd output counts (the 7B vocab
    151936 = 2^7*1187) otherwise force the Pallas matmul grid down to
    128-row tiles — 1187 grid steps whose fixed costs cost ~35% of the
    lm_head's bandwidth. Consumers must slice the padded columns off the
    result (compute_logits does)."""
    # dense weights pad with zero rows (logit exactly 0; argmax_matmul
    # excludes them via valid_o, compute_logits slices them off)
    O = w["w"].shape[0]
    pad = (-O) % multiple
    if pad == 0:
        return w
    out = dict(w)
    out["w"] = jnp.pad(w["w"], ((0, pad), (0, 0)))
    if "s" in w:
        out["s"] = jnp.pad(w["s"], ((0, pad), (0, 0)))
    if "b" in w:
        out["b"] = jnp.pad(w["b"], ((0, pad),))
    return out


def unpack_int4(packed: jax.Array) -> jax.Array:
    """[O, I//2] uint8 -> [O, I] int8 in [-8, 7] (split-half layout)."""
    lo = (packed & 0xF).astype(jnp.int8) - 8
    hi = (packed >> 4).astype(jnp.int8) - 8
    return jnp.concatenate([lo, hi], axis=-1)


def dequantize(w: dict, dtype=jnp.bfloat16) -> jax.Array:
    """Materialize the full-precision weight (reference/testing path)."""
    kind = weight_kind(w)
    if kind == "dense":
        return w["w"].astype(dtype)
    if kind == "int8":
        return (w["w"].astype(jnp.float32) * w["s"]).astype(dtype)
    # int4
    q = unpack_int4(w["w"]).astype(jnp.float32)  # [O, I]
    O, I = q.shape
    g = I // w["s"].shape[1]
    wf = q.reshape(O, -1, g) * w["s"][:, :, None]
    return wf.reshape(O, I).astype(dtype)


# ---------------------------------------------------------------------------
# Run-side matmuls (XLA fallback; Pallas kernels override on TPU)
# ---------------------------------------------------------------------------

# Set by ops.pallas.quant_matmul when running on TPU.
_PALLAS_INT8 = None
_PALLAS_INT4 = None
_PALLAS_INT8_L = None
_PALLAS_INT4_L = None
_PALLAS_DENSE_L = None
_PALLAS_ARGMAX_INT8 = None
_PALLAS_ARGMAX_INT4 = None
_PALLAS_ARGMAX_DENSE = None


def use_pallas_kernels(int8_fn, int4_fn=None) -> None:
    global _PALLAS_INT8, _PALLAS_INT4
    _PALLAS_INT8, _PALLAS_INT4 = int8_fn, int4_fn


def use_pallas_argmax_kernels(int8_fn, int4_fn=None, dense_fn=None) -> None:
    global _PALLAS_ARGMAX_INT8, _PALLAS_ARGMAX_INT4, _PALLAS_ARGMAX_DENSE
    _PALLAS_ARGMAX_INT8, _PALLAS_ARGMAX_INT4 = int8_fn, int4_fn
    _PALLAS_ARGMAX_DENSE = dense_fn


def use_pallas_stacked_kernels(int8_fn, int4_fn=None, dense_fn=None) -> None:
    global _PALLAS_INT8_L, _PALLAS_INT4_L, _PALLAS_DENSE_L
    _PALLAS_INT8_L, _PALLAS_INT4_L, _PALLAS_DENSE_L = int8_fn, int4_fn, dense_fn


def matmul_int8(x: jax.Array, q: jax.Array, s: jax.Array) -> jax.Array:
    """x: [..., I] bf16/f32; q: [O, I] int8; s: [O, 1] f32 -> [..., O]."""
    if _PALLAS_INT8 is not None and x.ndim == 2:
        return _PALLAS_INT8(x, q, s)
    y = x @ q.T.astype(x.dtype)
    return y * s[:, 0].astype(y.dtype)


def matmul_int4(x: jax.Array, packed: jax.Array, s: jax.Array) -> jax.Array:
    """x: [..., I]; packed: [O, I//2] uint8; s: [O, I//G] f32 -> [..., O]."""
    if _PALLAS_INT4 is not None and x.ndim == 2:
        return _PALLAS_INT4(x, packed, s)
    w = dequantize({"w": packed, "s": s}, dtype=x.dtype)
    return x @ w.T


_PALLAS_LOGITS_STATS_INT8 = None
_PALLAS_LOGITS_STATS_INT4 = None


def use_pallas_logits_stats_kernels(int8_fn, int4_fn) -> None:
    global _PALLAS_LOGITS_STATS_INT8, _PALLAS_LOGITS_STATS_INT4
    _PALLAS_LOGITS_STATS_INT8 = int8_fn
    _PALLAS_LOGITS_STATS_INT4 = int4_fn


def logits_stats_matmul(x: jax.Array, w: dict, valid_o: int):
    """Sampled-verify lm_head: (logits [.., O] f32, row max [..] f32,
    row argmax [..] int32) over the first `valid_o` output rows, with
    max/argmax fused into the matmul kernel's epilogue on TPU — the
    sampled path otherwise pays two separate full-width [B, V]
    reductions on the materialized logits. Values are bit-identical to
    computing them from the returned logits (same f32 accumulator)."""
    kind = weight_kind(w)
    if kind == "int4" and _PALLAS_LOGITS_STATS_INT4 is not None and x.ndim == 2:
        return _PALLAS_LOGITS_STATS_INT4(x, w["w"], w["s"], valid_o)
    if kind == "int8" and _PALLAS_LOGITS_STATS_INT8 is not None and x.ndim == 2:
        return _PALLAS_LOGITS_STATS_INT8(x, w["w"], w["s"], valid_o)
    if kind == "int8":
        y = matmul_int8(x, w["w"], w["s"])
    elif kind == "int4":
        y = matmul_int4(x, w["w"], w["s"])
    else:
        # mirror linear()'s rounding (product in x.dtype, THEN the f32
        # cast) so logprobs-on/off emits identical tokens on the dense
        # fallback path too (advisor r4)
        y = jax.lax.dot_general(
            x, w["w"].astype(x.dtype), (((1,), (1,)), ((), ())),
            preferred_element_type=x.dtype,
        )
    y = y.astype(jnp.float32)
    yv = y[..., :valid_o]
    return y, jnp.max(yv, axis=-1), jnp.argmax(yv, axis=-1).astype(jnp.int32)


def argmax_matmul(x: jax.Array, w: dict, valid_o: int) -> jax.Array:
    """Greedy lm_head: argmax over the first `valid_o` output rows of
    x @ W^T, [B, I] -> [B] int32 — fused into the quantized-matmul kernel
    on TPU so the [B, V] f32 logits never reach HBM. The XLA fallback
    materializes logits (CPU tests + sampled paths do that anyway)."""
    kind = weight_kind(w)
    if kind == "int8" and _PALLAS_ARGMAX_INT8 is not None and x.ndim == 2:
        return _PALLAS_ARGMAX_INT8(x, w["w"], w["s"], valid_o)
    if kind == "int4" and _PALLAS_ARGMAX_INT4 is not None and x.ndim == 2:
        return _PALLAS_ARGMAX_INT4(x, w["w"], w["s"], valid_o)
    if (
        kind == "dense"
        and _PALLAS_ARGMAX_DENSE is not None
        and x.ndim == 2
        and w["w"].shape[0] <= 65536
    ):
        # big dense heads (the 152k full-vocab draft head) run FASTER as
        # XLA's own matmul+iota-reduce fusion (~0.36 ms, near DMA-bound)
        # than the Pallas kernel (measured 2930 -> 2547 tok/s regression);
        # the kernel wins for small/pruned heads where fixed costs dominate
        return _PALLAS_ARGMAX_DENSE(x, w["w"], valid_o)
    if kind == "int8":
        y = matmul_int8(x, w["w"], w["s"])
    elif kind == "int4":
        y = matmul_int4(x, w["w"], w["s"])
    else:
        y = jax.lax.dot_general(
            x, w["w"].astype(x.dtype), (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
    return jnp.argmax(y[..., :valid_o].astype(jnp.float32), axis=-1).astype(
        jnp.int32
    )


# ---------------------------------------------------------------------------
# Layer-indexed matmuls over STACKED weights [L, O, ...] — the layer-scan
# hot path. The Pallas kernels stream layer `layer`'s tiles straight from
# the stacked HBM array (scalar-prefetched index map); the XLA fallback
# dynamic-slices the layer out first (fine on CPU, a full extra weight
# read+write per layer per step on TPU — which is why the kernels exist).
# ---------------------------------------------------------------------------


def matmul_int8_at_layer(
    x: jax.Array, q: jax.Array, s: jax.Array, layer: jax.Array
) -> jax.Array:
    """x: [B, I]; q: [L, O, I] int8; s: [L, O, 1] f32; layer scalar."""
    if _PALLAS_INT8_L is not None:
        return _PALLAS_INT8_L(x, q, s, layer)
    return matmul_int8(x, jnp.take(q, layer, 0), jnp.take(s, layer, 0))


def matmul_int4_at_layer(
    x: jax.Array, packed: jax.Array, s: jax.Array, layer: jax.Array
) -> jax.Array:
    """x: [B, I]; packed: [L, O, I//2] uint8; s: [L, O, I//G] f32."""
    if _PALLAS_INT4_L is not None:
        return _PALLAS_INT4_L(x, packed, s, layer)
    return matmul_int4(x, jnp.take(packed, layer, 0), jnp.take(s, layer, 0))


def matmul_dense_at_layer(
    x: jax.Array, w: jax.Array, layer: jax.Array
) -> jax.Array:
    """x: [B, I]; w: [L, O, I] float."""
    if _PALLAS_DENSE_L is not None:
        return _PALLAS_DENSE_L(x, w, layer)
    return x @ jnp.take(w, layer, 0).T.astype(x.dtype)


# ---------------------------------------------------------------------------
# FP8 KV-cache conversion
# ---------------------------------------------------------------------------

FP8_DTYPE = jnp.float8_e4m3fn
FP8_MAX = 448.0


def kv_to_fp8(kv: jax.Array, scale: float = 1.0) -> jax.Array:
    """Cast KV to fp8 e4m3 with clipping. `scale` is a static per-model
    scale (K/V values post-RMSNorm are O(1); e4m3 range is ±448).

    NaN handling: the bit-placement dequant (kv_from_fp8 and the Pallas
    attention kernels) maps the e4m3fn NaN codes to finite ±480*scale, so
    a NaN activation entering the KV cache would be silently laundered
    into a large finite value. VOT_DEBUG_NAN=1 raises at the encode
    boundary instead (debug mode; adds one reduction per KV write)."""
    x = kv.astype(jnp.float32) * (1.0 / scale)
    if os.environ.get("VOT_DEBUG_NAN") == "1":
        def _raise_on_nan(has_nan):
            if has_nan:
                raise FloatingPointError(
                    "NaN activation entering the fp8 KV cache (upstream bug; "
                    "the bit-placement dequant would launder it to ±480*scale)"
                )

        jax.debug.callback(_raise_on_nan, jnp.isnan(x).any())
    return jnp.clip(x, -FP8_MAX, FP8_MAX).astype(FP8_DTYPE)


def kv_from_fp8(kv: jax.Array, scale: float, dtype=jnp.bfloat16) -> jax.Array:
    """Dequantize e4m3fn via integer bit placement instead of `astype` —
    v5e-class VPUs have no fp8 cast path, so astype lowers to a multi-op
    software cast (measured 42% end-to-end loss on the fp8-KV bench before
    the kernels switched to this trick; the XLA fallback paths here get
    the same treatment). Sign -> bit 31, exp+mantissa -> bits 26..20, read
    under f32's exponent bias; the 2^120 bias ratio folds into the scale
    multiply. Exact for every NORMAL e4m3fn code
    (tests/test_pallas.py::test_fp8_bit_placement_dequant_exact); the 14
    SUBNORMAL codes (|v| <= 0.0137*scale) flush to +/-0 on real TPU VPUs
    (denormal flush, confirmed by scripts/fp8_subnormal_probe.py) — an
    accepted error below the format's smallest normal step."""
    u = jax.lax.bitcast_convert_type(kv, jnp.uint8).astype(jnp.uint32)
    bits = ((u & 0x80) << 24) | ((u & 0x7F) << 20)
    f = jax.lax.bitcast_convert_type(bits, jnp.float32)
    return (f * (scale * 2.0 ** 120)).astype(dtype)


# ---------------------------------------------------------------------------
# INT8 KV-cache conversion — the TPU-NATIVE 1-byte KV format. v5e-class
# chips have no hardware fp8: f8->f32 converts lower to VPU bit-twiddling
# that measured 4.6x slower verify attention (0.75 vs 0.16 ms/layer-call)
# than bf16 KV. int8<->f32 converts are native, so symmetric fixed-point
# (global amax, like the fp8 path's global scale) gives the same 2x KV
# bandwidth/footprint saving at near-bf16 attention speed.
# ---------------------------------------------------------------------------

KV8_AMAX = 8.0  # representable |value| at kv_scale=1 (k/v are O(1) post-norm)


def kv8_dequant_factor(scale: float = 1.0) -> float:
    return KV8_AMAX * scale / 127.0


def kv_to_int8(kv: jax.Array, scale: float = 1.0) -> jax.Array:
    x = kv.astype(jnp.float32) * (127.0 / (KV8_AMAX * scale))
    return jnp.clip(jnp.round(x), -127.0, 127.0).astype(jnp.int8)


def kv_from_int8(kv: jax.Array, scale: float = 1.0, dtype=jnp.bfloat16) -> jax.Array:
    return (kv.astype(jnp.float32) * kv8_dequant_factor(scale)).astype(dtype)
