"""Elementary model ops: RMSNorm, RoPE, SiLU-MLP helpers, linear dispatch.

Pure-functional JAX; everything here is shape-static and fuses under XLA.
Quantized linears dispatch to the Pallas fused dequant+matmul kernels when
on TPU (ops/quant.py), with a jnp dequant fallback elsewhere.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from vllm_omni_draft_tpu.ops import quant as quant_ops


def rms_norm(x: jax.Array, weight: jax.Array, eps: float) -> jax.Array:
    """RMSNorm in float32 accumulation, cast back to input dtype."""
    dtype = x.dtype
    xf = x.astype(jnp.float32)
    var = jnp.mean(xf * xf, axis=-1, keepdims=True)
    out = xf * jax.lax.rsqrt(var + eps)
    return (out * weight.astype(jnp.float32)).astype(dtype)


def precompute_rope(
    head_dim: int, max_len: int, theta: float, dtype=jnp.float32
) -> jax.Array:
    """Rotary cos/sin cache: [max_len, head_dim] where the first half is cos
    duplicated and second half sin duplicated (HF 'rotate_half' layout)."""
    inv_freq = 1.0 / (
        theta ** (jnp.arange(0, head_dim, 2, dtype=jnp.float32) / head_dim)
    )
    t = jnp.arange(max_len, dtype=jnp.float32)
    freqs = jnp.outer(t, inv_freq)  # [max_len, head_dim//2]
    emb = jnp.concatenate([freqs, freqs], axis=-1)
    return jnp.stack([jnp.cos(emb), jnp.sin(emb)], axis=0).astype(dtype)
    # shape [2, max_len, head_dim]


def rope_cos_sin(
    positions: jax.Array,  # [..., T] int32 (-1 padding is clipped to 0)
    head_dim: int,
    theta: float,
) -> tuple[jax.Array, jax.Array]:
    """On-the-fly rotary cos/sin at absolute positions: two [..., T, D]
    arrays in the 'rotate_half' duplicated layout. Cheap enough to compute
    in-trace every step; avoids a [max_len, D] table + gather."""
    inv_freq = 1.0 / (
        theta ** (jnp.arange(0, head_dim, 2, dtype=jnp.float32) / head_dim)
    )
    pos = jnp.maximum(positions, 0).astype(jnp.float32)
    freqs = pos[..., None] * inv_freq  # [..., T, D//2]
    emb = jnp.concatenate([freqs, freqs], axis=-1)
    return jnp.cos(emb), jnp.sin(emb)


def rotate_half(x: jax.Array) -> jax.Array:
    x1, x2 = jnp.split(x, 2, axis=-1)
    return jnp.concatenate([-x2, x1], axis=-1)


def apply_rope_cos_sin(
    q: jax.Array,  # [..., T, H, D]
    k: jax.Array,  # [..., T, Hkv, D]
    cos: jax.Array,  # [..., T, D]
    sin: jax.Array,
) -> tuple[jax.Array, jax.Array]:
    cos = cos[..., None, :]  # broadcast over heads
    sin = sin[..., None, :]
    qf, kf = q.astype(jnp.float32), k.astype(jnp.float32)
    q_out = qf * cos + rotate_half(qf) * sin
    k_out = kf * cos + rotate_half(kf) * sin
    return q_out.astype(q.dtype), k_out.astype(k.dtype)


def apply_rope(
    q: jax.Array,  # [..., T, H, D]
    k: jax.Array,  # [..., T, Hkv, D]
    positions: jax.Array,  # [..., T] int32
    rope_cache: jax.Array,  # [2, max_len, D]
) -> tuple[jax.Array, jax.Array]:
    """Apply rotary embeddings at absolute `positions` (clipped at 0 so that
    -1 padding rows are harmless)."""
    pos = jnp.maximum(positions, 0)
    cos = rope_cache[0][pos][..., None, :]  # [..., T, 1, D]
    sin = rope_cache[1][pos][..., None, :]

    def rot(x):
        x1, x2 = jnp.split(x, 2, axis=-1)
        return jnp.concatenate([-x2, x1], axis=-1)

    qf = q.astype(jnp.float32)
    kf = k.astype(jnp.float32)
    q_out = qf * cos + rot(qf) * sin
    k_out = kf * cos + rot(kf) * sin
    return q_out.astype(q.dtype), k_out.astype(k.dtype)


def linear(x: jax.Array, w, out_dtype=None) -> jax.Array:
    """y = x @ W^T (+ b). `w` is a dict:
      {"w": [O, I]}                                  unquantized
      {"w": int8 [O, I], "s": [O, 1]}                int8 per-channel
      {"w": int8-packed [O, I//2], "s": [O, I//G]}   int4 group-wise
    plus optional {"b": [O]}.
    """
    out_dtype = out_dtype or x.dtype
    kind = quant_ops.weight_kind(w)
    if kind == "dense":
        y = x @ w["w"].T.astype(x.dtype)
    else:
        # flatten leading dims: the Pallas fused dequant kernels take 2-D
        # activations (and the XLA fallback is shape-agnostic)
        lead = x.shape[:-1]
        x2 = x.reshape(-1, x.shape[-1])
        if kind == "int8":
            y = quant_ops.matmul_int8(x2, w["w"], w["s"])
        elif kind == "int4":
            y = quant_ops.matmul_int4(x2, w["w"], w["s"])
        else:
            raise ValueError(f"unknown linear kind {kind!r}")
        y = y.reshape(*lead, -1)
    if "b" in w:
        y = y + w["b"].astype(y.dtype)
    return y.astype(out_dtype)


def linear_at_layer(x: jax.Array, w, layer: jax.Array, out_dtype=None) -> jax.Array:
    """y = x @ W[layer]^T (+ b[layer]) over a STACKED weight dict
    ({"w": [L, O, I], ...} — the layer-scan layout). On TPU the Pallas
    kernels index the layer inside their DMAs, so the stacked array is
    never sliced in HBM (a dynamic-slice copy of every weight per layer
    per step would double weight traffic — measured ~60% of the decode
    step at 7B INT8)."""
    out_dtype = out_dtype or x.dtype
    kind = quant_ops.weight_kind(w)
    lead = x.shape[:-1]
    x2 = x.reshape(-1, x.shape[-1])
    if kind == "dense":
        y = quant_ops.matmul_dense_at_layer(x2, w["w"], layer)
    elif kind == "int8":
        y = quant_ops.matmul_int8_at_layer(x2, w["w"], w["s"], layer)
    elif kind == "int4":
        y = quant_ops.matmul_int4_at_layer(x2, w["w"], w["s"], layer)
    else:
        raise ValueError(f"unknown linear kind {kind!r}")
    y = y.reshape(*lead, -1)
    if "b" in w:
        y = y + jnp.take(w["b"], layer, axis=0).astype(y.dtype)
    return y.astype(out_dtype)


def silu_mlp(x: jax.Array, gate, up, down) -> jax.Array:
    """SwiGLU MLP: down(silu(gate(x)) * up(x))."""
    g = linear(x, gate)
    u = linear(x, up)
    return linear(jax.nn.silu(g) * u, down)
