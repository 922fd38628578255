"""Qwen2 / Qwen2.5 dense decoder in functional JAX.

TPU-first design (not a torch translation):

- parameters are a plain pytree with all layers *stacked* on a leading
  axis, and the forward pass is a `lax.scan` over layers — one compiled
  layer body instead of L unrolled ones (compile time and code size on
  TPU scale with the trace, not the model);
- the paged KV cache ([L, NUM_BLOCKS, BLOCK, Hkv, D]) is scanned
  alongside, so KV writes are part of the same fused step;
- attention is the unified position-masked paged attention
  (ops/attention.py) so decode/verify/prefill share one jitted step;
- quantized linears are dtype-dispatched dicts (ops/quant.py) that ride
  through the same scan.

Architecture (Qwen2-family): RMSNorm pre-norm, GQA with q/k/v bias,
rotary position embeddings (theta=1e6), SwiGLU MLP, optional tied
embeddings. Capability parity target: the reference serves
Qwen2.5 / Qwen2.5-VL via vLLM (reference: `src/performance_enhancement/
test_pipeline.py:20-26`; BASELINE.json ladder configs).
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

from vllm_omni_draft_tpu.config import ModelConfig
from vllm_omni_draft_tpu.models import register_model
from vllm_omni_draft_tpu.ops import quant as quant_ops
from vllm_omni_draft_tpu.ops.attention import (
    AttentionMetadata,
    attention_at_layer,
    encode_kv,
    kv_store_dim,
    resolved_attention_backend,
    write_kv_all_layers,
    write_kv_layer,
)
from vllm_omni_draft_tpu.ops.layers import (
    apply_rope_cos_sin,
    linear,
    linear_at_layer,
    rms_norm,
    rope_cos_sin,
)


def _dtype(cfg: ModelConfig):
    return {"bfloat16": jnp.bfloat16, "float32": jnp.float32, "float16": jnp.float16}[
        cfg.dtype
    ]


# ---------------------------------------------------------------------------
# Parameter initialization (random; checkpoints load via models/weights.py)
# ---------------------------------------------------------------------------


def init_params(cfg: ModelConfig, key: jax.Array | None = None) -> dict:
    """Random-init parameters in the stacked-layer layout."""
    key = key if key is not None else jax.random.PRNGKey(cfg.seed)
    dt = _dtype(cfg)
    D, F, V = cfg.hidden_size, cfg.intermediate_size, cfg.vocab_size
    Hq, Hkv, Dh = cfg.num_heads, cfg.num_kv_heads, cfg.head_dim
    L = cfg.num_layers
    ks = jax.random.split(key, 10)

    def w(k, shape, fan_in):
        return (jax.random.normal(k, shape, jnp.float32) / math.sqrt(fan_in)).astype(dt)

    params = {
        "embed": w(ks[0], (V, D), D),
        "layers": {
            "ln1": jnp.ones((L, D), dt),
            "q": {"w": w(ks[1], (L, Hq * Dh, D), D), "b": jnp.zeros((L, Hq * Dh), dt)},
            "k": {"w": w(ks[2], (L, Hkv * Dh, D), D), "b": jnp.zeros((L, Hkv * Dh), dt)},
            "v": {"w": w(ks[3], (L, Hkv * Dh, D), D), "b": jnp.zeros((L, Hkv * Dh), dt)},
            "o": {"w": w(ks[4], (L, D, Hq * Dh), Hq * Dh)},
            "ln2": jnp.ones((L, D), dt),
            "gate": {"w": w(ks[5], (L, F, D), D)},
            "up": {"w": w(ks[6], (L, F, D), D)},
            "down": {"w": w(ks[7], (L, D, F), F)},
        },
        "final_norm": jnp.ones((D,), dt),
    }
    if not cfg.tie_word_embeddings:
        params["lm_head"] = {"w": w(ks[8], (V, D), D)}
    return params


def init_params_quantized(cfg: ModelConfig, key: jax.Array | None = None) -> dict:
    """Random-init directly in quantized form (int8 / int4) — no float32
    transient, so 7B+ shapes fit in HBM during bench/profiling setup."""
    assert cfg.quantization in ("int8", "int4"), cfg.quantization
    key = key if key is not None else jax.random.PRNGKey(cfg.seed)
    dt = _dtype(cfg)
    D, F, V = cfg.hidden_size, cfg.intermediate_size, cfg.vocab_size
    Hq, Hkv, Dh = cfg.num_heads, cfg.num_kv_heads, cfg.head_dim
    L = cfg.num_layers
    G = min(cfg.quant_group_size, D)
    ks = iter(jax.random.split(key, 24))
    int4 = cfg.quantization == "int4"

    def qw(shape, fan_in):
        O, I = shape[-2], shape[-1]
        scale_mag = 1.0 / (127.0 * math.sqrt(fan_in))
        if int4:
            w = jax.random.randint(next(ks), (*shape[:-1], I // 2), 0, 256, jnp.uint8)
            g = min(G, I)
            s = jnp.full((*shape[:-2], O, I // g), 1.0 / (7.0 * math.sqrt(fan_in)),
                         jnp.float32)
        else:
            w = jax.random.randint(next(ks), shape, -127, 128, jnp.int8)
            s = jnp.full((*shape[:-2], O, 1), scale_mag, jnp.float32)
        return {"w": w, "s": s}

    def qw_head(shape, fan_in):
        return quant_ops.pad_out_rows(qw(shape, fan_in))

    params = {
        "embed": (jax.random.normal(next(ks), (V, D), dt) / math.sqrt(D)),
        "layers": {
            "ln1": jnp.ones((L, D), dt),
            "q": {**qw((L, Hq * Dh, D), D), "b": jnp.zeros((L, Hq * Dh), dt)},
            "k": {**qw((L, Hkv * Dh, D), D), "b": jnp.zeros((L, Hkv * Dh), dt)},
            "v": {**qw((L, Hkv * Dh, D), D), "b": jnp.zeros((L, Hkv * Dh), dt)},
            "o": qw((L, D, Hq * Dh), Hq * Dh),
            "ln2": jnp.ones((L, D), dt),
            "gate": qw((L, F, D), D),
            "up": qw((L, F, D), D),
            "down": qw((L, D, F), F),
        },
        "final_norm": jnp.ones((D,), dt),
    }
    if not cfg.tie_word_embeddings:
        params["lm_head"] = qw_head((V, D), D)
    return params


def init_kv_cache(
    cfg: ModelConfig, num_blocks: int, block_size: int
) -> dict:
    """Paged KV cache: {"k","v"}: [L, NUM_BLOCKS, BLOCK, Hkv, Dh].
    Block 0 is the reserved null block (padding writes land there)."""
    kv_dt = {
        "bfloat16": jnp.bfloat16,
        "float32": jnp.float32,
        "fp8": quant_ops.FP8_DTYPE,
        # the TPU-native 1-byte KV: no hw fp8 on v5e-class chips, so f8
        # converts are slow VPU bit-twiddling; int8 fixed-point converts
        # natively (ops/quant.py "INT8 KV-cache conversion")
        "int8": jnp.int8,
    }[cfg.kv_cache_dtype]
    # head_dim stored lane-padded (ops.attention.kv_store_dim) so the
    # Pallas kernel's whole-block DMAs stay tile-aligned for D=64 drafts
    shape = (
        cfg.num_layers,
        num_blocks,
        block_size,
        cfg.num_kv_heads,
        kv_store_dim(cfg.head_dim),
    )
    return {"k": jnp.zeros(shape, kv_dt), "v": jnp.zeros(shape, kv_dt)}


# ---------------------------------------------------------------------------
# Forward
# ---------------------------------------------------------------------------


def make_layer_body(cfg: ModelConfig, deferred_kv: bool = False,
                    attn_backend: str | None = None, reduce_fn=None):
    """One transformer layer as a pure function of (stacked weights,
    rope tables, attention meta, carry, layer index) — the unit both
    `make_forward`'s layer scan and the pipeline-parallel stage
    executor (parallel/pipeline.py) scan over. `lw` may hold the FULL
    [L, ...] stacks or a per-stage slice; `l` indexes into whatever
    `lw`/the carried cache hold.

    `reduce_fn` (default identity) wraps the two ROW-PARALLEL matmul
    outputs (o proj, down proj) — the shard_map TP executor
    (parallel/tp_forward.py) passes a psum so partial products combine
    before the residual add. o/down must be bias-free under a non-tri-
    vial reduce_fn (Qwen2's are; a bias would be summed tp times)."""
    Hq, Hkv, Dh = cfg.num_heads, cfg.num_kv_heads, cfg.head_dim
    if reduce_fn is None:
        reduce_fn = lambda y: y
    Dk = kv_store_dim(Dh)
    scale = 1.0 / math.sqrt(Dh)
    kv_scale = cfg.kv_scale
    eps = cfg.rms_norm_eps
    if attn_backend is None:
        attn_backend = resolved_attention_backend(cfg)

    def layer_body(lw, cos, sin, meta, carry, l):
        x, kc, vc = carry
        B, T, D = x.shape

        h = rms_norm(x, jnp.take(lw["ln1"], l, axis=0), eps)
        if "qkv" in lw:  # fused projection stack (fuse_projection_stacks)
            qkv = linear_at_layer(h, lw["qkv"], l)
            nq, nkv = Hq * Dh, Hkv * Dh
            q = qkv[..., :nq].reshape(B, T, Hq, Dh)
            k = qkv[..., nq:nq + nkv].reshape(B, T, Hkv, Dh)
            v = qkv[..., nq + nkv:].reshape(B, T, Hkv, Dh)
        else:
            q = linear_at_layer(h, lw["q"], l).reshape(B, T, Hq, Dh)
            k = linear_at_layer(h, lw["k"], l).reshape(B, T, Hkv, Dh)
            v = linear_at_layer(h, lw["v"], l).reshape(B, T, Hkv, Dh)
        q, k = apply_rope_cos_sin(q, k, cos, sin)
        if Dk != Dh:
            # lane-pad q/k/v so storage + kernel stay tile-aligned;
            # zero lanes are exact (see ops.attention.kv_store_dim)
            pad = ((0, 0), (0, 0), (0, 0), (0, Dk - Dh))
            q, k, v = jnp.pad(q, pad), jnp.pad(k, pad), jnp.pad(v, pad)
        if deferred_kv:
            k_enc, v_enc = encode_kv(k, v, kc.dtype, kv_scale)
            o = attention_at_layer(q, kc, vc, l, meta, scale,
                                   kv_scale=kv_scale,
                                   backend=attn_backend,
                                   k_new=k_enc, v_new=v_enc)[..., :Dh]
            ys = (k_enc, v_enc)
        else:
            kc, vc = write_kv_layer(kc, vc, k, v, meta.slot_mapping, l,
                                    kv_scale=kv_scale)
            o = attention_at_layer(q, kc, vc, l, meta, scale,
                                   kv_scale=kv_scale,
                                   backend=attn_backend)[..., :Dh]
            ys = None
        x = x + reduce_fn(
            linear_at_layer(o.reshape(B, T, Hq * Dh), lw["o"], l)
        )

        h = rms_norm(x, jnp.take(lw["ln2"], l, axis=0), eps)
        if "gate_up" in lw:
            gu = linear_at_layer(h, lw["gate_up"], l)
            F = gu.shape[-1] // 2
            g, u = gu[..., :F], gu[..., F:]
        else:
            g = linear_at_layer(h, lw["gate"], l)
            u = linear_at_layer(h, lw["up"], l)
        x = x + reduce_fn(
            linear_at_layer(jax.nn.silu(g) * u, lw["down"], l)
        )
        return (x, kc, vc), ys

    return layer_body


def make_forward(cfg: ModelConfig, deferred_kv: bool = False):
    """Build the pure forward fn:

      forward(params, token_ids [B,T], positions [B,T], kv_cache, meta,
              input_embeds=None) -> (hidden [B,T,D], new_kv_cache)

    `input_embeds` (if given) overrides the embedding lookup — the
    multimodal prefill path splices vision embeddings this way
    (reference capability: encoder inputs entering prefill,
    `src/doc/engine_core.md:297-298`).

    `deferred_kv=True` builds the decode-side variant: instead of a
    scatter pair per layer (2L XLA fusions/forward at ~16 us fixed cost
    each — 7.3 ms/step in the engine deep profile), each layer's new KV
    enters attention as a VMEM tail (attention_at_layer k_new/v_new) and
    the cache commit is ONE batched scatter pair over all layers after
    the scan (write_kv_all_layers). Token-identical to the immediate
    path: the tail is pre-encoded to the cache dtype, so attention sees
    exactly the values a write-then-read would. Use for short-T
    decode/verify steps only (the prefill kernel has no tail path).
    """
    Dh = cfg.head_dim
    theta = cfg.rope_theta
    eps = cfg.rms_norm_eps
    layer_body = make_layer_body(cfg, deferred_kv)

    def forward(
        params: dict,
        token_ids: jax.Array,  # [B, T] int32
        positions: jax.Array,  # [B, T] int32 (-1 padding)
        kv_cache: dict,
        meta: AttentionMetadata,
        input_embeds: jax.Array | None = None,
    ):
        if input_embeds is None:
            x = params["embed"][jnp.maximum(token_ids, 0)].astype(_dtype(cfg))
        else:
            x = input_embeds.astype(_dtype(cfg))
        cos, sin = rope_cos_sin(positions, Dh, theta)
        lw = params["layers"]  # STACKED [L, ...] leaves, closure-captured:
        # big weights are indexed INSIDE the Pallas matmul kernels
        # (linear_at_layer) — passing them as scan xs would make XLA
        # materialize a per-layer HBM copy of every weight every step.

        def layer_fn(carry, l):
            # KV cache rides in the CARRY (in-place-aliasable by XLA's
            # while loop); scan xs/ys would keep two full copies live.
            return layer_body(lw, cos, sin, meta, carry, l)

        L = lw["ln1"].shape[0]
        carry = (x, kv_cache["k"], kv_cache["v"])
        # small models (spec drafts) unroll the layer loop: while-loop
        # iteration machinery is a measurable share of their per-forward
        # latency, and at <=8 layers program size stays reasonable
        (x, new_k, new_v), ys = jax.lax.scan(
            layer_fn, carry, jnp.arange(L, dtype=jnp.int32),
            unroll=L if L <= 8 else 1,
        )
        if deferred_kv:
            # ONE scatter pair commits every layer's new KV ([L, B, T,
            # Hkv, Dk] ys are already cache-encoded by the layer body).
            # The barrier ties the cache to the scan output x (which
            # depends on every attention READ of the cache): without a
            # data dependency ordering reads before the in-place write,
            # XLA's copy-insertion resolves the WAR hazard by COPYING
            # cache regions every forward (profiled: ~12 ms/step of
            # copy/fusion pairs — more than the per-layer scatters this
            # path exists to remove).
            new_k, new_v, x = jax.lax.optimization_barrier(
                (new_k, new_v, x)
            )
            new_k, new_v = write_kv_all_layers(
                new_k, new_v, ys[0], ys[1], meta.slot_mapping
            )
        x = rms_norm(x, params["final_norm"], eps)
        return x, {"k": new_k, "v": new_v}

    return forward


def compute_logits(cfg: ModelConfig, params: dict, hidden: jax.Array) -> jax.Array:
    """hidden [N, D] -> logits [N, V] in f32 (select rows before calling —
    vLLM-style logits-index selection keeps prefill cheap). A quantized
    lm_head may carry tile-padding rows (quant_ops.pad_out_rows) — slice
    back to the real vocab so padded ids can never be sampled."""
    head = params["lm_head"] if "lm_head" in params else {"w": params["embed"]}
    logits = linear(hidden, head, out_dtype=jnp.float32)
    return logits[..., : cfg.vocab_size]


def compute_logits_stats(cfg: ModelConfig, params: dict, hidden: jax.Array):
    """Sampled-verify head: (logits [N, V] f32, row max [N], row argmax
    [N]) with the stats fused into the matmul kernel epilogue on TPU
    (ops.quant.logits_stats_matmul) — saves two full-width [N, V]
    reductions per spec iteration. Stats are over the RAW logits; the
    rejection sampler derives scaled stats exactly (f32 division is
    monotone, so max commutes; argmax is scale-invariant)."""
    head = params["lm_head"] if "lm_head" in params else {"w": params["embed"]}
    logits, mx, am = quant_ops.logits_stats_matmul(
        hidden, head, cfg.vocab_size
    )
    return logits[..., : cfg.vocab_size], mx, am


def compute_argmax(cfg: ModelConfig, params: dict, hidden: jax.Array) -> jax.Array:
    """Greedy head: argmax token ids [N] int32 without materializing the
    [N, V] f32 logits (fused matmul+argmax kernel on TPU; the pad rows of
    a tile-padded lm_head are excluded via cfg.vocab_size)."""
    head = params["lm_head"] if "lm_head" in params else {"w": params["embed"]}
    return quant_ops.argmax_matmul(hidden, head, cfg.vocab_size)


import sys as _sys  # noqa: E402

register_model("qwen2", _sys.modules[__name__])
