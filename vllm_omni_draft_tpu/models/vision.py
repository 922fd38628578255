"""Vision encoder for multimodal (image-token) prefill.

Qwen2-VL-style ViT: conv patch embedding (14x14), full self-attention
blocks with 2-D rotary position embeddings, and a 2x2 spatial patch
merger projecting into the language model's hidden size. Image embeddings
are spliced into prefill at image-placeholder token positions — encoder
inputs are scheduled separately from decode tokens (reference capability:
`src/doc/engine_core.md:297-298`; the qwen_image multimodal path of
BASELINE.json ladder config 4).

The draft model never sees images (verify-side embeds only, SURVEY.md §7
item 8): draft KV for image positions is built from the placeholder token
embeddings, which is exactly the lossless-spec-safe choice — the target
defines the output distribution; the draft is only a proposer.
"""

from __future__ import annotations

import math
from dataclasses import dataclass

import jax
import jax.numpy as jnp

from vllm_omni_draft_tpu.ops.layers import rms_norm

IMAGE_PAD_TOKEN_ID = 151655  # qwen2-vl <|image_pad|>


@dataclass
class VisionConfig:
    patch_size: int = 14
    merge_size: int = 2          # 2x2 patch merging into one LLM token
    in_channels: int = 3
    hidden_size: int = 1280
    depth: int = 4
    num_heads: int = 16
    out_hidden_size: int = 3584  # language-model hidden size
    dtype: str = "float32"
    seed: int = 0

    @property
    def head_dim(self) -> int:
        return self.hidden_size // self.num_heads


def _dt(cfg):
    return {"bfloat16": jnp.bfloat16, "float32": jnp.float32}[cfg.dtype]


def init_params(cfg: VisionConfig, key=None) -> dict:
    key = key if key is not None else jax.random.PRNGKey(cfg.seed)
    dt = _dt(cfg)
    D = cfg.hidden_size
    P = cfg.patch_size
    F = D * 4
    L = cfg.depth
    M = cfg.merge_size
    ks = iter(jax.random.split(key, 12))

    def w(shape, fan_in):
        return (
            jax.random.normal(next(ks), shape, jnp.float32) / math.sqrt(fan_in)
        ).astype(dt)

    return {
        "patch_embed": {"w": w((D, cfg.in_channels * P * P), cfg.in_channels * P * P)},
        "layers": {
            "ln1": jnp.ones((L, D), dt),
            "qkv": {"w": w((L, 3 * D, D), D), "b": jnp.zeros((L, 3 * D), dt)},
            "proj": {"w": w((L, D, D), D)},
            "ln2": jnp.ones((L, D), dt),
            "up": {"w": w((L, F, D), D)},
            "down": {"w": w((L, D, F), F)},
        },
        "merger": {
            "ln": jnp.ones((D,), dt),
            "w1": w((D * M * M, D * M * M), D * M * M),
            "w2": w((cfg.out_hidden_size, D * M * M), D * M * M),
        },
    }


def _rot2d(cfg: VisionConfig, hp: int, wp: int):
    """2-D rotary embedding: half the head dim rotates with row index,
    half with column index (qwen2-vl style)."""
    Dh = cfg.head_dim
    quarter = Dh // 4
    inv = 1.0 / (10000.0 ** (jnp.arange(quarter, dtype=jnp.float32) / quarter))
    rows = jnp.arange(hp, dtype=jnp.float32)
    cols = jnp.arange(wp, dtype=jnp.float32)
    fr = jnp.outer(rows, inv)  # [hp, quarter]
    fc = jnp.outer(cols, inv)  # [wp, quarter]
    fr = jnp.broadcast_to(fr[:, None, :], (hp, wp, quarter)).reshape(hp * wp, quarter)
    fc = jnp.broadcast_to(fc[None, :, :], (hp, wp, quarter)).reshape(hp * wp, quarter)
    freqs = jnp.concatenate([fr, fc], axis=-1)  # [N, Dh//2]
    emb = jnp.concatenate([freqs, freqs], axis=-1)  # [N, Dh]
    return jnp.cos(emb), jnp.sin(emb)


def make_encoder(cfg: VisionConfig):
    """encode(params, pixels [1, C, H, W]) -> [N_merged, out_hidden] where
    N_merged = (H/P/M) * (W/P/M). One image per call; shapes bucket by
    image size (the processor pads/resizes to a bucket)."""
    D, P, M = cfg.hidden_size, cfg.patch_size, cfg.merge_size
    H_heads, Dh = cfg.num_heads, cfg.head_dim
    dt = _dt(cfg)
    eps = 1e-6

    def rotate_half(x):
        a, b = jnp.split(x, 2, axis=-1)
        return jnp.concatenate([-b, a], axis=-1)

    def layer_fn(carry, lp):
        x, cos, sin = carry
        N = x.shape[0]
        h = rms_norm(x, lp["ln1"], eps)
        qkv = h @ lp["qkv"]["w"].T.astype(dt) + lp["qkv"]["b"]
        q, k, v = jnp.split(qkv, 3, axis=-1)
        q = q.reshape(N, H_heads, Dh).astype(jnp.float32)
        k = k.reshape(N, H_heads, Dh).astype(jnp.float32)
        v = v.reshape(N, H_heads, Dh).astype(jnp.float32)
        q = q * cos[:, None, :] + rotate_half(q) * sin[:, None, :]
        k = k * cos[:, None, :] + rotate_half(k) * sin[:, None, :]
        att = jax.nn.softmax(
            jnp.einsum("nhd,mhd->hnm", q, k) / math.sqrt(Dh), axis=-1
        )
        o = jnp.einsum("hnm,mhd->nhd", att, v).reshape(N, D).astype(dt)
        x = x + o @ lp["proj"]["w"].T.astype(dt)
        h = rms_norm(x, lp["ln2"], eps)
        x = x + jax.nn.gelu(h @ lp["up"]["w"].T.astype(dt)) @ lp["down"]["w"].T.astype(dt)
        return (x, cos, sin), None

    def encode(params, pixels):
        _, C, H, W = pixels.shape
        hp, wp = H // P, W // P
        patches = pixels.reshape(1, C, hp, P, wp, P)
        patches = patches.transpose(0, 2, 4, 1, 3, 5).reshape(hp * wp, C * P * P)
        x = (patches.astype(dt) @ params["patch_embed"]["w"].T.astype(dt))
        cos, sin = _rot2d(cfg, hp, wp)
        (x, _, _), _ = jax.lax.scan(layer_fn, (x, cos, sin), params["layers"])
        # 2x2 merge: [hp, wp, D] -> [hp/M, wp/M, D*M*M]
        x = rms_norm(x, params["merger"]["ln"], eps)
        x = x.reshape(hp // M, M, wp // M, M, D)
        x = x.transpose(0, 2, 1, 3, 4).reshape((hp // M) * (wp // M), D * M * M)
        x = jax.nn.gelu(x @ params["merger"]["w1"].T.astype(dt))
        return x @ params["merger"]["w2"].T.astype(dt)

    return encode


class VisionEncoder:
    """Host-facing wrapper with per-shape jit cache."""

    def __init__(self, cfg: VisionConfig | None = None):
        self.cfg = cfg or VisionConfig()
        self.params = jax.jit(lambda: init_params(self.cfg))()
        self._encode = jax.jit(make_encoder(self.cfg))

    def encode(self, pixels) -> jax.Array:
        """pixels [1, 3, H, W] (H, W multiples of patch*merge) ->
        [N_tokens, out_hidden]."""
        return self._encode(self.params, jnp.asarray(pixels))

    def num_tokens(self, height: int, width: int) -> int:
        s = self.cfg.patch_size * self.cfg.merge_size
        return (height // s) * (width // s)


def build_mm_prompt(
    text_ids_before: list[int],
    num_image_tokens: int,
    text_ids_after: list[int],
    image_pad_id: int = IMAGE_PAD_TOKEN_ID,
) -> list[int]:
    """Prompt layout: text + image placeholder run + text (the processor
    contract: image tokens enter prefill as placeholders whose embeddings
    are spliced in by the runner)."""
    return list(text_ids_before) + [image_pad_id] * num_image_tokens + list(
        text_ids_after
    )
