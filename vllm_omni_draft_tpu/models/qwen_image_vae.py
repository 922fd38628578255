"""Qwen-Image VAE — the `AutoencoderKLQwenImage` architecture the
reference loads next to the DiT (`/root/reference/src/qwen_image/
runner_adapter.py:14-16`; decode per output_mode at `:144-160`, encode
of input images via the processor at `processor.py:64-92`).

The public diffusers class is a Wan-2.1-style CAUSAL 3D VAE: causal
temporal convolutions (video-capable; images are F=1 video), per-channel
RMS norms, [1, 2, 4, 4] channel multipliers with temporal downsampling
on the last two stages, a mid block with one single-head spatial
attention, and 16 latent channels with per-channel latents_mean/std
normalization. This module is the TPU-native functional form:

* all convs run as `lax.conv_general_dilated` over NCDHW with explicit
  LEFT-ONLY time padding (causality);
* the whole decode/encode compiles to one XLA program per shape —
  there is no frame-streaming cache since serving decodes whole
  latents at once (the reference's single-image path);
* parameter names follow the public diffusers module tree
  (encoder.down_blocks.{i}.*, mid_block.resnets/attentions, quant_conv,
  ...) so a real checkpoint loads; the name registry lives in
  models/diffusers_io.py. Name fidelity is best-effort public
  knowledge validated by local round-trip (this container has no
  egress to fetch the real checkpoint — same honesty stance as the
  dual-stream DiT).
"""

from __future__ import annotations

import math
from dataclasses import dataclass

import jax
import jax.numpy as jnp


@dataclass
class QwenImageVAEConfig:
    """Mirrors the diffusers AutoencoderKLQwenImage config keys (the
    `temperal_downsample` spelling is the public config's own)."""

    base_dim: int = 96
    z_dim: int = 16
    dim_mult: tuple = (1, 2, 4, 4)
    num_res_blocks: int = 2
    attn_scales: tuple = ()
    temperal_downsample: tuple = (False, True, True)
    latents_mean: tuple | None = None
    latents_std: tuple | None = None
    dtype: str = "float32"
    seed: int = 0


def _dt(cfg):
    return {"bfloat16": jnp.bfloat16, "float32": jnp.float32}[cfg.dtype]


# ---------------------------------------------------------------------------
# functional building blocks (params are plain dicts; names mirror the
# diffusers modules so diffusers_io can serialize them 1:1)
# ---------------------------------------------------------------------------


def _causal_conv3d(x, p, stride=(1, 1, 1)):
    """x [B, C, F, H, W]; weight [O, I, kt, kh, kw]; causal in time
    (left-pad kt-1), SAME in space."""
    w, b = p["weight"], p.get("bias")
    kt, kh, kw = w.shape[2:]
    x = jnp.pad(
        x,
        (
            (0, 0), (0, 0), (kt - 1, 0),
            ((kh - 1) // 2, kh // 2), ((kw - 1) // 2, kw // 2),
        ),
    )
    out = jax.lax.conv_general_dilated(
        x, w, window_strides=stride, padding="VALID",
        dimension_numbers=("NCDHW", "OIDHW", "NCDHW"),
    )
    if b is not None:
        out = out + b[None, :, None, None, None]
    return out


def _rms_norm(x, p):
    """Per-channel RMS norm over C (diffusers QwenImageRMS_norm: gamma
    scale, image mode)."""
    var = jnp.mean(
        jnp.square(x.astype(jnp.float32)), axis=1, keepdims=True
    )
    n = x.astype(jnp.float32) * jax.lax.rsqrt(var + 1e-12)
    return (n * p["gamma"][None, :, None, None, None]).astype(x.dtype)


def _resblock(x, p):
    h = _causal_conv3d(jax.nn.silu(_rms_norm(x, p["norm1"])), p["conv1"])
    h = _causal_conv3d(jax.nn.silu(_rms_norm(h, p["norm2"])), p["conv2"])
    if "conv_shortcut" in p:
        x = _causal_conv3d(x, p["conv_shortcut"])
    return x + h


def _attention(x, p):
    """Single-head spatial self-attention per frame (mid block)."""
    B, C, F, H, W = x.shape
    h = _rms_norm(x, p["norm"])
    # [B*F, HW, C]
    h2 = h.transpose(0, 2, 3, 4, 1).reshape(B * F, H * W, C)
    qkv = h2 @ p["to_qkv"]["weight"].T + p["to_qkv"]["bias"]
    q, k, v = jnp.split(qkv, 3, axis=-1)
    att = jax.nn.softmax(
        (q @ k.transpose(0, 2, 1)) / math.sqrt(C), axis=-1
    )
    o = att @ v
    o = o @ p["proj"]["weight"].T + p["proj"]["bias"]
    o = o.reshape(B, F, H, W, C).transpose(0, 4, 1, 2, 3)
    return x + o


def _downsample(x, p, temporal):
    # spatial stride-2 conv (zero-pad right/bottom; diffusers Resample is
    # nn.Sequential(pad/upsample, conv) so the conv serializes as
    # `resample.1`)
    x = jnp.pad(x, ((0, 0), (0, 0), (0, 0), (0, 1), (0, 1)))
    w, b = p["resample"]["1"]["weight"], p["resample"]["1"]["bias"]
    out = jax.lax.conv_general_dilated(
        x, w[:, :, None], window_strides=(1, 2, 2), padding="VALID",
        dimension_numbers=("NCDHW", "OIDHW", "NCDHW"),
    )
    out = out + b[None, :, None, None, None]
    if temporal:
        out = _causal_conv3d(out, p["time_conv"], stride=(2, 1, 1))
    return out


def _upsample(x, p, temporal):
    if temporal:
        # double frames with the time conv (2x out channels, interleave)
        B, C, F, H, W = x.shape
        t = _causal_conv3d(x, p["time_conv"])  # [B, 2C, F, H, W]
        t = t.reshape(B, 2, C, F, H, W).transpose(0, 2, 3, 1, 4, 5)
        x = t.reshape(B, C, 2 * F, H, W)
    B, C, F, H, W = x.shape
    x = jax.image.resize(x, (B, C, F, 2 * H, 2 * W), "nearest")
    w, b = p["resample"]["1"]["weight"], p["resample"]["1"]["bias"]
    out = jax.lax.conv_general_dilated(
        x, w[:, :, None], window_strides=(1, 1, 1), padding=((0, 0), (1, 1), (1, 1)),
        dimension_numbers=("NCDHW", "OIDHW", "NCDHW"),
    )
    return out + b[None, :, None, None, None]


# ---------------------------------------------------------------------------
# parameter construction (module tree == diffusers names)
# ---------------------------------------------------------------------------


def init_params(cfg: QwenImageVAEConfig, key=None) -> dict:
    key = key if key is not None else jax.random.PRNGKey(cfg.seed)
    dt = _dt(cfg)
    ks = [0]

    def nk():
        ks[0] += 1
        return jax.random.fold_in(key, ks[0])

    def conv(o, i, kt=3, kh=3, kw=3):
        fan = i * kt * kh * kw
        return {
            "weight": (jax.random.normal(nk(), (o, i, kt, kh, kw))
                       / math.sqrt(fan)).astype(dt),
            "bias": jnp.zeros((o,), dt),
        }

    def conv2d(o, i, k=3):
        fan = i * k * k
        return {
            "weight": (jax.random.normal(nk(), (o, i, k, k))
                       / math.sqrt(fan)).astype(dt),
            "bias": jnp.zeros((o,), dt),
        }

    def lin(o, i):
        return {
            "weight": (jax.random.normal(nk(), (o, i))
                       / math.sqrt(i)).astype(dt),
            "bias": jnp.zeros((o,), dt),
        }

    def norm(c):
        return {"gamma": jnp.ones((c,), dt)}

    def resblock(i, o):
        p = {"norm1": norm(i), "conv1": conv(o, i),
             "norm2": norm(o), "conv2": conv(o, o)}
        if i != o:
            p["conv_shortcut"] = conv(o, i, 1, 1, 1)
        return p

    def attn(c):
        return {"norm": norm(c), "to_qkv": lin(3 * c, c), "proj": lin(c, c)}

    dims = [cfg.base_dim * m for m in cfg.dim_mult]

    # encoder
    enc_blocks = []
    in_c = dims[0]
    for si, d in enumerate(dims):
        for _ in range(cfg.num_res_blocks):
            enc_blocks.append(resblock(in_c, d))
            in_c = d
        if si < len(dims) - 1:
            temporal = cfg.temperal_downsample[si] \
                if si < len(cfg.temperal_downsample) else False
            blk = {"resample": {"1": conv2d(d, d)}}
            if temporal:
                blk["time_conv"] = conv(d, d, 3, 1, 1)
            enc_blocks.append(blk)
    encoder = {
        "conv_in": conv(dims[0], 3),
        "down_blocks": {str(i): b for i, b in enumerate(enc_blocks)},
        "mid_block": {
            "resnets": {"0": resblock(dims[-1], dims[-1]),
                        "1": resblock(dims[-1], dims[-1])},
            "attentions": {"0": attn(dims[-1])},
        },
        "norm_out": norm(dims[-1]),
        "conv_out": conv(2 * cfg.z_dim, dims[-1]),
    }

    # decoder (reversed dims)
    rdims = list(reversed(dims))
    dec_blocks = []
    in_c = rdims[0]
    for si, d in enumerate(rdims):
        for _ in range(cfg.num_res_blocks + 1):
            dec_blocks.append(resblock(in_c, d))
            in_c = d
        if si < len(rdims) - 1:
            temporal = cfg.temperal_downsample[len(rdims) - 2 - si] \
                if (len(rdims) - 2 - si) < len(cfg.temperal_downsample) \
                else False
            blk = {"resample": {"1": conv2d(rdims[si + 1], d)}}
            if temporal:
                blk["time_conv"] = conv(2 * d, d, 3, 1, 1)
            dec_blocks.append(blk)
            in_c = rdims[si + 1]
    decoder = {
        "conv_in": conv(rdims[0], cfg.z_dim),
        "mid_block": {
            "resnets": {"0": resblock(rdims[0], rdims[0]),
                        "1": resblock(rdims[0], rdims[0])},
            "attentions": {"0": attn(rdims[0])},
        },
        "up_blocks": {str(i): b for i, b in enumerate(dec_blocks)},
        "norm_out": norm(dims[0]),
        "conv_out": conv(3, dims[0]),
    }

    return {
        "encoder": encoder,
        "decoder": decoder,
        "quant_conv": conv(2 * cfg.z_dim, 2 * cfg.z_dim, 1, 1, 1),
        "post_quant_conv": conv(cfg.z_dim, cfg.z_dim, 1, 1, 1),
    }


# ---------------------------------------------------------------------------
# forward
# ---------------------------------------------------------------------------


def _run_blocks(x, blocks: dict, downs: bool, cfg):
    """Apply the flat (res|resample) block list in index order."""
    for i in range(len(blocks)):
        p = blocks[str(i)]
        if "resample" in p:
            temporal = "time_conv" in p
            x = (_downsample if downs else _upsample)(x, p, temporal)
        else:
            x = _resblock(x, p)
    return x


def encode(params, cfg: QwenImageVAEConfig, images) -> jax.Array:
    """images [B, 3, H, W] (single frame) -> latent mean [B, z, H/8, W/8]
    normalized by latents_mean/std when configured."""
    x = images[:, :, None]  # F=1
    e = params["encoder"]
    h = _causal_conv3d(x, e["conv_in"])
    h = _run_blocks(h, e["down_blocks"], True, cfg)
    m = e["mid_block"]
    h = _resblock(h, m["resnets"]["0"])
    h = _attention(h, m["attentions"]["0"])
    h = _resblock(h, m["resnets"]["1"])
    h = _causal_conv3d(jax.nn.silu(_rms_norm(h, e["norm_out"])), e["conv_out"])
    h = _causal_conv3d(h, params["quant_conv"])
    mean = h[:, : cfg.z_dim, 0]
    if cfg.latents_mean is not None:
        lm = jnp.asarray(cfg.latents_mean)[None, :, None, None]
        ls = jnp.asarray(cfg.latents_std)[None, :, None, None]
        mean = (mean - lm) / ls
    return mean


def decode(params, cfg: QwenImageVAEConfig, latents) -> jax.Array:
    """latents [B, z, h, w] -> images [B, 3, 8h, 8w] in [-1, 1]."""
    z = latents
    if cfg.latents_mean is not None:
        lm = jnp.asarray(cfg.latents_mean)[None, :, None, None]
        ls = jnp.asarray(cfg.latents_std)[None, :, None, None]
        z = z * ls + lm
    x = z[:, :, None]  # F=1
    d = params["decoder"]
    h = _causal_conv3d(x, params["post_quant_conv"])
    h = _causal_conv3d(h, d["conv_in"])
    m = d["mid_block"]
    h = _resblock(h, m["resnets"]["0"])
    h = _attention(h, m["attentions"]["0"])
    h = _resblock(h, m["resnets"]["1"])
    h = _run_blocks(h, d["up_blocks"], False, cfg)
    h = _causal_conv3d(jax.nn.silu(_rms_norm(h, d["norm_out"])), d["conv_out"])
    # raw decoder output (consumers clamp to [-1, 1]; diffusers applies
    # no output activation)
    return h[:, :, 0]


class QwenImageVAE:
    """Engine-facing wrapper (same surface as models/vae.VAE): jitted
    decode/encode over the functional forms above."""

    def __init__(self, config: QwenImageVAEConfig | None = None,
                 params: dict | None = None):
        self.config = config or QwenImageVAEConfig()
        self.params = params if params is not None else init_params(self.config)
        self._dec = jax.jit(lambda p, z: decode(p, self.config, z))
        self._enc = jax.jit(lambda p, x: encode(p, self.config, x))

    @classmethod
    def from_diffusers(cls, path: str) -> "QwenImageVAE":
        from vllm_omni_draft_tpu.models import diffusers_io

        params, cfg = diffusers_io.load_qwen_image_vae(path)
        return cls(cfg, params)

    def decode(self, latents) -> jax.Array:
        return self._dec(self.params, jnp.asarray(latents, jnp.float32))

    def encode(self, images, seed: int = 0) -> jax.Array:
        del seed  # deterministic: returns the posterior mean
        return self._enc(self.params, jnp.asarray(images, jnp.float32))
