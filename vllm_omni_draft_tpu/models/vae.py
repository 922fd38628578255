"""Convolutional VAE (encoder + decoder) for the image stage.

Capability parity with the reference's AutoencoderKLQwenImage use
(`src/qwen_image/runner_adapter.py:144-160` VAE decode per output_mode;
`src/qwen_image/processor.py:64-92` VAE encode of input images) — rebuilt
as a compact JAX conv net: 8x spatial stride, GroupNorm+SiLU resblocks,
compiled once per shape. Diffusers-format checkpoint IO lives in
models/diffusers_io.py (`load_vae_weights` / `save_vae_checkpoint`);
`VAE.from_diffusers(path)` constructs from such a checkpoint.
"""

from __future__ import annotations

import math
from dataclasses import dataclass

import jax
import jax.numpy as jnp


@dataclass
class VAEConfig:
    latent_channels: int = 16
    base_channels: int = 64
    image_channels: int = 3
    num_res_blocks: int = 1
    scaling_factor: float = 0.13025
    dtype: str = "float32"
    seed: int = 0


def _conv(x, w, b=None, stride=1):
    # x [B, C, H, W]; w [O, I, kh, kw]
    out = jax.lax.conv_general_dilated(
        x, w, window_strides=(stride, stride), padding="SAME",
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
    )
    if b is not None:
        out = out + b[None, :, None, None]
    return out


def _group_norm(x, num_groups=8, eps=1e-6):
    B, C, H, W = x.shape
    g = math.gcd(num_groups, C)
    xg = x.reshape(B, g, C // g, H, W)
    mean = xg.mean(axis=(2, 3, 4), keepdims=True)
    var = xg.var(axis=(2, 3, 4), keepdims=True)
    return ((xg - mean) * jax.lax.rsqrt(var + eps)).reshape(B, C, H, W)


def _upsample2(x):
    B, C, H, W = x.shape
    x = jnp.repeat(jnp.repeat(x, 2, axis=2), 2, axis=3)
    return x


class VAE:
    """Random-init VAE with jitted encode/decode. 3 stride-2 stages = 8x."""

    def __init__(self, config: VAEConfig | None = None, params: dict | None = None):
        self.cfg = config or VAEConfig()
        self.params = params if params is not None else jax.jit(
            lambda: self._init()
        )()
        self._decode = jax.jit(self._decode_fn)
        self._encode = jax.jit(self._encode_fn)

    @classmethod
    def from_diffusers(cls, path: str) -> "VAE":
        """Construct from a diffusers-format checkpoint directory
        (models/diffusers_io.load_vae_weights)."""
        from vllm_omni_draft_tpu.models.diffusers_io import load_vae_weights

        params, cfg = load_vae_weights(path)
        return cls(cfg, params=params)

    def _init(self) -> dict:
        cfg = self.cfg
        key = jax.random.PRNGKey(cfg.seed)
        ks = iter(jax.random.split(key, 32))
        C = cfg.base_channels

        def w(shape):
            fan_in = shape[1] * shape[2] * shape[3]
            return jax.random.normal(next(ks), shape, jnp.float32) / math.sqrt(
                fan_in
            )

        chans = [C * 4, C * 2, C]
        dec = {
            "in": w((chans[0], cfg.latent_channels, 3, 3)),
            "blocks": [
                {
                    "res": w((chans[i], chans[i], 3, 3)),
                    "out": w((chans[min(i + 1, 2)], chans[i], 3, 3)),
                }
                for i in range(3)
            ],
            "final": w((cfg.image_channels, chans[2], 3, 3)),
        }
        enc = {
            "in": w((C, cfg.image_channels, 3, 3)),
            "blocks": [
                {
                    "res": w((chans[2 - i], chans[2 - i], 3, 3)),
                    "down": w((chans[max(1 - i, 0)], chans[2 - i], 3, 3)),
                }
                for i in range(3)
            ],
            "final": w((2 * cfg.latent_channels, chans[0], 3, 3)),
        }
        return {"decoder": dec, "encoder": enc}

    # ------------------------------------------------------------------

    def _decode_fn(self, params, latents):
        p = params["decoder"]
        x = latents / self.cfg.scaling_factor
        x = _conv(x, p["in"])
        for blk in p["blocks"]:
            h = jax.nn.silu(_group_norm(x))
            x = x + _conv(h, blk["res"])
            x = _upsample2(x)
            x = _conv(jax.nn.silu(_group_norm(x)), blk["out"])
        x = _conv(jax.nn.silu(_group_norm(x)), p["final"])
        return jnp.tanh(x)  # [-1, 1] pixels

    def _encode_fn(self, params, images, key):
        p = params["encoder"]
        x = _conv(images, p["in"])
        for blk in p["blocks"]:
            h = jax.nn.silu(_group_norm(x))
            x = x + _conv(h, blk["res"])
            x = _conv(jax.nn.silu(_group_norm(x)), blk["down"], stride=2)
        moments = _conv(jax.nn.silu(_group_norm(x)), p["final"])
        mean, logvar = jnp.split(moments, 2, axis=1)
        std = jnp.exp(0.5 * jnp.clip(logvar, -30, 20))
        z = mean + std * jax.random.normal(key, mean.shape)
        return z * self.cfg.scaling_factor

    # ------------------------------------------------------------------

    def decode(self, latents) -> jax.Array:
        return self._decode(self.params, jnp.asarray(latents, jnp.float32))

    def encode(self, images, seed: int = 0) -> jax.Array:
        return self._encode(
            self.params, jnp.asarray(images, jnp.float32), jax.random.PRNGKey(seed)
        )
