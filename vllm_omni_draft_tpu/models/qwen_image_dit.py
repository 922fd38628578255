"""Qwen-Image dual-stream DiT — the architecture the reference actually
drives (`/root/reference/src/qwen_image/runner_adapter.py:8-13` imports
diffusers' `QwenImageTransformer2DModel`; the forward surface is
`runner_adapter.py:127-141`: hidden_states [B, N, C], encoder_hidden
states + mask, timestep, img_shapes, txt_seq_lens, guidance → residual).

Round-2 review finding: the repo's MMDiT (`models/dit.py`) serialized
its OWN single-stream architecture, so a real Qwen-Image checkpoint
could not load. This module is the faithful dual-stream form, TPU-first:

* separate image/text streams with per-stream modulation
  (`img_mod`/`txt_mod`, six-way adaLN-zero), JOINT attention over
  [text ; image] tokens with per-stream q/k/v projections
  (`attn.to_q` / `attn.add_q_proj` families), per-head-dim RMSNorm on
  q/k (`attn.norm_q` / `attn.norm_added_q`), and per-stream output
  projections (`attn.to_out.0` / `attn.to_add_out`);
* GELU MLPs per stream (`img_mlp.net.0.proj` / `img_mlp.net.2`);
* 3-axis rotary positions with the diffusers `axes_dims_rope` band
  split; text tokens ride the frame axis past the image extent;
* all L blocks scan-stacked ([L, ...] leaves) and executed as ONE
  `lax.scan` inside one jit — the TPU-native form of the reference's
  per-layer Python loop;
* parameter names follow the public diffusers convention exactly
  (see models/diffusers_io.QWEN_IMAGE_LAYER/GLOBAL), so a real
  `QwenImageTransformer2DModel` checkpoint directory loads once egress
  exists; round-trip save/load is tested locally.

Conventions pinned to diffusers semantics (documented because a wrong
guess silently corrupts a real checkpoint load — validated as far as
this zero-egress container allows, via round-trip + shape tests):
  - modulation chunk order: (shift_msa, scale_msa, gate_msa, shift_mlp,
    scale_mlp, gate_mlp);
  - norm_out (AdaLayerNormContinuous) chunk order: (scale, shift);
  - joint attention concatenates TEXT FIRST: [txt ; img];
  - timestep embedding is 256-dim [cos, sin] (flip_sin_to_cos=True),
    timesteps on the reference's linear 1000-scale.
"""

from __future__ import annotations

import math
from dataclasses import dataclass

import jax
import jax.numpy as jnp

from vllm_omni_draft_tpu.models.dit import (
    FLASH_THRESHOLD,
    _attention_dense,
    _attention_flash,
    _timestep_embedding,
)
from vllm_omni_draft_tpu.ops.layers import rms_norm


@dataclass
class QwenImageDiTConfig:
    """Mirrors the diffusers `QwenImageTransformer2DModel` config keys
    (config.json: num_layers, num_attention_heads, attention_head_dim,
    joint_attention_dim, in_channels, out_channels, patch_size,
    guidance_embeds, axes_dims_rope). Defaults are a small test-scale
    instance; the real Qwen-Image is num_layers=60, heads=24, head
    dim=128 (inner dim 3072), joint_attention_dim=3584."""

    num_layers: int = 4
    num_attention_heads: int = 4
    attention_head_dim: int = 32
    joint_attention_dim: int = 128
    in_channels: int = 64
    out_channels: int = 16
    patch_size: int = 2
    guidance_embeds: bool = False
    axes_dims_rope: tuple = (8, 12, 12)  # sums to attention_head_dim
    dtype: str = "bfloat16"
    seed: int = 0

    @property
    def inner_dim(self) -> int:
        return self.num_attention_heads * self.attention_head_dim

    def __post_init__(self):
        if sum(self.axes_dims_rope) != self.attention_head_dim:
            raise ValueError(
                f"axes_dims_rope {self.axes_dims_rope} must sum to "
                f"attention_head_dim {self.attention_head_dim}"
            )


def _dt(cfg):
    return {"bfloat16": jnp.bfloat16, "float32": jnp.float32}[cfg.dtype]


def init_params(cfg: QwenImageDiTConfig, key=None) -> dict:
    key = key if key is not None else jax.random.PRNGKey(cfg.seed)
    D = cfg.inner_dim
    F = 4 * D  # diffusers FeedForward default mult
    L = cfg.num_layers
    dt = _dt(cfg)
    ks = iter(jax.random.split(key, 40))

    def lin(o, i, layers=None, zero=False):
        shape = (o, i) if layers is None else (layers, o, i)
        if zero:
            w = jnp.zeros(shape, dt)
        else:
            w = (jax.random.normal(next(ks), shape, jnp.float32)
                 / math.sqrt(i)).astype(dt)
        b = jnp.zeros(shape[:-1], dt)
        return {"w": w, "b": b}

    blocks = {
        # adaLN-zero: zero-init modulation keeps each block an identity
        # at init (standard DiT practice)
        "img_mod": lin(6 * D, D, L, zero=True),
        "txt_mod": lin(6 * D, D, L, zero=True),
        "img_q": lin(D, D, L), "img_k": lin(D, D, L), "img_v": lin(D, D, L),
        "txt_q": lin(D, D, L), "txt_k": lin(D, D, L), "txt_v": lin(D, D, L),
        "img_qnorm": {"w": jnp.ones((L, cfg.attention_head_dim), dt)},
        "img_knorm": {"w": jnp.ones((L, cfg.attention_head_dim), dt)},
        "txt_qnorm": {"w": jnp.ones((L, cfg.attention_head_dim), dt)},
        "txt_knorm": {"w": jnp.ones((L, cfg.attention_head_dim), dt)},
        "img_out": lin(D, D, L),
        "txt_out": lin(D, D, L),
        "img_mlp1": lin(F, D, L), "img_mlp2": lin(D, F, L),
        "txt_mlp1": lin(F, D, L), "txt_mlp2": lin(D, F, L),
    }
    params = {
        "img_in": lin(D, cfg.in_channels),
        "txt_norm": {"w": jnp.ones((cfg.joint_attention_dim,), dt)},
        "txt_in": lin(D, cfg.joint_attention_dim),
        "time_embed": {
            "w1": lin(D, 256)["w"], "b1": jnp.zeros((D,), dt),
            "w2": lin(D, D)["w"], "b2": jnp.zeros((D,), dt),
        },
        "blocks": blocks,
        "norm_out": lin(2 * D, D, zero=True),
        "proj_out": lin(cfg.patch_size ** 2 * cfg.out_channels, D),
    }
    if cfg.guidance_embeds:
        params["guidance_embed"] = {
            "w1": lin(D, 256)["w"], "b1": jnp.zeros((D,), dt),
            "w2": lin(D, D)["w"], "b2": jnp.zeros((D,), dt),
        }
    return params


def _rope_axes(cfg, img_pos: jax.Array, n_txt: int):
    """(cos, sin) [N_total, head_dim//2] for the joint [txt ; img]
    sequence. Image tokens carry (f, h, w); text tokens ride the frame
    axis past the image extent (diffusers QwenEmbedRope places text
    after the image grid). Band widths follow axes_dims_rope
    (per-axis rotary dims; each contributes dim/2 frequencies)."""
    half_dims = [d // 2 for d in cfg.axes_dims_rope]
    max_f = jnp.max(img_pos[:, 0]) + 1 if img_pos.shape[0] else 0
    gt = jnp.arange(n_txt, dtype=jnp.int32)
    txt_pos = jnp.stack(
        [gt + max_f, jnp.zeros_like(gt), jnp.zeros_like(gt)], axis=1
    )
    pos = jnp.concatenate([txt_pos, img_pos], axis=0)  # TEXT FIRST
    out = []
    for axis, n in enumerate(half_dims):
        freqs = 10000.0 ** (-jnp.arange(n, dtype=jnp.float32) / max(n, 1))
        out.append(pos[:, axis, None].astype(jnp.float32) * freqs[None])
    ang = jnp.concatenate(out, axis=-1)  # [N, head_dim//2]
    return jnp.cos(ang), jnp.sin(ang)


def _rope_apply(x, cos, sin):
    # x [B, N, H, Dh]; cos/sin [N, Dh//2]; split-halves convention
    d = x.shape[-1] // 2
    x1, x2 = x[..., :d], x[..., d:]
    c = cos[None, :, None, :]
    s = sin[None, :, None, :]
    return jnp.concatenate([x1 * c - x2 * s, x1 * s + x2 * c], axis=-1)


def make_forward(cfg: QwenImageDiTConfig):
    """forward(params, hidden_states [B, N_img, in_channels],
    encoder_hidden_states [B, N_txt, joint_dim],
    encoder_hidden_states_mask [B, N_txt], timestep [B] (0..1000),
    img_shapes (f, h, w) static tuple, guidance [B] or None)
    -> sample [B, N_img, patch_size^2 * out_channels]

    Token-space form of the reference call
    (`runner_adapter.py:127-141`); the caller owns the latent
    flatten/unflatten."""
    D = cfg.inner_dim
    H, Dh = cfg.num_attention_heads, cfg.attention_head_dim
    dt = _dt(cfg)
    eps = 1e-6

    def ln(x):  # LayerNorm without affine (diffusers elementwise_affine=False)
        xf = x.astype(jnp.float32)
        mu = jnp.mean(xf, axis=-1, keepdims=True)
        var = jnp.var(xf, axis=-1, keepdims=True)
        return ((xf - mu) * jax.lax.rsqrt(var + eps)).astype(x.dtype)

    def proj(x, p):
        return x @ p["w"].T.astype(dt) + p["b"].astype(dt)

    def heads(x, B, N):
        return x.reshape(B, N, H, Dh).astype(jnp.float32)

    def block(carry, lp):
        img, txt, cond, mask, cos, sin = carry
        B, Ni, _ = img.shape
        Nt = txt.shape[1]

        imod = (jax.nn.silu(cond) @ lp["img_mod"]["w"].T.astype(dt)
                + lp["img_mod"]["b"]).astype(jnp.float32)
        tmod = (jax.nn.silu(cond) @ lp["txt_mod"]["w"].T.astype(dt)
                + lp["txt_mod"]["b"]).astype(jnp.float32)
        ish1, isc1, ig1, ish2, isc2, ig2 = jnp.split(imod, 6, axis=-1)
        tsh1, tsc1, tg1, tsh2, tsc2, tg2 = jnp.split(tmod, 6, axis=-1)

        hi = ln(img) * (1 + isc1[:, None]).astype(dt) + ish1[:, None].astype(dt)
        ht = ln(txt) * (1 + tsc1[:, None]).astype(dt) + tsh1[:, None].astype(dt)

        qi = heads(proj(hi, lp["img_q"]), B, Ni)
        ki = heads(proj(hi, lp["img_k"]), B, Ni)
        vi = heads(proj(hi, lp["img_v"]), B, Ni)
        qt = heads(proj(ht, lp["txt_q"]), B, Nt)
        kt = heads(proj(ht, lp["txt_k"]), B, Nt)
        vt = heads(proj(ht, lp["txt_v"]), B, Nt)
        qi = rms_norm(qi, lp["img_qnorm"]["w"].astype(jnp.float32), eps)
        ki = rms_norm(ki, lp["img_knorm"]["w"].astype(jnp.float32), eps)
        qt = rms_norm(qt, lp["txt_qnorm"]["w"].astype(jnp.float32), eps)
        kt = rms_norm(kt, lp["txt_knorm"]["w"].astype(jnp.float32), eps)

        q = jnp.concatenate([qt, qi], axis=1)  # TEXT FIRST
        k = jnp.concatenate([kt, ki], axis=1)
        v = jnp.concatenate([vt, vi], axis=1)
        q = _rope_apply(q, cos, sin)
        k = _rope_apply(k, cos, sin)
        if q.shape[1] > FLASH_THRESHOLD:
            o = _attention_flash(q, k, v, mask)
        else:
            o = _attention_dense(q, k, v, mask)
        o = o.reshape(B, Nt + Ni, D).astype(dt)
        ot, oi = o[:, :Nt], o[:, Nt:]
        img = img + ig1[:, None].astype(dt) * proj(oi, lp["img_out"])
        txt = txt + tg1[:, None].astype(dt) * proj(ot, lp["txt_out"])

        hi = ln(img) * (1 + isc2[:, None]).astype(dt) + ish2[:, None].astype(dt)
        ht = ln(txt) * (1 + tsc2[:, None]).astype(dt) + tsh2[:, None].astype(dt)
        hi = jax.nn.gelu(proj(hi, lp["img_mlp1"]), approximate=True)
        ht = jax.nn.gelu(proj(ht, lp["txt_mlp1"]), approximate=True)
        img = img + ig2[:, None].astype(dt) * proj(hi, lp["img_mlp2"])
        txt = txt + tg2[:, None].astype(dt) * proj(ht, lp["txt_mlp2"])
        return (img, txt, cond, mask, cos, sin), None

    def forward(params, hidden_states, encoder_hidden_states,
                encoder_hidden_states_mask, timestep, img_shapes,
                guidance=None):
        B, Ni, _ = hidden_states.shape
        Nt = encoder_hidden_states.shape[1]
        img = proj(hidden_states.astype(dt), params["img_in"])
        t_in = rms_norm(
            encoder_hidden_states.astype(dt),
            params["txt_norm"]["w"].astype(jnp.float32), eps,
        )
        txt = proj(t_in, params["txt_in"])

        # conditioning: timestep (+ optional guidance) MLPs
        te = params["time_embed"]
        cond = _timestep_embedding(timestep.astype(jnp.float32))
        cond = jax.nn.silu(
            cond @ te["w1"].T.astype(jnp.float32) + te["b1"].astype(jnp.float32)
        )
        cond = cond @ te["w2"].T.astype(jnp.float32) + te["b2"].astype(jnp.float32)
        if cfg.guidance_embeds and guidance is not None:
            ge = params["guidance_embed"]
            g = _timestep_embedding(guidance.astype(jnp.float32) * 1000.0)
            g = jax.nn.silu(
                g @ ge["w1"].T.astype(jnp.float32) + ge["b1"].astype(jnp.float32)
            )
            cond = cond + (
                g @ ge["w2"].T.astype(jnp.float32) + ge["b2"].astype(jnp.float32)
            )
        cond = cond.astype(dt)

        # rotary: image grid positions from img_shapes (f, h, w)
        f, hgrid, wgrid = img_shapes
        gi = jnp.arange(Ni, dtype=jnp.int32)
        per_frame = hgrid * wgrid
        img_pos = jnp.stack(
            [gi // per_frame, (gi % per_frame) // wgrid, gi % wgrid], axis=1
        )
        cos, sin = _rope_axes(cfg, img_pos, Nt)

        mask = jnp.concatenate(
            [encoder_hidden_states_mask.astype(bool),
             jnp.ones((B, Ni), bool)], axis=1
        )
        (img, txt, *_), _ = jax.lax.scan(
            block, (img, txt, cond, mask, cos, sin), params["blocks"]
        )

        # AdaLayerNormContinuous: chunk order (scale, shift)
        no = params["norm_out"]
        mod = (jax.nn.silu(cond) @ no["w"].T.astype(dt) + no["b"]).astype(
            jnp.float32
        )
        scale, shift = jnp.split(mod, 2, axis=-1)
        out = ln(img) * (1 + scale[:, None]).astype(dt) + shift[:, None].astype(dt)
        return proj(out, params["proj_out"]).astype(jnp.float32)

    return forward


def make_denoiser(cfg: QwenImageDiTConfig, num_steps: int,
                  img_shapes: tuple):
    """Rectified-flow Euler denoise over the reference's linear
    1000-scaled schedule (`runner_adapter.py:64-68`), whole loop one
    compiled scan, CFG via a cond/uncond pair."""
    fwd = make_forward(cfg)

    def denoise(params, tokens, text_embeds, text_mask, guidance):
        # tokens [B, N_img, in_channels]
        B = tokens.shape[0]
        sigmas = jnp.linspace(1.0, 0.0, num_steps + 1)
        null = jnp.zeros_like(text_embeds)
        # guidance: scalar or [B] (batched requests carry per-sample CFG)
        gvec = jnp.asarray(guidance, jnp.float32) * jnp.ones((B,))
        gb = gvec.reshape((B, 1, 1))

        def step(tok, i):
            tvec = jnp.full((B,), sigmas[i] * 1000.0, jnp.float32)
            v_c = fwd(params, tok, text_embeds, text_mask, tvec,
                      img_shapes, gvec)
            v_u = fwd(params, tok, null, text_mask, tvec, img_shapes, gvec)
            v = v_u + gb * (v_c - v_u)
            return tok - (sigmas[i] - sigmas[i + 1]) * v, None

        tok, _ = jax.lax.scan(step, tokens, jnp.arange(num_steps))
        return tok

    return denoise
