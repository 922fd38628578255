"""Diffusion transformer (DiT) stage: model, denoise loop, stage engine.

TPU-native rebuild of the reference's image-generation path — the
denoising engine of `src/qwen_image/runner_adapter.py:127-141`
(per-step `transformer(hidden_states, encoder_hidden_states, mask,
timestep, guidance)` then latent update) and the `QwenImageGenModel`
wrapper (`src/qwen_image_gen/model.py:117-143`) — redesigned idiomatically:

- MMDiT-style joint attention over [image patches ; text tokens] with
  adaLN-Zero conditioning from (timestep, guidance) embeddings;
- the WHOLE denoise loop is one `lax.scan` over timesteps inside one jit
  (the reference loops in Python, one CUDA launch per step — on TPU the
  scan compiles to a single device program);
- rectified-flow Euler sampling on the reference's linear 1000-scaled
  schedule (`runner_adapter.py:64-68`);
- classifier-free guidance via a batched cond/uncond forward;
- 3-axis rotary positions honoring the reference's img_shapes /
  txt_seq_lens layout (`src/qwen_image/types.py:42-44`);
- flash-style chunked online-softmax attention above FLASH_THRESHOLD
  joint tokens (the reference uses FA3 for its DiT,
  `src/performance_enhancement/test_performance.py:324`);
- diffusers-format checkpoint loading (models/diffusers_io.py).

The DiffusionStageEngine plugs into the Omni pipeline as a
`stage_type="diffusion"` stage and returns pooling-style tensor outputs
(reference: pooler_output path, `engine_core.md:393-396`).
"""

from __future__ import annotations

import math
import os
from dataclasses import dataclass, field

import jax
import jax.numpy as jnp
import numpy as np

from vllm_omni_draft_tpu.models.image_types import (
    ImageGenInputs,
    ImageGenOutputs,
    ImageOutputMode,
    ImageTask,
    validate_image_inputs,
)
from vllm_omni_draft_tpu.ops.layers import rms_norm


@dataclass
class DiTConfig:
    latent_channels: int = 16
    patch_size: int = 2
    hidden_size: int = 512
    depth: int = 8
    num_heads: int = 8
    text_dim: int = 3584  # Qwen2.5-VL embedding width (reference [B,T,3584])
    mlp_ratio: float = 4.0
    dtype: str = "bfloat16"
    seed: int = 0

    @property
    def head_dim(self) -> int:
        return self.hidden_size // self.num_heads


def _dt(cfg):
    return {"bfloat16": jnp.bfloat16, "float32": jnp.float32}[cfg.dtype]


def init_params(cfg: DiTConfig, key=None) -> dict:
    key = key if key is not None else jax.random.PRNGKey(cfg.seed)
    dt = _dt(cfg)
    D = cfg.hidden_size
    P = cfg.patch_size
    C = cfg.latent_channels
    F = int(D * cfg.mlp_ratio)
    L = cfg.depth
    ks = iter(jax.random.split(key, 16))

    def w(shape, fan_in):
        return (
            jax.random.normal(next(ks), shape, jnp.float32) / math.sqrt(fan_in)
        ).astype(dt)

    return {
        "patch_in": {"w": w((D, C * P * P), C * P * P), "b": jnp.zeros((D,), dt)},
        "text_in": {"w": w((D, cfg.text_dim), cfg.text_dim)},
        "time_mlp": {
            "w1": w((D, 256), 256),
            "w2": w((D, D), D),
        },
        "layers": {
            # adaLN-Zero: per-layer modulation producing 6 gains/shifts
            "mod": {"w": w((L, 6 * D, D), D), "b": jnp.zeros((L, 6 * D), dt)},
            "qkv": {"w": w((L, 3 * D, D), D), "b": jnp.zeros((L, 3 * D), dt)},
            "proj": {"w": w((L, D, D), D)},
            "mlp_up": {"w": w((L, F, D), D)},
            "mlp_down": {"w": w((L, D, F), F)},
        },
        "final_mod": {"w": w((2 * D, D), D), "b": jnp.zeros((2 * D,), dt)},
        "patch_out": {"w": w((C * P * P, D), D)},
    }


def _timestep_embedding(t: jax.Array, dim: int = 256) -> jax.Array:
    """Sinusoidal embedding of t in [0, 1000]."""
    half = dim // 2
    freqs = jnp.exp(-math.log(10000.0) * jnp.arange(half, dtype=jnp.float32) / half)
    args = t[:, None].astype(jnp.float32) * freqs[None, :]
    return jnp.concatenate([jnp.cos(args), jnp.sin(args)], axis=-1)


def _rope_3d_angles(head_dim: int, positions: jax.Array,
                    theta: float = 10000.0) -> tuple[jax.Array, jax.Array]:
    """3-axis rotary angles for the joint image+text sequence.

    Honors the reference's `img_shapes` (frames, H, W) / `txt_seq_lens`
    rotary layout (`/root/reference/src/qwen_image/types.py:42-44`): the
    head dim is split into (frame, height, width) bands; image tokens
    carry their (f, h, w) patch coordinates, text tokens carry
    (f = max_f + seq_pos, 0, 0) so the text stream is ordered on the
    frame axis and orthogonal to the spatial axes.

    positions: [N, 3] int32 per-token (f, h, w). Returns (cos, sin) each
    [N, head_dim//2]."""
    half = head_dim // 2
    # band split over the rotary half: frame gets the remainder
    d_h = half // 3
    d_w = half // 3
    d_f = half - d_h - d_w
    out = []
    for dim_i, n in ((0, d_f), (1, d_h), (2, d_w)):
        freqs = theta ** (
            -jnp.arange(n, dtype=jnp.float32) / max(n, 1)
        )
        out.append(positions[:, dim_i, None].astype(jnp.float32) * freqs[None])
    ang = jnp.concatenate(out, axis=-1)  # [N, half]
    return jnp.cos(ang), jnp.sin(ang)


def _apply_rope(x: jax.Array, cos: jax.Array, sin: jax.Array) -> jax.Array:
    """x [B, N, H, D]; cos/sin [N, D//2] (interleaved-pair convention)."""
    d = x.shape[-1] // 2
    x1, x2 = x[..., :d], x[..., d:]
    c = cos[None, :, None, :]
    s = sin[None, :, None, :]
    return jnp.concatenate([x1 * c - x2 * s, x1 * s + x2 * c], axis=-1)


# above this many joint tokens the materialized [N, N] score matrix is
# replaced by the chunked online-softmax (flash-style) path
FLASH_THRESHOLD = 1024
FLASH_CHUNK = 512


def _attention_dense(q, k, v, mask):
    """Materialized softmax (short sequences): q/k/v [B, N, H, D]."""
    Dh = q.shape[-1]
    scores = jnp.einsum("bnhd,bmhd->bhnm", q, k) / math.sqrt(Dh)
    scores = jnp.where(mask[:, None, None, :], scores, -1e30)
    att = jax.nn.softmax(scores, axis=-1)
    return jnp.einsum("bhnm,bmhd->bnhd", att, v)


def _attention_flash(q, k, v, mask):
    """Flash-style chunked online-softmax attention (the reference uses
    FA3 for its DiT, `src/performance_enhancement/test_performance.py:324`):
    scans KV in chunks carrying (m, l, acc), so peak memory is
    O(N * CHUNK) instead of O(N^2) and XLA fuses each chunk's
    score+softmax+pv into one kernel-sized block."""
    B, N, H, Dh = q.shape
    scale = 1.0 / math.sqrt(Dh)
    pad = (-N) % FLASH_CHUNK
    kp = jnp.pad(k, ((0, 0), (0, pad), (0, 0), (0, 0)))
    vp = jnp.pad(v, ((0, 0), (0, pad), (0, 0), (0, 0)))
    mp = jnp.pad(mask, ((0, 0), (0, pad)))
    nc = kp.shape[1] // FLASH_CHUNK
    kc = kp.reshape(B, nc, FLASH_CHUNK, H, Dh).transpose(1, 0, 2, 3, 4)
    vc = vp.reshape(B, nc, FLASH_CHUNK, H, Dh).transpose(1, 0, 2, 3, 4)
    mc = mp.reshape(B, nc, FLASH_CHUNK).transpose(1, 0, 2)

    def chunk(carry, xs):
        m, l, acc = carry  # [B,H,N,1], [B,H,N,1], [B,H,N,Dh]
        kj, vj, mj = xs
        s = jnp.einsum("bnhd,bmhd->bhnm", q, kj) * scale
        s = jnp.where(mj[:, None, None, :], s, -1e30)
        m_new = jnp.maximum(m, s.max(axis=-1, keepdims=True))
        p = jnp.exp(s - m_new)
        corr = jnp.exp(m - m_new)
        l = l * corr + p.sum(axis=-1, keepdims=True)
        acc = acc * corr + jnp.einsum("bhnm,bmhd->bhnd", p, vj)
        return (m_new, l, acc), None

    m0 = jnp.full((B, H, N, 1), -1e30, q.dtype)
    l0 = jnp.zeros((B, H, N, 1), q.dtype)
    a0 = jnp.zeros((B, H, N, Dh), q.dtype)
    (m, l, acc), _ = jax.lax.scan(chunk, (m0, l0, a0), (kc, vc, mc))
    out = acc / jnp.maximum(l, 1e-30)
    return out.transpose(0, 2, 1, 3)  # [B, N, H, Dh]


def make_forward(cfg: DiTConfig):
    """forward(params, latents [B,C,H,W], text_embeds [B,T,Dt],
    text_mask [B,T], timestep [B], guidance [B]) -> velocity [B,C,H,W]."""
    D, P, C = cfg.hidden_size, cfg.patch_size, cfg.latent_channels
    H_heads, Dh = cfg.num_heads, cfg.head_dim
    dt = _dt(cfg)
    eps = 1e-6

    def patchify(x):
        B, C_, H, W = x.shape
        hp, wp = H // P, W // P
        x = x.reshape(B, C_, hp, P, wp, P)
        x = x.transpose(0, 2, 4, 1, 3, 5).reshape(B, hp * wp, C_ * P * P)
        return x, (hp, wp)

    def unpatchify(x, hw):
        hp, wp = hw
        B = x.shape[0]
        x = x.reshape(B, hp, wp, C, P, P)
        return x.transpose(0, 3, 1, 4, 2, 5).reshape(B, C, hp * P, wp * P)

    def layer_fn(carry, lp):
        x, cond, mask, rope_cos, rope_sin = carry  # x [B, N, D]; cond [B, D]
        B, N, _ = x.shape
        mod = (cond @ lp["mod"]["w"].T.astype(dt) + lp["mod"]["b"]).astype(
            jnp.float32
        )
        sh1, sc1, g1, sh2, sc2, g2 = jnp.split(mod, 6, axis=-1)  # [B, D] each

        h = rms_norm(x, jnp.ones((x.shape[-1],), dt), eps)
        h = h * (1 + sc1[:, None, :]).astype(dt) + sh1[:, None, :].astype(dt)
        qkv = h @ lp["qkv"]["w"].T.astype(dt) + lp["qkv"]["b"]
        q, k, v = jnp.split(qkv, 3, axis=-1)
        q = q.reshape(B, N, H_heads, Dh).astype(jnp.float32)
        k = k.reshape(B, N, H_heads, Dh).astype(jnp.float32)
        v = v.reshape(B, N, H_heads, Dh).astype(jnp.float32)
        q = _apply_rope(q, rope_cos, rope_sin)
        k = _apply_rope(k, rope_cos, rope_sin)
        if N > FLASH_THRESHOLD:
            o = _attention_flash(q, k, v, mask)
        else:
            o = _attention_dense(q, k, v, mask)
        o = o.reshape(B, N, -1).astype(dt)
        x = x + g1[:, None, :].astype(dt) * (o @ lp["proj"]["w"].T.astype(dt))

        h = rms_norm(x, jnp.ones((x.shape[-1],), dt), eps)
        h = h * (1 + sc2[:, None, :]).astype(dt) + sh2[:, None, :].astype(dt)
        h = jax.nn.gelu(h @ lp["mlp_up"]["w"].T.astype(dt))
        x = x + g2[:, None, :].astype(dt) * (h @ lp["mlp_down"]["w"].T.astype(dt))
        return (x, cond, mask, rope_cos, rope_sin), None

    def forward(params, latents, text_embeds, text_mask, timestep, guidance):
        B = latents.shape[0]
        img_tok, hw = patchify(latents.astype(dt))
        img = img_tok @ params["patch_in"]["w"].T.astype(dt) + params["patch_in"]["b"]
        txt = text_embeds.astype(dt) @ params["text_in"]["w"].T.astype(dt)
        n_img = img.shape[1]
        n_txt = txt.shape[1]
        x = jnp.concatenate([img, txt], axis=1)  # [B, N, D]
        mask = jnp.concatenate(
            [jnp.ones((B, n_img), bool), text_mask.astype(bool)], axis=1
        )
        # rotary layout per the reference's img_shapes/txt_seq_lens fields
        # (`src/qwen_image/types.py:42-44`): image tokens carry (f, h, w)
        # patch coordinates (single-frame here: f=0), text tokens follow
        # on the frame axis at (1 + seq_pos, 0, 0)
        hp, wp = hw
        gi = jnp.arange(n_img, dtype=jnp.int32)
        img_pos = jnp.stack([jnp.zeros_like(gi), gi // wp, gi % wp], axis=1)
        gt = jnp.arange(n_txt, dtype=jnp.int32)
        txt_pos = jnp.stack(
            [gt + 1, jnp.zeros_like(gt), jnp.zeros_like(gt)], axis=1
        )
        rope_cos, rope_sin = _rope_3d_angles(
            Dh, jnp.concatenate([img_pos, txt_pos], axis=0)
        )
        # condition on timestep (+ guidance, reference passes guidance into
        # the transformer — guidance-distilled conditioning)
        temb = _timestep_embedding(timestep + 1000.0 * guidance * 0)  # timestep
        gemb = _timestep_embedding(guidance * 1000.0)
        cond = jax.nn.silu(
            (temb + gemb) @ params["time_mlp"]["w1"].T.astype(jnp.float32)
        )
        cond = (cond @ params["time_mlp"]["w2"].T.astype(jnp.float32))

        (x, _, _, _, _), _ = jax.lax.scan(
            layer_fn,
            (x, cond.astype(dt), mask, rope_cos, rope_sin),
            params["layers"],
        )

        fm = (
            cond.astype(dt) @ params["final_mod"]["w"].T.astype(dt)
            + params["final_mod"]["b"]
        ).astype(jnp.float32)
        shf, scf = jnp.split(fm, 2, axis=-1)
        out = rms_norm(x[:, :n_img], jnp.ones((D,), dt), eps)
        out = out * (1 + scf[:, None, :]).astype(dt) + shf[:, None, :].astype(dt)
        out = out @ params["patch_out"]["w"].T.astype(dt)
        return unpatchify(out.astype(jnp.float32), hw)

    return forward


def make_denoiser(cfg: DiTConfig, num_steps: int):
    """Full denoise loop as one compiled program: rectified-flow Euler over
    the reference's linear 1000-scaled schedule, with CFG."""
    fwd = make_forward(cfg)

    def denoise(params, latents, text_embeds, text_mask, guidance, key):
        B = latents.shape[0]
        # linear sigma schedule 1 -> 0 (reference: linear 1000-scaled,
        # runner_adapter.py:64-68)
        sigmas = jnp.linspace(1.0, 0.0, num_steps + 1)

        null_embeds = jnp.zeros_like(text_embeds)
        # guidance: scalar or [B] (batched requests carry per-sample CFG)
        gvec = jnp.asarray(guidance, jnp.float32) * jnp.ones((B,))
        gb = gvec.reshape((B, 1, 1, 1))

        def step(lat, i):
            t = sigmas[i] * 1000.0
            tvec = jnp.full((B,), t, jnp.float32)
            v_cond = fwd(params, lat, text_embeds, text_mask, tvec, gvec)
            v_unc = fwd(params, lat, null_embeds, text_mask, tvec, gvec)
            v = v_unc + gb * (v_cond - v_unc)
            lat = lat - (sigmas[i] - sigmas[i + 1]) * v
            return lat, None

        lat, _ = jax.lax.scan(step, latents, jnp.arange(num_steps))
        return lat

    return denoise


class DiffusionStageEngine:
    """The diffusion stage engine for the Omni pipeline: builds latents,
    runs the compiled denoise loop, optional VAE decode."""

    def __init__(self, stage_config=None, dit_config: DiTConfig | None = None,
                 vae=None, checkpoint_dir: str | None = None, **_):
        from vllm_omni_draft_tpu.models.qwen_image_dit import QwenImageDiTConfig

        self.arch = "vot"  # single-stream MMDiT (models/dit.py)
        if isinstance(dit_config, QwenImageDiTConfig):
            self.arch = "qwen_image"
        if checkpoint_dir is not None:
            # diffusers-format directory: transformer/ (+ optional vae/)
            import json as _json

            from vllm_omni_draft_tpu.models import diffusers_io, vae as vae_mod

            tdir = os.path.join(checkpoint_dir, "transformer")
            tdir = tdir if os.path.isdir(tdir) else checkpoint_dir
            with open(os.path.join(tdir, "config.json")) as f:
                cls_name = _json.load(f).get("_class_name", "")
            if cls_name == "QwenImageTransformer2DModel":
                self.arch = "qwen_image"
                self.params, self.cfg = diffusers_io.load_qwen_image_weights(
                    tdir, cfg=dit_config
                )
            else:
                self.params, self.cfg = diffusers_io.load_dit_weights(
                    tdir, cfg=dit_config
                )
            vdir = os.path.join(checkpoint_dir, "vae")
            if vae is None and os.path.isdir(vdir):
                with open(os.path.join(vdir, "config.json")) as f:
                    vae_cls = _json.load(f).get("_class_name", "")
                if vae_cls == "AutoencoderKLQwenImage":
                    from vllm_omni_draft_tpu.models.qwen_image_vae import (
                        QwenImageVAE,
                    )

                    vae = QwenImageVAE.from_diffusers(vdir)
                else:
                    vae = vae_mod.VAE.from_diffusers(vdir)
        elif self.arch == "qwen_image":
            from vllm_omni_draft_tpu.models import qwen_image_dit

            self.cfg = dit_config
            self.params = jax.jit(lambda: qwen_image_dit.init_params(self.cfg))()
        else:
            self.cfg = dit_config or DiTConfig()
            self.params = jax.jit(lambda: init_params(self.cfg))()
        self.vae = vae
        self._denoisers: dict[object, object] = {}

    def _get_denoiser(self, steps: int, img_shapes: tuple | None = None):
        if self.arch == "qwen_image":
            from vllm_omni_draft_tpu.models import qwen_image_dit

            key = (steps, img_shapes)
            if key not in self._denoisers:
                self._denoisers[key] = jax.jit(
                    qwen_image_dit.make_denoiser(self.cfg, steps, img_shapes)
                )
            return self._denoisers[key]
        if steps not in self._denoisers:
            self._denoisers[steps] = jax.jit(make_denoiser(self.cfg, steps))
        return self._denoisers[steps]

    def generate(self, inputs_list, sampling_params=None) -> list[ImageGenOutputs]:
        """Batched request execution (round-4: the reference benchmarks
        bs2/bs4 and its dual-engine design batches VAE decode via a
        ParallelDecodeManager, `engine_core.md:879-1008`; the natural TPU
        form is ONE [B]-batched denoise scan + one batched VAE decode).
        Requests sharing static shapes (size, steps, task form) group
        into one program; per-sample seed/guidance ride as batch rows, so
        batched outputs are bit-identical to sequential execution."""
        inps = []
        for item in inputs_list:
            inp = item if isinstance(item, ImageGenInputs) else ImageGenInputs(
                **item if isinstance(item, dict) else {}
            )
            validate_image_inputs(inp)
            inps.append(inp)
        outs: list = [None] * len(inps)
        groups: dict[tuple, list[int]] = {}
        for i, inp in enumerate(inps):
            key = (inp.height, inp.width, inp.num_inference_steps,
                   inp.task, inp.image_latents is None)
            groups.setdefault(key, []).append(i)
        for idxs in groups.values():
            for i, o in zip(idxs, self._generate_batch([inps[i] for i in idxs])):
                outs[i] = o
        return outs

    def _generate_batch(self, inps: list[ImageGenInputs]) -> list[ImageGenOutputs]:
        qwen = self.arch == "qwen_image"
        C = (
            self.cfg.out_channels if qwen else self.cfg.latent_channels
        )
        B = len(inps)
        h, w = inps[0].height // 8, inps[0].width // 8

        lat_rows = []
        for inp in inps:
            key = jax.random.PRNGKey(inp.seed if inp.seed is not None else 0)
            if inp.task == ImageTask.TEXT_TO_IMAGE or inp.image_latents is None:
                lat_rows.append(jax.random.normal(key, (1, C, h, w), jnp.float32))
            else:
                il = jnp.asarray(np.asarray(inp.image_latents), jnp.float32)
                noise = jax.random.normal(key, il.shape, jnp.float32)
                lat_rows.append(0.5 * il + 0.5 * noise)  # I2I: partial renoise
        latents = jnp.concatenate(lat_rows, axis=0)  # [B, C, h, w]

        text_dim = (
            self.cfg.joint_attention_dim if qwen else self.cfg.text_dim
        )
        te_rows, tm_rows = [], []
        for inp in inps:
            if inp.prompt_embeds is not None:
                te_i = jnp.asarray(np.asarray(inp.prompt_embeds), jnp.float32)
                tm_i = (
                    jnp.asarray(np.asarray(inp.prompt_embeds_mask))
                    if inp.prompt_embeds_mask is not None
                    else jnp.ones(te_i.shape[:2], jnp.int32)
                )
            else:
                te_i = jnp.zeros((1, 8, text_dim), jnp.float32)
                tm_i = jnp.ones((1, 8), jnp.int32)
            te_rows.append(te_i)
            tm_rows.append(tm_i)
        # right-pad text to the group max; padded tokens are mask=0 and
        # exactly inert under the masked (-1e30 f32) softmax
        t_max = max(t.shape[1] for t in te_rows)
        te = jnp.concatenate(
            [jnp.pad(t, ((0, 0), (0, t_max - t.shape[1]), (0, 0)))
             for t in te_rows], axis=0)
        tm = jnp.concatenate(
            [jnp.pad(m.astype(jnp.int32), ((0, 0), (0, t_max - m.shape[1])))
             for m in tm_rows], axis=0)
        guidance = jnp.asarray(
            [inp.guidance_scale for inp in inps], jnp.float32
        )
        steps = inps[0].num_inference_steps

        if qwen:
            # pack 2x2 latent patches into tokens [B, N, C*P^2] (the
            # layout QwenImageTransformer2DModel consumes), denoise in
            # token space, unpack
            P = self.cfg.patch_size
            if h % P or w % P:
                raise ValueError(
                    f"height/width must be multiples of {8 * P} "
                    f"(VAE stride 8 x patch_size {P}); got "
                    f"{inps[0].height}x{inps[0].width} -> latent grid {h}x{w}"
                )
            hp, wp = h // P, w // P
            x = latents.reshape(B, C, hp, P, wp, P)
            tokens = x.transpose(0, 2, 4, 1, 3, 5).reshape(B, hp * wp, C * P * P)
            denoise = self._get_denoiser(steps, (1, hp, wp))
            tokens = denoise(self.params, tokens, te, tm, guidance)
            x = tokens.reshape(B, hp, wp, C, P, P)
            latents = x.transpose(0, 3, 1, 4, 2, 5).reshape(B, C, hp * P, wp * P)
        else:
            denoise = self._get_denoiser(steps)
            latents = denoise(
                self.params, latents, te, tm, guidance,
                jax.random.PRNGKey(0),
            )

        want_px = [
            inp.output_mode in (ImageOutputMode.PIXELS,
                                ImageOutputMode.PIXELS_AND_LATENTS)
            for inp in inps
        ]
        pixels = None
        if any(want_px):
            if self.vae is None:
                from vllm_omni_draft_tpu.models import vae as vae_mod

                self.vae = vae_mod.VAE(vae_mod.VAEConfig(latent_channels=C))
            pixels = self.vae.decode(latents)  # batched VAE decode

        outs = []
        for i, inp in enumerate(inps):
            outs.append(self._package_one(inp, latents[i:i + 1],
                                          pixels[i:i + 1] if pixels is not None
                                          and want_px[i] else None))
        return outs

    def _package_one(self, inp, latents, pixels) -> ImageGenOutputs:
        return ImageGenOutputs(
            latents=latents
            if inp.output_mode != ImageOutputMode.PIXELS
            else None,
            pixels=pixels,
        )
