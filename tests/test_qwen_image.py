"""Qwen-Image dual-stream DiT: architecture, diffusers-name round-trip,
and stage-engine integration (round-2 review item 4 — the repo's old
MMDiT serialized its own architecture; a real
`QwenImageTransformer2DModel` checkpoint could not load).

Reference surface: the model the reference drives at
`/root/reference/src/qwen_image/runner_adapter.py:8-13, 127-141`."""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vllm_omni_draft_tpu.models import diffusers_io
from vllm_omni_draft_tpu.models.qwen_image_dit import (
    QwenImageDiTConfig,
    init_params,
    make_denoiser,
    make_forward,
)

CFG = QwenImageDiTConfig(
    num_layers=2, num_attention_heads=2, attention_head_dim=16,
    joint_attention_dim=48, in_channels=16, out_channels=4, patch_size=2,
    axes_dims_rope=(4, 6, 6), dtype="float32",
)


def _inputs(B=2, hp=4, wp=4, Nt=6, key=0):
    ks = jax.random.split(jax.random.PRNGKey(key), 3)
    tokens = jax.random.normal(ks[0], (B, hp * wp, CFG.in_channels))
    txt = jax.random.normal(ks[1], (B, Nt, CFG.joint_attention_dim))
    mask = jnp.ones((B, Nt), jnp.int32)
    t = jnp.full((B,), 500.0)
    return tokens, txt, mask, t


def test_forward_shapes_and_determinism():
    params = init_params(CFG)
    fwd = jax.jit(make_forward(CFG), static_argnames=("img_shapes",))
    tokens, txt, mask, t = _inputs()
    out1 = fwd(params, tokens, txt, mask, t, (1, 4, 4))
    out2 = fwd(params, tokens, txt, mask, t, (1, 4, 4))
    assert out1.shape == (2, 16, CFG.patch_size ** 2 * CFG.out_channels)
    np.testing.assert_array_equal(np.asarray(out1), np.asarray(out2))


def test_text_mask_padding_is_inert():
    """Masked (padding) text keys must not influence the image output."""
    params = init_params(CFG)
    fwd = jax.jit(make_forward(CFG), static_argnames=("img_shapes",))
    tokens, txt, mask, t = _inputs(Nt=6)
    mask = mask.at[:, 4:].set(0)
    out_a = fwd(params, tokens, txt, mask, t, (1, 4, 4))
    # scribble on the masked text rows: output must not move
    txt_b = txt.at[:, 4:].set(99.0)
    out_b = fwd(params, tokens, txt_b, mask, t, (1, 4, 4))
    np.testing.assert_allclose(
        np.asarray(out_a), np.asarray(out_b), atol=1e-5
    )


def test_text_conditioning_matters():
    """Unmasked text must influence the image stream (joint attention is
    actually joint)."""
    params = init_params(CFG)
    # adaLN-zero makes blocks identity at init — nudge the gates so the
    # attention path is live
    params["blocks"]["img_mod"]["b"] = (
        params["blocks"]["img_mod"]["b"] + 0.5
    )
    fwd = jax.jit(make_forward(CFG), static_argnames=("img_shapes",))
    tokens, txt, mask, t = _inputs()
    out_a = fwd(params, tokens, txt, mask, t, (1, 4, 4))
    out_b = fwd(params, tokens, txt + 1.0, mask, t, (1, 4, 4))
    assert float(jnp.max(jnp.abs(out_a - out_b))) > 1e-6


def test_guidance_embeds_branch():
    cfg = QwenImageDiTConfig(
        num_layers=1, num_attention_heads=2, attention_head_dim=16,
        joint_attention_dim=32, in_channels=8, out_channels=2,
        axes_dims_rope=(4, 6, 6), guidance_embeds=True, dtype="float32",
    )
    params = init_params(cfg)
    # adaLN-zero leaves no conditioning path at init: open norm_out so
    # the (timestep+guidance) embedding reaches the output
    params["norm_out"]["w"] = (
        jax.random.normal(jax.random.PRNGKey(9), params["norm_out"]["w"].shape)
        * 0.1
    ).astype(params["norm_out"]["w"].dtype)
    fwd = jax.jit(make_forward(cfg), static_argnames=("img_shapes",))
    tokens = jnp.ones((1, 4, 8))
    txt = jnp.ones((1, 3, 32))
    mask = jnp.ones((1, 3), jnp.int32)
    t = jnp.full((1,), 100.0)
    out_a = fwd(params, tokens, txt, mask, t, (1, 2, 2), jnp.asarray([1.0]))
    out_b = fwd(params, tokens, txt, mask, t, (1, 2, 2), jnp.asarray([7.0]))
    assert float(jnp.max(jnp.abs(out_a - out_b))) > 1e-7


def test_diffusers_roundtrip_exact_names(tmp_path):
    """Save with diffusers-convention names -> reload -> identical
    forward. Also pins the exact name set so a drift from the public
    `QwenImageTransformer2DModel` convention fails loudly."""
    params = init_params(CFG)
    path = str(tmp_path / "transformer")
    diffusers_io.save_qwen_image_checkpoint(
        params, CFG, path, max_shard_bytes=200_000
    )
    # multi-shard + index written
    assert os.path.exists(os.path.join(path, diffusers_io.INDEX_NAME))
    with open(os.path.join(path, "config.json")) as f:
        assert json.load(f)["_class_name"] == "QwenImageTransformer2DModel"
    raw = diffusers_io._read_component(path)
    expect = {
        "img_in.weight", "txt_norm.weight",
        "time_text_embed.timestep_embedder.linear_1.weight",
        "transformer_blocks.0.img_mod.1.weight",
        "transformer_blocks.0.attn.to_q.weight",
        "transformer_blocks.0.attn.add_q_proj.weight",
        "transformer_blocks.0.attn.norm_added_q.weight",
        "transformer_blocks.0.attn.to_out.0.weight",
        "transformer_blocks.0.attn.to_add_out.weight",
        "transformer_blocks.1.img_mlp.net.0.proj.weight",
        "transformer_blocks.1.txt_mlp.net.2.weight",
        "norm_out.linear.weight", "proj_out.bias",
    }
    assert expect <= set(raw), expect - set(raw)

    # config.json (diffusers convention) does not carry dtype; pin f32
    # for the exactness comparison
    loaded, cfg2 = diffusers_io.load_qwen_image_weights(path, dtype="float32")
    assert cfg2.num_layers == CFG.num_layers
    fwd = jax.jit(make_forward(CFG), static_argnames=("img_shapes",))
    tokens, txt, mask, t = _inputs()
    out_a = fwd(params, tokens, txt, mask, t, (1, 4, 4))
    out_b = fwd(loaded, tokens, txt, mask, t, (1, 4, 4))
    np.testing.assert_allclose(
        np.asarray(out_a), np.asarray(out_b), atol=1e-6
    )


def test_load_rejects_missing_params(tmp_path):
    params = init_params(CFG)
    path = str(tmp_path / "transformer")
    diffusers_io.save_qwen_image_checkpoint(params, CFG, path)
    # remove one tensor from the single shard
    from safetensors import safe_open
    from safetensors.numpy import save_file

    f = os.path.join(path, diffusers_io.WEIGHTS_NAME)
    with safe_open(f, framework="np") as sf:
        flat = {k: sf.get_tensor(k) for k in sf.keys()
                if k != "transformer_blocks.0.attn.to_q.weight"}
    save_file(flat, f)
    with pytest.raises(ValueError, match="missing"):
        diffusers_io.load_qwen_image_weights(path)


def test_denoiser_runs_and_is_deterministic():
    params = init_params(CFG)
    den = jax.jit(make_denoiser(CFG, num_steps=3, img_shapes=(1, 4, 4)))
    tokens, txt, mask, _ = _inputs()
    out1 = den(params, tokens, txt, mask, 2.0)
    out2 = den(params, tokens, txt, mask, 2.0)
    assert out1.shape == tokens.shape
    np.testing.assert_array_equal(np.asarray(out1), np.asarray(out2))
    assert not np.any(np.isnan(np.asarray(out1)))


def test_stage_engine_runs_qwen_image_arch(tmp_path):
    """The diffusion stage engine detects and runs the dual-stream model
    from a saved QwenImageTransformer2DModel checkpoint directory."""
    from vllm_omni_draft_tpu.models.dit import DiffusionStageEngine
    from vllm_omni_draft_tpu.models.image_types import (
        ImageGenInputs,
        ImageOutputMode,
    )

    root = tmp_path / "ckpt"
    params = init_params(CFG)
    diffusers_io.save_qwen_image_checkpoint(
        params, CFG, str(root / "transformer")
    )
    eng = DiffusionStageEngine(checkpoint_dir=str(root))
    assert eng.arch == "qwen_image"
    np.random.seed(0)
    inp = ImageGenInputs(
        prompt_embeds=np.random.randn(1, 5, CFG.joint_attention_dim),
        height=64, width=64, num_inference_steps=2,
        output_mode=ImageOutputMode.LATENTS, seed=1,
    )
    out = eng.generate([inp])[0]
    lat = np.asarray(out.latents)
    assert lat.shape == (1, CFG.out_channels, 8, 8)
    assert not np.any(np.isnan(lat))


# ---------------------------------------------------------------------------
# Qwen-Image VAE (AutoencoderKLQwenImage)
# ---------------------------------------------------------------------------

from vllm_omni_draft_tpu.models.qwen_image_vae import (  # noqa: E402
    QwenImageVAE,
    QwenImageVAEConfig,
)

VCFG = QwenImageVAEConfig(
    base_dim=16, z_dim=4, dim_mult=(1, 2, 2), num_res_blocks=1,
    temperal_downsample=(False, True),
    latents_mean=tuple([0.05] * 4), latents_std=tuple([1.2] * 4),
)


def test_vae_encode_decode_shapes():
    vae = QwenImageVAE(VCFG)
    img = np.random.default_rng(0).standard_normal((1, 3, 32, 32))
    lat = np.asarray(vae.encode(img))
    assert lat.shape == (1, 4, 8, 8)  # 8x spatial stride (2 resamples + patching parity)
    out = np.asarray(vae.decode(lat))
    assert out.shape == (1, 3, 32, 32)
    assert not np.any(np.isnan(out))


def test_vae_diffusers_roundtrip(tmp_path):
    from vllm_omni_draft_tpu.models import diffusers_io

    vae = QwenImageVAE(VCFG)
    path = str(tmp_path / "vae")
    diffusers_io.save_qwen_image_vae(vae.params, VCFG, path)
    raw = diffusers_io._read_component(path)
    expect = {
        "encoder.conv_in.weight",
        "encoder.down_blocks.0.conv1.weight",
        "encoder.mid_block.resnets.0.norm1.gamma",
        "encoder.mid_block.attentions.0.to_qkv.weight",
        "decoder.up_blocks.0.conv1.weight",
        "decoder.conv_out.bias",
        "quant_conv.weight",
        "post_quant_conv.weight",
    }
    assert expect <= set(raw), expect - set(raw)
    # resample convs serialize under the Sequential index (.1)
    assert any(".resample.1.weight" in n for n in raw)

    vae2 = QwenImageVAE.from_diffusers(path)
    lat = np.random.default_rng(1).standard_normal((1, 4, 8, 8))
    np.testing.assert_allclose(
        np.asarray(vae.decode(lat)), np.asarray(vae2.decode(lat)),
        atol=1e-6,
    )


def test_vae_load_rejects_name_drift(tmp_path):
    import pytest as _pytest

    from vllm_omni_draft_tpu.models import diffusers_io
    from safetensors import safe_open
    from safetensors.numpy import save_file

    vae = QwenImageVAE(VCFG)
    path = str(tmp_path / "vae")
    diffusers_io.save_qwen_image_vae(vae.params, VCFG, path)
    f = os.path.join(path, diffusers_io.WEIGHTS_NAME)
    with safe_open(f, framework="np") as sf:
        flat = {k: sf.get_tensor(k) for k in sf.keys()}
    flat["encoder.bogus.weight"] = flat.pop("encoder.conv_in.weight")
    save_file(flat, f)
    with _pytest.raises(ValueError, match="mismatch"):
        diffusers_io.load_qwen_image_vae(path)


def test_stage_engine_full_qwen_image_checkpoint(tmp_path):
    """transformer/ + vae/ in one checkpoint dir: the stage engine loads
    BOTH faithful architectures and produces pixels."""
    from vllm_omni_draft_tpu.models import diffusers_io
    from vllm_omni_draft_tpu.models.dit import DiffusionStageEngine
    from vllm_omni_draft_tpu.models.image_types import (
        ImageGenInputs,
        ImageOutputMode,
    )
    from vllm_omni_draft_tpu.models.qwen_image_vae import init_params as vinit

    root = tmp_path / "ckpt"
    # DiT with out_channels == VAE z_dim
    dcfg = QwenImageDiTConfig(
        num_layers=1, num_attention_heads=2, attention_head_dim=16,
        joint_attention_dim=48, in_channels=16, out_channels=4,
        patch_size=2, axes_dims_rope=(4, 6, 6), dtype="float32",
    )
    diffusers_io.save_qwen_image_checkpoint(
        init_params(dcfg), dcfg, str(root / "transformer")
    )
    diffusers_io.save_qwen_image_vae(
        vinit(VCFG), VCFG, str(root / "vae")
    )
    eng = DiffusionStageEngine(checkpoint_dir=str(root))
    assert eng.arch == "qwen_image"
    assert isinstance(eng.vae, QwenImageVAE)
    np.random.seed(0)
    inp = ImageGenInputs(
        prompt_embeds=np.random.randn(1, 4, 48),
        height=64, width=64, num_inference_steps=1,
        output_mode=ImageOutputMode.PIXELS, seed=2,
    )
    out = eng.generate([inp])[0]
    px = np.asarray(out.pixels)
    assert px.shape[1] == 3 and not np.any(np.isnan(px))
