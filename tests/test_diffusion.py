"""Diffusion stage: DiT forward/denoise shapes and determinism, VAE
encode/decode shapes, input-schema validation (reference parity:
`src/qwen_image/types.py` validation + denoise loop behavior)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vllm_omni_draft_tpu.models.dit import (
    DiffusionStageEngine,
    DiTConfig,
    init_params,
    make_denoiser,
    make_forward,
)
from vllm_omni_draft_tpu.models.image_types import (
    ImageGenInputs,
    ImageOutputMode,
    ImageTask,
    validate_image_inputs,
)
from vllm_omni_draft_tpu.models.vae import VAE, VAEConfig

TINY_DIT = DiTConfig(
    latent_channels=4, patch_size=2, hidden_size=64, depth=2, num_heads=4,
    text_dim=32, dtype="float32",
)


def test_dit_forward_shapes_and_mask():
    cfg = TINY_DIT
    params = init_params(cfg)
    fwd = make_forward(cfg)
    B, C, H, W = 2, 4, 16, 16
    lat = jax.random.normal(jax.random.PRNGKey(0), (B, C, H, W))
    txt = jax.random.normal(jax.random.PRNGKey(1), (B, 6, 32))
    mask = jnp.asarray([[1, 1, 1, 0, 0, 0], [1, 1, 1, 1, 1, 1]])
    t = jnp.full((B,), 500.0)
    g = jnp.full((B,), 4.0)
    out = fwd(params, lat, txt, mask, t, g)
    assert out.shape == (B, C, H, W)
    assert not np.any(np.isnan(np.asarray(out)))
    # masked text tokens must not influence the output
    txt2 = txt.at[0, 3:].set(999.0)
    out2 = fwd(params, lat, txt2, mask, t, g)
    np.testing.assert_allclose(np.asarray(out[0]), np.asarray(out2[0]),
                               rtol=1e-5, atol=1e-5)


def test_denoise_loop_is_deterministic_and_conditional():
    cfg = TINY_DIT
    params = init_params(cfg)
    denoise = jax.jit(make_denoiser(cfg, num_steps=3))
    lat = jax.random.normal(jax.random.PRNGKey(0), (1, 4, 16, 16))
    txt = jax.random.normal(jax.random.PRNGKey(1), (1, 5, 32))
    mask = jnp.ones((1, 5), jnp.int32)
    a = denoise(params, lat, txt, mask, 3.0, jax.random.PRNGKey(2))
    b = denoise(params, lat, txt, mask, 3.0, jax.random.PRNGKey(2))
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # different conditioning changes the result
    c = denoise(params, lat, txt * 2, mask, 3.0, jax.random.PRNGKey(2))
    assert np.abs(np.asarray(a) - np.asarray(c)).max() > 1e-6


def test_vae_shapes_roundtrip():
    vae = VAE(VAEConfig(latent_channels=4, base_channels=16))
    img = jax.random.normal(jax.random.PRNGKey(0), (1, 3, 64, 64))
    z = vae.encode(img)
    assert z.shape == (1, 4, 8, 8)
    out = vae.decode(z)
    assert out.shape == (1, 3, 64, 64)
    assert float(jnp.max(jnp.abs(out))) <= 1.0  # tanh range


def test_stage_engine_t2i_latents_and_pixels():
    eng = DiffusionStageEngine(dit_config=TINY_DIT)
    eng.vae = VAE(VAEConfig(latent_channels=4, base_channels=16))
    inp = ImageGenInputs(
        prompt_embeds=np.random.randn(1, 4, 32).astype(np.float32),
        height=64, width=64, num_inference_steps=2, guidance_scale=2.0,
        seed=7, output_mode=ImageOutputMode.PIXELS_AND_LATENTS,
    )
    out = eng.generate([inp])[0]
    assert out.latents.shape == (1, 4, 8, 8)
    assert out.pixels.shape == (1, 3, 64, 64)
    # same seed => same image
    out2 = eng.generate([inp])[0]
    np.testing.assert_array_equal(np.asarray(out.latents), np.asarray(out2.latents))


def test_stage_engine_i2i_uses_image_latents():
    eng = DiffusionStageEngine(dit_config=TINY_DIT)
    il = np.random.randn(1, 4, 8, 8).astype(np.float32)
    inp = ImageGenInputs(
        image_latents=il, task=ImageTask.IMAGE_TO_IMAGE,
        height=64, width=64, num_inference_steps=2,
        output_mode=ImageOutputMode.LATENTS, seed=1,
    )
    out = eng.generate([inp])[0]
    assert out.latents.shape == (1, 4, 8, 8)
    assert out.pixels is None


@pytest.mark.parametrize(
    "bad",
    [
        dict(num_inference_steps=0),
        dict(guidance_scale=-1.0),
        dict(height=100),  # not multiple of 8
        dict(task=ImageTask.IMAGE_TO_IMAGE),  # missing image_latents
        dict(prompt_embeds=np.zeros((2, 3))),  # wrong ndim
    ],
)
def test_input_validation_rejects(bad):
    inp = ImageGenInputs(**bad)
    with pytest.raises(ValueError):
        validate_image_inputs(inp)


def test_image_gen_processor_end_to_end():
    """Text -> LM hidden-state embeddings -> DiT denoise; image -> VAE
    latents -> TI2I (the reference's processor contract)."""
    import jax
    from vllm_omni_draft_tpu.config import ModelConfig
    from vllm_omni_draft_tpu.models import qwen2
    from vllm_omni_draft_tpu.models.image_processor import ImageGenProcessor
    from vllm_omni_draft_tpu.core.tokenizer import ByteTokenizer

    lm_cfg = ModelConfig.tiny(vocab_size=258, hidden_size=32,
                              intermediate_size=64, num_heads=4,
                              num_kv_heads=2, head_dim=8, max_model_len=128)
    lm_params = qwen2.init_params(lm_cfg)
    vae = VAE(VAEConfig(latent_channels=4, base_channels=16))
    proc = ImageGenProcessor(
        lm_cfg, lm_params, ByteTokenizer(), vae=vae,
        prompt_template="<sys>{}", template_start_idx=5,
    )
    inp = proc.build_inputs_text_only("a red cube", height=64, width=64,
                                      num_inference_steps=2)
    assert inp.prompt_embeds.shape == (1, len("a red cube"), 32)

    # DiT consumes the conditioning (text_dim must match LM hidden)
    eng = DiffusionStageEngine(dit_config=DiTConfig(
        latent_channels=4, patch_size=2, hidden_size=64, depth=1,
        num_heads=4, text_dim=32, dtype="float32"))
    out = eng.generate([inp])[0]
    assert out.pixels.shape == (1, 3, 64, 64)

    # TI2I path
    img = jax.random.normal(jax.random.PRNGKey(0), (1, 3, 64, 64))
    inp2 = proc.build_inputs_with_image("edit it", img, height=64, width=64,
                                        num_inference_steps=2)
    assert inp2.image_latents.shape == (1, 4, 8, 8)
    out2 = eng.generate([inp2])[0]
    assert out2.pixels.shape == (1, 3, 64, 64)


def test_flash_attention_matches_dense():
    """The chunked online-softmax path must match materialized softmax
    (the FA3-equivalent for long image+text sequences)."""
    from vllm_omni_draft_tpu.models.dit import (
        _attention_dense,
        _attention_flash,
    )

    rng = jax.random.PRNGKey(0)
    B, N, H, Dh = 2, 1400, 4, 16  # N > FLASH_CHUNK and not a multiple
    q, k, v = (
        jax.random.normal(jax.random.fold_in(rng, i), (B, N, H, Dh))
        for i in range(3)
    )
    mask = jax.random.bernoulli(jax.random.fold_in(rng, 9), 0.9, (B, N))
    mask = mask.at[:, :8].set(True)  # no fully-masked rows
    ref = _attention_dense(q, k, v, mask)
    got = _attention_flash(q, k, v, mask)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_dit_long_sequence_uses_flash_path():
    """A forward with > FLASH_THRESHOLD joint tokens runs (flash path)
    and produces finite output."""
    cfg = TINY_DIT
    params = init_params(cfg)
    fwd = jax.jit(make_forward(cfg))
    B, C = 1, 4
    lat = jax.random.normal(jax.random.PRNGKey(0), (B, C, 64, 80))  # 640 img
    txt = jax.random.normal(jax.random.PRNGKey(1), (B, 600, 32))   # +600 txt
    mask = jnp.ones((B, 600), jnp.int32)
    out = fwd(params, lat, txt, mask, jnp.full((B,), 500.0), jnp.full((B,), 4.0))
    assert out.shape == (B, C, 64, 80)
    assert bool(jnp.isfinite(out).all())


def test_dit_rope_positions_matter():
    """3-axis rotary: permuting image content across spatial positions
    must NOT commute with the forward (position-aware attention), unlike
    a rope-free transformer where patch tokens are permutation-
    equivariant."""
    cfg = TINY_DIT
    params = init_params(cfg)
    fwd = jax.jit(make_forward(cfg))
    B, C, H, W = 1, 4, 8, 8
    lat = jax.random.normal(jax.random.PRNGKey(0), (B, C, H, W))
    txt = jax.random.normal(jax.random.PRNGKey(1), (B, 4, 32))
    mask = jnp.ones((B, 4), jnp.int32)
    t = jnp.full((B,), 500.0)
    g = jnp.full((B,), 4.0)
    out = fwd(params, lat, txt, mask, t, g)
    # flip the image left-right: if positions matter, out(flip) != flip(out)
    out_flip = fwd(params, lat[:, :, :, ::-1], txt, mask, t, g)
    assert not np.allclose(
        np.asarray(out_flip[:, :, :, ::-1]), np.asarray(out), atol=1e-4
    )


def test_dit_diffusers_checkpoint_roundtrip(tmp_path):
    """Diffusers-format DiT checkpoint: save (multi-shard) -> load ->
    identical params AND identical forward (the load_diffusers_weights
    capability, VERDICT r1 item 7)."""
    from vllm_omni_draft_tpu.models.diffusers_io import (
        load_dit_weights,
        save_dit_checkpoint,
    )
    import os

    cfg = TINY_DIT
    params = init_params(cfg)
    path = str(tmp_path / "transformer")
    save_dit_checkpoint(params, cfg, path, max_shard_bytes=100_000)
    shards = [f for f in os.listdir(path) if f.endswith(".safetensors")]
    assert len(shards) > 1  # sharded + index
    loaded, cfg2 = load_dit_weights(path, dtype="float32")
    for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(loaded)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    fwd = make_forward(cfg)
    B, C = 1, 4
    lat = jax.random.normal(jax.random.PRNGKey(0), (B, C, 8, 8))
    txt = jax.random.normal(jax.random.PRNGKey(1), (B, 4, 32))
    mask = jnp.ones((B, 4), jnp.int32)
    t = jnp.full((B,), 100.0)
    g = jnp.full((B,), 4.0)
    np.testing.assert_array_equal(
        np.asarray(fwd(params, lat, txt, mask, t, g)),
        np.asarray(fwd(loaded, lat, txt, mask, t, g)),
    )


def test_vae_diffusers_checkpoint_roundtrip(tmp_path):
    from vllm_omni_draft_tpu.models.diffusers_io import (
        load_vae_weights,
        save_vae_checkpoint,
    )

    cfg = VAEConfig(latent_channels=4, base_channels=16)
    vae = VAE(cfg)
    path = str(tmp_path / "vae")
    save_vae_checkpoint(vae.params, cfg, path)
    vae2 = VAE.from_diffusers(path)
    lat = jax.random.normal(jax.random.PRNGKey(0), (1, 4, 8, 8))
    np.testing.assert_array_equal(
        np.asarray(vae.decode(lat)), np.asarray(vae2.decode(lat))
    )


def test_stage_engine_from_checkpoint_dir(tmp_path):
    """DiffusionStageEngine(checkpoint_dir=...) loads transformer/ and
    vae/ components like a diffusers pipeline directory."""
    from vllm_omni_draft_tpu.models.diffusers_io import (
        save_dit_checkpoint,
        save_vae_checkpoint,
    )

    cfg = TINY_DIT
    params = init_params(cfg)
    save_dit_checkpoint(params, cfg, str(tmp_path / "transformer"))
    vcfg = VAEConfig(latent_channels=4, base_channels=16)
    save_vae_checkpoint(VAE(vcfg).params, vcfg, str(tmp_path / "vae"))

    eng = DiffusionStageEngine(checkpoint_dir=str(tmp_path))
    assert eng.cfg.depth == cfg.depth and eng.vae is not None
    out = eng.generate([ImageGenInputs(
        height=32, width=32, num_inference_steps=2, seed=0,
        output_mode=ImageOutputMode.PIXELS_AND_LATENTS,
    )])[0]
    assert out.latents.shape == (1, 4, 4, 4)
    assert out.pixels.shape == (1, 3, 32, 32)


def test_batched_generate_matches_sequential():
    """Round-4: generate() groups same-shape requests into ONE batched
    denoise + batched VAE decode; outputs must match one-at-a-time
    execution to float tolerance (per-sample seed + guidance as batch
    rows; text padded to the group max under the mask; XLA may tile
    batched reductions differently, so bit-identity is not guaranteed
    on CPU)."""
    eng = DiffusionStageEngine(dit_config=TINY_DIT)
    eng.vae = VAE(VAEConfig(latent_channels=4, base_channels=16))
    rng = np.random.default_rng(3)
    inps = [
        ImageGenInputs(
            prompt_embeds=rng.normal(size=(1, t, 32)).astype(np.float32),
            height=64, width=64, num_inference_steps=2,
            guidance_scale=g, seed=s,
            output_mode=ImageOutputMode.PIXELS_AND_LATENTS,
        )
        for (t, g, s) in [(4, 2.0, 7), (6, 1.0, 1), (4, 3.5, 2)]
    ]
    batched = eng.generate(inps)
    sequential = [eng.generate([i])[0] for i in inps]
    for b, s in zip(batched, sequential):
        np.testing.assert_allclose(
            np.asarray(b.latents), np.asarray(s.latents), rtol=1e-4, atol=1e-5
        )
        np.testing.assert_allclose(
            np.asarray(b.pixels), np.asarray(s.pixels), rtol=1e-4, atol=1e-5
        )


def test_batched_generate_mixed_shapes_groups_correctly():
    """Different sizes/steps split into separate groups; output order
    matches input order."""
    eng = DiffusionStageEngine(dit_config=TINY_DIT)
    rng = np.random.default_rng(5)
    mk = lambda h, st, seed: ImageGenInputs(
        prompt_embeds=rng.normal(size=(1, 4, 32)).astype(np.float32),
        height=h, width=64, num_inference_steps=st, seed=seed,
        output_mode=ImageOutputMode.LATENTS,
    )
    inps = [mk(64, 2, 0), mk(32, 2, 1), mk(64, 2, 2), mk(64, 3, 3)]
    outs = eng.generate(inps)
    assert outs[0].latents.shape == (1, 4, 8, 8)
    assert outs[1].latents.shape == (1, 4, 4, 8)
    assert outs[2].latents.shape == (1, 4, 8, 8)
    assert outs[3].latents.shape == (1, 4, 8, 8)
    seq = [eng.generate([i])[0] for i in inps]
    for b, s in zip(outs, seq):
        np.testing.assert_allclose(
            np.asarray(b.latents), np.asarray(s.latents), rtol=1e-4, atol=1e-5
        )
