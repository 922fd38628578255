"""TP-sharded dual-stream DiT parity vs single device (VERDICT r4 item
6; reference dual-engine design assumes a big-memory image engine,
engine_core.md:879-1008 — here megatron specs over the tp axis,
parallel/dit_sharding.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vllm_omni_draft_tpu.config import ParallelConfig
from vllm_omni_draft_tpu.models.qwen_image_dit import (
    QwenImageDiTConfig,
    init_params,
    make_denoiser,
    make_forward,
)
from vllm_omni_draft_tpu.parallel.dit_sharding import (
    dit_param_shardings,
    shard_dit_params,
)
from vllm_omni_draft_tpu.parallel.mesh import make_mesh

CFG = QwenImageDiTConfig(
    # heads divisible by tp=4; mlp hidden 4*D = 256 divisible too
    num_layers=2, num_attention_heads=4, attention_head_dim=16,
    joint_attention_dim=48, in_channels=16, out_channels=4, patch_size=2,
    axes_dims_rope=(4, 6, 6), dtype="float32",
)


def _inputs(B=2, hp=4, wp=4, Nt=6, key=0):
    ks = jax.random.split(jax.random.PRNGKey(key), 3)
    tokens = jax.random.normal(ks[0], (B, hp * wp, CFG.in_channels))
    txt = jax.random.normal(ks[1], (B, Nt, CFG.joint_attention_dim))
    mask = jnp.ones((B, Nt), jnp.int32)
    t = jnp.full((B,), 500.0)
    return tokens, txt, mask, t, (1, hp, wp)


@pytest.mark.parametrize("tp", [4, 8])
def test_sharded_dit_forward_matches_single_device(tp):
    if jax.device_count() < tp:
        pytest.skip("not enough devices")
    params = init_params(CFG)
    fwd = make_forward(CFG)
    tokens, txt, mask, t, shapes = _inputs()
    ref = fwd(params, tokens, txt, mask, t, shapes)

    mesh = make_mesh(ParallelConfig(tensor_parallel_size=tp))
    sparams = shard_dit_params(params, mesh)
    got = jax.jit(
        lambda p, a, b, c, d: fwd(p, a, b, c, d, shapes)
    )(sparams, tokens, txt, mask, t)
    np.testing.assert_allclose(
        np.asarray(ref), np.asarray(got), rtol=2e-4, atol=2e-4
    )


def test_sharded_dit_denoise_matches_single_device():
    """Full CFG denoise loop (the bench path) under the sharded params."""
    if jax.device_count() < 4:
        pytest.skip("not enough devices")
    params = init_params(CFG)
    tokens, txt, mask, _, shapes = _inputs()
    den = make_denoiser(CFG, num_steps=3, img_shapes=shapes)
    ref = den(params, tokens, txt, mask, 2.0)

    mesh = make_mesh(ParallelConfig(tensor_parallel_size=4))
    sparams = shard_dit_params(params, mesh)
    got = jax.jit(lambda p, a, b, c: den(p, a, b, c, 2.0))(
        sparams, tokens, txt, mask
    )
    np.testing.assert_allclose(
        np.asarray(ref), np.asarray(got), rtol=5e-4, atol=5e-4
    )


def test_dit_shardings_cover_big_leaves():
    """Every block matmul weight must actually shard (the memory story:
    ~40 GB of blocks -> ~40/tp GB per chip); IO leaves replicate."""
    params = init_params(CFG)
    mesh = make_mesh(ParallelConfig(tensor_parallel_size=4))
    sh = dit_param_shardings(mesh, params)
    from jax.sharding import PartitionSpec as P

    blocks = sh["blocks"]
    for name in ("img_q", "txt_v", "img_mlp1", "txt_mlp1"):
        assert blocks[name]["w"].spec == P(None, "tp", None), name
    for name in ("img_out", "txt_out", "img_mlp2", "txt_mlp2"):
        assert blocks[name]["w"].spec == P(None, None, "tp"), name
    assert sh["img_in"]["w"].spec == P(None, None)
