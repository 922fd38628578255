"""Diffusers-format checkpoint IO for the diffusion stage (DiT + VAE).

Implements the `load_diffusers_weights` capability the reference gets
from `diffusers.from_pretrained`
(`/root/reference/src/qwen_image/runner_adapter.py:127-141` drives
`QwenImageTransformer2DModel` + `AutoencoderKLQwenImage` loaded that
way): a directory with `config.json` + `diffusion_pytorch_model
[.safetensors | -0000i-of-0000n.safetensors + .index.json]` per
component, torch tensor conventions (Linear [O, I], Conv2d [O, I, kh,
kw]).

Name registry: our TPU-native DiT stacks layers ([L, ...] scan
parameters), so the per-layer diffusers names `transformer_blocks.{i}.*`
map to slices of the stacks. The registry covers THIS architecture's
serialization in the diffusers container format; mapping the exact
`QwenImageTransformer2DModel` parameter names requires the real
checkpoint to validate against, which this zero-egress container cannot
fetch — the format machinery (sharding, index, dtype, layout) is what
is proven here (round-trip + forward-parity tests in
tests/test_diffusion.py).
"""

from __future__ import annotations

import json
import os

import jax
import jax.numpy as jnp
import numpy as np

WEIGHTS_NAME = "diffusion_pytorch_model.safetensors"
INDEX_NAME = "diffusion_pytorch_model.safetensors.index.json"

# ---------------------------------------------------------------------------
# DiT name registry: (param tree path) <-> diffusers-style names
# ---------------------------------------------------------------------------

_DIT_GLOBAL = {
    ("patch_in", "w"): "img_in.weight",
    ("patch_in", "b"): "img_in.bias",
    ("text_in", "w"): "txt_in.weight",
    ("time_mlp", "w1"): "time_embed.linear_1.weight",
    ("time_mlp", "w2"): "time_embed.linear_2.weight",
    ("final_mod", "w"): "norm_out.linear.weight",
    ("final_mod", "b"): "norm_out.linear.bias",
    ("patch_out", "w"): "proj_out.weight",
}
_DIT_LAYER = {
    ("mod", "w"): "transformer_blocks.{i}.mod.linear.weight",
    ("mod", "b"): "transformer_blocks.{i}.mod.linear.bias",
    ("qkv", "w"): "transformer_blocks.{i}.attn.qkv.weight",
    ("qkv", "b"): "transformer_blocks.{i}.attn.qkv.bias",
    ("proj", "w"): "transformer_blocks.{i}.attn.proj.weight",
    ("mlp_up", "w"): "transformer_blocks.{i}.mlp.up.weight",
    ("mlp_down", "w"): "transformer_blocks.{i}.mlp.down.weight",
}


def _tree_get(tree, path):
    node = tree
    for k in path:
        if not isinstance(node, dict) or k not in node:
            return None
        node = node[k]
    return node


def _tree_set(tree, path, value):
    node = tree
    for k in path[:-1]:
        node = node.setdefault(k, {})
    node[path[-1]] = value


def _read_component(path: str) -> dict[str, np.ndarray]:
    """Read a diffusers component dir (single- or multi-shard)."""
    from safetensors import safe_open

    files = []
    if os.path.exists(os.path.join(path, INDEX_NAME)):
        with open(os.path.join(path, INDEX_NAME)) as f:
            index = json.load(f)
        files = sorted(set(index["weight_map"].values()))
    elif os.path.exists(os.path.join(path, WEIGHTS_NAME)):
        files = [WEIGHTS_NAME]
    else:
        files = sorted(
            f for f in os.listdir(path) if f.endswith(".safetensors")
        )
    if not files:
        raise FileNotFoundError(f"no diffusers weights under {path}")
    out: dict[str, np.ndarray] = {}
    for fname in files:
        with safe_open(os.path.join(path, fname), framework="np") as sf:
            for name in sf.keys():
                out[name] = sf.get_tensor(name)
    return out


def _to_np(a) -> np.ndarray:
    a = jnp.asarray(a)
    if a.dtype == jnp.bfloat16:
        a = jax.lax.bitcast_convert_type(a, jnp.uint16)
    return np.asarray(a)


def _from_np(arr: np.ndarray, dt) -> jax.Array:
    if arr.dtype == np.uint16:  # bf16 raw bits
        return jax.lax.bitcast_convert_type(
            jnp.asarray(arr), jnp.bfloat16
        ).astype(dt)
    return jnp.asarray(arr).astype(dt)


# ---------------------------------------------------------------------------
# DiT
# ---------------------------------------------------------------------------


def save_dit_checkpoint(params: dict, cfg, path: str,
                        max_shard_bytes: int | None = None) -> None:
    """Write DiT params in the diffusers container format (config.json +
    weights [+ index]); the [L, ...] layer stacks are unstacked into
    per-block names."""
    flat: dict[str, np.ndarray] = {}
    for tree_path, name in _DIT_GLOBAL.items():
        node = _tree_get(params, tree_path)
        if node is not None:
            flat[name] = _to_np(node)
    L = cfg.depth
    for tree_path, pattern in _DIT_LAYER.items():
        node = _tree_get(params["layers"], tree_path)
        if node is None:
            continue
        stacked = _to_np(node)
        for i in range(L):
            flat[pattern.format(i=i)] = stacked[i]
    _write_component(flat, path)
    with open(os.path.join(path, "config.json"), "w") as f:
        json.dump(
            {
                "_class_name": "VotDiTModel",
                "latent_channels": cfg.latent_channels,
                "patch_size": cfg.patch_size,
                "hidden_size": cfg.hidden_size,
                "depth": cfg.depth,
                "num_heads": cfg.num_heads,
                "text_dim": cfg.text_dim,
                "mlp_ratio": cfg.mlp_ratio,
            },
            f, indent=1,
        )
    if max_shard_bytes is not None:
        _reshard(path, max_shard_bytes)


def load_dit_config(path: str):
    from vllm_omni_draft_tpu.models.dit import DiTConfig

    with open(os.path.join(path, "config.json")) as f:
        raw = json.load(f)
    fields = {k: raw[k] for k in (
        "latent_channels", "patch_size", "hidden_size", "depth",
        "num_heads", "text_dim", "mlp_ratio",
    ) if k in raw}
    return DiTConfig(**fields)


def load_dit_weights(path: str, cfg=None, dtype=None) -> tuple[dict, object]:
    """Load a diffusers-format DiT checkpoint into the stacked param
    tree. Returns (params, config)."""
    cfg = cfg or load_dit_config(path)
    dt = {"bfloat16": jnp.bfloat16, "float32": jnp.float32}[
        dtype or cfg.dtype
    ]
    raw = _read_component(path)
    params: dict = {"layers": {}}
    for tree_path, name in _DIT_GLOBAL.items():
        if name in raw:
            _tree_set(params, tree_path, _from_np(raw[name], dt))
    L = cfg.depth
    for tree_path, pattern in _DIT_LAYER.items():
        name0 = pattern.format(i=0)
        if name0 not in raw:
            continue
        stacked = jnp.stack(
            [_from_np(raw[pattern.format(i=i)], dt) for i in range(L)]
        )
        _tree_set(params["layers"], tree_path, stacked)
    missing = [n for n in _DIT_GLOBAL.values() if n not in raw]
    if missing:
        raise ValueError(f"DiT checkpoint {path} missing params: {missing}")
    return params, cfg


# ---------------------------------------------------------------------------
# VAE (name registry generated from the param tree structure)
# ---------------------------------------------------------------------------


def _vae_names(params: dict):
    """Yield (tree_path, diffusers-style name) for the VAE tree."""
    for comp in ("decoder", "encoder"):
        tree = params[comp]
        yield (comp, "in"), f"{comp}.conv_in.weight"
        for i, blk in enumerate(tree["blocks"]):
            for k in blk:
                yield (comp, "blocks", i, k), f"{comp}.blocks.{i}.{k}.weight"
        yield (comp, "final"), f"{comp}.conv_out.weight"


def save_vae_checkpoint(params: dict, cfg, path: str) -> None:
    flat = {}
    for tree_path, name in _vae_names(params):
        node = params
        for k in tree_path:
            node = node[k]
        flat[name] = _to_np(node)
    _write_component(flat, path)
    with open(os.path.join(path, "config.json"), "w") as f:
        json.dump(
            {
                "_class_name": "VotVAEModel",
                "latent_channels": cfg.latent_channels,
                "base_channels": cfg.base_channels,
                "image_channels": cfg.image_channels,
                "scaling_factor": cfg.scaling_factor,
            },
            f, indent=1,
        )


def load_vae_weights(path: str, cfg=None) -> tuple[dict, object]:
    """Load a diffusers-format VAE checkpoint; returns (params, config).
    This is the `load_diffusers_weights` promised by models/vae.py."""
    from vllm_omni_draft_tpu.models.vae import VAE, VAEConfig

    with open(os.path.join(path, "config.json")) as f:
        raw_cfg = json.load(f)
    cfg = cfg or VAEConfig(**{
        k: raw_cfg[k] for k in (
            "latent_channels", "base_channels", "image_channels",
            "scaling_factor",
        ) if k in raw_cfg
    })
    raw = _read_component(path)
    # template tree (correct shapes/structure), then fill by name
    template = VAE(cfg).params
    params = jax.tree.map(lambda x: x, template)
    for tree_path, name in _vae_names(template):
        if name not in raw:
            raise ValueError(f"VAE checkpoint {path} missing {name}")
        node = params
        for k in tree_path[:-1]:
            node = node[k]
        node[tree_path[-1]] = _from_np(raw[name], jnp.float32)
    return params, cfg


# ---------------------------------------------------------------------------


def _write_component(flat: dict[str, np.ndarray], path: str) -> None:
    from safetensors.numpy import save_file

    os.makedirs(path, exist_ok=True)
    save_file(flat, os.path.join(path, WEIGHTS_NAME))


def _reshard(path: str, max_shard_bytes: int) -> None:
    """Split a just-written single file into the sharded layout."""
    from safetensors import safe_open
    from safetensors.numpy import save_file

    src = os.path.join(path, WEIGHTS_NAME)
    tensors: dict[str, np.ndarray] = {}
    with safe_open(src, framework="np") as sf:
        for name in sf.keys():
            tensors[name] = sf.get_tensor(name)
    shards: list[dict[str, np.ndarray]] = [{}]
    size = 0
    for name, arr in tensors.items():
        if size > 0 and size + arr.nbytes > max_shard_bytes:
            shards.append({})
            size = 0
        shards[-1][name] = arr
        size += arr.nbytes
    if len(shards) == 1:
        return
    os.remove(src)
    n = len(shards)
    weight_map = {}
    total = 0
    for i, shard in enumerate(shards):
        fname = f"diffusion_pytorch_model-{i + 1:05d}-of-{n:05d}.safetensors"
        save_file(shard, os.path.join(path, fname))
        for name, arr in shard.items():
            weight_map[name] = fname
            total += arr.nbytes
    with open(os.path.join(path, INDEX_NAME), "w") as f:
        json.dump({"metadata": {"total_size": total},
                   "weight_map": weight_map}, f)


# ---------------------------------------------------------------------------
# Qwen-Image dual-stream DiT (models/qwen_image_dit.py) — the EXACT
# public diffusers `QwenImageTransformer2DModel` parameter names, so a
# real Qwen-Image checkpoint directory loads as-is (round-2 review item
# 4; the architecture the reference drives at
# `/root/reference/src/qwen_image/runner_adapter.py:8-13, 127-141`).
# ---------------------------------------------------------------------------

QWEN_IMAGE_GLOBAL = {
    ("img_in", "w"): "img_in.weight",
    ("img_in", "b"): "img_in.bias",
    ("txt_norm", "w"): "txt_norm.weight",
    ("txt_in", "w"): "txt_in.weight",
    ("txt_in", "b"): "txt_in.bias",
    ("time_embed", "w1"):
        "time_text_embed.timestep_embedder.linear_1.weight",
    ("time_embed", "b1"):
        "time_text_embed.timestep_embedder.linear_1.bias",
    ("time_embed", "w2"):
        "time_text_embed.timestep_embedder.linear_2.weight",
    ("time_embed", "b2"):
        "time_text_embed.timestep_embedder.linear_2.bias",
    ("norm_out", "w"): "norm_out.linear.weight",
    ("norm_out", "b"): "norm_out.linear.bias",
    ("proj_out", "w"): "proj_out.weight",
    ("proj_out", "b"): "proj_out.bias",
}

QWEN_IMAGE_GUIDANCE = {
    ("guidance_embed", "w1"):
        "time_text_embed.guidance_embedder.linear_1.weight",
    ("guidance_embed", "b1"):
        "time_text_embed.guidance_embedder.linear_1.bias",
    ("guidance_embed", "w2"):
        "time_text_embed.guidance_embedder.linear_2.weight",
    ("guidance_embed", "b2"):
        "time_text_embed.guidance_embedder.linear_2.bias",
}

# per-block names; {i} = block index. img_mod/txt_mod index ".1" because
# diffusers wraps them as nn.Sequential(SiLU, Linear).
QWEN_IMAGE_LAYER = {
    ("img_mod", "w"): "transformer_blocks.{i}.img_mod.1.weight",
    ("img_mod", "b"): "transformer_blocks.{i}.img_mod.1.bias",
    ("txt_mod", "w"): "transformer_blocks.{i}.txt_mod.1.weight",
    ("txt_mod", "b"): "transformer_blocks.{i}.txt_mod.1.bias",
    ("img_q", "w"): "transformer_blocks.{i}.attn.to_q.weight",
    ("img_q", "b"): "transformer_blocks.{i}.attn.to_q.bias",
    ("img_k", "w"): "transformer_blocks.{i}.attn.to_k.weight",
    ("img_k", "b"): "transformer_blocks.{i}.attn.to_k.bias",
    ("img_v", "w"): "transformer_blocks.{i}.attn.to_v.weight",
    ("img_v", "b"): "transformer_blocks.{i}.attn.to_v.bias",
    ("txt_q", "w"): "transformer_blocks.{i}.attn.add_q_proj.weight",
    ("txt_q", "b"): "transformer_blocks.{i}.attn.add_q_proj.bias",
    ("txt_k", "w"): "transformer_blocks.{i}.attn.add_k_proj.weight",
    ("txt_k", "b"): "transformer_blocks.{i}.attn.add_k_proj.bias",
    ("txt_v", "w"): "transformer_blocks.{i}.attn.add_v_proj.weight",
    ("txt_v", "b"): "transformer_blocks.{i}.attn.add_v_proj.bias",
    ("img_qnorm", "w"): "transformer_blocks.{i}.attn.norm_q.weight",
    ("img_knorm", "w"): "transformer_blocks.{i}.attn.norm_k.weight",
    ("txt_qnorm", "w"): "transformer_blocks.{i}.attn.norm_added_q.weight",
    ("txt_knorm", "w"): "transformer_blocks.{i}.attn.norm_added_k.weight",
    ("img_out", "w"): "transformer_blocks.{i}.attn.to_out.0.weight",
    ("img_out", "b"): "transformer_blocks.{i}.attn.to_out.0.bias",
    ("txt_out", "w"): "transformer_blocks.{i}.attn.to_add_out.weight",
    ("txt_out", "b"): "transformer_blocks.{i}.attn.to_add_out.bias",
    ("img_mlp1", "w"): "transformer_blocks.{i}.img_mlp.net.0.proj.weight",
    ("img_mlp1", "b"): "transformer_blocks.{i}.img_mlp.net.0.proj.bias",
    ("img_mlp2", "w"): "transformer_blocks.{i}.img_mlp.net.2.weight",
    ("img_mlp2", "b"): "transformer_blocks.{i}.img_mlp.net.2.bias",
    ("txt_mlp1", "w"): "transformer_blocks.{i}.txt_mlp.net.0.proj.weight",
    ("txt_mlp1", "b"): "transformer_blocks.{i}.txt_mlp.net.0.proj.bias",
    ("txt_mlp2", "w"): "transformer_blocks.{i}.txt_mlp.net.2.weight",
    ("txt_mlp2", "b"): "transformer_blocks.{i}.txt_mlp.net.2.bias",
}


def save_qwen_image_checkpoint(params: dict, cfg, path: str,
                               max_shard_bytes: int | None = None) -> None:
    """Write a Qwen-Image DiT param tree as a diffusers-format
    `QwenImageTransformer2DModel` checkpoint directory."""
    flat: dict[str, np.ndarray] = {}
    globals_map = dict(QWEN_IMAGE_GLOBAL)
    if cfg.guidance_embeds:
        globals_map.update(QWEN_IMAGE_GUIDANCE)
    for tree_path, name in globals_map.items():
        node = _tree_get(params, tree_path)
        if node is None:
            raise ValueError(f"param tree missing {tree_path}")
        flat[name] = _to_np(node)
    for tree_path, pattern in QWEN_IMAGE_LAYER.items():
        node = _tree_get(params["blocks"], tree_path)
        if node is None:
            raise ValueError(f"param tree missing blocks.{tree_path}")
        stacked = _to_np(node)
        for i in range(cfg.num_layers):
            flat[pattern.format(i=i)] = stacked[i]
    _write_component(flat, path)
    with open(os.path.join(path, "config.json"), "w") as f:
        json.dump(
            {
                "_class_name": "QwenImageTransformer2DModel",
                "num_layers": cfg.num_layers,
                "num_attention_heads": cfg.num_attention_heads,
                "attention_head_dim": cfg.attention_head_dim,
                "joint_attention_dim": cfg.joint_attention_dim,
                "in_channels": cfg.in_channels,
                "out_channels": cfg.out_channels,
                "patch_size": cfg.patch_size,
                "guidance_embeds": cfg.guidance_embeds,
                "axes_dims_rope": list(cfg.axes_dims_rope),
            },
            f, indent=1,
        )
    if max_shard_bytes is not None:
        _reshard(path, max_shard_bytes)


def load_qwen_image_config(path: str):
    from vllm_omni_draft_tpu.models.qwen_image_dit import QwenImageDiTConfig

    with open(os.path.join(path, "config.json")) as f:
        raw = json.load(f)
    fields = {}
    for k in ("num_layers", "num_attention_heads", "attention_head_dim",
              "joint_attention_dim", "in_channels", "out_channels",
              "patch_size", "guidance_embeds"):
        if k in raw:
            fields[k] = raw[k]
    if "axes_dims_rope" in raw:
        fields["axes_dims_rope"] = tuple(raw["axes_dims_rope"])
    return QwenImageDiTConfig(**fields)


def load_qwen_image_weights(path: str, cfg=None,
                            dtype=None) -> tuple[dict, object]:
    """Load a diffusers-format `QwenImageTransformer2DModel` checkpoint
    (single- or multi-shard) into the scan-stacked param tree of
    models/qwen_image_dit.py. Returns (params, config)."""
    cfg = cfg or load_qwen_image_config(path)
    dt = {"bfloat16": jnp.bfloat16, "float32": jnp.float32}[
        dtype or cfg.dtype
    ]
    raw = _read_component(path)
    globals_map = dict(QWEN_IMAGE_GLOBAL)
    if cfg.guidance_embeds:
        globals_map.update(QWEN_IMAGE_GUIDANCE)
    params: dict = {"blocks": {}}
    missing = []
    for tree_path, name in globals_map.items():
        if name in raw:
            _tree_set(params, tree_path, _from_np(raw[name], dt))
        else:
            missing.append(name)
    for tree_path, pattern in QWEN_IMAGE_LAYER.items():
        if pattern.format(i=0) not in raw:
            missing.append(pattern.format(i=0))
            continue
        stacked = jnp.stack(
            [
                _from_np(raw[pattern.format(i=i)], dt)
                for i in range(cfg.num_layers)
            ]
        )
        _tree_set(params["blocks"], tree_path, stacked)
    if missing:
        raise ValueError(
            f"Qwen-Image checkpoint {path} missing params: {missing[:8]}"
            + ("..." if len(missing) > 8 else "")
        )
    return params, cfg


# ---------------------------------------------------------------------------
# Qwen-Image VAE (models/qwen_image_vae.py) — AutoencoderKLQwenImage.
# The param tree's dict keys ARE the diffusers module path segments, so
# serialization is a generic flatten/unflatten with "."-joined names
# (encoder.down_blocks.0.conv1.weight, mid_block.attentions.0.to_qkv...).
# ---------------------------------------------------------------------------


def _flatten_tree(tree, prefix=""):
    out = {}
    for k, v in tree.items():
        name = f"{prefix}.{k}" if prefix else k
        if isinstance(v, dict):
            out.update(_flatten_tree(v, name))
        else:
            out[name] = _to_np(v)
    return out


def _unflatten_tree(flat: dict, dt):
    tree: dict = {}
    for name, arr in flat.items():
        parts = name.split(".")
        node = tree
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = _from_np(arr, dt)
    return tree


def save_qwen_image_vae(params: dict, cfg, path: str,
                        max_shard_bytes: int | None = None) -> None:
    _write_component(_flatten_tree(params), path)
    with open(os.path.join(path, "config.json"), "w") as f:
        json.dump(
            {
                "_class_name": "AutoencoderKLQwenImage",
                "base_dim": cfg.base_dim,
                "z_dim": cfg.z_dim,
                "dim_mult": list(cfg.dim_mult),
                "num_res_blocks": cfg.num_res_blocks,
                "attn_scales": list(cfg.attn_scales),
                "temperal_downsample": list(cfg.temperal_downsample),
                "latents_mean": list(cfg.latents_mean)
                if cfg.latents_mean else None,
                "latents_std": list(cfg.latents_std)
                if cfg.latents_std else None,
            },
            f, indent=1,
        )
    if max_shard_bytes is not None:
        _reshard(path, max_shard_bytes)


def load_qwen_image_vae(path: str, dtype=None) -> tuple[dict, object]:
    from vllm_omni_draft_tpu.models.qwen_image_vae import QwenImageVAEConfig

    with open(os.path.join(path, "config.json")) as f:
        raw = json.load(f)
    fields = {}
    for k in ("base_dim", "z_dim", "num_res_blocks"):
        if k in raw:
            fields[k] = raw[k]
    for k in ("dim_mult", "attn_scales", "temperal_downsample",
              "latents_mean", "latents_std"):
        if raw.get(k) is not None:
            fields[k] = tuple(raw[k])
    cfg = QwenImageVAEConfig(**fields)
    dt = {"bfloat16": jnp.bfloat16, "float32": jnp.float32}[
        dtype or cfg.dtype
    ]
    flat = _read_component(path)
    params = _unflatten_tree(flat, dt)
    # structural check against a fresh init: any missing/extra names are
    # a checkpoint-convention drift and must be loud
    from vllm_omni_draft_tpu.models.qwen_image_vae import init_params

    expect = set(_flatten_tree(init_params(cfg)))
    got = set(flat)
    if expect != got:
        missing = sorted(expect - got)[:6]
        extra = sorted(got - expect)[:6]
        raise ValueError(
            f"AutoencoderKLQwenImage checkpoint mismatch at {path}: "
            f"missing={missing} extra={extra}"
        )
    return params, cfg
