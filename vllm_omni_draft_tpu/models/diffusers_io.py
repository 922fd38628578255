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
