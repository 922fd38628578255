"""Checkpoint loading (HF safetensors -> stacked JAX pytree) and
checkpoint-side quantization.

Capability parity: vLLM's weight loader + quantized checkpoint conversion
(reference loads via HF `from_pretrained`, `src/qwen_image_gen/model.py:52-65`;
quant bit-widths set by BASELINE.json north_star).
"""

from __future__ import annotations

import glob
import os

import jax
import jax.numpy as jnp
import numpy as np

from vllm_omni_draft_tpu.config import ModelConfig
from vllm_omni_draft_tpu.ops import quant as quant_ops

# Stacked-layout key -> HF per-layer name pattern (qwen2 family)
_HF_LAYER_MAP = {
    ("ln1",): "model.layers.{i}.input_layernorm.weight",
    ("q", "w"): "model.layers.{i}.self_attn.q_proj.weight",
    ("q", "b"): "model.layers.{i}.self_attn.q_proj.bias",
    ("k", "w"): "model.layers.{i}.self_attn.k_proj.weight",
    ("k", "b"): "model.layers.{i}.self_attn.k_proj.bias",
    ("v", "w"): "model.layers.{i}.self_attn.v_proj.weight",
    ("v", "b"): "model.layers.{i}.self_attn.v_proj.bias",
    ("o", "w"): "model.layers.{i}.self_attn.o_proj.weight",
    ("ln2",): "model.layers.{i}.post_attention_layernorm.weight",
    ("gate", "w"): "model.layers.{i}.mlp.gate_proj.weight",
    ("up", "w"): "model.layers.{i}.mlp.up_proj.weight",
    ("down", "w"): "model.layers.{i}.mlp.down_proj.weight",
}


def _read_safetensors(path: str) -> dict[str, np.ndarray]:
    """Read every *.safetensors shard in `path` into one name->array dict."""
    from safetensors import safe_open

    tensors: dict[str, np.ndarray] = {}
    files = sorted(glob.glob(os.path.join(path, "*.safetensors")))
    if not files:
        raise FileNotFoundError(f"no .safetensors files under {path}")
    for f in files:
        with safe_open(f, framework="np") as sf:
            for name in sf.keys():
                tensors[name] = sf.get_tensor(name)
    return tensors


def load_params(cfg: ModelConfig, dtype=None) -> dict:
    """Load an HF qwen2-family checkpoint into the stacked-layer layout of
    models/qwen2.py. bfloat16 tensors are read as-is (numpy has no bf16 —
    safetensors hands back uint16 views which we bitcast via jax)."""
    assert cfg.checkpoint_dir, "cfg.checkpoint_dir not set"
    dt = dtype or {"bfloat16": jnp.bfloat16, "float32": jnp.float32}[cfg.dtype]
    raw = _read_safetensors(cfg.checkpoint_dir)

    def get(name: str) -> jax.Array:
        arr = raw[name]
        if arr.dtype == np.uint16:  # bf16 stored as raw bits
            return jax.lax.bitcast_convert_type(jnp.asarray(arr), jnp.bfloat16)
        return jnp.asarray(arr)

    L = cfg.num_layers
    layers: dict = {}
    for key_path, pattern in _HF_LAYER_MAP.items():
        name0 = pattern.format(i=0)
        if name0 not in raw:
            continue  # e.g. no q/k/v bias in some variants
        stacked = jnp.stack([get(pattern.format(i=i)) for i in range(L)]).astype(dt)
        node = layers
        for k in key_path[:-1]:
            node = node.setdefault(k, {})
        if len(key_path) == 1:
            layers[key_path[0]] = stacked
        else:
            node[key_path[-1]] = stacked

    params = {
        "embed": get("model.embed_tokens.weight").astype(dt),
        "layers": layers,
        "final_norm": get("model.norm.weight").astype(dt),
    }
    if not cfg.tie_word_embeddings and "lm_head.weight" in raw:
        params["lm_head"] = {"w": get("lm_head.weight").astype(dt)}
    return params


# ---------------------------------------------------------------------------
# Quantization of a loaded/initialized param tree
# ---------------------------------------------------------------------------

_QUANT_TARGETS = ("q", "k", "v", "o", "gate", "up", "down")


def quantize_params(params: dict, method: str, group_size: int = 128) -> dict:
    """Quantize the stacked linear weights to int8/int4 (weight-only).
    Embeddings, norms, and biases stay in the compute dtype; lm_head is
    quantized too (it is a verify-path matmul).

    Δppl gates: ≤0.1 (int8) / ≤0.3 (int4) — BASELINE.json.
    """
    assert method in ("int8", "int4"), method

    def quant_stacked(w: jax.Array) -> dict:
        # w: [L, O, I] — quantize each layer independently
        if method == "int8":
            return jax.vmap(quant_ops.quantize_int8)(w)
        g = min(group_size, w.shape[-1])
        return jax.vmap(lambda x: quant_ops.quantize_int4(x, g))(w)

    out = {"embed": params["embed"], "final_norm": params["final_norm"], "layers": {}}
    for name, node in params["layers"].items():
        if name in _QUANT_TARGETS:
            qd = quant_stacked(node["w"])
            if "b" in node:
                qd["b"] = node["b"]
            out["layers"][name] = qd
        else:
            out["layers"][name] = node
    if "lm_head" in params:
        w = params["lm_head"]["w"]
        if method == "int8":
            qh = quant_ops.quantize_int8(w)
        else:
            qh = quant_ops.quantize_int4(w, min(group_size, w.shape[-1]))
        # pad vocab rows to a tile-friendly multiple (zero-scale rows);
        # compute_logits slices back to the real vocab
        out["lm_head"] = quant_ops.pad_out_rows(qh)
    return out


def param_bytes(params) -> int:
    return sum(x.size * x.dtype.itemsize for x in jax.tree.leaves(params))


def save_hf_checkpoint(
    params: dict,
    cfg: ModelConfig,
    path: str,
    max_shard_bytes: int | None = None,
) -> None:
    """Write a stacked param tree as an HF-format qwen2 checkpoint
    (config.json + model.safetensors[.index.json]) — the inverse of
    `load_params`, usable by HF `from_pretrained` too. Multi-shard when
    `max_shard_bytes` is set (writes the standard index.json). Parity:
    the reference names "state saving" as an EngineCore duty
    (`src/doc/engine_core.md:18`)."""
    import json

    from safetensors.numpy import save_file

    os.makedirs(path, exist_ok=True)
    flat: dict[str, np.ndarray] = {}

    def to_np(a) -> np.ndarray:
        a = jnp.asarray(a)
        if a.dtype == jnp.bfloat16:  # numpy has no bf16: store raw bits
            a = jax.lax.bitcast_convert_type(a, jnp.uint16)
        return np.asarray(a)

    L = cfg.num_layers
    for key_path, pattern in _HF_LAYER_MAP.items():
        node = params["layers"]
        for k in key_path:
            if not isinstance(node, dict) or k not in node:
                node = None
                break
            node = node[k]
        if node is None:
            continue
        stacked = to_np(node)
        for i in range(L):
            flat[pattern.format(i=i)] = stacked[i]
    flat["model.embed_tokens.weight"] = to_np(params["embed"])
    flat["model.norm.weight"] = to_np(params["final_norm"])
    if "lm_head" in params and "w" in params["lm_head"]:
        flat["lm_head.weight"] = to_np(params["lm_head"]["w"])

    hf_cfg = {
        "model_type": "qwen2",
        "vocab_size": cfg.vocab_size,
        "hidden_size": cfg.hidden_size,
        "intermediate_size": cfg.intermediate_size,
        "num_hidden_layers": cfg.num_layers,
        "num_attention_heads": cfg.num_heads,
        "num_key_value_heads": cfg.num_kv_heads,
        "max_position_embeddings": cfg.max_model_len,
        "rope_theta": cfg.rope_theta,
        "rms_norm_eps": cfg.rms_norm_eps,
        "tie_word_embeddings": cfg.tie_word_embeddings,
    }
    with open(os.path.join(path, "config.json"), "w") as f:
        json.dump(hf_cfg, f, indent=1)

    if max_shard_bytes is None:
        save_file(flat, os.path.join(path, "model.safetensors"))
        return
    # greedy sharding by size, standard HF naming + index
    shards: list[dict[str, np.ndarray]] = [{}]
    sizes = [0]
    for name, arr in flat.items():
        nb = arr.nbytes
        if sizes[-1] > 0 and sizes[-1] + nb > max_shard_bytes:
            shards.append({})
            sizes.append(0)
        shards[-1][name] = arr
        sizes[-1] += nb
    n = len(shards)
    weight_map = {}
    for i, shard in enumerate(shards):
        fname = f"model-{i + 1:05d}-of-{n:05d}.safetensors"
        save_file(shard, os.path.join(path, fname))
        for name in shard:
            weight_map[name] = fname
    with open(os.path.join(path, "model.safetensors.index.json"), "w") as f:
        json.dump(
            {"metadata": {"total_size": int(sum(sizes))},
             "weight_map": weight_map},
            f,
        )


def fuse_projection_stacks(params: dict) -> dict:
    """Concatenate the q/k/v stacks into one "qkv" stack and gate/up into
    one "gate_up" stack (output-dim concat, valid for dense and both
    quantized forms since rows quantize independently). Halves the matmul
    count on the attention input side — per-layer serial op-issue latency
    is a measured ~45% of a 7B decode step (PERF_NOTES.md). The forward
    (models/qwen2.py) dispatches on key presence. TP callers must NOT
    fuse: megatron shardings split each projection's output dim."""

    def cat(nodes):
        keys = nodes[0].keys()
        return {k: jnp.concatenate([n[k] for n in nodes], axis=1) for k in keys}

    lyr = dict(params["layers"])
    lyr["qkv"] = cat([lyr.pop("q"), lyr.pop("k"), lyr.pop("v")])
    lyr["gate_up"] = cat([lyr.pop("gate"), lyr.pop("up")])
    return {**params, "layers": lyr}
