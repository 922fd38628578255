"""Model registry.

Maps HF `model_type` strings to (init_params, make_forward) factories —
the TPU-native analog of vLLM's model registry the reference plugs
`QwenImageGenModel` into (`src/qwen_image_gen/model.py:17-20`).
"""

from __future__ import annotations

_REGISTRY: dict[str, object] = {}


def register_model(name: str, module) -> None:
    _REGISTRY[name] = module


def get_model(name: str):
    # default family: qwen2-compatible dense decoders
    key = name if name in _REGISTRY else "qwen2"
    from vllm_omni_draft_tpu.models import qwen2  # noqa: F401  (self-register)

    if key not in _REGISTRY:
        raise KeyError(f"unknown model {name!r}; known: {sorted(_REGISTRY)}")
    return _REGISTRY[key]
