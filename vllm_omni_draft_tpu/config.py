"""Configuration system.

Three tiers, mirroring the reference's config surface (SURVEY.md §5;
reference: `src/qwen_image_gen/config.py:34-66` dataclass + env factory,
vLLM `VllmConfig` threading, and YAML stage configs for the Omni pipeline
`src/doc/meeting_notes.md:14`):

1. typed dataclasses with validation,
2. an env-var factory (`from_env`) with kwargs overrides and
   unknown-key rejection,
3. YAML stage-config loading for multi-stage (Omni) pipelines.
"""

from __future__ import annotations

import dataclasses
import json
import os
from dataclasses import dataclass, field
from typing import Any

ENV_PREFIX = "VOT_"  # vllm-omni-tpu


def _env(name: str, default: Any, cast) -> Any:
    raw = os.environ.get(ENV_PREFIX + name)
    if raw is None:
        return default
    if cast is bool:
        return raw.lower() in ("1", "true", "yes", "on")
    return cast(raw)


def _apply_overrides(cfg, overrides: dict[str, Any]):
    """Apply kwargs overrides, rejecting unknown keys (reference behavior:
    `src/qwen_image_gen/config.py:57-66`)."""
    names = {f.name for f in dataclasses.fields(cfg)}
    for k, v in overrides.items():
        if k not in names:
            raise ValueError(f"Unknown config field {k!r} for {type(cfg).__name__}")
        setattr(cfg, k, v)
    # re-validate: overrides must not bypass __post_init__ invariants
    post = getattr(cfg, "__post_init__", None)
    if post is not None:
        post()
    return cfg


@dataclass
class ModelConfig:
    """Architecture + dtype of one model (target or draft)."""

    model: str = "qwen2"  # registry key or HF-style path
    # architecture hyperparams (filled from HF config.json when loading
    # a checkpoint; settable directly for tests/synthetic models)
    vocab_size: int = 151936
    hidden_size: int = 3584
    intermediate_size: int = 18944
    num_layers: int = 28
    num_heads: int = 28
    num_kv_heads: int = 4
    head_dim: int | None = None  # defaults to hidden_size // num_heads
    rope_theta: float = 1_000_000.0
    rms_norm_eps: float = 1e-6
    tie_word_embeddings: bool = False
    max_model_len: int = 8192
    dtype: str = "bfloat16"  # compute dtype
    # weight-only quantization: None | "int8" | "int4"
    quantization: str | None = None
    quant_group_size: int = 128  # group size along in-features for int4
    # KV cache dtype: "bfloat16" | "float32" | "fp8" (float8_e4m3fn) |
    # "int8" (TPU-native fixed-point; see ops/quant.py KV8_AMAX)
    kv_cache_dtype: str = "bfloat16"
    # calibrated KV range multiplier for the 1-byte formats (reference
    # capability: vLLM's --kv-cache-dtype calibration scales). int8 KV
    # represents |v| <= KV8_AMAX * kv_scale; set < 1 for models whose
    # post-RoPE k/v are small to cut quantization noise.
    kv_scale: float = 1.0
    # fuse the q/k/v (and gate/up) projection stacks into single matmuls:
    # fewer device ops per layer, which is what per-layer serial latency
    # is made of (PERF_NOTES.md). TP>1 keeps them separate (megatron
    # shardings slice each projection's output dim independently).
    fuse_projections: bool = False
    # multimodal
    is_multimodal: bool = False
    vision_config: dict[str, Any] | None = None
    # path to safetensors checkpoint dir (None => random init)
    checkpoint_dir: str | None = None
    # "auto" | "pallas" | "xla": which paged-attention path this model's
    # layers use. auto routes SMALL models (per-seq KV span <= 512 KiB —
    # spec drafts) to the fused XLA gather path, whose zero launch
    # overhead beats the kernel at tiny shapes (round-3 profile: the
    # draft's ~28 kernel calls/iter at ~55 us each were mostly launch).
    attention_backend: str = "auto"
    seed: int = 0

    def __post_init__(self):
        if self.head_dim is None:
            self.head_dim = self.hidden_size // self.num_heads
        if self.num_heads % self.num_kv_heads != 0:
            raise ValueError("num_heads must be divisible by num_kv_heads")
        if self.quantization not in (None, "int8", "int4"):
            raise ValueError(f"bad quantization {self.quantization!r}")
        if self.kv_cache_dtype not in ("bfloat16", "float32", "fp8", "int8"):
            raise ValueError(f"bad kv_cache_dtype {self.kv_cache_dtype!r}")
        if self.attention_backend not in ("auto", "pallas", "xla"):
            raise ValueError(
                f"bad attention_backend {self.attention_backend!r}"
            )

    @classmethod
    def tiny(cls, **overrides) -> "ModelConfig":
        """A tiny config for CPU tests."""
        cfg = cls(
            vocab_size=512,
            hidden_size=64,
            intermediate_size=128,
            num_layers=2,
            num_heads=4,
            num_kv_heads=2,
            head_dim=16,
            max_model_len=256,
            dtype="float32",
        )
        return _apply_overrides(cfg, overrides)

    @classmethod
    def from_hf_config(cls, path: str, **overrides) -> "ModelConfig":
        """Build from an HF-format config.json in `path`."""
        with open(os.path.join(path, "config.json")) as f:
            hf = json.load(f)
        cfg = cls(
            model=hf.get("model_type", "qwen2"),
            vocab_size=hf["vocab_size"],
            hidden_size=hf["hidden_size"],
            intermediate_size=hf["intermediate_size"],
            num_layers=hf["num_hidden_layers"],
            num_heads=hf["num_attention_heads"],
            num_kv_heads=hf.get("num_key_value_heads", hf["num_attention_heads"]),
            head_dim=hf.get("head_dim"),
            rope_theta=hf.get("rope_theta", 1e6),
            rms_norm_eps=hf.get("rms_norm_eps", 1e-6),
            tie_word_embeddings=hf.get("tie_word_embeddings", False),
            max_model_len=hf.get("max_position_embeddings", 8192),
            checkpoint_dir=path,
        )
        return _apply_overrides(cfg, overrides)


@dataclass
class CacheConfig:
    """Paged KV-cache configuration (reference spec:
    `src/doc/VLLM_V1_Interface.md:57-64` KV init protocol)."""

    block_size: int = 16  # tokens per block
    num_blocks: int | None = None  # None => profile free HBM at init
    gpu_memory_utilization: float = 0.90  # fraction of HBM to use
    enable_prefix_caching: bool = True
    num_cpu_blocks: int = 0  # host-offload pool (swap), 0 = disabled

    def __post_init__(self):
        if self.block_size & (self.block_size - 1):
            raise ValueError("block_size must be a power of two")
        if self.block_size > 128:
            # one whole block must fit a Pallas KV chunk: the prefill
            # kernel's scratch is sized for CHUNK_T <= 128 (measured VMEM
            # stack OOM at 256). 128 is also the measured decode optimum
            # (PERF_NOTES block-size sweep) — larger buys nothing.
            raise ValueError("block_size must be <= 128")


@dataclass
class SchedulerConfig:
    """Continuous-batching scheduler knobs (reference spec:
    `src/doc/engine_core.md:280-313`)."""

    max_num_seqs: int = 64  # padded running-batch slots
    max_num_batched_tokens: int = 1024  # per-step token budget
    max_model_len: int = 8192
    enable_chunked_prefill: bool = True
    # fused decode iterations per device call (device-side token feedback;
    # amortizes host dispatch/sync — essential on TPU where per-call
    # latency would otherwise dominate small decode steps). Requests may
    # overshoot stop conditions by up to decode_steps-1 iterations; the
    # scheduler truncates.
    decode_steps: int = 1
    # token-count buckets for static shapes (pad prefill chunks up)
    prefill_buckets: tuple[int, ...] = (64, 256, 1024)
    # >1 enables step_with_batch_queue (reference: PP batch queue,
    # `engine_core.md:97, 124-126`): up to this many disjoint batches in
    # flight — the host schedules/dispatches batch N+1 while batch N's
    # device step runs (lag-1 readback; also the PP-stage hook)
    max_concurrent_batches: int = 1
    # lag-1 decode pipelining: dispatch decode step N+1 from step N's
    # DEVICE-side tokens/lens before reading step N back (vLLM's async
    # scheduling, SURVEY §2.2 EngineCore). Token streams are identical to
    # the synchronous path (same fns, same RNG folds); saves one host
    # sync (~30 ms tunneled) per decode step. Applies to the plain step()
    # loop; structured/logprobs batches fall back to synchronous.
    async_decode_streak: bool = True

    def __post_init__(self):
        self.prefill_buckets = tuple(sorted(set(self.prefill_buckets)))
        if self.prefill_buckets[-1] < self.max_num_batched_tokens:
            self.prefill_buckets = self.prefill_buckets + (self.max_num_batched_tokens,)


@dataclass
class ParallelConfig:
    """Device-mesh layout. TP shards weights/KV over ICI; DP replicates
    engines (reference surface: SURVEY.md §2.3)."""

    tensor_parallel_size: int = 1
    data_parallel_size: int = 1
    pipeline_parallel_size: int = 1  # kept as a hook; TP dominates on TPU
    # jax.distributed coordination (multi-host)
    distributed_init: bool = False
    coordinator_address: str | None = None
    num_hosts: int = 1
    host_id: int = 0

    @property
    def world_size(self) -> int:
        return (
            self.tensor_parallel_size
            * self.data_parallel_size
            * self.pipeline_parallel_size
        )


@dataclass
class SpeculativeConfig:
    """Draft/verify speculative decoding (reference spec:
    `src/doc/VLLM_V1_Interface.md:74`, scheduler spec-token map
    `src/doc/engine_core.md:294-296`)."""

    draft_model: ModelConfig | None = None
    num_speculative_tokens: int = 4  # k
    # Propose only from the first `draft_vocab_size` token ids (BPE ids are
    # roughly frequency-ordered, so a prefix covers most proposal mass).
    # Cuts the draft's dominant cost — the [V, D] lm_head read — ~V/Vp x.
    # Rejection sampling stays exactly lossless for ANY proposal
    # distribution, so this only trades acceptance rate for draft speed.
    draft_vocab_size: int | None = None
    # Apply the request's top-k/top-p filter to the DRAFT's proposal
    # distribution (matches the target's filtered support — vLLM
    # behavior). False skips the K per-iter draft threshold searches
    # (plain temperature softmax q); output law stays exactly lossless
    # for any q — only the acceptance rate can shift.
    draft_sampling_filter: bool = True

    def __post_init__(self):
        if self.num_speculative_tokens < 1:
            raise ValueError("num_speculative_tokens must be >= 1")
        if self.draft_vocab_size is not None and self.draft_model is not None:
            if not 0 < self.draft_vocab_size <= self.draft_model.vocab_size:
                raise ValueError("draft_vocab_size out of range")


@dataclass
class EngineConfig:
    """Top-level config threaded through every layer (the reference threads
    `VllmConfig` the same way)."""

    model: ModelConfig = field(default_factory=ModelConfig)
    cache: CacheConfig = field(default_factory=CacheConfig)
    scheduler: SchedulerConfig = field(default_factory=SchedulerConfig)
    parallel: ParallelConfig = field(default_factory=ParallelConfig)
    speculative: SpeculativeConfig | None = None
    tokenizer: str | None = None  # path; None => byte-level test tokenizer
    seed: int = 0
    enforce_eager: bool = False  # disable jit (debugging)

    def __post_init__(self):
        # keep scheduler/model length in sync
        self.scheduler.max_model_len = min(
            self.scheduler.max_model_len, self.model.max_model_len
        )

    @classmethod
    def from_env(cls, **overrides) -> "EngineConfig":
        """Env-var factory: VOT_MODEL, VOT_BLOCK_SIZE, ... with kwargs
        overrides (pattern from reference `src/qwen_image_gen/config.py`)."""
        cfg = cls(
            model=ModelConfig(
                model=_env("MODEL", "qwen2", str),
                dtype=_env("DTYPE", "bfloat16", str),
                quantization=_env("QUANT", None, str),
                kv_cache_dtype=_env("KV_DTYPE", "bfloat16", str),
            ),
            cache=CacheConfig(
                block_size=_env("BLOCK_SIZE", 16, int),
                gpu_memory_utilization=_env("MEM_UTIL", 0.90, float),
            ),
            scheduler=SchedulerConfig(
                max_num_seqs=_env("MAX_NUM_SEQS", 64, int),
                max_num_batched_tokens=_env("MAX_NUM_BATCHED_TOKENS", 1024, int),
            ),
            parallel=ParallelConfig(
                tensor_parallel_size=_env("TP", 1, int),
                data_parallel_size=_env("DP", 1, int),
            ),
        )
        return _apply_overrides(cfg, overrides)


# ---------------------------------------------------------------------------
# YAML stage configs for the Omni multi-stage pipeline
# (contract: `load_stage_configs_from_model` in reference
#  `src/CI_test/tests/test_omni_llm.py:233-297`)
# ---------------------------------------------------------------------------


@dataclass
class StageConfig:
    """One stage of an Omni pipeline (e.g. AR thinker -> DiT talker)."""

    stage_id: int = 0
    stage_type: str = "llm"  # "llm" | "diffusion" | "talker"
    model: str = ""
    engine_args: dict[str, Any] = field(default_factory=dict)
    final_output: bool = False
    final_output_type: str | None = None  # "text" | "image" | "audio" | "latents"


def load_stage_configs_from_model(model_path: str) -> list[StageConfig]:
    """Load per-model stage configs from `<model_path>/omni_stages.yaml`
    (or .json fallback). Mirrors the reference contract where stage configs
    default from the model when not passed explicitly
    (`src/CI_test/tests/test_omni_llm.py:286-297`)."""
    yaml_path = os.path.join(model_path, "omni_stages.yaml")
    json_path = os.path.join(model_path, "omni_stages.json")
    if os.path.exists(yaml_path):
        raw = _load_yaml(yaml_path)
    elif os.path.exists(json_path):
        with open(json_path) as f:
            raw = json.load(f)
    else:
        # default: single final text stage over the model itself
        raw = {"stages": [{"stage_type": "llm", "model": model_path,
                           "final_output": True, "final_output_type": "text"}]}
    stages = []
    for i, s in enumerate(raw.get("stages", [])):
        stages.append(
            StageConfig(
                stage_id=i,
                stage_type=s.get("stage_type", "llm"),
                model=s.get("model", model_path),
                engine_args=s.get("engine_args", {}),
                final_output=bool(s.get("final_output", False)),
                final_output_type=s.get("final_output_type"),
            )
        )
    return stages


def _load_yaml(path: str):
    try:
        import yaml  # type: ignore

        with open(path) as f:
            return yaml.safe_load(f)
    except ImportError:
        # minimal fallback: accept JSON-compatible YAML
        with open(path) as f:
            return json.load(f)
