"""vllm_omni_draft_tpu — a TPU-native quantized serving engine.

A from-scratch JAX/XLA/Pallas framework with the capability surface of the
reference `AliciaCW/vllm-omni-draft` (a vLLM-v1 overlay; see SURVEY.md):

- draft/verify speculative decoding with lossless rejection sampling
- weight-only INT8/INT4 quantization, FP8 KV cache
- block-table paged KV cache with Pallas paged-attention kernels
- step-level continuous-batching scheduler + engine core
- streaming output processing, async serving front end
- multimodal (vision-token) prefill and a multi-stage Omni pipeline
- tensor/data parallel scaling over a `jax.sharding.Mesh`

Design stance (TPU-first, not a port): a single-controller Python host
drives statically-shaped, jit-compiled device steps; XLA emits all
collectives; Pallas provides the paged-attention / dequant-matmul /
rejection-sampling kernels the reference gets from CUDA.
"""

__version__ = "0.1.0"

from vllm_omni_draft_tpu.config import (  # noqa: F401
    CacheConfig,
    EngineConfig,
    ModelConfig,
    ParallelConfig,
    SchedulerConfig,
    SpeculativeConfig,
)
from vllm_omni_draft_tpu.core.request import (  # noqa: F401
    Request,
    RequestOutput,
    RequestStatus,
    SamplingParams,
)

__all__ = [
    "CacheConfig",
    "EngineConfig",
    "ModelConfig",
    "ParallelConfig",
    "SchedulerConfig",
    "SpeculativeConfig",
    "Request",
    "RequestOutput",
    "RequestStatus",
    "SamplingParams",
]
