"""Request lifecycle types.

Capability parity with the reference's request plane: per-request state with
incremental outputs, DELTA vs FINAL_ONLY output kinds, finish reasons, and
pooling (tensor) outputs for non-text stages
(reference spec: `src/doc/engine_core.md:412-835`).
"""

from __future__ import annotations

import enum
import time
from dataclasses import dataclass, field
from typing import Any


class RequestStatus(enum.IntEnum):
    WAITING = 0
    RUNNING = 1
    PREEMPTED = 2
    FINISHED_STOPPED = 3     # hit a stop token / stop string
    FINISHED_LENGTH = 4      # hit max_tokens or max_model_len
    FINISHED_ABORTED = 5
    FINISHED_IGNORED = 6     # e.g. prompt longer than model len

    @property
    def is_finished(self) -> bool:
        return self >= RequestStatus.FINISHED_STOPPED


FINISH_REASON = {
    RequestStatus.FINISHED_STOPPED: "stop",
    RequestStatus.FINISHED_LENGTH: "length",
    RequestStatus.FINISHED_ABORTED: "abort",
    RequestStatus.FINISHED_IGNORED: "ignored",
}


class OutputKind(enum.Enum):
    CUMULATIVE = "cumulative"  # full text so far each step
    DELTA = "delta"            # only new text each step
    FINAL_ONLY = "final_only"  # one output at the end


@dataclass
class SamplingParams:
    """Per-request sampling configuration."""

    n: int = 1                    # completions per prompt (parent/child fan-out)
    max_tokens: int = 128
    temperature: float = 1.0      # 0.0 => greedy
    top_p: float = 1.0
    top_k: int = 0                # 0 => disabled
    min_tokens: int = 0
    stop_token_ids: tuple[int, ...] = ()
    stop: tuple[str, ...] = ()
    seed: int | None = None
    ignore_eos: bool = False
    logprobs: int | None = None   # top-k logprobs to return (None = off)
    # top-k logprobs over PROMPT positions (None = off; reference:
    # prompt-logprobs mode of the logprobs processor, engine_core.md:412-475)
    prompt_logprobs: int | None = None
    output_kind: OutputKind = OutputKind.CUMULATIVE
    # structured output: a core.structured.Grammar constraining emissions
    # (grammar-constrained requests decode one token per device call)
    grammar: Any = None

    def __post_init__(self):
        if self.n < 1:
            raise ValueError("n must be >= 1")
        if self.max_tokens < 1:
            raise ValueError("max_tokens must be >= 1")
        if self.temperature < 0:
            raise ValueError("temperature must be >= 0")
        if not (0 < self.top_p <= 1.0):
            raise ValueError("top_p must be in (0, 1]")
        if isinstance(self.stop, str):
            self.stop = (self.stop,)
        self.stop = tuple(self.stop)
        self.stop_token_ids = tuple(self.stop_token_ids)

    @property
    def is_greedy(self) -> bool:
        return self.temperature == 0.0


@dataclass
class Request:
    """Engine-internal request state."""

    request_id: str
    prompt_token_ids: list[int]
    sampling_params: SamplingParams
    arrival_time: float = field(default_factory=time.monotonic)
    # multimodal: embeddings to splice into prefill at image-token positions
    mm_inputs: Any = None
    status: RequestStatus = RequestStatus.WAITING
    output_token_ids: list[int] = field(default_factory=list)
    # paged-KV bookkeeping (managed by the KV cache manager)
    block_ids: list[int] = field(default_factory=list)
    num_computed_tokens: int = 0  # tokens whose KV is materialized
    num_cached_tokens: int = 0    # prefix-cache hits (surfaced per request,
                                  # reference: engine_core.md:273-274)
    # spec decode: draft tokens proposed for the next step
    spec_token_ids: list[int] = field(default_factory=list)
    # per-output-token top logprobs (when sampling_params.logprobs set)
    logprobs: list[dict[int, float]] = field(default_factory=list)
    # per-prompt-position top logprobs (entry i = distribution that
    # predicted prompt token i; entry 0 is always None)
    prompt_logprobs: list[dict[int, float] | None] | None = None
    # engine slot index while RUNNING (-1 when not resident)
    slot: int = -1
    # output processing
    num_streamed_tokens: int = 0
    events: list[tuple[str, float]] = field(default_factory=list)
    first_token_time: float | None = None

    @property
    def num_prompt_tokens(self) -> int:
        return len(self.prompt_token_ids)

    @property
    def num_tokens(self) -> int:
        return len(self.prompt_token_ids) + len(self.output_token_ids)

    @property
    def all_token_ids(self) -> list[int]:
        return self.prompt_token_ids + self.output_token_ids

    @property
    def is_finished(self) -> bool:
        return self.status.is_finished

    def record(self, event: str) -> None:
        self.events.append((event, time.monotonic()))


@dataclass
class CompletionOutput:
    """One completion (index within a request)."""

    index: int
    text: str
    token_ids: list[int]
    finish_reason: str | None = None
    logprobs: list[dict[int, float]] | None = None
    cumulative_logprob: float | None = None


@dataclass
class RequestOutput:
    """What the user receives (streamed or final)."""

    request_id: str
    prompt_token_ids: list[int]
    outputs: list[CompletionOutput]
    finished: bool
    num_cached_tokens: int = 0
    prompt_logprobs: list[dict[int, float] | None] | None = None
    metrics: dict[str, float] = field(default_factory=dict)


@dataclass
class PoolingRequestOutput:
    """Tensor output for non-text stages (images/audio/latents), bypassing
    detokenization (reference: pooling path `src/doc/engine_core.md:800-813`)."""

    request_id: str
    data: Any  # jax.Array or numpy array
    finished: bool = True
