"""Observability: scheduler/iteration/request stats.

Same taxonomy as the reference's engine stats plane
(`src/doc/engine_core.md:192-206`: scheduler_stats, IterationStats,
logger_manager.record; RequestStateStats `engine_core.md:617`) plus the
spec-decode acceptance counters BASELINE.json makes first-class.
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field


@dataclass
class SchedulerStats:
    num_running: int = 0
    num_waiting: int = 0
    num_preempted_total: int = 0
    num_swapped_out_total: int = 0  # preemptions saved to the host pool
    num_swapped_in_total: int = 0   # host-pool restores (skipped recompute)
    kv_blocks_free: int = 0
    kv_blocks_total: int = 0
    prefix_cache_hit_tokens: int = 0
    prefix_cache_query_tokens: int = 0

    @property
    def kv_usage(self) -> float:
        if self.kv_blocks_total == 0:
            return 0.0
        return 1.0 - self.kv_blocks_free / self.kv_blocks_total


@dataclass
class SpecDecodeStats:
    num_draft_tokens: int = 0
    num_accepted_tokens: int = 0
    num_steps: int = 0

    @property
    def acceptance_rate(self) -> float:
        if self.num_draft_tokens == 0:
            return 0.0
        return self.num_accepted_tokens / self.num_draft_tokens

    @property
    def mean_tokens_per_step(self) -> float:
        if self.num_steps == 0:
            return 0.0
        return (self.num_accepted_tokens + self.num_steps) / self.num_steps


@dataclass
class IterationStats:
    num_prompt_tokens: int = 0
    num_generation_tokens: int = 0
    step_time_s: float = 0.0


@dataclass
class RequestStats:
    arrival_time: float = field(default_factory=time.monotonic)
    first_scheduled_time: float | None = None
    first_token_time: float | None = None
    finish_time: float | None = None

    @property
    def ttft_s(self) -> float | None:
        if self.first_token_time is None:
            return None
        return self.first_token_time - self.arrival_time

    @property
    def e2e_s(self) -> float | None:
        if self.finish_time is None:
            return None
        return self.finish_time - self.arrival_time
