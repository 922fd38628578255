"""EngineCore: the step loop.

Rebuilds the reference's EngineCore surface (`src/doc/engine_core.md:70-127`,
`src/doc/VLLM_V1_Interface.md:36-92`): add_request / abort_requests /
step() = schedule → execute → update, KV-cache initialization by HBM
profiling, utility ops (stats, profiling), and an executor-failure
callback hook. The executor/collective_rpc plane collapses into the
single-controller runner — on TPU, XLA is the executor.
"""

from __future__ import annotations

import time
from typing import Callable

from vllm_omni_draft_tpu.config import EngineConfig
from vllm_omni_draft_tpu.core.request import Request
from vllm_omni_draft_tpu.core.runner import ModelRunner
from vllm_omni_draft_tpu.core.scheduler import Scheduler
from vllm_omni_draft_tpu.utils.stats import IterationStats


class EngineCore:
    """In-process engine: scheduler + runner + step loop. Token-level only —
    detokenization/streaming live in the client-side OutputProcessor, same
    split as the reference (`engine_core.md:187-207`)."""

    def __init__(
        self,
        config: EngineConfig,
        executor_fail_callback: Callable[[Exception], None] | None = None,
    ):
        self.config = config
        self.runner = ModelRunner(config, num_blocks=None)
        self.scheduler = Scheduler(
            config.scheduler,
            config.cache,
            self.runner.num_blocks,
            config.speculative,
        )
        from vllm_omni_draft_tpu.core.structured import StructuredOutputManager

        self.structured = StructuredOutputManager(config.model.vocab_size)
        self.runner.structured = self.structured
        self.executor_fail_callback = executor_fail_callback
        self.iteration_stats = IterationStats()
        # batch queue (reference: `engine_core.md:97, 124-126` — PP batch
        # pipelining; here also the lag-1 host/device overlap)
        from collections import deque

        self.max_concurrent_batches = max(
            1, config.scheduler.max_concurrent_batches
        )
        self.batch_queue: deque = deque()
        self.step_fn = (
            self.step_with_batch_queue
            if self.max_concurrent_batches > 1
            else self.step
        )
        # lag-1 decode streak state: (sched, PendingStep) of the one
        # dispatched-but-unresolved decode step (async_decode_streak)
        self._pending: tuple | None = None
        # host KV-swap pool: request_id -> host arrays saved by swap_out
        # (scheduler emits the block moves; the engine executes them)
        self._swap_store: dict[str, dict] = {}

    def add_request(self, request: Request) -> None:
        if request.sampling_params.grammar is not None:
            request.sampling_params.grammar.validate(self.config.model.vocab_size)
            self.structured.add(request.request_id, request.sampling_params.grammar)
        self.scheduler.add_request(request)

    def abort_requests(self, request_ids: list[str]) -> None:
        aborted = self.scheduler.abort_requests(request_ids)
        for req in aborted:
            self._swap_store.pop(req.request_id, None)
            self.runner.release_slot(req)

    def has_unfinished(self) -> bool:
        return self.scheduler.has_unfinished()


    def _execute_swaps(self, sched) -> None:
        """Perform the scheduler's KV swap work orders. swap_out MUST run
        before this step's dispatch (the freed blocks are being reused by
        this very step); swap_in targets blocks freshly allocated this
        round, which nothing else touches until the request decodes."""
        for rid, ids in sched.swap_out:
            self._swap_store[rid] = self.runner.swap_out_blocks(ids)
        for rid, ids in sched.swap_in:
            host_kv = self._swap_store.pop(rid, None)
            if host_kv is None:
                # a swap_in without a matching swap_out (crash-restart,
                # future scheduler drift): the KV is unrecoverable —
                # unschedule the request and demote it to full-prefill
                # recomputation instead of raising (or worse, decoding
                # over garbage blocks).
                req = self.scheduler.requests.get(rid)
                sched.prefills = [
                    p for p in sched.prefills if p.request.request_id != rid
                ]
                sched.decodes = [
                    r for r in sched.decodes if r.request_id != rid
                ]
                if req is not None and not req.is_finished:
                    self.scheduler.demote_to_recompute(req)
                    self.runner.release_slot(req)
                continue
            self.runner.swap_in_blocks(host_kv, ids)

    def step(self) -> list[Request]:
        """One engine iteration. Returns requests that got new tokens
        (finished ones included; their status is already final).

        Lag-1 decode streak (async_decode_streak): when the previous step
        was decode-only and the same request set can keep decoding, the
        NEXT decode step is dispatched from the previous step's
        device-side tokens/lens BEFORE the previous step is read back —
        the host sync (engine step N resolve) overlaps device step N+1.
        Token streams are identical to the synchronous path: a streak of
        S steps computes exactly what one fused S*M-iteration decode
        would."""
        t0 = time.perf_counter()
        if self._pending is not None:
            psched, ppending = self._pending
            csched = self._streak_continuation(psched)
            if csched is not None:
                try:
                    npending = self.runner.dispatch(csched, feed=ppending.feed)
                except Exception as e:
                    self._pending = None
                    ppending.resolve()
                    if self.executor_fail_callback is not None:
                        self.executor_fail_callback(e)
                    raise
                self._pending = (csched, npending)
            else:
                self._pending = None
            runner_out = ppending.resolve()
            return self._apply_output(psched, runner_out, t0)

        sched = self.scheduler.schedule()
        self._execute_swaps(sched)
        if sched.is_empty:
            return []
        # slots of preempted requests are recycled before execution
        for rid in sched.preempted_ids:
            req = self.scheduler.requests.get(rid)
            if req is not None:
                self.runner.release_slot(req)
        try:
            pending = self.runner.dispatch(sched)
        except Exception as e:
            if self.executor_fail_callback is not None:
                self.executor_fail_callback(e)
            raise
        if (
            self.config.scheduler.async_decode_streak
            and pending.feed is not None
            and self._streak_continuation(sched) is not None
        ):
            # defer the read-back: next step() resolves this one after
            # dispatching its continuation
            self._pending = (sched, pending)
            return []
        runner_out = pending.resolve()
        return self._apply_output(sched, runner_out, t0)

    def _streak_continuation(self, psched):
        """Decide whether the request set of `psched` (a decode-only step,
        possibly still unresolved) can keep decoding for another fused
        step, and pre-allocate the worst-case KV blocks if so. Returns the
        continuation SchedulerOutput or None (→ resolve and fall back to
        normal scheduling). Conservative: any admission pressure, abort,
        possible finish, grammar/logprobs row, or allocation failure
        breaks the streak."""
        if not self.config.scheduler.async_decode_streak:
            return None
        s = self.scheduler
        if s.waiting or psched.prefills or not psched.decodes:
            return None
        k = s.num_spec_tokens
        need = s.config.decode_steps * (1 + k)
        from vllm_omni_draft_tpu.core.request import RequestStatus

        for req in psched.decodes:
            sp = req.sampling_params
            if (
                req.status != RequestStatus.RUNNING
                or req.is_finished
                or sp.grammar is not None
                or sp.logprobs is not None
            ):
                return None
            # the unresolved step may emit up to `need` tokens; the
            # continuation is only useful (and its KV writes only legal)
            # with headroom for both
            if len(req.output_token_ids) + need >= sp.max_tokens:
                return None
            if req.num_tokens + 2 * need > s.config.max_model_len:
                return None
        for req in psched.decodes:
            # worst case past num_computed: the pending last token (+1),
            # the unresolved step (`need`), this continuation (`need`)
            if s.kv.allocate_slots(req, 2 * need + 1) is None:
                return None
        from vllm_omni_draft_tpu.core.scheduler import SchedulerOutput

        return SchedulerOutput(
            prefills=[],
            decodes=list(psched.decodes),
            preempted_ids=[],
            num_spec_tokens=k,
        )

    def step_with_batch_queue(self) -> list[Request]:
        """Pipelined step variant (reference: `step_with_batch_queue`,
        `engine_core.md:97, 124-126`): keeps up to max_concurrent_batches
        slot-disjoint batches dispatched. While batch N executes on device,
        the host schedules and dispatches batch N+1 — the requests of
        in-flight batches are excluded from scheduling and preemption."""
        t0 = time.perf_counter()
        scheduled = False
        if len(self.batch_queue) < self.max_concurrent_batches:
            sched = self.scheduler.schedule()
            self._execute_swaps(sched)
            if not sched.is_empty:
                for rid in sched.preempted_ids:
                    req = self.scheduler.requests.get(rid)
                    if req is not None:
                        self.runner.release_slot(req)
                ids = {r.request_id for r in sched.decodes} | {
                    p.request.request_id for p in sched.prefills
                }
                self.scheduler.in_flight |= ids
                try:
                    pending = self.runner.dispatch(sched)
                except Exception as e:
                    self.scheduler.in_flight -= ids
                    if self.executor_fail_callback is not None:
                        self.executor_fail_callback(e)
                    raise
                self.batch_queue.append((sched, pending, ids))
                scheduled = True
        if self.batch_queue and (
            not scheduled or len(self.batch_queue) >= self.max_concurrent_batches
        ):
            sched, pending, ids = self.batch_queue.popleft()
            try:
                runner_out = pending.resolve()
            finally:
                self.scheduler.in_flight -= ids
            return self._apply_output(sched, runner_out, t0)
        return []

    def _apply_output(self, sched, runner_out, t0) -> list[Request]:
        updated = self.scheduler.update_from_output(sched, runner_out)
        for req in updated:
            # advance grammar FSMs; terminal grammar ends the request
            if req.sampling_params.grammar is not None and not req.is_finished:
                new = runner_out.new_tokens.get(req.request_id, [])
                if self.structured.advance(req.request_id, new):
                    from vllm_omni_draft_tpu.core.request import RequestStatus

                    self.scheduler.finish_request(
                        req, RequestStatus.FINISHED_STOPPED
                    )
            if req.is_finished:
                self.structured.remove(req.request_id)
                self.runner.release_slot(req)
            if req.first_token_time is None:
                req.first_token_time = time.monotonic()
        self.iteration_stats = IterationStats(
            num_prompt_tokens=sum(p.chunk_len for p in sched.prefills),
            num_generation_tokens=sum(
                len(t) for t in runner_out.new_tokens.values()
            ),
            step_time_s=time.perf_counter() - t0,
        )
        return updated

    # utility ops (reference: "profiling, cache resets, state saving",
    # engine_core.md:18)
    def reset_prefix_cache(self) -> None:
        kv = self.scheduler.kv
        kv.pool.clear_cache()
        kv._req_hashes.clear()

    def start_profile(self, log_dir: str = "/tmp/vot_profile") -> str:
        """JAX profiler trace (utility op; reference names 'profiling' as
        an EngineCore duty, engine_core.md:18). View with xprof/tensorboard."""
        import jax.profiler

        jax.profiler.start_trace(log_dir)
        return log_dir

    def stop_profile(self) -> None:
        import jax.profiler

        jax.profiler.stop_trace()

    def get_stats(self) -> dict:
        return {
            "scheduler": self.scheduler.stats,
            "spec_decode": self.scheduler.spec_stats,
            "iteration": self.iteration_stats,
        }
