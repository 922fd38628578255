"""AsyncLLM: asyncio front end with streaming per-request queues.

Capability parity with the reference's AsyncLLM surface
(`src/doc/engine_core.md:187-207, 521-557`): background output-handler
loop, per-request RequestOutputCollector queues, streaming async
generators, abort propagation on cancellation/stop.

The engine step loop is synchronous (single-controller TPU dispatch), so
it runs on a worker thread; the asyncio side communicates through
thread-safe queues. With `engine_proc=True` the engine runs in a separate
process behind ZMQ (engine/ipc.py) — the reference's EngineCoreProc split.
"""

from __future__ import annotations

import asyncio
import dataclasses
import itertools
import os
import threading
from typing import AsyncIterator

from vllm_omni_draft_tpu.config import EngineConfig
from vllm_omni_draft_tpu.core.engine import EngineCore
from vllm_omni_draft_tpu.core.output_processor import OutputProcessor
from vllm_omni_draft_tpu.core.request import (
    Request,
    RequestOutput,
    SamplingParams,
)
from vllm_omni_draft_tpu.core.tokenizer import get_tokenizer

_req_counter = itertools.count()


class RequestOutputCollector:
    """Per-request async output queue (reference:
    `engine_core.md:528-557`). The producer side is the engine thread."""

    def __init__(self, loop: asyncio.AbstractEventLoop):
        self._loop = loop
        self._queue: asyncio.Queue = asyncio.Queue()

    def put_nowait(self, item) -> None:
        # called from the engine thread
        self._loop.call_soon_threadsafe(self._queue.put_nowait, item)

    async def get(self):
        item = await self._queue.get()
        if isinstance(item, Exception):
            raise item
        return item


class AsyncLLM:
    """Engine mutations (add/abort) ride an intake queue drained by the
    engine thread between steps, so `generate()`/`abort()` NEVER wait out
    a potentially-hundreds-of-ms fused device step (round-2 hardening of
    the old engine-wide lock), and `encode()` runs its one-shot forward
    concurrently with decode steps (it touches no engine slot/KV state)."""

    def __init__(self, config: EngineConfig, tokenizer=None):
        self.config = config
        self.tokenizer = tokenizer if tokenizer is not None else get_tokenizer(
            config.tokenizer
        )
        self.engine = EngineCore(config)
        self.output_processor = OutputProcessor(
            self.tokenizer, abort_fn=self._abort_from_stop
        )
        # intake ops: ("add", Request, collector) | ("abort", request_id)
        self._intake: list = []
        self._intake_lock = threading.Lock()
        self._wakeup = threading.Event()
        self._shutdown = False
        self._loop: asyncio.AbstractEventLoop | None = None
        self._thread: threading.Thread | None = None
        self._errored: Exception | None = None

    # ------------------------------------------------------------------

    def _ensure_started(self) -> None:
        if self._thread is None:
            self._loop = asyncio.get_running_loop()
            self._thread = threading.Thread(
                target=self._run_engine_loop, name="engine-loop", daemon=True
            )
            self._thread.start()

    def _submit(self, op: tuple) -> None:
        with self._intake_lock:
            self._intake.append(op)
        self._wakeup.set()

    def _drain_intake(self) -> None:
        """Engine-thread only: apply queued add/abort ops. Registering the
        output collector and adding to the scheduler happen together here,
        so no step can emit tokens for an unregistered request."""
        with self._intake_lock:
            ops, self._intake = self._intake, []
        for op in ops:
            if op[0] == "add":
                _, req, collector = op
                self.engine.add_request(req)
                self.output_processor.add_request(req, queue=collector)
            elif op[0] == "abort":
                self.engine.abort_requests([op[1]])
                self.output_processor.states.pop(op[1], None)

    # client-side output processing chunk size (reference:
    # np.array_split over VLLM_V1_OUTPUT_PROC_CHUNK_SIZE,
    # `src/doc/engine_core.md:194-195`): large step outputs are
    # processed in chunks with an intake drain between them, so a big
    # batch of detokenizations never starves add/abort latency
    OUTPUT_PROC_CHUNK_SIZE = int(os.environ.get("VOT_OUTPUT_PROC_CHUNK", "128"))

    def _run_engine_loop(self) -> None:
        """The busy loop (reference: `_process_engine_step`,
        `engine_core.md:154-156`), idling when no work is queued."""
        while not self._shutdown:
            try:
                self._drain_intake()
                has_work = (
                    self.engine.has_unfinished() or bool(self.engine.batch_queue)
                )
                if has_work:
                    updated = self.engine.step_fn()
                    chunk = self.OUTPUT_PROC_CHUNK_SIZE
                    for i in range(0, len(updated), chunk):
                        self.output_processor.process_outputs(updated[i:i + chunk])
                        if i + chunk < len(updated):
                            self._drain_intake()
                    # long-running loop: drop finished requests from the
                    # scheduler map (they linger by design for post-hoc
                    # reads, but a serving loop — n-fold with fan-out —
                    # would otherwise grow without bound; CLAUDE.md
                    # invariant, same as the IPC proc)
                    self.engine.scheduler.purge_finished()
            except Exception as e:  # propagate to consumers
                self._errored = e
                self.output_processor.propagate_error(e)
                return
            if not has_work:
                self._wakeup.wait(timeout=0.005)
                self._wakeup.clear()

    def _abort_from_stop(self, request_ids) -> None:
        for rid in request_ids:
            req = self.engine.scheduler.requests.get(rid)
            if req is not None:
                self.engine.scheduler.finish_request(req, req.status)
                self.engine.runner.release_slot(req)

    # ------------------------------------------------------------------

    async def generate(
        self,
        prompt,
        sampling_params: SamplingParams | None = None,
        request_id: str | None = None,
        mm_inputs=None,
    ) -> AsyncIterator[RequestOutput]:
        """Async generator of streaming RequestOutputs; final output has
        finished=True. Cancellation aborts the request in the engine."""
        self._ensure_started()
        if self._errored:
            raise self._errored
        sp = sampling_params or SamplingParams()
        ids = self.tokenizer.encode(prompt) if isinstance(prompt, str) else list(prompt)
        if (
            not sp.ignore_eos
            and getattr(self.tokenizer, "eos_token_id", None) is not None
            and self.tokenizer.eos_token_id not in sp.stop_token_ids
        ):
            sp.stop_token_ids = sp.stop_token_ids + (self.tokenizer.eos_token_id,)
        rid = request_id or f"req-{next(_req_counter)}"
        if sp.n > 1:
            async for out in self._generate_fanout(ids, sp, rid, mm_inputs):
                yield out
            return
        req = Request(request_id=rid, prompt_token_ids=ids, sampling_params=sp,
                      mm_inputs=mm_inputs)
        collector = RequestOutputCollector(asyncio.get_running_loop())
        self._submit(("add", req, collector))
        try:
            while True:
                out = await collector.get()
                yield out
                if out.finished:
                    return
        except (asyncio.CancelledError, GeneratorExit):
            # consumer cancelled or closed the stream: abort in-engine
            self._submit(("abort", rid))
            raise

    async def _generate_fanout(
        self, ids, sp, rid, mm_inputs
    ) -> AsyncIterator[RequestOutput]:
        """n>1 parent/child fan-out on the SERVING path (reference:
        async OutputProcessor parent/child aggregation,
        `src/doc/engine_core.md:815-822`). The parent fans out into n
        child requests whose identical prompts share KV via the prefix
        cache; every streamed chunk is re-labelled with the child's
        choice index, and the final output (finished=True) aggregates
        all n CompletionOutputs for non-delta consumers."""
        from vllm_omni_draft_tpu.core.request import OutputKind

        collector = RequestOutputCollector(asyncio.get_running_loop())
        child_ids = []
        for j in range(sp.n):
            child_sp = dataclasses.replace(
                sp, n=1, seed=(sp.seed + j if sp.seed is not None else None)
            )
            req = Request(
                request_id=f"{rid}/{j}", prompt_token_ids=list(ids),
                sampling_params=child_sp, mm_inputs=mm_inputs,
            )
            child_ids.append(req.request_id)
            self._submit(("add", req, collector))
        index_of = {cid: j for j, cid in enumerate(child_ids)}
        finals: dict[int, object] = {}  # choice index -> final CompletionOutput
        plp = None
        cached = 0
        try:
            while len(finals) < sp.n:
                out = await collector.get()
                j = index_of[out.request_id]
                comp = (
                    dataclasses.replace(out.outputs[0], index=j)
                    if out.outputs else None
                )
                cached = max(cached, out.num_cached_tokens)
                if out.prompt_logprobs is not None:
                    plp = out.prompt_logprobs
                if out.finished:
                    finals[j] = comp
                if len(finals) == sp.n:
                    if sp.output_kind == OutputKind.DELTA:
                        # deltas already streamed; the final carries only
                        # the last child's closing delta
                        outs = [comp] if comp is not None else []
                    else:
                        outs = [finals[k] for k in sorted(finals)
                                if finals[k] is not None]
                    yield RequestOutput(
                        request_id=rid,
                        prompt_token_ids=out.prompt_token_ids,
                        outputs=outs,
                        finished=True,
                        num_cached_tokens=cached,
                        prompt_logprobs=plp,
                    )
                else:
                    if sp.output_kind == OutputKind.FINAL_ONLY:
                        continue  # only the aggregate final is emitted
                    yield dataclasses.replace(
                        out, request_id=rid,
                        outputs=[comp] if comp is not None else [],
                        finished=False,
                    )
        except (asyncio.CancelledError, GeneratorExit):
            for cid in child_ids:
                self._submit(("abort", cid))
            raise

    async def encode(self, prompt, pooling: str = "mean"):
        """Pooled prompt embedding (reference surface:
        `AsyncLLM.generate()/encode()`, `engine_core.md:187`). Runs the
        one-shot encode forward off the event loop, CONCURRENT with
        decode steps — encode touches no slot/KV/scheduler state (its
        throwaway KV is allocated in-trace) and JAX dispatch is
        thread-safe, so it no longer waits out a fused decode step."""
        from vllm_omni_draft_tpu.core.request import PoolingRequestOutput

        self._ensure_started()
        if self._errored:
            raise self._errored
        ids = (
            self.tokenizer.encode(prompt) if isinstance(prompt, str) else list(prompt)
        )
        data = await asyncio.get_running_loop().run_in_executor(
            None, lambda: self.engine.runner.encode(ids, pooling=pooling)
        )
        return PoolingRequestOutput(
            request_id=f"req-{next(_req_counter)}", data=data
        )

    async def abort(self, request_id: str) -> None:
        self._submit(("abort", request_id))

    def get_stats(self) -> dict:
        return self.engine.get_stats()

    def shutdown(self) -> None:
        self._shutdown = True
        self._wakeup.set()
        if self._thread is not None:
            self._thread.join(timeout=5)
