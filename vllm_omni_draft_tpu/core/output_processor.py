"""Output processing: per-request state, incremental detokenization,
stop-string scanning, streaming queues.

Capability parity with the reference's OutputProcessor/RequestState plane
(`src/doc/engine_core.md:412-835`): DELTA vs CUMULATIVE vs FINAL_ONLY
output kinds, per-request async output queues, stop-string truncation with
abort propagation back to the scheduler, and a pooling path for tensor
outputs that bypasses detokenization (`engine_core.md:800-813`).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Callable

from vllm_omni_draft_tpu.core.request import (
    FINISH_REASON,
    CompletionOutput,
    OutputKind,
    PoolingRequestOutput,
    Request,
    RequestOutput,
    RequestStatus,
)
from vllm_omni_draft_tpu.core.tokenizer import IncrementalDetokenizer


@dataclass
class RequestState:
    request: Request
    detok: IncrementalDetokenizer | None
    queue: Any = None  # asyncio.Queue for streaming consumers
    stop_checked_len: int = 0  # chars of emitted text already stop-scanned


class OutputProcessor:
    """Turns scheduler updates into RequestOutputs.

    `abort_fn` lets stop-string hits propagate back to the engine
    (the reference routes reqs_to_abort the same way,
    `engine_core.md:197-201`).
    """

    def __init__(self, tokenizer, abort_fn: Callable[[list[str]], None] | None = None):
        self.tokenizer = tokenizer
        self.abort_fn = abort_fn
        self.states: dict[str, RequestState] = {}

    def add_request(self, request: Request, queue=None) -> None:
        detok = (
            IncrementalDetokenizer(self.tokenizer, request.prompt_token_ids)
            if self.tokenizer is not None
            else None
        )
        self.states[request.request_id] = RequestState(request, detok, queue)

    def process_outputs(self, updated: list[Request]) -> list[RequestOutput]:
        """Called once per engine step with requests that got new tokens."""
        outs: list[RequestOutput] = []
        to_abort: list[str] = []
        for req in updated:
            state = self.states.get(req.request_id)
            if state is None:
                continue
            new_ids = req.output_token_ids[req.num_streamed_tokens :]
            req.num_streamed_tokens = len(req.output_token_ids)
            new_text = state.detok.update(new_ids) if state.detok else ""

            # stop-string scan over not-yet-checked text (+ overlap for
            # strings spanning chunk boundaries)
            sp = req.sampling_params
            if sp.stop and not req.is_finished and state.detok is not None:
                text = state.detok.text
                max_stop = max(len(s) for s in sp.stop)
                scan_from = max(0, state.stop_checked_len - max_stop + 1)
                window = text[scan_from:]
                hit_at = -1
                for s in sp.stop:
                    i = window.find(s)
                    if i >= 0 and (hit_at < 0 or scan_from + i < hit_at):
                        hit_at = scan_from + i
                if hit_at >= 0:
                    # truncate text at the stop string; finish via engine
                    state.detok.text = text[:hit_at]
                    req.status = RequestStatus.FINISHED_STOPPED
                    to_abort.append(req.request_id)
                state.stop_checked_len = len(state.detok.text)

            out = self._make_output(state, new_text, new_ids)
            if out is not None:
                outs.append(out)
                if state.queue is not None:
                    state.queue.put_nowait(out)
            if req.is_finished:
                self.states.pop(req.request_id, None)
        if to_abort and self.abort_fn is not None:
            self.abort_fn(to_abort)
        return outs

    def _make_output(
        self, state: RequestState, new_text: str, new_ids: list[int]
    ) -> RequestOutput | None:
        req = state.request
        sp = req.sampling_params
        finished = req.is_finished
        if sp.output_kind == OutputKind.FINAL_ONLY and not finished:
            return None
        if sp.output_kind == OutputKind.DELTA:
            text = new_text
            token_ids = list(new_ids)
        else:
            text = state.detok.text if state.detok else ""
            token_ids = list(req.output_token_ids)
        finish_reason = FINISH_REASON.get(req.status) if finished else None
        lp = None
        if req.sampling_params.logprobs is not None and req.logprobs:
            lp = (
                req.logprobs[len(req.logprobs) - len(token_ids):]
                if sp.output_kind == OutputKind.DELTA
                else list(req.logprobs)
            )
        return RequestOutput(
            request_id=req.request_id,
            prompt_token_ids=req.prompt_token_ids,
            outputs=[
                CompletionOutput(
                    index=0,
                    text=text,
                    token_ids=token_ids,
                    finish_reason=finish_reason,
                    logprobs=lp,
                )
            ],
            finished=finished,
            num_cached_tokens=req.num_cached_tokens,
            prompt_logprobs=(
                list(req.prompt_logprobs)
                if sp.prompt_logprobs is not None and req.prompt_logprobs
                else None
            ),
        )

    def make_pooling_output(self, req: Request, data) -> PoolingRequestOutput:
        """Tensor outputs (image latents / pixels / audio) skip the
        detokenizer entirely."""
        return PoolingRequestOutput(request_id=req.request_id, data=data)

    def propagate_error(self, exc: Exception) -> None:
        """Push an error to every live streaming consumer
        (reference: `engine_core.md:450-451`)."""
        for state in self.states.values():
            if state.queue is not None:
                state.queue.put_nowait(exc)
