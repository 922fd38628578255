"""Offline LLM front end: `LLM.generate` / `LLM.chat`.

The synchronous batch entrypoint the reference's perf harness drives
(`llm.chat(...)` at `src/performance_enhancement/test_performance.py:155`):
in-process EngineCore + client-side OutputProcessor, stepping until all
requests finish.
"""

from __future__ import annotations

import dataclasses
import itertools

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


class LLM:
    def __init__(self, config: EngineConfig, tokenizer=None):
        self.config = config
        self.tokenizer = tokenizer if tokenizer is not None else get_tokenizer(
            config.tokenizer
        )
        self.engine = EngineCore(config)
        self.output_processor = OutputProcessor(
            self.tokenizer, abort_fn=self._abort_from_stop
        )
        self._stop_hits: list[str] = []

    def _abort_from_stop(self, request_ids: list[str]) -> None:
        # requests already marked FINISHED_STOPPED by the output processor;
        # release engine-side resources
        for rid in request_ids:
            req = self.engine.scheduler.requests.get(rid)
            if req is not None:
                self.engine.scheduler.finish_request(req, req.status)
                self.engine.runner.release_slot(req)

    # ------------------------------------------------------------------

    @staticmethod
    def _validate_mm(prompt_token_ids, mm_inputs) -> None:
        if not isinstance(mm_inputs, dict) or "embeds" not in mm_inputs:
            return
        from vllm_omni_draft_tpu.models.vision import IMAGE_PAD_TOKEN_ID

        pad_id = mm_inputs.get("image_token_id", IMAGE_PAD_TOKEN_ID)
        n_pad = sum(1 for t in prompt_token_ids if t == pad_id)
        n_emb = len(mm_inputs["embeds"])
        if n_pad != n_emb:
            raise ValueError(
                f"prompt has {n_pad} image placeholder tokens but mm_inputs "
                f"provides {n_emb} embeddings"
            )

    def _add(self, prompt_token_ids: list[int], sp: SamplingParams, mm_inputs=None) -> Request:
        self._validate_mm(prompt_token_ids, mm_inputs)
        if (
            not sp.ignore_eos
            and getattr(self.tokenizer, "eos_token_id", None) is not None
            and self.tokenizer.eos_token_id not in sp.stop_token_ids
        ):
            sp.stop_token_ids = sp.stop_token_ids + (self.tokenizer.eos_token_id,)
        req = Request(
            request_id=f"req-{next(_req_counter)}",
            prompt_token_ids=list(prompt_token_ids),
            sampling_params=sp,
            mm_inputs=mm_inputs,
        )
        self.engine.add_request(req)
        self.output_processor.add_request(req)
        return req

    def generate(
        self,
        prompts,
        sampling_params: SamplingParams | list[SamplingParams] | None = None,
        mm_inputs=None,
    ) -> list[RequestOutput]:
        """prompts: list of strings or list of token-id lists."""
        if isinstance(prompts, str):
            prompts = [prompts]
        n = len(prompts)
        if sampling_params is None:
            sampling_params = SamplingParams()
        sps = (
            list(sampling_params)
            if isinstance(sampling_params, (list, tuple))
            else [sampling_params] * n
        )
        if len(sps) != n:
            raise ValueError("len(sampling_params) != len(prompts)")
        mms = mm_inputs if mm_inputs is not None else [None] * n
        # n>1 sampling: fan one prompt out into n child requests (prefix
        # caching shares their prompt KV); children aggregate back into a
        # single RequestOutput with n CompletionOutputs (reference:
        # parent/child fan-out, engine_core.md:815-822)
        groups: list[list[Request]] = []
        for p, sp, mm in zip(prompts, sps, mms):
            ids = self.tokenizer.encode(p) if isinstance(p, str) else list(p)
            children = []
            for j in range(sp.n):
                child_sp = sp if sp.n == 1 else dataclasses.replace(
                    sp, n=1, seed=(sp.seed + j if sp.seed is not None else None)
                )
                children.append(self._add(ids, child_sp, mm))
            groups.append(children)
        finals: dict[str, RequestOutput] = {}
        while self.engine.has_unfinished() or self.engine.batch_queue:
            updated = self.engine.step_fn()
            for out in self.output_processor.process_outputs(updated):
                if out.finished:
                    finals[out.request_id] = out
        # ignored requests (e.g. too-long prompts) never produce outputs
        results = []
        for children in groups:
            parent = children[0]
            outs = []
            cached = 0
            plp = None
            for idx, child in enumerate(children):
                o = finals.get(child.request_id)
                if o is not None and o.outputs:
                    comp = dataclasses.replace(o.outputs[0], index=idx)
                    outs.append(comp)
                    cached = max(cached, o.num_cached_tokens)
                    if o.prompt_logprobs is not None:
                        plp = o.prompt_logprobs
            results.append(
                RequestOutput(
                    request_id=parent.request_id,
                    prompt_token_ids=parent.prompt_token_ids,
                    outputs=outs,
                    finished=True,
                    num_cached_tokens=cached,
                    prompt_logprobs=plp,
                )
            )
        return results

    def chat(
        self, messages_list, sampling_params: SamplingParams | None = None
    ) -> list[RequestOutput]:
        """messages_list: list of chat conversations
        ([{'role':..., 'content':...}, ...])."""
        if messages_list and isinstance(messages_list[0], dict):
            messages_list = [messages_list]
        token_lists = [
            self.tokenizer.apply_chat_template(m, add_generation_prompt=True)
            for m in messages_list
        ]
        return self.generate(token_lists, sampling_params)

    def encode(self, prompts, pooling: str = "mean"):
        """Pooled prompt embeddings (reference surface:
        `AsyncLLM.generate()/encode()`, `src/doc/engine_core.md:187`;
        pooling outputs bypass detokenization, `engine_core.md:800-813`).
        Returns one PoolingRequestOutput per prompt; `data` is a [D] f32
        numpy embedding (mean- or last-token-pooled)."""
        from vllm_omni_draft_tpu.core.request import PoolingRequestOutput

        if isinstance(prompts, str):
            prompts = [prompts]
        outs = []
        for p in prompts:
            ids = self.tokenizer.encode(p) if isinstance(p, str) else list(p)
            data = self.engine.runner.encode(ids, pooling=pooling)
            outs.append(
                PoolingRequestOutput(
                    request_id=f"req-{next(_req_counter)}", data=data
                )
            )
        return outs

    def get_stats(self) -> dict:
        return self.engine.get_stats()
