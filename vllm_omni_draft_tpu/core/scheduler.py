"""Step-level continuous-batching scheduler.

Rebuilds the reference's scheduler capability surface
(`src/doc/engine_core.md:280-313`): per-step SchedulerOutput with a
new/continuing request split, per-request token budgets, the spec-decode
token map, preemption with recompute, prefix-cache adoption, and
finished-set bookkeeping — redesigned for TPU static shapes: every
decode-phase request is scheduled for exactly (1 + num_spec_tokens)
query tokens so one jitted step serves the whole running batch.
"""

from __future__ import annotations

from collections import deque
from dataclasses import dataclass, field

from vllm_omni_draft_tpu.config import CacheConfig, SchedulerConfig, SpeculativeConfig
from vllm_omni_draft_tpu.core.kv_cache import KVCacheManager
from vllm_omni_draft_tpu.core.request import Request, RequestStatus
from vllm_omni_draft_tpu.utils.stats import SchedulerStats, SpecDecodeStats


@dataclass
class ScheduledPrefill:
    request: Request
    chunk_start: int  # == request.num_computed_tokens at schedule time
    chunk_len: int    # query tokens this step
    is_final_chunk: bool
    # fresh prefills sample the first output token on the final chunk;
    # preempted-resumed recomputes don't (their last token feeds decode)
    sample_on_final: bool = True
    new_block_ids: list[int] = field(default_factory=list)


@dataclass
class SchedulerOutput:
    """One step's work order (analog of the reference's SchedulerOutput,
    `engine_core.md:280-313`)."""

    prefills: list[ScheduledPrefill]
    decodes: list[Request]          # all decode-phase requests, (1+k) tokens each
    preempted_ids: list[str]
    # spec-token map: request_id -> draft tokens scheduled for verify
    # (filled by the runner after drafting; the scheduler reserves space)
    num_spec_tokens: int = 0
    # KV swap work orders (reference protocol: the scheduler emits block
    # moves, the execution plane performs them — vLLM's
    # blocks_to_swap_out/in). (request_id, device block ids):
    # swap_out = save these blocks to the host pool BEFORE this step runs
    # (they are being reused); swap_in = restore the request's saved KV
    # into these freshly allocated blocks.
    swap_out: list[tuple[str, list[int]]] = field(default_factory=list)
    swap_in: list[tuple[str, list[int]]] = field(default_factory=list)

    @property
    def is_empty(self) -> bool:
        return not self.prefills and not self.decodes


@dataclass
class RunnerOutput:
    """What the runner hands back (analog of ModelRunnerOutput,
    `engine_core.md:316-341`)."""

    # request_id -> newly sampled token ids (1..k+1 entries)
    new_tokens: dict[str, list[int]]
    # request_id -> number of draft tokens accepted this step (spec stats)
    num_accepted: dict[str, int] = field(default_factory=dict)
    num_draft: dict[str, int] = field(default_factory=dict)
    # request_id -> top-logprob payloads, aligned with new_tokens
    logprobs: dict[str, list] = field(default_factory=dict)
    # request_id -> [(prompt_pos, {token: logprob})] for prompt-logprobs
    # requests (entries cover the positions this step's chunk predicted)
    prompt_logprobs: dict[str, list] = field(default_factory=dict)


class Scheduler:
    def __init__(
        self,
        scheduler_config: SchedulerConfig,
        cache_config: CacheConfig,
        num_blocks: int,
        speculative_config: SpeculativeConfig | None = None,
    ):
        self.config = scheduler_config
        self.cache_config = cache_config
        self.kv = KVCacheManager(
            num_blocks, cache_config.block_size, cache_config.enable_prefix_caching
        )
        self.num_spec_tokens = (
            speculative_config.num_speculative_tokens if speculative_config else 0
        )
        self.waiting: deque[Request] = deque()
        self.running: list[Request] = []
        self.requests: dict[str, Request] = {}
        self.finished_ids: set[str] = set()
        # requests whose device step is dispatched but not yet resolved
        # (batch-queue mode): excluded from scheduling AND from preemption
        # victims — their step is still writing KV to their blocks
        self.in_flight: set[str] = set()
        # host-offload (swap) pool accounting: request_id -> blocks held on
        # the host. Preempted requests whose KV fits the CPU pool are
        # swapped out instead of recomputed (vLLM swap capability;
        # `VLLM_V1_Interface.md:64` initialize_cache(num_gpu, num_cpu)).
        self.cpu_blocks_free = cache_config.num_cpu_blocks
        self.swapped_out: dict[str, int] = {}
        self._round_swap_out: list[tuple[str, list[int]]] = []
        self._round_swap_in: list[tuple[str, list[int]]] = []
        self.stats = SchedulerStats(kv_blocks_total=num_blocks)
        self.spec_stats = SpecDecodeStats()

    # ------------------------------------------------------------------
    # request lifecycle
    # ------------------------------------------------------------------

    def add_request(self, request: Request) -> None:
        if len(request.prompt_token_ids) + 1 > self.config.max_model_len:
            request.status = RequestStatus.FINISHED_IGNORED
            self.finished_ids.add(request.request_id)
            self.requests[request.request_id] = request
            return
        self.requests[request.request_id] = request
        self.waiting.append(request)

    def abort_requests(self, request_ids) -> list[Request]:
        aborted = []
        for rid in request_ids:
            req = self.requests.get(rid)
            if req is None or req.is_finished:
                continue
            req.status = RequestStatus.FINISHED_ABORTED
            if req in self.running:
                self.running.remove(req)
            else:
                try:
                    self.waiting.remove(req)
                except ValueError:
                    pass
            self.kv.free(req)
            self.cpu_blocks_free += self.swapped_out.pop(rid, 0)
            self.finished_ids.add(rid)
            aborted.append(req)
        return aborted

    def has_unfinished(self) -> bool:
        return bool(self.waiting or self.running)

    def purge_finished(self) -> int:
        """Drop finished requests from the `requests` map. Finished
        entries are retained by default so callers (tests, post-hoc
        inspection, the in-process LLM layer) can read final state after
        the run — but a long-lived serving engine must call this
        periodically or the map grows without bound (the IPC proc loop
        does). Returns the number purged."""
        gone = [rid for rid, r in self.requests.items() if r.is_finished]
        for rid in gone:
            del self.requests[rid]
            # finished-set bookkeeping (reference: include_finished_set,
            # engine_core.md:91) is a notification set, not a permanent
            # record — drop purged ids so it stays bounded too
            self.finished_ids.discard(rid)
        return len(gone)

    # ------------------------------------------------------------------
    # schedule
    # ------------------------------------------------------------------

    def schedule(self) -> SchedulerOutput:
        k = self.num_spec_tokens
        budget = self.config.max_num_batched_tokens
        prefills: list[ScheduledPrefill] = []
        decodes: list[Request] = []
        preempted: list[str] = []

        # 1) running requests first (decode or prefill continuation)
        for req in list(self.running):
            if req.status != RequestStatus.RUNNING:
                continue  # preempted by an earlier allocation this step
            if req.request_id in self.in_flight:
                continue  # previous batch still executing on device
            target = self._prefill_target(req)
            remaining_prompt = target - req.num_computed_tokens
            if remaining_prompt > 0:
                # chunked-prefill continuation (or post-preemption recompute)
                chunk = min(remaining_prompt, budget)
                if chunk <= 0:
                    continue
                new_blocks = self._allocate_or_preempt(
                    req, chunk, preempted, decodes, prefills
                )
                if new_blocks is None:
                    continue  # req itself was preempted
                budget -= chunk
                prefills.append(
                    ScheduledPrefill(
                        req,
                        req.num_computed_tokens,
                        chunk,
                        is_final_chunk=(chunk == remaining_prompt),
                        sample_on_final=not req.output_token_ids,
                        new_block_ids=new_blocks,
                    )
                )
            else:
                # a fused decode call advances up to decode_steps*(1+k)
                # tokens; budget and blocks must cover the worst case
                need = self.config.decode_steps * (1 + k)
                if budget < need:
                    continue  # leave for next step (still RUNNING)
                new_blocks = self._allocate_or_preempt(
                    req, need, preempted, decodes, prefills
                )
                if new_blocks is None:
                    continue
                budget -= need
                decodes.append(req)

        # 2) admit waiting requests
        while (
            self.waiting
            and budget > 0
            and len(self.running) < self.config.max_num_seqs
        ):
            req = self.waiting[0]
            target = self._prefill_target(req)
            if req.num_computed_tokens == 0 and not req.block_ids:
                cached_blocks, cached_tokens = self.kv.get_computed_blocks(req, target)
                self.stats.prefix_cache_query_tokens += req.num_prompt_tokens
                self.stats.prefix_cache_hit_tokens += cached_tokens
            else:
                cached_blocks, cached_tokens = [], req.num_computed_tokens

            remaining = target - cached_tokens
            chunk = min(remaining, budget)
            if chunk < 0 or (chunk == 0 and remaining > 0):
                self.kv.release_blocks(cached_blocks)
                break
            if not self.config.enable_chunked_prefill and chunk < remaining:
                self.kv.release_blocks(cached_blocks)
                break  # whole prompt must fit this step
            new_blocks = self.kv.allocate_slots(
                req, max(chunk, 1), cached_blocks, num_computed=cached_tokens
            )
            if new_blocks is None:
                # no memory: stay waiting — undo the adoption so no state
                # (refcounts or computed counters) leaks from this attempt
                self.kv.release_blocks(cached_blocks)
                break
            req.num_computed_tokens = cached_tokens
            req.num_cached_tokens = max(req.num_cached_tokens, cached_tokens)
            if req.request_id in self.swapped_out:
                # swapped-out resume: restore the saved KV into the first
                # n freshly allocated blocks (they cover exactly the
                # computed tokens the swap saved)
                n = self.swapped_out.pop(req.request_id)
                self._round_swap_in.append(
                    (req.request_id, list(req.block_ids[:n]))
                )
                self.cpu_blocks_free += n
                self.stats.num_swapped_in_total += 1
            self.waiting.popleft()
            req.status = RequestStatus.RUNNING
            req.record("scheduled")
            self.running.append(req)
            budget -= chunk
            if chunk > 0:
                prefills.append(
                    ScheduledPrefill(
                        req,
                        req.num_computed_tokens,
                        chunk,
                        is_final_chunk=(chunk == remaining),
                        sample_on_final=not req.output_token_ids,
                        new_block_ids=new_blocks,
                    )
                )
            # chunk == 0 (full cache hit on resume): request re-enters the
            # running set and decodes from the next step

        self._refresh_stats()
        swap_out, self._round_swap_out = self._round_swap_out, []
        swap_in, self._round_swap_in = self._round_swap_in, []
        return SchedulerOutput(
            prefills=prefills,
            decodes=decodes,
            preempted_ids=preempted,
            num_spec_tokens=k,
            swap_out=swap_out,
            swap_in=swap_in,
        )

    @staticmethod
    def _prefill_target(req: Request) -> int:
        """Tokens that must have KV before decode can run. Fresh requests:
        the whole prompt (the final chunk also samples the first output
        token). Preempted-resumed requests: all tokens except the last
        emitted one, whose KV pends as decode input — no resampling."""
        if req.output_token_ids:
            return req.num_tokens - 1
        return req.num_prompt_tokens

    def _allocate_or_preempt(
        self,
        req: Request,
        num_new: int,
        preempted: list[str],
        decodes: list[Request],
        prefills: list[ScheduledPrefill],
    ) -> list[int] | None:
        """Allocate blocks for `req`; preempt victims (LIFO from running)
        until it fits. Returns new block ids, or None if `req` itself got
        preempted (pool too small even after evicting everyone else).
        Victims already scheduled this step are unscheduled."""
        while True:
            new_blocks = self.kv.allocate_slots(req, num_new)
            if new_blocks is not None:
                return new_blocks
            victim = None
            for cand in reversed(self.running):
                if cand is not req and cand.request_id not in self.in_flight:
                    victim = cand
                    break
            if victim is None:
                self._preempt(req)
                return None
            self._preempt(victim)
            if victim in decodes:
                decodes.remove(victim)
            for sp in list(prefills):
                if sp.request is victim:
                    prefills.remove(sp)
            preempted.append(victim.request_id)

    def _preempt(self, req: Request) -> None:
        self.running.remove(req)
        n_blocks = -(-req.num_computed_tokens // self.kv.block_size)
        if 0 < n_blocks <= self.cpu_blocks_free:
            # host-offload: emit a swap_out order for the blocks holding
            # the computed KV; num_computed_tokens is KEPT so the resume
            # path restores instead of recomputing the prefill.
            self._round_swap_out.append(
                (req.request_id, list(req.block_ids[:n_blocks]))
            )
            self.swapped_out[req.request_id] = n_blocks
            self.cpu_blocks_free -= n_blocks
            self.stats.num_swapped_out_total += 1
        else:
            req.num_computed_tokens = 0
        self.kv.free(req)
        req.status = RequestStatus.PREEMPTED
        req.spec_token_ids.clear()
        req.record("preempted")
        self.stats.num_preempted_total += 1
        self.waiting.appendleft(req)

    # ------------------------------------------------------------------
    # update from runner output
    # ------------------------------------------------------------------

    def update_from_output(
        self, sched_out: SchedulerOutput, runner_out: RunnerOutput
    ) -> list[Request]:
        """Apply sampled tokens, advance computed counts, detect token-level
        stops, free finished requests. Returns requests with fresh tokens
        (for the output processor)."""
        updated: list[Request] = []

        for sp in sched_out.prefills:
            req = sp.request
            if req.is_finished:
                continue
            req.num_computed_tokens += sp.chunk_len
            toks = runner_out.new_tokens.get(req.request_id)
            plp = runner_out.prompt_logprobs.get(req.request_id)
            if plp:
                if req.prompt_logprobs is None:
                    req.prompt_logprobs = [None] * req.num_prompt_tokens
                for pos, d in plp:
                    if 0 < pos < req.num_prompt_tokens:
                        req.prompt_logprobs[pos] = d
            self.kv.commit_prefix_hashes(req)
            if toks:
                req.output_token_ids.extend(toks)
                self._maybe_finish(req)
                updated.append(req)

        for req in sched_out.decodes:
            if req.is_finished:
                continue
            toks = runner_out.new_tokens.get(req.request_id, [])
            if not toks:
                continue
            req.output_token_ids.extend(toks)
            lps = runner_out.logprobs.get(req.request_id)
            if lps:
                req.logprobs.extend(lps)
            # KV valid through len-1 (last emitted token's KV pends)
            req.num_computed_tokens = req.num_tokens - 1
            acc = runner_out.num_accepted.get(req.request_id)
            if acc is not None:
                self.spec_stats.num_accepted_tokens += acc
                self.spec_stats.num_draft_tokens += runner_out.num_draft.get(
                    req.request_id, self.num_spec_tokens
                )
            self.kv.commit_prefix_hashes(req)
            self._maybe_finish(req)
            updated.append(req)

        if sched_out.decodes:
            self.spec_stats.num_steps += 1
        self._refresh_stats()
        return updated

    def _maybe_finish(self, req: Request) -> None:
        sp = req.sampling_params
        out = req.output_token_ids
        # token-level stop conditions; truncate anything after the stop
        stop_ids = set(sp.stop_token_ids)
        if stop_ids and not sp.ignore_eos:
            for i, t in enumerate(out[req.num_streamed_tokens :], req.num_streamed_tokens):
                if t in stop_ids:
                    del out[i + 1 :]
                    req.status = RequestStatus.FINISHED_STOPPED
                    break
        if not req.is_finished and len(out) >= sp.max_tokens:
            del out[sp.max_tokens:]
            req.status = RequestStatus.FINISHED_LENGTH
        if not req.is_finished and req.num_tokens >= self.config.max_model_len:
            # spec decode may overshoot by a few tokens: cap at model len
            overshoot = req.num_tokens - self.config.max_model_len
            if overshoot > 0:
                del out[len(out) - overshoot :]
            req.status = RequestStatus.FINISHED_LENGTH
        if req.is_finished:
            req.record("finished")
            self.finished_ids.add(req.request_id)
            if req in self.running:
                self.running.remove(req)
            self.kv.free(req)

    def demote_to_recompute(self, req: Request) -> None:
        """Defensive recovery: drop a request's (unrestorable) KV state and
        send it back to waiting for full-prefill recomputation. Used when a
        swap_in order has no matching host KV (crash-restart or scheduler
        drift) — the request loses its computed tokens but no output."""
        if req in self.running:
            self.running.remove(req)
        self.kv.free(req)
        self.cpu_blocks_free += self.swapped_out.pop(req.request_id, 0)
        req.num_computed_tokens = 0
        req.status = RequestStatus.PREEMPTED
        req.spec_token_ids.clear()
        req.record("demoted_to_recompute")
        self.waiting.appendleft(req)

    def finish_request(self, req: Request, status: RequestStatus) -> None:
        req.status = status
        self.finished_ids.add(req.request_id)
        if req in self.running:
            self.running.remove(req)
        self.kv.free(req)

    def _refresh_stats(self) -> None:
        self.stats.num_running = len(self.running)
        self.stats.num_waiting = len(self.waiting)
        self.stats.kv_blocks_free = self.kv.num_free_blocks
