"""Model runner: statically-shaped, jit-compiled device steps.

The TPU-native replacement for the reference's Worker/GPUModelRunner plane
(`src/doc/VLLM_V1_Interface.md:148-162`): a single-controller host drives
three compiled programs —

  prefill_fn   [1, T_bucket]  chunked prompt ingestion (+ draft prefill)
  decode_fn    [B, 1]         continuous-batch decode (no spec)
  spec_fn      [B, 1]->[B,K+1] draft-propose(K) + target-verify + lossless
                               rejection, one fused compiled step

Static-shape discipline (SURVEY.md §7): the batch is a fixed array of
`max_num_seqs` slots; inactive slots are inert (seq_len 0, position -1,
slot -1). Per-request sampling params ride in [B] vectors so a
heterogeneous batch never recompiles. Slot mappings are derived *in-trace*
from block tables + positions, so the host only ships tiny int32 arrays
per step. KV caches are donated, so XLA updates them in place.
"""

from __future__ import annotations

import os
import time

import jax
import jax.numpy as jnp
import numpy as np

from vllm_omni_draft_tpu.parallel.mesh import host_np

from vllm_omni_draft_tpu.config import EngineConfig, ModelConfig
from vllm_omni_draft_tpu.core.request import Request
from vllm_omni_draft_tpu.core.scheduler import RunnerOutput, SchedulerOutput
from vllm_omni_draft_tpu.models import get_model
from vllm_omni_draft_tpu.models.weights import load_params, quantize_params
from vllm_omni_draft_tpu.ops.attention import AttentionMetadata, kv_store_dim
from vllm_omni_draft_tpu.parallel import sharding as shd
from vllm_omni_draft_tpu.parallel.mesh import TP_AXIS, make_mesh
from vllm_omni_draft_tpu.ops.rejection import (
    rejection_greedy,
    rejection_sample_dispatch,
    rejection_sample_sparse,
)
from vllm_omni_draft_tpu.ops.sampling import compute_probs, sample_from_probs


def _slots_from_positions(block_tables, positions, block_size):
    """[B, NB] tables + [B, T] positions -> [B, T] flat cache slots
    (-1 where position < 0)."""
    pos = jnp.maximum(positions, 0)
    bid = jnp.take_along_axis(block_tables, pos // block_size, axis=1)
    slots = bid * block_size + pos % block_size
    return jnp.where(positions < 0, -1, slots)


def _build_params(cfg: ModelConfig):
    mod = get_model(cfg.model)
    if cfg.checkpoint_dir:
        params = load_params(cfg)
        if cfg.quantization:
            params = quantize_params(params, cfg.quantization, cfg.quant_group_size)
    elif cfg.quantization and hasattr(mod, "init_params_quantized"):
        # random synthetic weights: init directly quantized (no f32
        # transient); one jit call = one device dispatch (per-leaf RNG
        # dispatches are slow over remote-compile tunnels)
        params = jax.jit(lambda: mod.init_params_quantized(cfg))()
    else:
        params = jax.jit(lambda: mod.init_params(cfg))()
        if cfg.quantization:
            params = quantize_params(params, cfg.quantization, cfg.quant_group_size)
    if "lm_head" in params and "s" not in params["lm_head"]:
        # dense heads need the same tile-friendly row padding the
        # quantized heads get (7B vocab 151936 = 2^7*1187 only tiles to
        # 128-row blocks): zero rows, excluded by valid_o/vocab slicing
        from vllm_omni_draft_tpu.ops import quant as quant_ops

        params["lm_head"] = jax.jit(quant_ops.pad_out_rows)(params["lm_head"])
    return mod, params


class PendingStep:
    """Handle for a dispatched-but-unresolved device step (batch-queue
    mode, `engine_core.md:97, 124-126`): holds the closure that blocks on
    the device arrays and applies host-side slot bookkeeping. `feed` is
    the device-side (last_tokens, prev_tokens, seq_lens) after this step
    — present only for plain/greedy/spec decode-only steps — which a
    continuation decode step can consume WITHOUT a host sync (lag-1
    decode streak)."""

    __slots__ = ("_resolve", "feed")

    def __init__(self, resolve_fn, feed=None):
        self._resolve = resolve_fn
        self.feed = feed

    def resolve(self) -> RunnerOutput:
        return self._resolve()


_DEFAULT_NUM_BLOCKS = 512  # CPU/test fallback


def _kv_bytes_per_block(cfg: EngineConfig, block_size: int) -> int:
    models = [cfg.model]
    if cfg.speculative and cfg.speculative.draft_model:
        models.append(cfg.speculative.draft_model)
    total = 0
    for m in models:
        itemsize = (
            1
            if m.kv_cache_dtype in ("fp8", "int8")
            else (4 if m.dtype == "float32" else 2)
        )
        total += (
            2 * m.num_layers * block_size * m.num_kv_heads
            * kv_store_dim(m.head_dim) * itemsize
        )
    return total


_TPU_HBM_FALLBACK_BYTES = 16 * 1024**3  # v5e/v5-lite per-chip HBM


def determine_num_blocks(cfg: EngineConfig, resident_bytes: int = 0) -> int:
    """TPU analog of the reference's KV-init protocol
    (determine_available_memory → num_gpu_blocks,
    `src/doc/VLLM_V1_Interface.md:57-64`): read HBM stats after weights are
    resident, carve the block pool from what's left. When the runtime
    exposes no stats (e.g. tunneled plugins), fall back to the known
    per-chip HBM size minus the measured parameter bytes."""
    if cfg.cache.num_blocks is not None:
        return cfg.cache.num_blocks
    dev = jax.devices()[0]
    stats = None
    try:
        stats = dev.memory_stats()
    except Exception:
        pass
    per_block = _kv_bytes_per_block(cfg, cfg.cache.block_size)
    if stats and "bytes_limit" in stats:
        free = (
            stats["bytes_limit"] * cfg.cache.gpu_memory_utilization
            - stats.get("bytes_in_use", 0)
        )
    elif jax.default_backend() == "tpu":
        free = (
            _TPU_HBM_FALLBACK_BYTES * cfg.cache.gpu_memory_utilization
            - resident_bytes
        )
    else:
        return _DEFAULT_NUM_BLOCKS
    num = max(int(free) // per_block, 16)
    # cap at the maximum the scheduler can ever address: every slot at
    # max_model_len (+ spec/fused-step headroom) — a bigger pool is pure
    # HBM waste that crowds out XLA temp buffers
    k = cfg.speculative.num_speculative_tokens if cfg.speculative else 0
    m = max(1, cfg.scheduler.decode_steps)
    per_seq = -(-(cfg.model.max_model_len + m * (k + 1)) // cfg.cache.block_size)
    return min(num, cfg.scheduler.max_num_seqs * per_seq + 1)


class ModelRunner:
    """Owns device state (params, KV caches) and the compiled step fns."""

    def __init__(self, config: EngineConfig, num_blocks: int | None = None):
        self.config = config
        if not config.enforce_eager:
            from vllm_omni_draft_tpu.ops import pallas as pallas_kernels

            pallas_kernels.install()  # no-op off-TPU
        sched = config.scheduler
        self.block_size = config.cache.block_size
        self.B = sched.max_num_seqs
        self.K = (
            config.speculative.num_speculative_tokens if config.speculative else 0
        )
        self.M = max(1, sched.decode_steps)  # fused decode iters per call
        # a fused call advances up to M*(K+1) tokens, writing KV up to
        # position len-1 + M*(K+1)-1: give the table that much headroom
        self.NB = -(
            -(config.model.max_model_len + self.M * (self.K + 1))
            // self.block_size
        )
        self.buckets = sched.prefill_buckets

        # device mesh: TP shards the target over ICI; the draft is
        # replicated (BASELINE.json: per-host draft replicas)
        self.mesh = make_mesh(config.parallel) if config.parallel.world_size > 1 else None

        # projection fusion halves per-layer matmul count; TP shards each
        # projection's output dim separately (megatron), so only fuse on
        # a single-model-shard mesh
        tp1 = config.parallel.tensor_parallel_size <= 1

        def _maybe_fuse(mcfg, params):
            if mcfg.fuse_projections and tp1:
                from vllm_omni_draft_tpu.models.weights import (
                    fuse_projection_stacks,
                )

                return jax.jit(fuse_projection_stacks, donate_argnums=0)(params)
            return params

        self.target_mod, self.target_params = _build_params(config.model)
        self.target_params = _maybe_fuse(config.model, self.target_params)
        # TP executor: "gspmd" (default) annotates shardings and lets XLA
        # partition — correct everywhere, but it cannot partition the
        # Pallas custom calls (it all-gathers / reshards weights;
        # PERF_NOTES round-5 collective audit). "shardmap" routes the
        # layer stack through parallel/tp_forward.py: per-shard kernels +
        # explicit megatron psums — the multi-chip TPU deployment path.
        self._tp_shardmap = False
        if (
            self.mesh is not None
            and os.environ.get("VOT_TP_EXECUTOR", "gspmd") == "shardmap"
            and config.parallel.tensor_parallel_size > 1
        ):
            from vllm_omni_draft_tpu.parallel import tp_forward as _tpf

            if _tpf.tp_supported(
                config.model, config.parallel.tensor_parallel_size
            ):
                self.target_mod = _tpf.TpModelAdapter(
                    self.target_mod, config.model, self.mesh
                )
                self._tp_shardmap = True
        self.target_fwd = self.target_mod.make_forward(config.model)
        # decode/verify-side forward: deferred KV commit (one batched
        # all-layer scatter pair per forward + VMEM attention tail)
        # replaces 2L per-layer scatters — ~7.3 ms/step of fixed scatter
        # cost in the round-3 deep profile. VOT_DEFER_KV=0 restores the
        # immediate-write forward for A/B. Prefill paths keep the
        # immediate forward (the prefill kernel has no tail mode).
        self._defer_kv = os.environ.get("VOT_DEFER_KV", "1") == "1"
        self.target_fwd_dec = (
            self.target_mod.make_forward(config.model, deferred_kv=True)
            if self._defer_kv else self.target_fwd
        )
        if self.mesh is not None:
            if self._tp_shardmap:
                from vllm_omni_draft_tpu.parallel.tp_forward import (
                    shard_params_tp as _shard_params_tp,
                )

                self.target_params = _shard_params_tp(
                    self.target_params, self.mesh
                )
            else:
                self.target_params = shd.shard_params(
                    self.target_params, self.mesh
                )
        self.draft_cfg = config.speculative.draft_model if config.speculative else None
        self.draft_vocab = (
            config.speculative.draft_vocab_size if config.speculative else None
        )
        if self.draft_cfg is not None:
            self.draft_mod, self.draft_params = _build_params(self.draft_cfg)
            self.draft_params = _maybe_fuse(self.draft_cfg, self.draft_params)
            self.draft_fwd = self.draft_mod.make_forward(self.draft_cfg)
            self.draft_fwd_dec = (
                self.draft_mod.make_forward(self.draft_cfg, deferred_kv=True)
                if self._defer_kv else self.draft_fwd
            )
            if self.mesh is not None:
                self.draft_params = shd.replicate(self.draft_params, self.mesh)
            if self.draft_vocab and self.draft_vocab < self.draft_cfg.vocab_size:
                # pruned proposal vocab: replace the draft head with its
                # first-Vp-rows slice (identity id mapping); the draft then
                # only ever reads Vp rows of the [V, D] head — its dominant
                # weight traffic. Lossless for any proposal distribution.
                head = self.draft_params.get("lm_head") or {
                    "w": self.draft_params["embed"]
                }
                self.draft_params = {
                    **self.draft_params,
                    "lm_head": jax.tree.map(
                        lambda a: a[: self.draft_vocab], head
                    ),
                }
        # profile free HBM *after* weights are resident
        if num_blocks is not None:
            self.num_blocks = num_blocks
        else:
            from vllm_omni_draft_tpu.models.weights import param_bytes

            resident = param_bytes(self.target_params)
            if self.draft_cfg is not None:
                resident += param_bytes(self.draft_params)
            self.num_blocks = determine_num_blocks(config, resident)
        self.kv_t = self._make_kv(self.target_mod, config.model)
        self.kv_d = (
            self._make_kv(self.draft_mod, self.draft_cfg)
            if self.draft_cfg is not None
            else None
        )

        # host-side slot state
        self.block_tables = np.zeros((self.B, self.NB), np.int32)
        self.seq_lens = np.zeros(self.B, np.int32)
        self.last_tokens = np.zeros(self.B, np.int32)
        self.prev_tokens = np.zeros(self.B, np.int32)  # second-to-last
        self.temps = np.zeros(self.B, np.float32)
        self.top_ps = np.ones(self.B, np.float32)
        self.top_ks = np.zeros(self.B, np.int32)
        self.free_slots = list(range(self.B - 1, -1, -1))
        self.step_count = 0
        self.base_key = jax.random.PRNGKey(config.seed)

        self._build_fns()
        self._encode_fns: dict[int, object] = {}
        self.last_step_time = 0.0

    def _make_kv(self, mod, mcfg) -> dict:
        """Allocate the paged KV cache, sharded over kv-heads on the TP
        axis when on a mesh (created *directly* sharded — no transient
        full-size allocation on one device)."""
        if self.mesh is None:
            return mod.init_kv_cache(mcfg, self.num_blocks, self.block_size)
        tp = self.mesh.shape[TP_AXIS]
        if mcfg.num_kv_heads % tp == 0:
            s = shd.kv_cache_sharding(self.mesh)
        else:
            from jax.sharding import NamedSharding, PartitionSpec as P

            s = NamedSharding(self.mesh, P(None, None, None, None, None))
        make = lambda: mod.init_kv_cache(mcfg, self.num_blocks, self.block_size)
        return jax.jit(make, out_shardings={"k": s, "v": s})()

    # ------------------------------------------------------------------
    # compiled programs
    # ------------------------------------------------------------------

    def _build_fns(self):
        cfg = self.config.model
        bs = self.block_size
        K = self.K
        LPK = 8  # top-k logprobs returned when requested
        jit = (lambda f, **kw: f) if self.config.enforce_eager else jax.jit

        def prefill(params, kv, tokens, start_pos, num_real, block_table):
            # tokens [1, T]; block_table [1, NB]
            T = tokens.shape[1]
            idx = jnp.arange(T, dtype=jnp.int32)
            real = idx < num_real
            positions = jnp.where(real, start_pos + idx, -1)[None, :]
            meta = AttentionMetadata(
                block_tables=block_table,
                kv_lens=(start_pos + num_real)[None],
                positions=positions,
                slot_mapping=_slots_from_positions(block_table, positions, bs),
            )
            hidden, kv = self.target_fwd(params, tokens, positions, kv, meta)
            last = hidden[0, jnp.maximum(num_real - 1, 0)]
            logits = self.target_mod.compute_logits(cfg, params, last[None, :])[0]
            return logits, kv

        self._prefill_fn = jit(prefill, donate_argnums=(1,))

        def prefill_batch(params, kv, tokens, start_pos, num_real,
                          block_tables):
            """Batched multi-sequence prefill: N prompt chunks in ONE
            program — weights stream once for the whole group instead of
            once per prompt (round-3 TTFT finding: one-seq-per-call
            prefill ran at ~2.3k tok/s; cold-burst TTFT is admission +
            prefill-throughput bound). tokens [N, T]; start_pos/num_real
            [N]; block_tables [N, NB]. num_real == 0 rows are inert
            (positions -1, kv_lens 0, slots -1 — the padding invariant).
            """
            N, T = tokens.shape
            idx = jnp.arange(T, dtype=jnp.int32)
            real = idx[None, :] < num_real[:, None]
            positions = jnp.where(real, start_pos[:, None] + idx[None, :], -1)
            meta = AttentionMetadata(
                block_tables=block_tables,
                kv_lens=jnp.where(num_real > 0, start_pos + num_real, 0),
                positions=positions,
                slot_mapping=_slots_from_positions(
                    block_tables, positions, bs
                ),
            )
            hidden, kv = self.target_fwd(params, tokens, positions, kv, meta)
            rows = jnp.take_along_axis(
                hidden,
                jnp.maximum(num_real - 1, 0)[:, None, None],
                axis=1,
            )[:, 0]  # [N, D]
            logits = self.target_mod.compute_logits(cfg, params, rows)
            return logits, kv

        self._prefill_batch_fn = jit(prefill_batch, donate_argnums=(1,))

        def prefill_logprobs(params, kv, tokens, start_pos, num_real,
                             block_table, next_tokens):
            """Prefill chunk that ALSO returns top-LPK logprobs of every
            chunk position's next-token distribution (prompt-logprobs
            mode; reference: prompt logprobs in the logprobs processor,
            `engine_core.md:412-475`). next_tokens[0, i] = the actual
            token at global position start_pos+i+1 (whose logprob under
            this position's distribution is returned as `chosen`)."""
            T = tokens.shape[1]
            idx = jnp.arange(T, dtype=jnp.int32)
            real = idx < num_real
            positions = jnp.where(real, start_pos + idx, -1)[None, :]
            meta = AttentionMetadata(
                block_tables=block_table,
                kv_lens=(start_pos + num_real)[None],
                positions=positions,
                slot_mapping=_slots_from_positions(block_table, positions, bs),
            )
            hidden, kv = self.target_fwd(params, tokens, positions, kv, meta)
            logits_all = self.target_mod.compute_logits(cfg, params, hidden[0])
            logp = jax.nn.log_softmax(logits_all.astype(jnp.float32), axis=-1)
            vals, ids = jax.lax.top_k(logp, LPK)
            chosen = jnp.take_along_axis(
                logp, jnp.maximum(next_tokens[0], 0)[:, None], axis=1
            )[:, 0]
            last = hidden[0, jnp.maximum(num_real - 1, 0)]
            logits = self.target_mod.compute_logits(cfg, params, last[None, :])[0]
            return logits, vals, ids.astype(jnp.int32), chosen, kv

        self._prefill_logprobs_fn = jit(prefill_logprobs, donate_argnums=(1,))

        def prefill_mm(params, kv, tokens, start_pos, num_real, block_table,
                       mm_embeds, mm_mask):
            """Multimodal prefill: image-placeholder positions take the
            vision-encoder embeddings instead of the token embedding
            (reference capability: image tokens entering prefill,
            `src/doc/engine_core.md:297-298`)."""
            T = tokens.shape[1]
            idx = jnp.arange(T, dtype=jnp.int32)
            real = idx < num_real
            positions = jnp.where(real, start_pos + idx, -1)[None, :]
            meta = AttentionMetadata(
                block_tables=block_table,
                kv_lens=(start_pos + num_real)[None],
                positions=positions,
                slot_mapping=_slots_from_positions(block_table, positions, bs),
            )
            x = params["embed"][jnp.maximum(tokens, 0)]
            x = jnp.where(mm_mask[:, :, None], mm_embeds.astype(x.dtype), x)
            hidden, kv = self.target_fwd(
                params, tokens, positions, kv, meta, input_embeds=x
            )
            last = hidden[0, jnp.maximum(num_real - 1, 0)]
            logits = self.target_mod.compute_logits(cfg, params, last[None, :])[0]
            return logits, kv

        self._prefill_mm_fn = jit(prefill_mm, donate_argnums=(1,))

        def prefill_mm_batch(params, kv, tokens, start_pos, num_real,
                             block_tables, mm_embeds, mm_mask):
            """Batched multimodal prefill: N mm prompt chunks in ONE
            program (the text prefill_batch with a per-row embedding
            splice). Round-4: the per-request mm path measured ~1.2k
            tok/s on chip vs 10.3k for batched text prefill — same
            weights-stream-once economics apply. tokens [N, T];
            mm_embeds [N, T, D]; mm_mask [N, T]."""
            N, T = tokens.shape
            idx = jnp.arange(T, dtype=jnp.int32)
            real = idx[None, :] < num_real[:, None]
            positions = jnp.where(real, start_pos[:, None] + idx[None, :], -1)
            meta = AttentionMetadata(
                block_tables=block_tables,
                kv_lens=jnp.where(num_real > 0, start_pos + num_real, 0),
                positions=positions,
                slot_mapping=_slots_from_positions(
                    block_tables, positions, bs
                ),
            )
            x = params["embed"][jnp.maximum(tokens, 0)]
            x = jnp.where(mm_mask[:, :, None], mm_embeds.astype(x.dtype), x)
            hidden, kv = self.target_fwd(
                params, tokens, positions, kv, meta, input_embeds=x
            )
            rows = jnp.take_along_axis(
                hidden,
                jnp.maximum(num_real - 1, 0)[:, None, None],
                axis=1,
            )[:, 0]
            logits = self.target_mod.compute_logits(cfg, params, rows)
            return logits, kv

        self._prefill_mm_batch_fn = jit(prefill_mm_batch, donate_argnums=(1,))

        if self.draft_cfg is not None:
            dcfg = self.draft_cfg

            def draft_prefill(params, kv, tokens, start_pos, num_real, block_table):
                T = tokens.shape[1]
                idx = jnp.arange(T, dtype=jnp.int32)
                real = idx < num_real
                positions = jnp.where(real, start_pos + idx, -1)[None, :]
                meta = AttentionMetadata(
                    block_tables=block_table,
                    kv_lens=(start_pos + num_real)[None],
                    positions=positions,
                    slot_mapping=_slots_from_positions(block_table, positions, bs),
                )
                _, kv = self.draft_fwd(params, tokens, positions, kv, meta)
                return kv

            self._draft_prefill_fn = jit(draft_prefill, donate_argnums=(1,))

            def draft_prefill_batch(params, kv, tokens, start_pos,
                                    num_real, block_tables):
                N, T = tokens.shape
                idx = jnp.arange(T, dtype=jnp.int32)
                real = idx[None, :] < num_real[:, None]
                positions = jnp.where(
                    real, start_pos[:, None] + idx[None, :], -1
                )
                meta = AttentionMetadata(
                    block_tables=block_tables,
                    kv_lens=jnp.where(num_real > 0, start_pos + num_real, 0),
                    positions=positions,
                    slot_mapping=_slots_from_positions(
                        block_tables, positions, bs
                    ),
                )
                _, kv = self.draft_fwd(params, tokens, positions, kv, meta)
                return kv

            self._draft_prefill_batch_fn = jit(
                draft_prefill_batch, donate_argnums=(1,)
            )

        def sample_one(logits, temp, top_k, top_p, key):
            probs = compute_probs(logits[None], temp[None], top_k[None], top_p[None])
            return sample_from_probs(probs, key)[0]

        self._sample_fn = jit(sample_one)
        self._argmax_fn = jit(lambda logits: jnp.argmax(logits, -1).astype(jnp.int32))

        def first_tokens_batch(logits, temps, top_ks, top_ps, keys):
            """Per-row first-token sampling for a prefill group [N, V]:
            row-local compute_probs (greedy rows one-hot at the argmax)
            + per-row categorical under that row's own folded key —
            token-for-token identical to the per-request sample_one /
            argmax path, but ONE device program and ONE host readback
            per group instead of one blocking sync per request (the
            ~30 ms axon readback per request dominated cold-burst
            prefill: 32 requests ~ 1 s of host-blocked time while the
            chip sat idle)."""
            probs = compute_probs(logits, temps, top_ks, top_ps)
            return jax.vmap(
                lambda p, k: sample_from_probs(p[None], k)[0]
            )(probs, keys)

        self._first_tokens_fn = jit(first_tokens_batch)
        # fold all row keys in ONE dispatch (N separate fold_in calls are
        # N tiny device programs over the tunnel)
        self._fold_keys_fn = jit(
            lambda key, idxs: jax.vmap(
                lambda i: jax.random.fold_in(key, i)
            )(idxs)
        )

        def _unpack_mask(words, V):
            """Packed uint32 words [..., W] -> bool keep mask [..., V]
            (bit i of word w covers token id w*32+i — the
            core/structured.pack_token_ids layout)."""
            shifts = jnp.arange(32, dtype=jnp.uint32)
            bits = (words[..., None] >> shifts) & jnp.uint32(1)
            flat = bits.reshape(*words.shape[:-1], words.shape[-1] * 32)
            return flat[..., :V] != 0

        def sample_one_masked(logits, temp, top_k, top_p, key, mask_words):
            """Grammar-constrained single-row sampling: mask_words is the
            packed allowed-token bitmask (arbitrary-width allowed sets —
            reference: grammar bitmask, `engine_core.md:307-310`)."""
            keep = _unpack_mask(mask_words, logits.shape[0])
            masked = jnp.where(keep, logits, -1e30)
            probs = compute_probs(masked[None], temp[None], top_k[None], top_p[None])
            return sample_from_probs(probs, key)[0]

        self._sample_masked_fn = jit(sample_one_masked)

        M = self.M

        def _decode_iter(params, kv, cur, lens, block_tables, pick_token):
            """One decode iteration: forward the current tokens, pick next.
            `pick_token` receives the last-position HIDDEN state [B, D] so
            the greedy path can use the fused matmul+argmax lm_head (never
            materializing [B, V] f32 logits)."""
            active = lens > 0
            positions = jnp.where(active[:, None], (lens - 1)[:, None], -1)
            meta = AttentionMetadata(
                block_tables=block_tables,
                kv_lens=jnp.where(active, lens, 0),
                positions=positions,
                slot_mapping=_slots_from_positions(block_tables, positions, bs),
            )
            hidden, kv = self.target_fwd_dec(params, cur[:, None], positions, kv, meta)
            tok = pick_token(hidden[:, 0])
            lens = jnp.where(active, lens + 1, lens)
            return kv, tok, lens

        def _logits_pick(params, pick_from_logits):
            return lambda h: pick_from_logits(
                self.target_mod.compute_logits(cfg, params, h)
            )

        def decode(params, kv, last_tokens, seq_lens, block_tables,
                   temps, top_ks, top_ps, key):
            """M fused decode iterations, device-side token feedback.
            Also returns the post-step (last, prev, lens) device feed for
            lag-1 continuation dispatch (no host sync between steps)."""

            def body(carry, i):
                kv, cur, lens = carry
                def pick(logits):
                    probs = compute_probs(logits, temps, top_ks, top_ps)
                    return sample_from_probs(probs, jax.random.fold_in(key, i))
                kv, tok, lens = _decode_iter(params, kv, cur, lens,
                                             block_tables,
                                             _logits_pick(params, pick))
                return (kv, tok, lens), tok

            (kv, last, lens), toks = jax.lax.scan(
                body, (kv, last_tokens, seq_lens), jnp.arange(M, dtype=jnp.int32)
            )
            prev = toks[M - 2] if M >= 2 else last_tokens
            return toks.T, kv, (last, prev, lens)  # [B, M]

        self._decode_fn = jit(decode, donate_argnums=(1,))

        def decode_greedy(params, kv, last_tokens, seq_lens, block_tables):
            """All-greedy batch: argmax feedback, no sampler."""

            def body(carry, i):
                kv, cur, lens = carry
                pick = lambda h: self.target_mod.compute_argmax(cfg, params, h)
                kv, tok, lens = _decode_iter(params, kv, cur, lens,
                                             block_tables, pick)
                return (kv, tok, lens), tok

            (kv, last, lens), toks = jax.lax.scan(
                body, (kv, last_tokens, seq_lens), jnp.arange(M, dtype=jnp.int32)
            )
            prev = toks[M - 2] if M >= 2 else last_tokens
            return toks.T, kv, (last, prev, lens)

        self._decode_greedy_fn = jit(decode_greedy, donate_argnums=(1,))

        def decode_masked(params, kv, last_tokens, seq_lens, block_tables,
                          temps, top_ks, top_ps, key, mask_words, constrained):
            """Grammar-constrained single-iteration decode: rows with
            constrained=True sample only from their packed allowed-token
            bitmask (reference: grammar bitmask fed to the sampler,
            `engine_core.md:307-310`). One iteration per call — the host
            FSM must advance between tokens. In a mixed batch the
            unconstrained rows run their own spec/fused program with these
            rows inert, and vice versa (seq_lens=0 rows are inert)."""

            def pick(logits):
                keep = _unpack_mask(mask_words, cfg.vocab_size)  # [B, V]
                eff = jnp.where(
                    constrained[:, None] & ~keep, -1e30, logits
                )
                probs = compute_probs(eff, temps, top_ks, top_ps)
                return sample_from_probs(probs, key)

            kv, tok, _ = _decode_iter(
                params, kv, last_tokens, seq_lens, block_tables,
                _logits_pick(params, pick),
            )
            return tok[:, None], kv  # [B, 1]

        self._decode_masked_fn = jit(decode_masked, donate_argnums=(1,))

        def decode_logprobs(params, kv, last_tokens, seq_lens, block_tables,
                            temps, top_ks, top_ps, key):
            """Single-iteration decode that also returns top-k logprobs of
            the sampling distribution plus the sampled token's logprob
            (reference capability: logprobs processor,
            `engine_core.md:412-475`)."""
            out = {}

            def pick(logits):
                probs = compute_probs(logits, temps, top_ks, top_ps)
                tok = sample_from_probs(probs, key)
                greedy_tok = jnp.argmax(logits, axis=-1).astype(jnp.int32)
                tok = jnp.where(temps <= 0.0, greedy_tok, tok)
                logp = jnp.log(jnp.maximum(probs, 1e-30))
                vals, ids = jax.lax.top_k(logp, LPK)
                chosen = jnp.take_along_axis(logp, tok[:, None], axis=1)[:, 0]
                out["lp"] = (vals, ids.astype(jnp.int32), chosen)
                return tok

            kv, tok, _ = _decode_iter(
                params, kv, last_tokens, seq_lens, block_tables,
                _logits_pick(params, pick),
            )
            vals, ids, chosen = out["lp"]
            return tok[:, None], vals, ids, chosen, kv

        self._decode_logprobs_fn = jit(decode_logprobs, donate_argnums=(1,))

        if self.draft_cfg is None or K == 0:
            return
        dcfg = self.draft_cfg

        def _spec_iter(params_t, params_d, kv_t, kv_d, prev, last, lens,
                       block_tables, greedy, temps, top_ks, top_ps, key_i,
                       with_logprobs=False):
            """One draft-propose(K)/verify/reject iteration. Returns
            (kv_t, kv_d, out_toks [B,K+1], num_emitted [B], lp) where lp
            is None or (vals [B,K+1,LPK], ids, chosen [B,K+1]) — top-LPK
            logprobs of the target's per-position sampling distribution
            (spec decode and logprobs COEXIST; the distributions are
            already computed for rejection)."""
            B = last.shape[0]
            active = lens > 0

            # draft iteration 0 feeds the last TWO tokens: after an
            # all-accept step the draft never saw its own last proposal,
            # so its KV one position back may be a hole; re-deriving is
            # idempotent when present and fills it when missing.
            pos0 = (lens - 2)[:, None] + jnp.arange(2, dtype=jnp.int32)
            pos0 = jnp.where(active[:, None], pos0, -1)
            meta0 = AttentionMetadata(
                block_tables=block_tables,
                kv_lens=jnp.where(active, lens, 0),
                positions=pos0,
                slot_mapping=_slots_from_positions(block_tables, pos0, bs),
            )
            toks0 = jnp.stack([prev, last], axis=1)  # [B, 2]
            hidden0, kv_d = self.draft_fwd_dec(params_d, toks0, pos0, kv_d, meta0)

            # q distributions stay on the (possibly pruned) draft vocab:
            # rejection_sample handles Vq < V natively (zero prob outside
            # the prefix), so no per-step [B, V] padding is materialized
            spec_cfg = self.config.speculative

            def draft_q(logits):
                # lossless for ANY q: the unfiltered path trades the K
                # per-iter threshold searches for plain temperature
                # softmax (SpeculativeConfig.draft_sampling_filter)
                if spec_cfg is not None and not spec_cfg.draft_sampling_filter:
                    safe_t = jnp.where(temps <= 0.0, 1.0, temps)
                    probs = jax.nn.softmax(
                        logits.astype(jnp.float32) / safe_t[:, None], axis=-1
                    )
                    one_hot = jax.nn.one_hot(
                        jnp.argmax(logits, axis=-1), logits.shape[-1],
                        dtype=jnp.float32,
                    )
                    return jnp.where((temps <= 0.0)[:, None], one_hot, probs)
                return compute_probs(logits, temps, top_ks, top_ps)

            if greedy:
                d1 = self.draft_mod.compute_argmax(
                    dcfg, params_d, hidden0[:, 1]
                )
                q0 = None
            else:
                logits0 = self.draft_mod.compute_logits(
                    dcfg, params_d, hidden0[:, 1]
                )
                q0 = draft_q(logits0)
                d1 = sample_from_probs(q0, jax.random.fold_in(key_i, 0))

            def draft_body(carry, i):
                kv_d, cur = carry
                positions = (lens - 1 + i)[:, None]
                positions = jnp.where(active[:, None], positions, -1)
                meta = AttentionMetadata(
                    block_tables=block_tables,
                    kv_lens=jnp.where(active, lens + i, 0),
                    positions=positions,
                    slot_mapping=_slots_from_positions(block_tables, positions, bs),
                )
                hidden, kv_d = self.draft_fwd_dec(
                    params_d, cur[:, None], positions, kv_d, meta
                )
                if greedy:
                    tok = self.draft_mod.compute_argmax(
                        dcfg, params_d, hidden[:, 0]
                    )
                    return (kv_d, tok), (tok, jnp.zeros((B, 1), jnp.float32))
                logits = self.draft_mod.compute_logits(dcfg, params_d, hidden[:, 0])
                q = draft_q(logits)
                tok = sample_from_probs(q, jax.random.fold_in(key_i, i))
                return (kv_d, tok), (tok, q)

            (kv_d, _), (draft_rest, q_rest) = jax.lax.scan(
                draft_body, (kv_d, d1), jnp.arange(1, K, dtype=jnp.int32),
                unroll=True,  # K-1 <= ~7 steps; skip while-loop machinery
            )
            draft_toks = jnp.concatenate([d1[:, None], draft_rest.T], axis=1)

            # target verifies K+1 positions in one batched forward
            verify_toks = jnp.concatenate([last[:, None], draft_toks], axis=1)
            positions = (lens - 1)[:, None] + jnp.arange(K + 1, dtype=jnp.int32)
            positions = jnp.where(active[:, None], positions, -1)
            meta = AttentionMetadata(
                block_tables=block_tables,
                kv_lens=jnp.where(active, lens + K, 0),
                positions=positions,
                slot_mapping=_slots_from_positions(block_tables, positions, bs),
            )
            hidden, kv_t = self.target_fwd_dec(params_t, verify_toks, positions, kv_t, meta)
            lp = None
            if greedy:
                assert not with_logprobs  # logprobs batches use the sampled fn
                tgt_argmax = self.target_mod.compute_argmax(
                    cfg, params_t, hidden.reshape(B * (K + 1), -1)
                ).reshape(B, K + 1)
                out_toks, num_emitted = rejection_greedy(draft_toks, tgt_argmax)
            else:
                V = cfg.vocab_size
                q_probs = jnp.concatenate(
                    [q0[:, None, :], jnp.swapaxes(q_rest, 0, 1)], axis=1
                )
                if not with_logprobs:
                    # gather-based path: accept probs via per-id gathers,
                    # full distribution only at the ONE first-rejection
                    # row — the [B, K+1, V] f32 probs tensor (~100 MB at
                    # 7B) is never materialized. Row max/argmax come
                    # fused from the lm_head kernel epilogue (two fewer
                    # full-width [B*(K+1), V] reductions per iter).
                    logits, r_mx, r_am = self.target_mod.compute_logits_stats(
                        cfg, params_t, hidden.reshape(B * (K + 1), -1)
                    )
                    out_toks, num_emitted = rejection_sample_sparse(
                        draft_toks, q_probs, logits.reshape(B, K + 1, V),
                        temps, top_ks, top_ps,
                        jax.random.fold_in(key_i, 999),
                        row_max=r_mx.reshape(B, K + 1),
                        row_argmax=r_am.reshape(B, K + 1),
                    )
                else:
                    logits = self.target_mod.compute_logits(
                        cfg, params_t, hidden.reshape(B * (K + 1), -1)
                    )
                    p_probs = compute_probs(
                        logits,
                        jnp.repeat(temps, K + 1),
                        jnp.repeat(top_ks, K + 1),
                        jnp.repeat(top_ps, K + 1),
                    ).reshape(B, K + 1, V)
                    out_toks, num_emitted = rejection_sample_dispatch(
                        draft_toks, q_probs, p_probs,
                        jax.random.fold_in(key_i, 999),
                    )
                if with_logprobs:
                    logp = jnp.log(jnp.maximum(p_probs, 1e-30))  # [B,K+1,V]
                    lvals, lids = jax.lax.top_k(logp, LPK)
                    chosen = jnp.take_along_axis(
                        logp, jnp.maximum(out_toks, 0)[..., None], axis=-1
                    )[..., 0]
                    lp = (lvals, lids.astype(jnp.int32), chosen)
            # inactive rows emit nothing
            num_emitted = jnp.where(active, num_emitted, 0)
            return kv_t, kv_d, out_toks, num_emitted, lp

        def _spec_multi(greedy, with_logprobs=False):
            def fn(params_t, params_d, kv_t, kv_d, prev_tokens, last_tokens,
                   seq_lens, block_tables, temps=None, top_ks=None,
                   top_ps=None, key=None):
                def body(carry, m):
                    kv_t, kv_d, prev, last, lens = carry
                    key_m = (
                        jax.random.fold_in(key, m) if key is not None else None
                    )
                    kv_t, kv_d, out, n, lp = _spec_iter(
                        params_t, params_d, kv_t, kv_d, prev, last, lens,
                        block_tables, greedy, temps, top_ks, top_ps, key_m,
                        with_logprobs=with_logprobs,
                    )
                    active = lens > 0
                    nn = jnp.maximum(n, 1)
                    last_new = jnp.take_along_axis(out, (nn - 1)[:, None], axis=1)[:, 0]
                    prev_new = jnp.where(
                        nn >= 2,
                        jnp.take_along_axis(
                            out, jnp.maximum(nn - 2, 0)[:, None], axis=1
                        )[:, 0],
                        last,
                    )
                    last_new = jnp.where(active, last_new, last)
                    prev_new = jnp.where(active, prev_new, prev)
                    lens_new = jnp.where(active, lens + n, lens)
                    ys = (out, n) if lp is None else (out, n, *lp)
                    return (kv_t, kv_d, prev_new, last_new, lens_new), ys

                carry = (kv_t, kv_d, prev_tokens, last_tokens, seq_lens)
                (kv_t, kv_d, prev, last, lens), ys = jax.lax.scan(
                    body, carry, jnp.arange(M, dtype=jnp.int32)
                )
                # scan-major [M, B, ...] -> batch-major [B, M, ...]
                outs, ns = ys[0], ys[1]
                ret = (jnp.swapaxes(outs, 0, 1), ns.T)
                if with_logprobs:
                    lvals, lids, lchosen = ys[2], ys[3], ys[4]
                    ret += (
                        jnp.swapaxes(lvals, 0, 1),   # [B, M, K+1, LPK]
                        jnp.swapaxes(lids, 0, 1),
                        jnp.swapaxes(lchosen, 0, 1),  # [B, M, K+1]
                    )
                return ret + (kv_t, kv_d, (last, prev, lens))

            return fn

        self._spec_fn = jit(_spec_multi(False), donate_argnums=(2, 3))
        self._spec_greedy_fn = jit(_spec_multi(True), donate_argnums=(2, 3))
        # spec decode + logprobs coexist: the sampled spec program with
        # top-LPK payloads (greedy rows get one-hot distributions — same
        # convention as decode_logprobs)
        self._spec_logprobs_fn = jit(
            _spec_multi(False, with_logprobs=True), donate_argnums=(2, 3)
        )

    # ------------------------------------------------------------------
    # pooling / encode (reference: `AsyncLLM.encode()` and the pooling
    # output path, `src/doc/engine_core.md:187, 800-813`)
    # ------------------------------------------------------------------

    def _make_encode_fn(self, T: int):
        cfg = self.config.model
        bs = self.block_size
        nb = -(-T // bs)  # data blocks; block 0 stays the null block
        mod, fwd = self.target_mod, self.target_fwd

        def encode(params, tokens, num_real):
            idx = jnp.arange(T, dtype=jnp.int32)
            real = idx < num_real
            positions = jnp.where(real, idx, -1)[None, :]
            bt = jnp.arange(1, nb + 1, dtype=jnp.int32)[None, :]
            # encode is one-shot: a throwaway local cache sized to the
            # bucket (zeros inside the jit — XLA allocates it transiently)
            kv = mod.init_kv_cache(cfg, nb + 1, bs)
            meta = AttentionMetadata(
                block_tables=bt,
                kv_lens=num_real[None],
                positions=positions,
                slot_mapping=_slots_from_positions(bt, positions, bs),
            )
            hidden, _ = fwd(params, tokens, positions, kv, meta)
            hf = hidden[0].astype(jnp.float32)
            m = real[:, None].astype(jnp.float32)
            mean = jnp.sum(hf * m, axis=0) / jnp.maximum(jnp.sum(m), 1.0)
            last = hf[jnp.maximum(num_real - 1, 0)]
            return mean, last

        return encode if self.config.enforce_eager else jax.jit(encode)

    def _prefill_bucket(self, chunk_len: int) -> int:
        """Smallest prefill bucket holding a chunk; a clear config error
        (not an opaque StopIteration->RuntimeError inside a generator)
        when the scheduler emits a chunk no bucket fits (ADVICE r3)."""
        T = next((b for b in self.buckets if b >= chunk_len), None)
        if T is None:
            raise ValueError(
                f"prefill chunk of {chunk_len} tokens exceeds every "
                f"configured prefill bucket {list(self.buckets)}; raise "
                "SchedulerConfig.prefill_buckets or lower the chunk size"
            )
        return T

    def encode(self, token_ids: list[int], pooling: str = "mean") -> np.ndarray:
        """Pooled embedding of a prompt ([D] f32). pooling: mean | last."""
        n = len(token_ids)
        T = next((b for b in self.buckets if b >= n), None)
        if T is None:  # longer than every prefill bucket: pow2 one-off
            T = 1 << (n - 1).bit_length()
        if T not in self._encode_fns:
            self._encode_fns[T] = self._make_encode_fn(T)
        tokens = np.zeros((1, T), np.int32)
        tokens[0, :n] = token_ids
        mean, last = self._encode_fns[T](
            self.target_params, jnp.asarray(tokens), jnp.int32(n)
        )
        return host_np(mean if pooling == "mean" else last)

    # ------------------------------------------------------------------
    # KV swap (host offload) — executes the scheduler's swap_out/swap_in
    # work orders (reference protocol: vLLM blocks_to_swap_out/in;
    # `VLLM_V1_Interface.md:64` initialize_cache(num_gpu, num_cpu)).
    # Block counts are padded to pow2 buckets by REPEATING the first id
    # (a duplicate gather/scatter of identical data is harmless) so each
    # bucket compiles once.
    # ------------------------------------------------------------------

    def _swap_pad(self, block_ids) -> tuple[np.ndarray, int]:
        ids = np.asarray(block_ids, np.int32)
        n = len(ids)
        nb = 1 << max(n - 1, 0).bit_length()
        return np.concatenate([ids, np.full(nb - n, ids[0], np.int32)]), n

    def _swap_gather_fn(self, nb: int):
        key = ("swap_gather", nb)
        if key not in self._encode_fns:
            self._encode_fns[key] = jax.jit(
                lambda cache, ids: {k: v[:, ids] for k, v in cache.items()}
            )
        return self._encode_fns[key]

    def _swap_scatter_fn(self, nb: int):
        key = ("swap_scatter", nb)
        if key not in self._encode_fns:
            self._encode_fns[key] = jax.jit(
                lambda cache, ids, vals: {
                    k: cache[k].at[:, ids].set(vals[k]) for k in cache
                },
                donate_argnums=0,  # alias: scatter in place, no cache copy
            )
        return self._encode_fns[key]

    def swap_out_blocks(self, block_ids: list[int]) -> dict:
        """Copy the KV of `block_ids` (all layers; target AND draft — both
        caches share block tables) to host arrays. The gather reads the
        current cache handles, so it synchronizes after every dispatched
        step that wrote them (XLA dataflow); callers must invoke this
        BEFORE dispatching the step that reuses the blocks."""
        ids, n = self._swap_pad(block_ids)
        fn = self._swap_gather_fn(len(ids))
        out = {"n": n, "t": jax.tree.map(np.asarray, fn(self.kv_t, ids))}
        if self.kv_d is not None:
            out["d"] = jax.tree.map(np.asarray, fn(self.kv_d, ids))
        return out

    def swap_in_blocks(self, host_kv: dict, block_ids: list[int]) -> None:
        """Restore a swap_out_blocks payload into freshly allocated blocks
        (in-place donated scatter — the cache is never copied)."""
        assert host_kv["n"] == len(block_ids), (host_kv["n"], len(block_ids))
        ids, _ = self._swap_pad(block_ids)
        fn = self._swap_scatter_fn(len(ids))
        self.kv_t = fn(self.kv_t, ids, host_kv["t"])
        if self.kv_d is not None:
            self.kv_d = fn(self.kv_d, ids, host_kv["d"])

    # ------------------------------------------------------------------
    # slot management
    # ------------------------------------------------------------------

    def assign_slot(self, req: Request) -> int:
        slot = self.free_slots.pop()
        req.slot = slot
        sp = req.sampling_params
        self.temps[slot] = sp.temperature
        self.top_ps[slot] = sp.top_p
        self.top_ks[slot] = sp.top_k
        self.seq_lens[slot] = 0
        self.block_tables[slot, :] = 0
        return slot

    def release_slot(self, req: Request) -> None:
        if req.slot >= 0:
            self.free_slots.append(req.slot)
            self.seq_lens[req.slot] = 0
            self.block_tables[req.slot, :] = 0
            req.slot = -1

    def sync_blocks(self, req: Request) -> None:
        """Mirror the request's block list into the device-facing table."""
        n = len(req.block_ids)
        self.block_tables[req.slot, :n] = req.block_ids

    def _mm_chunk(self, req: Request, sp, chunk_tokens: np.ndarray, T_pad: int):
        """Align vision embeddings with this chunk's image-placeholder
        positions. mm_inputs = {"embeds": [N_img_tokens, D], and optional
        "image_token_id"}; the j-th placeholder in the prompt takes
        embeds[j]."""
        from vllm_omni_draft_tpu.models.vision import IMAGE_PAD_TOKEN_ID

        mm = req.mm_inputs
        embeds = host_np(mm["embeds"])
        pad_id = mm.get("image_token_id", IMAGE_PAD_TOKEN_ID)
        D = embeds.shape[-1]
        mask = chunk_tokens == pad_id  # [T_pad] (padding zeros never match)
        out = np.zeros((T_pad, D), embeds.dtype)
        if mask.any():
            prior = sum(
                1 for t in req.all_token_ids[: sp.chunk_start] if t == pad_id
            )
            idx = prior + np.arange(int(mask.sum()))
            out[np.where(mask)[0]] = embeds[idx]
        return out, mask

    # ------------------------------------------------------------------
    # execute one scheduler step
    # ------------------------------------------------------------------

    def execute(self, sched: SchedulerOutput) -> RunnerOutput:
        return self.dispatch(sched).resolve()

    def _after_prefill_chunk(self, req, sp, logits, out, key, i):
        """Final-chunk bookkeeping shared by the single and batched
        prefill paths: sample the first output token (masked / greedy /
        sampled) or restore decode feed state after a recompute."""
        if sp.is_final_chunk and sp.sample_on_final:
            mgr = getattr(self, "structured", None)
            gmask = mgr.mask(req.request_id) if mgr is not None else None
            if gmask is not None:
                tok = int(
                    self._sample_masked_fn(
                        logits,
                        jnp.float32(req.sampling_params.temperature),
                        jnp.int32(req.sampling_params.top_k),
                        jnp.float32(req.sampling_params.top_p),
                        jax.random.fold_in(key, 1000 + i),
                        jnp.asarray(gmask),
                    )
                )
            elif req.sampling_params.is_greedy:
                tok = int(self._argmax_fn(logits))
            else:
                tok = int(
                    self._sample_fn(
                        logits,
                        jnp.float32(req.sampling_params.temperature),
                        jnp.int32(req.sampling_params.top_k),
                        jnp.float32(req.sampling_params.top_p),
                        jax.random.fold_in(key, 1000 + i),
                    )
                )
            out.new_tokens[req.request_id] = [tok]
            self.last_tokens[req.slot] = tok
            self.seq_lens[req.slot] = req.num_prompt_tokens + 1
        elif sp.is_final_chunk:
            # post-preemption recompute: last emitted token feeds decode
            self.last_tokens[req.slot] = req.all_token_ids[-1]
            self.seq_lens[req.slot] = req.num_tokens

    def dispatch(self, sched: SchedulerOutput, feed=None) -> "PendingStep":
        """Enqueue this step's device work and return a PendingStep whose
        .resolve() blocks on the results and finishes host bookkeeping.
        JAX dispatch is async, so between dispatch and resolve the host is
        free to schedule/dispatch ANOTHER (slot-disjoint) batch — the
        batch-queue overlap of `engine_core.md:97, 124-126` (PP hook /
        lag-1 readback). Prefill sampling stays synchronous (its token
        feeds the request's own decode state immediately).

        `feed`: device-side (last_tokens, prev_tokens, seq_lens) from the
        previous step's PendingStep — a decode-only continuation batch
        over the SAME slot set can dispatch from it without syncing the
        previous step back to the host (lag-1 decode streak). The caller
        (EngineCore) guarantees set equality and block headroom."""
        t0 = time.perf_counter()
        out = RunnerOutput(new_tokens={})
        self.step_count += 1
        key = jax.random.fold_in(self.base_key, self.step_count)
        # deferred host bookkeeping, run at PendingStep.resolve(): decode
        # finishers AND batched prefill first-token readbacks. All prefill
        # groups' token arrays concatenate into ONE device array read back
        # once at resolve time (each separate readback pays the ~30 ms
        # axon sync quantum).
        finishes: list = []
        first_tok_parts: list = []  # (device toks [N], [(row, req), ...])

        # ---- prefills (bucketed; PLAIN chunks batch multi-sequence) ----
        # mm / prompt-logprobs chunks keep their specialized single-seq
        # programs; everything else groups by token bucket and runs
        # through the batched program (up to 8 sequences per call —
        # weights stream once per GROUP, the round-3 TTFT lever)
        plain: list = []
        special: list = []
        for sp in sched.prefills:
            req = sp.request
            if req.slot < 0:
                self.assign_slot(req)
            self.sync_blocks(req)
            if (
                req.mm_inputs is not None
                or req.sampling_params.prompt_logprobs is not None
            ):
                special.append(sp)
            else:
                plain.append(sp)

        rng_i = 0
        from collections import defaultdict as _dd

        by_bucket: dict = _dd(list)
        for sp in plain:
            T = self._prefill_bucket(sp.chunk_len)
            by_bucket[T].append(sp)
        for T, sps in by_bucket.items():
            # group cap: N*T rows per program. Up to 256 rows the stacked
            # matmul kernels keep x VMEM-resident (1-D grid); beyond that
            # the 2-D row-tiled kernels stream x row tiles, so N=8 at
            # bucket 128-256 runs in one program (weights stream once for
            # the whole group — the round-4 TTFT lever). 2048 keeps the
            # largest program ~16 row tiles.
            cap = max(1, min(8, 2048 // T))
            pos = 0
            while pos < len(sps):
                rem = len(sps) - pos
                N = 1
                while N * 2 <= min(cap, rem):
                    N *= 2
                group = sps[pos : pos + N]
                pos += N
                tokens = np.zeros((N, T), np.int32)
                start_pos = np.zeros((N,), np.int32)
                num_real = np.zeros((N,), np.int32)
                bts = np.zeros(
                    (N, self.block_tables.shape[1]), np.int32
                )
                for n, sp in enumerate(group):
                    req = sp.request
                    # all_token_ids (not prompt) so post-preemption
                    # recompute also covers generated tokens
                    tokens[n, : sp.chunk_len] = req.all_token_ids[
                        sp.chunk_start : sp.chunk_start + sp.chunk_len
                    ]
                    start_pos[n] = sp.chunk_start
                    num_real[n] = sp.chunk_len
                    bts[n] = self.block_tables[sp.request.slot]
                if N == 1:
                    sp = group[0]
                    logits_b, self.kv_t = self._prefill_fn(
                        self.target_params,
                        self.kv_t,
                        jnp.asarray(tokens),
                        jnp.int32(sp.chunk_start),
                        jnp.int32(sp.chunk_len),
                        jnp.asarray(bts),
                    )
                    logits_b = logits_b[None]
                else:
                    logits_b, self.kv_t = self._prefill_batch_fn(
                        self.target_params,
                        self.kv_t,
                        jnp.asarray(tokens),
                        jnp.asarray(start_pos),
                        jnp.asarray(num_real),
                        jnp.asarray(bts),
                    )
                if self.kv_d is not None:
                    if N == 1:
                        sp = group[0]
                        self.kv_d = self._draft_prefill_fn(
                            self.draft_params,
                            self.kv_d,
                            jnp.asarray(tokens),
                            jnp.int32(sp.chunk_start),
                            jnp.int32(sp.chunk_len),
                            jnp.asarray(bts),
                        )
                    else:
                        self.kv_d = self._draft_prefill_batch_fn(
                            self.draft_params,
                            self.kv_d,
                            jnp.asarray(tokens),
                            jnp.asarray(start_pos),
                            jnp.asarray(num_real),
                            jnp.asarray(bts),
                        )
                # split rows: grammar-masked / recompute rows keep the
                # immediate per-request path; plain sampling rows batch
                # into ONE device sampler + ONE deferred readback
                samp_rows: list = []
                for n, sp in enumerate(group):
                    i = rng_i
                    rng_i += 1
                    req = sp.request
                    mgr = getattr(self, "structured", None)
                    gmask = (
                        mgr.mask(req.request_id)
                        if (mgr is not None and sp.is_final_chunk
                            and sp.sample_on_final)
                        else None
                    )
                    if (sp.is_final_chunk and sp.sample_on_final
                            and gmask is None):
                        samp_rows.append((n, req, i))
                    else:
                        self._after_prefill_chunk(
                            req, sp, logits_b[n], out, key, i
                        )
                if samp_rows:
                    temps = np.zeros(N, np.float32)
                    ks = np.zeros(N, np.int32)
                    ps = np.ones(N, np.float32)
                    key_idx = np.zeros(N, np.int32)
                    for n, req, i in samp_rows:
                        p = req.sampling_params
                        temps[n] = p.temperature
                        ks[n] = p.top_k
                        ps[n] = p.top_p
                        key_idx[n] = 1000 + i
                    toks_dev = self._first_tokens_fn(
                        logits_b,
                        jnp.asarray(temps), jnp.asarray(ks),
                        jnp.asarray(ps),
                        self._fold_keys_fn(key, jnp.asarray(key_idx)),
                    )
                    first_tok_parts.append(
                        (toks_dev, [(n, req) for n, req, _ in samp_rows])
                    )

        # multimodal chunks (without prompt-logprobs) group per bucket
        # exactly like plain text prefill — the per-request mm path
        # measured ~1.2k tok/s on chip vs 10.3k batched text (round 4);
        # the embedding splice is per-row and batches trivially.
        mm_only = [
            sp for sp in special
            if sp.request.mm_inputs is not None
            and sp.request.sampling_params.prompt_logprobs is None
        ]
        if len(mm_only) >= 2:
            drop = {id(sp) for sp in mm_only}
            special = [sp for sp in special if id(sp) not in drop]
            mm_buckets: dict = _dd(list)
            for sp in mm_only:
                mm_buckets[self._prefill_bucket(sp.chunk_len)].append(sp)
            for T, sps in mm_buckets.items():
                cap = max(1, min(8, 2048 // T))
                pos = 0
                while pos < len(sps):
                    rem = len(sps) - pos
                    N = 1
                    while N * 2 <= min(cap, rem):
                        N *= 2
                    group = sps[pos : pos + N]
                    pos += N
                    if N == 1:
                        special.append(group[0])  # singleton: existing path
                        continue
                    tokens = np.zeros((N, T), np.int32)
                    start_pos = np.zeros((N,), np.int32)
                    num_real = np.zeros((N,), np.int32)
                    bts = np.zeros((N, self.block_tables.shape[1]), np.int32)
                    mm_e = []
                    mm_m = []
                    for n, sp in enumerate(group):
                        req = sp.request
                        tokens[n, : sp.chunk_len] = req.all_token_ids[
                            sp.chunk_start : sp.chunk_start + sp.chunk_len
                        ]
                        start_pos[n] = sp.chunk_start
                        num_real[n] = sp.chunk_len
                        bts[n] = self.block_tables[req.slot]
                        e, m = self._mm_chunk(req, sp, tokens[n], T)
                        mm_e.append(np.asarray(e))
                        mm_m.append(np.asarray(m))
                    logits_b, self.kv_t = self._prefill_mm_batch_fn(
                        self.target_params,
                        self.kv_t,
                        jnp.asarray(tokens),
                        jnp.asarray(start_pos),
                        jnp.asarray(num_real),
                        jnp.asarray(bts),
                        jnp.asarray(np.stack(mm_e)),
                        jnp.asarray(np.stack(mm_m)),
                    )
                    if self.kv_d is not None:
                        self.kv_d = self._draft_prefill_batch_fn(
                            self.draft_params,
                            self.kv_d,
                            jnp.asarray(tokens),
                            jnp.asarray(start_pos),
                            jnp.asarray(num_real),
                            jnp.asarray(bts),
                        )
                    samp_rows = []
                    for n, sp in enumerate(group):
                        i = rng_i
                        rng_i += 1
                        req = sp.request
                        mgr = getattr(self, "structured", None)
                        gmask = (
                            mgr.mask(req.request_id)
                            if (mgr is not None and sp.is_final_chunk
                                and sp.sample_on_final)
                            else None
                        )
                        if (sp.is_final_chunk and sp.sample_on_final
                                and gmask is None):
                            samp_rows.append((n, req, i))
                        else:
                            self._after_prefill_chunk(
                                req, sp, logits_b[n], out, key, i
                            )
                    if samp_rows:
                        temps = np.zeros(N, np.float32)
                        ks = np.zeros(N, np.int32)
                        ps = np.ones(N, np.float32)
                        key_idx = np.zeros(N, np.int32)
                        for n, req, i in samp_rows:
                            p = req.sampling_params
                            temps[n] = p.temperature
                            ks[n] = p.top_k
                            ps[n] = p.top_p
                            key_idx[n] = 1000 + i
                        toks_dev = self._first_tokens_fn(
                            logits_b,
                            jnp.asarray(temps), jnp.asarray(ks),
                            jnp.asarray(ps),
                            self._fold_keys_fn(key, jnp.asarray(key_idx)),
                        )
                        first_tok_parts.append(
                            (toks_dev, [(n, req) for n, req, _ in samp_rows])
                        )

        for sp in special:
            i = rng_i
            rng_i += 1
            req = sp.request
            tok_slice = req.all_token_ids[sp.chunk_start : sp.chunk_start + sp.chunk_len]
            T = self._prefill_bucket(sp.chunk_len)
            tokens = np.zeros((1, T), np.int32)
            tokens[0, : sp.chunk_len] = tok_slice
            bt = jnp.asarray(self.block_tables[req.slot : req.slot + 1])
            if req.mm_inputs is not None:
                mm_embeds, mm_mask = self._mm_chunk(req, sp, tokens[0], T)
                logits, self.kv_t = self._prefill_mm_fn(
                    self.target_params,
                    self.kv_t,
                    jnp.asarray(tokens),
                    jnp.int32(sp.chunk_start),
                    jnp.int32(sp.chunk_len),
                    bt,
                    jnp.asarray(mm_embeds)[None],
                    jnp.asarray(mm_mask)[None],
                )
            elif req.sampling_params.prompt_logprobs is not None:
                all_ids = req.all_token_ids
                nxt = np.zeros((1, T), np.int32)
                for i2 in range(sp.chunk_len):
                    gp = sp.chunk_start + i2
                    if gp + 1 < len(all_ids):
                        nxt[0, i2] = all_ids[gp + 1]
                logits, plp_vals, plp_ids, plp_chosen, self.kv_t = (
                    self._prefill_logprobs_fn(
                        self.target_params,
                        self.kv_t,
                        jnp.asarray(tokens),
                        jnp.int32(sp.chunk_start),
                        jnp.int32(sp.chunk_len),
                        bt,
                        jnp.asarray(nxt),
                    )
                )
                ids_np = host_np(plp_ids)
                vals_np = host_np(plp_vals)
                chosen_np = host_np(plp_chosen)
                k_plp = min(
                    req.sampling_params.prompt_logprobs, ids_np.shape[-1]
                )
                payload = []
                for i2 in range(sp.chunk_len):
                    pred = sp.chunk_start + i2 + 1
                    if pred >= req.num_prompt_tokens:
                        break  # this position predicts an OUTPUT token
                    top = {
                        int(a): float(v)
                        for a, v in zip(ids_np[i2][:k_plp], vals_np[i2][:k_plp])
                    }
                    top[all_ids[pred]] = float(chosen_np[i2])
                    payload.append((pred, top))
                out.prompt_logprobs.setdefault(req.request_id, []).extend(
                    payload
                )
            else:
                logits, self.kv_t = self._prefill_fn(
                    self.target_params,
                    self.kv_t,
                    jnp.asarray(tokens),
                    jnp.int32(sp.chunk_start),
                    jnp.int32(sp.chunk_len),
                    bt,
                )
            if self.kv_d is not None:
                self.kv_d = self._draft_prefill_fn(
                    self.draft_params,
                    self.kv_d,
                    jnp.asarray(tokens),
                    jnp.int32(sp.chunk_start),
                    jnp.int32(sp.chunk_len),
                    bt,
                )
            # same deferral as the batched path: unmasked sampling rows
            # queue ONE device sampler call + a resolve-time readback
            # (mm prefill bursts otherwise pay a ~30 ms sync per image)
            mgr = getattr(self, "structured", None)
            gmask = (
                mgr.mask(req.request_id)
                if (mgr is not None and sp.is_final_chunk
                    and sp.sample_on_final)
                else None
            )
            if sp.is_final_chunk and sp.sample_on_final and gmask is None:
                p = req.sampling_params
                toks_dev = self._first_tokens_fn(
                    logits[None],
                    jnp.asarray([p.temperature], jnp.float32),
                    jnp.asarray([p.top_k], jnp.int32),
                    jnp.asarray([p.top_p], jnp.float32),
                    jax.random.fold_in(key, 1000 + i)[None],
                )

                first_tok_parts.append((toks_dev, [(0, req)]))
            else:
                self._after_prefill_chunk(req, sp, logits, out, key, i)

        if first_tok_parts:
            # one device concat + ONE resolve-time readback for every
            # prefill first token this step
            all_toks = (
                first_tok_parts[0][0]
                if len(first_tok_parts) == 1
                else jnp.concatenate([p[0] for p in first_tok_parts])
            )
            offsets = []
            base = 0
            for toks_dev, rows in first_tok_parts:
                offsets.append((base, rows))
                base += int(toks_dev.shape[0])

            def finish_first_tokens(toks=all_toks, offsets=offsets):
                toks_np = host_np(toks)
                for base, rows in offsets:
                    for n, req in rows:
                        if req.slot < 0:
                            continue  # aborted while in flight
                        tok = int(toks_np[base + n])
                        out.new_tokens[req.request_id] = [tok]
                        self.last_tokens[req.slot] = tok
                        self.seq_lens[req.slot] = req.num_prompt_tokens + 1

            finishes.append(finish_first_tokens)

        # ---- decodes ----
        # A mixed batch splits into (a) grammar-constrained rows — masked
        # single-step program (the host FSM must advance between tokens)
        # — and (b) free rows — the spec / fused multi-step / logprobs
        # program. Each program runs over the full B-slot arrays with the
        # OTHER group's rows inert (seq_lens=0), so spec decode keeps
        # running for unconstrained rows while a structured request sits
        # in the same batch (reference computes the grammar bitmask
        # alongside spec decode; `engine_core.md:307-310`).
        out_feed = None
        if sched.decodes:
            active = np.zeros(self.B, np.int32)
            for req in sched.decodes:
                if req.slot < 0:
                    self.assign_slot(req)
                self.sync_blocks(req)
                active[req.slot] = 1
                self.seq_lens[req.slot] = req.num_tokens
                self.last_tokens[req.slot] = req.all_token_ids[-1]
                self.prev_tokens[req.slot] = req.all_token_ids[-2]
            structured = getattr(self, "structured", None)
            gmasks = (
                {
                    req.request_id: structured.mask(req.request_id)
                    for req in sched.decodes
                }
                if structured is not None
                else {}
            )
            struct_rows = [
                r for r in sched.decodes if gmasks.get(r.request_id) is not None
            ]
            free_rows = [
                r for r in sched.decodes if gmasks.get(r.request_id) is None
            ]
            sample_args = (
                jnp.asarray(self.temps),
                jnp.asarray(self.top_ks),
                jnp.asarray(self.top_ps),
                key,
            )
            bt_dev = jnp.asarray(self.block_tables)

            if free_rows:
                free_act = np.zeros(self.B, bool)
                for r in free_rows:
                    free_act[r.slot] = True
                if feed is not None:
                    # lag-1 continuation: tokens/lens live on device,
                    # unread (streak never includes grammar rows)
                    feed_last, feed_prev, feed_lens = feed
                    base_args = (feed_last, feed_lens, bt_dev)
                else:
                    feed_prev = None
                    lens_np = np.where(
                        free_act & (active == 1), self.seq_lens, 0
                    )
                    base_args = (
                        jnp.asarray(self.last_tokens),
                        jnp.asarray(lens_np),
                        bt_dev,
                    )
                all_greedy = all(
                    req.sampling_params.is_greedy for req in free_rows
                )
                any_logprobs = any(
                    req.sampling_params.logprobs is not None for req in free_rows
                )
                if any_logprobs and self.K > 0 and self.kv_d is not None:
                    # spec decode + logprobs COEXIST: the sampled spec
                    # program already computes per-position target
                    # distributions; one batch member asking for logprobs
                    # no longer disables speculation for everyone
                    prev_arg = (
                        feed_prev if feed_prev is not None
                        else jnp.asarray(self.prev_tokens)
                    )
                    (toks, num_emitted, lp_vals, lp_ids, lp_chosen,
                     self.kv_t, self.kv_d, out_feed) = self._spec_logprobs_fn(
                        self.target_params, self.draft_params,
                        self.kv_t, self.kv_d, prev_arg, *base_args,
                        *sample_args
                    )

                    def finish_free(toks=toks, num_emitted=num_emitted,
                                    lp_vals=lp_vals, lp_ids=lp_ids,
                                    lp_chosen=lp_chosen):
                        toks_np = host_np(toks)      # [B, M, K+1]
                        n_np = host_np(num_emitted)  # [B, M]
                        vals_np = host_np(lp_vals)   # [B, M, K+1, LPK]
                        ids_np = host_np(lp_ids)
                        chosen_np = host_np(lp_chosen)  # [B, M, K+1]
                        for req in free_rows:
                            if req.slot < 0:
                                continue
                            emitted: list[int] = []
                            acc = 0
                            k_lp = req.sampling_params.logprobs
                            for m in range(self.M):
                                n = int(n_np[req.slot, m])
                                step_toks = toks_np[req.slot, m, :n].tolist()
                                emitted.extend(step_toks)
                                acc += max(n - 1, 0)
                                if k_lp is not None:
                                    for j, t in enumerate(step_toks):
                                        top = {
                                            int(i): float(v)
                                            for i, v in zip(
                                                ids_np[req.slot, m, j][:k_lp],
                                                vals_np[req.slot, m, j][:k_lp],
                                            )
                                        }
                                        top[t] = float(
                                            chosen_np[req.slot, m, j]
                                        )
                                        out.logprobs.setdefault(
                                            req.request_id, []
                                        ).append(top)
                            out.new_tokens[req.request_id] = emitted
                            out.num_accepted[req.request_id] = acc
                            out.num_draft[req.request_id] = self.K * self.M
                            self.last_tokens[req.slot] = emitted[-1]
                            self.seq_lens[req.slot] += len(emitted)

                elif any_logprobs:
                    toks, lp_vals, lp_ids, lp_chosen, self.kv_t = (
                        self._decode_logprobs_fn(
                            self.target_params, self.kv_t, *base_args,
                            *sample_args
                        )
                    )

                    def finish_free(toks=toks, lp_vals=lp_vals, lp_ids=lp_ids,
                                    lp_chosen=lp_chosen):
                        toks_np = host_np(toks)
                        vals_np, ids_np = host_np(lp_vals), host_np(lp_ids)
                        chosen_np = host_np(lp_chosen)
                        for req in free_rows:
                            if req.slot < 0:
                                continue
                            emitted = toks_np[req.slot].tolist()
                            out.new_tokens[req.request_id] = emitted
                            k_lp = req.sampling_params.logprobs
                            if k_lp is not None:
                                top = {
                                    int(i): float(v)
                                    for i, v in zip(
                                        ids_np[req.slot][:k_lp],
                                        vals_np[req.slot][:k_lp],
                                    )
                                }
                                top[emitted[-1]] = float(chosen_np[req.slot])
                                out.logprobs.setdefault(
                                    req.request_id, []
                                ).append(top)
                            self.last_tokens[req.slot] = emitted[-1]
                            self.seq_lens[req.slot] += len(emitted)

                elif self.K > 0 and self.kv_d is not None:
                    prev_arg = (
                        feed_prev if feed_prev is not None
                        else jnp.asarray(self.prev_tokens)
                    )
                    if all_greedy:
                        toks, num_emitted, self.kv_t, self.kv_d, out_feed = (
                            self._spec_greedy_fn(
                                self.target_params, self.draft_params,
                                self.kv_t, self.kv_d, prev_arg, *base_args
                            )
                        )
                    else:
                        toks, num_emitted, self.kv_t, self.kv_d, out_feed = (
                            self._spec_fn(
                                self.target_params, self.draft_params,
                                self.kv_t, self.kv_d, prev_arg, *base_args,
                                *sample_args
                            )
                        )

                    def finish_free(toks=toks, num_emitted=num_emitted):
                        toks_np = host_np(toks)  # [B, M, K+1]
                        n_np = host_np(num_emitted)  # [B, M]
                        for req in free_rows:
                            if req.slot < 0:
                                continue
                            emitted: list[int] = []
                            acc = 0
                            for m in range(self.M):
                                n = int(n_np[req.slot, m])
                                emitted.extend(toks_np[req.slot, m, :n].tolist())
                                acc += max(n - 1, 0)
                            out.new_tokens[req.request_id] = emitted
                            out.num_accepted[req.request_id] = acc
                            out.num_draft[req.request_id] = self.K * self.M
                            self.last_tokens[req.slot] = emitted[-1]
                            self.seq_lens[req.slot] += len(emitted)

                else:
                    if all_greedy:
                        toks, self.kv_t, out_feed = self._decode_greedy_fn(
                            self.target_params, self.kv_t, *base_args
                        )
                    else:
                        toks, self.kv_t, out_feed = self._decode_fn(
                            self.target_params, self.kv_t, *base_args,
                            *sample_args
                        )

                    def finish_free(toks=toks):
                        toks_np = host_np(toks)  # [B, M]
                        for req in free_rows:
                            if req.slot < 0:
                                continue
                            emitted = toks_np[req.slot].tolist()
                            out.new_tokens[req.request_id] = emitted
                            self.last_tokens[req.slot] = emitted[-1]
                            self.seq_lens[req.slot] += len(emitted)

                finishes.append(finish_free)

            if struct_rows:
                W = -(-self.config.model.vocab_size // 32)
                mask_words = np.zeros((self.B, W), np.uint32)
                constrained = np.zeros(self.B, bool)
                for r in struct_rows:
                    mask_words[r.slot] = gmasks[r.request_id]
                    constrained[r.slot] = True
                lens_np = np.where(constrained, self.seq_lens, 0)
                toks_s, self.kv_t = self._decode_masked_fn(
                    self.target_params, self.kv_t,
                    jnp.asarray(self.last_tokens), jnp.asarray(lens_np),
                    bt_dev, *sample_args,
                    jnp.asarray(mask_words), jnp.asarray(constrained),
                )
                # the masked program's post-state is incompatible with a
                # decode-streak continuation
                out_feed = None

                def finish_struct(toks=toks_s):
                    toks_np = host_np(toks)  # [B, 1]
                    for req in struct_rows:
                        if req.slot < 0:
                            continue  # aborted while in flight
                        emitted = toks_np[req.slot].tolist()
                        out.new_tokens[req.request_id] = emitted
                        self.last_tokens[req.slot] = emitted[-1]
                        self.seq_lens[req.slot] += len(emitted)

                finishes.append(finish_struct)

        def resolve():
            for fin in finishes:
                fin()
            self.last_step_time = time.perf_counter() - t0
            return out

        # a device feed is only valid for a same-set decode continuation;
        # mixed prefill+decode batches change the set next step
        return PendingStep(
            resolve, feed=out_feed if not sched.prefills else None
        )
