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

import time

import jax
import jax.numpy as jnp
import numpy as np

from vllm_omni_draft_tpu.config import EngineConfig, ModelConfig
from vllm_omni_draft_tpu.core.request import Request
from vllm_omni_draft_tpu.core.scheduler import RunnerOutput, SchedulerOutput
from vllm_omni_draft_tpu.models import get_model
from vllm_omni_draft_tpu.models.weights import load_params, quantize_params
from vllm_omni_draft_tpu.ops.attention import AttentionMetadata
from vllm_omni_draft_tpu.parallel import sharding as shd
from vllm_omni_draft_tpu.parallel.mesh import TP_AXIS, make_mesh
from vllm_omni_draft_tpu.ops.rejection import rejection_sample_dispatch
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
    return mod, params


_DEFAULT_NUM_BLOCKS = 512  # CPU/test fallback


def _kv_bytes_per_block(cfg: EngineConfig, block_size: int) -> int:
    models = [cfg.model]
    if cfg.speculative and cfg.speculative.draft_model:
        models.append(cfg.speculative.draft_model)
    total = 0
    for m in models:
        itemsize = 1 if m.kv_cache_dtype == "fp8" else (4 if m.dtype == "float32" else 2)
        total += 2 * m.num_layers * block_size * m.num_kv_heads * m.head_dim * itemsize
    return total


def determine_num_blocks(cfg: EngineConfig) -> int:
    """TPU analog of the reference's KV-init protocol
    (determine_available_memory → num_gpu_blocks,
    `src/doc/VLLM_V1_Interface.md:57-64`): read HBM stats after weights are
    resident, carve the block pool from what's left."""
    if cfg.cache.num_blocks is not None:
        return cfg.cache.num_blocks
    dev = jax.devices()[0]
    stats = None
    try:
        stats = dev.memory_stats()
    except Exception:
        pass
    if not stats or "bytes_limit" not in stats:
        return _DEFAULT_NUM_BLOCKS
    free = (
        stats["bytes_limit"] * cfg.cache.gpu_memory_utilization
        - stats.get("bytes_in_use", 0)
    )
    per_block = _kv_bytes_per_block(cfg, cfg.cache.block_size)
    return max(int(free) // per_block, 16)


class ModelRunner:
    """Owns device state (params, KV caches) and the compiled step fns."""

    def __init__(self, config: EngineConfig, num_blocks: int | None = None):
        self.config = config
        sched = config.scheduler
        self.block_size = config.cache.block_size
        self.B = sched.max_num_seqs
        self.K = (
            config.speculative.num_speculative_tokens if config.speculative else 0
        )
        # verify writes KV up to position (len-1)+K, so the table needs
        # headroom of K positions past max_model_len
        self.NB = -(-(config.model.max_model_len + self.K) // self.block_size)
        self.buckets = sched.prefill_buckets

        # device mesh: TP shards the target over ICI; the draft is
        # replicated (BASELINE.json: per-host draft replicas)
        self.mesh = make_mesh(config.parallel) if config.parallel.world_size > 1 else None

        self.target_mod, self.target_params = _build_params(config.model)
        self.target_fwd = self.target_mod.make_forward(config.model)
        if self.mesh is not None:
            self.target_params = shd.shard_params(self.target_params, self.mesh)
        self.draft_cfg = config.speculative.draft_model if config.speculative else None
        if self.draft_cfg is not None:
            self.draft_mod, self.draft_params = _build_params(self.draft_cfg)
            self.draft_fwd = self.draft_mod.make_forward(self.draft_cfg)
            if self.mesh is not None:
                self.draft_params = shd.replicate(self.draft_params, self.mesh)
        # profile free HBM *after* weights are resident
        self.num_blocks = num_blocks if num_blocks is not None else determine_num_blocks(config)
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

        def sample_one(logits, temp, top_k, top_p, key):
            probs = compute_probs(logits[None], temp[None], top_k[None], top_p[None])
            return sample_from_probs(probs, key)[0]

        self._sample_fn = jit(sample_one)

        def decode(params, kv, last_tokens, seq_lens, block_tables,
                   temps, top_ks, top_ps, key):
            positions = (seq_lens - 1)[:, None]  # [B, 1]; -1 for empty slots
            meta = AttentionMetadata(
                block_tables=block_tables,
                kv_lens=seq_lens,
                positions=positions,
                slot_mapping=_slots_from_positions(block_tables, positions, bs),
            )
            hidden, kv = self.target_fwd(
                params, last_tokens[:, None], positions, kv, meta
            )
            logits = self.target_mod.compute_logits(cfg, params, hidden[:, 0])
            probs = compute_probs(logits, temps, top_ks, top_ps)
            toks = sample_from_probs(probs, key)
            return toks, kv

        self._decode_fn = jit(decode, donate_argnums=(1,))

        if self.draft_cfg is None or K == 0:
            return
        dcfg = self.draft_cfg

        def spec_step(params_t, params_d, kv_t, kv_d, prev_tokens, last_tokens,
                      seq_lens, block_tables, temps, top_ks, top_ps, key):
            B = last_tokens.shape[0]
            key_d, key_r = jax.random.split(key)
            active = seq_lens > 0

            # ---- draft iteration 0: feed the last TWO tokens ----
            # After an all-accept step the draft never saw its own last
            # proposal (it was emitted, not fed back), so its KV at
            # position s-2 may be a hole. Re-deriving it is idempotent
            # when present and fills it when missing.
            pos0 = (seq_lens - 2)[:, None] + jnp.arange(2, dtype=jnp.int32)
            pos0 = jnp.where(active[:, None], pos0, -1)
            meta0 = AttentionMetadata(
                block_tables=block_tables,
                kv_lens=jnp.where(active, seq_lens, 0),
                positions=pos0,
                slot_mapping=_slots_from_positions(block_tables, pos0, bs),
            )
            toks0 = jnp.stack([prev_tokens, last_tokens], axis=1)  # [B, 2]
            hidden0, kv_d = self.draft_fwd(params_d, toks0, pos0, kv_d, meta0)
            logits0 = self.draft_mod.compute_logits(dcfg, params_d, hidden0[:, 1])
            q0 = compute_probs(logits0, temps, top_ks, top_ps)
            d1 = sample_from_probs(q0, jax.random.fold_in(key_d, 0))

            # ---- draft iterations 1..K-1 (scan; draft KV carried) ----
            def draft_body(carry, i):
                kv_d, cur = carry
                positions = (seq_lens - 1 + i)[:, None]
                positions = jnp.where(active[:, None], positions, -1)
                meta = AttentionMetadata(
                    block_tables=block_tables,
                    kv_lens=jnp.where(active, seq_lens + i, 0),
                    positions=positions,
                    slot_mapping=_slots_from_positions(block_tables, positions, bs),
                )
                hidden, kv_d = self.draft_fwd(
                    params_d, cur[:, None], positions, kv_d, meta
                )
                logits = self.draft_mod.compute_logits(dcfg, params_d, hidden[:, 0])
                q = compute_probs(logits, temps, top_ks, top_ps)
                tok = sample_from_probs(q, jax.random.fold_in(key_d, i))
                return (kv_d, tok), (tok, q)

            (kv_d, _), (draft_rest, q_rest) = jax.lax.scan(
                draft_body, (kv_d, d1), jnp.arange(1, K, dtype=jnp.int32)
            )
            draft_toks = jnp.concatenate(
                [d1[:, None], draft_rest.T], axis=1
            )  # [B, K]
            q_probs = jnp.concatenate(
                [q0[:, None, :], jnp.swapaxes(q_rest, 0, 1)], axis=1
            )  # [B, K, V]

            # ---- target verifies K+1 positions in one forward ----
            verify_toks = jnp.concatenate([last_tokens[:, None], draft_toks], axis=1)
            positions = (seq_lens - 1)[:, None] + jnp.arange(K + 1, dtype=jnp.int32)
            positions = jnp.where(seq_lens[:, None] > 0, positions, -1)
            meta = AttentionMetadata(
                block_tables=block_tables,
                kv_lens=jnp.where(seq_lens > 0, seq_lens + K, 0),
                positions=positions,
                slot_mapping=_slots_from_positions(block_tables, positions, bs),
            )
            hidden, kv_t = self.target_fwd(
                params_t, verify_toks, positions, kv_t, meta
            )
            V = cfg.vocab_size
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
                draft_toks, q_probs, p_probs, key_r
            )
            return out_toks, num_emitted, kv_t, kv_d

        self._spec_fn = jit(spec_step, donate_argnums=(2, 3))

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

    # ------------------------------------------------------------------
    # execute one scheduler step
    # ------------------------------------------------------------------

    def execute(self, sched: SchedulerOutput) -> RunnerOutput:
        t0 = time.perf_counter()
        out = RunnerOutput(new_tokens={})
        self.step_count += 1
        key = jax.random.fold_in(self.base_key, self.step_count)

        # ---- prefills (one compiled call per chunk, bucketed) ----
        for i, sp in enumerate(sched.prefills):
            req = sp.request
            if req.slot < 0:
                self.assign_slot(req)
            self.sync_blocks(req)
            # all_token_ids (not prompt) so post-preemption recompute also
            # covers generated tokens
            tok_slice = req.all_token_ids[sp.chunk_start : sp.chunk_start + sp.chunk_len]
            T = next(b for b in self.buckets if b >= sp.chunk_len)
            tokens = np.zeros((1, T), np.int32)
            tokens[0, : sp.chunk_len] = tok_slice
            bt = jnp.asarray(self.block_tables[req.slot : req.slot + 1])
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
            if sp.is_final_chunk and sp.sample_on_final:
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

        # ---- decodes: one fused batch step ----
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
            seq_lens = jnp.asarray(np.where(active, self.seq_lens, 0))
            args = (
                jnp.asarray(self.last_tokens),
                seq_lens,
                jnp.asarray(self.block_tables),
                jnp.asarray(self.temps),
                jnp.asarray(self.top_ks),
                jnp.asarray(self.top_ps),
                key,
            )
            if self.K > 0 and self.kv_d is not None:
                toks, num_emitted, self.kv_t, self.kv_d = self._spec_fn(
                    self.target_params, self.draft_params, self.kv_t, self.kv_d,
                    jnp.asarray(self.prev_tokens), *args
                )
                toks_np = np.asarray(toks)
                n_np = np.asarray(num_emitted)
                for req in sched.decodes:
                    n = int(n_np[req.slot])
                    emitted = toks_np[req.slot, :n].tolist()
                    out.new_tokens[req.request_id] = emitted
                    out.num_accepted[req.request_id] = n - 1
                    out.num_draft[req.request_id] = self.K
                    self.last_tokens[req.slot] = emitted[-1]
                    self.seq_lens[req.slot] += n
            else:
                toks, self.kv_t = self._decode_fn(
                    self.target_params, self.kv_t, *args
                )
                toks_np = np.asarray(toks)
                for req in sched.decodes:
                    tok = int(toks_np[req.slot])
                    out.new_tokens[req.request_id] = [tok]
                    self.last_tokens[req.slot] = tok
                    self.seq_lens[req.slot] += 1

        self.last_step_time = time.perf_counter() - t0
        return out
