"""Pallas paged-attention kernel for decode / verify (small query length).

TPU-native replacement for vLLM's CUDA PagedAttention (reference surface:
`src/doc/test_report.md:118`, SURVEY.md §2.4). Design:

- grid (B/BQ,): each program owns BQ sequences; all their KV-head groups'
  G*T query rows (G = Hq/Hkv grouped queries, T = 1 decode or K+1 verify)
  live in VMEM the whole time. Batching BQ sequences per program amortizes
  the per-chunk fixed cost (DMA issue + wait barriers + softmax VPU ops)
  that dominates decode attention — the kernel is latency-bound, not
  bandwidth-bound, at small T.
- each sequence's KV is streamed from HBM in chunks of `CHUNK_BLOCKS`
  whole physical blocks ([BS, Hkv, D] each — a head-sliced DMA would
  violate the (sublane, lane) tiling of the cache and read 4x more
  overall) via double-buffered async DMA driven by the scalar-prefetched
  block table — only ~kv_len tokens are ever read (the XLA gather
  fallback reads the padded maximum).
- online-softmax (flash) accumulation in f32, vectorized over heads;
  fp8 KV is dequantized in-register on the way into the MXU.

Causal rule: query row t attends cache index j iff j <= kv_len - T + t —
matching the engine's position-based masking for decode, verify, and
chunked prefill alike (positions[b, t] == kv_lens[b] - T + t).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from vllm_omni_draft_tpu.ops import quant as quant_ops
from vllm_omni_draft_tpu.ops.attention import AttentionMetadata

# finite large-negative (a true -inf makes exp(m - m_new) NaN for rows
# whose first valid column arrives in a later chunk)
NEG_INF = -1e30

# e4m3 exponent bias is 7, f32's is 127: after bit placement the read
# value is 2^-120 of the true one; folded into the kv_scale multiply.
FP8_BIAS_FIX = 2.0 ** 120

# Flat KV scratch layout ([CHUNK_T, Hkv*D] instead of [CHUNK_T, Hkv, D]):
# keeps the VMEM scratch tile-aligned for 1-byte KV dtypes. Resolved at
# import so the jit cache stays consistent within a process; per-call
# override via flat_kv=.
import os as _os

FLAT_KV_DEFAULT = _os.environ.get("VOT_ATTN_FLAT", "0") == "1"

# Decode-kernel software-pipeline depth (outstanding KV chunk loads + 1).
# The per-chunk compute is far cheaper than one chunk's DMA latency, so
# depth 2 (classic double buffering) idles ~a full latency per chunk.
NUM_SLOTS_DEFAULT = int(_os.environ.get("VOT_ATTN_SLOTS", "4"))
# block copies per DMA semaphore in the decode kernel (0 = all
# CHUNK_BLOCKS of a (slot, k/v, seq) share one counting sem; 1 = the
# round-3 per-copy form; sflag budget caps S*2*BQ*ceil(CB/GROUP) sems)
SEM_GROUP_DEFAULT = int(_os.environ.get("VOT_ATTN_SEM_GROUP", "0"))
# decode seqs per grid program override (0 = VMEM-budget auto). The
# round-3 probe measured SPP=16/SLOTS=2 ~10% faster than the auto
# (8/4) at the fp8 serving shape — per-grid-program prologue trade.
SPP_DEFAULT = int(_os.environ.get("VOT_ATTN_SPP", "0")) or None

# GQA folding: one block-diagonal scores/pv dot pair per (seq, chunk)
# instead of 2*Hkv per-head dots (see _kernel_fold).
GQA_FOLD_DEFAULT = _os.environ.get("VOT_ATTN_FOLD", "0") == "1"


def _fp8_bits_to_f32(x: jax.Array) -> jax.Array:
    """e4m3fn -> f32 * 2^-120 via integer bit placement.

    v5e-class VPUs have no fp8 hardware path, so `astype(f32)` lowers to a
    multi-op software cast that dominated the fp8-KV read (measured: fp8 KV
    42% slower than bf16 KV end-to-end; int8, which converts natively, is
    at parity). Instead: sign bit -> bit 31, the 7 exp+mantissa bits ->
    bits 26..20, i.e. reinterpret with f32's exponent bias. Exact for all
    NORMAL codes. SUBNORMAL codes (exp field 0, 14 codes, |v| <=
    0.0137*kv_scale) land on f32 denormals, which the TPU VPU flushes to
    +/-0 — confirmed on real v5e by scripts/fp8_subnormal_probe.py (both
    this kernel path and the XLA fallback flush identically). Accepted
    caveat: the flush error (< 0.0137*kv_scale = below e4m3's smallest
    normal 0.0156) is within the format's own quantization error at that
    magnitude. e4m3fn has no inf, and its NaN (0x7f) maps to a finite
    value — kv_to_fp8 clips so cache data never holds NaN (VOT_DEBUG_NAN=1
    guards the encode side). Caller multiplies by FP8_BIAS_FIX (folded
    into kv_scale)."""
    u = jax.lax.bitcast_convert_type(x, jnp.uint8).astype(jnp.uint32)
    bits = ((u & 0x80) << 24) | ((u & 0x7F) << 20)
    return jax.lax.bitcast_convert_type(bits, jnp.float32)


def _kernel(
    # scalar prefetch
    bt_ref,  # [B, NBMAX] int32 block tables (SMEM)
    kvlen_ref,  # [B] int32 (SMEM)
    layer_ref,  # [1] int32 (SMEM) — layer index into a full 5-D cache
    # inputs: q_ref, k_hbm, v_hbm [, knew_ref, vnew_ref (tail mode)]
    # then outputs/scratch: out_ref, kbuf, vbuf, sem
    *refs,
    T: int,
    BS: int,
    CHUNK_BLOCKS: int,
    BQ: int,
    scale: float,
    kv_scale: float,
    deq: bool,
    fp8: bool,
    full_cache: bool,
    flat: bool,
    nslots: int,
    tail: bool = False,
    sem_group: int = 0,  # block copies per DMA semaphore (0 = all
    # CHUNK_BLOCKS share one — round-4 sflag-fit default; 1 = the
    # round-3 per-copy form; intermediate values probe whether shared
    # counting sems serialize waits at block-16 shapes, PERF_NOTES r4)
):
    if tail:
        # deferred-commit mode: the cache holds only kv_len - T committed
        # tokens; this step's T tokens arrive as VMEM inputs (cache dtype)
        (q_ref, k_hbm, v_hbm, knew_ref, vnew_ref,
         out_ref, kbuf, vbuf, sem) = refs
    else:
        q_ref, k_hbm, v_hbm, out_ref, kbuf, vbuf, sem = refs
        knew_ref = vnew_ref = None
    g = pl.program_id(0)
    CHUNK_T = CHUNK_BLOCKS * BS
    Hkv, GTP, D = q_ref.shape[1], q_ref.shape[2], q_ref.shape[3]
    layer = layer_ref[0]

    kv_lens = [kvlen_ref[g * BQ + sq] for sq in range(BQ)]
    max_len = kv_lens[0]
    for sq in range(1, BQ):
        max_len = jnp.maximum(max_len, kv_lens[sq])

    @pl.when(max_len == 0)
    def _():
        out_ref[...] = jnp.zeros_like(out_ref)

    @pl.when(max_len > 0)
    def _():
        if tail:
            # HBM covers only the committed prefix (kv_len - T per seq)
            max_cm = jnp.maximum(kv_lens[0] - T, 0)
            for sq in range(1, BQ):
                max_cm = jnp.maximum(max_cm, jnp.maximum(kv_lens[sq] - T, 0))
            num_chunks = pl.cdiv(max_cm, CHUNK_T)
        else:
            num_chunks = pl.cdiv(max_len, CHUNK_T)

        def src(hbm, bid):
            # whole-block copy [BS, Hkv, D]: slices only the major dim,
            # so the (sublane, lane) tiling is preserved
            if full_cache:
                return hbm.at[layer, bid]
            return hbm.at[bid]

        # semaphore grouping: GRP same-size block copies of one (slot,
        # k/v, seq) share ONE counting DMA semaphore. GRP=CHUNK_BLOCKS
        # (default) keeps sflag tiny (~2 KB total; a per-copy array was
        # the round-4 "Ran out of memory in memory space sflag" compile
        # error at block-16 shapes, S*2*BQ*8 = 512 sems); smaller GRP
        # probes whether fully-shared counting sems serialize waits
        # (PERF_NOTES round-4 ladder-3 gap).
        GRP = sem_group if sem_group > 0 else CHUNK_BLOCKS

        def start_load(c, slot):
            base = c * CHUNK_BLOCKS
            for sq in range(BQ):
                for i in range(CHUNK_BLOCKS):
                    bid = bt_ref[g * BQ + sq, base + i]
                    pltpu.make_async_copy(
                        src(k_hbm, bid),
                        kbuf.at[slot, sq, pl.ds(i * BS, BS)],
                        sem.at[slot, 0, sq, i // GRP],
                    ).start()
                    pltpu.make_async_copy(
                        src(v_hbm, bid),
                        vbuf.at[slot, sq, pl.ds(i * BS, BS)],
                        sem.at[slot, 1, sq, i // GRP],
                    ).start()

        def wait_load(c, slot):
            base = c * CHUNK_BLOCKS
            for sq in range(BQ):
                for i in range(CHUNK_BLOCKS):
                    bid = bt_ref[g * BQ + sq, base + i]
                    pltpu.make_async_copy(
                        src(k_hbm, bid),
                        kbuf.at[slot, sq, pl.ds(i * BS, BS)],
                        sem.at[slot, 0, sq, i // GRP],
                    ).wait()
                    pltpu.make_async_copy(
                        src(v_hbm, bid),
                        vbuf.at[slot, sq, pl.ds(i * BS, BS)],
                        sem.at[slot, 1, sq, i // GRP],
                    ).wait()

        # software pipeline: keep nslots-1 chunk loads in flight. The
        # per-chunk compute is tiny (small dots on 128-token tiles), so
        # with plain double buffering the loop idles a full DMA latency
        # per chunk; deeper lookahead converts that to issue throughput.
        for c0 in range(nslots - 1):
            @pl.when(c0 < num_chunks)
            def _(c0=c0):
                start_load(c0, c0)
        q = q_ref[...].astype(jnp.float32)  # [BQ, Hkv, GTP, D]

        # query offset t for each padded row r: t = r % T
        row_t = (
            jax.lax.broadcasted_iota(jnp.int32, (BQ, Hkv, GTP, CHUNK_T), 2) % T
        )
        col = jax.lax.broadcasted_iota(jnp.int32, (BQ, Hkv, GTP, CHUNK_T), 3)
        # per-sequence kv_len broadcast to the score shape
        kvl = jnp.concatenate(
            [
                jnp.full((1, Hkv, GTP, CHUNK_T), 0, jnp.int32) + kv_lens[sq]
                for sq in range(BQ)
            ]
        )

        def body(c, carry):
            m, l, acc = carry  # [BQ, Hkv, GTP, 1] x2, [BQ, Hkv, GTP, D]
            slot = c % nslots

            @pl.when(c + nslots - 1 < num_chunks)
            def _():
                # reuses the slot whose compute finished last iteration
                start_load(c + nslots - 1, (c + nslots - 1) % nslots)

            wait_load(c, slot)
            if fp8:
                k = _fp8_bits_to_f32(kbuf[slot])  # [BQ, CHUNK_T, Hkv, D]
                v = _fp8_bits_to_f32(vbuf[slot])  # (flat: [BQ, CHUNK_T, Hkv*D])
            else:
                k = kbuf[slot].astype(jnp.float32)
                v = vbuf[slot].astype(jnp.float32)
            if deq:
                k = k * kv_scale
                v = v * kv_scale

            def khead(sq, h):
                # flat layout keeps the scratch's trailing dims (CHUNK_T,
                # Hkv*D) tile-aligned for 1-byte KV; a head is a lane-dim
                # slice at a 128-multiple offset (cheap on TPU)
                if flat:
                    return k[sq, :, h * D:(h + 1) * D]
                return k[sq, :, h, :]

            def vhead(sq, h):
                if flat:
                    return v[sq, :, h * D:(h + 1) * D]
                return v[sq, :, h, :]

            # per-(seq, head) scores stacked: [BQ, Hkv, GTP, CHUNK_T]
            s = jnp.stack(
                [
                    jnp.stack(
                        [
                            jax.lax.dot_general(
                                q[sq, h],
                                khead(sq, h),
                                (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32,
                            )
                            for h in range(Hkv)
                        ]
                    )
                    for sq in range(BQ)
                ]
            ) * scale

            jg = c * CHUNK_T + col
            if tail:
                # committed region only — causal is implied (jg < kvl-T
                # <= kvl-T+row_t for every query row)
                mask = jg < kvl - T
            else:
                mask = (jg < kvl) & (jg <= kvl - T + row_t)
            s = jnp.where(mask, s, NEG_INF)

            m_new = jnp.maximum(m, jnp.max(s, axis=-1, keepdims=True))
            p = jnp.where(mask, jnp.exp(s - m_new), 0.0)
            alpha = jnp.exp(m - m_new)
            l_new = l * alpha + jnp.sum(p, axis=-1, keepdims=True)
            pv = jnp.stack(
                [
                    jnp.stack(
                        [
                            jax.lax.dot_general(
                                p[sq, h],
                                vhead(sq, h),
                                (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32,
                            )
                            for h in range(Hkv)
                        ]
                    )
                    for sq in range(BQ)
                ]
            )
            acc_new = acc * alpha + pv
            return m_new, l_new, acc_new

        m0 = jnp.full((BQ, Hkv, GTP, 1), NEG_INF, jnp.float32)
        l0 = jnp.zeros((BQ, Hkv, GTP, 1), jnp.float32)
        acc0 = jnp.zeros((BQ, Hkv, GTP, D), jnp.float32)
        m, l, acc = jax.lax.fori_loop(0, num_chunks, body, (m0, l0, acc0))

        if tail:
            # this step's T tokens as one in-VMEM pseudo-chunk: query row
            # (g*T+t) attends tail column tt iff tt <= t (absolute
            # position kvl-T+tt <= kvl-T+t), rows of empty seqs masked.
            # ONE folded block-diagonal dot pair for the whole program
            # (2*Hkv*BQ tiny per-head dots measurably slowed the engine
            # — same finding as the _kernel_fold GQA trick): flatten q
            # rows over (seq, head, g*T+t) and tail rows over
            # (seq, t, head); the cross terms are masked out before the
            # softmax statistics.
            if fp8:
                kt = _fp8_bits_to_f32(knew_ref[...])  # [BQ, T, Hkv, D]
                vt = _fp8_bits_to_f32(vnew_ref[...])
            else:
                kt = knew_ref[...].astype(jnp.float32)
                vt = vnew_ref[...].astype(jnp.float32)
            if deq:
                kt = kt * kv_scale
                vt = vt * kv_scale
            q = q_ref[...].astype(jnp.float32)
            RQ = Hkv * GTP  # per-seq query rows (head, g*T+t)
            CT = T * Hkv    # per-seq tail cols  (t, head)
            # per-seq masks are seq-independent (kv_len only gates the
            # whole row) — build once
            row = jax.lax.broadcasted_iota(jnp.int32, (RQ, CT), 0)
            col = jax.lax.broadcasted_iota(jnp.int32, (RQ, CT), 1)
            row_h = row // GTP
            row_tt = (row % GTP) % T
            col_tt = col // Hkv
            col_h = col % Hkv
            base_mask = (row_h == col_h) & (col_tt <= row_tt)
            s_t = jnp.stack(
                [
                    jax.lax.dot_general(
                        q[sq].reshape(RQ, D), kt[sq].reshape(CT, D),
                        (((1,), (1,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    )
                    for sq in range(BQ)
                ]
            ) * scale  # [BQ, RQ, CT]
            # a tail col's absolute position is kv_len - T + col_tt;
            # drop negative ones so pad positions inside an active row
            # can never score (matches the XLA tail path; advisor r4)
            mask_t = jnp.stack(
                [base_mask & (kv_lens[sq] > 0)
                 & (kv_lens[sq] - T + col_tt >= 0) for sq in range(BQ)]
            )
            s_t = jnp.where(mask_t, s_t, NEG_INF)
            m_r = m.reshape(BQ, RQ, 1)
            l_r = l.reshape(BQ, RQ, 1)
            acc_r = acc.reshape(BQ, RQ, D)
            m_new = jnp.maximum(m_r, jnp.max(s_t, axis=-1, keepdims=True))
            p_t = jnp.where(mask_t, jnp.exp(s_t - m_new), 0.0)
            alpha = jnp.exp(m_r - m_new)
            l_r = l_r * alpha + jnp.sum(p_t, axis=-1, keepdims=True)
            pv_t = jnp.stack(
                [
                    jax.lax.dot_general(
                        p_t[sq], vt[sq].reshape(CT, D),
                        (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    )
                    for sq in range(BQ)
                ]
            )
            acc_r = acc_r * alpha + pv_t
            l = l_r.reshape(BQ, Hkv, GTP, 1)
            acc = acc_r.reshape(BQ, Hkv, GTP, D)

        out = acc / jnp.maximum(l, 1e-30)
        out_ref[...] = out.astype(out_ref.dtype)


def _kernel_fold(
    # scalar prefetch
    bt_ref,  # [B, NBMAX] int32 block tables (SMEM)
    kvlen_ref,  # [B] int32 (SMEM)
    layer_ref,  # [1] int32 (SMEM)
    # inputs
    q_ref,  # [BQ, Hkv*GTP, D] VMEM — rows ordered (head, g*T+t)
    k_hbm,  # [NB, BS*Hkv, D] or [L, NB, BS*Hkv, D] HBM — rows (t, head)
    v_hbm,
    # outputs
    out_ref,  # [BQ, Hkv*GTP, D] VMEM
    # scratch
    kbuf,  # [S, BQ, CHUNK_T*Hkv, D] VMEM (cache dtype)
    vbuf,
    sem,  # DMA sems [S, 2, BQ] (fully shared per (slot, k/v, seq))
    *,
    T: int,
    BS: int,
    CHUNK_BLOCKS: int,
    BQ: int,
    Hkv: int,
    GTP: int,
    scale: float,
    kv_scale: float,
    deq: bool,
    fp8: bool,
    full_cache: bool,
    nslots: int,
):
    """GQA-folded decode attention: ONE scores dot and ONE pv dot per
    (sequence, chunk) instead of 2*Hkv small per-head dots.

    The trick: flatten query rows over (head, position) and KV rows over
    (position, head) — the [Hkv*GTP, CHUNK_T*Hkv] score matrix then
    contains every cross-head pairing, and a block-diagonal mask
    (col_head == row_head, folded into the causal mask before the
    softmax statistics) zeroes the foreign-head terms, so the pv dot
    needs no extraction. 4x the MXU FLOPs of the per-head dots — but
    these shapes leave the MXU mostly idle and the per-chunk cost is
    issue-dominated (measured: block size/slot/chunk sweeps all flat),
    so fewer, bigger ops win. KV flattens to (t, h) rows by a FREE HBM
    reshape [NB, BS, Hkv, D] -> [NB, BS*Hkv, D] (contiguous dims), so no
    transpose anywhere."""
    g = pl.program_id(0)
    CHUNK_T = CHUNK_BLOCKS * BS
    CTH = CHUNK_T * Hkv
    BSH = BS * Hkv
    D = q_ref.shape[-1]
    layer = layer_ref[0]

    kv_lens = [kvlen_ref[g * BQ + sq] for sq in range(BQ)]
    max_len = kv_lens[0]
    for sq in range(1, BQ):
        max_len = jnp.maximum(max_len, kv_lens[sq])

    @pl.when(max_len == 0)
    def _():
        out_ref[...] = jnp.zeros_like(out_ref)

    @pl.when(max_len > 0)
    def _():
        num_chunks = pl.cdiv(max_len, CHUNK_T)

        def src(hbm, bid):
            if full_cache:
                return hbm.at[layer, bid]
            return hbm.at[bid]

        def start_load(c, slot):
            base = c * CHUNK_BLOCKS
            for sq in range(BQ):
                for i in range(CHUNK_BLOCKS):
                    bid = bt_ref[g * BQ + sq, base + i]
                    pltpu.make_async_copy(
                        src(k_hbm, bid),
                        kbuf.at[slot, sq, pl.ds(i * BSH, BSH)],
                        sem.at[slot, 0, sq],
                    ).start()
                    pltpu.make_async_copy(
                        src(v_hbm, bid),
                        vbuf.at[slot, sq, pl.ds(i * BSH, BSH)],
                        sem.at[slot, 1, sq],
                    ).start()

        def wait_load(c, slot):
            base = c * CHUNK_BLOCKS
            for sq in range(BQ):
                for i in range(CHUNK_BLOCKS):
                    bid = bt_ref[g * BQ + sq, base + i]
                    pltpu.make_async_copy(
                        src(k_hbm, bid),
                        kbuf.at[slot, sq, pl.ds(i * BSH, BSH)],
                        sem.at[slot, 0, sq],
                    ).wait()
                    pltpu.make_async_copy(
                        src(v_hbm, bid),
                        vbuf.at[slot, sq, pl.ds(i * BSH, BSH)],
                        sem.at[slot, 1, sq],
                    ).wait()

        for c0 in range(nslots - 1):
            @pl.when(c0 < num_chunks)
            def _(c0=c0):
                start_load(c0, c0)
        q = q_ref[...].astype(jnp.float32)  # [BQ, Hkv*GTP, D]

        HG = Hkv * GTP
        # row r = (head, g*T + t): head = r // GTP, t = r % T
        row = jax.lax.broadcasted_iota(jnp.int32, (BQ, HG, CTH), 1)
        col = jax.lax.broadcasted_iota(jnp.int32, (BQ, HG, CTH), 2)
        row_h = row // GTP
        # p = row % GTP is the (g*T + t) offset WITHIN the head's padded
        # block; t = p % T.  (row % T is only equivalent when GTP % T == 0 —
        # e.g. G=5, T=3 gives GTP=16 and every head h>=1 would see a
        # shifted causal mask.)
        row_t = (row % GTP) % T
        col_h = col % Hkv
        col_t = col // Hkv
        same_head = col_h == row_h
        kvl = jnp.concatenate(
            [
                jnp.full((1, HG, CTH), 0, jnp.int32) + kv_lens[sq]
                for sq in range(BQ)
            ]
        )

        def body(c, carry):
            m, l, acc = carry  # [BQ, HG, 1] x2, [BQ, HG, D]
            slot = c % nslots

            @pl.when(c + nslots - 1 < num_chunks)
            def _():
                start_load(c + nslots - 1, (c + nslots - 1) % nslots)

            wait_load(c, slot)
            if fp8:
                k = _fp8_bits_to_f32(kbuf[slot])  # [BQ, CTH, D]
                v = _fp8_bits_to_f32(vbuf[slot])
            else:
                k = kbuf[slot].astype(jnp.float32)
                v = vbuf[slot].astype(jnp.float32)
            if deq:
                k = k * kv_scale
                v = v * kv_scale

            # ONE dot per sequence: [HG, D] x [CTH, D]^T -> [HG, CTH]
            s = jnp.stack(
                [
                    jax.lax.dot_general(
                        q[sq], k[sq],
                        (((1,), (1,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    )
                    for sq in range(BQ)
                ]
            ) * scale

            jg = c * CHUNK_T + col_t
            mask = same_head & (jg < kvl) & (jg <= kvl - T + row_t)
            s = jnp.where(mask, s, NEG_INF)

            m_new = jnp.maximum(m, jnp.max(s, axis=-1, keepdims=True))
            p = jnp.where(mask, jnp.exp(s - m_new), 0.0)
            alpha = jnp.exp(m - m_new)
            l_new = l * alpha + jnp.sum(p, axis=-1, keepdims=True)
            # ONE pv dot: off-diagonal p entries are exactly 0
            pv = jnp.stack(
                [
                    jax.lax.dot_general(
                        p[sq], v[sq],
                        (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    )
                    for sq in range(BQ)
                ]
            )
            acc_new = acc * alpha + pv
            return m_new, l_new, acc_new

        m0 = jnp.full((BQ, HG, 1), NEG_INF, jnp.float32)
        l0 = jnp.zeros((BQ, HG, 1), jnp.float32)
        acc0 = jnp.zeros((BQ, HG, D), jnp.float32)
        m, l, acc = jax.lax.fori_loop(0, num_chunks, body, (m0, l0, acc0))
        out = acc / jnp.maximum(l, 1e-30)
        out_ref[...] = out.astype(out_ref.dtype)


# VMEM budget for one program's full working set (bytes); BQ adapts to it.
# 12 MiB of the 16 MiB scoped limit — the remainder covers block tables,
# semaphores, and Mosaic's own spill slack.
_KV_SCRATCH_BUDGET = 12 * 1024 * 1024


@functools.partial(
    jax.jit,
    static_argnames=(
        "scale", "kv_scale", "chunk_blocks", "seqs_per_program", "flat_kv",
        "num_slots", "gqa_fold",
    ),
)
def paged_attention_pallas(
    q: jax.Array,  # [B, T, Hq, D]
    k_cache: jax.Array,  # [NB, BS, Hkv, D] or [L, NB, BS, Hkv, D]
    v_cache: jax.Array,
    block_tables: jax.Array,  # [B, NBMAX] int32
    kv_lens: jax.Array,  # [B] int32
    scale: float,
    kv_scale: float = 1.0,
    chunk_blocks: int | None = None,
    seqs_per_program: int | None = None,
    layer: jax.Array | None = None,  # required when cache is 5-D
    flat_kv: bool | None = None,
    num_slots: int | None = None,  # KV scratch pipeline depth
    gqa_fold: bool | None = None,  # one-dot-per-seq GQA folding
    k_new: jax.Array | None = None,  # [B, T, Hkv, D] CACHE dtype —
    v_new: jax.Array | None = None,  # deferred-commit VMEM tail
) -> jax.Array:
    B, T, Hq, D = q.shape
    full_cache = k_cache.ndim == 5
    NB, BS, Hkv, _ = k_cache.shape[1:] if full_cache else k_cache.shape
    layer_arr = jnp.asarray(
        [layer if layer is not None else 0], jnp.int32
    ).reshape(1)
    NBMAX = block_tables.shape[1]
    G = Hq // Hkv
    GT = G * T
    GTP = max(8, -(-GT // 8) * 8)
    fp8 = k_cache.dtype == quant_ops.FP8_DTYPE
    i8 = k_cache.dtype == jnp.int8
    if i8:  # int8 KV: fold the fixed-point factor into the multiplier
        kv_scale = quant_ops.kv8_dequant_factor(kv_scale)
    if fp8:  # bit-placement dequant reads values scaled by 2^-120
        kv_scale = kv_scale * FP8_BIAS_FIX
    tail = k_new is not None
    if tail:
        assert k_new.dtype == k_cache.dtype, (k_new.dtype, k_cache.dtype)
    if gqa_fold is None:
        gqa_fold = GQA_FOLD_DEFAULT
    if gqa_fold and tail:
        # tail mode is implemented in the per-head kernel only; the fold
        # variant is an env A/B (VOT_ATTN_FOLD) and falls back here
        gqa_fold = False
    if flat_kv is None:
        flat_kv = FLAT_KV_DEFAULT and not gqa_fold
    if gqa_fold:
        # (BS, Hkv) -> (BS*Hkv,) rows for _kernel_fold: contiguous dims,
        # free HBM reshape; KV rows become (t, h)-ordered
        k_cache = k_cache.reshape(*k_cache.shape[:-3], BS * Hkv, D)
        v_cache = v_cache.reshape(*v_cache.shape[:-3], BS * Hkv, D)
    elif flat_kv:
        # collapse (Hkv, D) -> (Hkv*D,): the trailing dims are contiguous
        # so the HBM reshape is a free bitcast, and the VMEM scratch's
        # tiled trailing dims become (CHUNK_T, Hkv*D) — exact multiples of
        # every dtype's (sublane, 128) tile. The nested (Hkv=4, D=128)
        # layout pads the sublane dim 4 -> 16/32 for 2-/1-byte dtypes.
        k_cache = k_cache.reshape(*k_cache.shape[:-2], Hkv * D)
        v_cache = v_cache.reshape(*v_cache.shape[:-2], Hkv * D)

    if chunk_blocks is None:
        chunk_blocks = max(1, 128 // BS)
    # pad the block table so chunked indexing never reads past it
    pad_cols = (-NBMAX) % chunk_blocks
    if pad_cols:
        block_tables = jnp.pad(block_tables, ((0, 0), (0, pad_cols)))

    CHUNK_T = chunk_blocks * BS
    itemsize = 1 if (fp8 or i8) else 2
    if num_slots is None:
        num_slots = NUM_SLOTS_DEFAULT
    S = max(2, num_slots)
    if seqs_per_program is None:
        seqs_per_program = SPP_DEFAULT
    # full per-sequence VMEM footprint, not just the KV scratch: the
    # f32 K/V casts and the GTP-scaled score/accumulator tensors live
    # on the Mosaic stack too (measured stack OOM at T=16 x BS=128
    # when only the scratch was budgeted)
    score_cols = CHUNK_T * Hkv if gqa_fold else CHUNK_T
    per_seq = (
        S * 2 * CHUNK_T * Hkv * D * itemsize  # S-slot K+V scratch
        + 2 * CHUNK_T * Hkv * D * 4           # in-register f32 K, V
        + 2 * Hkv * GTP * score_cols * 4      # scores + exp probs f32
        + 3 * Hkv * GTP * D * 4               # q, acc, out f32
    )
    budget_spp = max(1, _KV_SCRATCH_BUDGET // per_seq)
    if seqs_per_program is None:
        seqs_per_program = min(8, budget_spp)
    else:
        # explicit/env override still clamps to the VMEM budget (an
        # over-ask is a compile-time Mosaic stack OOM, not a slowdown)
        seqs_per_program = min(seqs_per_program, budget_spp)
    BQ = seqs_per_program
    pad_b = (-B) % BQ
    if pad_b:
        q = jnp.pad(q, ((0, pad_b), (0, 0), (0, 0), (0, 0)))
        block_tables = jnp.pad(block_tables, ((0, pad_b), (0, 0)))
        kv_lens = jnp.pad(kv_lens, ((0, pad_b),))
        if tail:
            pad4 = ((0, pad_b), (0, 0), (0, 0), (0, 0))
            k_new = jnp.pad(k_new, pad4)
            v_new = jnp.pad(v_new, pad4)
    BP = B + pad_b

    # [BP, T, Hkv, G, D] -> [BP, Hkv, G, T, D] -> [BP, Hkv, GT, D], pad rows
    qr = (
        q.reshape(BP, T, Hkv, G, D)
        .transpose(0, 2, 3, 1, 4)
        .reshape(BP, Hkv, GT, D)
    )
    if GTP != GT:
        qr = jnp.pad(qr, ((0, 0), (0, 0), (0, GTP - GT), (0, 0)))

    if gqa_fold:
        qr = qr.reshape(BP, Hkv * GTP, D)  # rows (head, g*T+t)
        kernel = functools.partial(
            _kernel_fold,
            T=T,
            BS=BS,
            CHUNK_BLOCKS=chunk_blocks,
            BQ=BQ,
            Hkv=Hkv,
            GTP=GTP,
            scale=scale,
            kv_scale=kv_scale,
            deq=fp8 or i8 or kv_scale != 1.0,
            fp8=fp8,
            full_cache=full_cache,
            nslots=S,
        )
        io_block = (BQ, Hkv * GTP, D)
        kv_scratch_dims = (CHUNK_T * Hkv, D)
        io_index = lambda g, *_: (g, 0, 0)
    else:
        kernel = functools.partial(
            _kernel,
            T=T,
            BS=BS,
            CHUNK_BLOCKS=chunk_blocks,
            BQ=BQ,
            scale=scale,
            kv_scale=kv_scale,
            deq=fp8 or i8 or kv_scale != 1.0,
            fp8=fp8,
            full_cache=full_cache,
            flat=flat_kv,
            nslots=S,
            tail=tail,
            sem_group=SEM_GROUP_DEFAULT,
        )
        io_block = (BQ, Hkv, GTP, D)
        kv_scratch_dims = (
            (CHUNK_T, Hkv * D) if flat_kv else (CHUNK_T, Hkv, D)
        )
        io_index = lambda g, *_: (g, 0, 0, 0)
    in_specs = [
        pl.BlockSpec(io_block, io_index, memory_space=pltpu.VMEM),
        pl.BlockSpec(memory_space=pl.ANY),
        pl.BlockSpec(memory_space=pl.ANY),
    ]
    operands = [block_tables, kv_lens, layer_arr, qr, k_cache, v_cache]
    if tail:
        in_specs.append(pl.BlockSpec(
            (BQ, T, Hkv, D), lambda g, *_: (g, 0, 0, 0),
            memory_space=pltpu.VMEM,
        ))
        in_specs.append(pl.BlockSpec(
            (BQ, T, Hkv, D), lambda g, *_: (g, 0, 0, 0),
            memory_space=pltpu.VMEM,
        ))
        operands.extend([k_new, v_new])
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(BP // BQ,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            io_block, io_index, memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[
            pltpu.VMEM((S, BQ, *kv_scratch_dims), k_cache.dtype),
            pltpu.VMEM((S, BQ, *kv_scratch_dims), v_cache.dtype),
            pltpu.SemaphoreType.DMA(
                (S, 2, BQ) if gqa_fold else (
                    S, 2, BQ,
                    -(-chunk_blocks // (SEM_GROUP_DEFAULT or chunk_blocks)),
                )
            ),
        ],
    )
    out_shape = (
        (BP, Hkv * GTP, D) if gqa_fold else (BP, Hkv, GTP, D)
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(out_shape, q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
        ),
    )(*operands)

    if gqa_fold:
        out = out.reshape(BP, Hkv, GTP, D)
    out = out[:B, :, :GT, :].reshape(B, Hkv, G, T, D)
    return out.transpose(0, 3, 1, 2, 4).reshape(B, T, Hq, D)


# ---------------------------------------------------------------------------
# Prefill kernel: long query chunks (one sequence), q-tiled flash attention
# over the same paged cache. The decode kernel keeps all G*T query rows
# resident, which caps T; here T is a prefill bucket (128-1024+), so the
# grid tiles the query dimension and each program streams KV double-
# buffered up to ITS OWN causal horizon. Unlike decode, prefill chunks are
# right-padded (num_real < T), so masking is position-based:
# query row t sits at absolute position kv_len - num_real + t and is only
# valid for t < num_real.
# ---------------------------------------------------------------------------


def _prefill_kernel(
    # scalar prefetch
    bt_ref,  # [1, NBMAX] int32 (SMEM)
    kvlen_ref,  # [1] int32
    nreal_ref,  # [1] int32
    layer_ref,  # [1] int32
    # inputs
    q_ref,  # [1, Hkv, G*TQ, D] VMEM (one query tile)
    k_hbm,  # [NB, BS, Hkv, D] or [L, NB, BS, Hkv, D] (ANY)
    v_hbm,
    # outputs
    out_ref,  # [1, Hkv, G*TQ, D]
    # scratch
    kbuf,  # [2, CHUNK_T, Hkv, D]
    vbuf,
    sem,  # [2, 2, CHUNK_BLOCKS]
    *,
    TQ: int,
    BS: int,
    CHUNK_BLOCKS: int,
    scale: float,
    kv_scale: float,
    deq: bool,
    fp8: bool,
    full_cache: bool,
    flat: bool,
    nslots: int,
):
    qt = pl.program_id(0)
    CHUNK_T = CHUNK_BLOCKS * BS
    Hkv, GT, D = q_ref.shape[1], q_ref.shape[2], q_ref.shape[3]
    layer = layer_ref[0]
    kv_len = kvlen_ref[0]
    num_real = nreal_ref[0]
    start = kv_len - num_real  # absolute position of query row 0

    # this tile's causal horizon: last valid row attends up to position
    # start + last_t inclusive
    tile_rows = jnp.minimum(num_real - qt * TQ, TQ)  # valid rows in tile

    @pl.when(tile_rows <= 0)
    def _():
        out_ref[...] = jnp.zeros_like(out_ref)

    @pl.when(tile_rows > 0)
    def _():
        horizon = start + qt * TQ + tile_rows  # exclusive col bound
        num_chunks = pl.cdiv(horizon, CHUNK_T)

        def src(hbm, bid):
            if full_cache:
                return hbm.at[layer, bid]
            return hbm.at[bid]

        def start_load(c, slot):
            base = c * CHUNK_BLOCKS
            for i in range(CHUNK_BLOCKS):
                bid = bt_ref[0, base + i]
                pltpu.make_async_copy(
                    src(k_hbm, bid), kbuf.at[slot, pl.ds(i * BS, BS)],
                    sem.at[slot, 0],
                ).start()
                pltpu.make_async_copy(
                    src(v_hbm, bid), vbuf.at[slot, pl.ds(i * BS, BS)],
                    sem.at[slot, 1],
                ).start()

        def wait_load(c, slot):
            base = c * CHUNK_BLOCKS
            for i in range(CHUNK_BLOCKS):
                bid = bt_ref[0, base + i]
                pltpu.make_async_copy(
                    src(k_hbm, bid), kbuf.at[slot, pl.ds(i * BS, BS)],
                    sem.at[slot, 0],
                ).wait()
                pltpu.make_async_copy(
                    src(v_hbm, bid), vbuf.at[slot, pl.ds(i * BS, BS)],
                    sem.at[slot, 1],
                ).wait()

        for c0 in range(nslots - 1):  # pipeline prologue (see decode)
            @pl.when(c0 < num_chunks)
            def _(c0=c0):
                start_load(c0, c0)
        q = q_ref[0].astype(jnp.float32)  # [Hkv, GT, D]

        row_t = jax.lax.broadcasted_iota(jnp.int32, (Hkv, GT, CHUNK_T), 1) % TQ
        col = jax.lax.broadcasted_iota(jnp.int32, (Hkv, GT, CHUNK_T), 2)
        row_pos = start + qt * TQ + row_t  # absolute query position
        row_valid = row_t < tile_rows

        def body(c, carry):
            m, l, acc = carry
            slot = c % nslots

            @pl.when(c + nslots - 1 < num_chunks)
            def _():
                start_load(c + nslots - 1, (c + nslots - 1) % nslots)

            wait_load(c, slot)
            if fp8:
                k = _fp8_bits_to_f32(kbuf[slot])  # [CHUNK_T, Hkv, D]
                v = _fp8_bits_to_f32(vbuf[slot])  # (flat: [CHUNK_T, Hkv*D])
            else:
                k = kbuf[slot].astype(jnp.float32)
                v = vbuf[slot].astype(jnp.float32)
            if deq:
                k = k * kv_scale
                v = v * kv_scale

            def khead(h):
                return k[:, h * D:(h + 1) * D] if flat else k[:, h, :]

            def vhead(h):
                return v[:, h * D:(h + 1) * D] if flat else v[:, h, :]

            s = jnp.stack(
                [
                    jax.lax.dot_general(
                        q[h], khead(h), (((1,), (1,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    )
                    for h in range(Hkv)
                ]
            ) * scale  # [Hkv, GT, CHUNK_T]

            jg = c * CHUNK_T + col
            mask = row_valid & (jg <= row_pos) & (jg < kv_len)
            s = jnp.where(mask, s, NEG_INF)

            m_new = jnp.maximum(m, jnp.max(s, axis=-1, keepdims=True))
            p = jnp.where(mask, jnp.exp(s - m_new), 0.0)
            alpha = jnp.exp(m - m_new)
            l_new = l * alpha + jnp.sum(p, axis=-1, keepdims=True)
            pv = jnp.stack(
                [
                    jax.lax.dot_general(
                        p[h], vhead(h), (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    )
                    for h in range(Hkv)
                ]
            )
            acc_new = acc * alpha + pv
            return m_new, l_new, acc_new

        m0 = jnp.full((Hkv, GT, 1), NEG_INF, jnp.float32)
        l0 = jnp.zeros((Hkv, GT, 1), jnp.float32)
        acc0 = jnp.zeros((Hkv, GT, D), jnp.float32)
        m, l, acc = jax.lax.fori_loop(0, num_chunks, body, (m0, l0, acc0))
        out = acc / jnp.maximum(l, 1e-30)
        out_ref[0] = out.astype(out_ref.dtype)


_PREFILL_TQ = 128


@functools.partial(
    jax.jit,
    static_argnames=("scale", "kv_scale", "chunk_blocks", "flat_kv",
                     "num_slots"),
)
def paged_prefill_pallas(
    q: jax.Array,  # [1, T, Hq, D]
    k_cache: jax.Array,  # [NB, BS, Hkv, D] or [L, NB, BS, Hkv, D]
    v_cache: jax.Array,
    block_table: jax.Array,  # [1, NBMAX] int32
    kv_len: jax.Array,  # [] or [1] int32 (start + num_real)
    num_real: jax.Array,  # [] or [1] int32
    scale: float,
    kv_scale: float = 1.0,
    chunk_blocks: int | None = None,
    layer: jax.Array | None = None,
    flat_kv: bool | None = None,
    num_slots: int | None = None,
) -> jax.Array:
    _, T, Hq, D = q.shape
    full_cache = k_cache.ndim == 5
    NB, BS, Hkv, _ = k_cache.shape[1:] if full_cache else k_cache.shape
    layer_arr = jnp.asarray(
        [layer if layer is not None else 0], jnp.int32
    ).reshape(1)
    G = Hq // Hkv
    TQ = min(_PREFILL_TQ, T)
    fp8 = k_cache.dtype == quant_ops.FP8_DTYPE
    i8 = k_cache.dtype == jnp.int8
    if i8:  # int8 KV: fold the fixed-point factor into the multiplier
        kv_scale = quant_ops.kv8_dequant_factor(kv_scale)
    if fp8:  # bit-placement dequant reads values scaled by 2^-120
        kv_scale = kv_scale * FP8_BIAS_FIX
    if flat_kv is None:
        flat_kv = FLAT_KV_DEFAULT
    if flat_kv:  # see paged_attention_pallas: tile-aligned KV scratch
        k_cache = k_cache.reshape(*k_cache.shape[:-2], Hkv * D)
        v_cache = v_cache.reshape(*v_cache.shape[:-2], Hkv * D)

    if chunk_blocks is None:
        chunk_blocks = max(1, 128 // BS)
    NBMAX = block_table.shape[1]
    pad_cols = (-NBMAX) % chunk_blocks
    if pad_cols:
        block_table = jnp.pad(block_table, ((0, 0), (0, pad_cols)))
    pad_t = (-T) % TQ
    if pad_t:
        q = jnp.pad(q, ((0, 0), (0, pad_t), (0, 0), (0, 0)))
    TP = T + pad_t
    CHUNK_T = chunk_blocks * BS

    # [1, TP, Hkv, G, D] -> tiles [TP//TQ, Hkv, G, TQ, D] -> [*, Hkv, G*TQ, D]
    qr = (
        q.reshape(TP // TQ, TQ, Hkv, G, D)
        .transpose(0, 2, 3, 1, 4)
        .reshape(TP // TQ, Hkv, G * TQ, D)
    )

    kernel = functools.partial(
        _prefill_kernel,
        TQ=TQ,
        BS=BS,
        CHUNK_BLOCKS=chunk_blocks,
        scale=scale,
        kv_scale=kv_scale,
        deq=fp8 or i8 or kv_scale != 1.0,
        fp8=fp8,
        full_cache=full_cache,
        flat=flat_kv,
        nslots=(
            max(2, num_slots)
            if num_slots is not None
            else NUM_SLOTS_DEFAULT
        ),
    )
    S = kernel.keywords["nslots"]
    kv_scratch_dims = (CHUNK_T, Hkv * D) if flat_kv else (CHUNK_T, Hkv, D)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(TP // TQ,),
        in_specs=[
            pl.BlockSpec(
                (1, Hkv, G * TQ, D), lambda i, *_: (i, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec(
            (1, Hkv, G * TQ, D), lambda i, *_: (i, 0, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[
            pltpu.VMEM((S, *kv_scratch_dims), k_cache.dtype),
            pltpu.VMEM((S, *kv_scratch_dims), v_cache.dtype),
            pltpu.SemaphoreType.DMA((S, 2)),
        ],
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((TP // TQ, Hkv, G * TQ, D), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
    )(
        block_table,
        jnp.reshape(kv_len, (1,)).astype(jnp.int32),
        jnp.reshape(num_real, (1,)).astype(jnp.int32),
        layer_arr,
        qr,
        k_cache,
        v_cache,
    )

    # [TP//TQ, Hkv, G*TQ, D] -> [1, TP, Hq, D] -> strip padding
    out = (
        out.reshape(TP // TQ, Hkv, G, TQ, D)
        .transpose(0, 3, 1, 2, 4)
        .reshape(1, TP, Hq, D)
    )
    return out[:, :T]


# threshold above which we fall back to the XLA path (prefill chunks)
MAX_KERNEL_QLEN = 16


def paged_attention_dispatch(q, k_cache, v_cache, layer,
                             meta: AttentionMetadata, scale: float,
                             kv_scale: float = 1.0,
                             k_new=None, v_new=None):
    """Dispatch adapter for ops.attention.{attention,attention_at_layer}.
    `layer` is None for a per-layer 4-D cache, a traced scalar for the
    full 5-D cache. k_new/v_new (cache dtype) is the deferred-commit
    VMEM tail — only the short-query decode/verify kernel supports it
    (the deferred forward is decode-side by construction)."""
    T = q.shape[1]
    if k_new is not None and (T > MAX_KERNEL_QLEN or q.shape[-1] % 128 != 0):
        from vllm_omni_draft_tpu.ops.attention import (
            _attention_gathered as _xla_gathered,
        )

        B = q.shape[0]
        if k_cache.ndim == 5:
            BS, Hkv, D = k_cache.shape[2], k_cache.shape[3], k_cache.shape[4]
            S = meta.block_tables.shape[1] * BS
            k = k_cache[layer, meta.block_tables].reshape(B, S, Hkv, D)
            v = v_cache[layer, meta.block_tables].reshape(B, S, Hkv, D)
        else:
            BS, Hkv, D = k_cache.shape[1], k_cache.shape[2], k_cache.shape[3]
            S = meta.block_tables.shape[1] * BS
            k = k_cache[meta.block_tables].reshape(B, S, Hkv, D)
            v = v_cache[meta.block_tables].reshape(B, S, Hkv, D)
        return _xla_gathered(q, k, v, meta, scale, kv_scale,
                             k_tail=k_new, v_tail=v_new)
    # the kernel's block DMAs require lane-aligned head_dim (Mosaic tiling);
    # small-head models (drafts) take the XLA path — they're cheap anyway
    if T > MAX_KERNEL_QLEN and q.shape[-1] % 128 == 0:
        # long chunks (prefill): q-tiled flash kernel, one instance per
        # sequence (the batched multi-sequence prefill program loops the
        # kernel; the layer scan reuses the body, so the program carries
        # B kernel instances total, not B*L). num_real is derived
        # in-trace from the position padding.
        outs = []
        for b in range(q.shape[0]):
            num_real = jnp.sum((meta.positions[b] >= 0).astype(jnp.int32))
            outs.append(
                paged_prefill_pallas(
                    q[b:b + 1], k_cache, v_cache,
                    meta.block_tables[b:b + 1], meta.kv_lens[b],
                    num_real, scale, kv_scale, layer=layer,
                )
            )
        return outs[0] if len(outs) == 1 else jnp.concatenate(outs, axis=0)
    if T > MAX_KERNEL_QLEN or q.shape[-1] % 128 != 0:
        from vllm_omni_draft_tpu.ops.attention import (
            _attention_gathered,
            paged_attention as xla_ref,
        )

        if k_cache.ndim == 5:
            B = q.shape[0]
            BS, Hkv, D = k_cache.shape[2], k_cache.shape[3], k_cache.shape[4]
            S = meta.block_tables.shape[1] * BS
            k = k_cache[layer, meta.block_tables].reshape(B, S, Hkv, D)
            v = v_cache[layer, meta.block_tables].reshape(B, S, Hkv, D)
            return _attention_gathered(q, k, v, meta, scale, kv_scale)
        return xla_ref(q, k_cache, v_cache, meta, scale, kv_scale)
    return paged_attention_pallas(
        q, k_cache, v_cache, meta.block_tables, meta.kv_lens, scale, kv_scale,
        layer=layer, k_new=k_new, v_new=v_new,
    )
