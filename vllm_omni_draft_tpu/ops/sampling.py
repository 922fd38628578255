"""Batched sampling ops with per-request parameters.

All functions take per-request parameter vectors ([B]-shaped temperature /
top_k / top_p) so one jitted call samples a heterogeneous continuous batch —
no recompilation when the request mix changes.

`compute_probs` is the single source of truth for "the distribution the
engine samples from": greedy (temperature==0) becomes a one-hot argmax
distribution, so the lossless rejection sampler (ops/rejection.py) handles
greedy and sampled verify through one code path.

Capability parity: vLLM sampler + logit processors
(reference spec: sampler stage of `src/doc/VLLM_V1_Interface.md:148-162`).
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp

NEG_INF = jnp.float32(jnp.finfo(jnp.float32).min)

# threshold-search arity: 2 = classic bisection (16 halving passes),
# 4 = quad search (8 iterations x 3 probes — same final interval width,
# half the loop trips; on TPU the Pallas kernel streams 3 counts per
# VMEM tile visit, attacking the ~35 us/pass fixed cost that dominates
# the sampled-verify threshold search). Both the XLA fallback and the
# Pallas kernel key off this, so either setting is self-consistent.
# Default 4 since round 5: on-chip A/B at the sampled headline shape
# read 6233 +- 37 vs binary's 6148 +- 28 (+1.4%); VOT_THRESH_BIND=1
# (shared per-body promotion) measured no further win (6204).
_SEARCH_ARITY = int(os.environ.get("VOT_THRESH_ARITY", "4"))


def set_search_arity(arity: int) -> None:
    if arity not in (2, 4):
        raise ValueError(f"search arity must be 2 or 4, got {arity}")
    global _SEARCH_ARITY
    _SEARCH_ARITY = arity


def search_arity() -> int:
    return _SEARCH_ARITY


def quad_step(target_fn, lo, hi):
    """One 4-ary narrowing step: 3 probes shrink [lo, hi] to a quarter.
    Shared verbatim (same float expressions) by the XLA fallback and the
    Pallas kernel so their results stay bit-identical."""
    q = 0.25 * (hi - lo)
    t1 = lo + q
    t2 = lo + 2.0 * q
    t3 = lo + 3.0 * q
    ok1, ok2, ok3 = target_fn(t1), target_fn(t2), target_fn(t3)
    lo2 = jnp.where(ok3, t3, jnp.where(ok2, t2, jnp.where(ok1, t1, lo)))
    hi2 = jnp.where(ok3, hi, jnp.where(ok2, t3, jnp.where(ok1, t2, t1)))
    return lo2, hi2


def _bisect_threshold(values, target_fn, lo, hi, iters=16):
    """Find (per row) the largest t such that target_fn(t) holds, where
    target_fn is monotone-decreasing in t. Returns lo after the search.
    The invariant (target_fn(lo) holds at every step) makes the result a
    conservative threshold: the kept set always satisfies the target."""
    if _SEARCH_ARITY == 4:
        def body4(_, carry):
            return quad_step(target_fn, *carry)

        lo, hi = jax.lax.fori_loop(0, iters // 2, body4, (lo, hi))
        return lo

    def body(_, carry):
        lo, hi = carry
        mid = 0.5 * (lo + hi)
        ok = target_fn(mid)
        return jnp.where(ok, mid, lo), jnp.where(ok, hi, mid)

    lo, hi = jax.lax.fori_loop(0, iters, body, (lo, hi))
    return lo


# Pallas override: VMEM-resident threshold search (set on TPU by
# ops.pallas.install; ops/pallas/rejection.py). One HBM pass instead of
# ~32 — the dominant cost of the sampled-verify path.
_PALLAS_THRESHOLDS = None


def use_pallas_thresholds(fn) -> None:
    global _PALLAS_THRESHOLDS
    _PALLAS_THRESHOLDS = fn


def apply_top_k_top_p(
    logits: jax.Array,  # [B, V] f32
    top_k: jax.Array,  # [B] int32, 0 => disabled
    top_p: jax.Array,  # [B] f32, 1.0 => disabled
) -> jax.Array:
    """Mask logits outside the per-request top-k / top-p (nucleus) sets.

    Sort-free and bandwidth-lean: a full [B, 152k] sort costs tens of ms
    on TPU, so thresholds are found by bisection (16 masked reductions),
    and top-p runs in unnormalized bf16 exp space so the f32 probs tensor
    is never materialized. At a bisection threshold the kept set is a
    ties-inclusive superset: count >= k and mass >= top_p hold by the
    bisection invariant, matching the `>=`-threshold semantics of a
    sorted-prefix implementation. The RETURNED distribution stays exact
    f32 over the kept set (the final mask selects original f32 logits).

    MISCOMPILE GUARD: both bisection operands sit behind an
    `optimization_barrier`. Without it, XLA-TPU fuses the bisection
    fori_loop with the logits producer (the int4 matmul custom call) and
    the counts come out garbage — kept sets of 0, half, or ALL of the
    vocab depending on fusion shape, while the identical math is correct
    in isolation (see PERF_NOTES.md "bisection fusion miscompile").
    """
    lx = jax.lax.optimization_barrier(logits.astype(jnp.bfloat16))
    kth, tau, mx = thresholds_dispatch(lx, top_k, top_p)
    keep = keep_mask(lx, kth, tau, mx)
    return jnp.where(keep, logits, NEG_INF)


def thresholds_dispatch(lx, top_k, top_p):
    """The single entry every consumer (apply_top_k_top_p AND
    rejection_sample_sparse) must use, so the VOT_TOPK_GATHER_TILES
    flag applies uniformly and the compute_probs==sparse-sampler token
    invariant holds under any flag setting."""
    if _GATHER_TILES:
        return topk_topp_thresholds_gathered(lx, top_k, top_p)
    return topk_topp_thresholds(lx, top_k, top_p)


# VOT_TOPK_GATHER_TILES=N (>0 enables): run the threshold search on the
# rows' top-N 512-column tiles instead of the full vocab. For rows with
# 0 < top_k <= N the top-k threshold is BIT-IDENTICAL to the full-width
# search: each of the <=k elements >= kth makes its own tile-max >= kth,
# so at most k tiles hold candidates and the top-N-by-tilemax gather
# covers them all; with the global row_min threaded in as the lower
# bound, every probe's count decision — hence the whole trajectory —
# matches. (N >= k, NOT N*512 >= k: candidates can sit one per tile.)
# The top-p threshold is exact up to the search's existing interval
# tolerance: elements inside the final ~2^-16-range gap of kth that
# fall OUTSIDE the gathered tiles are missing from the subset's exp
# mass — their contribution is bounded by that gap's exp weight
# (empirically zero effect; the bench's k=64/p=0.95 config measures
# bit-identical kept sets). Rows with top_k == 0 see only the subset's
# counts (keff = subset width) — they keep AT LEAST the top N*512 and
# may keep everything; a valid ties-inclusive filter, but not the
# full-width semantics, so the flag is a serving-config knob for
# deployments whose requests always carry finite top_k <= N. The search
# itself (Pallas kernel or XLA fallback) is reused unchanged on the
# gathered image — it streams N*512 columns per probe instead of 152k.
_GATHER_TILES = int(os.environ.get("VOT_TOPK_GATHER_TILES", "0"))
_GATHER_TILE_W = 512


def set_gather_tiles(n: int) -> None:
    global _GATHER_TILES
    _GATHER_TILES = int(n)


def topk_topp_thresholds_gathered(
    lx: jax.Array,  # [B, V] bf16
    top_k: jax.Array,
    top_p: jax.Array,
) -> tuple[jax.Array, jax.Array, jax.Array]:
    B, V = lx.shape
    W = _GATHER_TILE_W
    nsel = _GATHER_TILES
    if V <= nsel * W:
        return topk_topp_thresholds(lx, top_k, top_p)
    pad = (-V) % W
    lxp = (
        jnp.pad(lx, ((0, 0), (0, pad)), constant_values=jnp.bfloat16(-1e30))
        if pad else lx
    )
    nt = lxp.shape[1] // W
    tilemax = lxp.reshape(B, nt, W).max(axis=-1)          # [B, nt]
    _, idx = jax.lax.top_k(tilemax, nsel)                 # [B, nsel]
    cols = (idx[..., None] * W
            + jnp.arange(W, dtype=idx.dtype)).reshape(B, nsel * W)
    sub = jnp.take_along_axis(lxp, cols, axis=1)          # [B, nsel*W]
    # thread the GLOBAL row min in as the search's lower bound: the
    # probe trajectory then matches the full-width search exactly, so
    # finite-top_k rows get BIT-IDENTICAL thresholds (subset min alone
    # would shift the probes and flip boundary elements)
    row_min = jnp.min(lx, axis=-1).astype(jnp.float32)
    return topk_topp_thresholds(sub, top_k, top_p, row_min=row_min)


def topk_topp_thresholds(
    lx: jax.Array,  # [B, V] bf16 (barriered image of scaled logits)
    top_k: jax.Array,  # [B] int32, 0 => disabled
    top_p: jax.Array,  # [B] f32, 1.0 => disabled
    row_min: jax.Array | None = None,  # [B] f32 external lower bound
    # (the gathered fast path passes the GLOBAL row min so the probe
    # trajectory matches the full-width search bit-for-bit)
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Per-row (kth, tau, mx) defining the top-k/top-p kept set as
        keep(v) = lx[v] >= kth  AND  bf16(exp(f32(lx[v]) - mx)) >= tau
    (see keep_mask). Pallas VMEM kernel on TPU, XLA bisection fallback
    elsewhere — identical math either way."""
    B, V = lx.shape
    if _PALLAS_THRESHOLDS is not None and V >= 4096:
        # arity passes as a STATIC jit arg so a runtime
        # set_search_arity() retraces instead of hitting a stale cache
        return _PALLAS_THRESHOLDS(lx, top_k, top_p,
                                  arity=_SEARCH_ARITY, row_min=row_min)
    row_max = jnp.max(lx, axis=-1, keepdims=True).astype(jnp.float32)
    if row_min is None:
        row_min = jnp.min(lx, axis=-1, keepdims=True).astype(jnp.float32)
    else:
        row_min = row_min.reshape(B, 1).astype(jnp.float32)

    # ---- top-k: largest t with count{logit >= t} >= k ----
    k = jnp.where(top_k > 0, top_k, V).astype(jnp.int32)[:, None]

    def count_ok(t):
        cnt = jnp.sum((lx >= t).astype(jnp.int32), axis=-1, keepdims=True)
        return cnt >= k

    kth = _bisect_threshold(lx, count_ok, row_min - 1e-3, row_max + 1e-3)
    keep_k = lx >= kth

    # ---- top-p in UNNORMALIZED exp space (never materializes f32 probs):
    #      largest tau_u with mass{e_i >= tau_u} >= top_p * denom ----
    e = jax.lax.optimization_barrier(
        jnp.where(
            keep_k, jnp.exp((lx.astype(jnp.float32) - row_max)), 0.0
        ).astype(jnp.bfloat16)
    )  # [B, V] bf16, one materialization; barrier per docstring
    denom = jnp.sum(e, axis=-1, keepdims=True, dtype=jnp.float32)
    emax = jnp.max(e, axis=-1, keepdims=True).astype(jnp.float32)
    tp = jnp.minimum(top_p, 1.0)[:, None]

    def mass_ok(tau_u):
        mass = jnp.sum(
            jnp.where(e >= tau_u, e, 0.0), axis=-1, keepdims=True,
            dtype=jnp.float32,
        )
        return mass >= tp * denom

    tau_u = _bisect_threshold(e, mass_ok, jnp.zeros_like(emax), emax)
    return kth[:, 0], tau_u[:, 0], row_max[:, 0]


def keep_mask(lx, kth, tau, mx):
    """[.., V] bool kept set from per-row thresholds; `lx` bf16 and the
    broadcastable per-row (kth, tau, mx). The e-image comparison runs in
    bf16 exactly like the threshold search, so the mask matches the
    search's counting semantics bit-for-bit."""
    keep_k = lx >= kth[..., None]
    e = jnp.where(
        keep_k, jnp.exp(lx.astype(jnp.float32) - mx[..., None]), 0.0
    ).astype(jnp.bfloat16)
    return keep_k & (e >= tau[..., None])


def compute_probs(
    logits: jax.Array,  # [B, V] any float
    temperature: jax.Array,  # [B] f32; 0 => greedy
    top_k: jax.Array,  # [B] int32
    top_p: jax.Array,  # [B] f32
) -> jax.Array:
    """The per-request sampling distribution as explicit probs [B, V] f32.

    temperature == 0 yields a one-hot at the argmax (first max index), which
    is exactly the distribution greedy target-only decoding samples from.
    """
    logits = logits.astype(jnp.float32)
    greedy = temperature <= 0.0
    safe_t = jnp.where(greedy, 1.0, temperature)
    scaled = logits / safe_t[:, None]
    filtered = apply_top_k_top_p(scaled, top_k, top_p)
    probs = jax.nn.softmax(filtered, axis=-1)
    one_hot = jax.nn.one_hot(
        jnp.argmax(logits, axis=-1), logits.shape[-1], dtype=jnp.float32
    )
    return jnp.where(greedy[:, None], one_hot, probs)


def sample_from_probs(probs: jax.Array, key: jax.Array) -> jax.Array:
    """Categorical sample per row; zero-prob entries are never chosen."""
    logp = jnp.log(jnp.maximum(probs, 1e-30))
    logp = jnp.where(probs > 0, logp, NEG_INF)
    return jax.random.categorical(key, logp, axis=-1).astype(jnp.int32)


def sample(
    logits: jax.Array,
    temperature: jax.Array,
    top_k: jax.Array,
    top_p: jax.Array,
    key: jax.Array,
) -> tuple[jax.Array, jax.Array]:
    """One-shot sampling: returns (tokens [B], probs [B, V])."""
    probs = compute_probs(logits, temperature, top_k, top_p)
    tokens = sample_from_probs(probs, key)
    # greedy rows: take argmax deterministically (categorical on a one-hot
    # does this too, but be explicit and avoid RNG dependence)
    tokens = jnp.where(
        temperature <= 0.0, jnp.argmax(logits, axis=-1).astype(jnp.int32), tokens
    )
    return tokens, probs


def compute_logprobs(probs: jax.Array, k: int) -> tuple[jax.Array, jax.Array]:
    """Top-k (value, index) logprobs per row for the logprobs API."""
    logp = jnp.log(jnp.maximum(probs, 1e-30))
    vals, idx = jax.lax.top_k(logp, k)
    return vals, idx.astype(jnp.int32)
