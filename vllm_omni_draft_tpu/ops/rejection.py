"""Lossless speculative-decoding rejection sampler (XLA reference path).

Implements the draft/verify acceptance rule of speculative sampling
(Leviathan et al. / Chen et al.): given k draft tokens with proposal
distributions q_i and the target's distributions p_i over the same
positions,

  accept draft token d_i with probability min(1, p_i(d_i) / q_i(d_i));
  on the first rejection at position r, emit a recovery token sampled from
  norm(max(p_r - q_r, 0)); if all k accepted, emit a bonus token from
  p_k (the target's distribution at the position after the last draft token).

The output distribution is *exactly* the target-only sampling distribution —
including the greedy case, where `compute_probs` makes p one-hot and the
rule degenerates to "accept while the draft token equals the target argmax".

Capability parity: vLLM's rejection-sampler kernels (SURVEY.md §2.4).
The acceptance rule itself is cheap XLA (gathers + cumprod over [B, K]);
the expensive part of the sampled-verify path — the top-k/top-p
threshold search inside `compute_probs` — runs as the Pallas
VMEM-resident kernel in ops/pallas/rejection.py on TPU (one HBM pass
instead of ~32). A fully fused accept+resample kernel remains available
through the `rejection_sample_dispatch` hook below.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from vllm_omni_draft_tpu.ops.sampling import sample_from_probs

PLACEHOLDER = -1  # padding token id in the output buffer


def rejection_sample(
    draft_tokens: jax.Array,  # [B, K] int32 — tokens the draft proposed
    q_probs: jax.Array,  # [B, K, Vq] f32 — draft distribution per position
    p_probs: jax.Array,  # [B, K+1, V] f32 — target distribution at each position
    key: jax.Array,
) -> tuple[jax.Array, jax.Array]:
    """Returns (out_tokens [B, K+1] int32 padded with -1, num_emitted [B]).

    num_emitted = num_accepted + 1 (the +1 is the recovery or bonus token);
    out_tokens[b, :num_emitted[b]] are the tokens to append.

    Pruned draft vocab: q_probs may cover only a prefix Vq <= V of the
    vocabulary (the pruned draft lm_head). Semantically q is zero outside
    the prefix, and draft proposals are always < Vq; the residual pads
    q_r back to V once instead of the caller padding every per-step q to
    the full vocab (which cost K [B, V] materializations per spec iter).
    """
    B, K = draft_tokens.shape
    V = p_probs.shape[-1]
    Vq = q_probs.shape[-1]
    u_key, resample_key = jax.random.split(key)

    # acceptance test per position
    u = jax.random.uniform(u_key, (B, K), dtype=jnp.float32)
    idx = draft_tokens[..., None]  # [B, K, 1]
    p_at = jnp.take_along_axis(p_probs[:, :K, :], idx, axis=-1)[..., 0]  # [B, K]
    # proposals come from the draft head, so idx < Vq by construction;
    # clip defensively (a clipped bogus index would just mis-score that
    # row, same as with a full-width q)
    q_at = jnp.take_along_axis(
        q_probs, jnp.minimum(idx, Vq - 1), axis=-1
    )[..., 0]
    ratio = p_at / jnp.maximum(q_at, 1e-30)
    accept = u < jnp.minimum(ratio, 1.0)  # [B, K]

    # longest accepted prefix
    acc_prefix = jnp.cumprod(accept.astype(jnp.int32), axis=-1)  # [B, K]
    num_accepted = jnp.sum(acc_prefix, axis=-1)  # [B]
    all_accepted = num_accepted == K

    # distribution for the (num_accepted)-th emitted token:
    #   bonus  p_K          if all accepted
    #   norm(max(p_r - q_r, 0)) at r = num_accepted otherwise
    r = jnp.minimum(num_accepted, K)  # [B]
    p_r = jnp.take_along_axis(p_probs, r[:, None, None], axis=1)[:, 0, :]  # [B, V]
    q_r = jnp.take_along_axis(
        q_probs, jnp.minimum(r, K - 1)[:, None, None], axis=1
    )[:, 0, :]  # [B, Vq]
    if Vq != V:  # zero outside the pruned prefix
        q_r = jnp.pad(q_r, ((0, 0), (0, V - Vq)))
    residual = jnp.maximum(p_r - q_r, 0.0)
    res_sum = jnp.sum(residual, axis=-1, keepdims=True)
    # degenerate residual (p == q exactly): fall back to p_r itself
    residual = jnp.where(res_sum > 1e-12, residual, p_r)
    residual = residual / jnp.maximum(
        jnp.sum(residual, axis=-1, keepdims=True), 1e-30
    )
    final_dist = jnp.where(all_accepted[:, None], p_r, residual)  # [B, V]
    final_token = sample_from_probs(final_dist, resample_key)  # [B]

    # assemble output: accepted draft tokens then the final token, -1 padding
    pos = jnp.arange(K + 1, dtype=jnp.int32)[None, :]  # [1, K+1]
    drafts_padded = jnp.concatenate(
        [draft_tokens, jnp.zeros((B, 1), jnp.int32)], axis=-1
    )
    out = jnp.where(pos < num_accepted[:, None], drafts_padded, PLACEHOLDER)
    out = jnp.where(pos == num_accepted[:, None], final_token[:, None], out)
    num_emitted = num_accepted + 1
    del V
    return out.astype(jnp.int32), num_emitted.astype(jnp.int32)


def rejection_greedy(
    draft_tokens: jax.Array,  # [B, K] int32
    target_argmax: jax.Array,  # [B, K+1] int32 — argmax of target logits
) -> tuple[jax.Array, jax.Array]:
    """Greedy fast path: accept while the draft token equals the target
    argmax; the recovery/bonus token is the target argmax itself, so the
    emitted tokens are simply target_argmax[:, :n+1]. Needs no probability
    tensors at all — this is what the general rejection sampler degenerates
    to when `compute_probs` one-hots a greedy batch (exactly lossless)."""
    B, K = draft_tokens.shape
    accept = draft_tokens == target_argmax[:, :K]
    acc_prefix = jnp.cumprod(accept.astype(jnp.int32), axis=-1)
    num_accepted = jnp.sum(acc_prefix, axis=-1)  # [B]
    pos = jnp.arange(K + 1, dtype=jnp.int32)[None, :]
    out = jnp.where(pos <= num_accepted[:, None], target_argmax, PLACEHOLDER)
    return out.astype(jnp.int32), (num_accepted + 1).astype(jnp.int32)


def rejection_sample_sparse(
    draft_tokens: jax.Array,  # [B, K] int32
    q_probs: jax.Array,  # [B, K, Vq] f32 — draft distributions
    target_logits: jax.Array,  # [B, K+1, V] float — RAW verify logits
    temps: jax.Array,  # [B] f32; <=0 => greedy row
    top_ks: jax.Array,  # [B] int32
    top_ps: jax.Array,  # [B] f32
    key: jax.Array,
    row_max: jax.Array | None = None,  # [B, K+1] raw-logit row max —
    row_argmax: jax.Array | None = None,  # fused lm_head stats
) -> tuple[jax.Array, jax.Array]:
    """Gather-based lossless rejection sampling STRAIGHT FROM LOGITS.

    Identical output law to compute_probs + rejection_sample, without
    ever materializing the [B, K+1, V] f32 target probability tensor
    (round-2 review item 7: at the 7B verify shape that tensor is ~100MB
    of HBM write+read per spec iteration):

      * the accept test needs p only AT the draft token ids — computed
        from per-row (kth, tau, mx, denom) threshold data + O(B*K)
        gathers on the logits;
      * the full residual/bonus distribution is needed only at the ONE
        first-rejection position r per sequence — a [B, V] row gather.

    Greedy rows (temperature <= 0) follow compute_probs' one-hot-argmax
    semantics exactly: accept iff draft token == target argmax; the
    final token is the argmax at row r.
    """
    from vllm_omni_draft_tpu.ops.sampling import (
        keep_mask,
        thresholds_dispatch,
    )

    B, K = draft_tokens.shape
    V = target_logits.shape[-1]
    Vq = q_probs.shape[-1]
    R = B * (K + 1)
    u_key, resample_key = jax.random.split(key)

    greedy = temps <= 0.0  # [B]
    safe_t = jnp.where(greedy, 1.0, temps)
    lg32 = target_logits.reshape(R, V).astype(jnp.float32)
    scaled = lg32 / jnp.repeat(safe_t, K + 1)[:, None]  # fused upstream
    lx = jax.lax.optimization_barrier(scaled.astype(jnp.bfloat16))
    kth, tau, _ = thresholds_dispatch(
        lx, jnp.repeat(top_ks, K + 1), jnp.repeat(top_ps, K + 1)
    )
    # f32 row stats for the prob law (matching softmax over the kept set).
    # Fused lm_head stats are over RAW logits: dividing the raw max by
    # the (positive) temperature gives max(scaled) EXACTLY — IEEE f32
    # division is monotone, so max commutes with it — and argmax is
    # scale-invariant (the dense path also argmaxes raw lg32).
    if row_max is not None:
        mx32 = row_max.reshape(R) / jnp.repeat(safe_t, K + 1)
    else:
        mx32 = jnp.max(scaled, axis=-1)  # [R]
    keep = keep_mask(lx, kth, tau, mx32.astype(jnp.bfloat16))
    denom = jnp.sum(
        jnp.where(keep, jnp.exp(scaled - mx32[:, None]), 0.0),
        axis=-1,
    )  # [R] — fused reduction, no [R, V] f32 materialization
    if row_argmax is not None:
        argmax = row_argmax.reshape(R).astype(jnp.int32)
    else:
        argmax = jnp.argmax(lg32, axis=-1).astype(jnp.int32)  # [R]

    def resh(x):
        return x.reshape(B, K + 1)

    kth_b, tau_b = resh(kth), resh(tau)
    mx_b, den_b, am_b = resh(mx32), resh(denom), resh(argmax)

    # ---- accept probs at the draft ids (gathers only) ----
    idx = draft_tokens[..., None]  # [B, K, 1]
    sc_at = jnp.take_along_axis(
        scaled.reshape(B, K + 1, V)[:, :K], idx, axis=-1
    )[..., 0]  # [B, K] f32
    lx_at = sc_at.astype(jnp.bfloat16)
    # e-image MUST subtract the bf16-rounded max exactly like keep_mask
    # does (mx32.astype(bf16) promoted back to f32), or a token whose
    # bf16 e sits exactly at tau classifies differently from the dense
    # path when the row max is not bf16-representable (ADVICE r3).
    mxb16_at = mx_b[:, :K].astype(jnp.bfloat16).astype(jnp.float32)
    e_at = jnp.where(
        lx_at >= kth_b[:, :K],
        jnp.exp(lx_at.astype(jnp.float32) - mxb16_at), 0.0
    ).astype(jnp.bfloat16)
    kept_at = (lx_at >= kth_b[:, :K]) & (e_at >= tau_b[:, :K])
    p_at = jnp.where(
        kept_at, jnp.exp(sc_at - mx_b[:, :K]) / den_b[:, :K], 0.0
    )
    # greedy rows: one-hot at argmax
    p_at = jnp.where(
        greedy[:, None],
        (draft_tokens == am_b[:, :K]).astype(jnp.float32),
        p_at,
    )
    q_at = jnp.take_along_axis(
        q_probs, jnp.minimum(idx, Vq - 1), axis=-1
    )[..., 0]
    u = jax.random.uniform(u_key, (B, K), dtype=jnp.float32)
    accept = u < jnp.minimum(p_at / jnp.maximum(q_at, 1e-30), 1.0)

    acc_prefix = jnp.cumprod(accept.astype(jnp.int32), axis=-1)
    num_accepted = jnp.sum(acc_prefix, axis=-1)  # [B]
    all_accepted = num_accepted == K
    r = jnp.minimum(num_accepted, K)

    # ---- the ONE needed distribution row per sequence ----
    take_r = lambda x: jnp.take_along_axis(x, r[:, None], axis=1)[:, 0]
    sc_r = jnp.take_along_axis(
        scaled.reshape(B, K + 1, V), r[:, None, None], axis=1
    )[:, 0]  # [B, V] f32
    lx_r = sc_r.astype(jnp.bfloat16)
    kth_r, tau_r = take_r(kth_b), take_r(tau_b)
    mx_r, den_r = take_r(mx_b), take_r(den_b)
    keep_r = keep_mask(lx_r, kth_r, tau_r, mx_r.astype(jnp.bfloat16))
    p_r = jnp.where(
        keep_r, jnp.exp(sc_r - mx_r[:, None]) / den_r[:, None], 0.0
    )  # [B, V]
    q_r = jnp.take_along_axis(
        q_probs, jnp.minimum(r, K - 1)[:, None, None], axis=1
    )[:, 0]
    if Vq != V:
        q_r = jnp.pad(q_r, ((0, 0), (0, V - Vq)))
    residual = jnp.maximum(p_r - q_r, 0.0)
    res_sum = jnp.sum(residual, axis=-1, keepdims=True)
    residual = jnp.where(res_sum > 1e-12, residual, p_r)
    residual = residual / jnp.maximum(
        jnp.sum(residual, axis=-1, keepdims=True), 1e-30
    )
    final_dist = jnp.where(all_accepted[:, None], p_r, residual)
    final_token = sample_from_probs(final_dist, resample_key)
    # greedy rows: deterministic argmax at row r
    final_token = jnp.where(greedy, take_r(am_b), final_token)

    pos = jnp.arange(K + 1, dtype=jnp.int32)[None, :]
    drafts_padded = jnp.concatenate(
        [draft_tokens, jnp.zeros((B, 1), jnp.int32)], axis=-1
    )
    out = jnp.where(pos < num_accepted[:, None], drafts_padded, PLACEHOLDER)
    out = jnp.where(pos == num_accepted[:, None], final_token[:, None], out)
    return out.astype(jnp.int32), (num_accepted + 1).astype(jnp.int32)


# Pallas override hook (set on TPU by ops.pallas.rejection).
_PALLAS_REJECTION = None


def use_pallas_kernel(fn) -> None:
    global _PALLAS_REJECTION
    _PALLAS_REJECTION = fn


def rejection_sample_dispatch(draft_tokens, q_probs, p_probs, key):
    if _PALLAS_REJECTION is not None:
        return _PALLAS_REJECTION(draft_tokens, q_probs, p_probs, key)
    return rejection_sample(draft_tokens, q_probs, p_probs, key)
