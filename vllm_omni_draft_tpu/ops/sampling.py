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

import jax
import jax.numpy as jnp

NEG_INF = jnp.float32(jnp.finfo(jnp.float32).min)


def apply_top_k_top_p(
    logits: jax.Array,  # [B, V] f32
    top_k: jax.Array,  # [B] int32, 0 => disabled
    top_p: jax.Array,  # [B] f32, 1.0 => disabled
) -> jax.Array:
    """Mask logits outside the per-request top-k / top-p (nucleus) sets.

    Sort-based (static shapes). Ties are broken by sort order, matching the
    behavior a target-only sampler sees — important for lossless verify.
    """
    B, V = logits.shape
    sorted_logits = jnp.sort(logits, axis=-1)[:, ::-1]  # desc
    ranks = jnp.arange(V, dtype=jnp.int32)

    # top-k: threshold = k-th largest logit
    k = jnp.where(top_k > 0, top_k, V).astype(jnp.int32)
    kth = jnp.take_along_axis(
        sorted_logits, jnp.minimum(k - 1, V - 1)[:, None], axis=-1
    )  # [B, 1]
    keep_k = logits >= kth

    # top-p over the softmax of the (already top-k-masked) logits.
    probs_sorted = jax.nn.softmax(
        jnp.where(sorted_logits >= kth, sorted_logits, NEG_INF), axis=-1
    )
    cumsum = jnp.cumsum(probs_sorted, axis=-1)
    # keep the smallest prefix with cumulative mass >= top_p (always >= 1 tok)
    in_nucleus = (cumsum - probs_sorted) < top_p[:, None]  # [B, V] on sorted
    # threshold logit = smallest logit still in the nucleus
    last_idx = jnp.maximum(jnp.sum(in_nucleus.astype(jnp.int32), axis=-1) - 1, 0)
    pth = jnp.take_along_axis(sorted_logits, last_idx[:, None], axis=-1)
    keep_p = logits >= pth

    del ranks
    return jnp.where(keep_k & keep_p, logits, NEG_INF)


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
