"""Fused lm_head logits+stats (round 4, sampled-verify path): the
kernel emits f32 logits AND per-row (max, argmax) in one pass; the
rejection sampler derives scaled stats from the raw ones exactly.

Pinned invariants:
 1. the Pallas logits+stats kernels (interpret mode) match the plain
    matmul kernel's logits bit-for-bit and the XLA max/argmax;
 2. rejection_sample_sparse(row_max=, row_argmax=) emits exactly the
    tokens of the stats-free call (same key), across temperatures —
    max(raw)/t == max(scaled) because IEEE division is monotone.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vllm_omni_draft_tpu.ops import quant as quant_ops
from vllm_omni_draft_tpu.ops.rejection import rejection_sample_sparse


def _quantize_int4(w):
    return quant_ops.quantize_int4(w)


@pytest.mark.parametrize("kind", ["int4", "int8"])
def test_pallas_logits_stats_matches_fallback(kind, monkeypatch):
    import jax.experimental.pallas as pl
    from vllm_omni_draft_tpu.ops.pallas import quant_matmul as qm

    orig_call = pl.pallas_call
    monkeypatch.setattr(
        pl, "pallas_call",
        lambda *a, **kw: orig_call(*a, **{**kw, "interpret": True}),
    )
    rng = np.random.default_rng(0)
    B, I, O, valid_o = 8, 256, 1024, 1000
    x = jnp.asarray(rng.standard_normal((B, I)), jnp.bfloat16)
    w = jnp.asarray(rng.standard_normal((O, I)), jnp.float32)
    if kind == "int4":
        q = quant_ops.quantize_int4(w)
        y, mx, am = qm.logits_stats_matmul_int4_pallas(
            x, q["w"], q["s"], valid_o
        )
        y_ref = qm.matmul_int4_pallas(x, q["w"], q["s"])
    else:
        q = quant_ops.quantize_int8(w)
        y, mx, am = qm.logits_stats_matmul_int8_pallas(
            x, q["w"], q["s"], valid_o
        )
        y_ref = qm.matmul_int8_pallas(x, q["w"], q["s"])
    np.testing.assert_array_equal(np.asarray(y), np.asarray(y_ref))
    yv = np.asarray(y, np.float32)[:, :valid_o]
    np.testing.assert_array_equal(np.asarray(mx), yv.max(-1))
    np.testing.assert_array_equal(np.asarray(am), yv.argmax(-1))


def test_dispatch_fallback_stats():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((4, 64)), jnp.float32)
    w = {"w": jnp.asarray(rng.standard_normal((128, 64)), jnp.float32)}
    y, mx, am = quant_ops.logits_stats_matmul(x, w, 100)
    yv = np.asarray(y, np.float32)[:, :100]
    np.testing.assert_array_equal(np.asarray(mx), yv.max(-1))
    np.testing.assert_array_equal(np.asarray(am), yv.argmax(-1))


@pytest.mark.parametrize("greedy_rows", [False, True])
def test_sparse_rejection_with_stats_token_identical(greedy_rows):
    rng = np.random.default_rng(2)
    B, K, V, Vq = 5, 3, 512, 256
    draft = jnp.asarray(rng.integers(0, Vq, size=(B, K)), jnp.int32)
    qp = rng.random((B, K, Vq)).astype(np.float32)
    qp /= qp.sum(-1, keepdims=True)
    logits = jnp.asarray(rng.standard_normal((B, K + 1, V)) * 3, jnp.float32)
    temps = jnp.asarray(
        [0.0 if greedy_rows and i % 2 == 0 else 0.4 + 0.3 * i
         for i in range(B)], jnp.float32,
    )
    top_ks = jnp.asarray([0, 16, 64, 0, 32], jnp.int32)
    top_ps = jnp.asarray([1.0, 0.9, 0.95, 0.8, 1.0], jnp.float32)
    key = jax.random.PRNGKey(7)

    base_toks, base_n = rejection_sample_sparse(
        draft, jnp.asarray(qp), logits, temps, top_ks, top_ps, key
    )
    lg = np.asarray(logits, np.float32)
    got_toks, got_n = rejection_sample_sparse(
        draft, jnp.asarray(qp), logits, temps, top_ks, top_ps, key,
        row_max=jnp.asarray(lg.max(-1)),
        row_argmax=jnp.asarray(lg.argmax(-1), jnp.int32),
    )
    np.testing.assert_array_equal(np.asarray(base_toks), np.asarray(got_toks))
    np.testing.assert_array_equal(np.asarray(base_n), np.asarray(got_n))
