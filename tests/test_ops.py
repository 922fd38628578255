"""Unit tests for elementary ops: norm, rope, quant, sampling filters."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vllm_omni_draft_tpu.ops import quant as q
from vllm_omni_draft_tpu.ops.layers import rms_norm, rope_cos_sin, apply_rope_cos_sin
from vllm_omni_draft_tpu.ops.sampling import (
    apply_top_k_top_p,
    compute_probs,
    sample,
)


def test_rms_norm_matches_reference():
    x = jax.random.normal(jax.random.PRNGKey(0), (4, 8), jnp.float32)
    w = jax.random.normal(jax.random.PRNGKey(1), (8,), jnp.float32)
    eps = 1e-6
    got = rms_norm(x, w, eps)
    ref = x / np.sqrt(np.mean(np.asarray(x) ** 2, axis=-1, keepdims=True) + eps) * w
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-5)


def test_rope_rotation_preserves_norm_and_is_position_dependent():
    B, T, H, D = 2, 3, 2, 16
    key = jax.random.PRNGKey(0)
    qv = jax.random.normal(key, (B, T, H, D), jnp.float32)
    kv = jax.random.normal(jax.random.PRNGKey(1), (B, T, H, D), jnp.float32)
    pos = jnp.broadcast_to(jnp.arange(T), (B, T))
    cos, sin = rope_cos_sin(pos, D, 10000.0)
    q1, k1 = apply_rope_cos_sin(qv, kv, cos, sin)
    # rotation preserves per-pair norms => overall vector norm
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(q1), axis=-1),
        np.linalg.norm(np.asarray(qv), axis=-1),
        rtol=1e-5,
    )
    # position 0 => identity
    np.testing.assert_allclose(np.asarray(q1[:, 0]), np.asarray(qv[:, 0]), rtol=1e-5)
    # relative-position property: q(m)·k(n) depends only on m-n
    def dot_at(m, n):
        pos_m = jnp.full((1, 1), m)
        pos_n = jnp.full((1, 1), n)
        cm, sm = rope_cos_sin(pos_m, D, 10000.0)
        cn, sn = rope_cos_sin(pos_n, D, 10000.0)
        qr, _ = apply_rope_cos_sin(qv[:1, :1], kv[:1, :1], cm, sm)
        _, kr = apply_rope_cos_sin(qv[:1, :1], kv[:1, :1], cn, sn)
        return float(jnp.sum(qr[0, 0, 0] * kr[0, 0, 0]))

    assert abs(dot_at(5, 3) - dot_at(7, 5)) < 1e-3


def test_int8_quant_roundtrip():
    w = jax.random.normal(jax.random.PRNGKey(0), (32, 64), jnp.float32)
    qd = q.quantize_int8(w)
    assert qd["w"].dtype == jnp.int8
    wdq = q.dequantize(qd, jnp.float32)
    err = np.max(np.abs(np.asarray(wdq) - np.asarray(w)))
    scale_max = float(jnp.max(qd["s"]))
    assert err <= scale_max * 0.51  # within half an int8 step


def test_int4_quant_roundtrip():
    w = jax.random.normal(jax.random.PRNGKey(0), (16, 128), jnp.float32)
    qd = q.quantize_int4(w, group_size=32)
    assert qd["w"].dtype == jnp.uint8 and qd["w"].shape == (16, 64)
    assert qd["s"].shape == (16, 4)
    wdq = np.asarray(q.dequantize(qd, jnp.float32))
    # group-wise max error within half an int4 step of the group scale
    s = np.repeat(np.asarray(qd["s"]), 32, axis=1)
    assert np.max(np.abs(wdq - np.asarray(w)) / s) <= 0.51


def test_quant_matmul_matches_dequant_matmul():
    x = jax.random.normal(jax.random.PRNGKey(0), (4, 64), jnp.float32)
    w = jax.random.normal(jax.random.PRNGKey(1), (32, 64), jnp.float32)
    q8 = q.quantize_int8(w)
    got = q.matmul_int8(x, q8["w"], q8["s"])
    ref = x @ q.dequantize(q8, jnp.float32).T
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-4, atol=1e-4)

    q4 = q.quantize_int4(w, group_size=32)
    got4 = q.matmul_int4(x, q4["w"], q4["s"])
    ref4 = x @ q.dequantize(q4, jnp.float32).T
    np.testing.assert_allclose(np.asarray(got4), np.asarray(ref4), rtol=1e-4, atol=1e-4)


def test_int4_pack_unpack_exact():
    rng = np.random.default_rng(0)
    vals = rng.integers(-8, 8, size=(4, 32)).astype(np.int32)
    u = (vals + 8).astype(np.uint8)
    packed = jnp.asarray(u[:, :16] | (u[:, 16:] << 4))  # split-half layout
    unpacked = np.asarray(q.unpack_int4(packed))
    np.testing.assert_array_equal(unpacked, vals)


def test_fp8_kv_roundtrip():
    x = jax.random.normal(jax.random.PRNGKey(0), (8, 16), jnp.float32)
    f8 = q.kv_to_fp8(x, scale=1.0)
    assert f8.dtype == q.FP8_DTYPE
    back = np.asarray(q.kv_from_fp8(f8, 1.0, jnp.float32))
    # e4m3 has ~2 decimal digits; relative error bounded by 2^-3
    np.testing.assert_allclose(back, np.asarray(x), rtol=0.13, atol=0.02)


def test_top_k_filtering():
    logits = jnp.array([[1.0, 3.0, 2.0, 0.0]])
    out = apply_top_k_top_p(logits, jnp.array([2]), jnp.array([1.0]))
    kept = np.asarray(out[0]) > -1e30
    np.testing.assert_array_equal(kept, [False, True, True, False])


def test_top_p_filtering():
    # probs = softmax([0, ln2, ln4]) = [1/7, 2/7, 4/7]
    logits = jnp.log(jnp.array([[1.0, 2.0, 4.0]]))
    out = apply_top_k_top_p(logits, jnp.array([0]), jnp.array([0.8]))
    kept = np.asarray(out[0]) > -1e30
    # 4/7=0.57 then 2/7 → cum 6/7=0.857 ≥ 0.8 ⇒ keep {4, 2}, drop 1
    np.testing.assert_array_equal(kept, [False, True, True])


def test_compute_probs_greedy_is_one_hot():
    logits = jnp.array([[0.1, 5.0, 1.0], [2.0, 0.0, -1.0]])
    p = compute_probs(logits, jnp.array([0.0, 0.0]), jnp.array([0, 0]), jnp.array([1.0, 1.0]))
    np.testing.assert_allclose(np.asarray(p), [[0, 1, 0], [1, 0, 0]], atol=1e-6)


def test_sample_respects_distribution():
    logits = jnp.log(jnp.array([[0.2, 0.8]] * 1))
    temps = jnp.array([1.0])
    counts = np.zeros(2)
    for i in range(400):
        tok, _ = sample(logits, temps, jnp.array([0]), jnp.array([1.0]),
                        jax.random.PRNGKey(i))
        counts[int(tok[0])] += 1
    assert 0.72 < counts[1] / 400 < 0.88


def test_mixed_greedy_and_sampled_batch():
    logits = jnp.array([[0.0, 10.0], [0.0, 10.0]])
    tok, _ = sample(
        logits,
        jnp.array([0.0, 1.0]),
        jnp.array([0, 0]),
        jnp.array([1.0, 1.0]),
        jax.random.PRNGKey(0),
    )
    assert int(tok[0]) == 1  # greedy row deterministic


def test_attention_backend_resolution_and_dispatch():
    """auto routes small models (spec drafts) to the fused XLA gather
    path and big models to the Pallas kernel; explicit values win; the
    backend argument actually controls the dispatch."""
    import jax.numpy as jnp
    import pytest

    from vllm_omni_draft_tpu.config import ModelConfig
    from vllm_omni_draft_tpu.ops import attention as att

    draft = ModelConfig(
        vocab_size=151_936, hidden_size=896, intermediate_size=4864,
        num_layers=7, num_heads=14, num_kv_heads=2, head_dim=64,
        max_model_len=1024, dtype="bfloat16",
    )
    target = ModelConfig(
        vocab_size=151_936, hidden_size=3584, intermediate_size=18944,
        num_layers=28, num_heads=28, num_kv_heads=4, head_dim=128,
        max_model_len=1024, dtype="bfloat16",
    )
    # auto == pallas everywhere (draft-XLA routing was A/B'd on the
    # chip and regressed 13.7%; see resolved_attention_backend)
    assert att.resolved_attention_backend(draft) == "pallas"
    assert att.resolved_attention_backend(target) == "pallas"
    forced = ModelConfig(**{**draft.__dict__, "attention_backend": "xla"})
    assert att.resolved_attention_backend(forced) == "xla"
    with pytest.raises(ValueError, match="attention_backend"):
        ModelConfig(**{**draft.__dict__, "attention_backend": "cuda"})

    # dispatch: backend="xla" must BYPASS an installed kernel hook
    calls = []
    old = att._PALLAS_PAGED_ATTENTION
    att.use_pallas_kernel(
        lambda *a, **k: calls.append(1) or (_ for _ in ()).throw(
            RuntimeError("kernel called")
        )
    )
    try:
        from vllm_omni_draft_tpu.ops.attention import AttentionMetadata

        B, T, Hq, Hkv, D, BS, NB, L = 1, 1, 2, 1, 16, 8, 4, 1
        q = jnp.ones((B, T, Hq, D), jnp.float32)
        kc = jnp.zeros((L, NB, BS, Hkv, D), jnp.float32)
        bt = jnp.zeros((B, 2), jnp.int32)
        meta = AttentionMetadata(
            block_tables=bt,
            kv_lens=jnp.ones((B,), jnp.int32),
            positions=jnp.zeros((B, T), jnp.int32),
            slot_mapping=jnp.zeros((B, T), jnp.int32),
        )
        out = att.attention_at_layer(
            q, kc, kc, jnp.int32(0), meta, 0.25, backend="xla"
        )
        assert out.shape == (B, T, Hq, D) and not calls
        with pytest.raises(RuntimeError, match="kernel called"):
            att.attention_at_layer(
                q, kc, kc, jnp.int32(0), meta, 0.25, backend="pallas"
            )
        assert calls
    finally:
        att.use_pallas_kernel(old)


def test_batched_first_token_sampler_matches_per_row():
    """The prefill group sampler (runner._first_tokens_fn construction:
    row-local compute_probs + vmapped per-key categorical) must emit the
    IDENTICAL token the per-request sample_one path emits for the same
    row logits and folded key — greedy rows included."""
    import jax

    from vllm_omni_draft_tpu.ops.sampling import (
        compute_probs,
        sample_from_probs,
    )

    N, V = 8, 997
    key = jax.random.PRNGKey(42)
    logits = jax.random.normal(jax.random.fold_in(key, 1), (N, V))
    temps = jnp.asarray([0.0, 0.7, 1.0, 1.3, 0.0, 0.5, 2.0, 0.9])
    ks = jnp.asarray([0, 64, 0, 16, 0, 8, 32, 0], jnp.int32)
    ps = jnp.asarray([1.0, 0.95, 0.9, 1.0, 1.0, 0.8, 0.99, 0.5])
    keys = jnp.stack([jax.random.fold_in(key, 1000 + i) for i in range(N)])

    probs = compute_probs(logits, temps, ks, ps)
    batched = jax.vmap(lambda p, k: sample_from_probs(p[None], k)[0])(
        probs, keys
    )
    for i in range(N):
        p1 = compute_probs(
            logits[i][None], temps[i][None], ks[i][None], ps[i][None]
        )
        tok1 = sample_from_probs(p1, keys[i])[0]
        assert int(batched[i]) == int(tok1), i
    # greedy rows equal plain argmax (the old per-request _argmax_fn)
    for i in (0, 4):
        assert int(batched[i]) == int(jnp.argmax(logits[i]))


def test_gathered_thresholds_exact_for_finite_topk():
    """VOT_TOPK_GATHER_TILES fast path: for rows with 0 < top_k <= N
    (tiles) the kept set must EQUAL the full-width search's — each
    candidate can sit in its own tile, so exactness needs N >= k, and
    the global-row_min lower bound makes the probe trajectories (hence
    thresholds) bit-identical."""
    from vllm_omni_draft_tpu.ops import sampling

    rng = np.random.default_rng(3)
    R, V = 6, 16384
    logits = jnp.asarray(rng.normal(size=(R, V)) * 3, jnp.float32)
    top_k = jnp.asarray([1, 4, 8, 6, 2, 3], jnp.int32)
    top_p = jnp.asarray([1.0, 0.9, 0.95, 0.5, 1.0, 0.3], jnp.float32)

    ref = sampling.apply_top_k_top_p(logits, top_k, top_p)
    sampling.set_gather_tiles(8)  # N=8 >= max(top_k)
    try:
        got = sampling.apply_top_k_top_p(logits, top_k, top_p)
    finally:
        sampling.set_gather_tiles(0)
    ref_keep = np.asarray(ref) > sampling.NEG_INF / 2
    got_keep = np.asarray(got) > sampling.NEG_INF / 2
    np.testing.assert_array_equal(got_keep, ref_keep)
    np.testing.assert_array_equal(
        np.asarray(got)[got_keep], np.asarray(ref)[ref_keep]
    )


def test_gathered_thresholds_disabled_topk_keeps_at_least_subset():
    """top_k=0 rows under the gather flag: behavior is a valid
    ties-inclusive filter keeping AT LEAST the top-N*512 (the knob is
    documented for finite-top_k serving configs; disabled-k rows must
    never lose probable tokens)."""
    from vllm_omni_draft_tpu.ops import sampling

    rng = np.random.default_rng(4)
    R, V = 2, 4096
    logits = jnp.asarray(rng.normal(size=(R, V)), jnp.float32)
    top_k = jnp.zeros((R,), jnp.int32)
    top_p = jnp.ones((R,), jnp.float32)
    sampling.set_gather_tiles(1)
    try:
        got = sampling.apply_top_k_top_p(logits, top_k, top_p)
    finally:
        sampling.set_gather_tiles(0)
    kept = (np.asarray(got) > sampling.NEG_INF / 2).sum(axis=1)
    assert (kept >= 512).all(), kept
