"""Pallas kernel parity tests (interpret mode on CPU) against the XLA
reference implementations."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vllm_omni_draft_tpu.ops import quant as q
from vllm_omni_draft_tpu.ops.attention import AttentionMetadata, paged_attention


def _random_cache_state(key, B, T, NB, BS, Hkv, D, kv_dtype=jnp.float32,
                        min_len=1):
    ks = jax.random.split(key, 4)
    if kv_dtype == jnp.int8:
        k_cache = jax.random.randint(ks[0], (NB, BS, Hkv, D), -127, 128, jnp.int8)
        v_cache = jax.random.randint(ks[1], (NB, BS, Hkv, D), -127, 128, jnp.int8)
    else:
        k_cache = jax.random.normal(ks[0], (NB, BS, Hkv, D), jnp.float32)
        v_cache = jax.random.normal(ks[1], (NB, BS, Hkv, D), jnp.float32)
        if kv_dtype != jnp.float32:
            k_cache = k_cache.astype(kv_dtype)
            v_cache = v_cache.astype(kv_dtype)
    max_blocks = NB // B
    rng = np.random.default_rng(0)
    kv_lens = rng.integers(max(T, min_len), max_blocks * BS, size=B).astype(np.int32)
    tables = np.zeros((B, max_blocks), np.int32)
    used = list(range(1, NB))
    rng.shuffle(used)
    it = iter(used)
    for b in range(B):
        for i in range(-(-int(kv_lens[b]) // BS)):
            tables[b, i] = next(it)
    positions = kv_lens[:, None] - T + np.arange(T)[None, :]
    meta = AttentionMetadata(
        block_tables=jnp.asarray(tables),
        kv_lens=jnp.asarray(kv_lens),
        positions=jnp.asarray(positions.astype(np.int32)),
        slot_mapping=jnp.full((B, T), -1, jnp.int32),
    )
    return k_cache, v_cache, meta


@pytest.mark.parametrize("T", [1, 4])
@pytest.mark.parametrize("gqa", [(8, 8), (8, 2)])
def test_paged_attention_kernel_interpret_matches_reference(T, gqa, monkeypatch):
    from vllm_omni_draft_tpu.ops.pallas import paged_attention as pa
    import jax.experimental.pallas as pl

    # run the kernel in interpreter mode on CPU
    orig_call = pl.pallas_call
    monkeypatch.setattr(
        pl, "pallas_call", lambda *a, **kw: orig_call(*a, **{**kw, "interpret": True})
    )

    Hq, Hkv = gqa
    B, D, BS, NB = 3, 64, 8, 32
    key = jax.random.PRNGKey(0)
    qarr = jax.random.normal(key, (B, T, Hq, D), jnp.float32)
    k_cache, v_cache, meta = _random_cache_state(
        jax.random.PRNGKey(1), B, T, NB, BS, Hkv, D
    )
    scale = D ** -0.5
    ref = paged_attention(qarr, k_cache, v_cache, meta, scale)
    got = pa.paged_attention_pallas(
        qarr, k_cache, v_cache, meta.block_tables, meta.kv_lens, scale,
        chunk_blocks=2,
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize("num_slots", [2, 3, 6])
def test_paged_attention_pipeline_depth_bit_identical(num_slots, monkeypatch):
    """The N-slot DMA pipeline must not change results: every depth is
    bit-identical to the classic double-buffered (2-slot) kernel, for
    bf16 and fp8 caches, including sequences whose chunk count is
    below/above the lookahead depth."""
    from vllm_omni_draft_tpu.ops.pallas import paged_attention as pa
    import jax.experimental.pallas as pl

    orig_call = pl.pallas_call
    monkeypatch.setattr(
        pl, "pallas_call",
        lambda *a, **kw: orig_call(*a, **{**kw, "interpret": True}),
    )
    B, T, Hq, Hkv, D, BS, NB = 3, 2, 4, 2, 128, 8, 64
    key = jax.random.PRNGKey(0)
    qarr = jax.random.normal(key, (B, T, Hq, D), jnp.bfloat16)
    for dt in (jnp.bfloat16, jnp.float8_e4m3fn):
        kc = jax.random.normal(
            jax.random.PRNGKey(1), (NB, BS, Hkv, D), jnp.bfloat16
        ).astype(dt)
        vc = jax.random.normal(
            jax.random.PRNGKey(2), (NB, BS, Hkv, D), jnp.bfloat16
        ).astype(dt)
        bt = jnp.arange(B * 16, dtype=jnp.int32).reshape(B, 16)
        # 19: 2 chunks (below depth 3/6 lookahead); 128: 8 chunks (above)
        kl = jnp.array([19, 77, 128], jnp.int32)
        base = pa.paged_attention_pallas(
            qarr, kc, vc, bt, kl, 0.0883, chunk_blocks=2, num_slots=2
        )
        got = pa.paged_attention_pallas(
            qarr, kc, vc, bt, kl, 0.0883, chunk_blocks=2,
            num_slots=num_slots,
        )
        np.testing.assert_array_equal(np.asarray(got), np.asarray(base))


@pytest.mark.parametrize(
    "T,Hq,Hkv",
    [
        (5, 28, 4),   # GTP = roundup8(7*5) = 40, divisible by T
        (3, 10, 2),   # GTP = roundup8(5*3) = 16, NOT divisible by T:
                      # catches the row_t = row % T causal-shift bug
    ],
)
def test_paged_attention_gqa_fold_matches_per_head(monkeypatch, T, Hq, Hkv):
    """The GQA-folded kernel (one block-diagonal dot pair per seq-chunk)
    must match the per-head kernel to within bf16-output rounding: the
    foreign-head mask entries are exact zeros, so only the pv dot's
    contraction order differs."""
    from vllm_omni_draft_tpu.ops.pallas import paged_attention as pa
    import jax.experimental.pallas as pl

    orig_call = pl.pallas_call
    monkeypatch.setattr(
        pl, "pallas_call",
        lambda *a, **kw: orig_call(*a, **{**kw, "interpret": True}),
    )
    B, D, BS, NB = 3, 128, 8, 64
    key = jax.random.PRNGKey(0)
    qarr = jax.random.normal(key, (B, T, Hq, D), jnp.bfloat16)
    for dt in (jnp.bfloat16, jnp.float8_e4m3fn):
        kc = jax.random.normal(
            jax.random.PRNGKey(1), (NB, BS, Hkv, D), jnp.bfloat16
        ).astype(dt)
        vc = jax.random.normal(
            jax.random.PRNGKey(2), (NB, BS, Hkv, D), jnp.bfloat16
        ).astype(dt)
        bt = jnp.arange(B * 8, dtype=jnp.int32).reshape(B, 8)
        kl = jnp.array([23, 41, 64], jnp.int32)
        ref = pa.paged_attention_pallas(
            qarr, kc, vc, bt, kl, 0.0883, chunk_blocks=2, gqa_fold=False
        ).astype(jnp.float32)
        got = pa.paged_attention_pallas(
            qarr, kc, vc, bt, kl, 0.0883, chunk_blocks=2, gqa_fold=True
        ).astype(jnp.float32)
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(ref), rtol=0, atol=2e-3
        )


def test_paged_attention_kernel_inactive_rows(monkeypatch):
    from vllm_omni_draft_tpu.ops.pallas import paged_attention as pa
    import jax.experimental.pallas as pl

    orig_call = pl.pallas_call
    monkeypatch.setattr(
        pl, "pallas_call", lambda *a, **kw: orig_call(*a, **{**kw, "interpret": True})
    )
    B, T, Hq, Hkv, D, BS, NB = 2, 1, 4, 2, 64, 8, 16
    qarr = jax.random.normal(jax.random.PRNGKey(0), (B, T, Hq, D), jnp.float32)
    k_cache, v_cache, meta = _random_cache_state(
        jax.random.PRNGKey(1), B, T, NB, BS, Hkv, D
    )
    kv_lens = jnp.asarray([int(meta.kv_lens[0]), 0], jnp.int32)  # row 1 inactive
    out = pa.paged_attention_pallas(
        qarr, k_cache, v_cache, meta.block_tables, kv_lens, D ** -0.5,
        chunk_blocks=2,
    )
    assert not np.any(np.isnan(np.asarray(out)))
    np.testing.assert_array_equal(np.asarray(out[1]), 0.0)


def test_fp8_bit_placement_dequant_exact():
    """The kernel's e4m3fn dequant (integer bit placement + 2^120 scale —
    v5e VPUs have no fp8 cast path) must be EXACT for every e4m3fn code
    except NaN — *as math*, which this CPU test checks. On real TPU the 14
    subnormal codes flush to ±0 (VPU denormal flush, measured by
    scripts/fp8_subnormal_probe.py; accepted caveat — error <
    0.0137*kv_scale, below e4m3's smallest normal step)."""
    from vllm_omni_draft_tpu.ops.pallas.paged_attention import (
        FP8_BIAS_FIX,
        _fp8_bits_to_f32,
    )

    codes = np.arange(256, dtype=np.uint8)
    codes = codes[(codes & 0x7F) != 0x7F]  # e4m3fn NaN is 0x7f/0xff
    x = jax.lax.bitcast_convert_type(jnp.asarray(codes), jnp.float8_e4m3fn)
    ref = np.asarray(x.astype(jnp.float32))
    got = np.asarray(_fp8_bits_to_f32(x)) * FP8_BIAS_FIX
    np.testing.assert_array_equal(got, ref)


@pytest.mark.parametrize("kv_dtype", ["fp8", "int8"])
def test_paged_attention_kernel_quantized_kv(kv_dtype, monkeypatch):
    """1-byte KV formats: fp8 e4m3 and int8 fixed-point (the TPU-native
    variant — no hw fp8 on v5e-class chips). Kernel must match the XLA
    reference's in-register dequantization."""
    from vllm_omni_draft_tpu.ops.pallas import paged_attention as pa
    import jax.experimental.pallas as pl

    orig_call = pl.pallas_call
    monkeypatch.setattr(
        pl, "pallas_call", lambda *a, **kw: orig_call(*a, **{**kw, "interpret": True})
    )
    B, T, Hq, Hkv, D, BS, NB = 2, 1, 4, 2, 64, 8, 16
    qarr = jax.random.normal(jax.random.PRNGKey(0), (B, T, Hq, D), jnp.float32)
    k_cache, v_cache, meta = _random_cache_state(
        jax.random.PRNGKey(1), B, T, NB, BS, Hkv, D,
        kv_dtype=q.FP8_DTYPE if kv_dtype == "fp8" else jnp.int8,
    )
    ref = paged_attention(qarr, k_cache, v_cache, meta, D ** -0.5, kv_scale=1.0)
    got = pa.paged_attention_pallas(
        qarr, k_cache, v_cache, meta.block_tables, meta.kv_lens, D ** -0.5,
        kv_scale=1.0, chunk_blocks=2,
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=2e-2, atol=2e-2)


@pytest.mark.parametrize("shape", [(8, 256, 128), (4, 512, 384)])
def test_quant_matmul_kernels_interpret(shape, monkeypatch):
    from vllm_omni_draft_tpu.ops.pallas import quant_matmul as qm
    import jax.experimental.pallas as pl

    orig_call = pl.pallas_call
    monkeypatch.setattr(
        pl, "pallas_call", lambda *a, **kw: orig_call(*a, **{**kw, "interpret": True})
    )
    B, I, O = shape
    x = jax.random.normal(jax.random.PRNGKey(0), (B, I), jnp.float32)
    w = jax.random.normal(jax.random.PRNGKey(1), (O, I), jnp.float32)

    q8 = q.quantize_int8(w)
    got8 = qm.matmul_int8_pallas(x, q8["w"], q8["s"], block_o=128)
    ref8 = x @ q.dequantize(q8, jnp.float32).T
    np.testing.assert_allclose(np.asarray(got8), np.asarray(ref8),
                               rtol=2e-3, atol=2e-3)

    q4 = q.quantize_int4(w, group_size=128)
    got4 = qm.matmul_int4_pallas(x, q4["w"], q4["s"], block_o=128)
    ref4 = x @ q.dequantize(q4, jnp.float32).T
    np.testing.assert_allclose(np.asarray(got4), np.asarray(ref4),
                               rtol=2e-3, atol=2e-3)


@pytest.mark.parametrize("valid_frac", [1.0, 0.75])
def test_argmax_matmul_kernels_interpret(valid_frac, monkeypatch):
    """Fused greedy lm_head: argmax ids match argmax over the dequantized
    logits, including exclusion of tile-padding rows (valid_o < O) and
    lowest-index tie-breaking across tiles."""
    from vllm_omni_draft_tpu.ops.pallas import quant_matmul as qm
    import jax.experimental.pallas as pl

    orig_call = pl.pallas_call
    monkeypatch.setattr(
        pl, "pallas_call", lambda *a, **kw: orig_call(*a, **{**kw, "interpret": True})
    )
    B, I, O = 8, 256, 512
    valid = int(O * valid_frac)
    x = jax.random.normal(jax.random.PRNGKey(0), (B, I), jnp.float32)
    w = jax.random.normal(jax.random.PRNGKey(1), (O, I), jnp.float32)
    if valid < O:
        # make out-of-vocab pad rows the global argmax so masking matters
        w = w.at[valid:].set(w[valid:] * 0.0 + 10.0)

    q8 = q.quantize_int8(w)
    got8 = qm.argmax_matmul_int8_pallas(x, q8["w"], q8["s"], valid, block_o=128)
    ref8 = jnp.argmax((x @ q.dequantize(q8, jnp.float32).T)[:, :valid], -1)
    np.testing.assert_array_equal(np.asarray(got8), np.asarray(ref8))

    q4 = q.quantize_int4(w, group_size=128)
    got4 = qm.argmax_matmul_int4_pallas(x, q4["w"], q4["s"], valid, block_o=128)
    ref4 = jnp.argmax((x @ q.dequantize(q4, jnp.float32).T)[:, :valid], -1)
    np.testing.assert_array_equal(np.asarray(got4), np.asarray(ref4))

    gotd = qm.argmax_matmul_dense_pallas(x, w, valid, block_o=128)
    refd = jnp.argmax((x @ w.T)[:, :valid], -1)
    np.testing.assert_array_equal(np.asarray(gotd), np.asarray(refd))


@pytest.mark.parametrize(
    "T,num_real,start,tq",
    [
        (24, 24, 0, 128),   # fresh full chunk, single tile
        (24, 19, 7, 8),     # chunked continuation + padding, multi-tile
        (40, 33, 0, 16),    # padding rows in the last tile
    ],
)
def test_paged_prefill_kernel_interpret_matches_reference(
    T, num_real, start, tq, monkeypatch
):
    from vllm_omni_draft_tpu.ops.pallas import paged_attention as pa
    import jax.experimental.pallas as pl

    orig_call = pl.pallas_call
    monkeypatch.setattr(
        pl, "pallas_call", lambda *a, **kw: orig_call(*a, **{**kw, "interpret": True})
    )
    monkeypatch.setattr(pa, "_PREFILL_TQ", tq)

    Hq, Hkv, D, BS, NB = 8, 2, 64, 8, 32
    kv_len = start + num_real
    key = jax.random.PRNGKey(T)
    qarr = jax.random.normal(key, (1, T, Hq, D), jnp.float32)
    k_cache = jax.random.normal(jax.random.PRNGKey(1), (NB, BS, Hkv, D), jnp.float32)
    v_cache = jax.random.normal(jax.random.PRNGKey(2), (NB, BS, Hkv, D), jnp.float32)
    max_blocks = NB - 1
    tables = np.zeros((1, max_blocks), np.int32)
    perm = np.random.default_rng(0).permutation(np.arange(1, NB))
    nb_used = -(-kv_len // BS)
    tables[0, :nb_used] = perm[:nb_used]
    positions = np.where(
        np.arange(T) < num_real, start + np.arange(T), -1
    ).astype(np.int32)[None, :]
    meta = AttentionMetadata(
        block_tables=jnp.asarray(tables),
        kv_lens=jnp.asarray([kv_len], jnp.int32),
        positions=jnp.asarray(positions),
        slot_mapping=jnp.full((1, T), -1, jnp.int32),
    )
    scale = D ** -0.5
    ref = paged_attention(qarr, k_cache, v_cache, meta, scale)
    out = pa.paged_prefill_pallas(
        qarr, k_cache, v_cache, meta.block_tables, meta.kv_lens[0],
        jnp.int32(num_real), scale,
    )
    np.testing.assert_allclose(
        np.asarray(out)[0, :num_real],
        np.asarray(ref)[0, :num_real],
        rtol=2e-5, atol=2e-5,
    )
    # padded query rows are exactly zero
    if num_real < T:
        assert np.all(np.asarray(out)[0, num_real:] == 0.0)


@pytest.mark.parametrize("arity", [2, 4])
@pytest.mark.parametrize("k,p", [(0, 1.0), (8, 1.0), (0, 0.9), (64, 0.95), (3, 0.5)])
def test_thresholds_kernel_matches_xla_bisection(k, p, arity, monkeypatch):
    """ops/pallas/rejection.topk_topp_thresholds_pallas must reproduce the
    XLA search's kept set EXACTLY (same math, VMEM-resident) — at both
    search arities (VOT_THRESH_ARITY: binary bisection / 4-ary quad)."""
    import jax.experimental.pallas as pl

    from vllm_omni_draft_tpu.ops import sampling
    from vllm_omni_draft_tpu.ops.pallas import rejection as rj

    orig_call = pl.pallas_call
    monkeypatch.setattr(
        pl, "pallas_call", lambda *a, **kw: orig_call(*a, **{**kw, "interpret": True})
    )

    R, V = 6, 8192
    rng = np.random.default_rng(0)
    logits = jnp.asarray(rng.normal(size=(R, V)) * 3, jnp.float32)
    top_k = jnp.full((R,), k, jnp.int32)
    top_p = jnp.full((R,), p, jnp.float32)

    old_arity = sampling.search_arity()
    sampling.set_search_arity(arity)
    try:
        ref = sampling.apply_top_k_top_p(logits, top_k, top_p)

        sampling.use_pallas_thresholds(rj.topk_topp_thresholds_pallas)
        try:
            got = sampling.apply_top_k_top_p(logits, top_k, top_p)
        finally:
            sampling.use_pallas_thresholds(None)
    finally:
        sampling.set_search_arity(old_arity)

    ref_keep = np.asarray(ref) > sampling.NEG_INF / 2
    got_keep = np.asarray(got) > sampling.NEG_INF / 2
    # identical kept sets and identical surviving logits
    np.testing.assert_array_equal(got_keep, ref_keep)
    np.testing.assert_array_equal(
        np.asarray(got)[got_keep], np.asarray(ref)[ref_keep]
    )
    # (the COMBINED kept set may be < k: top-p prunes inside the top-k
    # set — same as the XLA fallback)
    if arity == 4 and k > 0 and p == 1.0:
        # conservative ties-inclusive invariant: count >= k per row
        assert (got_keep.sum(axis=1) >= k).all()


def test_thresholds_kernel_mixed_rows(monkeypatch):
    """Heterogeneous per-row (k, p), including disabled rows, and a row
    count that does not divide the kernel's row tile."""
    import jax.experimental.pallas as pl

    from vllm_omni_draft_tpu.ops import sampling
    from vllm_omni_draft_tpu.ops.pallas import rejection as rj

    orig_call = pl.pallas_call
    monkeypatch.setattr(
        pl, "pallas_call", lambda *a, **kw: orig_call(*a, **{**kw, "interpret": True})
    )
    R, V = 11, 4096
    rng = np.random.default_rng(1)
    logits = jnp.asarray(rng.normal(size=(R, V)) * 2, jnp.float32)
    top_k = jnp.asarray(rng.choice([0, 2, 16, 100], size=R), jnp.int32)
    top_p = jnp.asarray(rng.choice([1.0, 0.3, 0.9], size=R), jnp.float32)
    ref = sampling.apply_top_k_top_p(logits, top_k, top_p)
    sampling.use_pallas_thresholds(rj.topk_topp_thresholds_pallas)
    try:
        got = sampling.apply_top_k_top_p(logits, top_k, top_p)
    finally:
        sampling.use_pallas_thresholds(None)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


@pytest.mark.parametrize("shape", [
    # (B, I, O): odd B exercises row padding; I chosen so the int4
    # guards pass (even G, group 128): I=256 -> G=2, I=512 -> G=4
    (600, 256, 384),
    (513, 512, 256),
])
def test_rowtiled_stacked_kernels_interpret(shape, monkeypatch):
    """Batched-prefill rows (BP > 256): the 2-D row-tiled grid must
    match the XLA dequant reference for int4/int8/dense stacked weights,
    including the padded tail rows (VERDICT r3 item 1)."""
    from vllm_omni_draft_tpu.ops.pallas import quant_matmul as qm
    import jax.experimental.pallas as pl

    orig_call = pl.pallas_call
    monkeypatch.setattr(
        pl, "pallas_call",
        lambda *a, **kw: orig_call(*a, **{**kw, "interpret": True}),
    )
    B, I, O = shape
    L = 3
    x = jax.random.normal(jax.random.PRNGKey(0), (B, I), jnp.float32)
    w = jax.random.normal(jax.random.PRNGKey(1), (L, O, I), jnp.float32)
    layer = jnp.int32(1)

    q8w = jnp.stack([q.quantize_int8(w[l])["w"] for l in range(L)])
    q8s = jnp.stack([q.quantize_int8(w[l])["s"] for l in range(L)])
    got8 = qm.matmul_int8_stacked_pallas(x, q8w, q8s, layer)
    ref8 = x @ q.dequantize({"w": q8w[1], "s": q8s[1]}, jnp.float32).T
    np.testing.assert_allclose(np.asarray(got8), np.asarray(ref8),
                               rtol=2e-3, atol=2e-3)

    q4w = jnp.stack([q.quantize_int4(w[l], group_size=128)["w"]
                     for l in range(L)])
    q4s = jnp.stack([q.quantize_int4(w[l], group_size=128)["s"]
                     for l in range(L)])
    got4 = qm.matmul_int4_stacked_pallas(x, q4w, q4s, layer)
    ref4 = x @ q.dequantize({"w": q4w[1], "s": q4s[1]}, jnp.float32).T
    np.testing.assert_allclose(np.asarray(got4), np.asarray(ref4),
                               rtol=2e-3, atol=2e-3)

    gotd = qm.matmul_dense_stacked_pallas(x, w, layer)
    refd = x @ w[1].T
    np.testing.assert_allclose(np.asarray(gotd), np.asarray(refd),
                               rtol=2e-3, atol=2e-3)
