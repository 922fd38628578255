"""Lossless rejection sampling: exactness for greedy, distribution match
for sampled verify (BASELINE.json gate: output distribution exactly lossless
vs target-only decode)."""

import jax
import jax.numpy as jnp
import numpy as np

from vllm_omni_draft_tpu.ops.rejection import rejection_sample


def _one_hot(idx, V):
    p = np.zeros(V, np.float32)
    p[idx] = 1.0
    return p


def test_greedy_all_accept():
    V, K = 8, 3
    # target argmaxes are [2, 5, 1]; bonus position argmax 7
    p = np.stack([_one_hot(i, V) for i in [2, 5, 1, 7]])[None]  # [1, K+1, V]
    q = np.stack([_one_hot(i, V) for i in [2, 5, 1]])[None]
    draft = jnp.asarray([[2, 5, 1]], jnp.int32)
    out, n = rejection_sample(draft, jnp.asarray(q), jnp.asarray(p), jax.random.PRNGKey(0))
    assert int(n[0]) == K + 1
    np.testing.assert_array_equal(np.asarray(out[0]), [2, 5, 1, 7])


def test_greedy_first_mismatch_rejects_with_argmax_recovery():
    V, K = 8, 3
    p = np.stack([_one_hot(i, V) for i in [2, 5, 1, 7]])[None]
    q = np.stack([_one_hot(i, V) for i in [2, 4, 1]])[None]  # draft wrong at pos 1
    draft = jnp.asarray([[2, 4, 1]], jnp.int32)
    out, n = rejection_sample(draft, jnp.asarray(q), jnp.asarray(p), jax.random.PRNGKey(0))
    assert int(n[0]) == 2  # accepted [2], recovery token
    np.testing.assert_array_equal(np.asarray(out[0]), [2, 5, -1, -1])


def test_output_distribution_is_target_distribution():
    """First emitted token's distribution must equal p_0 exactly, whatever
    the draft proposes — the core losslessness property."""
    V, K, N = 4, 1, 30000
    rng = np.random.default_rng(0)
    p0 = np.array([0.1, 0.2, 0.3, 0.4], np.float32)
    q0 = np.array([0.4, 0.3, 0.2, 0.1], np.float32)  # deliberately mismatched
    p = np.stack([p0, np.ones(V) / V])[None]  # [1, 2, V]
    q = q0[None, None]  # [1, 1, V]

    counts = np.zeros(V)
    base_key = jax.random.PRNGKey(42)
    # vectorize the trial over the batch dimension for speed
    B = 500
    draft_keys = jax.random.split(jax.random.PRNGKey(7), N // B)
    pB = jnp.asarray(np.repeat(p, B, axis=0))
    qB = jnp.asarray(np.repeat(q, B, axis=0))

    sample_fn = jax.jit(rejection_sample)
    for i in range(N // B):
        dk, rk = jax.random.split(draft_keys[i])
        # draft proposes from q
        drafts = jax.random.categorical(
            dk, jnp.log(qB[:, 0, :]), axis=-1
        )[:, None].astype(jnp.int32)
        out, n = sample_fn(drafts, qB, pB, rk)
        first = np.asarray(out[:, 0])
        for v in range(V):
            counts[v] += int((first == v).sum())

    freq = counts / N
    np.testing.assert_allclose(freq, p0, atol=0.015)


def test_acceptance_rate_is_one_when_q_equals_p():
    V, K, B = 16, 4, 64
    rng = np.random.default_rng(1)
    dist = rng.dirichlet(np.ones(V), size=(B, K + 1)).astype(np.float32)
    p = jnp.asarray(dist)
    q = p[:, :K, :]
    key = jax.random.PRNGKey(3)
    drafts = jax.vmap(
        lambda k, row: jax.random.categorical(k, jnp.log(row), axis=-1),
        in_axes=(0, 0),
    )(jax.random.split(key, B), q).astype(jnp.int32)
    out, n = rejection_sample(drafts, q, p, jax.random.PRNGKey(11))
    # p == q => every draft token accepted
    assert int(jnp.min(n)) == K + 1


def test_emitted_prefix_matches_draft_prefix():
    V, K, B = 8, 3, 32
    rng = np.random.default_rng(2)
    p = jnp.asarray(rng.dirichlet(np.ones(V), size=(B, K + 1)).astype(np.float32))
    q = jnp.asarray(rng.dirichlet(np.ones(V), size=(B, K)).astype(np.float32))
    drafts = jnp.asarray(rng.integers(0, V, size=(B, K)), jnp.int32)
    out, n = rejection_sample(drafts, q, p, jax.random.PRNGKey(0))
    out_np, n_np = np.asarray(out), np.asarray(n)
    for b in range(B):
        k = n_np[b] - 1  # accepted count
        np.testing.assert_array_equal(out_np[b, :k], np.asarray(drafts)[b, :k])
        assert (out_np[b, n_np[b]:] == -1).all()
        assert 0 <= out_np[b, k] < V


def test_pruned_q_vocab_matches_padded_q():
    """q over a pruned vocab prefix (Vq < V) must behave exactly like the
    same q zero-padded to the full vocab — tokens, counts, and the
    resampled final token (same key => same draws)."""
    V, Vq, K, B = 32, 8, 4, 48
    rng = np.random.default_rng(7)
    p = jnp.asarray(rng.dirichlet(np.ones(V), size=(B, K + 1)).astype(np.float32))
    q_pruned = jnp.asarray(
        rng.dirichlet(np.ones(Vq), size=(B, K)).astype(np.float32)
    )
    q_padded = jnp.pad(q_pruned, ((0, 0), (0, 0), (0, V - Vq)))
    # proposals always come from the pruned prefix
    drafts = jnp.asarray(rng.integers(0, Vq, size=(B, K)), jnp.int32)
    key = jax.random.PRNGKey(123)
    out_a, n_a = rejection_sample(drafts, q_pruned, p, key)
    out_b, n_b = rejection_sample(drafts, q_padded, p, key)
    np.testing.assert_array_equal(np.asarray(out_a), np.asarray(out_b))
    np.testing.assert_array_equal(np.asarray(n_a), np.asarray(n_b))


def test_sparse_matches_dense_rejection():
    """rejection_sample_sparse (gather-based, logits-in) must make the
    SAME accept decisions and emit the same tokens as compute_probs +
    rejection_sample for identical keys, across sampled and greedy rows
    (round-3: the sampled-verify path no longer materializes the
    [B, K+1, V] f32 probs tensor)."""
    from vllm_omni_draft_tpu.ops.rejection import rejection_sample_sparse
    from vllm_omni_draft_tpu.ops.sampling import compute_probs

    B, K, V, Vq = 6, 3, 2048, 512
    rng = jax.random.PRNGKey(7)
    k1, k2, k3 = jax.random.split(rng, 3)
    target_logits = jax.random.normal(k1, (B, K + 1, V), jnp.float32) * 3.0
    # draft distributions over the pruned vocab (rows sum to 1)
    q_logits = jax.random.normal(k2, (B, K, Vq), jnp.float32) * 2.0
    q_probs = jax.nn.softmax(q_logits, axis=-1)
    draft = jax.random.randint(k3, (B, K), 0, Vq, jnp.int32)

    temps = jnp.asarray([0.0, 0.7, 1.0, 0.0, 1.3, 0.5])  # greedy rows mixed in
    top_ks = jnp.asarray([0, 64, 0, 50, 100, 0], jnp.int32)
    top_ps = jnp.asarray([1.0, 0.95, 0.9, 1.0, 0.8, 1.0])

    for seed in range(4):
        key = jax.random.PRNGKey(100 + seed)
        p_probs = compute_probs(
            target_logits.reshape(B * (K + 1), V),
            jnp.repeat(temps, K + 1),
            jnp.repeat(top_ks, K + 1),
            jnp.repeat(top_ps, K + 1),
        ).reshape(B, K + 1, V)
        out_d, n_d = rejection_sample(draft, q_probs, p_probs, key)
        out_s, n_s = rejection_sample_sparse(
            draft, q_probs, target_logits, temps, top_ks, top_ps, key
        )
        np.testing.assert_array_equal(np.asarray(n_d), np.asarray(n_s))
        np.testing.assert_array_equal(np.asarray(out_d), np.asarray(out_s))


def test_sparse_greedy_rows_deterministic():
    """Greedy rows through the sparse path must be pure argmax logic —
    key-independent."""
    from vllm_omni_draft_tpu.ops.rejection import rejection_sample_sparse

    B, K, V = 2, 2, 512
    tl = jax.random.normal(jax.random.PRNGKey(0), (B, K + 1, V))
    am = np.asarray(jnp.argmax(tl, axis=-1))
    draft = jnp.asarray([[int(am[0, 0]), int(am[0, 1])],
                         [int(am[1, 0]) + 1, 0]], jnp.int32)
    q = jnp.full((B, K, V), 1.0 / V)
    temps = jnp.zeros((B,))
    tk = jnp.zeros((B,), jnp.int32)
    tp = jnp.ones((B,))
    outs = [
        rejection_sample_sparse(draft, q, tl, temps, tk, tp,
                                jax.random.PRNGKey(s))
        for s in range(3)
    ]
    for out, n in outs[1:]:
        np.testing.assert_array_equal(np.asarray(out), np.asarray(outs[0][0]))
    out0, n0 = outs[0]
    # row 0: all accepted + bonus argmax; row 1: first token wrong
    assert int(n0[0]) == K + 1 and int(n0[1]) == 1
    np.testing.assert_array_equal(
        np.asarray(out0[0]), [am[0, 0], am[0, 1], am[0, 2]]
    )
    assert int(out0[1, 0]) == am[1, 0]
