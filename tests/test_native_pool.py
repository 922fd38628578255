"""Behavioral parity of the native C++ block pool (csrc/core_ext.cc)
against the pure-Python reference implementation, operation-for-operation
under randomized workloads."""

import numpy as np
import pytest

from vllm_omni_draft_tpu.core import native
from vllm_omni_draft_tpu.core.kv_cache import BlockPool

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native toolchain unavailable"
)


def test_native_builds_and_hash_is_stable():
    h1 = native.chain_hash(0, [1, 2, 3], 0)
    h2 = native.chain_hash(0, [1, 2, 3], 0)
    assert h1 == h2
    assert native.chain_hash(0, [1, 2, 4], 0) != h1
    assert native.chain_hash(1, [1, 2, 3], 0) != h1
    assert native.chain_hash(0, [1, 2, 3], 7) != h1


def test_alloc_release_parity_randomized():
    rng = np.random.default_rng(0)
    N = 32
    py = BlockPool(N)
    nat = native.NativeBlockPool(N)
    held_py: list[int] = []
    held_nat: list[int] = []

    for step in range(2000):
        op = rng.random()
        assert py.num_free == nat.num_free, step
        if op < 0.5 and py.num_free > 0:
            held_py.append(py.alloc())
            held_nat.append(nat.alloc())
        elif held_py:
            i = rng.integers(len(held_py))
            py.release(held_py.pop(i))
            nat.release(held_nat.pop(i))
    assert py.num_free == nat.num_free


def test_cached_lookup_and_lru_eviction_parity():
    rng = np.random.default_rng(1)
    N = 16
    py = BlockPool(N)
    nat = native.NativeBlockPool(N)

    # fill, commit hashes, free all -> everything cached-free
    ids_py = [py.alloc() for _ in range(N - 1)]
    ids_nat = [nat.alloc() for _ in range(N - 1)]
    for i, (a, b) in enumerate(zip(ids_py, ids_nat)):
        py.commit_hash(a, 1000 + i)
        nat.commit_hash(b, 1000 + i)
    for a, b in zip(ids_py, ids_nat):
        py.release(a)
        nat.release(b)
    assert py.num_free == nat.num_free == N - 1

    # resurrect a few by hash
    for h in (1003, 1007, 1011):
        a = py.lookup_cached(h)
        b = nat.lookup_cached(h)
        assert (a is None) == (b is None)
    # miss
    assert py.lookup_cached(9999) is None and nat.lookup_cached(9999) is None

    # exhaust the pool: both must evict cached-free blocks (LRU) and agree
    got_py, got_nat = [], []
    while py.num_free:
        got_py.append(py.alloc())
        got_nat.append(nat.alloc())
    assert py.num_free == nat.num_free == 0
    # previously evicted hashes must now miss in both
    for h in range(1000, 1000 + N - 1):
        assert (py.lookup_cached(h) is None) == (nat.lookup_cached(h) is None)


def test_shared_block_refcounts():
    nat = native.NativeBlockPool(8)
    b = nat.alloc()
    nat.commit_hash(b, 42)
    b2 = nat.lookup_cached(42)
    assert b2 == b
    assert nat.refcount_of(b) == 2
    nat.release(b)
    assert nat.refcount_of(b) == 1
    nat.release(b)
    # now free-but-cached: resurrectable
    assert nat.lookup_cached(42) == b


def test_clear_cache():
    nat = native.NativeBlockPool(8)
    b = nat.alloc()
    nat.commit_hash(b, 7)
    nat.release(b)
    assert nat.lookup_cached(7) == b
    nat.release(b)
    nat.clear_cache()
    assert nat.lookup_cached(7) is None
    assert nat.num_free == 7


def test_engine_runs_on_native_pool():
    """KVCacheManager auto-selects the native pool; a full engine run must
    behave identically to the Python pool."""
    from vllm_omni_draft_tpu.config import (
        CacheConfig,
        EngineConfig,
        ModelConfig,
        SchedulerConfig,
    )
    from vllm_omni_draft_tpu.core.request import SamplingParams
    from vllm_omni_draft_tpu.engine.llm import LLM

    def run(use_native):
        import vllm_omni_draft_tpu.core.kv_cache as kvmod

        cfg = EngineConfig(
            model=ModelConfig.tiny(vocab_size=258, max_model_len=128),
            cache=CacheConfig(block_size=4, num_blocks=32),
            scheduler=SchedulerConfig(max_num_seqs=2, max_num_batched_tokens=64,
                                      prefill_buckets=(16, 64)),
        )
        llm = LLM(cfg)
        # force pool choice
        llm.engine.scheduler.kv = kvmod.KVCacheManager(
            32, 4, True, use_native=use_native
        )
        outs = llm.generate([[1, 2, 3, 4, 5]] * 2,
                            SamplingParams(max_tokens=8, temperature=0.0,
                                           ignore_eos=True))
        return [o.outputs[0].token_ids for o in outs]

    assert run(True) == run(False)
