"""Block-table KV-cache manager with prefix caching.

Host-side accounting for the paged device cache (the device arrays live in
the runner; this class hands out block ids). Rebuilds the reference's KV
subsystem (`src/doc/VLLM_V1_Interface.md:57-64` init protocol;
prefix caching `:79-80`; `num_cached_tokens` surfacing
`src/doc/engine_core.md:273-274`) in a TPU-native form: a static block
pool carved out of HBM at init, block 0 reserved as the null block that
padding writes land in.

Prefix caching: each full block of a request's token ids gets a chain hash
h_i = H(h_{i-1}, tokens_i). Freed blocks keep their hash and linger in an
LRU; a new request whose prompt hashes match resurrects them and skips
recompute (the hit count is surfaced per request).
"""

from __future__ import annotations

from collections import OrderedDict
from dataclasses import dataclass, field

from vllm_omni_draft_tpu.core.request import Request

NULL_BLOCK = 0



def _mm_cache_key(mm_inputs):
    """Namespace prefix hashes by multimodal content. Prefer an explicit
    content key (processors set "cache_key"); fall back to object identity
    (conservative: same-object only — id() reuse after gc could otherwise
    alias different images)."""
    if mm_inputs is None:
        return None
    if isinstance(mm_inputs, dict) and "cache_key" in mm_inputs:
        return mm_inputs["cache_key"]
    return ("mmid", id(mm_inputs))


def hash_block(parent_hash: int, token_ids: tuple[int, ...], extra=None) -> int:
    """Chain hash for one block of tokens. `extra` namespaces the cache
    (e.g. multimodal content hash) so different modalities never collide."""
    return hash((parent_hash, token_ids, extra))


@dataclass
class BlockPool:
    """Free-list allocator over block ids [1, num_blocks); block 0 is null.

    Freed blocks that still carry a prefix hash go to `cached_free` (an LRU
    keyed by hash) and can be resurrected until reallocated.
    """

    num_blocks: int
    free: list[int] = field(init=False)
    # block_id -> chain hash (only while the block holds cached content)
    block_hash: dict[int, int] = field(init=False, default_factory=dict)
    # chain hash -> block_id, for free-but-cached blocks, LRU order
    cached_free: OrderedDict = field(init=False, default_factory=OrderedDict)
    # chain hash -> block_id for *in-use* cached blocks
    cached_used: dict[int, int] = field(init=False, default_factory=dict)
    refcount: dict[int, int] = field(init=False, default_factory=dict)

    def __post_init__(self):
        self.free = list(range(self.num_blocks - 1, 0, -1))  # pop() -> low ids

    @property
    def num_free(self) -> int:
        return len(self.free) + len(self.cached_free)

    def alloc(self) -> int:
        """Allocate a fresh (uncached) block, evicting the LRU cached-free
        block if the plain free list is empty."""
        if self.free:
            bid = self.free.pop()
        elif self.cached_free:
            h, bid = self.cached_free.popitem(last=False)  # LRU evict
            self.block_hash.pop(bid, None)
        else:
            raise MemoryError("KV block pool exhausted")
        self.refcount[bid] = 1
        return bid

    def lookup_cached(self, h: int) -> int | None:
        """Find a block holding content with chain hash `h`; bump refcount."""
        bid = self.cached_used.get(h)
        if bid is not None:
            self.refcount[bid] += 1
            return bid
        bid = self.cached_free.pop(h, None)
        if bid is not None:
            self.refcount[bid] = 1
            self.cached_used[h] = bid
            return bid
        return None

    def commit_hash(self, bid: int, h: int) -> None:
        """Mark a full block as holding cacheable content `h`."""
        self.block_hash[bid] = h
        self.cached_used.setdefault(h, bid)

    def release(self, bid: int) -> None:
        self.refcount[bid] -= 1
        if self.refcount[bid] > 0:
            return
        del self.refcount[bid]
        h = self.block_hash.get(bid)
        if h is not None and self.cached_used.get(h) == bid:
            del self.cached_used[h]
            self.cached_free[h] = bid
            self.cached_free.move_to_end(h)
        else:
            self.block_hash.pop(bid, None)
            self.free.append(bid)

    def clear_cache(self) -> None:
        """Drop all prefix-cache state (utility op: cache reset)."""
        for h, bid in self.cached_free.items():
            self.block_hash.pop(bid, None)
            self.free.append(bid)
        self.cached_free.clear()
        for h, bid in list(self.cached_used.items()):
            self.block_hash.pop(bid, None)
        self.cached_used.clear()


class KVCacheManager:
    """Per-request block-table accounting on top of BlockPool."""

    def __init__(
        self,
        num_blocks: int,
        block_size: int,
        enable_prefix_caching: bool = True,
        use_native: bool | None = None,
    ):
        self.block_size = block_size
        self.enable_prefix_caching = enable_prefix_caching
        # native C++ pool + xxh64 chain hashing when the toolchain built it
        # (csrc/core_ext.cc); pure-Python otherwise — identical semantics,
        # parity-tested in tests/test_native_pool.py
        from vllm_omni_draft_tpu.core import native

        if use_native is None:
            use_native = native.available()
        if use_native:
            self.pool = native.NativeBlockPool(num_blocks)
            self._hash = lambda parent, toks, extra: native.chain_hash(
                parent, toks, 0 if extra is None else (hash(extra) & (2**64 - 1))
            )
        else:
            self.pool = BlockPool(num_blocks)
            self._hash = hash_block
        # request_id -> list of chain hashes committed so far
        self._req_hashes: dict[str, list[int]] = {}

    @property
    def num_free_blocks(self) -> int:
        return self.pool.num_free

    def get_computed_blocks(
        self, request: Request, target_tokens: int | None = None
    ) -> tuple[list[int], int]:
        """Prefix-cache lookup for a WAITING request. Returns
        (cached_block_ids, num_cached_tokens). Only whole blocks hit, and
        at least one token is always left to recompute (to produce logits).
        For preempted-resumed requests `target_tokens` spans generated
        tokens too, so their committed blocks are also reusable."""
        if not self.enable_prefix_caching:
            return [], 0
        bs = self.block_size
        prompt = request.all_token_ids
        if target_tokens is None:
            target_tokens = len(request.prompt_token_ids)
        mm_key = _mm_cache_key(request.mm_inputs)
        # last block is excluded so at least one token is computed
        max_full = (target_tokens - 1) // bs
        blocks: list[int] = []
        hashes: list[int] = []
        h = 0
        for i in range(max_full):
            h = self._hash(h, tuple(prompt[i * bs : (i + 1) * bs]), mm_key)
            bid = self.pool.lookup_cached(h)
            if bid is None:
                break
            blocks.append(bid)
            hashes.append(h)
        self._req_hashes[request.request_id] = hashes
        return blocks, len(blocks) * bs

    def release_blocks(self, block_ids) -> None:
        """Undo a get_computed_blocks adoption that won't be used (e.g.
        allocation failed and the request stays waiting)."""
        for bid in reversed(list(block_ids)):
            self.pool.release(bid)

    def allocate_slots(
        self,
        request: Request,
        num_new_tokens: int,
        new_computed_blocks=(),
        num_computed: int | None = None,
    ) -> list[int] | None:
        """Ensure the request owns enough blocks for
        num_computed + num_new_tokens. Returns the list of newly
        allocated block ids, or None if the pool can't satisfy it (caller
        preempts). `new_computed_blocks` are prefix-cache hits being
        adopted on first schedule; `num_computed` overrides the request's
        counter (which callers must only update after success)."""
        base = (
            num_computed if num_computed is not None else request.num_computed_tokens
        )
        total = base + num_new_tokens
        needed = -(-total // self.block_size)  # ceil
        have = len(request.block_ids) + len(new_computed_blocks)
        n_alloc = needed - have
        if n_alloc > self.pool.num_free:
            return None
        if new_computed_blocks:
            request.block_ids.extend(new_computed_blocks)
        new_blocks = [self.pool.alloc() for _ in range(n_alloc)]
        request.block_ids.extend(new_blocks)
        return new_blocks

    def commit_prefix_hashes(self, request: Request) -> None:
        """After a step, commit chain hashes for any newly *completed* full
        blocks of the request (prompt and generated tokens alike) so future
        requests can hit them."""
        if not self.enable_prefix_caching:
            return
        bs = self.block_size
        hashes = self._req_hashes.setdefault(request.request_id, [])
        tokens = request.all_token_ids
        mm_key = _mm_cache_key(request.mm_inputs)
        n_full = request.num_computed_tokens // bs
        h = hashes[-1] if hashes else 0
        for i in range(len(hashes), n_full):
            h = self._hash(h, tuple(tokens[i * bs : (i + 1) * bs]), mm_key)
            hashes.append(h)
            self.pool.commit_hash(request.block_ids[i], h)

    def free(self, request: Request) -> None:
        """Release all blocks (finish or preemption). Cached blocks linger
        in the LRU for future prefix hits."""
        for bid in reversed(request.block_ids):
            self.pool.release(bid)
        request.block_ids.clear()
        self._req_hashes.pop(request.request_id, None)


def compute_num_blocks(
    hbm_bytes_free: int,
    block_size: int,
    num_layers: int,
    num_kv_heads: int,
    head_dim: int,
    kv_bytes: int,
    utilization: float = 0.9,
) -> int:
    """The TPU analog of determine_available_memory -> num_gpu_blocks
    (reference: `src/doc/VLLM_V1_Interface.md:57-64`): carve the block pool
    out of measured free HBM."""
    per_block = 2 * num_layers * block_size * num_kv_heads * head_dim * kv_bytes
    return max(int(hbm_bytes_free * utilization) // per_block, 1)
