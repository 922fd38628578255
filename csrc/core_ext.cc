// Native host-side runtime for the serving engine.
//
// The scheduler's per-step hot loop (block allocation, prefix-cache chain
// hashing, LRU resurrection) runs between device steps; at high request
// rates its Python cost becomes scheduler latency the TPU waits on (the
// reference inherits this loop from vLLM's C++-accelerated runtime —
// SURVEY.md §2.4 mandates native equivalents for runtime hot paths).
//
// Exposes a C ABI consumed via ctypes (no pybind11 in this image):
//   - xxh64-style chain hashing over token blocks
//   - BlockPool: free-list + refcounts + hash->block maps with an
//     intrusive LRU of free-but-cached blocks
//
// Semantics mirror vllm_omni_draft_tpu/core/kv_cache.py:BlockPool exactly;
// tests/test_native_pool.py checks behavioral parity operation-for-
// operation against the Python implementation.

#include <cstdint>
#include <cstring>
#include <unordered_map>
#include <vector>

namespace {

// ---------------------------------------------------------------------
// 64-bit mixing hash (xxh64 finalizer style) over a token block
// ---------------------------------------------------------------------

inline uint64_t mix(uint64_t h) {
  h ^= h >> 33;
  h *= 0xff51afd7ed558ccdULL;
  h ^= h >> 33;
  h *= 0xc4ceb9fe1a85ec53ULL;
  h ^= h >> 33;
  return h;
}

uint64_t chain_hash(uint64_t parent, const int32_t* tokens, int64_t n,
                    uint64_t extra) {
  uint64_t h = mix(parent ^ 0x9e3779b97f4a7c15ULL) ^ mix(extra + 0x2545F4914F6CDD1DULL);
  for (int64_t i = 0; i < n; ++i) {
    h = mix(h ^ (static_cast<uint64_t>(static_cast<uint32_t>(tokens[i])) +
                 0x165667b19e3779f9ULL + (h << 6) + (h >> 2)));
  }
  return h;
}

// ---------------------------------------------------------------------
// BlockPool
// ---------------------------------------------------------------------

struct Pool {
  int32_t num_blocks;
  std::vector<int32_t> free_list;               // plain free blocks (stack)
  std::vector<int32_t> refcount;                // per block
  std::vector<uint64_t> block_hash;             // 0 = none
  std::vector<uint8_t> has_hash;
  std::unordered_map<uint64_t, int32_t> cached_used;
  std::unordered_map<uint64_t, int32_t> cached_free;  // + LRU links below
  // intrusive doubly-linked LRU over blocks in cached_free
  std::vector<int32_t> lru_prev, lru_next;
  int32_t lru_head = -1, lru_tail = -1;  // head = oldest (evict first)

  explicit Pool(int32_t n)
      : num_blocks(n),
        refcount(n, 0),
        block_hash(n, 0),
        has_hash(n, 0),
        lru_prev(n, -1),
        lru_next(n, -1) {
    free_list.reserve(n);
    for (int32_t b = n - 1; b >= 1; --b) free_list.push_back(b);
  }

  void lru_push_back(int32_t b) {  // newest at tail
    lru_prev[b] = lru_tail;
    lru_next[b] = -1;
    if (lru_tail >= 0) lru_next[lru_tail] = b;
    lru_tail = b;
    if (lru_head < 0) lru_head = b;
  }

  void lru_remove(int32_t b) {
    if (lru_prev[b] >= 0) lru_next[lru_prev[b]] = lru_next[b];
    else lru_head = lru_next[b];
    if (lru_next[b] >= 0) lru_prev[lru_next[b]] = lru_prev[b];
    else lru_tail = lru_prev[b];
    lru_prev[b] = lru_next[b] = -1;
  }

  int64_t num_free() const {
    return static_cast<int64_t>(free_list.size()) +
           static_cast<int64_t>(cached_free.size());
  }

  // returns block id or -1 if exhausted
  int32_t alloc() {
    int32_t b;
    if (!free_list.empty()) {
      b = free_list.back();
      free_list.pop_back();
    } else if (lru_head >= 0) {
      b = lru_head;  // evict oldest cached-free
      lru_remove(b);
      cached_free.erase(block_hash[b]);
      has_hash[b] = 0;
    } else {
      return -1;
    }
    refcount[b] = 1;
    return b;
  }

  int32_t lookup_cached(uint64_t h) {
    auto it = cached_used.find(h);
    if (it != cached_used.end()) {
      refcount[it->second] += 1;
      return it->second;
    }
    auto itf = cached_free.find(h);
    if (itf != cached_free.end()) {
      int32_t b = itf->second;
      cached_free.erase(itf);
      lru_remove(b);
      refcount[b] = 1;
      cached_used[h] = b;
      return b;
    }
    return -1;
  }

  void commit_hash(int32_t b, uint64_t h) {
    block_hash[b] = h;
    has_hash[b] = 1;
    cached_used.emplace(h, b);  // setdefault: first committer wins
  }

  void release(int32_t b) {
    if (--refcount[b] > 0) return;
    if (has_hash[b]) {
      auto it = cached_used.find(block_hash[b]);
      if (it != cached_used.end() && it->second == b) {
        cached_used.erase(it);
        // move_to_end semantics: re-inserting refreshes recency
        auto itf = cached_free.find(block_hash[b]);
        if (itf != cached_free.end()) {
          lru_remove(itf->second);  // shouldn't happen (unique hash), safe
          cached_free.erase(itf);
        }
        cached_free[block_hash[b]] = b;
        lru_push_back(b);
        return;
      }
      has_hash[b] = 0;
    }
    free_list.push_back(b);
  }

  void clear_cache() {
    for (auto& [h, b] : cached_free) {
      lru_remove(b);
      has_hash[b] = 0;
      free_list.push_back(b);
    }
    cached_free.clear();
    for (auto& [h, b] : cached_used) has_hash[b] = 0;
    cached_used.clear();
  }
};

}  // namespace

extern "C" {

uint64_t vot_chain_hash(uint64_t parent, const int32_t* tokens, int64_t n,
                        uint64_t extra) {
  return chain_hash(parent, tokens, n, extra);
}

void* vot_pool_new(int32_t num_blocks) { return new Pool(num_blocks); }
void vot_pool_free(void* p) { delete static_cast<Pool*>(p); }
int64_t vot_pool_num_free(void* p) { return static_cast<Pool*>(p)->num_free(); }
int32_t vot_pool_alloc(void* p) { return static_cast<Pool*>(p)->alloc(); }
int32_t vot_pool_lookup_cached(void* p, uint64_t h) {
  return static_cast<Pool*>(p)->lookup_cached(h);
}
void vot_pool_commit_hash(void* p, int32_t b, uint64_t h) {
  static_cast<Pool*>(p)->commit_hash(b, h);
}
void vot_pool_release(void* p, int32_t b) { static_cast<Pool*>(p)->release(b); }
void vot_pool_clear_cache(void* p) { static_cast<Pool*>(p)->clear_cache(); }
int32_t vot_pool_refcount(void* p, int32_t b) {
  return static_cast<Pool*>(p)->refcount[b];
}

}  // extern "C"
