// Native runtime components for cubecl-tpu, bound via ctypes.
//
// The reference implements these in Rust inside cubecl-runtime /
// cubecl-common; on the TPU build they are the host-side hot paths that
// stay native while jax/XLA owns device execution:
//
//  - xxh64: stable 64-bit hashing for kernel ids and persistent cache keys
//    (reference cubecl-common/src/hash.rs).
//  - divmod_magic: magic-number computation for FastDivmod index math
//    (reference cubecl-std/src/fast_math.rs:13-43).
//  - page_pool_*: the serving-side KV block manager (vLLM-style) behind
//    ops/paged_attention — free-list page allocation, per-sequence page
//    lists, ref-counted fork (beam search shares full pages), and block
//    table assembly in the kernel's repeat-last-page padding convention.
//    The reference's analogous bookkeeping is its memory-pool offset
//    management (cubecl-runtime/src/memory_management/memory_pool/).
//
// Build: g++ -O2 -shared -fPIC -std=c++17 native.cc -o libcubecl_native.so
// (done lazily by cubecl_tpu/utils/native.py).

#include <cstdint>
#include <cstddef>
#include <mutex>
#include <unordered_map>
#include <vector>

extern "C" {

// --------------------------------------------------------------------------
// xxh64 (XXH64 algorithm, public domain reference implementation style)
// --------------------------------------------------------------------------

static const uint64_t P1 = 11400714785074694791ULL;
static const uint64_t P2 = 14029467366897019727ULL;
static const uint64_t P3 = 1609587929392839161ULL;
static const uint64_t P4 = 9650029242287828579ULL;
static const uint64_t P5 = 2870177450012600261ULL;

static inline uint64_t rotl(uint64_t x, int r) {
  return (x << r) | (x >> (64 - r));
}

static inline uint64_t read64(const uint8_t* p) {
  uint64_t v;
  __builtin_memcpy(&v, p, 8);
  return v;
}

static inline uint32_t read32(const uint8_t* p) {
  uint32_t v;
  __builtin_memcpy(&v, p, 4);
  return v;
}

uint64_t xxh64(const char* data, size_t len, uint64_t seed) {
  const uint8_t* p = reinterpret_cast<const uint8_t*>(data);
  const uint8_t* end = p + len;
  uint64_t h;
  if (len >= 32) {
    uint64_t v1 = seed + P1 + P2, v2 = seed + P2, v3 = seed, v4 = seed - P1;
    const uint8_t* limit = end - 32;
    do {
      v1 = rotl(v1 + read64(p) * P2, 31) * P1; p += 8;
      v2 = rotl(v2 + read64(p) * P2, 31) * P1; p += 8;
      v3 = rotl(v3 + read64(p) * P2, 31) * P1; p += 8;
      v4 = rotl(v4 + read64(p) * P2, 31) * P1; p += 8;
    } while (p <= limit);
    h = rotl(v1, 1) + rotl(v2, 7) + rotl(v3, 12) + rotl(v4, 18);
    for (uint64_t* v : {&v1, &v2, &v3, &v4}) {
      h ^= rotl(*v * P2, 31) * P1;
      h = h * P1 + P4;
    }
  } else {
    h = seed + P5;
  }
  h += (uint64_t)len;
  while (p + 8 <= end) {
    h ^= rotl(read64(p) * P2, 31) * P1;
    h = rotl(h, 27) * P1 + P4;
    p += 8;
  }
  if (p + 4 <= end) {
    h ^= (uint64_t)read32(p) * P1;
    h = rotl(h, 23) * P2 + P3;
    p += 4;
  }
  while (p < end) {
    h ^= (*p) * P5;
    h = rotl(h, 11) * P1;
    ++p;
  }
  h ^= h >> 33; h *= P2; h ^= h >> 29; h *= P3; h ^= h >> 32;
  return h;
}

// --------------------------------------------------------------------------
// FastDivmod magic numbers: returns (multiplier << 8) | shift packed, for
// unsigned 32-bit division by a constant (round-up method).
// --------------------------------------------------------------------------

uint64_t divmod_magic(uint32_t divisor) {
  if (divisor == 0) return 0;
  if ((divisor & (divisor - 1)) == 0) {
    // power of two: shift only, multiplier 1
    uint32_t shift = 0;
    while ((1u << shift) < divisor) ++shift;
    return ((uint64_t)1 << 8) | shift | (1ULL << 63);  // top bit: pow2 flag
  }
  uint32_t shift = 0;
  while ((1ULL << shift) < divisor) ++shift;
  shift += 31;
  uint64_t magic = ((1ULL << shift) + divisor - 1) / divisor;
  return (magic << 8) | (shift - 32);
}

// --------------------------------------------------------------------------
// Page pool: the KV block manager for paged serving.
//
// Pages are identified by int32 ids into the device-side page pool
// arrays (ops/paged_attention's k_pages/v_pages). Full pages are
// ref-counted so fork() (beam search / parallel sampling) shares them;
// the device KV content of shared pages is immutable by construction
// (append only writes NEWLY allocated pages). All calls are serialized
// by one mutex — the serving loop drives this from a single device
// actor thread; correctness, not contention, is the design point.
// --------------------------------------------------------------------------

namespace {

struct PagePool {
  std::vector<int32_t> free_list;            // stack of free page ids
  std::vector<int32_t> refcount;             // per page
  std::unordered_map<int64_t, std::vector<int32_t>> seqs;
  // automatic prefix caching: full pages registered under a chain
  // hash survive release on an evictable FIFO until pool pressure
  // reclaims them (vLLM's prefix cache)
  std::vector<uint64_t> page_hash;           // 0 = unregistered
  std::unordered_map<uint64_t, int32_t> prefix_map;
  std::vector<int32_t> evictable;            // refcount-0 cached pages
  bool alive = false;
};

// pop a free page, evicting the oldest cached page if needed;
// returns -1 when truly exhausted. Caller holds the lock.
int32_t take_page(PagePool* p) {
  if (!p->free_list.empty()) {
    int32_t pg = p->free_list.back();
    p->free_list.pop_back();
    return pg;
  }
  if (!p->evictable.empty()) {
    int32_t pg = p->evictable.front();
    p->evictable.erase(p->evictable.begin());
    p->prefix_map.erase(p->page_hash[pg]);
    p->page_hash[pg] = 0;
    return pg;
  }
  return -1;
}

std::mutex g_pool_mu;
std::vector<PagePool> g_pools;

PagePool* pool_of(int64_t h) {
  if (h < 0 || (size_t)h >= g_pools.size() || !g_pools[(size_t)h].alive)
    return nullptr;
  return &g_pools[(size_t)h];
}

}  // namespace

int64_t page_pool_create(int32_t num_pages) {
  if (num_pages <= 0) return -1;
  std::lock_guard<std::mutex> lk(g_pool_mu);
  PagePool p;
  p.alive = true;
  p.refcount.assign(num_pages, 0);
  p.page_hash.assign(num_pages, 0);
  p.free_list.reserve(num_pages);
  for (int32_t i = num_pages - 1; i >= 0; --i) p.free_list.push_back(i);
  for (size_t i = 0; i < g_pools.size(); ++i)
    if (!g_pools[i].alive) { g_pools[i] = std::move(p); return (int64_t)i; }
  g_pools.push_back(std::move(p));
  return (int64_t)g_pools.size() - 1;
}

int32_t page_pool_destroy(int64_t h) {
  std::lock_guard<std::mutex> lk(g_pool_mu);
  PagePool* p = pool_of(h);
  if (!p) return -1;
  p->alive = false;
  p->free_list.clear();
  p->refcount.clear();
  p->seqs.clear();
  p->page_hash.clear();
  p->prefix_map.clear();
  p->evictable.clear();
  return 0;
}

int32_t page_pool_num_free(int64_t h) {
  // free + reclaimable (cached pages evict on demand)
  std::lock_guard<std::mutex> lk(g_pool_mu);
  PagePool* p = pool_of(h);
  if (!p) return -1;
  return (int32_t)(p->free_list.size() + p->evictable.size());
}

int32_t page_pool_seq_pages(int64_t h, int64_t seq) {
  std::lock_guard<std::mutex> lk(g_pool_mu);
  PagePool* p = pool_of(h);
  if (!p) return -1;
  auto it = p->seqs.find(seq);
  return it == p->seqs.end() ? -1 : (int32_t)it->second.size();
}

// allocate n fresh pages for a NEW sequence; all-or-nothing.
int32_t page_pool_alloc_seq(int64_t h, int64_t seq, int32_t n) {
  std::lock_guard<std::mutex> lk(g_pool_mu);
  PagePool* p = pool_of(h);
  if (!p || n < 0) return -1;
  if (p->seqs.count(seq)) return -2;                 // already exists
  if ((int32_t)(p->free_list.size() + p->evictable.size()) < n)
    return -3;                                       // no space
  auto& v = p->seqs[seq];
  v.reserve(n);
  for (int32_t i = 0; i < n; ++i) {
    int32_t pg = take_page(p);
    p->refcount[pg] = 1;
    v.push_back(pg);
  }
  return 0;
}

// grow a sequence by one page; returns the new page id or <0.
int32_t page_pool_append(int64_t h, int64_t seq) {
  std::lock_guard<std::mutex> lk(g_pool_mu);
  PagePool* p = pool_of(h);
  if (!p) return -1;
  auto it = p->seqs.find(seq);
  if (it == p->seqs.end()) return -2;
  int32_t pg = take_page(p);
  if (pg < 0) return -3;
  p->refcount[pg] = 1;
  it->second.push_back(pg);
  return pg;
}

// fork: dst shares all of src's pages (refcount++). The caller must
// treat shared pages as read-only on device; the next append gives the
// fork its own fresh page to write (copy-on-write at page granularity,
// with the partial-page copy the caller's device-side job).
int32_t page_pool_fork(int64_t h, int64_t src, int64_t dst) {
  std::lock_guard<std::mutex> lk(g_pool_mu);
  PagePool* p = pool_of(h);
  if (!p) return -1;
  auto it = p->seqs.find(src);
  if (it == p->seqs.end()) return -2;
  if (p->seqs.count(dst)) return -2;
  for (int32_t pg : it->second) p->refcount[pg]++;
  p->seqs[dst] = it->second;
  return 0;
}

// release a sequence; pages return to the free list when their
// refcount hits zero. Returns the number of pages actually freed.
int32_t page_pool_free_seq(int64_t h, int64_t seq) {
  std::lock_guard<std::mutex> lk(g_pool_mu);
  PagePool* p = pool_of(h);
  if (!p) return -1;
  auto it = p->seqs.find(seq);
  if (it == p->seqs.end()) return -2;
  int32_t freed = 0;
  for (int32_t pg : it->second) {
    if (--p->refcount[pg] == 0) {
      if (p->page_hash[pg]) {
        p->evictable.push_back(pg);      // retained for prefix reuse
      } else {
        p->free_list.push_back(pg);
      }
      ++freed;
    }
  }
  p->seqs.erase(it);
  return freed;
}

// assemble the (n_seqs, max_pages) int32 block table for
// ops/paged_attention: rows padded by REPEATING the last page id (the
// kernel's clamped index_map skips the re-DMA of repeated indices).
// Returns 0, or -2 if any sequence is unknown / exceeds max_pages.
int32_t page_pool_fill_table(int64_t h, const int64_t* seq_ids,
                             int32_t n_seqs, int32_t* out,
                             int32_t max_pages) {
  std::lock_guard<std::mutex> lk(g_pool_mu);
  PagePool* p = pool_of(h);
  if (!p) return -1;
  for (int32_t i = 0; i < n_seqs; ++i) {
    auto it = p->seqs.find(seq_ids[i]);
    if (it == p->seqs.end()) return -2;
    const auto& v = it->second;
    if ((int32_t)v.size() > max_pages || v.empty()) return -2;
    int32_t* row = out + (size_t)i * max_pages;
    for (size_t j = 0; j < v.size(); ++j) row[j] = v[j];
    for (int32_t j = (int32_t)v.size(); j < max_pages; ++j)
      row[j] = v.back();
  }
  return 0;
}

// copy-on-write completion for mid-page forks: if seq's LAST page is
// shared (refcount > 1), swap it for a fresh private page and return
// (old_page << 32) | new_page so the caller can device-copy the
// partial content. Returns -4 if the last page is already private
// (nothing to do), -3 if no free page.
int64_t page_pool_unshare_last(int64_t h, int64_t seq) {
  std::lock_guard<std::mutex> lk(g_pool_mu);
  PagePool* p = pool_of(h);
  if (!p) return -1;
  auto it = p->seqs.find(seq);
  if (it == p->seqs.end() || it->second.empty()) return -2;
  int32_t pg = it->second.back();
  if (p->refcount[pg] <= 1) return -4;
  int32_t np = take_page(p);
  if (np < 0) return -3;
  p->refcount[np] = 1;
  p->refcount[pg]--;
  it->second.back() = np;
  return ((int64_t)(uint32_t)pg << 32) | (uint32_t)np;
}

// register chain hashes for seq's first n (FULL, immutable) pages so
// later requests with the same prefix reuse them. First registration
// wins; a page already carrying a different hash is skipped.
int32_t page_pool_register_prefix(int64_t h, int64_t seq,
                                  const uint64_t* hashes, int32_t n) {
  std::lock_guard<std::mutex> lk(g_pool_mu);
  PagePool* p = pool_of(h);
  if (!p) return -1;
  auto it = p->seqs.find(seq);
  if (it == p->seqs.end() || (int32_t)it->second.size() < n) return -2;
  int32_t reg = 0;
  for (int32_t i = 0; i < n; ++i) {
    uint64_t hv = hashes[i];
    if (hv == 0) continue;
    int32_t pg = it->second[i];
    if (p->page_hash[pg] == hv) { ++reg; continue; }
    if (p->page_hash[pg] != 0) continue;
    if (p->prefix_map.count(hv)) continue;   // another page owns it
    p->page_hash[pg] = hv;
    p->prefix_map[hv] = pg;
    ++reg;
  }
  return reg;
}

// start a sequence from a cached prefix: walk the hash chain, attach
// every hit (refcount++, un-evict), stop at the first miss. Returns
// the number of pages attached; the caller allocates the rest and
// prefills only the uncached suffix.
int32_t page_pool_admit_cached(int64_t h, int64_t seq,
                               const uint64_t* hashes, int32_t n) {
  std::lock_guard<std::mutex> lk(g_pool_mu);
  PagePool* p = pool_of(h);
  if (!p) return -1;
  if (p->seqs.count(seq)) return -2;
  std::vector<int32_t> v;
  for (int32_t i = 0; i < n; ++i) {
    auto mit = p->prefix_map.find(hashes[i]);
    if (mit == p->prefix_map.end()) break;
    int32_t pg = mit->second;
    if (p->refcount[pg] == 0) {
      for (size_t j = 0; j < p->evictable.size(); ++j)
        if (p->evictable[j] == pg) {
          p->evictable.erase(p->evictable.begin() + j);
          break;
        }
    }
    p->refcount[pg]++;
    v.push_back(pg);
  }
  p->seqs[seq] = std::move(v);
  return (int32_t)p->seqs[seq].size();
}

int32_t page_pool_refcount(int64_t h, int32_t page) {
  std::lock_guard<std::mutex> lk(g_pool_mu);
  PagePool* p = pool_of(h);
  if (!p || page < 0 || (size_t)page >= p->refcount.size()) return -1;
  return p->refcount[page];
}

}  // extern "C"
