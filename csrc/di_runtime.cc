// dashinfer_tpu native runtime: page allocator + prefix cache.
//
// The reference implements these in C++ too (csrc/runtime/cache/
// frame_manager.{h,cpp} with its two-phase "pres" reserved-frames protocol,
// and prefix_cache_manager.{h,cpp} with a MurmurHash3 chain of ref-counted
// span nodes + LRU/TTL eviction). Here the device side of the cache is a
// JAX-owned pool array, so the native layer is pure integer bookkeeping on
// the hot scheduling path: admission accounting per engine tick and prefix
// lookups per request. Exposed as a C API consumed via ctypes
// (dashinfer_tpu/native/__init__.py); semantics mirror the Python
// implementations (runtime/page_allocator.py, runtime/prefix_cache.py),
// which remain as the portable fallback and as the test oracle.
//
// Build: make -C csrc  (g++ -O3 -shared; no external deps).

#include <cstdint>
#include <cstring>
#include <deque>
#include <list>
#include <unordered_map>
#include <vector>

extern "C" {

// ---------------------------------------------------------------------------
// page allocator (two-phase reserve -> commit, reference frame_manager.h)
// ---------------------------------------------------------------------------

struct DiPageAllocator {
  std::vector<int32_t> free_list;  // LIFO, top = back
  int32_t num_pages = 0;
  int64_t reserved_total = 0;
  std::unordered_map<int64_t, int64_t> reserved;  // ticket -> count
};

void* dipa_create(int32_t num_pages) {
  auto* a = new DiPageAllocator();
  a->num_pages = num_pages;
  a->free_list.reserve(num_pages);
  for (int32_t i = num_pages - 1; i >= 0; --i) a->free_list.push_back(i);
  return a;
}

void dipa_destroy(void* h) { delete static_cast<DiPageAllocator*>(h); }

int32_t dipa_num_pages(void* h) {
  return static_cast<DiPageAllocator*>(h)->num_pages;
}

int32_t dipa_num_free(void* h) {
  auto* a = static_cast<DiPageAllocator*>(h);
  return static_cast<int32_t>(a->free_list.size() - a->reserved_total);
}

void dipa_grow(void* h, int32_t additional) {
  auto* a = static_cast<DiPageAllocator*>(h);
  for (int32_t i = a->num_pages + additional - 1; i >= a->num_pages; --i)
    a->free_list.push_back(i);
  a->num_pages += additional;
}

// phase 1: claim capacity without picking ids. 1 = ok, 0 = insufficient.
int32_t dipa_reserve(void* h, int64_t ticket, int32_t count) {
  auto* a = static_cast<DiPageAllocator*>(h);
  int64_t avail =
      static_cast<int64_t>(a->free_list.size()) - a->reserved_total;
  if (count > avail) return 0;
  a->reserved[ticket] += count;
  a->reserved_total += count;
  return 1;
}

void dipa_release_reservation(void* h, int64_t ticket) {
  auto* a = static_cast<DiPageAllocator*>(h);
  auto it = a->reserved.find(ticket);
  if (it == a->reserved.end()) return;
  a->reserved_total -= it->second;
  a->reserved.erase(it);
}

// phase 2: reservation -> concrete ids. 0 = ok, -1 = exceeds reservation.
int32_t dipa_commit(void* h, int64_t ticket, int32_t count,
                    int32_t* out_pages) {
  auto* a = static_cast<DiPageAllocator*>(h);
  auto it = a->reserved.find(ticket);
  int64_t held = it == a->reserved.end() ? 0 : it->second;
  if (count > held) return -1;
  for (int32_t i = 0; i < count; ++i) {
    out_pages[i] = a->free_list.back();
    a->free_list.pop_back();
  }
  a->reserved_total -= count;
  // count == 0 with no reservation is legal (full prefix hit admits with
  // zero new pages); `it` is end() there — erasing it is UB
  if (it != a->reserved.end()) {
    if (held == count)
      a->reserved.erase(it);
    else
      it->second = held - count;
  }
  return 0;
}

// direct path. 0 = ok, -1 = out of pages.
int32_t dipa_alloc(void* h, int32_t count, int32_t* out_pages) {
  auto* a = static_cast<DiPageAllocator*>(h);
  int64_t avail =
      static_cast<int64_t>(a->free_list.size()) - a->reserved_total;
  if (count > avail) return -1;
  for (int32_t i = 0; i < count; ++i) {
    out_pages[i] = a->free_list.back();
    a->free_list.pop_back();
  }
  return 0;
}

void dipa_free(void* h, const int32_t* pages, int32_t count) {
  auto* a = static_cast<DiPageAllocator*>(h);
  for (int32_t i = 0; i < count; ++i) a->free_list.push_back(pages[i]);
}

// ---------------------------------------------------------------------------
// prefix cache (reference prefix_cache_manager.{h,cpp}: hash over the whole
// token prefix per full span, ref-counted nodes, LRU + TTL eviction).
// Node identity uses an INCREMENTAL chained hash (splitmix64 mix per token,
// seeded by the previous span's key) — same identity semantics as the
// reference's cumulative MurmurHash3-of-the-whole-prefix, but O(span)
// instead of O(prefix) per span.
// ---------------------------------------------------------------------------

static inline uint64_t mix64(uint64_t x) {
  x += 0x9e3779b97f4a7c15ULL;
  x = (x ^ (x >> 30)) * 0xbf58476d1ce4e5b9ULL;
  x = (x ^ (x >> 27)) * 0x94d049bb133111ebULL;
  return x ^ (x >> 31);
}

struct DiPrefixNode {
  uint64_t key;
  int32_t page;
  int32_t ref_count;
  double last_access;
  double ttl_deadline;
  int64_t id;
  std::list<int64_t>::iterator lru_it;  // position in lru (valid always)
};

struct DiPrefixCache {
  int32_t page_size;
  double ttl_s;
  std::unordered_map<uint64_t, DiPrefixNode> nodes;  // key -> node
  std::unordered_map<int64_t, uint64_t> by_id;       // id -> key
  std::list<int64_t> lru;                            // front = oldest, ids
  int64_t next_id = 1;
  int64_t hits = 0, misses = 0;
};

void* dipc_create(int32_t page_size, double ttl_s) {
  auto* c = new DiPrefixCache();
  c->page_size = page_size;
  c->ttl_s = ttl_s;
  return c;
}

void dipc_destroy(void* h) { delete static_cast<DiPrefixCache*>(h); }

static uint64_t chain_key(uint64_t prev, const int32_t* span, int32_t n) {
  uint64_t k = mix64(prev ^ 0x5851f42d4c957f2dULL);
  for (int32_t i = 0; i < n; ++i)
    k = mix64(k ^ static_cast<uint64_t>(static_cast<uint32_t>(span[i])));
  return k;
}

static void lru_touch(DiPrefixCache* c, DiPrefixNode& n) {
  c->lru.erase(n.lru_it);
  c->lru.push_back(n.id);
  n.lru_it = std::prev(c->lru.end());
}

// Admission lookup: walks full spans of `tokens`, refs matched nodes.
// Returns count of matched pages; fills out_pages/out_ids.
int32_t dipc_lookup(void* h, const int32_t* tokens, int32_t ntokens,
                    double now, int32_t min_tokens, int32_t* out_pages,
                    int64_t* out_ids) {
  auto* c = static_cast<DiPrefixCache*>(h);
  if (ntokens < min_tokens || ntokens < c->page_size) return 0;
  int32_t n_full = ntokens / c->page_size;
  uint64_t key = 0;
  int32_t matched = 0;
  for (int32_t j = 0; j < n_full; ++j) {
    key = chain_key(key, tokens + j * c->page_size, c->page_size);
    auto it = c->nodes.find(key);
    if (it == c->nodes.end() ||
        (it->second.ref_count == 0 && it->second.ttl_deadline < now)) {
      c->misses += n_full - j;
      break;
    }
    DiPrefixNode& n = it->second;
    n.ref_count += 1;
    n.last_access = now;
    n.ttl_deadline = now + c->ttl_s;
    lru_touch(c, n);
    out_pages[matched] = n.page;
    out_ids[matched] = n.id;
    matched += 1;
    c->hits += 1;
  }
  return matched;
}

// Publish after prefill: insert nodes for spans not yet cached. `held_ids`
// holds node ids the request already refs (from lookup); new nodes get
// ref_count 1 and their ids are appended to out_new_ids. Returns new count.
int32_t dipc_insert(void* h, const int32_t* tokens, int32_t ntokens,
                    const int32_t* pages, double now, int64_t* out_new_ids) {
  auto* c = static_cast<DiPrefixCache*>(h);
  int32_t n_full = ntokens / c->page_size;
  uint64_t key = 0;
  int32_t added = 0;
  for (int32_t j = 0; j < n_full; ++j) {
    key = chain_key(key, tokens + j * c->page_size, c->page_size);
    auto it = c->nodes.find(key);
    if (it != c->nodes.end()) continue;  // existing node wins
    DiPrefixNode n;
    n.key = key;
    n.page = pages[j];
    n.ref_count = 1;
    n.last_access = now;
    n.ttl_deadline = now + c->ttl_s;
    n.id = c->next_id++;
    c->lru.push_back(n.id);
    n.lru_it = std::prev(c->lru.end());
    c->by_id[n.id] = key;
    c->nodes.emplace(key, n);
    out_new_ids[added++] = n.id;
  }
  return added;
}

// Drop a request's refs. out_owned_pages receives the pages owned by cache
// nodes (caller must NOT free those); returns owned count.
int32_t dipc_unref(void* h, const int64_t* ids, int32_t n, double now,
                   int32_t* out_owned_pages) {
  auto* c = static_cast<DiPrefixCache*>(h);
  int32_t owned = 0;
  for (int32_t i = 0; i < n; ++i) {
    auto idit = c->by_id.find(ids[i]);
    if (idit == c->by_id.end()) continue;
    auto it = c->nodes.find(idit->second);
    if (it == c->nodes.end()) continue;
    DiPrefixNode& node = it->second;
    if (node.ref_count > 0) node.ref_count -= 1;
    node.last_access = now;
    out_owned_pages[owned++] = node.page;
  }
  return owned;
}

// LRU-evict up to want_pages unreferenced nodes; returns pages freed.
int32_t dipc_evict(void* h, int32_t want_pages, int32_t* out_pages) {
  auto* c = static_cast<DiPrefixCache*>(h);
  int32_t freed = 0;
  auto it = c->lru.begin();
  while (it != c->lru.end() && freed < want_pages) {
    uint64_t key = c->by_id[*it];
    DiPrefixNode& n = c->nodes[key];
    if (n.ref_count == 0) {
      out_pages[freed++] = n.page;
      c->by_id.erase(n.id);
      it = c->lru.erase(it);
      c->nodes.erase(key);
    } else {
      ++it;
    }
  }
  return freed;
}

int32_t dipc_expire_ttl(void* h, double now, int32_t* out_pages) {
  auto* c = static_cast<DiPrefixCache*>(h);
  int32_t freed = 0;
  auto it = c->lru.begin();
  while (it != c->lru.end()) {
    uint64_t key = c->by_id[*it];
    DiPrefixNode& n = c->nodes[key];
    if (n.ref_count == 0 && n.ttl_deadline < now) {
      out_pages[freed++] = n.page;
      c->by_id.erase(n.id);
      it = c->lru.erase(it);
      c->nodes.erase(key);
    } else {
      ++it;
    }
  }
  return freed;
}

double dipc_hit_rate(void* h) {
  auto* c = static_cast<DiPrefixCache*>(h);
  int64_t tot = c->hits + c->misses;
  return tot ? static_cast<double>(c->hits) / tot : 0.0;
}

int32_t dipc_num_nodes(void* h) {
  return static_cast<int32_t>(static_cast<DiPrefixCache*>(h)->nodes.size());
}

}  // extern "C"
