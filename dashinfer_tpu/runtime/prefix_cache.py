"""Prefix cache over the paged KV pool.

Re-design of the reference PrefixCacheManager (csrc/runtime/cache/
prefix_cache_manager.h:34-270, SURVEY.md §8.3):
  * node identity = hash over the ENTIRE token prefix up to a page boundary
    (cumulative, one node per full page; partial tails never cached) —
    reference hash_tokens, prefix_cache_manager.cpp:126-131.
  * ref-counted nodes; LRU eviction of unreferenced nodes; TTL filter.
  * lookup at admission returns the matched prefix length + shared pages
    (reference RefOnly/RefFill); insert right after prefill publishes the
    prompt's pages (reference Insert, model.cpp:840-848).

Differences from the reference: pages are logical page ids in the one flat
pool, so "filling" a hit costs nothing (the new request's page table simply
points at the shared pages) — no span copies. The host-RAM tier (GPU<->CPU
swap in the reference) is `HostTier` below: evicted nodes' KV blocks are
pulled to host RAM and pushed back on a hit.
"""

import hashlib
import time
from collections import OrderedDict
from typing import Dict, List, Optional, Tuple

from dashinfer_tpu.config import ModelConfig, RuntimeConfig
from dashinfer_tpu.runtime.page_allocator import PageAllocator
from dashinfer_tpu.utils import get_logger

logger = get_logger("prefix_cache")


def _hash_prefix(token_bytes: bytes) -> bytes:
    return hashlib.blake2b(token_bytes, digest_size=16).digest()


class _Node:
    __slots__ = ("key", "page", "ref_count", "last_access", "ttl_deadline")

    def __init__(self, key: bytes, page: int, ttl_s: float,
                 now: Optional[float] = None):
        self.key = key
        self.page = page
        self.ref_count = 0
        self.last_access = time.monotonic() if now is None else now
        self.ttl_deadline = self.last_access + ttl_s


class HostTier:
    """Host-RAM tier for evicted prefix pages (reference CacheUnion CPU table
    + swap pools, prefix_cache_manager.h:34-84, 201-210). Holds one blob
    (the page's K/V rows pulled via the pager) per node key, LRU-bounded by
    a byte budget.

    Thread-safe with an IN-FLIGHT protocol for asynchronous swap-out (the
    reference overlaps swaps via a 32-thread pool + pinned buffers): the
    scheduler thread marks a key in-flight when it launches the device->host
    gather and a pager worker thread lands the blob later via put_inflight;
    pop blocks briefly for an in-flight key so a lookup racing the copy
    still hits."""

    def __init__(self, capacity_bytes: int, page_bytes: int):
        import threading
        self.capacity = capacity_bytes
        self.page_bytes = max(page_bytes, 1)
        self.blobs: "OrderedDict[bytes, object]" = OrderedDict()
        self._cond = threading.Condition()
        self._inflight: set = set()

    @property
    def max_nodes(self) -> int:
        return self.capacity // self.page_bytes

    def _put_locked(self, key: bytes, blob) -> None:
        if self.max_nodes <= 0:
            return
        self.blobs[key] = blob
        self.blobs.move_to_end(key)
        while len(self.blobs) > self.max_nodes:
            self.blobs.popitem(last=False)

    def put(self, key: bytes, blob) -> None:
        with self._cond:
            self._put_locked(key, blob)

    # -- async swap-out protocol ---------------------------------------------
    def mark_inflight(self, key: bytes) -> None:
        with self._cond:
            self._inflight.add(key)

    def put_inflight(self, key: bytes, blob) -> None:
        with self._cond:
            if key in self._inflight:
                self._inflight.discard(key)
                self._put_locked(key, blob)
                self._cond.notify_all()

    def cancel_inflight(self, key: bytes) -> None:
        with self._cond:
            self._inflight.discard(key)
            self._cond.notify_all()

    def pop(self, key: bytes, wait_s: float = 2.0):
        deadline = time.monotonic() + wait_s
        with self._cond:
            while key in self._inflight:
                left = deadline - time.monotonic()
                if left <= 0 or not self._cond.wait(timeout=left):
                    break
            return self.blobs.pop(key, None)

    def __contains__(self, key: bytes) -> bool:
        with self._cond:
            return key in self.blobs or key in self._inflight

    def __len__(self) -> int:
        # in-flight swap-outs count: they are committed to land (pop waits)
        with self._cond:
            return len(self.blobs) + len(self._inflight)


class PrefixCacheManager:
    """`pager` (optional) enables the host tier: an object with
    gather_page(logical_page) -> blob and restore_page(blob) -> logical_page
    (allocating a fresh device page; raises NoFreePages when full). The
    engine's ModelRuntime provides it (jitted pool row gather/scatter)."""

    def __init__(self, cfg: ModelConfig, rt: RuntimeConfig,
                 allocator: PageAllocator, pager=None):
        self.ps = rt.cache.page_size
        self.ttl_s = rt.prefix_cache_ttl_s
        self.allocator = allocator
        self.nodes: "OrderedDict[bytes, _Node]" = OrderedDict()  # LRU order
        self.seqlen_threshold = 0   # reference SetSeqlenThre
        self._hits = 0
        self._misses = 0
        self.pager = pager
        self.host_tier = None
        if pager is not None and rt.prefix_cache_host_bytes > 0:
            from dashinfer_tpu.runtime.kv_cache import logical_page_bytes
            self.host_tier = HostTier(
                rt.prefix_cache_host_bytes,
                logical_page_bytes(cfg, rt.cache))
        self._host_hits = 0

    # -- admission-time lookup (reference RefOnly + RefFill) -----------------
    def lookup(self, input_ids: List[int], now: Optional[float] = None
               ) -> Tuple[int, List[int], List[_Node]]:
        """Returns (matched_prefix_len, shared logical pages, nodes).
        `now` overrides the clock for lockstep multi-host determinism."""
        if len(input_ids) < max(self.seqlen_threshold, self.ps):
            return 0, [], []
        pages, nodes = [], []
        n_full = len(input_ids) // self.ps
        buf = b""
        now = time.monotonic() if now is None else now
        for j in range(n_full):
            span = input_ids[j * self.ps:(j + 1) * self.ps]
            buf += b"".join(int(t).to_bytes(4, "little", signed=True)
                            for t in span)
            key = _hash_prefix(buf)
            node = self.nodes.get(key)
            if node is None and self.host_tier is not None and \
                    key in self.host_tier:
                node = self._swap_in(key, now)  # reference swap-to-GPU on hit
            if node is None or (node.ref_count == 0 and
                                node.ttl_deadline < now):
                self._misses += n_full - j
                break
            node.ref_count += 1
            node.last_access = now
            node.ttl_deadline = now + self.ttl_s
            self.nodes.move_to_end(key)
            pages.append(node.page)
            nodes.append(node)
            self._hits += 1
        return len(pages) * self.ps, pages, nodes

    # -- post-prefill publish (reference Insert) ------------------------------
    def insert(self, input_ids: List[int], pages: List[int], req,
               now: Optional[float] = None) -> None:
        n_full = len(input_ids) // self.ps
        buf = b""
        now = time.monotonic() if now is None else now
        new_nodes = []
        for j in range(n_full):
            span = input_ids[j * self.ps:(j + 1) * self.ps]
            buf += b"".join(int(t).to_bytes(4, "little", signed=True)
                            for t in span)
            key = _hash_prefix(buf)
            node = self.nodes.get(key)
            if node is None:
                node = _Node(key, pages[j], self.ttl_s, now=now)
                node.ref_count = 1
                self.nodes[key] = node
                new_nodes.append(node)
            elif node not in req.prefix_nodes:
                # raced duplicate content on different pages: keep ours out
                # of the cache, the existing node wins
                continue
        req.prefix_nodes = list(req.prefix_nodes) + new_nodes

    def release_nodes(self, nodes) -> None:
        """Rollback refs taken by lookup() when admission fails."""
        for node in nodes:
            node.ref_count = max(node.ref_count - 1, 0)

    # -- request release (reference unref path) -------------------------------
    def unref(self, req, pages: List[int]) -> List[int]:
        """Drop the request's refs; return the pages safe to free (those NOT
        owned by a cache node)."""
        owned = set()
        for node in req.prefix_nodes:
            node.ref_count = max(node.ref_count - 1, 0)
            node.last_access = time.monotonic()
            owned.add(node.page)
        req.prefix_nodes = []
        return [p for p in pages if p not in owned]

    # -- host tier (reference GPU<->CPU swap, prefix_cache_manager.h) --------
    def _swap_in(self, key: bytes, now: float):
        """Host-tier hit: allocate a device page, push the blob back."""
        blob = self.host_tier.pop(key)
        if blob is None:
            return None
        try:
            page = self.pager.restore_page(blob)
        except Exception:
            self.host_tier.put(key, blob)  # no room; keep it on host
            return None
        node = _Node(key, page, self.ttl_s)
        self.nodes[key] = node
        self._host_hits += 1
        return node

    def _swap_out(self, node) -> None:
        """Asynchronous when the pager supports it (gather_page_async): the
        device->host gather is DISPATCHED here (so it reads the pool rows
        before any later step can overwrite the freed page — single-stream
        dispatch order) but the host copy completes on the pager's worker
        thread, so decode ticks never block on jax.device_get (reference
        32-thread swap pool, prefix_cache_manager.h:201-210)."""
        async_gather = getattr(self.pager, "gather_page_async", None)
        if async_gather is not None:
            import functools
            self.host_tier.mark_inflight(node.key)
            try:
                async_gather(
                    node.page,
                    functools.partial(self.host_tier.put_inflight, node.key),
                    functools.partial(self.host_tier.cancel_inflight,
                                      node.key))
            except Exception:
                self.host_tier.cancel_inflight(node.key)
                logger.exception("async swap-out failed; dropping node")
            return
        try:
            blob = self.pager.gather_page(node.page)
        except Exception:
            logger.exception("host-tier swap-out failed; dropping node")
            return
        self.host_tier.put(node.key, blob)

    # -- capacity pressure (reference LRU evictor + TTL filter) ---------------
    def evict(self, want_pages: int) -> int:
        """Release up to want_pages unreferenced nodes back to the allocator
        (swapping their contents to the host tier first when enabled).
        Returns pages freed."""
        freed = []
        for key in list(self.nodes.keys()):
            if len(freed) >= want_pages:
                break
            node = self.nodes[key]
            if node.ref_count == 0:
                if self.host_tier is not None:
                    self._swap_out(node)
                del self.nodes[key]
                freed.append(node.page)
        if freed:
            self.allocator.free(freed)
        return len(freed)

    def expire_ttl(self, now: Optional[float] = None) -> int:
        now = time.monotonic() if now is None else now
        freed = []
        for key in list(self.nodes.keys()):
            node = self.nodes[key]
            if node.ref_count == 0 and node.ttl_deadline < now:
                del self.nodes[key]
                freed.append(node.page)
        if freed:
            self.allocator.free(freed)
        return len(freed)

    def hit_rate(self) -> float:
        tot = self._hits + self._misses
        return self._hits / tot if tot else 0.0

    @property
    def host_hits(self) -> int:
        return self._host_hits

    @property
    def num_host_nodes(self) -> int:
        return len(self.host_tier) if self.host_tier is not None else 0

    @property
    def num_cached_pages(self) -> int:
        return len(self.nodes)
