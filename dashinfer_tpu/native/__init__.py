"""Native (C++) runtime bindings: page allocator + prefix cache.

The reference's scheduling hot path is C++ (frame/span managers,
prefix_cache_manager); here the equivalents live in csrc/di_runtime.cc and
are consumed via ctypes (no pybind11 in this environment). The Python
implementations (runtime/page_allocator.py, runtime/prefix_cache.py) remain
as the portable fallback and the test oracle; `DI_NATIVE=0` forces them.

The shared library is built on first import with the in-tree Makefile when a
toolchain is present; failures degrade silently to the Python path.
"""

import ctypes
import os
import subprocess
import threading
import time
from typing import Dict, List, Optional, Tuple

from dashinfer_tpu.utils import get_logger

logger = get_logger("native")

_CSRC = os.path.join(os.path.dirname(__file__), "..", "..", "csrc")
_LIB_PATH = os.path.abspath(os.path.join(_CSRC, "libdi_runtime.so"))
_lib = None
_tried = False


def _load():
    global _lib, _tried
    if _tried:
        return _lib
    _tried = True
    if os.environ.get("DI_NATIVE", "1") == "0":
        return None
    try:
        if not os.path.exists(_LIB_PATH):
            subprocess.run(["make", "-C", os.path.abspath(_CSRC)],
                           check=True, capture_output=True, timeout=120)
        lib = ctypes.CDLL(_LIB_PATH)
    except Exception as e:  # pragma: no cover - toolchain-dependent
        logger.info("native runtime unavailable (%s); using Python fallback",
                    e)
        return None

    c = ctypes
    lib.dipa_create.restype = c.c_void_p
    lib.dipa_create.argtypes = [c.c_int32]
    lib.dipa_destroy.argtypes = [c.c_void_p]
    lib.dipa_num_pages.restype = c.c_int32
    lib.dipa_num_pages.argtypes = [c.c_void_p]
    lib.dipa_num_free.restype = c.c_int32
    lib.dipa_num_free.argtypes = [c.c_void_p]
    lib.dipa_grow.argtypes = [c.c_void_p, c.c_int32]
    lib.dipa_reserve.restype = c.c_int32
    lib.dipa_reserve.argtypes = [c.c_void_p, c.c_int64, c.c_int32]
    lib.dipa_release_reservation.argtypes = [c.c_void_p, c.c_int64]
    lib.dipa_commit.restype = c.c_int32
    lib.dipa_commit.argtypes = [c.c_void_p, c.c_int64, c.c_int32,
                                c.POINTER(c.c_int32)]
    lib.dipa_alloc.restype = c.c_int32
    lib.dipa_alloc.argtypes = [c.c_void_p, c.c_int32, c.POINTER(c.c_int32)]
    lib.dipa_free.argtypes = [c.c_void_p, c.POINTER(c.c_int32), c.c_int32]

    lib.dipc_create.restype = c.c_void_p
    lib.dipc_create.argtypes = [c.c_int32, c.c_double]
    lib.dipc_destroy.argtypes = [c.c_void_p]
    lib.dipc_lookup.restype = c.c_int32
    lib.dipc_lookup.argtypes = [c.c_void_p, c.POINTER(c.c_int32), c.c_int32,
                                c.c_double, c.c_int32, c.POINTER(c.c_int32),
                                c.POINTER(c.c_int64)]
    lib.dipc_insert.restype = c.c_int32
    lib.dipc_insert.argtypes = [c.c_void_p, c.POINTER(c.c_int32), c.c_int32,
                                c.POINTER(c.c_int32), c.c_double,
                                c.POINTER(c.c_int64)]
    lib.dipc_unref.restype = c.c_int32
    lib.dipc_unref.argtypes = [c.c_void_p, c.POINTER(c.c_int64), c.c_int32,
                               c.c_double, c.POINTER(c.c_int32)]
    lib.dipc_evict.restype = c.c_int32
    lib.dipc_evict.argtypes = [c.c_void_p, c.c_int32, c.POINTER(c.c_int32)]
    lib.dipc_expire_ttl.restype = c.c_int32
    lib.dipc_expire_ttl.argtypes = [c.c_void_p, c.c_double,
                                    c.POINTER(c.c_int32)]
    lib.dipc_hit_rate.restype = c.c_double
    lib.dipc_hit_rate.argtypes = [c.c_void_p]
    lib.dipc_num_nodes.restype = c.c_int32
    lib.dipc_num_nodes.argtypes = [c.c_void_p]
    _lib = lib
    logger.info("native runtime loaded (%s)", _LIB_PATH)
    return _lib


def available() -> bool:
    return _load() is not None


def _i32buf(n):
    return (ctypes.c_int32 * max(n, 1))()


def _i64buf(n):
    return (ctypes.c_int64 * max(n, 1))()


class NativePageAllocator:
    """ctypes wrapper matching runtime/page_allocator.PageAllocator."""

    def __init__(self, num_pages: int):
        self._lib = _load()
        if self._lib is None:
            raise RuntimeError("native runtime unavailable")
        self._h = self._lib.dipa_create(num_pages)
        self._lock = threading.Lock()
        self._tickets: Dict[str, int] = {}
        self._next_ticket = 1

    def __del__(self):
        try:
            if getattr(self, "_h", None):
                self._lib.dipa_destroy(self._h)
        except Exception:
            pass

    def _ticket(self, uuid: str) -> int:
        t = self._tickets.get(uuid)
        if t is None:
            t = self._next_ticket
            self._next_ticket += 1
            self._tickets[uuid] = t
        return t

    @property
    def num_pages(self) -> int:
        return self._lib.dipa_num_pages(self._h)

    @property
    def num_free(self) -> int:
        with self._lock:
            return self._lib.dipa_num_free(self._h)

    def grow(self, additional: int) -> None:
        with self._lock:
            self._lib.dipa_grow(self._h, additional)

    def reserve(self, uuid: str, count: int) -> bool:
        with self._lock:
            return bool(self._lib.dipa_reserve(self._h, self._ticket(uuid),
                                               count))

    def release_reservation(self, uuid: str) -> None:
        with self._lock:
            t = self._tickets.pop(uuid, None)
            if t is not None:
                self._lib.dipa_release_reservation(self._h, t)

    def commit(self, uuid: str, count: int) -> List[int]:
        from dashinfer_tpu.runtime.page_allocator import NoFreePages
        with self._lock:
            buf = _i32buf(count)
            rc = self._lib.dipa_commit(self._h, self._ticket(uuid), count,
                                       buf)
            if rc != 0:
                raise NoFreePages(f"commit {count} exceeds reservation "
                                  f"for {uuid}")
            return list(buf[:count])

    def alloc(self, count: int) -> List[int]:
        from dashinfer_tpu.runtime.page_allocator import NoFreePages
        with self._lock:
            buf = _i32buf(count)
            rc = self._lib.dipa_alloc(self._h, count, buf)
            if rc != 0:
                raise NoFreePages(f"need {count} pages")
            return list(buf[:count])

    def free(self, pages: List[int]) -> None:
        if not pages:
            return
        with self._lock:
            arr = (ctypes.c_int32 * len(pages))(*pages)
            self._lib.dipa_free(self._h, arr, len(pages))


class _NodeRef:
    """Opaque node handle kept on requests (mirrors prefix_cache._Node's
    role; only identity is needed on the Python side)."""

    __slots__ = ("id",)

    def __init__(self, id_: int):
        self.id = id_


class NativePrefixCacheManager:
    """ctypes wrapper matching runtime/prefix_cache.PrefixCacheManager."""

    def __init__(self, cfg, rt, allocator):
        self._lib = _load()
        if self._lib is None:
            raise RuntimeError("native runtime unavailable")
        self.ps = rt.cache.page_size
        self.ttl_s = rt.prefix_cache_ttl_s
        self.allocator = allocator
        self.seqlen_threshold = 0
        self._h = self._lib.dipc_create(self.ps, float(self.ttl_s))
        self._lock = threading.Lock()

    def __del__(self):
        try:
            if getattr(self, "_h", None):
                self._lib.dipc_destroy(self._h)
        except Exception:
            pass

    def lookup(self, input_ids: List[int]):
        n = len(input_ids)
        with self._lock:
            arr = (ctypes.c_int32 * max(n, 1))(*input_ids)
            maxn = n // self.ps + 1
            pages = _i32buf(maxn)
            ids = _i64buf(maxn)
            m = self._lib.dipc_lookup(
                self._h, arr, n, time.monotonic(),
                max(self.seqlen_threshold, self.ps), pages, ids)
            nodes = [_NodeRef(ids[i]) for i in range(m)]
            return m * self.ps, list(pages[:m]), nodes

    def insert(self, input_ids: List[int], pages: List[int], req) -> None:
        n = len(input_ids)
        with self._lock:
            arr = (ctypes.c_int32 * max(n, 1))(*input_ids)
            parr = (ctypes.c_int32 * max(len(pages), 1))(*pages)
            out = _i64buf(n // self.ps + 1)
            added = self._lib.dipc_insert(self._h, arr, n, parr,
                                          time.monotonic(), out)
            req.prefix_nodes = list(req.prefix_nodes) + \
                [_NodeRef(out[i]) for i in range(added)]

    def release_nodes(self, nodes) -> None:
        if not nodes:
            return
        with self._lock:
            ids = (ctypes.c_int64 * len(nodes))(*[nd.id for nd in nodes])
            owned = _i32buf(len(nodes))
            self._lib.dipc_unref(self._h, ids, len(nodes),
                                 time.monotonic(), owned)

    def unref(self, req, pages: List[int]) -> List[int]:
        nodes = req.prefix_nodes
        req.prefix_nodes = []
        if not nodes:
            return pages
        with self._lock:
            ids = (ctypes.c_int64 * len(nodes))(*[nd.id for nd in nodes])
            owned = _i32buf(len(nodes))
            m = self._lib.dipc_unref(self._h, ids, len(nodes),
                                     time.monotonic(), owned)
            owned_set = set(owned[:m])
        return [p for p in pages if p not in owned_set]

    def evict(self, want_pages: int) -> int:
        with self._lock:
            # clamp: evict(huge) is a legal "drop everything" request and
            # the out-buffer can never exceed the node count
            want_pages = min(want_pages, self._lib.dipc_num_nodes(self._h))
            if want_pages <= 0:
                return 0
            buf = _i32buf(want_pages)
            m = self._lib.dipc_evict(self._h, want_pages, buf)
            freed = list(buf[:m])
        if freed:
            self.allocator.free(freed)
        return len(freed)

    def expire_ttl(self) -> int:
        with self._lock:
            buf = _i32buf(self._lib.dipc_num_nodes(self._h))
            m = self._lib.dipc_expire_ttl(self._h, time.monotonic(), buf)
            freed = list(buf[:m])
        if freed:
            self.allocator.free(freed)
        return len(freed)

    def hit_rate(self) -> float:
        return float(self._lib.dipc_hit_rate(self._h))

    @property
    def num_cached_pages(self) -> int:
        return self._lib.dipc_num_nodes(self._h)


def make_page_allocator(num_pages: int):
    """Factory: native when available, Python otherwise."""
    if available():
        try:
            return NativePageAllocator(num_pages)
        except Exception:
            pass
    from dashinfer_tpu.runtime.page_allocator import PageAllocator
    return PageAllocator(num_pages)


def make_prefix_cache(cfg, rt, allocator):
    if available():
        try:
            return NativePrefixCacheManager(cfg, rt, allocator)
        except Exception:
            pass
    from dashinfer_tpu.runtime.prefix_cache import PrefixCacheManager
    return PrefixCacheManager(cfg, rt, allocator)
