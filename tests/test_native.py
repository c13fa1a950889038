"""Native (C++) runtime vs Python oracle: page allocator + prefix cache
behave identically on randomized op sequences (the reference ships its
frame/span managers in C++ with gtest coverage; here the Python impls are
the golden model)."""

import random

import pytest


def _native_or_skip():
    from dashinfer_tpu import native
    if not native.available():
        pytest.skip("native runtime not built")
    return native


def test_page_allocator_equivalence():
    native = _native_or_skip()
    from dashinfer_tpu.runtime.page_allocator import (NoFreePages,
                                                      PageAllocator)

    rng = random.Random(0)
    N = 32
    py = PageAllocator(N)
    nat = native.NativePageAllocator(N)
    held_py, held_nat = {}, {}

    for step in range(500):
        op = rng.choice(["reserve", "commit", "release", "alloc", "free"])
        u = f"r{rng.randint(0, 5)}"
        if op == "reserve":
            c = rng.randint(1, 6)
            assert py.reserve(u, c) == nat.reserve(u, c)
        elif op == "commit":
            c = rng.randint(1, 4)
            err_py = err_nat = False
            try:
                p1 = py.commit(u, c)
            except NoFreePages:
                err_py = True
            try:
                p2 = nat.commit(u, c)
            except NoFreePages:
                err_nat = True
            assert err_py == err_nat
            if not err_py:
                held_py.setdefault(u, []).extend(p1)
                held_nat.setdefault(u, []).extend(p2)
                assert len(p1) == len(p2)
        elif op == "release":
            py.release_reservation(u)
            nat.release_reservation(u)
        elif op == "alloc":
            c = rng.randint(1, 4)
            err_py = err_nat = False
            try:
                p1 = py.alloc(c)
            except NoFreePages:
                err_py = True
            try:
                p2 = nat.alloc(c)
            except NoFreePages:
                err_nat = True
            assert err_py == err_nat, step
            if not err_py:
                held_py.setdefault(u, []).extend(p1)
                held_nat.setdefault(u, []).extend(p2)
        else:
            pages1 = held_py.pop(u, [])
            pages2 = held_nat.pop(u, [])
            py.free(pages1)
            nat.free(pages2)
        assert py.num_free == nat.num_free, (step, op)


class _Req:
    def __init__(self):
        self.prefix_nodes = []


def _mk_pair(ps=8, ttl=300.0, npages=64):
    import dataclasses
    native = _native_or_skip()
    from dashinfer_tpu.config import CacheConfig, ModelConfig, RuntimeConfig
    from dashinfer_tpu.runtime.page_allocator import PageAllocator
    from dashinfer_tpu.runtime.prefix_cache import PrefixCacheManager

    cfg = ModelConfig(arch="t", vocab_size=64, hidden_size=16,
                      intermediate_size=16, num_layers=1, num_heads=1,
                      num_kv_heads=1, head_dim=16)
    rt = RuntimeConfig(model_name="t", max_length=64, max_batch=2,
                       cache=CacheConfig(page_size=ps, num_pages=npages),
                       prefix_cache_ttl_s=ttl)
    a1, a2 = PageAllocator(npages), PageAllocator(npages)
    return (PrefixCacheManager(cfg, rt, a1),
            native.NativePrefixCacheManager(cfg, rt, a2), a1, a2)


def test_prefix_cache_equivalence():
    py, nat, a1, a2 = _mk_pair()
    rng = random.Random(1)
    seqs = [[rng.randint(0, 30) for _ in range(rng.randint(4, 20))]
            for _ in range(12)]
    # force shared prefixes
    seqs += [seqs[0][:8] + [9, 9, 9, 9], seqs[0][:4] + [1, 2, 3, 4]]

    live = []
    next_page = [0]

    def pages_for(n):
        out = list(range(next_page[0], next_page[0] + n))
        next_page[0] += n
        return out

    for i, ids in enumerate(seqs):
        l1, p1, n1 = py.lookup(ids)
        l2, p2, n2 = nat.lookup(ids)
        assert l1 == l2, (i, l1, l2)
        assert p1 == p2, (i, p1, p2)
        # allocate fresh pages for the uncached part, insert
        total = len(ids) // py.ps
        fresh = pages_for(total - len(p1))
        all_pages = p1 + fresh
        r1, r2 = _Req(), _Req()
        r1.prefix_nodes, r2.prefix_nodes = n1, n2
        py.insert(ids, all_pages, r1)
        nat.insert(ids, all_pages, r2)
        assert len(r1.prefix_nodes) == len(r2.prefix_nodes)
        live.append((ids, all_pages, r1, r2))
        assert py.num_cached_pages == nat.num_cached_pages

        if rng.random() < 0.5 and live:
            ids_, pages_, q1, q2 = live.pop(rng.randrange(len(live)))
            f1 = py.unref(q1, pages_)
            f2 = nat.unref(q2, pages_)
            assert sorted(f1) == sorted(f2)

    assert abs(py.hit_rate() - nat.hit_rate()) < 1e-9
    # eviction parity (count of free-able nodes)
    e1 = py.evict(100)
    e2 = nat.evict(100)
    assert e1 == e2


def test_prefix_cache_ttl_expiry():
    py, nat, a1, a2 = _mk_pair(ttl=0.0)
    ids = list(range(16))
    r1, r2 = _Req(), _Req()
    py.insert(ids, [0, 1, 2, 3], r1)
    nat.insert(ids, [0, 1, 2, 3], r2)
    py.unref(r1, [])
    nat.unref(r2, [])
    import time
    time.sleep(0.01)
    assert py.expire_ttl() == nat.expire_ttl() == 2  # 16 toks / ps=8


def test_commit_zero_without_reservation():
    """commit(uuid, 0) with NO prior reservation is legal — a full
    prefix-cache hit admits a request with zero new pages (regression:
    the native allocator erased map.end(), a latent segfault)."""
    native = _native_or_skip()
    from dashinfer_tpu.runtime.page_allocator import PageAllocator

    py = PageAllocator(8)
    nat = native.NativePageAllocator(8)
    assert py.commit("nobody", 0) == nat.commit("nobody", 0) == []
    # allocator still fully functional afterwards
    assert py.reserve("a", 3) and nat.reserve("a", 3)
    assert len(py.commit("a", 3)) == len(nat.commit("a", 3)) == 3
    assert py.num_free == nat.num_free == 5
