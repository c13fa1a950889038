"""KV quantize/append/gather + Pallas paged-attention kernel vs jnp reference
(the reference tests its span-attention library against CPU golden kernels,
span-attention/test/; same idea here)."""

import numpy as np
import pytest


def _mk_cache(mode, KH=2, P=16, ps=8, D=16):
    import jax.numpy as jnp
    from dashinfer_tpu.config import CacheConfig, ModelConfig
    from dashinfer_tpu.runtime.kv_cache import create_kv_cache

    cfg = ModelConfig(arch="t", vocab_size=16, hidden_size=D * KH,
                      intermediate_size=8, num_layers=1, num_heads=KH,
                      num_kv_heads=KH, head_dim=D)
    cache = create_kv_cache(cfg, CacheConfig(page_size=ps, mode=mode), P,
                            model_dtype=jnp.float32)
    return cache


@pytest.mark.parametrize("mode_name", ["default", "int8", "uint4"])
def test_quantize_roundtrip(mode_name):
    import jax.numpy as jnp
    from dashinfer_tpu.config import CacheMode
    from dashinfer_tpu.ops.kv_ops import (dequantize_page_tokens,
                                          quantize_kv)

    mode = CacheMode(mode_name)
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(4, 2, 32).astype(np.float32))
    payload, scale, zero = quantize_kv(x, mode)
    if mode == CacheMode.DEFAULT:
        assert scale is None
        return
    y = dequantize_page_tokens(payload, scale, zero, mode)
    rel = np.abs(np.asarray(y) - np.asarray(x)).max() / np.abs(np.asarray(x)).max()
    tol = 0.01 if mode == CacheMode.INT8 else 0.12
    assert rel < tol, rel


@pytest.mark.parametrize("mode_name", ["default", "int8", "uint4"])
def test_append_then_gather(mode_name):
    import jax.numpy as jnp
    from dashinfer_tpu.config import CacheMode
    from dashinfer_tpu.ops import kv_ops

    mode = CacheMode(mode_name)
    KH, ps, D = 2, 8, 16
    cache = _mk_cache(mode, KH=KH, ps=ps, D=D)
    rng = np.random.RandomState(1)
    T = 13
    k = jnp.asarray(rng.randn(T, KH, D).astype(np.float32))
    v = jnp.asarray(rng.randn(T, KH, D).astype(np.float32))
    page_row = jnp.asarray([3, 7], jnp.int32)

    padded_k = jnp.zeros((16, KH, D)).at[:T].set(k)
    padded_v = jnp.zeros((16, KH, D)).at[:T].set(v)
    cache = kv_ops.append_prefill_kv(cache, mode, padded_k, padded_v,
                                     page_row, jnp.int32(0), jnp.int32(T))
    gk, gv = kv_ops.gather_kv_pages(cache, mode, page_row, KH)
    tol = 1e-6 if mode == CacheMode.DEFAULT else (
        0.05 if mode == CacheMode.INT8 else 0.6)
    np.testing.assert_allclose(np.asarray(gk[:T]), np.asarray(k), atol=tol)
    np.testing.assert_allclose(np.asarray(gv[:T]), np.asarray(v), atol=tol)

    # decode append of one more token at position T
    nk = jnp.asarray(rng.randn(1, KH, D).astype(np.float32))
    nv = jnp.asarray(rng.randn(1, KH, D).astype(np.float32))
    cache = kv_ops.append_decode_kv(
        cache, mode, nk, nv, page_ids=page_row[T // ps][None],
        offsets=jnp.asarray([T % ps]), active=jnp.asarray([True]))
    gk, _ = kv_ops.gather_kv_pages(cache, mode, page_row, KH)
    np.testing.assert_allclose(np.asarray(gk[T]), np.asarray(nk[0]), atol=tol)


@pytest.mark.parametrize("mode_name", ["default", "int8", "uint4"])
@pytest.mark.parametrize("G", [1, 4])
def test_paged_attention_kernel_vs_ref(mode_name, G):
    import jax.numpy as jnp
    from dashinfer_tpu.config import CacheMode
    from dashinfer_tpu.ops import kv_ops
    from dashinfer_tpu.ops.attention import paged_attention_ref
    from dashinfer_tpu.ops.pallas.paged_attention import paged_attention

    mode = CacheMode(mode_name)
    KH, ps, D, P = 2, 8, 16, 32
    B, maxP = 3, 3
    H = KH * G
    cache = _mk_cache(mode, KH=KH, P=P, ps=ps, D=D)
    rng = np.random.RandomState(2)

    lens = np.asarray([5, 24, 17], np.int32)
    pt = np.zeros((B, maxP), np.int32)
    used = iter(range(1, P))
    for b in range(B):
        for j in range((lens[b] + ps - 1) // ps):
            pt[b, j] = next(used)

    # fill the pages with data via prefill append per slot
    for b in range(B):
        T = int(lens[b])
        buf_k = rng.randn(maxP * ps, KH, D).astype(np.float32)
        buf_v = rng.randn(maxP * ps, KH, D).astype(np.float32)
        cache = kv_ops.append_prefill_kv(
            cache, mode, jnp.asarray(buf_k), jnp.asarray(buf_v),
            jnp.asarray(pt[b]), jnp.int32(0), jnp.int32(T))

    q = jnp.asarray(rng.randn(B, H, D).astype(np.float32))
    scale = 1.0 / np.sqrt(D)
    ref = paged_attention_ref(q, cache, mode, jnp.asarray(pt),
                              jnp.asarray(lens), scale)
    out = paged_attention(q, cache, mode, jnp.asarray(pt), jnp.asarray(lens),
                          scale, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-3, atol=2e-3)


def test_paged_attention_inactive_slot_is_zero():
    import jax.numpy as jnp
    from dashinfer_tpu.config import CacheMode
    from dashinfer_tpu.ops.pallas.paged_attention import paged_attention

    cache = _mk_cache(CacheMode.DEFAULT)
    q = jnp.ones((2, 2, 16), jnp.float32)
    pt = jnp.zeros((2, 2), jnp.int32)
    lens = jnp.asarray([0, 0], jnp.int32)
    out = paged_attention(q, cache, CacheMode.DEFAULT, pt, lens, 0.25,
                          interpret=True)
    assert np.all(np.asarray(out) == 0.0)
