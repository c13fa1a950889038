"""KV-cache movement ops: quantize, append, gather.

Rebuilds the reference's cache-movement CUDA kernels
(csrc/core/kernel/cuda/cache/{decoder_cache_append, context_span_copy,
prefix_cache_copy}) as XLA scatters/gathers over the flat page pool. The
decode-side scatter touches only `[B, KH, D]` elements per layer per step, so
plain XLA scatter is fine; the bandwidth-critical READ side is the Pallas
decode-attention kernel (ops/pallas/paged_attention.py).

Quantization format (reference span-attention/src/cache_quant/impl_i8.cuh,
virtual_cache.cpp:202-232): asymmetric per-token-per-head scale/zero, fp32.
  int8 : q = round((x-min)/scale) - 128,  x = q*scale + zero, zero = min+128*scale
  uint4: q = round((x-min)/scale),        x = q*scale + zero, zero = min
"""

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from dashinfer_tpu.config import CacheMode
from dashinfer_tpu.runtime.kv_cache import KVCache

_EPS = 1e-8


def quantize_kv(x: jnp.ndarray, mode: CacheMode
                ) -> Tuple[jnp.ndarray, Optional[jnp.ndarray]]:
    """Quantize along the last (head_dim) axis.

    x: [..., D] float -> (payload, qparams [..., 2] f32) where
    qparams[..., 0] = scale, qparams[..., 1] = zero.
    """
    if mode == CacheMode.DEFAULT:
        return x, None
    xf = x.astype(jnp.float32)
    xmin = jnp.min(xf, axis=-1, keepdims=True)
    xmax = jnp.max(xf, axis=-1, keepdims=True)
    if mode == CacheMode.INT8:
        scale = jnp.maximum((xmax - xmin) / 255.0, _EPS)
        q = jnp.clip(jnp.round((xf - xmin) / scale) - 128.0, -128, 127)
        zero = xmin + 128.0 * scale
        payload = q.astype(jnp.int8)
    elif mode == CacheMode.UINT4:
        scale = jnp.maximum((xmax - xmin) / 15.0, _EPS)
        q = jnp.clip(jnp.round((xf - xmin) / scale), 0, 15).astype(jnp.uint8)
        zero = xmin
        # HALVES packing: byte j = dim j (low nibble) | dim j+D/2 (high);
        # lets the pallas kernel dot the halves without an unpack reshape
        # (ops/u4pack.py)
        D = q.shape[-1]
        lo = q[..., :D // 2]
        hi = q[..., D // 2:]
        payload = (lo | (hi << 4)).astype(jnp.uint8)
    else:
        raise ValueError(mode)
    qparams = jnp.concatenate([scale, zero], axis=-1)
    return payload, qparams


def dequantize_kv(payload: jnp.ndarray, qparams: jnp.ndarray,
                  mode: CacheMode, out_dtype=jnp.float32) -> jnp.ndarray:
    """Inverse of quantize_kv (reference dequant semantics)."""
    if mode == CacheMode.DEFAULT:
        return payload.astype(out_dtype)
    scale = qparams[..., 0:1]
    zero = qparams[..., 1:2]
    if mode == CacheMode.INT8:
        q = payload.astype(jnp.float32)
    elif mode == CacheMode.UINT4:
        p32 = payload.astype(jnp.int32)
        lo = (p32 & 0xF).astype(jnp.float32)
        hi = ((p32 >> 4) & 0xF).astype(jnp.float32)
        q = jnp.concatenate([lo, hi], axis=-1)  # halves packing
    else:
        raise ValueError(mode)
    return (q * scale + zero).astype(out_dtype)


def append_decode_kv(cache: KVCache, mode: CacheMode,
                     new_k: jnp.ndarray, new_v: jnp.ndarray,
                     page_ids: jnp.ndarray, offsets: jnp.ndarray,
                     active: jnp.ndarray) -> KVCache:
    """Append one token's K/V per slot into its current page (one layer).

    new_k/new_v: [B, KH, D]; page_ids/offsets: [B] physical page & in-page
    offset for this layer. Inactive slots are routed to an OUT-OF-BOUNDS page
    index and dropped by the scatter (`mode="drop"`) — never write masked
    lanes to a real location: duplicate scatter indices have undefined order
    and can clobber live data.

    Reference: decoderAppendCacheLauncher (span_attn_op_cuda.cpp) including
    in-kernel quantization.
    """
    B, KH, D = new_k.shape
    kq, kqp = quantize_kv(new_k, mode)
    vq, vqp = quantize_kv(new_v, mode)
    num_pages = cache.k.shape[1]
    drop_page = jnp.where(active, page_ids, num_pages)  # OOB when inactive

    def scatter(pool, vals):
        vals_t = jnp.swapaxes(vals, 0, 1)             # [KH, B, *]
        # adv indices (page[b], offset[b]) separated from the leading KH
        # slice -> update shape [B, KH, *]... jnp places adv axes first when
        # separated by a slice, so index as [:, page, off] with [KH, B, *]
        return pool.at[:, drop_page, offsets].set(vals_t, mode="drop")

    k = scatter(cache.k, kq)
    v = scatter(cache.v, vq)
    k_qparams = scatter(cache.k_qparams, kqp) if kqp is not None else None
    v_qparams = scatter(cache.v_qparams, vqp) if vqp is not None else None
    return KVCache(k=k, v=v, k_qparams=k_qparams, v_qparams=v_qparams)


def append_prefill_kv(cache: KVCache, mode: CacheMode,
                      k: jnp.ndarray, v: jnp.ndarray,
                      page_row: jnp.ndarray, start_pos: jnp.ndarray,
                      num_tokens: jnp.ndarray) -> KVCache:
    """Write a prefill chunk's K/V into pages (one layer).

    k/v: [T, KH, D] new-token K/V (T = padded bucket length); page_row:
    [max_pages] physical page ids for this layer (entire sequence's table);
    start_pos: position of k[0] in the sequence (0 unless chunked/prefix-hit);
    num_tokens: actual valid token count (<= T).

    Writes token t at sequence position p = start_pos + t into page
    page_row[p // ps] offset p % ps. Implemented as a scatter over tokens.
    Reference: contextCopySpanLauncher (span_attn_op_cuda.cpp).
    """
    T, KH, D = k.shape
    ps = cache.page_size
    pos = start_pos + jnp.arange(T, dtype=jnp.int32)
    valid = jnp.arange(T, dtype=jnp.int32) < num_tokens
    page_idx = pos // ps
    page_of_tok = page_row[jnp.clip(page_idx, 0, page_row.shape[0] - 1)]
    off_of_tok = pos % ps
    num_pages = cache.k.shape[1]
    drop_page = jnp.where(valid, page_of_tok, num_pages)  # OOB -> dropped

    kq, kqp = quantize_kv(k, mode)
    vq, vqp = quantize_kv(v, mode)

    def scatter(pool, vals):
        # vals: [T, KH, *] -> write at [kh, page_of_tok[t], off_of_tok[t]];
        # padding tokens scatter OOB and are dropped (duplicate-index writes
        # would otherwise clobber live data nondeterministically)
        vals_t = jnp.swapaxes(vals, 0, 1)             # [KH, T, *]
        return pool.at[:, drop_page, off_of_tok].set(vals_t, mode="drop")

    knew = scatter(cache.k, kq)
    vnew = scatter(cache.v, vq)
    k_qparams = scatter(cache.k_qparams, kqp) if kqp is not None else None
    v_qparams = scatter(cache.v_qparams, vqp) if vqp is not None else None
    return KVCache(k=knew, v=vnew, k_qparams=k_qparams, v_qparams=v_qparams)


def gather_kv_pages(cache: KVCache, mode: CacheMode, page_row: jnp.ndarray,
                    out_dtype=jnp.float32) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Gather + dequantize a sequence's KV for one layer into contiguous form.

    page_row: [max_pages] physical page ids (this layer). Returns k, v of
    shape [max_pages * ps, KH, D]. Used by the prefill path to attend over a
    cached/previously-prefilled prefix (reference copyPrefixSpanToCtxMem,
    span_attn_op_cuda.cpp) and as the reference implementation for tests.
    """
    def gather(pool, qparams):
        pages = pool[:, page_row]                     # [KH, nP, ps, *]
        if qparams is not None:
            qp = qparams[:, page_row]
            x = dequantize_kv(pages, qp, mode, out_dtype)
        else:
            x = pages.astype(out_dtype)
        KH, nP, ps = x.shape[0], x.shape[1], x.shape[2]
        x = x.reshape(KH, nP * ps, -1)
        return jnp.swapaxes(x, 0, 1)                  # [T, KH, D]

    return gather(cache.k, cache.k_qparams), gather(cache.v, cache.v_qparams)
