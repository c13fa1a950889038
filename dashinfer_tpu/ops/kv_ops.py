"""KV-cache movement ops: quantize, append, gather.

Rebuilds the reference's cache-movement CUDA kernels
(csrc/core/kernel/cuda/cache/{decoder_cache_append, context_span_copy,
prefix_cache_copy}) as XLA scatters/gathers over the page-major flat pool
(runtime/kv_cache.py layout v2: payload [P, ps, KH*Ds], qparams
[P, 2*KH, QL] f32 with QL = round_up(ps, 128), per-head scale/zero row
pairs, token t at lane t). The decode-side scatter touches only `[B, KH*D]`
elements per layer per step, so plain XLA scatter is fine; the
bandwidth-critical READ side is the Pallas decode path
(ops/pallas/megakernel.py fast path, ops/pallas/paged_attention.py fallback).

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
                ) -> Tuple[jnp.ndarray, Optional[jnp.ndarray],
                           Optional[jnp.ndarray]]:
    """Quantize along the last (head_dim) axis.

    x: [..., KH, D] float -> (payload [..., KH, Ds], scale [..., KH],
    zero [..., KH]); scale/zero are None in DEFAULT mode.
    """
    if mode == CacheMode.DEFAULT:
        return x, None, None
    xf = x.astype(jnp.float32)
    xmin = jnp.min(xf, axis=-1)
    xmax = jnp.max(xf, axis=-1)
    if mode == CacheMode.INT8:
        scale = jnp.maximum((xmax - xmin) / 255.0, _EPS)
        q = jnp.clip(jnp.round((xf - xmin[..., None]) / scale[..., None])
                     - 128.0, -128, 127)
        zero = xmin + 128.0 * scale
        payload = q.astype(jnp.int8)
    elif mode == CacheMode.UINT4:
        scale = jnp.maximum((xmax - xmin) / 15.0, _EPS)
        q = jnp.clip(jnp.round((xf - xmin[..., None]) / scale[..., None]),
                     0, 15).astype(jnp.uint8)
        zero = xmin
        # HALVES packing per head: byte j = dim j (low) | dim j+D/2 (high);
        # lets kernels dot the halves without an unpack reshape
        D = q.shape[-1]
        lo = q[..., :D // 2]
        hi = q[..., D // 2:]
        payload = (lo | (hi << 4)).astype(jnp.uint8)
    else:
        raise ValueError(mode)
    return payload, scale, zero


def dequantize_page_tokens(payload: jnp.ndarray, scale: jnp.ndarray,
                           zero: jnp.ndarray, mode: CacheMode,
                           out_dtype=jnp.float32) -> jnp.ndarray:
    """payload [..., KH, Ds], scale/zero [..., KH] -> [..., KH, D] float."""
    if mode == CacheMode.DEFAULT:
        return payload.astype(out_dtype)
    if mode == CacheMode.INT8:
        q = payload.astype(jnp.float32)
    elif mode == CacheMode.UINT4:
        p32 = payload.astype(jnp.int32)
        lo = (p32 & 0xF).astype(jnp.float32)
        hi = ((p32 >> 4) & 0xF).astype(jnp.float32)
        q = jnp.concatenate([lo, hi], axis=-1)  # halves packing
    else:
        raise ValueError(mode)
    return (q * scale[..., None] + zero[..., None]).astype(out_dtype)


def _flat(payload: jnp.ndarray) -> jnp.ndarray:
    """[..., KH, Ds] -> [..., KH*Ds]."""
    return payload.reshape(*payload.shape[:-2], -1)


def _qparam_rows(scale: jnp.ndarray, zero: jnp.ndarray) -> jnp.ndarray:
    """scale/zero [..., KH] -> [..., 2*KH] matching the qparams layout
    [P, 2*KH, QL] (row 2h = scale_h, row 2h+1 = zero_h)."""
    return jnp.stack([scale, zero], axis=-1).reshape(
        *scale.shape[:-1], 2 * scale.shape[-1])


def append_decode_kv(cache: KVCache, mode: CacheMode,
                     new_k: jnp.ndarray, new_v: jnp.ndarray,
                     page_ids: jnp.ndarray, offsets: jnp.ndarray,
                     active: jnp.ndarray) -> KVCache:
    """Append one token's K/V per slot into its current page (one layer).

    new_k/new_v: [B, KH, D]; page_ids/offsets: [B] physical page & in-page
    offset for this layer. Inactive slots are routed to an OUT-OF-BOUNDS page
    index and dropped by the scatter (`mode="drop"`).

    Reference: decoderAppendCacheLauncher (span_attn_op_cuda.cpp) including
    in-kernel quantization.
    """
    kq, ks, kz = quantize_kv(new_k, mode)
    vq, vs, vz = quantize_kv(new_v, mode)
    num_pages = cache.k.shape[0]
    drop_page = jnp.where(active, page_ids, num_pages)  # OOB when inactive

    k = cache.k.at[drop_page, offsets].set(_flat(kq), mode="drop")
    v = cache.v.at[drop_page, offsets].set(_flat(vq), mode="drop")
    if ks is not None:
        k_qparams = cache.k_qparams.at[drop_page, :, offsets].set(
            _qparam_rows(ks, kz), mode="drop")
        v_qparams = cache.v_qparams.at[drop_page, :, offsets].set(
            _qparam_rows(vs, vz), mode="drop")
    else:
        k_qparams = v_qparams = None
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
    T = k.shape[0]
    ps = cache.page_size
    pos = start_pos + jnp.arange(T, dtype=jnp.int32)
    valid = jnp.arange(T, dtype=jnp.int32) < num_tokens
    page_idx = pos // ps
    page_of_tok = page_row[jnp.clip(page_idx, 0, page_row.shape[0] - 1)]
    off_of_tok = pos % ps
    num_pages = cache.k.shape[0]
    drop_page = jnp.where(valid, page_of_tok, num_pages)  # OOB -> dropped

    kq, ks, kz = quantize_kv(k, mode)
    vq, vs, vz = quantize_kv(v, mode)

    knew = cache.k.at[drop_page, off_of_tok].set(_flat(kq), mode="drop")
    vnew = cache.v.at[drop_page, off_of_tok].set(_flat(vq), mode="drop")
    if ks is not None:
        k_qparams = cache.k_qparams.at[drop_page, :, off_of_tok].set(
            _qparam_rows(ks, kz), mode="drop")
        v_qparams = cache.v_qparams.at[drop_page, :, off_of_tok].set(
            _qparam_rows(vs, vz), mode="drop")
    else:
        k_qparams = v_qparams = None
    return KVCache(k=knew, v=vnew, k_qparams=k_qparams, v_qparams=v_qparams)


def gather_kv_pages(cache: KVCache, mode: CacheMode, page_row: jnp.ndarray,
                    kv_heads: int, out_dtype=jnp.float32
                    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Gather + dequantize a sequence's KV for one layer into contiguous form.

    page_row: [max_pages] physical page ids (this layer). Returns k, v of
    shape [max_pages * ps, KH, D]. Used by the prefill path to attend over a
    cached/previously-prefilled prefix (reference copyPrefixSpanToCtxMem,
    span_attn_op_cuda.cpp) and as the reference implementation for tests.
    """
    nP = page_row.shape[0]
    ps = cache.page_size
    KH = kv_heads

    def gather(pool, qparams):
        pages = pool[page_row]                        # [nP, ps, KH*Ds]
        x4 = pages.reshape(nP, ps, KH, -1)            # [nP, ps, KH, Ds]
        if qparams is not None:
            qp = qparams[page_row][..., :ps]          # [nP, 2*KH, ps] (drop
            #                                           the 128-pad lanes)
            scale = jnp.transpose(qp[:, 0::2, :], (0, 2, 1))  # [nP, ps, KH]
            zero = jnp.transpose(qp[:, 1::2, :], (0, 2, 1))
            x = dequantize_page_tokens(x4, scale, zero, mode, out_dtype)
        else:
            x = x4.astype(out_dtype)
        return x.reshape(nP * ps, KH, -1)

    k = gather(cache.k, cache.k_qparams)
    v = gather(cache.v, cache.v_qparams)
    return k, v
