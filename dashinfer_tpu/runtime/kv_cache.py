"""Paged ("span") KV-cache pool.

Re-design of the reference's cache runtime (SURVEY.md §2.8): the
CacheFrameManager/CacheSpanManager/VirtualCache hierarchy
(csrc/runtime/cache/frame_manager.h, span_manager.h, virtual_cache.h)
collapses on TPU into ONE preallocated device array per K/V ("the pool") plus
integer page tables. There is no device "TLB" of span pointers — kernels
consume page-table rows directly via scalar prefetch.

Layout (v2, page-major): the pool is FLAT ACROSS LAYERS AND HEADS:
`[num_pages, page_size, kv_heads * head_dim]`, so ONE (page) block is a
contiguous `[page_size, KH*D]` tile covering every head — the DMA unit of the
decode kernels (one descriptor per page, regardless of head count; the
dominant cost on TPU is DMA descriptor issue, not bytes). A request's logical
page `g` owns `num_layers` physical pages `g*L + l` (exactly the reference's
per-layer span allocation: decode reserve = 2 x layers x boundary-crossings,
csrc/core/model/model.cpp:1480-1521), so consecutive layers of one logical
page are CONTIGUOUS in the pool — the decode megakernel flushes a token's
K/V for all layers with a single strided DMA.

Quantized modes (reference span layout: virtual_cache.cpp:202-232 — int8/uint4
payload + per-token-per-head fp32 scale & zero):
  INT8:  payload int8, same lane count; qparams `[P, 2*KH, QL]` f32 with
         QL = round_up(page_size, 128) — row 2h is head h's per-token scale
         row, row 2h+1 its zero row; token t lives at lane t, lanes >= ps are
         never read (contiguous `[1, QL]` rows per head for kernels; per-head
         row PAIRS keep the sublane dim 8-aligned for KH>=4 and shardable
         over heads for tensor parallelism). The lane dim is 128-padded
         because Mosaic tiles the minor dim of every HBM array to 128: a
         <128-lane pool physically occupies the padded lanes anyway, and any
         row-sliced async copy of it is rejected ("Slice shape along
         dimension 2 must be aligned to tiling (128)") — declaring the
         padding makes every DMA legal at zero extra HBM cost.
  UINT4: payload packs 2 nibbles/byte per head (HALVES packing within each
         head's lane block: byte j of head h = dims j | j+D/2 << 4), lanes =
         kv_heads * head_dim / 2; same qparams.
Dequant: x = q * scale + zero (asymmetric, like the reference's
span-attention/src/cache_quant/impl_i8.cuh).
"""

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from dashinfer_tpu.config import CacheConfig, CacheMode, ModelConfig


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class KVCache:
    """Device-side paged KV pool (a pytree of arrays).

    k/v: [P, ps, KH*Ds] payload (Ds = head_dim, or head_dim//2 packed u4)
    k_qparams/v_qparams: [P, 2*KH, QL] f32 or None (scale/zero row pairs,
    QL = round_up(ps, 128); token t at lane t, lanes >= ps unread)
    """

    k: jax.Array
    v: jax.Array
    k_qparams: Optional[jax.Array]
    v_qparams: Optional[jax.Array]

    @property
    def num_pages(self) -> int:
        return self.k.shape[0]

    @property
    def page_size(self) -> int:
        return self.k.shape[1]


def qparam_lanes(page_size: int) -> int:
    """Lane count of a qparam pool row: page_size rounded up to the Mosaic
    lane tile (128). The sub-128 physical padding exists regardless; naming
    it keeps row-sliced DMAs tile-aligned (see module docstring)."""
    return -(-page_size // 128) * 128


def cache_dtype_and_dim(mode: CacheMode, head_dim: int,
                        model_dtype) -> Tuple:
    """(storage dtype, storage head_dim per head, is_quantized)."""
    if mode == CacheMode.DEFAULT:
        return model_dtype, head_dim, False
    if mode == CacheMode.INT8:
        return jnp.int8, head_dim, True
    if mode == CacheMode.UINT4:
        return jnp.uint8, head_dim // 2, True
    raise ValueError(mode)


def create_kv_cache(model_cfg: ModelConfig, cache_cfg: CacheConfig,
                    num_physical_pages: int, model_dtype=jnp.bfloat16,
                    kv_heads_override: Optional[int] = None) -> KVCache:
    """Allocate the pool. `num_physical_pages` counts per-layer pages (the
    allocator hands out `num_layers` of them per logical sequence page).
    `kv_heads_override` is the per-shard head count when created inside
    shard_map; by default full heads (sharded over heads by NamedSharding)."""
    kh = kv_heads_override or model_cfg.num_kv_heads
    dtype, dim, quant = cache_dtype_and_dim(cache_cfg.mode, model_cfg.head_dim,
                                            model_dtype)
    shape = (num_physical_pages, cache_cfg.page_size, kh * dim)
    k = jnp.zeros(shape, dtype)
    v = jnp.zeros(shape, dtype)
    if quant:
        qshape = (num_physical_pages, 2 * kh,
                  qparam_lanes(cache_cfg.page_size))
        kq = jnp.zeros(qshape, jnp.float32)
        vq = jnp.zeros(qshape, jnp.float32)
    else:
        kq = vq = None
    return KVCache(k=k, v=v, k_qparams=kq, v_qparams=vq)


def physical_page_bytes(model_cfg: ModelConfig, cache_cfg: CacheConfig,
                        model_dtype=jnp.bfloat16) -> int:
    """Bytes of K+V pool held by ONE physical page (one layer's span)."""
    dtype, dim, quant = cache_dtype_and_dim(cache_cfg.mode, model_cfg.head_dim,
                                            model_dtype)
    kh, ps = model_cfg.num_kv_heads, cache_cfg.page_size
    payload = 2 * kh * ps * dim * jnp.dtype(dtype).itemsize
    qparams = 2 * 2 * kh * qparam_lanes(ps) * 4 if quant else 0
    return payload + qparams


def logical_page_bytes(model_cfg: ModelConfig, cache_cfg: CacheConfig,
                       model_dtype=jnp.bfloat16) -> int:
    """Bytes per logical sequence page (= num_layers physical pages); the
    unit of admission accounting."""
    return model_cfg.num_layers * physical_page_bytes(model_cfg, cache_cfg,
                                                      model_dtype)
