"""Attention paths: paged decode attention + prefill attention.

Decode = the reference's SpanAttention library (span-attention/, SURVEY.md
§2.5): GQA attention reading K/V from non-contiguous pages. On TPU that is a
Pallas kernel (ops/pallas/paged_attention.py) with a jnp gather-based
reference implementation here for tests/CPU.

Prefill = full-context attention (reference uses flash-v2/xformers above a
threshold, span_attn_op_cuda.cpp). Here: jnp causal attention (XLA already
emits a fused attention on TPU) with an optional page-table prefix for
prefix-cache hits / chunked prefill.
"""

import functools
from typing import Optional

import jax
import jax.numpy as jnp

from dashinfer_tpu.config import CacheMode
from dashinfer_tpu.ops import kv_ops
from dashinfer_tpu.ops.pallas import paged_attention as _pa_kernel
from dashinfer_tpu.runtime.kv_cache import KVCache

_NEG_INF = float(jnp.finfo(jnp.float32).min)


def paged_attention_ref(q: jnp.ndarray, cache: KVCache, mode: CacheMode,
                        page_tables: jnp.ndarray, lens: jnp.ndarray,
                        scale: float,
                        alibi: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """Reference paged decode attention (one layer).

    q: [B, H, D]; page_tables: [B, maxP] (this layer's physical page ids);
    lens: [B] tokens to attend over (incl. the just-appended one).
    Returns [B, H, D] in q.dtype.
    """
    B, H, D = q.shape
    if cache.k_qparams is not None:
        KH = cache.k_qparams.shape[1] // 2
    else:
        KH = cache.k.shape[2] // D
    G = H // KH
    maxP = page_tables.shape[1]
    ps = cache.page_size
    S = maxP * ps

    k, v = jax.vmap(
        lambda row: kv_ops.gather_kv_pages(cache, mode, row, KH, jnp.float32)
    )(page_tables)  # [B, S, KH, D]

    qf = q.astype(jnp.float32).reshape(B, KH, G, D)
    kf = jnp.transpose(k, (0, 2, 1, 3))  # [B, KH, S, D]
    vf = jnp.transpose(v, (0, 2, 1, 3))
    scores = jnp.einsum("bhgd,bhsd->bhgs", qf, kf) * scale
    pos = jnp.arange(S, dtype=jnp.int32)
    if alibi is not None:
        # ALiBi (reference ALiBiPE op): score += slope_h * (k_pos - q_pos)
        q_pos = (lens - 1)[:, None]                       # [B, 1]
        bias = alibi.reshape(1, KH, G, 1) * (
            pos[None, None, None, :] - q_pos[:, None, None, :])
        scores = scores + bias
    mask = pos[None, :] < lens[:, None]  # [B, S]
    scores = jnp.where(mask[:, None, None, :], scores, _NEG_INF)
    probs = jax.nn.softmax(scores, axis=-1)
    out = jnp.einsum("bhgs,bhsd->bhgd", probs, vf)
    return out.reshape(B, H, D).astype(q.dtype)


def paged_attention(q: jnp.ndarray, cache: KVCache, mode: CacheMode,
                    page_tables: jnp.ndarray, lens: jnp.ndarray,
                    scale: float, use_kernel: bool = True,
                    alibi: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """Dispatch decode attention to the Pallas kernel or the jnp reference.
    ALiBi models take the jnp path (the Pallas kernel is RoPE-family only;
    ALiBi archs are off the megakernel fast path anyway). Quantized KV at
    any page_size takes the kernel: the qparam pool's lane dim is 128-padded
    (runtime/kv_cache.py qparam_lanes) so sub-128 pages fetch whole tiles."""
    if use_kernel and alibi is None:
        return _pa_kernel.paged_attention(q, cache, mode, page_tables, lens,
                                          scale)
    return paged_attention_ref(q, cache, mode, page_tables, lens, scale,
                               alibi=alibi)


def prefill_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                      q_start: jnp.ndarray, kv_valid: jnp.ndarray,
                      scale: float,
                      sinks: Optional[jnp.ndarray] = None,
                      alibi: Optional[jnp.ndarray] = None,
                      bidir_until=None) -> jnp.ndarray:
    """Causal attention for a prefill chunk over a (prefix + chunk) KV.

    q: [T, H, D] — queries at sequence positions q_start + t
    k/v: [S, KH, D] — keys at sequence positions 0..S-1 (prefix + chunk
         already merged by the caller); entries >= kv_valid are padding.
    Causal rule: query t sees keys with pos <= q_start + t and pos < kv_valid.
    `bidir_until` (scalar) additionally exposes keys with pos < bidir_until
    to every query — the ChatGLM v1 prefix-LM mask (reference TransMask op
    with gmask semantics).
    """
    T, H, D = q.shape
    S, KH, _ = k.shape
    G = H // KH
    qf = q.astype(jnp.float32).reshape(T, KH, G, D)
    kf = k.astype(jnp.float32)
    vf = v.astype(jnp.float32)
    scores = jnp.einsum("thgd,shd->hgts", qf, kf) * scale  # [KH, G, T, S]
    kpos = jnp.arange(S, dtype=jnp.int32)
    qpos = q_start + jnp.arange(T, dtype=jnp.int32)
    if alibi is not None:
        bias = alibi.reshape(KH, G, 1, 1) * (
            kpos[None, None, None, :] - qpos[None, None, :, None])
        scores = scores + bias
    mask = (kpos[None, :] <= qpos[:, None]) & (kpos[None, :] < kv_valid)
    if bidir_until is not None:
        mask = mask | ((kpos[None, :] < bidir_until) &
                       (kpos[None, :] < kv_valid))
    scores = jnp.where(mask[None, None, :, :], scores, _NEG_INF)
    probs = jax.nn.softmax(scores, axis=-1)
    out = jnp.einsum("hgts,shd->thgd", probs, vf)
    return out.reshape(T, H, D).astype(q.dtype)
