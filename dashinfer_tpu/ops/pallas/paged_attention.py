"""Pallas paged decode-attention kernel (the "SpanAttention" of this engine).

TPU-native re-design of the reference's span-attention library
(span-attention/src: QK GEMV -> tiled softmax -> QKV weighted sum, with
fused in-kernel dequant of int8/uint4 KV; span_attn.h:83-150): one fused
flash-decoding kernel per layer. This is the FALLBACK decode-attention path —
the fast path fuses attention into the whole-model decode megakernel
(ops/pallas/megakernel.py), which exists because on TPU the dominant decode
cost is per-kernel/per-DMA issue overhead, not bytes.

Design:
  grid = (batch, max_pages): the page dimension iterates innermost, so Pallas
  pipelines the K/V page DMAs (HBM -> VMEM) against compute; an
  online-softmax accumulator lives in VMEM scratch across page steps. The
  page-major pool layout [P, ps, KH*D] means ONE block fetch per page covers
  every kv head (one DMA descriptor per page).

  Page indirection rides BlockSpec index_maps over scalar-prefetched page
  tables: block page_table[b, p] of the flat pool. Pages past a sequence's
  length clamp to the last valid page — consecutive equal block indices make
  Pallas skip the re-fetch, so short sequences don't pay DMA for the padded
  tail (same trick as the reference's per-request seqLen[] handling).

  Quantized KV (int8 / packed uint4 + per-token-per-head scale/zero,
  reference cache_quant/impl_i8.cuh) is dequantized via the affine-after-dot
  identity: with k = q_int * scale_t + zero_t,
      (q . k_t) = (q . q_int_t) * scale_t + (sum_d q_d) * zero_t
  so the MXU dot runs on the raw int payload (cast bf16) and the per-token
  affine is applied on the [G, ps] score tile — O(G*ps) VPU work instead of
  O(ps*D) dequant. Same trick on the V pass. qparams layout [P, 2*KH, QL]
  hands each head contiguous [1, ps] scale/zero rows (no transposes).
"""

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from dashinfer_tpu.config import CacheMode
from dashinfer_tpu.runtime.kv_cache import KVCache

_NEG_INF = float(jnp.finfo(jnp.float32).min)


def _kernel(pt_ref, lens_ref,              # scalar prefetch
            q_ref, k_ref, v_ref,           # [1,H,D], [1,ps,KH*Ds]
            kq_ref, vq_ref,                # [1,2*KH,QL] f32 or None
            o_ref,                         # [1,H,D]
            m_ref, l_ref, acc_ref,         # scratch [H,1],[H,1],[H,D]
            *, scale: float, mode: CacheMode, kv_heads: int, q_per_kv: int):
    b = pl.program_id(0)
    p = pl.program_id(1)
    ps = k_ref.shape[1]
    D = q_ref.shape[2]
    KH, G = kv_heads, q_per_kv
    lens_b = lens_ref[b]
    num_pages_b = pl.cdiv(lens_b, ps)

    @pl.when(p == 0)
    def _init():
        m_ref[:] = jnp.full_like(m_ref, _NEG_INF)
        l_ref[:] = jnp.zeros_like(l_ref)
        acc_ref[:] = jnp.zeros_like(acc_ref)

    @pl.when(p < num_pages_b)
    def _compute():
        tok_idx = p * ps + jax.lax.broadcasted_iota(jnp.int32, (1, ps), 1)
        tok_mask = tok_idx < lens_b

        for h in range(KH):
            q = q_ref[0, h * G:(h + 1) * G].astype(jnp.float32)   # [G, D]

            def dot_nt(a, bm):  # a [G, D'], bm [ps, D'] -> [G, ps]
                return jax.lax.dot_general(
                    a, bm, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32)

            if mode == CacheMode.DEFAULT:
                k = k_ref[0, :, h * D:(h + 1) * D].astype(jnp.float32)
                s = dot_nt(q, k)
            else:
                if mode == CacheMode.UINT4:
                    D2 = D // 2
                    p32 = k_ref[0, :, h * D2:(h + 1) * D2].astype(jnp.int32)
                    k_lo = (p32 & 0xF).astype(jnp.float32)
                    k_hi = ((p32 >> 4) & 0xF).astype(jnp.float32)
                    s_raw = dot_nt(q[:, :D2], k_lo) + dot_nt(q[:, D2:], k_hi)
                else:
                    s_raw = dot_nt(
                        q, k_ref[0, :, h * D:(h + 1) * D].astype(jnp.float32))
                k_scale = kq_ref[0, 2 * h][:ps]                   # [ps]
                k_zero = kq_ref[0, 2 * h + 1][:ps]
                q_sum = jnp.sum(q, axis=1, keepdims=True)         # [G, 1]
                s = s_raw * k_scale[None, :] + q_sum * k_zero[None, :]

            s = s * scale
            s = jnp.where(tok_mask, s, _NEG_INF)

            m_prev = m_ref[h * G:(h + 1) * G]                     # [G, 1]
            l_prev = l_ref[h * G:(h + 1) * G]
            m_cur = jnp.max(s, axis=-1, keepdims=True)
            m_new = jnp.maximum(m_prev, m_cur)
            alpha = jnp.exp(m_prev - m_new)
            pexp = jnp.exp(s - m_new)                             # [G, ps]
            l_new = alpha * l_prev + jnp.sum(pexp, axis=-1, keepdims=True)

            if mode == CacheMode.DEFAULT:
                v = v_ref[0, :, h * D:(h + 1) * D].astype(jnp.float32)
                pv = jnp.dot(pexp, v, preferred_element_type=jnp.float32)
            else:
                v_scale = vq_ref[0, 2 * h][:ps]
                v_zero = vq_ref[0, 2 * h + 1][:ps]
                pexp_s = pexp * v_scale[None, :]
                zero_term = jnp.dot(pexp, v_zero[:, None],
                                    preferred_element_type=jnp.float32)
                if mode == CacheMode.UINT4:
                    D2 = D // 2
                    p32 = v_ref[0, :, h * D2:(h + 1) * D2].astype(jnp.int32)
                    v_lo = (p32 & 0xF).astype(jnp.float32)
                    v_hi = ((p32 >> 4) & 0xF).astype(jnp.float32)
                    pv_lo = jnp.dot(pexp_s, v_lo,
                                    preferred_element_type=jnp.float32)
                    pv_hi = jnp.dot(pexp_s, v_hi,
                                    preferred_element_type=jnp.float32)
                    pv = jnp.concatenate([pv_lo + zero_term,
                                          pv_hi + zero_term], axis=-1)
                else:
                    v = v_ref[0, :, h * D:(h + 1) * D].astype(jnp.float32)
                    pv = jnp.dot(pexp_s, v,
                                 preferred_element_type=jnp.float32)
                    pv = pv + zero_term

            acc_ref[h * G:(h + 1) * G] = \
                acc_ref[h * G:(h + 1) * G] * alpha + pv
            m_ref[h * G:(h + 1) * G] = m_new
            l_ref[h * G:(h + 1) * G] = l_new

    @pl.when(p == pl.num_programs(1) - 1)
    def _finish():
        l = l_ref[:]
        l_safe = jnp.where(l == 0.0, 1.0, l)
        o_ref[0] = (acc_ref[:] / l_safe).astype(o_ref.dtype)


def paged_attention(q: jnp.ndarray, cache: KVCache, mode: CacheMode,
                    page_tables: jnp.ndarray, lens: jnp.ndarray,
                    scale: float, interpret: bool = None) -> jnp.ndarray:
    """Decode attention over the paged KV pool (one layer).

    q: [B, H, D]; page_tables: [B, maxP] this layer's physical page ids;
    lens: [B] tokens to attend over. Returns [B, H, D].
    """
    B, H, D = q.shape
    P, ps, KHDs = cache.k.shape
    quant = mode != CacheMode.DEFAULT
    if quant:
        KH = cache.k_qparams.shape[1] // 2
    else:
        KH = KHDs // D
    G = H // KH
    maxP = page_tables.shape[1]

    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    def page_index(b, p, pt_ref, lens_ref):
        num_pages_b = pl.cdiv(lens_ref[b], ps)
        pp = jnp.minimum(p, jnp.maximum(num_pages_b - 1, 0))
        return (pt_ref[b, pp], 0, 0)

    def qparam_index(b, p, pt_ref, lens_ref):
        num_pages_b = pl.cdiv(lens_ref[b], ps)
        pp = jnp.minimum(p, jnp.maximum(num_pages_b - 1, 0))
        return (pt_ref[b, pp], 0, 0)

    q_spec = pl.BlockSpec((1, H, D), lambda b, p, pt, ln: (b, 0, 0))
    kv_spec = pl.BlockSpec((1, ps, KHDs), page_index)
    o_spec = pl.BlockSpec((1, H, D), lambda b, p, pt, ln: (b, 0, 0))

    in_specs = [q_spec, kv_spec, kv_spec]
    args = [q, cache.k, cache.v]
    if quant:
        # whole [2*KH, QL] qparam row per page (QL = round_up(ps, 128):
        # the pool's 128-padded lane dim, runtime/kv_cache.py)
        qp_spec = pl.BlockSpec((1, 2 * KH, cache.k_qparams.shape[2]),
                               qparam_index)
        in_specs += [qp_spec, qp_spec]
        args += [cache.k_qparams, cache.v_qparams]

    def kernel(*refs):
        pt_ref, lens_ref = refs[0], refs[1]
        if quant:
            q_r, k_r, v_r, kq_r, vq_r = refs[2:7]
            o_r = refs[7]
            scratch = refs[8:]
        else:
            q_r, k_r, v_r = refs[2:5]
            kq_r = vq_r = None
            o_r = refs[5]
            scratch = refs[6:]
        _kernel(pt_ref, lens_ref, q_r, k_r, v_r, kq_r, vq_r, o_r, *scratch,
                scale=scale, mode=mode, kv_heads=KH, q_per_kv=G)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(B, maxP),
        in_specs=in_specs,
        out_specs=o_spec,
        scratch_shapes=[
            pltpu.VMEM((H, 1), jnp.float32),   # m
            pltpu.VMEM((H, 1), jnp.float32),   # l
            pltpu.VMEM((H, D), jnp.float32),   # acc
        ],
    )

    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, H, D), q.dtype),
        interpret=interpret,
    )(page_tables.astype(jnp.int32), lens.astype(jnp.int32), *args)

    return out
