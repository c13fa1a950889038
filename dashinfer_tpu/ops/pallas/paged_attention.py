"""Pallas paged decode-attention kernel (the "SpanAttention" of this engine).

TPU-native re-design of the reference's span-attention library
(span-attention/src: QK GEMV -> tiled softmax -> QKV weighted sum, with
fused in-kernel dequant of int8/uint4 KV; span_attn.h:83-150): one fused
flash-decoding kernel per layer.

Design:
  grid = (batch, kv_heads, max_pages): the page dimension iterates innermost,
  so Pallas pipelines the K/V page DMAs (HBM -> VMEM) against compute; an
  online-softmax accumulator lives in VMEM scratch across page steps.

  Page indirection rides BlockSpec index_maps over scalar-prefetched page
  tables: block (h, page_table[b, p]) of the flat pool [KH, P, ps, D]. Pages
  past a sequence's length clamp to the last valid page — consecutive equal
  block indices make Pallas skip the re-fetch, so short sequences don't pay
  DMA for the padded tail (same trick as the reference's per-request seqLen[]
  handling).

  Quantized KV (int8 / packed uint4 + per-token-per-head scale/zero,
  reference cache_quant/impl_i8.cuh) is dequantized via the affine-after-dot
  identity: with k = q_int * scale_t + zero_t,
      (q . k_t) = (q . q_int_t) * scale_t + (sum_d q_d) * zero_t
  so the MXU dot runs on the raw int payload (cast bf16) and the per-token
  affine is applied on the [G, ps] score tile — O(G*ps) VPU work instead of
  O(ps*D) dequant. Same trick on the V pass.
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


def _u4_halves(packed: jnp.ndarray):
    """[ps, D/2] uint8 -> (lo [ps, D/2] f32, hi [ps, D/2] f32) — HALVES
    packing (ops/u4pack.py): no interleave reshape, which Mosaic can't lower;
    uint8 casts hop through int32."""
    p32 = packed.astype(jnp.int32)
    lo = (p32 & 0xF).astype(jnp.float32)
    hi = ((p32 >> 4) & 0xF).astype(jnp.float32)
    return lo, hi


def _kernel(pt_ref, lens_ref,              # scalar prefetch
            q_ref, k_ref, v_ref,           # [1,1,G,D], [1,1,ps,D*]
            kq_ref, vq_ref,                # [1,1,ps,2] f32 or None
            o_ref,                         # [1,1,G,D]
            m_ref, l_ref, acc_ref,         # scratch
            *, scale: float, mode: CacheMode):
    b = pl.program_id(0)
    p = pl.program_id(2)
    ps = k_ref.shape[2]
    lens_b = lens_ref[b]
    num_pages_b = pl.cdiv(lens_b, ps)

    @pl.when(p == 0)
    def _init():
        m_ref[:] = jnp.full_like(m_ref, _NEG_INF)
        l_ref[:] = jnp.zeros_like(l_ref)
        acc_ref[:] = jnp.zeros_like(acc_ref)

    @pl.when(p < num_pages_b)
    def _compute():
        q = q_ref[0, 0].astype(jnp.float32)                  # [G, D]

        def dot_nt(a, b):  # a [G, D'], b [ps, D'] -> [G, ps]
            return jax.lax.dot_general(
                a, b, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)

        if mode == CacheMode.DEFAULT:
            k = k_ref[0, 0].astype(jnp.float32)              # [ps, D]
            s = dot_nt(q, k)                                 # [G, ps]
        else:
            if mode == CacheMode.UINT4:
                k_lo, k_hi = _u4_halves(k_ref[0, 0])         # [ps, D/2] x2
                D2 = k_lo.shape[-1]
                s_raw = dot_nt(q[:, :D2], k_lo) + dot_nt(q[:, D2:], k_hi)
            else:
                s_raw = dot_nt(q, k_ref[0, 0].astype(jnp.float32))
            k_scale = kq_ref[0, 0, :, 0]                     # [ps]
            k_zero = kq_ref[0, 0, :, 1]
            q_sum = jnp.sum(q, axis=1, keepdims=True)        # [G, 1]
            s = s_raw * k_scale[None, :] + q_sum * k_zero[None, :]

        s = s * scale
        tok_idx = p * ps + jax.lax.broadcasted_iota(jnp.int32, (1, ps), 1)
        s = jnp.where(tok_idx < lens_b, s, _NEG_INF)

        m_prev = m_ref[:]                                    # [G, 1]
        l_prev = l_ref[:]
        m_cur = jnp.max(s, axis=-1, keepdims=True)
        m_new = jnp.maximum(m_prev, m_cur)
        alpha = jnp.exp(m_prev - m_new)
        pexp = jnp.exp(s - m_new)                            # [G, ps]
        l_new = alpha * l_prev + jnp.sum(pexp, axis=-1, keepdims=True)

        if mode == CacheMode.DEFAULT:
            v = v_ref[0, 0].astype(jnp.float32)              # [ps, D]
            pv = jnp.dot(pexp, v, preferred_element_type=jnp.float32)
        elif mode == CacheMode.UINT4:
            v_lo, v_hi = _u4_halves(v_ref[0, 0])             # [ps, D/2] x2
            v_scale = vq_ref[0, 0, :, 0]
            v_zero = vq_ref[0, 0, :, 1]
            pexp_s = pexp * v_scale[None, :]
            zero_term = jnp.dot(pexp, v_zero[:, None],
                                preferred_element_type=jnp.float32)  # [G, 1]
            pv_lo = jnp.dot(pexp_s, v_lo,
                            preferred_element_type=jnp.float32) + zero_term
            pv_hi = jnp.dot(pexp_s, v_hi,
                            preferred_element_type=jnp.float32) + zero_term
            pv = jnp.concatenate([pv_lo, pv_hi], axis=-1)    # [G, D]
        else:
            v_scale = vq_ref[0, 0, :, 0]
            v_zero = vq_ref[0, 0, :, 1]
            pv = jnp.dot(pexp * v_scale[None, :],
                         v_ref[0, 0].astype(jnp.float32),
                         preferred_element_type=jnp.float32)
            pv = pv + jnp.dot(pexp, v_zero[:, None],
                              preferred_element_type=jnp.float32)

        acc_ref[:] = acc_ref[:] * alpha + pv
        m_ref[:] = m_new
        l_ref[:] = l_new

    @pl.when(p == pl.num_programs(2) - 1)
    def _finish():
        l = l_ref[:]
        l_safe = jnp.where(l == 0.0, 1.0, l)
        o_ref[0, 0] = (acc_ref[:] / l_safe).astype(o_ref.dtype)


def paged_attention(q: jnp.ndarray, cache: KVCache, mode: CacheMode,
                    page_tables: jnp.ndarray, lens: jnp.ndarray,
                    scale: float, interpret: bool = None) -> jnp.ndarray:
    """Decode attention over the paged KV pool (one layer).

    q: [B, H, D]; page_tables: [B, maxP] this layer's physical page ids;
    lens: [B] tokens to attend over. Returns [B, H, D].
    """
    B, H, D = q.shape
    KH, P, ps, _ = cache.k.shape
    G = H // KH
    maxP = page_tables.shape[1]
    quant = mode != CacheMode.DEFAULT

    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    q4 = q.reshape(B, KH, G, D)

    def page_index(b, h, p, pt_ref, lens_ref):
        num_pages_b = pl.cdiv(lens_ref[b], ps)
        pp = jnp.minimum(p, jnp.maximum(num_pages_b - 1, 0))
        return (h, pt_ref[b, pp], 0, 0)

    def qparam_index(b, h, p, pt_ref, lens_ref):
        num_pages_b = pl.cdiv(lens_ref[b], ps)
        pp = jnp.minimum(p, jnp.maximum(num_pages_b - 1, 0))
        return (h, pt_ref[b, pp], 0, 0)

    q_spec = pl.BlockSpec((1, 1, G, D), lambda b, h, p, pt, ln: (b, h, 0, 0))
    kv_dim = cache.k.shape[3]
    kv_spec = pl.BlockSpec((1, 1, ps, kv_dim), page_index)
    o_spec = pl.BlockSpec((1, 1, G, D), lambda b, h, p, pt, ln: (b, h, 0, 0))

    in_specs = [q_spec, kv_spec, kv_spec]
    args = [q4, cache.k, cache.v]
    if quant:
        qp_spec = pl.BlockSpec((1, 1, ps, 2), qparam_index)
        in_specs += [qp_spec, qp_spec]
        args += [cache.k_qparams, cache.v_qparams]
    else:
        in_specs += [None, None]
        args += [None, None]

    # Pack args: pallas needs real arrays; drop the Nones and re-map.
    real_specs = [s for s in in_specs if s is not None]
    real_args = [a for a in args if a is not None]

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
                scale=scale, mode=mode)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(B, KH, maxP),
        in_specs=real_specs,
        out_specs=o_spec,
        scratch_shapes=[
            pltpu.VMEM((G, 1), jnp.float32),   # m
            pltpu.VMEM((G, 1), jnp.float32),   # l
            pltpu.VMEM((G, D), jnp.float32),   # acc
        ],
    )

    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, KH, G, D), q.dtype),
        interpret=interpret,
    )(page_tables.astype(jnp.int32), lens.astype(jnp.int32), *real_args)

    return out.reshape(B, H, D)
