"""Activation quantization paths: A8W8 (int8 x int8) and FP8A8W8.

Reference (SURVEY.md §2.11, docs/sphinx/quant/weight_activate_quant.rst):
activation quantization is SYMMETRIC; weights for the activation-quant GEMMs
are symmetric per-channel (csrc/core/kernel/cuda/gemm_lowp A8W8 kernels,
GemmA8W8 / GemmFP8A8W8 ops). Here:

  A8W8:    x is quantized per token to int8 (symmetric, dynamic), the GEMM
           runs int8 x int8 -> int32 on the MXU, and the f32 result is
           x_scale[t] * w_scale[n] * acc. This is the reference's
           DynamicQuantizeMatmul fused path.
  FP8A8W8: weights stored float8_e4m3fn with per-channel scale; activations
           cast to fp8 at matmul time. Falls back to the A8W8 int8 path on
           chips without fp8 MXU support (XLA emulates fp8 either way).

The reference also supports a per-phase fallback — A8W8 prefill but
weight-only decode (`decoder_weight_only_`, device_context.h:148-149); on
TPU the int8 MXU path is efficient at every M so no fallback is needed.

Leaf formats (produced by loader/quantize.quantize_params):
  {"w_q8": int8 [*, K, N], "wscale": f32 [*, 1, N]}          A8W8
  {"w_f8": f8e4m3 [*, K, N], "wscale": f32 [*, 1, N]}        FP8A8W8
plus optional {"b": [*, N]}.
"""

from typing import Dict

import jax
import jax.numpy as jnp

_EPS = 1e-8


def quantize_activation_int8(x: jnp.ndarray):
    """Per-token symmetric int8: x [T, K] -> (x_q int8, x_scale [T, 1] f32)."""
    xf = x.astype(jnp.float32)
    amax = jnp.max(jnp.abs(xf), axis=-1, keepdims=True)
    scale = jnp.maximum(amax / 127.0, _EPS)
    x_q = jnp.clip(jnp.round(xf / scale), -127, 127).astype(jnp.int8)
    return x_q, scale


def a8w8_linear(x: jnp.ndarray, wd: Dict, out_dtype=None) -> jnp.ndarray:
    """x: [..., K] float; wd: A8W8 leaf. int8 x int8 -> int32 on the MXU."""
    out_dtype = out_dtype or x.dtype
    orig = x.shape[:-1]
    K = x.shape[-1]
    x2 = x.reshape(-1, K)
    x_q, x_scale = quantize_activation_int8(x2)
    acc = jax.lax.dot_general(
        x_q, wd["w_q8"], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)                # [T, N] int32
    out = acc.astype(jnp.float32) * x_scale * wd["wscale"]
    b = wd.get("b")
    if b is not None:
        out = out + b.astype(jnp.float32)
    return out.astype(out_dtype).reshape(*orig, -1)


def fp8_linear(x: jnp.ndarray, wd: Dict, out_dtype=None) -> jnp.ndarray:
    """x: [..., K] float; wd: FP8 leaf. fp8 x fp8 matmul (XLA lowers to the
    fp8 MXU path where available, emulates otherwise)."""
    out_dtype = out_dtype or x.dtype
    orig = x.shape[:-1]
    K = x.shape[-1]
    x2 = x.reshape(-1, K).astype(jnp.float32)
    amax = jnp.max(jnp.abs(x2), axis=-1, keepdims=True)
    x_scale = jnp.maximum(amax / 448.0, _EPS)            # e4m3 max ~448
    x_f8 = (x2 / x_scale).astype(jnp.float8_e4m3fn)
    acc = jax.lax.dot_general(
        x_f8, wd["w_f8"], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    out = acc * x_scale * wd["wscale"]
    b = wd.get("b")
    if b is not None:
        out = out + b.astype(jnp.float32)
    return out.astype(out_dtype).reshape(*orig, -1)
