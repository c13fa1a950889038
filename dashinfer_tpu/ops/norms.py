"""Normalization ops.

Reference ops: `LayerNorm`, `LayerNormNoBeta` (= RMSNorm),
`QKLayerNormNoBeta` (Qwen3 per-head QK RMSNorm)
(csrc/core/operator/general/*, SURVEY.md §2.4). On TPU these are plain jnp —
XLA fuses them into neighboring matmuls; no Pallas needed.
"""

import jax.numpy as jnp


def rms_norm(x: jnp.ndarray, weight: jnp.ndarray, eps: float) -> jnp.ndarray:
    """RMSNorm in f32 accumulation, output in x.dtype.

    Matches HF Llama/Qwen semantics: normalize in fp32, scale in model dtype.
    """
    dtype = x.dtype
    xf = x.astype(jnp.float32)
    var = jnp.mean(xf * xf, axis=-1, keepdims=True)
    xf = xf * jnp.reciprocal(jnp.sqrt(var + eps))
    return (xf * weight.astype(jnp.float32)).astype(dtype)


def layer_norm(x: jnp.ndarray, weight: jnp.ndarray, bias: jnp.ndarray,
               eps: float) -> jnp.ndarray:
    dtype = x.dtype
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.var(xf, axis=-1, keepdims=True)
    out = (xf - mean) * jnp.reciprocal(jnp.sqrt(var + eps))
    out = out * weight.astype(jnp.float32) + bias.astype(jnp.float32)
    return out.astype(dtype)
