"""Rotary position embeddings (RoPE) with NTK / YaRN / logn / mRoPE variants.

Reference: `Rotary` / `RotaryMulQuery` ops (csrc/core/operator/general/rotary/
rotary_op.cpp) with invfreq types base/chatglm_v2/v3/yarn
(csrc/proto/allspark.proto:78-83) and scaling plumbing in the converters
(qwen_v15.py:224-256). mRoPE for Qwen2-VL consumes per-token [3, seq]
positions + section sizes (rotary_op.h:14-17).

TPU-first notes: frequencies are computed on the fly in f32 inside the jitted
step (tiny VPU work, avoids a [max_len, dim] table in HBM); rotation uses the
half-split convention of HF Llama/Qwen. ChatGLM's interleaved pairs are
handled by an `interleaved` flag.
"""

import functools
import math
from typing import Optional, Tuple

import jax.numpy as jnp

from dashinfer_tpu.config import ModelConfig, RopeScaling


def _base_inv_freq(rotary_dim: int, theta: float) -> jnp.ndarray:
    exponent = jnp.arange(0, rotary_dim, 2, dtype=jnp.float32) / rotary_dim
    return 1.0 / (theta ** exponent)


def _yarn_inv_freq(rotary_dim: int, theta: float, s: RopeScaling) -> jnp.ndarray:
    """YaRN frequency interpolation (per the YaRN paper; reference qwen yarn
    invfreq type allspark.proto:82)."""
    inv_freq = _base_inv_freq(rotary_dim, theta)
    orig = max(s.original_max_position, 1)

    def find_dim(num_rot):
        return (rotary_dim * math.log(orig / (num_rot * 2 * math.pi))) / (
            2 * math.log(theta))

    low = max(math.floor(find_dim(s.beta_fast)), 0)
    high = min(math.ceil(find_dim(s.beta_slow)), rotary_dim // 2 - 1)
    ramp = (jnp.arange(rotary_dim // 2, dtype=jnp.float32) - low) / max(
        high - low, 1e-3)
    ramp = jnp.clip(ramp, 0.0, 1.0)
    # ramp==0 -> pure extrapolation (high freq), ramp==1 -> interpolation
    inv_freq_inter = inv_freq / s.factor
    return inv_freq * (1 - ramp) + inv_freq_inter * ramp


def compute_inv_freq(cfg: ModelConfig, seq_len_hint: int = 0) -> jnp.ndarray:
    """Per-model inverse frequencies [rotary_dim/2] f32."""
    rotary_dim = cfg.rotary_dim or cfg.head_dim
    s = cfg.rope_scaling
    theta = cfg.rope_theta
    if s.kind == "yarn":
        return _yarn_inv_freq(rotary_dim, theta, s)
    if s.kind == "dynamic_ntk" and seq_len_hint > s.original_max_position > 0:
        # dynamic NTK: grow theta with sequence length (Qwen1 style)
        alpha = (s.factor * seq_len_hint / s.original_max_position) - (s.factor - 1)
        theta = theta * alpha ** (rotary_dim / (rotary_dim - 2))
        return _base_inv_freq(rotary_dim, theta)
    inv = _base_inv_freq(rotary_dim, theta)
    if s.kind == "linear":
        inv = inv / s.factor
    return inv


def _mscale(s: RopeScaling) -> float:
    if s.kind != "yarn" or s.factor <= 1.0:
        return 1.0
    if s.attention_factor is not None:
        return s.attention_factor
    return 0.1 * math.log(s.factor) + 1.0


def rope_cos_sin(positions: jnp.ndarray, inv_freq: jnp.ndarray,
                 mscale: float = 1.0) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """cos/sin tables for given positions.

    positions: int32 [...]; returns cos/sin f32 [..., rotary_dim/2].
    """
    angles = positions.astype(jnp.float32)[..., None] * inv_freq
    return jnp.cos(angles) * mscale, jnp.sin(angles) * mscale


def apply_rope(x: jnp.ndarray, cos: jnp.ndarray, sin: jnp.ndarray,
               interleaved: bool = False) -> jnp.ndarray:
    """Rotate head vectors.

    x: [..., num_heads, head_dim]; cos/sin: [..., rotary_dim/2] broadcast
    across the heads dim. Only the first rotary_dim dims are rotated
    (ChatGLM2+ rotates head_dim//2).
    """
    rotary_dim = cos.shape[-1] * 2
    dtype = x.dtype
    cos = cos[..., None, :]
    sin = sin[..., None, :]
    x_rot = x[..., :rotary_dim].astype(jnp.float32)
    x_pass = x[..., rotary_dim:]
    if interleaved:
        x1 = x_rot[..., 0::2]
        x2 = x_rot[..., 1::2]
        o1 = x1 * cos - x2 * sin
        o2 = x2 * cos + x1 * sin
        out = jnp.stack([o1, o2], axis=-1).reshape(x_rot.shape)
    else:
        half = rotary_dim // 2
        x1 = x_rot[..., :half]
        x2 = x_rot[..., half:]
        o1 = x1 * cos - x2 * sin
        o2 = x2 * cos + x1 * sin
        out = jnp.concatenate([o1, o2], axis=-1)
    out = out.astype(dtype)
    if x_pass.shape[-1]:
        out = jnp.concatenate([out, x_pass], axis=-1)
    return out


def apply_rope_glm2d(x: jnp.ndarray, cos1, sin1, cos2, sin2) -> jnp.ndarray:
    """ChatGLM v1 2-D rotary (position_encoding_2d): the head vector is split
    into halves; the first half rotates by the sequence position, the second
    by the block position (reference chatglm_v1 converter; upstream
    modeling_chatglm v1 applies RotaryEmbedding(head_dim//2) per half).

    x: [..., heads, D]; cos*/sin*: [..., D/4] (from rope_cos_sin with
    inv_freq over D/2 dims)."""
    h = x.shape[-1] // 2
    a = apply_rope(x[..., :h], cos1, sin1)
    b = apply_rope(x[..., h:], cos2, sin2)
    return jnp.concatenate([a, b], axis=-1)


def glm2d_positions(pos: jnp.ndarray, prompt_len) -> Tuple[jnp.ndarray,
                                                           jnp.ndarray]:
    """Absolute index -> (position, block position) per ChatGLM v1's gmask
    convention: tokens before the final prompt token (<sop>) sit at
    (i, 0); the final prompt token and everything generated sit at
    (mask_pos, k) with mask_pos = prompt_len - 2 and k = 1, 2, ...."""
    ctx = prompt_len - 1                      # index of <sop>
    mask_pos = jnp.maximum(prompt_len - 2, 0)
    p1 = jnp.where(pos < ctx, pos, mask_pos)
    p2 = jnp.where(pos < ctx, 0, pos - ctx + 1)
    return p1.astype(jnp.int32), p2.astype(jnp.int32)


def mrope_cos_sin(positions_3d: jnp.ndarray, inv_freq: jnp.ndarray,
                  section: Tuple[int, ...]) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Qwen2-VL mRoPE: positions_3d [3, ...] (t/h/w), section = dims per axis
    in units of inv_freq entries (reference mrope_section_* attrs,
    qwen_v15.py:243-251). Returns cos/sin [..., rotary_dim/2]."""
    cos_t, sin_t = rope_cos_sin(positions_3d, inv_freq)  # [3, ..., hd/2]
    idx = []
    for axis, size in enumerate(section):
        idx.extend([axis] * size)
    sel = jnp.asarray(idx, dtype=jnp.int32)  # [rotary_dim/2]
    cos = jnp.take_along_axis(
        cos_t, sel[(None,) * (cos_t.ndim - 1)].astype(jnp.int32), axis=0)
    # take_along_axis over axis 0 with broadcast index
    cos = jnp.squeeze(cos, axis=0) if cos.shape[0] == 1 else cos
    sin = jnp.take_along_axis(
        sin_t, sel[(None,) * (sin_t.ndim - 1)].astype(jnp.int32), axis=0)
    sin = jnp.squeeze(sin, axis=0) if sin.shape[0] == 1 else sin
    return cos, sin
