"""Mixture-of-experts block.

Reference: `MOE` op (csrc/core/operator/general/moe/moe_op.cpp) — softmax
router, top-k experts, token reorder, batch GEMM via HIE-DNN, plus a shared
("CalcExpert") expert path for Qwen2-MoE.

TPU design: tokens are sorted by expert id and run through
`jax.lax.ragged_dot` over the stacked expert weights `[E, in, out]` — the
MXU-native grouped matmul — then scattered back and combined with router
weights. Falls back to a dense one-hot einsum when ragged_dot is unavailable
(CPU tests).

With weight-only-quantized experts the ragged path re-expands the quantized
weights per output tile (XLA fuses the dequant into every read), which
dominates large prefill buckets; the Pallas grouped fused-dequant kernel
(ops/pallas/grouped_quant_matmul.py) streams each expert's int payload once
instead and is used whenever the layout supports it (DI_MOE_GROUPED=0
disables).
"""

import functools
import os
from typing import Dict, Optional

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


def _grouped_leaf(leaf) -> Optional[Dict]:
    """Kernel-consumable view of an expert leaf [E, K, ...] (per layer):
    the install-time repacked TILE-128 arrays when present, the raw leaf
    when its layout already tiles, else None."""
    from dashinfer_tpu.ops.pallas.grouped_quant_matmul import supports_grouped
    if not isinstance(leaf, dict):
        return None
    if "w_qg" in leaf:
        return {"w_q": leaf["w_qg"], "scale": leaf["scale_g"],
                "zero": leaf["zero_g"]}
    if "w_q" in leaf and supports_grouped(leaf):
        return leaf
    return None


def _use_grouped(lp: Dict, T: int, k: int, E: int) -> bool:
    env = os.environ.get("DI_MOE_GROUPED")
    if env is not None and not int(env):
        return False
    ex = lp["experts"]
    if not all(_grouped_leaf(ex[n]) is not None
               for n in ("gate_proj", "up_proj", "down_proj")):
        return False
    if env is not None:      # forced on: also off-TPU (interpret tests)
        return True
    if jax.default_backend() != "tpu":
        return False
    return T * k >= E  # tiny batches: boundary padding dominates, ragged wins


def _moe_grouped(cfg: ModelConfig, x: jnp.ndarray, lp: Dict,
                 topk_p: jnp.ndarray, topk_i: jnp.ndarray) -> jnp.ndarray:
    from dashinfer_tpu.ops.pallas.grouped_quant_matmul import (
        build_group_layout, default_tm, grouped_quant_matmul)
    moe = cfg.moe
    T, H = x.shape
    E = moe.num_experts
    Im = moe.moe_intermediate_size
    ex = lp["experts"]
    TM = default_tm()
    order, sorted_token, pos, tile_expert = build_group_layout(topk_i, E, TM)
    Mcap = tile_expert.shape[0] * TM
    sorted_w = topk_p.reshape(-1)[order]
    xs = jnp.zeros((Mcap, H), x.dtype).at[pos].set(x[sorted_token])
    g = grouped_quant_matmul(xs, tile_expert, _grouped_leaf(ex["gate_proj"]))
    u = grouped_quant_matmul(xs, tile_expert, _grouped_leaf(ex["up_proj"]))
    h = (_act(cfg, g[:, :Im].astype(jnp.float32))
         * u[:, :Im].astype(jnp.float32)).astype(x.dtype)
    dn = grouped_quant_matmul(h, tile_expert, _grouped_leaf(ex["down_proj"]))
    out = dn[pos, :H] * sorted_w[:, None].astype(dn.dtype)
    return jnp.zeros((T, H), out.dtype).at[sorted_token].add(out)


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

    if _use_grouped(lp, T, E=E, k=k):
        combined = _moe_grouped(cfg, x, lp, topk_p, topk_i)
        return _with_shared(cfg, x, lp, combined).astype(x.dtype)

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
    return _with_shared(cfg, x, lp, combined).astype(x.dtype)


def _with_shared(cfg: ModelConfig, x: jnp.ndarray, lp: Dict,
                 combined: jnp.ndarray) -> jnp.ndarray:
    if "shared_expert" not in lp:
        return combined
    from dashinfer_tpu.ops.linear import linear
    se = lp["shared_expert"]
    sg = _act(cfg, linear(x, se["gate_proj"])) * linear(x, se["up_proj"])
    shared = linear(sg, se["down_proj"])
    if "shared_expert_gate" in lp:
        gate = jax.nn.sigmoid(
            jnp.dot(x.astype(jnp.float32),
                    lp["shared_expert_gate"]["w"].astype(jnp.float32)))
        shared = shared * gate.astype(shared.dtype)
    return combined + shared
