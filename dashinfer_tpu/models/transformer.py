"""Generic decoder-only transformer over the paged KV cache.

This module replaces the reference's protobuf graph IR + C++ op-walking
executor (csrc/core/model/model.cpp:488-743 runDecoderContext,
:1212-1431 GenerateContinueDecoder): the per-layer op chain
(RMSNorm -> QKV Gemm -> Rotary -> attention -> o-proj -> AllReduce ->
RMSNorm -> gate/up Gemm -> SWiGLU -> down Gemm -> AllReduce) becomes a pure
function scanned over stacked layer weights. Collectives are NOT explicit
ops: tensor parallelism comes from NamedSharding on the weight pytree
(parallel/sharding.py) and XLA inserts the all-reduces.

Layer params are STACKED (leading dim = num_layers) and consumed via
`jax.lax.scan` — one compiled layer body regardless of depth. The KV pool is
carried through the scan and scatter-updated in place.

Two entry points:
  decode_forward : [B] one token per slot, paged attention over the pool.
  prefill_forward: [S] one request's (chunk of) prompt; writes pages, attends
                   causally over (cached prefix + chunk) via page gather.
"""

import dataclasses
import math
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from dashinfer_tpu.config import Activation, CacheMode, ModelConfig, PositionEmbedding
from dashinfer_tpu.ops import attention as attn_ops
from dashinfer_tpu.ops import kv_ops
from dashinfer_tpu.ops.linear import linear
from dashinfer_tpu.ops.moe import moe_block
from dashinfer_tpu.ops.norms import layer_norm, rms_norm
from dashinfer_tpu.ops.rotary import (apply_rope, apply_rope_glm2d,
                                      compute_inv_freq, glm2d_positions,
                                      mrope_cos_sin, rope_cos_sin, _mscale)
from dashinfer_tpu.runtime.kv_cache import KVCache


def _activation(cfg: ModelConfig, x):
    if cfg.activation == Activation.SILU:
        return jax.nn.silu(x)
    if cfg.activation == Activation.GELU:
        return jax.nn.gelu(x, approximate=False)
    if cfg.activation == Activation.GELU_TANH:
        return jax.nn.gelu(x, approximate=True)
    return jax.nn.relu(x)


def _qkv(cfg: ModelConfig, lp: Dict, x: jnp.ndarray, delta=None):
    """x: [T, hidden] -> q [T,H,D], k/v [T,KH,D] with optional QK-RMSNorm
    (Qwen3 QKLayerNormNoBeta, reference qwen_v30.py:228-319). `delta` is the
    LoRA hook: delta(target_name, x) -> [T, out] adapter contribution
    (reference GemmLora/GemmLoraCapsule, SURVEY.md §8.10)."""
    T = x.shape[0]
    H, KH, D = cfg.num_heads, cfg.num_kv_heads, cfg.head_dim

    def lin(name):
        y = linear(x, lp[name])
        if delta is not None:
            y = y + delta(name, x)
        return y

    q = lin("q_proj").reshape(T, H, D)
    k = lin("k_proj").reshape(T, KH, D)
    v = lin("v_proj").reshape(T, KH, D)
    if cfg.qk_norm:
        q = rms_norm(q, lp["q_norm"], cfg.rms_norm_eps)
        k = rms_norm(k, lp["k_norm"], cfg.rms_norm_eps)
    return q, k, v


def _mlp(cfg: ModelConfig, lp: Dict, x: jnp.ndarray, delta=None) -> jnp.ndarray:
    if cfg.moe is not None:
        return moe_block(cfg, x, lp)
    if "fc1" in lp:  # GPT-2 / Bloom / NeoX non-gated MLP
        h = _activation(cfg, linear(x, lp["fc1"]))
        return linear(h, lp["fc2"])
    g = linear(x, lp["gate_proj"])
    u = linear(x, lp["up_proj"])
    if delta is not None:
        g = g + delta("gate_proj", x)
        u = u + delta("up_proj", x)
    h = _activation(cfg, g) * u
    y = linear(h, lp["down_proj"])
    if delta is not None:
        y = y + delta("down_proj", h)
    return y


def _norm(cfg: ModelConfig, w, x):
    """RMSNorm (array leaf) or LayerNorm (dict leaf with bias) — covers the
    reference's LayerNorm / LayerNormNoBeta op pair (SURVEY.md §2.4)."""
    if isinstance(w, dict):
        return layer_norm(x, w["w"], w["b"], cfg.rms_norm_eps)
    return rms_norm(x, w, cfg.rms_norm_eps)


def alibi_slopes(num_heads: int) -> jnp.ndarray:
    """Canonical ALiBi slopes (reference ALiBiPE op, alibi kernels)."""
    import math as _m
    n = 2 ** _m.floor(_m.log2(num_heads))
    base = 2.0 ** (-(2.0 ** -(_m.log2(n) - 3)))
    slopes = [base ** (i + 1) for i in range(n)]
    if n < num_heads:
        extra_base = 2.0 ** (-(2.0 ** -(_m.log2(2 * n) - 3)))
        slopes += [extra_base ** (2 * i + 1) for i in range(num_heads - n)]
    return jnp.asarray(slopes, jnp.float32)


def _attn_scale(cfg: ModelConfig) -> float:
    return 1.0 / math.sqrt(cfg.head_dim)


def _logn_scale(cfg: ModelConfig, pos: jnp.ndarray) -> jnp.ndarray:
    """Qwen v1 logn attention scaling: queries past the training window are
    scaled by log_{train_len}(pos) (reference rotary_op.cpp logn attrs,
    SURVEY.md §5.7c). pos: int32 [...] -> f32 [...]."""
    n = max(cfg.rope_scaling.original_max_position
            or cfg.max_position_embeddings, 2)
    p = jnp.maximum(pos.astype(jnp.float32) + 1.0, 1.0)
    return jnp.where(p > n, jnp.log(p) / math.log(n), 1.0)


def _residual_combine(cfg: ModelConfig, hidden, x, x2, attn_out, mlp_fn):
    """Shared residual wiring: standard pre-LN, NeoX parallel residual, or
    GLM v1 alpha-scaled post-LN residuals. `x`/`x2` are the normed inputs;
    `mlp_fn(y)` runs the MLP on y (second norm computed here when it depends
    on the attention output)."""
    if cfg.glm_residual_alpha:
        a = cfg.glm_residual_alpha
        h = x * a + attn_out
        x2 = x2(h)
        return x2 * a + mlp_fn(x2)
    if cfg.parallel_residual:
        return hidden + attn_out + mlp_fn(x2(hidden))
    h = hidden + attn_out
    x2 = x2(h)
    return h + mlp_fn(x2)


def _lm_logits(cfg: ModelConfig, params: Dict, hidden: jnp.ndarray) -> jnp.ndarray:
    """hidden: [T, hidden] -> f32 logits [T, vocab] (reference GetLastLine +
    lm_head Gemm)."""
    hidden = _norm(cfg, params["norm"], hidden)
    if cfg.tie_word_embeddings:
        w = params["embed_tokens"]["w"].T
        logits = jnp.dot(hidden, w.astype(hidden.dtype),
                         preferred_element_type=jnp.float32)
    else:
        logits = linear(hidden, params["lm_head"], out_dtype=jnp.float32)
    if cfg.final_logit_softcap:
        c = cfg.final_logit_softcap
        logits = jnp.tanh(logits / c) * c
    return logits.astype(jnp.float32)


# --------------------------------------------------------------------------
# decode: one token per active slot
# --------------------------------------------------------------------------

def decode_forward(cfg: ModelConfig, params: Dict, tokens: jnp.ndarray,
                   cache: KVCache, page_tables: jnp.ndarray,
                   lens_before: jnp.ndarray, active: jnp.ndarray,
                   *, mode: CacheMode, use_kernel: bool = True,
                   lora: Optional[Dict] = None,
                   lora_onehot: Optional[jnp.ndarray] = None,
                   pos_offsets: Optional[jnp.ndarray] = None,
                   prompt_lens: Optional[jnp.ndarray] = None
                   ) -> Tuple[jnp.ndarray, KVCache]:
    """tokens: [B] int32; page_tables: [B, maxP] LOGICAL page ids (logical
    page g owns physical pool rows g*L + l per layer l); lens_before: [B]
    tokens already cached (the new token's position). Returns (logits
    [B, vocab] f32, cache)."""
    B = tokens.shape[0]
    ps = cache.page_size
    hidden = params["embed_tokens"]["w"][tokens].astype(params_dtype(params))
    use_rope = cfg.position_embedding not in (PositionEmbedding.ALIBI,
                                              PositionEmbedding.LEARNED)

    # mRoPE decode: all three axes sit at the same scalar position, which
    # equals standard RoPE at (len + rope_delta) (reference mrope decode,
    # hie_allspark_worker.py:31-105). The offset shifts ONLY the rotary
    # position — cache slots are still addressed by the true length.
    rope_pos = lens_before if pos_offsets is None \
        else lens_before + pos_offsets
    pos = lens_before
    if cfg.position_embedding == PositionEmbedding.LEARNED:
        hidden = hidden + params["pos_embed"]["w"][pos].astype(hidden.dtype)
    if "embed_norm" in params:  # Bloom word_embeddings_layernorm
        hidden = _norm(cfg, params["embed_norm"], hidden)
    rot = None
    if use_rope:
        inv_freq = compute_inv_freq(cfg)
        if cfg.rope_glm_2d:
            pl_glm = prompt_lens if prompt_lens is not None else lens_before
            p1, p2 = glm2d_positions(rope_pos, pl_glm)
            cos1, sin1 = rope_cos_sin(p1, inv_freq)
            cos2, sin2 = rope_cos_sin(p2, inv_freq)
            rot = lambda u: apply_rope_glm2d(u, cos1, sin1, cos2, sin2)
        else:
            cos, sin = rope_cos_sin(rope_pos, inv_freq,
                                    _mscale(cfg.rope_scaling))
            rot = lambda u: apply_rope(u, cos, sin, cfg.rope_interleaved)
    lgn = _logn_scale(cfg, rope_pos)[:, None, None] \
        if cfg.rope_scaling.use_logn_attn else None
    slopes = alibi_slopes(cfg.num_heads) \
        if cfg.position_embedding == PositionEmbedding.ALIBI else None

    lens_after = jnp.where(active, lens_before + 1, 0)
    page_col = pos // ps
    offsets = pos % ps
    L = cfg.num_layers
    layer_ids = jnp.arange(L, dtype=jnp.int32)
    scale = _attn_scale(cfg)

    def body(carry, xs):
        hidden, cache = carry
        if lora is not None:
            lp, li, la, lb = xs
            from dashinfer_tpu.lora.manager import apply_lora_batch
            delta = lambda t, x_: apply_lora_batch(
                x_, la[t], lb[t], lora["scale"], lora_onehot)
        else:
            lp, li = xs  # li: scalar layer index
            delta = None
        pt_l = page_tables * L + li  # [B, maxP] physical pool rows
        x = _norm(cfg, lp["input_layernorm"], hidden)
        q, k, v = _qkv(cfg, lp, x, delta)
        if rot is not None:
            q, k = rot(q), rot(k)
        if lgn is not None:
            q = q * lgn
        page_ids = jnp.take_along_axis(pt_l, page_col[:, None], axis=1)[:, 0]
        cache2 = kv_ops.append_decode_kv(cache, mode, k, v, page_ids, offsets,
                                         active)
        attn = attn_ops.paged_attention(
            q, cache2, mode, pt_l, lens_after, scale,
            use_kernel=use_kernel and slopes is None, alibi=slopes)
        attn_flat = attn.reshape(B, -1)
        attn_out = linear(attn_flat, lp["o_proj"])
        if delta is not None:
            attn_out = attn_out + delta("o_proj", attn_flat)
        hidden = _residual_combine(
            cfg, hidden, x,
            lambda h: _norm(cfg, lp["post_attention_layernorm"], h),
            attn_out, lambda y: _mlp(cfg, lp, y, delta))
        return (hidden, cache2), None

    xs = (params["layers"], layer_ids)
    if lora is not None:
        xs = xs + (lora["A"], lora["B"])
    (hidden, cache), _ = jax.lax.scan(body, (hidden, cache), xs)
    logits = _lm_logits(cfg, params, hidden)
    return logits, cache


# --------------------------------------------------------------------------
# prefill: one request's (chunk of) prompt
# --------------------------------------------------------------------------

def prefill_forward(cfg: ModelConfig, params: Dict, tokens: jnp.ndarray,
                    cache: KVCache, page_table: jnp.ndarray,
                    prefix_len: jnp.ndarray, total_len: jnp.ndarray,
                    *, mode: CacheMode, use_kernel: bool = True,
                    embeds: Optional[jnp.ndarray] = None,
                    lora: Optional[Dict] = None,
                    lora_idx: Optional[jnp.ndarray] = None,
                    positions3: Optional[jnp.ndarray] = None
                    ) -> Tuple[jnp.ndarray, KVCache]:
    """tokens: [S] the uncached suffix (padded to the bucket size S);
    page_table: [maxP_bucket] LOGICAL pages covering positions [0, S_kv);
    prefix_len: scalar cached-prefix length (prefix-cache hit or
    previous chunks); total_len: prefix_len + actual new tokens.

    Returns (last-token logits [vocab] f32, cache). `embeds` optionally
    overrides the token embeddings (multimodal RichEmbedding path,
    reference rich_embedding_op.cpp).
    """
    S = tokens.shape[0]
    num_new = total_len - prefix_len
    if embeds is None:
        hidden = params["embed_tokens"]["w"][tokens].astype(params_dtype(params))
    else:
        hidden = embeds
    use_rope = cfg.position_embedding not in (PositionEmbedding.ALIBI,
                                              PositionEmbedding.LEARNED)
    pos = prefix_len + jnp.arange(S, dtype=jnp.int32)
    if cfg.position_embedding == PositionEmbedding.LEARNED:
        maxp = params["pos_embed"]["w"].shape[0]
        hidden = hidden + params["pos_embed"]["w"][
            jnp.clip(pos, 0, maxp - 1)].astype(hidden.dtype)
    if "embed_norm" in params:
        hidden = _norm(cfg, params["embed_norm"], hidden)
    rot = None
    if use_rope:
        inv_freq = compute_inv_freq(cfg)
        if positions3 is not None:
            # Qwen2-VL mRoPE: per-token [3, S] (t/h/w) positions
            cos, sin = mrope_cos_sin(positions3, inv_freq, cfg.mrope_section)
            rot = lambda u: apply_rope(u, cos, sin, cfg.rope_interleaved)
        elif cfg.rope_glm_2d:
            p1, p2 = glm2d_positions(pos, total_len)
            cos1, sin1 = rope_cos_sin(p1, inv_freq)
            cos2, sin2 = rope_cos_sin(p2, inv_freq)
            rot = lambda u: apply_rope_glm2d(u, cos1, sin1, cos2, sin2)
        else:
            cos, sin = rope_cos_sin(pos, inv_freq, _mscale(cfg.rope_scaling))
            rot = lambda u: apply_rope(u, cos, sin, cfg.rope_interleaved)
    lgn = _logn_scale(cfg, pos)[:, None, None] \
        if cfg.rope_scaling.use_logn_attn else None
    slopes = alibi_slopes(cfg.num_heads) \
        if cfg.position_embedding == PositionEmbedding.ALIBI else None
    # prefix-LM (ChatGLM v1): the prompt is bidirectional except its final
    # token; kv positions < total_len - 1 are visible to every query
    bidir_until = total_len - 1 if cfg.prefix_lm else None
    scale = _attn_scale(cfg)
    L = cfg.num_layers
    layer_ids = jnp.arange(L, dtype=jnp.int32)

    def body(carry, xs):
        hidden, cache = carry
        if lora is not None:
            lp, li, la, lb = xs
            from dashinfer_tpu.lora.manager import apply_lora_single
            delta = lambda t, x_: apply_lora_single(
                x_, la[t], lb[t], lora["scale"], lora_idx)
        else:
            lp, li = xs
            delta = None
        pt_l = page_table * L + li  # [maxP_bucket] physical pool rows
        x = _norm(cfg, lp["input_layernorm"], hidden)
        q, k, v = _qkv(cfg, lp, x, delta)
        if rot is not None:
            q, k = rot(q), rot(k)
        if lgn is not None:
            q = q * lgn
        cache2 = kv_ops.append_prefill_kv(cache, mode, k, v, pt_l,
                                          prefix_len, num_new)
        k_full, v_full = kv_ops.gather_kv_pages(cache2, mode, pt_l,
                                                cfg.num_kv_heads, jnp.float32)
        attn = attn_ops.prefill_attention(q, k_full, v_full, prefix_len,
                                          total_len, scale, alibi=slopes,
                                          bidir_until=bidir_until)
        attn_flat = attn.reshape(S, -1)
        attn_out = linear(attn_flat, lp["o_proj"])
        if delta is not None:
            attn_out = attn_out + delta("o_proj", attn_flat)
        hidden = _residual_combine(
            cfg, hidden, x,
            lambda h: _norm(cfg, lp["post_attention_layernorm"], h),
            attn_out, lambda y: _mlp(cfg, lp, y, delta))
        return (hidden, cache2), None

    xs = (params["layers"], layer_ids)
    if lora is not None:
        xs = xs + (lora["A"], lora["B"])
    (hidden, cache), _ = jax.lax.scan(body, (hidden, cache), xs)
    last = jnp.clip(num_new - 1, 0, S - 1)
    last_hidden = jax.lax.dynamic_slice_in_dim(hidden, last, 1, axis=0)
    logits = _lm_logits(cfg, params, last_hidden)[0]
    return logits, cache


def prefill_forward_captured(cfg: ModelConfig, params: Dict,
                             tokens: jnp.ndarray, cache: KVCache,
                             page_table: jnp.ndarray, prefix_len, total_len,
                             *, mode: CacheMode):
    """Arbiter variant of prefill_forward: returns (per-layer hidden states
    [L, S, hid], full-sequence logits [S, V]) — reference per-op dump mode
    (utility/arbiter.h, SURVEY.md §5.2)."""
    S = tokens.shape[0]
    num_new = total_len - prefix_len
    hidden = params["embed_tokens"]["w"][tokens].astype(params_dtype(params))
    use_rope = cfg.position_embedding not in (PositionEmbedding.ALIBI,
                                              PositionEmbedding.LEARNED)
    pos = prefix_len + jnp.arange(S, dtype=jnp.int32)
    if cfg.position_embedding == PositionEmbedding.LEARNED:
        maxp = params["pos_embed"]["w"].shape[0]
        hidden = hidden + params["pos_embed"]["w"][
            jnp.clip(pos, 0, maxp - 1)].astype(hidden.dtype)
    if "embed_norm" in params:
        hidden = _norm(cfg, params["embed_norm"], hidden)
    if use_rope:
        inv_freq = compute_inv_freq(cfg)
        cos, sin = rope_cos_sin(pos, inv_freq, _mscale(cfg.rope_scaling))
    slopes = alibi_slopes(cfg.num_heads) \
        if cfg.position_embedding == PositionEmbedding.ALIBI else None
    scale = _attn_scale(cfg)
    L = cfg.num_layers
    layer_ids = jnp.arange(L, dtype=jnp.int32)

    def body(carry, xs):
        hidden, cache = carry
        lp, li = xs
        pt_l = page_table * L + li
        x = _norm(cfg, lp["input_layernorm"], hidden)
        q, k, v = _qkv(cfg, lp, x)
        if use_rope:
            q = apply_rope(q, cos, sin, cfg.rope_interleaved)
            k = apply_rope(k, cos, sin, cfg.rope_interleaved)
        cache2 = kv_ops.append_prefill_kv(cache, mode, k, v, pt_l,
                                          prefix_len, num_new)
        k_full, v_full = kv_ops.gather_kv_pages(cache2, mode, pt_l,
                                                cfg.num_kv_heads, jnp.float32)
        attn = attn_ops.prefill_attention(q, k_full, v_full, prefix_len,
                                          total_len, scale, alibi=slopes)
        attn_out = linear(attn.reshape(S, -1), lp["o_proj"])
        hidden = _residual_combine(
            cfg, hidden, x,
            lambda h: _norm(cfg, lp["post_attention_layernorm"], h),
            attn_out, lambda y: _mlp(cfg, lp, y))
        return (hidden, cache2), hidden

    (hidden, cache), per_layer = jax.lax.scan(
        body, (hidden, cache), (params["layers"], layer_ids))
    logits = _lm_logits(cfg, params, hidden)
    return per_layer, logits


def params_dtype(params: Dict):
    return params["embed_tokens"]["w"].dtype
