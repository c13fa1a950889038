"""Whole-model decode megakernel: one pallas_call per decode step.

Why this exists: on TPU the dominant decode-step cost is per-kernel and
per-DMA issue overhead, not bytes (measured on v5e: ~1.3 ms per dependent
kernel launch vs ~180 GB/s sustained streaming INSIDE one kernel). The
reference pays the same tax differently — it dedicates a library to decode
attention (span-attention/) and 12k LoC to fused GEMV (gemm_lowp/) to keep
kernel count low per layer. The TPU answer is more radical: the ENTIRE
multi-layer forward for one batched decode step is a single Pallas kernel
that streams every weight chunk through VMEM exactly once via phase-gated
grid pipelining, with paged KV attention and cache append fused in.

Structure (1-D grid, T = L * S_layer + S_lm steps):
  per layer: [qkv chunks | attention step | o chunks | gate/up chunks |
              down chunks]
  then:      [lm_head chunks -> logits blocks]

Each weight stream is one pallas input with a phase-gated BlockSpec
index_map: outside its phase the block index freezes (no refetch), inside it
advances chunk by chunk, so Mosaic's automatic double-buffering streams all
weights back-to-back at HBM speed while the kernel body computes on the
previous chunk.

Attention (reference span-attention, SURVEY.md §2.5): the host/jit passes a
flat page schedule (slot, page-ordinal) covering every active sequence; the
attention step ring-DMAs pages of the page-major pool [P, ps, KH*D] (one
descriptor per page covers all kv heads) and runs online softmax per
(slot, kv-head) with int8/uint4 dequant fused via the affine-after-dot
identity. The new token's K/V never round-trips through HBM for its own
step: it is held in VMEM, attended directly, stashed per layer, and flushed
once at the end with ONE aliased read-modify-write window per sequence per
pool (layers of a logical page are contiguous: rows g*L .. g*L+L).

Quantized weights (reference gemm_lowp regime, SURVEY.md §8.2): group-wise
asymmetric u4/i8; the MXU dot runs on the raw int payload cast to bf16 and
the per-group affine runs on the [B, cN] result tile (batched per-group dot,
out = sum_g (x_g @ q_g) * scale_g + xsum_g * zero_g).
"""

import dataclasses
import functools
import math
import os
from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from dashinfer_tpu.config import CacheMode, ModelConfig, RuntimeConfig

PACK_VERSION = 6   # bump when plan geometry / packed layout changes

_NEG_INF = float(jnp.finfo(jnp.float32).min)
_RMW_W = 8          # aligned row window for in-place pool writes
_RING = 4           # page-DMA ring depth per pool
_DEBUG = bool(__import__("os").environ.get("DI_MK_DEBUG"))


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


@dataclasses.dataclass(frozen=True)
class StreamPlan:
    """One weight stream (qkv / o / gu / dn / lm)."""

    name: str
    bits: int            # 4, 8, or 16 (bf16)
    K: int               # real contraction dim
    N: int               # real output dim
    Kp: int              # padded (dn: chunked) contraction dim
    Np: int              # padded output dim
    chunk: int           # chunk size along the chunked dim
    S: int               # number of chunks
    gs: int              # quant group size (0 for bf16)
    chunk_axis: str      # "n" (K full per chunk) or "k" (dn)

    @property
    def store_cols(self) -> int:
        """Stored lane count of a chunk's payload."""
        w = self.chunk if self.chunk_axis == "n" else self.Np
        return w // 2 if self.bits == 4 else w


def _plan_stream(name: str, bits: int, K: int, N: int, gs: int,
                 target_bytes: int, chunk_axis: str = "n") -> StreamPlan:
    if chunk_axis == "n":
        Kp = K  # K must already be 128-aligned for lane slicing upstream
        per_col = Kp * (0.5 if bits == 4 else 1 if bits == 8 else 2)
        step = 256 if bits == 4 else 128
        chunk = max(step, int(target_bytes / per_col) // step * step)
        chunk = min(chunk, _round_up(N, step))
        S = -(-N // chunk)
        # equalize chunks across S so Np padding (dead DMA bytes) is minimal
        chunk = _round_up(-(-N // S), step)
        Np = S * chunk
        return StreamPlan(name, bits, K, N, Kp, Np, chunk, S, gs, "n")
    # chunk over K rows (down proj)
    Np = _round_up(N, 128)
    per_row = Np * (0.5 if bits == 4 else 1 if bits == 8 else 2)
    # per-channel (gs >= K, one group spanning every chunk): chunks need no
    # group alignment — each chunk applies the shared [1, Np] affine and the
    # accumulated zero terms sum to xsum_total * z across chunks
    step = 128 if (gs == 0 or gs >= K) else max(gs, 128)
    # rows must also satisfy int8 sublane packing (32) — gs>=32 covers it
    chunk = max(step, int(target_bytes / per_row) // step * step)
    chunk = min(chunk, _round_up(K, step))
    S = -(-K // chunk)
    chunk = _round_up(-(-K // S), step)
    Kp = S * chunk
    return StreamPlan(name, bits, K, N, Kp, Np, chunk, S, gs, "k")


def _plan_interleave(prefix: str, bits: int, gs_g: int, gs_d: int,
                     m_inter: int, hid: int, target_chunk_bytes: int):
    """ONE shared chunk width over `inter` for gate/up/down (the trio's
    total bytes per step ~ target): g/u n-chunked, d k-chunked with
    chunk == cols. Shared with the prefill megakernel so one pack serves
    both kernels."""
    step = 256 if bits == 4 else 128
    # the down stream is k-chunked over `inter`: its qparam addressing
    # needs chunks group-aligned (chunk % gs == 0) unless the whole K is
    # one group — mirror _plan_stream's step=max(gs, ...) rule (a
    # group_size-256 checkpoint would otherwise hit chunk < gs and
    # pack_params' qparam reshape fails)
    if 0 < gs_d < m_inter:
        step = max(step, gs_d)
    per_col = hid * (0.5 if bits == 4 else 1 if bits == 8 else 2) * 3
    cols = max(step, int(target_chunk_bytes / per_col) // step * step)
    cols = min(cols, _round_up(m_inter, step))
    Smd = -(-m_inter // cols)
    cols = _round_up(-(-m_inter // Smd), step)
    Smd = -(-m_inter // cols)
    interp = Smd * cols
    g = StreamPlan(prefix + "g", bits, hid, m_inter, hid, interp, cols,
                   Smd, gs_g, "n")
    u = dataclasses.replace(g, name=prefix + "u")
    d = StreamPlan(prefix + "d", bits, m_inter, hid, interp,
                   _round_up(hid, 128), cols, Smd, gs_d, "k")
    return g, u, d


@dataclasses.dataclass(frozen=True)
class MegaPlan:
    B: int
    L: int
    hid: int
    H: int
    KH: int
    D: int
    G: int
    G8: int
    inter: int
    QKVN: int
    ps: int
    maxP: int
    MAXPG: int
    Vp: int
    kv_mode: CacheMode
    kv_bits: int          # 16 / 8 / 4
    kv_dtype_name: str    # payload dtype ("bfloat16"/"float32"/"int8"/"uint8")
    has_qkv_bias: bool
    qkv: StreamPlan
    o: StreamPlan
    gu: StreamPlan
    dn: StreamPlan
    lm: StreamPlan
    rms_eps: float
    # Qwen3 per-head QK RMSNorm (reference QKLayerNormNoBeta,
    # qwen_v30.py:228-319) fused into the attention phase
    qk_norm: bool = False
    # ALiBi positions (reference ALiBiPE op; Baichuan-13B): no rotary,
    # score += slope_h * (k_pos - q_pos) in the attention page loop
    alibi: bool = False
    # Attention page loop granularity: each loop iteration consumes
    # page_chunk consecutive pages of ONE sequence (schedule padded per
    # sequence with masked dummy entries). >1 amortizes the per-iteration
    # fixed costs (masks, online-softmax state updates, tiny [G8, ps]
    # score tiles) that dominate at large batch x context.
    page_chunk: int = 1
    # MoE (reference MOE op + CalcExpert shared expert, moe_op.cpp): when
    # E > 0 the gu/dn streams are PER-EXPERT (every expert's weights stream
    # through every step; non-selected experts contribute with gate 0 — zero
    # extra bytes, the stream is the cost), sgu/sdn are the shared expert,
    # and a router phase computes softmax top-k gates in-kernel.
    E: int = 0
    k_top: int = 0
    norm_topk: bool = False
    has_shared: bool = False
    has_shared_gate: bool = False
    EP: int = 128                  # router lane padding (E + shared gate col)
    sgu: Optional[StreamPlan] = None
    sdn: Optional[StreamPlan] = None
    shared_inter: int = 0
    # Interleaved-MLP mode (pg/pu/pd set): gate/up/down stream one shared
    # chunk width over `inter` and each grid step runs all three dots
    # (act_c = silu(x@G_c) * (x@U_c); acc += act_c @ D_c) — the PREFILL
    # megakernel's exact stream geometry, so ONE packed weight set serves
    # both kernels (reference shares one weight set between its prefill
    # and decode workers, engine_worker.cpp:103-117). The fused gu/dn
    # layout remains for the TP segment kernels.
    pg: Optional[StreamPlan] = None
    pu: Optional[StreamPlan] = None
    pd: Optional[StreamPlan] = None
    psg: Optional[StreamPlan] = None
    psu: Optional[StreamPlan] = None
    psd: Optional[StreamPlan] = None

    @property
    def interleave(self) -> bool:
        return self.pg is not None

    @property
    def S_layer(self) -> int:
        if self.interleave:
            if self.E:
                s = self.qkv.S + 1 + self.o.S + 1 + self.E * self.pg.S
                if self.has_shared:
                    s += self.psg.S
                return s
            return self.qkv.S + 1 + self.o.S + self.pg.S
        if self.E:
            s = self.qkv.S + 1 + self.o.S + 1 + \
                self.E * (self.gu.S + self.dn.S)
            if self.has_shared:
                s += self.sgu.S + self.sdn.S
            return s
        return self.qkv.S + 1 + self.o.S + self.gu.S + self.dn.S

    @property
    def T_total(self) -> int:
        return self.L * self.S_layer + self.lm.S

    # phase bases within a layer
    @property
    def base_qkv(self) -> int:
        return 0

    @property
    def base_att(self) -> int:
        return self.qkv.S

    @property
    def base_o(self) -> int:
        return self.qkv.S + 1

    @property
    def base_router(self) -> int:      # MoE only
        return self.base_o + self.o.S

    @property
    def base_exp(self) -> int:         # MoE only
        return self.base_router + 1

    @property
    def base_sgu(self) -> int:         # MoE only
        return self.base_exp + self.E * (self.gu.S + self.dn.S)

    @property
    def base_sdn(self) -> int:         # MoE only
        return self.base_sgu + self.sgu.S

    @property
    def base_gu(self) -> int:
        return self.base_o + self.o.S

    @property
    def base_dn(self) -> int:
        return self.base_gu + self.gu.S

    @property
    def base_mlp(self) -> int:         # interleave mode, dense
        return self.base_o + self.o.S

    @property
    def base_shared(self) -> int:      # interleave mode, MoE
        return self.base_exp + self.E * self.pg.S

    @property
    def kv_store_dim(self) -> int:
        return self.D // 2 if self.kv_bits == 4 else self.D


def pack_cache_key_fields(plan: MegaPlan) -> tuple:
    """The plan fields the PACKED ARRAYS depend on — excludes batch, page
    geometry, and KV mode (all irrelevant to the weight relayout), so a
    batch sweep or KV-mode change reuses one multi-GB cached pack."""
    return (PACK_VERSION, plan.L, plan.hid, plan.H, plan.KH, plan.D,
            plan.Vp, plan.has_qkv_bias, plan.qk_norm, plan.alibi,
            plan.E, plan.EP, plan.k_top, plan.norm_topk, plan.has_shared,
            plan.has_shared_gate, plan.shared_inter,
            plan.qkv, plan.o, plan.gu, plan.dn, plan.lm,
            plan.sgu, plan.sdn, plan.pg, plan.pu, plan.pd,
            plan.psg, plan.psu, plan.psd)


def _weight_bits(leaf) -> int:
    if not isinstance(leaf, dict) or "w_q" not in leaf:
        return 16   # raw array (MoE expert stack) or {"w": ...}
    return 8 if leaf["w_q"].dtype == jnp.int8 else 4


def weight_only_decode_view(params: Dict) -> Optional[Dict]:
    """Reference `decoder_weight_only_` behavior (device_context.h:87-89,
    148-149): an A8W8 model runs activation-quant GEMMs in prefill but falls
    back to WEIGHT-ONLY GEMV in decode. Here: re-express each symmetric
    per-channel int8 leaf {w_q8 [.., K, N], wscale [.., 1, N]} in the
    megakernel's asymmetric format with PER-CHANNEL scales (groups == 1,
    zero=0) — exact, and the stream runs the loop-free single-affine
    epilogue.

    Returns params untouched when no a8w8 leaves exist, a converted shallow
    copy when they do, or None when the model can't take the weight-only
    path (fp8 payloads; K not 128-aligned)."""
    import numpy as np

    def convert(leaf):
        if not isinstance(leaf, dict) or "w_q8" not in leaf:
            return leaf
        w = np.asarray(leaf["w_q8"])
        s = np.asarray(leaf["wscale"], np.float32)
        K = w.shape[-2]
        if K % 128:
            raise ValueError
        gshape = s.shape[:-2] + (1, s.shape[-1])
        out = {"w_q": w,
               "scale": np.asarray(s).reshape(gshape),
               "zero": np.zeros(gshape, np.float32)}
        if "b" in leaf:
            out["b"] = leaf["b"]
        return out

    try:
        found = False
        new_layers = {}
        for name, leaf in params["layers"].items():
            if isinstance(leaf, dict) and "w_f8" in leaf:
                return None
            nl = convert(leaf)
            found |= nl is not leaf
            new_layers[name] = nl
        lm = params.get("lm_head")
        if isinstance(lm, dict) and "w_f8" in lm:
            return None
        new_lm = convert(lm) if isinstance(lm, dict) else lm
        found |= new_lm is not lm
        if not found:
            return params
        out = dict(params)
        out["layers"] = new_layers
        if new_lm is not lm:
            out["lm_head"] = new_lm
        return out
    except (ValueError, KeyError):
        return None


def expand_u4_to_i8(params: Dict, meta_only: bool = False) -> Optional[Dict]:
    """Pack-time u4 -> per-channel-i8 re-expansion ("serve u4 checkpoints
    through the i8 stream").

    The decode megakernel is VPU-dequant-bound on the u4 stream: the
    AND/convert chain plus the G-sequential per-group affine epilogue holds
    the effective weight-stream rate to ~1/3 of the chip's DMA rate
    (docs/megakernel.md, round-3 attribution). Re-expressing each group-wise
    asymmetric u4 leaf as a PER-CHANNEL asymmetric int8 leaf doubles the
    streamed bytes but (a) cuts per-element dequant to one int8->bf16
    convert and (b) collapses the per-group epilogue to a single
    scale-multiply + zero-point dot (groups == 1), so the step becomes
    DMA/MXU-bound. This mirrors the reference's decode-phase weight-only
    regime change (`decoder_weight_only_`, device_context.h:148-149) — a
    deliberate precision trade between phases, applied batch-aware by the
    runtime (large batches amortize the extra bytes; small batches keep u4).

    Requantization error: per channel the i8 grid has 255 steps across the
    channel's full range while u4 has 15 steps per 128-row group — unless
    one group's range exceeds ~17x another's within the same channel, the
    added error is below the u4 quantization error already present.

    meta_only=True builds shape/dtype-correct leaves with zero payloads
    (calloc — no dequant work) for make_plan/supports when the real
    expansion is deferred behind a pack cache hit.

    Returns a converted shallow copy, or None when params contain no
    convertible u4 leaves."""

    def convert(leaf):
        if not isinstance(leaf, dict) or "w_q" not in leaf or \
                leaf["w_q"].dtype == np.int8:
            return leaf
        wq = np.asarray(leaf["w_q"])
        s = np.asarray(leaf["scale"], np.float32)
        z = np.asarray(leaf["zero"], np.float32)
        lead = wq.shape[:-2]                       # (), (L,) or (L, E)
        K, N2 = wq.shape[-2], wq.shape[-1]
        N = 2 * N2
        if meta_only:
            out = {"w_q": np.zeros(lead + (K, N), np.int8),
                   "scale": np.zeros(lead + (1, N), np.float32),
                   "zero": np.zeros(lead + (1, N), np.float32)}
            if "b" in leaf:
                out["b"] = leaf["b"]
            return out
        out_q = np.empty(lead + (K, N), np.int8)
        out_s = np.empty(lead + (1, N), np.float32)
        out_z = np.empty(lead + (1, N), np.float32)
        G = s.shape[-2]
        gs = K // G
        for idx in np.ndindex(lead if lead else (1,)):
            sl = idx if lead else ()
            q = _unpack_u4(wq[sl]).astype(np.float32)          # [K, N]
            w = q * np.repeat(s[sl], gs, axis=0) + \
                np.repeat(z[sl], gs, axis=0)
            wmin = w.min(axis=0)
            wmax = w.max(axis=0)
            s8 = np.maximum((wmax - wmin) / 255.0, 1e-8)
            out_q[sl] = np.clip(np.rint((w - wmin) / s8) - 128.0,
                                -128, 127).astype(np.int8)
            out_s[sl] = s8[None]
            out_z[sl] = (wmin + 128.0 * s8)[None]
        out = {"w_q": out_q, "scale": out_s, "zero": out_z}
        if "b" in leaf:
            out["b"] = leaf["b"]
        return out

    found = False

    def walk(tree):
        nonlocal found
        if isinstance(tree, dict) and "w_q" in tree:
            nl = convert(tree)
            found |= nl is not tree
            return nl
        if isinstance(tree, dict):
            return {k: walk(v) for k, v in tree.items()}
        return tree

    out = walk(params)
    return out if found else None


def _expert_leaf_bits(leaf) -> int:
    return _weight_bits(leaf)


def _expert_gs(leaf, K: int) -> int:
    """Group size of a (possibly quantized) expert stack [L, E, ...]."""
    if not isinstance(leaf, dict) or "w_q" not in leaf:
        return 0
    G = leaf["scale"].shape[2]
    return K if G == 1 else K // G


def _moe_supports(cfg: ModelConfig, lp: Dict) -> bool:
    moe = cfg.moe
    if moe.mlp_only_layers:
        return False                 # mixed dense/MoE layer scan
    # router lanes = experts (+1 shared-gate col when present); EP pads to
    # 128-lane multiples — Qwen3-MoE's 128 experts (no shared gate) fit
    # exactly, Qwen1.5-MoE's 60+1 pad to 128
    lanes = moe.num_experts + (1 if moe.shared_expert_intermediate_size
                               else 0)
    if lanes > 512:
        return False
    if moe.num_experts_per_tok > 8:
        return False
    ex = lp.get("experts")
    if not isinstance(ex, dict):
        return False
    for name in ("gate_proj", "up_proj", "down_proj"):
        leaf = ex.get(name)
        if leaf is None or (isinstance(leaf, dict) and
                            ("w_q8" in leaf or "w_f8" in leaf)):
            return False
    if _expert_leaf_bits(ex["gate_proj"]) != _expert_leaf_bits(ex["up_proj"]):
        return False
    Im = moe.moe_intermediate_size
    hid = cfg.hidden_size
    for name, K in (("gate_proj", hid), ("up_proj", hid),
                    ("down_proj", Im)):
        gs = _expert_gs(ex[name], K)
        if gs and gs % 128 and gs != K:
            return False
    if moe.shared_expert_intermediate_size:
        se = lp.get("shared_expert")
        if not isinstance(se, dict):
            return False
        sIm = moe.shared_expert_intermediate_size
        for name, K in (("gate_proj", hid), ("up_proj", hid),
                        ("down_proj", sIm)):
            leaf = se.get(name)
            if leaf is None or "w_q8" in leaf or "w_f8" in leaf or \
                    "b" in leaf:
                return False
            if "w_q" in leaf:
                gs = K // leaf["scale"].shape[1]
                if gs % 128 and gs != K:
                    return False
        if _weight_bits(se["gate_proj"]) != _weight_bits(se["up_proj"]):
            return False
    if "router" not in lp:
        return False
    return True


def supports(cfg: ModelConfig, rt: RuntimeConfig, params: Dict) -> bool:
    """Eligibility for the megakernel fast path (fallback otherwise)."""
    try:
        lp = params["layers"]
        moe = cfg.moe is not None
        if moe:
            if not _moe_supports(cfg, lp):
                return False
        else:
            for name in ("gate_proj", "down_proj"):
                if "w_q8" in lp[name] or "w_f8" in lp[name]:
                    return False
        for name in ("q_proj", "o_proj"):
            if "w_q8" in lp[name] or "w_f8" in lp[name]:
                return False  # activation-quant leaves take the XLA path
        if cfg.qk_norm:
            # fused per-head RMS needs plain [D] norm weights
            qn = lp.get("q_norm")
            if qn is None or isinstance(qn, dict) or "k_norm" not in lp:
                return False
        if cfg.head_dim != 128:
            return False
        if cfg.hidden_size % 128 or (cfg.num_heads * cfg.head_dim) % 128:
            return False
        pe = cfg.position_embedding.value
        if pe == "rope":
            if cfg.rope_interleaved:
                return False
        elif pe == "alibi":
            # ALiBi fast path needs RMSNorm leaves (plain arrays); Bloom's
            # LayerNorm (dict w/b) takes the XLA fallback
            if isinstance(lp["input_layernorm"], dict):
                return False
        else:
            return False
        if cfg.rope_glm_2d or cfg.glm_residual_alpha or cfg.prefix_lm:
            return False
        if cfg.rotary_dim and cfg.rotary_dim != cfg.head_dim:
            return False
        if cfg.final_logit_softcap:
            return False
        if cfg.rope_scaling.use_logn_attn:
            return False
        if rt.cache.page_size % _RMW_W:
            return False
        if rt.max_batch > 64:
            return False
        # UINT4 KV with KH*D/2 < 128: the RMW merge's int8 [L, F] store
        # into [B, L, W, F] scratch needs a (L,F)->(1,L,1,F) relayout that
        # Mosaic only lowers when F fills a 128-lane tile (verified on
        # v5e: "infer-vector-layout: unsupported shape cast" at F=64).
        # Single-KV-head u4 models take the XLA path instead.
        if rt.cache.mode == CacheMode.UINT4 and \
                cfg.num_kv_heads * (cfg.head_dim // 2) < 128:
            return False
        if not moe:
            for name in ("gate_proj", "up_proj", "down_proj"):
                if "b" in lp[name]:
                    return False
            if _weight_bits(lp["gate_proj"]) != _weight_bits(lp["up_proj"]):
                return False
        if "b" in lp["o_proj"]:
            return False
        # uniform bits within the fused qkv stream
        for name in ("q_proj", "k_proj", "v_proj"):
            if _weight_bits(lp[name]) != _weight_bits(lp["q_proj"]):
                return False
        # group sizes must divide the 128-aligned chunking
        gnames = ("q_proj", "o_proj") if moe else \
            ("q_proj", "o_proj", "gate_proj", "down_proj")
        for name in gnames:
            leaf = lp[name]
            if "w_q" in leaf:
                K = leaf["w_q"].shape[1]
                gs = K // leaf["scale"].shape[1]
                if gs % 128 and gs != K:
                    return False
        if cfg.tie_word_embeddings and "w_q" in params.get("lm_head", {}):
            return False
        return True
    except Exception:
        return False


def _scratch_bytes_estimate(B, L, hid, H, KH, D, G8, inter, QKVN, ps,
                            kv_bytes) -> int:
    HD = H * D
    b_dep = B * (hid * 4 + hid * 2 + QKVN * 4 + KH * G8 * D * (2 + 4)
                 + KH * G8 * 128 * 4                 # ml_st lane padding
                 + HD * 2 + 2 * inter * 2 + hid * 4
                 + L * KH * D * kv_bytes * 2 + L * 2 * KH * 4 * 2
                 + 12 * HD + 2 * 2 * KH * D * 4)  # + rope tiles (f32, dbuf)
    QLe = -(-ps // 128) * 128  # qparam rows are 128-lane padded
    rings = 2 * _RING * ps * KH * D * kv_bytes + \
        2 * _RING * max(2 * KH, 8) * QLe * 4
    # slot-chunked flush ring: RNG2*SC windows live, not B (see the
    # DI_MK_RMW_SLOTS block in build_decode_megakernel)
    sc = max(1, min(B, int(os.environ.get("DI_MK_RMW_SLOTS", "16"))))
    rng2 = min(-(-B // sc), 2)
    rmw = rng2 * sc * (2 * L * _RMW_W * KH * D * kv_bytes +
                       2 * L * max(2 * KH, 8) * 128 * 4)
    return b_dep + rings + rmw


def make_plan(cfg: ModelConfig, rt: RuntimeConfig, params: Dict,
              target_chunk_bytes: int = 0,
              interleave_mlp: bool = False) -> MegaPlan:
    lp = params["layers"]
    hid = cfg.hidden_size
    H, KH, D = cfg.num_heads, cfg.num_kv_heads, cfg.head_dim
    QKVN = (H + 2 * KH) * D
    inter = cfg.intermediate_size
    V = cfg.vocab_size
    env_target = __import__("os").environ.get("DI_MK_CHUNK_BYTES")
    if env_target:
        target_chunk_bytes = int(env_target)
    if not target_chunk_bytes:
        # fit double-buffered chunks of 5 streams in VMEM next to the scratch.
        # Measured on v5e (bench config, bs=16): chunk size barely moves the
        # step time between ~0.5 MB and ~2 MB — the bottleneck is the
        # per-byte dequant+dot rate, not per-grid-step overhead. But the
        # grouped-dequant dot materializes [groups, B, cols] f32 temporaries
        # that scale with BATCH: at bs=32 a 2 MB chunk collapses the kernel
        # 14.6 -> 60 ms (Mosaic VMEM spill). Swept at bs=32 (multi-step e2e):
        # 768 KB -> 894 tok/s, 1 MB -> 1294 tok/s (sweet spot below the
        # spill cliff); bs=64 at 384 KB collapses again (224 tok/s). Cap
        # chunk bytes at 32 MB / B beyond bs=16.
        G8 = _round_up(H // KH, 8)
        kvb = 2 if rt.cache.mode == CacheMode.DEFAULT else 1
        scratch = _scratch_bytes_estimate(
            rt.max_batch, cfg.num_layers, hid, H, KH, D, G8, inter, QKVN,
            rt.cache.page_size, kvb)
        budget = 72 * (1 << 20) - scratch
        if rt.max_batch >= _GDOT_LOOP_B:
            # looped group-dot epilogue: no [G, B, cols] temporary, so the
            # chunk size no longer needs to shrink with batch
            batch_cap = 2 << 20
        elif rt.max_batch > 16:
            batch_cap = (32 << 20) // max(rt.max_batch, 1)
        else:
            batch_cap = 2 << 20
        target_chunk_bytes = max(1 << 18,
                                 min(2 << 20, batch_cap, budget // 11))

    def gs_of(leaf, K, gaxis=1):
        # stacked layer leaves are [L, G, N] (gaxis=1); unstacked [G, N]
        if "w_q" not in leaf:
            return 0
        g = leaf["scale"].shape[gaxis]
        return K if g == 1 else K // g

    qkv = _plan_stream("qkv", _weight_bits(lp["q_proj"]), hid, QKVN,
                       gs_of(lp["q_proj"], hid), target_chunk_bytes)
    o = _plan_stream("o", _weight_bits(lp["o_proj"]), H * D, hid,
                     gs_of(lp["o_proj"], H * D), target_chunk_bytes)
    while hid % o.chunk:  # o chunks accumulate straight into the residual
        o = dataclasses.replace(o, chunk=o.chunk - (256 if o.bits == 4
                                                    else 128))
        o = dataclasses.replace(o, S=-(-hid // o.chunk), Np=hid)
    o = dataclasses.replace(o, S=hid // o.chunk, Np=hid)
    moe = cfg.moe
    sgu = sdn = None
    sh_inter = 0
    if moe is not None:
        ex = lp["experts"]
        inter = moe.moe_intermediate_size
        gu = _plan_stream("gu", _weight_bits(ex["gate_proj"]), hid,
                          2 * inter, _expert_gs(ex["gate_proj"], hid),
                          target_chunk_bytes)
        dn = _plan_stream("dn", _weight_bits(ex["down_proj"]), inter, hid,
                          _expert_gs(ex["down_proj"], inter),
                          target_chunk_bytes, chunk_axis="k")
        if moe.shared_expert_intermediate_size:
            se = lp["shared_expert"]
            sh_inter = moe.shared_expert_intermediate_size
            sgu = _plan_stream("sg", _weight_bits(se["gate_proj"]), hid,
                               2 * sh_inter, gs_of(se["gate_proj"], hid),
                               target_chunk_bytes)
            sdn = _plan_stream("sd", _weight_bits(se["down_proj"]), sh_inter,
                               hid, gs_of(se["down_proj"], sh_inter),
                               target_chunk_bytes, chunk_axis="k")
    else:
        gu = _plan_stream("gu", _weight_bits(lp["gate_proj"]), hid, 2 * inter,
                          gs_of(lp["gate_proj"], hid), target_chunk_bytes)
        dn = _plan_stream("dn", _weight_bits(lp["down_proj"]), inter, hid,
                          gs_of(lp["down_proj"], inter), target_chunk_bytes,
                          chunk_axis="k")
    lm_leaf = params["lm_head"] if not cfg.tie_word_embeddings else \
        {"w": params["embed_tokens"]["w"]}
    lm = _plan_stream("lm", _weight_bits(lm_leaf), hid, V,
                      gs_of(lm_leaf, hid, gaxis=0), target_chunk_bytes)

    pg = pu = pd = psg = psu = psd = None
    if interleave_mlp:
        if moe is not None:
            ex = lp["experts"]
            pg, pu, pd = _plan_interleave(
                "p", _expert_leaf_bits(ex["gate_proj"]),
                _expert_gs(ex["gate_proj"], hid),
                _expert_gs(ex["down_proj"], inter), inter, hid,
                target_chunk_bytes)
            if moe.shared_expert_intermediate_size:
                se = lp["shared_expert"]
                psg, psu, psd = _plan_interleave(
                    "s", _weight_bits(se["gate_proj"]),
                    gs_of(se["gate_proj"], hid),
                    gs_of(se["down_proj"], sh_inter), sh_inter, hid,
                    target_chunk_bytes)
        else:
            pg, pu, pd = _plan_interleave(
                "p", _weight_bits(lp["gate_proj"]),
                gs_of(lp["gate_proj"], hid),
                gs_of(lp["down_proj"], inter), inter, hid,
                target_chunk_bytes)

    mode = rt.cache.mode
    kv_bits = {CacheMode.DEFAULT: 16, CacheMode.INT8: 8,
               CacheMode.UINT4: 4}[mode]
    if mode == CacheMode.DEFAULT:
        kv_dtype_name = "float32" if rt.dtype == "float32" else "bfloat16"
    else:
        kv_dtype_name = "int8" if mode == CacheMode.INT8 else "uint8"
    B = rt.max_batch
    maxP = rt.max_pages_per_seq
    env_pc = __import__("os").environ.get("DI_MK_PAGE_CHUNK")
    page_chunk = max(1, int(env_pc)) if env_pc else 1
    return MegaPlan(
        B=B, L=cfg.num_layers, hid=hid, H=H, KH=KH, D=D, G=H // KH,
        G8=_round_up(H // KH, 8), inter=inter, QKVN=QKVN,
        ps=rt.cache.page_size, maxP=maxP, MAXPG=B * maxP,
        Vp=lm.Np, kv_mode=mode, kv_bits=kv_bits,
        kv_dtype_name=kv_dtype_name,
        has_qkv_bias=("b" in lp["q_proj"]),
        qkv=qkv, o=o, gu=gu, dn=dn, lm=lm, rms_eps=cfg.rms_norm_eps,
        qk_norm=cfg.qk_norm,
        alibi=cfg.position_embedding.value == "alibi",
        page_chunk=page_chunk,
        E=moe.num_experts if moe else 0,
        k_top=moe.num_experts_per_tok if moe else 0,
        norm_topk=moe.norm_topk_prob if moe else False,
        has_shared=sgu is not None,
        has_shared_gate=(moe is not None and
                         "shared_expert_gate" in lp),
        EP=(max(128, _round_up(
            moe.num_experts + (1 if sgu is not None else 0), 128))
            if moe else 128),
        sgu=sgu, sdn=sdn, shared_inter=sh_inter,
        pg=pg, pu=pu, pd=pd, psg=psg, psu=psu, psd=psd)


# ---------------------------------------------------------------------------
# weight packing
# ---------------------------------------------------------------------------

def _unpack_u4(w_q: np.ndarray) -> np.ndarray:
    """Loader's packed u4 [K, N/2] -> int [K, N] (undo ops/u4pack TILE-128
    halves packing). Pure numpy: packing runs once per model install and
    must not round-trip through the device."""
    from dashinfer_tpu.ops.u4pack import unpack_u4_weight_np_like
    return unpack_u4_weight_np_like(np.asarray(w_q), np).astype(np.uint8)


def _chunk_payload(sp: StreamPlan, q_int: np.ndarray) -> np.ndarray:
    """q_int [K, N] int levels -> chunked payload [S, rows, store_cols]."""
    K, N = q_int.shape
    if sp.chunk_axis == "n":
        buf = np.zeros((sp.Kp, sp.Np), q_int.dtype)
        buf[:K, :N] = q_int
        chunks = buf.reshape(sp.Kp, sp.S, sp.chunk).transpose(1, 0, 2)
    else:
        buf = np.zeros((sp.Kp, sp.Np), q_int.dtype)
        buf[:K, :N] = q_int
        chunks = buf.reshape(sp.S, sp.chunk, sp.Np)
    if sp.bits == 4:
        half = chunks.shape[-1] // 2
        lo = chunks[..., :half].astype(np.uint8)
        hi = chunks[..., half:].astype(np.uint8)
        return (lo | (hi << 4)).astype(np.uint8)
    if sp.bits == 8:
        return chunks.astype(np.int8)
    return chunks  # bf16 handled by caller dtype


def _chunk_qparams(sp: StreamPlan, s: np.ndarray, z: np.ndarray):
    """scale/zero [G, N] -> [S, Gc, chunk-or-Np] bf16 pair."""
    G = s.shape[0]
    gs = sp.gs if sp.gs else sp.K
    Gp_k = sp.Kp // gs if gs else 1
    if sp.chunk_axis == "n":
        sb = np.zeros((max(Gp_k, 1), sp.Np), np.float32)
        zb = np.zeros((max(Gp_k, 1), sp.Np), np.float32)
        sb[:G, :sp.N] = s
        zb[:G, :sp.N] = z
        sc = sb.reshape(sb.shape[0], sp.S, sp.chunk).transpose(1, 0, 2)
        zc = zb.reshape(zb.shape[0], sp.S, sp.chunk).transpose(1, 0, 2)
    elif G == 1 and gs >= sp.K and gs >= sp.chunk:
        # per-channel k-chunked with each chunk inside the single group:
        # one shared [1, Np] affine row per chunk. (When padding makes
        # chunk > gs — e.g. a 128-row rank-local K padded to a 256-row
        # chunk — the kernel addresses chunk//gs groups per chunk and the
        # generic path below must emit that many rows, zeros on the pad
        # groups.)
        sb = np.zeros((1, sp.Np), np.float32)
        zb = np.zeros((1, sp.Np), np.float32)
        sb[:, :sp.N] = s
        zb[:, :sp.N] = z
        sc = np.repeat(sb[None], sp.S, axis=0)       # [S, 1, Np]
        zc = np.repeat(zb[None], sp.S, axis=0)
    else:
        sb = np.zeros((Gp_k, sp.Np), np.float32)
        zb = np.zeros((Gp_k, sp.Np), np.float32)
        sb[:G, :sp.N] = s
        zb[:G, :sp.N] = z
        gpc = sp.chunk // gs
        sc = sb.reshape(sp.S, gpc, sp.Np)
        zc = zb.reshape(sp.S, gpc, sp.Np)
    # bf16 scales halve the streamed qparam bytes (dequant runs in f32)
    return sc.astype(jnp.bfloat16), zc.astype(jnp.bfloat16)


def _leaf_to_int(leaf: Dict, bits: int) -> Tuple[np.ndarray, np.ndarray,
                                                 np.ndarray]:
    """Quantized leaf -> (int levels [K, N], scale [G, N], zero [G, N])."""
    if bits == 4:
        q = _unpack_u4(np.asarray(leaf["w_q"]))
    else:
        q = np.asarray(leaf["w_q"])
    return q, np.asarray(leaf["scale"], np.float32), \
        np.asarray(leaf["zero"], np.float32)


def _chunk_leaves(sp: StreamPlan, leaves):
    """Concat leaves along N, chunk per the stream plan. Returns
    (payload [S, rows, cols], sc, zc) with sc/zc None for bf16."""
    parts_q, parts_s, parts_z = [], [], []
    for leaf in leaves:
        if sp.bits == 16:
            parts_q.append(np.asarray(leaf["w"], np.float32))
        else:
            q, s, z = _leaf_to_int(leaf, sp.bits)
            parts_q.append(q)
            parts_s.append(s)
            parts_z.append(z)
    qcat = np.concatenate(parts_q, axis=1) if len(parts_q) > 1 else parts_q[0]
    if sp.bits == 16:
        buf = np.zeros((sp.Kp, sp.Np), np.float32)
        buf[:qcat.shape[0], :qcat.shape[1]] = qcat
        if sp.chunk_axis == "n":
            ch = buf.reshape(sp.Kp, sp.S, sp.chunk).transpose(1, 0, 2)
        else:
            ch = buf.reshape(sp.S, sp.chunk, sp.Np)
        return ch.astype(jnp.bfloat16), None, None
    scat = np.concatenate(parts_s, axis=1) if len(parts_s) > 1 else parts_s[0]
    zcat = np.concatenate(parts_z, axis=1) if len(parts_z) > 1 else parts_z[0]
    sc, zc = _chunk_qparams(sp, scat, zcat)
    return _chunk_payload(sp, qcat), sc, zc


def _expert_leaf(stack, l: int, e: int) -> Dict:
    """Per-(layer, expert) leaf view of an expert stack."""
    if isinstance(stack, dict):
        return {"w_q": stack["w_q"][l, e], "scale": stack["scale"][l, e],
                "zero": stack["zero"][l, e]}
    return {"w": stack[l, e]}


def pack_params(cfg: ModelConfig, plan: MegaPlan, params: Dict) -> Dict:
    """Build the megakernel's streamed-weight arrays from the engine's
    stacked params pytree (one-time cost at install).

    Returns HOST (numpy) arrays: callers upload once with jnp.asarray /
    device_put. (Building on-device made every cold install pay a
    device->host->device round trip of the multi-GB pack through the
    pack cache and TP stacking paths.)"""
    lp = jax.tree.map(np.asarray, params["layers"])
    L = plan.L
    out: Dict[str, Any] = {}

    def pack_stream(sp: StreamPlan, leaves_per_layer):
        pays, scs, zcs = [], [], []
        for l in range(L):
            pay, sc, zc = _chunk_leaves(sp, leaves_per_layer(l))
            pays.append(pay)
            if sc is not None:
                scs.append(sc)
                zcs.append(zc)
        out[sp.name + "_w"] = np.asarray(np.stack(pays))
        if sp.bits != 16:
            out[sp.name + "_s"] = np.asarray(np.stack(scs))
            out[sp.name + "_z"] = np.asarray(np.stack(zcs))

    def pack_expert_stream(sp: StreamPlan, leaves_per_expert):
        """[L, E*S, rows, cols]: expert e's chunks at rows e*S .. (e+1)*S."""
        pays, scs, zcs = [], [], []
        for l in range(L):
            ep, es, ez = [], [], []
            for e in range(plan.E):
                pay, sc, zc = _chunk_leaves(sp, leaves_per_expert(l, e))
                ep.append(pay)
                if sc is not None:
                    es.append(sc)
                    ez.append(zc)
            pays.append(np.concatenate(ep, axis=0))
            if es:
                scs.append(np.concatenate(es, axis=0))
                zcs.append(np.concatenate(ez, axis=0))
        out[sp.name + "_w"] = np.asarray(np.stack(pays))
        if sp.bits != 16:
            out[sp.name + "_s"] = np.asarray(np.stack(scs))
            out[sp.name + "_z"] = np.asarray(np.stack(zcs))

    pack_stream(plan.qkv, lambda l: [
        jax.tree.map(lambda a: a[l], lp["q_proj"]),
        jax.tree.map(lambda a: a[l], lp["k_proj"]),
        jax.tree.map(lambda a: a[l], lp["v_proj"])])
    pack_stream(plan.o, lambda l: [jax.tree.map(lambda a: a[l], lp["o_proj"])])
    if plan.E:
        ex = lp["experts"]
        if plan.interleave:
            pack_expert_stream(plan.pg, lambda l, e: [
                _expert_leaf(ex["gate_proj"], l, e)])
            pack_expert_stream(plan.pu, lambda l, e: [
                _expert_leaf(ex["up_proj"], l, e)])
            pack_expert_stream(plan.pd, lambda l, e: [
                _expert_leaf(ex["down_proj"], l, e)])
        else:
            pack_expert_stream(plan.gu, lambda l, e: [
                _expert_leaf(ex["gate_proj"], l, e),
                _expert_leaf(ex["up_proj"], l, e)])
            pack_expert_stream(plan.dn, lambda l, e: [
                _expert_leaf(ex["down_proj"], l, e)])
        if plan.has_shared:
            se = lp["shared_expert"]
            if plan.interleave:
                pack_stream(plan.psg, lambda l: [
                    jax.tree.map(lambda a: a[l], se["gate_proj"])])
                pack_stream(plan.psu, lambda l: [
                    jax.tree.map(lambda a: a[l], se["up_proj"])])
                pack_stream(plan.psd, lambda l: [
                    jax.tree.map(lambda a: a[l], se["down_proj"])])
            else:
                pack_stream(plan.sgu, lambda l: [
                    jax.tree.map(lambda a: a[l], se["gate_proj"]),
                    jax.tree.map(lambda a: a[l], se["up_proj"])])
                pack_stream(plan.sdn, lambda l: [
                    jax.tree.map(lambda a: a[l], se["down_proj"])])
        # router (+ shared gate col E) padded to EP lanes, bf16
        rw = np.zeros((L, plan.hid, plan.EP), np.float32)
        for l in range(L):
            rw[l, :, :plan.E] = np.asarray(lp["router"]["w"][l], np.float32)
            if plan.has_shared_gate:
                rw[l, :, plan.E:plan.E + 1] = np.asarray(
                    lp["shared_expert_gate"]["w"][l], np.float32)
        out["router_w"] = np.asarray(rw.astype(jnp.bfloat16))
    elif plan.interleave:
        pack_stream(plan.pg, lambda l: [
            jax.tree.map(lambda a: a[l], lp["gate_proj"])])
        pack_stream(plan.pu, lambda l: [
            jax.tree.map(lambda a: a[l], lp["up_proj"])])
        pack_stream(plan.pd, lambda l: [
            jax.tree.map(lambda a: a[l], lp["down_proj"])])
    else:
        pack_stream(plan.gu, lambda l: [
            jax.tree.map(lambda a: a[l], lp["gate_proj"]),
            jax.tree.map(lambda a: a[l], lp["up_proj"])])
        pack_stream(plan.dn, lambda l: [
            jax.tree.map(lambda a: a[l], lp["down_proj"])])

    # lm head packed once (leading dim 1 so index maps stay uniform)
    lm_leaf = params["lm_head"] if not cfg.tie_word_embeddings else \
        {"w": np.asarray(params["embed_tokens"]["w"]).T}
    sp = plan.lm
    if sp.bits == 16:
        buf = np.zeros((sp.Kp, sp.Np), np.float32)
        w = np.asarray(lm_leaf["w"], np.float32)
        buf[:w.shape[0], :w.shape[1]] = w
        ch = buf.reshape(sp.Kp, sp.S, sp.chunk).transpose(1, 0, 2)
        out["lm_w"] = np.asarray(ch.astype(jnp.bfloat16))[None]
    else:
        q, s, z = _leaf_to_int(lm_leaf, sp.bits)
        out["lm_w"] = np.asarray(_chunk_payload(sp, q))[None]
        sc, zc = _chunk_qparams(sp, s, z)
        out["lm_s"] = np.asarray(sc)[None]
        out["lm_z"] = np.asarray(zc)[None]

    # norms / bias
    out["norms"] = np.asarray(np.stack(
        [np.stack([np.asarray(lp["input_layernorm"][l], np.float32),
                   np.asarray(lp["post_attention_layernorm"][l], np.float32)])
         for l in range(L)]).astype(jnp.bfloat16))  # [L, 2, hid]
    if plan.has_qkv_bias:
        bias = np.concatenate(
            [np.asarray(lp["q_proj"]["b"], np.float32),
             np.asarray(lp["k_proj"]["b"], np.float32),
             np.asarray(lp["v_proj"]["b"], np.float32)], axis=1)  # [L, QKVN]
    else:
        bias = np.zeros((L, plan.QKVN), np.float32)
    bp = np.zeros((L, 1, plan.QKVN), np.float32)
    bp[:, 0, :bias.shape[1]] = bias
    out["qkv_b"] = np.asarray(bp.astype(jnp.bfloat16))
    out["final_norm"] = np.asarray(
        np.asarray(params["norm"], np.float32)[None].astype(jnp.bfloat16))
    if plan.qk_norm:
        # per-head weights tiled to full lane width: row 0 = q_norm x H,
        # row 1 = k_norm x KH (zero-padded to H*D lanes)
        HD = plan.H * plan.D
        qk = np.zeros((L, 2, HD), np.float32)
        for l in range(L):
            qk[l, 0] = np.tile(np.asarray(lp["q_norm"][l], np.float32),
                               plan.H)
            qk[l, 1, :plan.KH * plan.D] = np.tile(
                np.asarray(lp["k_norm"][l], np.float32), plan.KH)
        out["qk_norms"] = np.asarray(qk.astype(jnp.bfloat16))
    if plan.alibi:
        # canonical per-head slopes laid out [KH, G8] to match the q4
        # grouped-query layout (pad cols G..G8 are never read: their q rows
        # are zero and the bias only shifts scores of real heads)
        from dashinfer_tpu.models.transformer import alibi_slopes
        sl = np.asarray(alibi_slopes(plan.H), np.float32) \
            .reshape(plan.KH, plan.G)
        slp = np.zeros((plan.KH, plan.G8), np.float32)
        slp[:, :plan.G] = sl
        out["slopes"] = np.asarray(slp)
    return out


# ---------------------------------------------------------------------------
# the kernel
# ---------------------------------------------------------------------------

# batch threshold for the looped group-dot epilogue (see _stream_dot);
# override with DI_MK_GDOT_LOOP_B (0 disables, 1 forces always-on)
_GDOT_LOOP_B = int(os.environ.get("DI_MK_GDOT_LOOP_B", "32")) or 10 ** 9


# u4 unpack variant (DI_MK_U4DEQ), all measured on v5e (round 3,
# tools/probe_magic_dequant.py + profile_megakernel sweeps at bs=32):
#   split (default for the looped-epilogue path) — dual column-half dots,
#     AND-only nibble extract with the hi x16 folded into scales; no lane
#     concat, no vector shift. 24.2 ms/step vs i32's 25.8.
#   i32 — widen u8->i32, AND/SHR, convert, concat; used by the batched
#     (small-B) and weight-side paths, and the fallback when split's
#     preconditions fail.
#   u8 — 8-bit-density ANDs: 58 ms/step (sub-byte relayouts; dead end).
#   magic — bitcast-built bf16 for the lo nibble: 27.7 ms/step (no win;
#     i16 vector shifts don't legalize so hi can't take it).
# Read at trace time so DI_MK_U4DEQ set after import still applies
# (kernels re-trace per plan; the env read costs nothing at runtime).
def _u4deq_variant() -> str:
    return os.environ.get("DI_MK_U4DEQ", "split")


def _dequant_chunk(w_ref, bits: int):
    """Chunk payload ref slice [rows, store_cols] -> bf16 [rows, cols]."""
    if bits == 16:
        return w_ref[0, 0]
    if bits == 8:
        return w_ref[0, 0].astype(jnp.bfloat16)
    if _u4deq_variant() == "u8":
        p8 = w_ref[0, 0]  # uint8: the two ANDs stay on 8-bit lanes
        lo = (p8 & 0xF).astype(jnp.int32).astype(jnp.bfloat16)
        hi = (p8 & 0xF0).astype(jnp.int32).astype(jnp.bfloat16) \
            * jnp.bfloat16(0.0625)  # exact: values 0..240, /16 a pow2
        return jnp.concatenate([lo, hi], axis=-1)
    p32 = w_ref[0, 0].astype(jnp.int32)  # u8 zero-extends: >>4 needs no mask
    lo = (p32 & 0xF).astype(jnp.bfloat16)
    hi = (p32 >> 4).astype(jnp.bfloat16)
    return jnp.concatenate([lo, hi], axis=-1)


def _stream_dot(plan: MegaPlan, sp: StreamPlan, x_bf16, w_ref, s_ref, z_ref,
                chunk_idx, wdeq: bool = False):
    """One chunk's matmul with fused group-wise dequant.

    x_bf16: [B, Kc] (Kc = sp.Kp for n-chunked, sp.chunk for k-chunked).
    Returns f32 [B, cols].

    Three dequant placements:
    - result-side batched (small batch): MXU dot on the raw int payload,
      per-group affine on the [G, B, cols] result — cheapest VPU work
      when G*B << rows, but the f32 temporary scales with B*cols and
      Mosaic spills it at bs>=32 with big chunks.
    - result-side looped (B >= _GDOT_LOOP_B): unrolled loop over groups,
      each a flat [B, gs] @ [gs, cols] dot accumulated into ONE [B, cols]
      f32 — identical math and MXU work, no [G, B, cols] temporary, so
      chunk size is decoupled from batch.
    - weight-side (wdeq): dequantize the weight tile [rows, cols] once,
      then ONE plain dot — measured 9% worse (the full-tile VPU dequant
      does not overlap)."""
    B = x_bf16.shape[0]
    if (sp.bits == 4 and B >= _GDOT_LOOP_B and not wdeq and
            _u4deq_variant() in ("split", "magic")):
        p8 = w_ref[0, 0]
        gs4 = sp.gs if sp.gs else p8.shape[0]
        if p8.shape[0] // gs4 > 1:
            return _stream_dot_split(sp, x_bf16, p8, s_ref, z_ref,
                                     magic=_u4deq_variant() == "magic")
    q = _dequant_chunk(w_ref, sp.bits)                       # [rows, cols]
    if sp.bits == 16:
        return jax.lax.dot_general(
            x_bf16, q, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
    rows = q.shape[0]
    gs = sp.gs if sp.gs else rows
    # per-channel k-chunked streams have gs >= Kp > rows: the whole chunk is
    # one group and the shared affine applies per chunk (zero terms sum to
    # xsum_total * z across the accumulated chunks)
    groups = rows // gs if gs <= rows else 1
    if groups == 1:
        part = jax.lax.dot_general(
            x_bf16, q, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        xsum = jnp.sum(x_bf16.astype(jnp.float32), axis=1, keepdims=True)
        return part * s_ref[0, 0].astype(jnp.float32) + \
            xsum * z_ref[0, 0].astype(jnp.float32)
    if wdeq:
        cols = q.shape[1]
        s = s_ref[0, 0].astype(jnp.float32)                  # [G, cols]
        z = z_ref[0, 0].astype(jnp.float32)
        qf = q.astype(jnp.float32).reshape(groups, gs, cols)
        w = (qf * s[:, None, :] + z[:, None, :]).astype(jnp.bfloat16)
        return jax.lax.dot_general(
            x_bf16, w.reshape(rows, cols), (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
    if B >= _GDOT_LOOP_B:
        cols = q.shape[1]
        s = s_ref[0, 0].astype(jnp.float32)                  # [G, cols]
        z = z_ref[0, 0].astype(jnp.float32)
        # zero-point term for ALL groups in one MXU dot ([B,G] group sums
        # against [G, cols] zeros) instead of G VPU rank-1 updates; the
        # per-group loop then only needs one [B, cols] FMA each.
        xs = jnp.sum(x_bf16.astype(jnp.float32).reshape(B, groups, gs),
                     axis=2)                                 # [B, G]
        # Column tiling bounds the accumulator that must stay LIVE across
        # the whole group loop: an untiled [B, cols] f32 acc is 64 vregs at
        # B=64/cols=1024 and Mosaic spills it to VMEM on every group
        # iteration (measured: per-chunk time tracks B*cols*G spill bytes —
        # 38 us/chunk at bs=64 vs the 5.9 us DMA floor). Cap the live tile
        # at ~32 vregs (128 KB) so bs<=32 keeps its measured-good untiled
        # shape and bs=64 halves the live set.
        cap = int(os.environ.get("DI_MK_GDOT_TILE_BYTES", str(128 << 10)))
        ct = cols
        while B * ct * 4 > cap and ct % 2 == 0 and ct > 128:
            ct //= 2
        tiles = []
        for c0 in range(0, cols, ct):
            # HIGHEST precision: default MXU precision rounds f32 operands
            # toward bf16, losing bits of the zero term vs the batched
            # epilogue's full-f32 VPU math; [B,G]x[G,ct] is tiny, so exact
            # passes cost nothing (ADVICE r1)
            acc = jax.lax.dot_general(
                xs, z[:, c0:c0 + ct], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST)         # [B, ct]
            for g in range(groups):
                xg = x_bf16[:, g * gs:(g + 1) * gs]
                part = jax.lax.dot_general(
                    xg, q[g * gs:(g + 1) * gs, c0:c0 + ct],
                    (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)      # [B, ct]
                acc = acc + part * s[g, c0:c0 + ct][None, :]
            tiles.append(acc)
        return tiles[0] if len(tiles) == 1 else jnp.concatenate(tiles, -1)
    xg = x_bf16.reshape(B, groups, gs).swapaxes(0, 1)        # [G, B, gs]
    qg = q.reshape(groups, gs, -1)                           # [G, gs, cols]
    part = jax.lax.dot_general(
        xg, qg, (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)                  # [G, B, cols]
    s = s_ref[0, 0].astype(jnp.float32)                      # [G, cols]
    z = z_ref[0, 0].astype(jnp.float32)
    xsum = jnp.sum(xg.astype(jnp.float32), axis=2)           # [G, B]
    return (jnp.sum(part * s[:, None, :], axis=0)
            + jnp.sum(xsum[:, :, None] * z[:, None, :], axis=0))


def _stream_dot_split(sp: StreamPlan, x_bf16, p8, s_ref, z_ref,
                      magic: bool = False):
    """u4 'split'/'magic' dequant-dot (DI_MK_U4DEQ, looped group-dot path):
    the packed byte holds output col c's lo nibble and output col half+c's
    hi nibble, so run TWO column-half dot passes instead of materializing
    the [rows, 2*half] concat — no cross-lane concat of a full weight
    tile.

    split: lo = p & 0xF (8-bit-density AND), hi uses p & 0xF0 (= 16*hi)
    with the /16 folded into that half's group SCALES; the remaining
    per-element cost is the u8->i32->bf16 widen of each half.

    magic: NO int->float convert at all — the bf16 bit pattern
    0x4300 | n equals 128 + n exactly (granularity 1 at exponent 2^7,
    n <= 15), so each half is (widen to i16, AND/SHR, OR 0x4300, BITCAST
    to bf16); the +128 offset per element contributes 128 * sum(x_g) per
    group, folded into an effective zero point z_eff = z - 128*s computed
    on the tiny [G, ct] tile (tools/probe_magic_dequant.py)."""
    B = x_bf16.shape[0]
    rows, half = p8.shape
    gs = sp.gs if sp.gs else rows
    G = rows // gs
    s = s_ref[0, 0].astype(jnp.float32)                      # [G, 2*half]
    z = z_ref[0, 0].astype(jnp.float32)
    xs = jnp.sum(x_bf16.astype(jnp.float32).reshape(B, G, gs),
                 axis=2)                                     # [B, G]
    cap = int(os.environ.get("DI_MK_GDOT_TILE_BYTES", str(128 << 10)))
    ct = half
    while B * ct * 4 > cap and ct % 2 == 0 and ct > 128:
        ct //= 2

    def nibble_bf16(which: str):
        if magic and which == "lo":
            # v5e Mosaic cannot legalize 16-bit vector SHIFTS (arith.shrsi
            # on vector<i16>, probed on hardware), so only the LO nibble
            # takes the bitcast path; HI uses the AND-0xF0 + scale-fold
            # like the split variant.
            p16 = p8.astype(jnp.int16)
            return jax.lax.bitcast_convert_type(
                ((p16 & 0xF) | jnp.int16(0x4300)).astype(jnp.int16),
                jnp.bfloat16)
        mask = 0xF if which == "lo" else 0xF0
        return (p8 & mask).astype(jnp.int32).astype(jnp.bfloat16)

    # Epilogue structure (DI_MK_GDOT):
    #   loop (default) — G sequential [B, gs] @ [gs, ct] dots, each followed
    #     by an [B, ct] FMA with a per-group broadcast of s.
    #   bdot — ONE G-batched 3D dot per ct-tile ([G, B, gs] x [G, gs, ct])
    #     + one fused sum_g(part * s) reduction: removes the G serial
    #     broadcasts/FMAs; the [G, B, ct] f32 temp is bounded by a small ct
    #     (the unbounded [G, B, cols] form is what used to spill at bs>=32).
    bdot = os.environ.get("DI_MK_GDOT", "loop") == "bdot"
    if bdot:
        ct = min(ct, int(os.environ.get("DI_MK_BDOT_CT", "256")))
        xg3 = x_bf16.reshape(B, G, gs).swapaxes(0, 1)        # [G, B, gs]
    tiles = []
    for which, c_base in (("lo", 0), ("hi", half)):
        s_mul = 1.0 if which == "lo" else 0.0625
        qh = nibble_bf16(which)
        if bdot:
            q3 = qh.reshape(G, gs, half)
        for c0 in range(0, half, ct):
            csl = slice(c_base + c0, c_base + c0 + ct)
            s_t = s[:, csl] * s_mul                          # [G, ct]
            # magic lo: each weight element carries +128, i.e. +128*xsum_g
            # per group — fold into the zero term on the tiny tile
            z_t = z[:, csl] - 128.0 * s_t if (magic and which == "lo") \
                else z[:, csl]
            acc = jax.lax.dot_general(
                xs, z_t, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST)         # [B, ct]
            if bdot:
                part = jax.lax.dot_general(
                    xg3, q3[:, :, c0:c0 + ct],
                    (((2,), (1,)), ((0,), (0,))),
                    preferred_element_type=jnp.float32)      # [G, B, ct]
                acc = acc + jnp.sum(part * s_t[:, None, :], axis=0)
            else:
                for g in range(G):
                    xg = x_bf16[:, g * gs:(g + 1) * gs]
                    part = jax.lax.dot_general(
                        xg, qh[g * gs:(g + 1) * gs, c0:c0 + ct],
                        (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32)
                    acc = acc + part * s_t[g][None, :]
            tiles.append(acc)
    return jnp.concatenate(tiles, -1)


def _rms(x_f32, w_bf16, eps):
    var = jnp.mean(x_f32 * x_f32, axis=-1, keepdims=True)
    return (x_f32 * jax.lax.rsqrt(var + eps)) * w_bf16.astype(jnp.float32)


def _rot_half_heads(x, D):
    """rotate_half applied per D-sized head block on a [B, n*D] tensor,
    vectorized across heads: a global lane roll by D/2 lands the right
    source lane inside every D-block, selected by lane%D."""
    h = D // 2
    lane = jax.lax.broadcasted_iota(jnp.int32, x.shape, len(x.shape) - 1)
    first = (lane % D) < h
    fwd = jnp.concatenate([x[:, h:], x[:, :h]], axis=-1)    # roll -h
    bwd = jnp.concatenate([x[:, -h:], x[:, :-h]], axis=-1)  # roll +h
    return jnp.where(first, -fwd, bwd)


def supports_lora_epilogue(plan: MegaPlan) -> bool:
    """The in-kernel LoRA epilogue (reference SGMV, sgmv_lora_op_gpu.cpp)
    needs the interleaved dense layout; MoE + LoRA takes the XLA path."""
    return plan.interleave and plan.E == 0


def build_decode_megakernel(plan: MegaPlan, interpret: Optional[bool] = None,
                            lora_nr: int = 0):
    """Returns fn(packed, x0, cosq, sinq, cosk, sink, pt, lens, active,
    tgt_page, sched_b, sched_p, n_sched[, lora args], k, v, kq, vq) ->
    (logits [B, Vp] f32, k, v, kq, vq).

    lora_nr > 0 enables the in-kernel multi-adapter LoRA epilogue
    (reference SGMV batched adapter matmuls, sgmv_lora_op_gpu.cpp +
    GemmLoraCapsule micro-graph, gemm_capsule_op_gpu.cpp:18-70): the whole
    adapter pool rides as DENSE rank-lane views (lora/manager.py
    build_mega_view) — per phase ONE [B, in] @ [in, N*R] MXU dot projects
    into the pooled rank space, a per-slot mask (from the request's
    adapter one-hot) zeroes non-selected slots, and the per-chunk
    [B, N*R] @ [N*R, cols] dot adds the delta alongside the base stream.
    Mixed batches (some rows with adapters, some without) stay entirely
    on the fast path. Requires supports_lora_epilogue(plan)."""
    B, L, hid = plan.B, plan.L, plan.hid
    H, KH, D, G, G8 = plan.H, plan.KH, plan.D, plan.G, plan.G8
    HD = H * D
    ps, maxP = plan.ps, plan.maxP
    S_layer, T_total = plan.S_layer, plan.T_total
    kv_quant = plan.kv_mode != CacheMode.DEFAULT
    Dsc = plan.kv_store_dim
    F = KH * Dsc
    qkv, o_sp, gu, dn, lm = plan.qkv, plan.o, plan.gu, plan.dn, plan.lm
    eps = plan.rms_eps
    scale_att = 1.0 / math.sqrt(D)
    Gmax = max(hid, HD, dn.Kp) // 128
    MOE = plan.E > 0
    E, SE = plan.E, plan.gu.S + plan.dn.S
    # page-loop chunking: each iteration consumes C consecutive pages of
    # one sequence (ring slots hold C pages); in-flight bytes stay ~equal
    C = plan.page_chunk
    RING = _RING if C == 1 else max(2, _RING // C)
    psC = C * ps
    # qparam pool rows are [2*KH, QL] with QL = round_up(ps, 128) (see
    # runtime/kv_cache.py): Mosaic requires lane-dim DMA slices aligned to
    # the 128 tile, so all qparam copies move whole 128-lane blocks; token
    # t of page j sits at ring-buffer lane j*QL + t
    QL = -(-ps // 128) * 128
    qlC = C * QL
    # RMW qparam window: only the 128-lane block holding the new token's
    # column needs the read-modify-write (full-ps windows were B*L-scaled
    # VMEM: 29 MB at bs=64 ps=256, eating the whole chunk budget); 128 is
    # both the minimum legal DMA width and enough for any in-page offset
    RWQ = 128
    # lm-phase RMW flush slot chunking (round-3 "per-layer RMW flushing"
    # design, resolved differently): the per-slot read-merge-write windows
    # are allocated for the WHOLE kernel, and at bs=64 the [B, L, W, F]
    # form was ~29 MB of VMEM that de-pipelined the weight stream. Flush
    # slots in chunks of SC through a 2-deep ring instead — scratch is
    # [2, SC, L, W, F] (4x smaller at bs=64/SC=16) and the chunk waves'
    # DMAs overlap each other and the lm weight stream. SC >= B gives the
    # round-3 all-at-once behavior.
    SC = max(1, min(B, int(os.environ.get("DI_MK_RMW_SLOTS", "16"))))
    NCH = -(-B // SC)
    RNG2 = min(NCH, 2)
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    # weight-side dequant experiment switch (see _stream_dot docstring)
    wdeq = bool(__import__("os").environ.get("DI_MK_WDEQ"))

    NSCAL = 7  # pt, lens, active, tgt_page, sched_b, sched_p, n_sched

    # ---- phase-gated index maps -------------------------------------------
    def layer_of(t):
        return jnp.minimum(t // S_layer, L - 1)

    def stream_idx(base, count):
        def idx(t, *_):
            l = layer_of(t)
            s = t - l * S_layer
            c = jnp.clip(s - base, 0, count - 1)
            return (l, c, 0, 0)
        return idx

    def lm_idx(t, *_):
        c = jnp.clip(t - L * S_layer, 0, lm.S - 1)
        return (0, c, 0, 0)

    def norm_idx(t, *_):
        return (layer_of(t), 0, 0)

    def bias_idx(t, *_):
        return (layer_of(t), 0, 0)

    def const_idx(t, *_):
        return tuple([0] * 2)

    # logits output blocks advance during the lm phase only
    def out_idx(t, *_):
        c = jnp.clip(t - L * S_layer, 0, lm.S - 1)
        return (0, c)

    def payload_spec(sp: StreamPlan, idx):
        rows = sp.Kp if sp.chunk_axis == "n" else sp.chunk
        return pl.BlockSpec((1, 1, rows, sp.store_cols), idx)

    def qparam_spec(sp: StreamPlan, idx):
        gs = sp.gs if sp.gs else (sp.Kp if sp.chunk_axis == "n" else sp.chunk)
        if sp.chunk_axis == "n":
            g = max(sp.Kp // gs, 1)
            cols = sp.chunk
        else:
            g = max(sp.chunk // gs, 1)
            cols = sp.Np
        return pl.BlockSpec((1, 1, g, cols), idx)

    in_specs = [
        pl.BlockSpec((B, hid), lambda t, *_: (0, 0)),        # x0
        pl.BlockSpec((B, HD), lambda t, *_: (0, 0)),         # cosq
        pl.BlockSpec((B, HD), lambda t, *_: (0, 0)),         # sinq
        pl.BlockSpec((B, KH * D), lambda t, *_: (0, 0)),     # cosk
        pl.BlockSpec((B, KH * D), lambda t, *_: (0, 0)),     # sink
    ]
    arg_names = ["x0", "cosq", "sinq", "cosk", "sink"]

    def expert_sub_idx(sub_off, count):
        """Chunk selector for an expert stream [L, E*count, ...]: expert
        e's chunks live at rows e*count..; within the expert's sub-phase
        the chunk advances, outside it freezes (prefetch then leads into
        the next expert's first chunk)."""
        def idx(t, *_):
            l = layer_of(t)
            s = t - l * S_layer
            c_all = jnp.clip(s - plan.base_exp, 0, E * SE - 1)
            e = c_all // SE
            w = c_all - e * SE
            c = e * count + jnp.clip(w - sub_off, 0, count - 1)
            return (l, c, 0, 0)
        return idx

    ILV = plan.interleave
    pg, pu, pd = plan.pg, plan.pu, plan.pd
    if MOE and ILV:
        stream_defs = [
            (qkv, stream_idx(plan.base_qkv, qkv.S)),
            (o_sp, stream_idx(plan.base_o, o_sp.S)),
            # expert streams are [L, E*S, ...] with expert e's chunks at
            # rows e*S..: the combined in-phase index IS the row
            (pg, stream_idx(plan.base_exp, E * pg.S)),
            (pu, stream_idx(plan.base_exp, E * pu.S)),
            (pd, stream_idx(plan.base_exp, E * pd.S)),
        ]
        if plan.has_shared:
            stream_defs += [
                (plan.psg, stream_idx(plan.base_shared, plan.psg.S)),
                (plan.psu, stream_idx(plan.base_shared, plan.psu.S)),
                (plan.psd, stream_idx(plan.base_shared, plan.psd.S)),
            ]
        stream_defs.append((lm, lm_idx))
    elif MOE:
        stream_defs = [
            (qkv, stream_idx(plan.base_qkv, qkv.S)),
            (o_sp, stream_idx(plan.base_o, o_sp.S)),
            (gu, expert_sub_idx(0, gu.S)),
            (dn, expert_sub_idx(gu.S, dn.S)),
        ]
        if plan.has_shared:
            stream_defs += [
                (plan.sgu, stream_idx(plan.base_sgu, plan.sgu.S)),
                (plan.sdn, stream_idx(plan.base_sdn, plan.sdn.S)),
            ]
        stream_defs.append((lm, lm_idx))
    elif ILV:
        stream_defs = [
            (qkv, stream_idx(plan.base_qkv, qkv.S)),
            (o_sp, stream_idx(plan.base_o, o_sp.S)),
            (pg, stream_idx(plan.base_mlp, pg.S)),
            (pu, stream_idx(plan.base_mlp, pu.S)),
            (pd, stream_idx(plan.base_mlp, pd.S)),
            (lm, lm_idx),
        ]
    else:
        stream_defs = [
            (qkv, stream_idx(plan.base_qkv, qkv.S)),
            (o_sp, stream_idx(plan.base_o, o_sp.S)),
            (gu, stream_idx(plan.base_gu, gu.S)),
            (dn, stream_idx(plan.base_dn, dn.S)),
            (lm, lm_idx),
        ]
    for sp, idx in stream_defs:
        in_specs.append(payload_spec(sp, idx))
        arg_names.append(sp.name + "_w")
        if sp.bits != 16:
            in_specs.append(qparam_spec(sp, idx))
            arg_names.append(sp.name + "_s")
            in_specs.append(qparam_spec(sp, idx))
            arg_names.append(sp.name + "_z")

    in_specs.append(pl.BlockSpec((1, 2, hid), norm_idx))     # norms
    arg_names.append("norms")
    in_specs.append(pl.BlockSpec((1, 1, plan.QKVN), bias_idx))  # qkv_b
    arg_names.append("qkv_b")
    in_specs.append(pl.BlockSpec((1, hid), const_idx))       # final_norm
    arg_names.append("final_norm")
    if plan.qk_norm:
        in_specs.append(pl.BlockSpec((1, 2, HD), norm_idx))  # qk_norms
        arg_names.append("qk_norms")
    if plan.alibi:
        in_specs.append(pl.BlockSpec((KH, G8), const_idx))   # slopes
        arg_names.append("slopes")
    if MOE:
        in_specs.append(pl.BlockSpec((1, hid, plan.EP), norm_idx))
        arg_names.append("router_w")
    LORA = lora_nr > 0
    if LORA:
        assert ILV and not MOE, "LoRA epilogue needs the dense ILV layout"
        NRp = _round_up(lora_nr, 128)
        NR3p = 3 * NRp

        def bcols_idx(base, count):
            # per-layer lora B view, column-sliced by the phase chunk
            def idx(t, *_):
                l = layer_of(t)
                s = t - l * S_layer
                return (l, 0, jnp.clip(s - base, 0, count - 1))
            return idx

        def brows_idx(base, count):
            # k-chunked lora A view (down), row-sliced by the phase chunk
            def idx(t, *_):
                l = layer_of(t)
                s = t - l * S_layer
                return (l, jnp.clip(s - base, 0, count - 1), 0)
            return idx

        lora_defs = [
            ("lmask3", pl.BlockSpec((B, NR3p), lambda t, *_: (0, 0))),
            ("lmask1", pl.BlockSpec((B, NRp), lambda t, *_: (0, 0))),
            ("la_qkv", pl.BlockSpec((1, hid, NR3p), norm_idx)),
            ("lb_qkv", pl.BlockSpec((1, NR3p, qkv.chunk),
                                    bcols_idx(plan.base_qkv, qkv.S))),
            ("la_o", pl.BlockSpec((1, HD, NRp), norm_idx)),
            ("lb_o", pl.BlockSpec((1, NRp, o_sp.chunk),
                                  bcols_idx(plan.base_o, o_sp.S))),
            ("la_g", pl.BlockSpec((1, hid, NRp), norm_idx)),
            ("lb_g", pl.BlockSpec((1, NRp, pg.chunk),
                                  bcols_idx(plan.base_mlp, pg.S))),
            ("la_u", pl.BlockSpec((1, hid, NRp), norm_idx)),
            ("lb_u", pl.BlockSpec((1, NRp, pu.chunk),
                                  bcols_idx(plan.base_mlp, pu.S))),
            ("la_d", pl.BlockSpec((1, pd.chunk, NRp),
                                  brows_idx(plan.base_mlp, pd.S))),
            ("lb_d", pl.BlockSpec((1, NRp, hid), norm_idx)),
        ]
        for nm, spec in lora_defs:
            in_specs.append(spec)
            arg_names.append(nm)
    npools = 4 if kv_quant else 2
    for _ in range(npools):
        in_specs.append(pl.BlockSpec(memory_space=pl.ANY))   # kv pools
    arg_names += ["k", "v", "kq", "vq"][:npools]

    out_specs = [pl.BlockSpec((B, lm.chunk), out_idx)] + \
        [pl.BlockSpec(memory_space=pl.ANY)] * npools

    kv_dtype = jnp.dtype(plan.kv_dtype_name)

    scratch_shapes = [
        pltpu.VMEM((B, hid), jnp.float32),            # 0 x_resid
        pltpu.VMEM((B, hid), jnp.bfloat16),           # 1 x_norm
        pltpu.VMEM((B, qkv.Np), jnp.float32),         # 2 qkv_out
        pltpu.VMEM((B, KH, G8, D), jnp.bfloat16),     # 3 q4
        pltpu.VMEM((B, HD), jnp.bfloat16),            # 4 attn_out
        pltpu.VMEM((B, 128 if ILV else
                    max([gu.Np, dn.Kp] +
                        ([plan.sgu.Np, plan.sdn.Kp] if plan.has_shared
                         else []))), jnp.bfloat16),        # 5 gu_out
        # (interleaved mode computes act per chunk — no [B, 2*inter]
        # activation buffer; the 128-col stub keeps scratch positions)
        pltpu.VMEM((B, hid), jnp.float32),            # 7 acc_dn
        pltpu.VMEM((B, KH, G8, 2), jnp.float32),      # 8 ml_st (m, l lanes)
        pltpu.VMEM((B, KH, G8, D), jnp.float32),      # 10 acc_at
        pltpu.VMEM((B, L, F), kv_dtype),              # 11 nk_buf
        pltpu.VMEM((B, L, F), kv_dtype),              # 12 nv_buf
        pltpu.VMEM((B, L, 2 * KH), jnp.float32),      # 13 nkp_buf
        pltpu.VMEM((B, L, 2 * KH), jnp.float32),      # 14 nvp_buf
        pltpu.VMEM((RING, psC, F), kv_dtype),         # 15 kbuf
        pltpu.VMEM((RING, psC, F), kv_dtype),         # 16 vbuf
        pltpu.VMEM((RING, 2 * KH, qlC), jnp.float32),  # 17 kqbuf
        pltpu.VMEM((RING, 2 * KH, qlC), jnp.float32),  # 18 vqbuf
        pltpu.VMEM((RNG2, SC, L, _RMW_W, F), kv_dtype),   # 19 rmw_k ring
        pltpu.VMEM((RNG2, SC, L, _RMW_W, F), kv_dtype),   # 20 rmw_v
        pltpu.VMEM((RNG2, SC, L, 2 * KH, RWQ), jnp.float32),  # 21 rmw_kq
        pltpu.VMEM((RNG2, SC, L, 2 * KH, RWQ), jnp.float32),  # 22 rmw_vq
        pltpu.SemaphoreType.DMA((4, RING, C)),        # 23 page sems
        pltpu.SemaphoreType.DMA((4, RNG2, SC)),       # 24 rmw sems
    ]
    if MOE:
        scratch_shapes.append(pltpu.VMEM((B, plan.EP), jnp.float32))  # gates
    if LORA:
        scratch_shapes += [
            pltpu.VMEM((B, NR3p), jnp.float32),   # lh3 (qkv rank space)
            pltpu.VMEM((B, NRp), jnp.float32),    # lh_o
            pltpu.VMEM((B, NRp), jnp.float32),    # lh_g
            pltpu.VMEM((B, NRp), jnp.float32),    # lh_u
            pltpu.VMEM((B, NRp), jnp.float32),    # lh_d
        ]

    NARG = len(arg_names)
    name_pos = {n: i for i, n in enumerate(arg_names)}
    has = {n: (n in name_pos) for n in
           ["qkv_s", "o_s", "gu_s", "dn_s", "lm_s", "kq", "vq"]}

    def kernel(*refs):
        pt, lens, active, tgt_page, sched_b, sched_p, n_sched = refs[:NSCAL]
        args = {n: refs[NSCAL + i] for i, n in enumerate(arg_names)}
        logits_ref = refs[NSCAL + NARG]
        kpool_o = refs[NSCAL + NARG + 1]
        vpool_o = refs[NSCAL + NARG + 2]
        if kv_quant:
            kqpool_o = refs[NSCAL + NARG + 3]
            vqpool_o = refs[NSCAL + NARG + 4]
        sc = refs[NSCAL + NARG + 1 + npools:]
        if MOE:
            (x_resid, x_norm, qkv_out, q4, attn_out, gu_out, acc_dn,
             ml_st, acc_at, nk_buf, nv_buf, nkp_buf, nvp_buf,
             kbuf, vbuf, kqbuf, vqbuf, rmw_k, rmw_v, rmw_kq, rmw_vq,
             page_sems, rmw_sems, gates_st) = sc
        elif LORA:
            (x_resid, x_norm, qkv_out, q4, attn_out, gu_out, acc_dn,
             ml_st, acc_at, nk_buf, nv_buf, nkp_buf, nvp_buf,
             kbuf, vbuf, kqbuf, vqbuf, rmw_k, rmw_v, rmw_kq, rmw_vq,
             page_sems, rmw_sems, lh3, lh_o, lh_g, lh_u, lh_d) = sc
        else:
            (x_resid, x_norm, qkv_out, q4, attn_out, gu_out, acc_dn,
             ml_st, acc_at, nk_buf, nv_buf, nkp_buf, nvp_buf,
             kbuf, vbuf, kqbuf, vqbuf, rmw_k, rmw_v, rmw_kq, rmw_vq,
             page_sems, rmw_sems) = sc

        def lora_proj(x_bf16, a_ref, mask_ref, h_ref):
            """Rank-space projection h = (x @ A_l) * mask (pads and
            non-selected slots zeroed by the mask)."""
            h = jax.lax.dot_general(
                x_bf16, a_ref[0], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            h_ref[:] = h * mask_ref[:]

        def lora_delta(h_ref, b_ref):
            """Per-chunk delta = h @ B_chunk, f32 [B, cols]."""
            return jax.lax.dot_general(
                h_ref[:].astype(jnp.bfloat16), b_ref[0],
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)

        t = pl.program_id(0)
        l = layer_of(t)
        s = t - l * S_layer
        in_lm = t >= L * S_layer

        @pl.when(t == 0)
        def _init():
            x_resid[:] = args["x0"][:].astype(jnp.float32)

        # ---------------- qkv phase ----------------
        @pl.when(jnp.logical_and(~in_lm, s < plan.base_att))
        def _qkv():
            @pl.when(s == 0)
            def _():
                x_norm[:] = _rms(x_resid[:], args["norms"][0, 0],
                                 eps).astype(jnp.bfloat16)
                if LORA:
                    lora_proj(x_norm[:], args["la_qkv"], args["lmask3"],
                              lh3)
            c = s
            y = _stream_dot(plan, qkv, x_norm[:],
                            args["qkv_w"],
                            args.get("qkv_s"), args.get("qkv_z"), c,
                            wdeq=wdeq)
            if LORA:
                y = y + lora_delta(lh3, args["lb_qkv"])
            pl_store_cols(qkv_out, c * qkv.chunk, qkv.chunk, y)

        # ---------------- attention phase ----------------
        @pl.when(jnp.logical_and(~in_lm, s == plan.base_att))
        def _att():
            qkvb = qkv_out[:, :plan.QKVN] + \
                args["qkv_b"][0, 0][None, :].astype(jnp.float32)
            qr = qkvb[:, :HD]
            kr = qkvb[:, HD:HD + KH * D]
            vr = qkvb[:, HD + KH * D:HD + 2 * KH * D]
            if plan.qk_norm:
                # Qwen3 per-head QK RMSNorm before rope (QKLayerNormNoBeta)
                def rmsh(vec, nh, w):
                    cols = []
                    for hh in range(nh):
                        blk = vec[:, hh * D:(hh + 1) * D]
                        var = jnp.mean(blk * blk, axis=-1, keepdims=True)
                        cols.append(blk * jax.lax.rsqrt(var + eps))
                    return jnp.concatenate(cols, axis=-1) * w
                qr = rmsh(qr, H, args["qk_norms"][0, 0][None, :]
                          .astype(jnp.float32))
                # slice-then-None: [None, :KH*D] on a 1-D value traces to a
                # gather Mosaic can't lower
                kr = rmsh(kr, KH, args["qk_norms"][0, 1][:KH * D][None, :]
                          .astype(jnp.float32))
            if plan.alibi:
                # ALiBi: no rotary; the positional signal is the score bias
                # in the page loop (reference ALiBiPE op)
                q_rot, k_rot = qr, kr
            else:
                cq = args["cosq"][:].astype(jnp.float32)
                sq = args["sinq"][:].astype(jnp.float32)
                ck = args["cosk"][:].astype(jnp.float32)
                sk = args["sink"][:].astype(jnp.float32)
                q_rot = qr * cq + _rot_half_heads(qr, D) * sq
                k_rot = kr * ck + _rot_half_heads(kr, D) * sk

            # stash new-token kv (quantize per head)
            k3 = k_rot.reshape(B, KH, D)
            v3 = vr.reshape(B, KH, D)
            if kv_quant:
                def qz(x):
                    xmin = jnp.min(x, axis=-1)
                    xmax = jnp.max(x, axis=-1)
                    # (casts hop through int32 — Mosaic has no direct
                    # f32 -> i8/u8 conversion)
                    if plan.kv_bits == 8:
                        sc_ = jnp.maximum((xmax - xmin) / 255.0, 1e-8)
                        qv = jnp.clip(jnp.round((x - xmin[..., None]) / sc_[..., None]) - 128.0, -128, 127)
                        zr = xmin + 128.0 * sc_
                        pay = qv.astype(jnp.int32).astype(jnp.int8)
                    else:
                        sc_ = jnp.maximum((xmax - xmin) / 15.0, 1e-8)
                        qv = jnp.clip(jnp.round((x - xmin[..., None]) / sc_[..., None]), 0, 15).astype(jnp.int32)
                        zr = xmin
                        lo = qv[..., :D // 2]
                        hi = qv[..., D // 2:]
                        pay = (lo | (hi << 4)).astype(jnp.uint8)
                    return pay, sc_, zr
                kpay, ksc, kzr = qz(k3)
                vpay, vsc, vzr = qz(v3)
            else:
                kpay, ksc, kzr = k3.astype(kv_dtype), None, None
                vpay, vsc, vzr = v3.astype(kv_dtype), None, None

            if plan.kv_bits == 4:
                # u4: Dsc=64 per head, so kpay is [B, KH, 64] and the
                # flat reshape would merge sub-128-lane i8 rows — Mosaic
                # rejects that relayout ("unsupported shape cast"). Merge
                # per head into the 64-lane block instead: sub-128 i8
                # lane-sliced where-stores DO lower (probed on v5e).
                lsel_h = jax.lax.broadcasted_iota(
                    jnp.int32, (B, L, Dsc), 1) == l
                for h in range(KH):
                    kh_pay = kpay[:, h, :]
                    vh_pay = vpay[:, h, :]
                    cols = slice(h * Dsc, (h + 1) * Dsc)
                    nk_buf[:, :, cols] = jnp.where(
                        lsel_h, kh_pay[:, None, :], nk_buf[:, :, cols])
                    nv_buf[:, :, cols] = jnp.where(
                        lsel_h, vh_pay[:, None, :], nv_buf[:, :, cols])
            else:
                lsel = jax.lax.broadcasted_iota(jnp.int32, (B, L, F), 1) == l
                nk_buf[:] = jnp.where(lsel, kpay.reshape(B, 1, F), nk_buf[:])
                nv_buf[:] = jnp.where(lsel, vpay.reshape(B, 1, F), nv_buf[:])
            if kv_quant:
                lsel2 = jax.lax.broadcasted_iota(
                    jnp.int32, (B, L, 2 * KH), 1) == l
                kp_row = jnp.concatenate([ksc, kzr], axis=-1)  # [B, 2KH]
                vp_row = jnp.concatenate([vsc, vzr], axis=-1)
                nkp_buf[:] = jnp.where(lsel2, kp_row[:, None, :], nkp_buf[:])
                nvp_buf[:] = jnp.where(lsel2, vp_row[:, None, :], nvp_buf[:])

            # q into [B, KH, G8, D] padded layout via one reshape + KH
            # scatter slices (measured ~18 us/layer on v5e vs ~25 us for
            # 448 per-row lane slices — tools/probe_reshape.py)
            if G8 != G:
                q4[:] = jnp.zeros_like(q4)
            qre = q_rot.astype(jnp.bfloat16).reshape(B, H, D)
            for h in range(KH):
                q4[:, h, :G, :] = qre[:, h * G:(h + 1) * G, :]

            init_ml = jnp.concatenate(
                [jnp.full((B, KH, G8, 1), _NEG_INF, jnp.float32),
                 jnp.zeros((B, KH, G8, 1), jnp.float32)], axis=-1)
            ml_st[:] = init_ml
            acc_at[:] = jnp.zeros_like(acc_at)
            if _DEBUG:
                def _nn(x):
                    return jnp.sum(jnp.isnan(x.astype(jnp.float32)))
                pl.debug_print(
                    "att-pre l={} nan(qkv_out)={} nan(qrot)={} nan(krot)={} "
                    "nan(q4)={} nan(cq)={} nan(bias)={}",
                    l, _nn(qkv_out[:]), _nn(q_rot), _nn(k_rot), _nn(q4[:]),
                    _nn(cq), _nn(args["qkv_b"][0]))

            # ---- page loop: ring DMA + online softmax, C pages/iter ----
            n = n_sched[0]
            ngr = n // C if C > 1 else n

            def page_copies(gi):
                slot = jax.lax.rem(gi, RING)
                cps = []
                for j in range(C):
                    i = gi * C + j
                    bb = sched_b[i]
                    # dummy tail entries may carry sched_p >= maxP; clamp
                    # for the pt lookup only (their tokens are masked)
                    pp = jnp.minimum(sched_p[i], maxP - 1)
                    g = pt[bb, pp]
                    phys = g * L + l
                    cps.append(pltpu.make_async_copy(
                        args["k"].at[phys],
                        kbuf.at[slot, pl.ds(j * ps, ps), :],
                        page_sems.at[0, slot, j]))
                    cps.append(pltpu.make_async_copy(
                        args["v"].at[phys],
                        vbuf.at[slot, pl.ds(j * ps, ps), :],
                        page_sems.at[1, slot, j]))
                    if kv_quant:
                        cps.append(pltpu.make_async_copy(
                            args["kq"].at[phys],
                            kqbuf.at[slot, :, pl.ds(j * QL, QL)],
                            page_sems.at[2, slot, j]))
                        cps.append(pltpu.make_async_copy(
                            args["vq"].at[phys],
                            vqbuf.at[slot, :, pl.ds(j * QL, QL)],
                            page_sems.at[3, slot, j]))
                return cps

            def start(gi):
                for cp in page_copies(gi):
                    cp.start()

            for gi in range(RING):
                @pl.when(gi < ngr)
                def _(gi=gi):
                    start(jnp.int32(gi))

            def page_body(gi, _):
                slot = jax.lax.rem(gi, RING)
                base_i = gi * C
                bb = sched_b[base_i]
                for cp in page_copies(gi):
                    cp.wait()

                iota_ps = jax.lax.broadcasted_iota(jnp.int32, (1, ps), 1)
                if C == 1:
                    tok = sched_p[base_i] * ps + iota_ps
                else:
                    tok = jnp.concatenate(
                        [sched_p[base_i + j] * ps + iota_ps
                         for j in range(C)], axis=1)
                tmask = tok < lens[bb]

                def qrow(buf, r):
                    """qparam row r of this ring slot as [1, psC], compacted
                    from the QL-strided lane layout (token t of page j at
                    lane j*ps + t, matching the score tile). 2-D slices and
                    concat on purpose: Mosaic lowers 1-D lane concats only
                    within the first 128-lane tile; the 2-D form at
                    128-aligned offsets lowers at any width."""
                    row2 = buf[slot][r:r + 1]                # [1, C*QL]
                    if QL == ps:
                        return row2
                    return jnp.concatenate(
                        [row2[:, j * QL:j * QL + ps] for j in range(C)],
                        axis=1)

                for h in range(KH):
                    qh = q4[bb, h].astype(jnp.float32)   # [G8, D]

                    def dot_nt(a, bm):
                        return jax.lax.dot_general(
                            a, bm, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32)

                    if plan.kv_bits == 16:
                        kk = kbuf[slot][:, h * D:(h + 1) * D].astype(jnp.float32)
                        sco = dot_nt(qh, kk)
                    elif plan.kv_bits == 8:
                        kk = kbuf[slot][:, h * D:(h + 1) * D].astype(jnp.float32)
                        sraw = dot_nt(qh, kk)
                        kscal = qrow(kqbuf, 2 * h)       # [1, psC]
                        kzero = qrow(kqbuf, 2 * h + 1)
                        qs = jnp.sum(qh, axis=1, keepdims=True)
                        sco = sraw * kscal + qs * kzero
                    else:
                        D2 = D // 2
                        p32 = kbuf[slot][:, h * D2:(h + 1) * D2].astype(jnp.int32)
                        klo = (p32 & 0xF).astype(jnp.float32)
                        khi = (p32 >> 4).astype(jnp.float32)
                        sraw = dot_nt(qh[:, :D2], klo) + dot_nt(qh[:, D2:], khi)
                        kscal = qrow(kqbuf, 2 * h)       # [1, psC]
                        kzero = qrow(kqbuf, 2 * h + 1)
                        qs = jnp.sum(qh, axis=1, keepdims=True)
                        sco = sraw * kscal + qs * kzero

                    sco = sco * scale_att
                    if plan.alibi:
                        # bias = slope_h * (k_pos - q_pos); q_pos = lens[bb]
                        # (the new token's position — keys are 0..lens-1).
                        # Diagonal bias 0 => new-token column needs no term.
                        slp = args["slopes"][h, :]            # [G8]
                        dist = (tok - lens[bb]).astype(jnp.float32)  # [1,ps]
                        sco = sco + slp[:, None] * dist
                    sco = jnp.where(tmask, sco, _NEG_INF)

                    m_prev = ml_st[bb, h, :, 0:1]
                    l_prev = ml_st[bb, h, :, 1:2]
                    m_cur = jnp.max(sco, axis=-1, keepdims=True)
                    m_new = jnp.maximum(m_prev, m_cur)
                    alpha = jnp.exp(m_prev - m_new)
                    pexp = jnp.exp(sco - m_new)
                    l_new = alpha * l_prev + jnp.sum(pexp, axis=-1,
                                                     keepdims=True)

                    if plan.kv_bits == 16:
                        vv = vbuf[slot][:, h * D:(h + 1) * D].astype(jnp.float32)
                        pv = jnp.dot(pexp, vv,
                                     preferred_element_type=jnp.float32)
                    else:
                        vscal = qrow(vqbuf, 2 * h)       # [1, psC]
                        vzero = qrow(vqbuf, 2 * h + 1)
                        pexp_s = pexp * vscal
                        # lane-reduce instead of a [psC,1] MXU dot: vzero is
                        # a 2-D row (see qrow); sum(pexp*vzero) is the same
                        # zero-point term without a transpose
                        zterm = jnp.sum(pexp * vzero, axis=-1,
                                        keepdims=True)
                        if plan.kv_bits == 8:
                            vv = vbuf[slot][:, h * D:(h + 1) * D].astype(jnp.float32)
                            pv = jnp.dot(pexp_s, vv,
                                         preferred_element_type=jnp.float32) + zterm
                        else:
                            D2 = D // 2
                            p32 = vbuf[slot][:, h * D2:(h + 1) * D2].astype(jnp.int32)
                            vlo = (p32 & 0xF).astype(jnp.float32)
                            vhi = (p32 >> 4).astype(jnp.float32)
                            pvl = jnp.dot(pexp_s, vlo,
                                          preferred_element_type=jnp.float32)
                            pvh = jnp.dot(pexp_s, vhi,
                                          preferred_element_type=jnp.float32)
                            pv = jnp.concatenate(
                                [pvl + zterm, pvh + zterm], axis=-1)

                    acc_at[bb, h] = acc_at[bb, h] * alpha + pv
                    ml_st[bb, h] = jnp.concatenate([m_new, l_new], axis=-1)
                    if _DEBUG and h == 0:
                        pl.debug_print(
                            "  pg g={} b={} p={} k00={} q00={} scomax={} "
                            "mnew={} lnew={} pv00={}",
                            gi, bb, sched_p[base_i], kbuf[slot][0, 0],
                            qh[0, 0],
                            jnp.max(sco), m_new[0, 0], l_new[0, 0], pv[0, 0])

                nxt = gi + RING
                @pl.when(nxt < ngr)
                def _():
                    start(nxt)
                return ()

            jax.lax.fori_loop(0, ngr, page_body, ())

            # ---- new-token column (from VMEM, not HBM), vectorized over the
            # whole [B, KH, G8, *] state (replaces B*KH tiny M=8/N=1 MXU
            # dots with ~10 VPU ops). Inactive slots accumulate garbage only
            # in their own batch row — rows never mix in the dots and the
            # lm-phase pool-write guard still protects the KV pool.
            k3f = k3.astype(jnp.float32)                 # [B, KH, D]
            v3f = v3.astype(jnp.float32)
            q4f = q4[:].astype(jnp.float32)              # [B, KH, G8, D]
            sco = jnp.sum(q4f * k3f[:, :, None, :], axis=-1,
                          keepdims=True) * scale_att     # [B, KH, G8, 1]
            m_prev = ml_st[:, :, :, 0:1]
            l_prev = ml_st[:, :, :, 1:2]
            m_new = jnp.maximum(m_prev, sco)
            alpha = jnp.exp(m_prev - m_new)
            pexp = jnp.exp(sco - m_new)
            lv = alpha * l_prev + pexp
            ml_st[:] = jnp.concatenate([m_new, lv], axis=-1)
            lv = jnp.where(lv == 0.0, 1.0, lv)
            accf = (acc_at[:] * alpha + pexp * v3f[:, :, None, :]) / lv
            acc_at[:] = accf

            # ---- finalize into attn_out [B, HD]: KH reshape slices ----
            for h in range(KH):
                blk = accf[:, h, :G, :].reshape(B, G * D)
                attn_out[:, h * G * D:(h + 1) * G * D] = \
                    blk.astype(jnp.bfloat16)
            if _DEBUG:
                pl.debug_print("att l={} xn00={} qkv00={} m000={} l000={} "
                               "acc000={} ao00={}",
                               l, x_norm[0, 0], qkv_out[0, 0],
                               ml_st[0, 0, 0, 0], ml_st[0, 0, 0, 1],
                               acc_at[0, 0, 0, 0], attn_out[0, 0])

        # ---------------- o phase ----------------
        @pl.when(jnp.logical_and(
            ~in_lm, jnp.logical_and(s >= plan.base_o, s < plan.base_gu)))
        def _o():
            c = s - plan.base_o
            if LORA:
                @pl.when(c == 0)
                def _():
                    lora_proj(attn_out[:], args["la_o"], args["lmask1"],
                              lh_o)
            y = _stream_dot(plan, o_sp, attn_out[:],
                            args["o_w"], args.get("o_s"), args.get("o_z"), c,
                            wdeq=wdeq)
            if LORA:
                y = y + lora_delta(lh_o, args["lb_o"])
            # o.Np == hid (chunk divides hid; see make_plan), so chunk adds
            # land exactly on the residual columns
            cur = x_resid[:, pl.ds(pl.multiple_of(c * o_sp.chunk, 128),
                                   o_sp.chunk)]
            x_resid[:, pl.ds(pl.multiple_of(c * o_sp.chunk, 128),
                             o_sp.chunk)] = cur + y

        def swiglu_into_guout(inter_v, Kp_dn):
            """gate|up halves in gu_out -> activation in gu_out[:, :inter_v]
            (zero-padded to the down stream's Kp); reset the accumulator."""
            gate = gu_out[:, :inter_v].astype(jnp.float32)
            up = gu_out[:, inter_v:2 * inter_v].astype(jnp.float32)
            act = (gate * jax.lax.logistic(gate) * up).astype(jnp.bfloat16)
            gu_out[:, :inter_v] = act
            if Kp_dn > inter_v:
                gu_out[:, inter_v:Kp_dn] = jnp.zeros(
                    (B, Kp_dn - inter_v), jnp.bfloat16)
            acc_dn[:] = jnp.zeros_like(acc_dn)

        def interleave_chunk(g_sp, u_sp, d_sp, pre, c):
            """One interleaved gate/up/down chunk -> [B, hid] partial
            (prefill megakernel geometry; shared pack)."""
            g_ = _stream_dot(plan, g_sp, x_norm[:], args[pre + "g_w"],
                             args.get(pre + "g_s"), args.get(pre + "g_z"),
                             c, wdeq=wdeq)
            u_ = _stream_dot(plan, u_sp, x_norm[:], args[pre + "u_w"],
                             args.get(pre + "u_s"), args.get(pre + "u_z"),
                             c, wdeq=wdeq)
            act = (g_ * jax.lax.logistic(g_) * u_).astype(jnp.bfloat16)
            return _stream_dot(plan, d_sp, act, args[pre + "d_w"],
                               args.get(pre + "d_s"), args.get(pre + "d_z"),
                               c, wdeq=wdeq)

        if ILV and not MOE:
            # ------------- interleaved mlp phase (dense) -------------
            @pl.when(jnp.logical_and(~in_lm, s >= plan.base_mlp))
            def _mlp():
                c = s - plan.base_mlp

                @pl.when(c == 0)
                def _():
                    x_norm[:] = _rms(x_resid[:], args["norms"][0, 1],
                                     eps).astype(jnp.bfloat16)
                    acc_dn[:] = jnp.zeros_like(acc_dn)
                    if LORA:
                        lora_proj(x_norm[:], args["la_g"], args["lmask1"],
                                  lh_g)
                        lora_proj(x_norm[:], args["la_u"], args["lmask1"],
                                  lh_u)
                        lh_d[:] = jnp.zeros_like(lh_d)

                if LORA:
                    # inline interleave with per-chunk LoRA deltas: the
                    # down A-projection consumes the LORA-ADJUSTED
                    # activation (XLA-path semantics)
                    g_ = _stream_dot(plan, pg, x_norm[:], args["pg_w"],
                                     args.get("pg_s"), args.get("pg_z"),
                                     c, wdeq=wdeq) \
                        + lora_delta(lh_g, args["lb_g"])
                    u_ = _stream_dot(plan, pu, x_norm[:], args["pu_w"],
                                     args.get("pu_s"), args.get("pu_z"),
                                     c, wdeq=wdeq) \
                        + lora_delta(lh_u, args["lb_u"])
                    act = (g_ * jax.lax.logistic(g_) * u_) \
                        .astype(jnp.bfloat16)
                    y = _stream_dot(plan, pd, act, args["pd_w"],
                                    args.get("pd_s"), args.get("pd_z"),
                                    c, wdeq=wdeq)
                    lh_d[:] = lh_d[:] + jax.lax.dot_general(
                        act, args["la_d"][0], (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32)
                else:
                    y = interleave_chunk(pg, pu, pd, "p", c)
                acc_dn[:] = acc_dn[:] + y[:, :hid]

                @pl.when(c == pg.S - 1)
                def _():
                    if LORA:
                        x_resid[:] = x_resid[:] + acc_dn[:] + \
                            jax.lax.dot_general(
                                (lh_d[:] * args["lmask1"][:])
                                .astype(jnp.bfloat16),
                                args["lb_d"][0], (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
                    else:
                        x_resid[:] = x_resid[:] + acc_dn[:]
        elif not MOE:
            # ---------------- gate/up phase (dense) ----------------
            @pl.when(jnp.logical_and(
                ~in_lm, jnp.logical_and(s >= plan.base_gu, s < plan.base_dn)))
            def _gu():
                @pl.when(s == plan.base_gu)
                def _():
                    x_norm[:] = _rms(x_resid[:], args["norms"][0, 1],
                                     eps).astype(jnp.bfloat16)
                c = s - plan.base_gu
                y = _stream_dot(plan, gu, x_norm[:],
                                args["gu_w"], args.get("gu_s"),
                                args.get("gu_z"), c, wdeq=wdeq)
                pl_store_cols(gu_out, c * gu.chunk, gu.chunk,
                              y.astype(jnp.bfloat16))

            # ---------------- down phase (dense) ----------------
            @pl.when(jnp.logical_and(~in_lm, s >= plan.base_dn))
            def _dn():
                c = s - plan.base_dn

                @pl.when(c == 0)
                def _():
                    swiglu_into_guout(plan.inter, dn.Kp)

                xc = pl_load_cols(gu_out, c * dn.chunk, dn.chunk)
                y = _stream_dot(plan, dn, xc,
                                args["dn_w"], args.get("dn_s"),
                                args.get("dn_z"), c, wdeq=wdeq)
                acc_dn[:] = acc_dn[:] + y[:, :hid]

                @pl.when(c == dn.S - 1)
                def _():
                    x_resid[:] = x_resid[:] + acc_dn[:]
                    if _DEBUG:
                        pl.debug_print("dn l={} xr00={} gu00={} dn00={}",
                                       l, x_resid[0, 0], gu_out[0, 0],
                                       acc_dn[0, 0])
        else:
            # ---------------- router phase (MoE) ----------------
            # (reference MOE op softmax+topk routing, moe_op.cpp; gates for
            # every expert live in VMEM — non-selected experts get gate 0 and
            # their streamed chunks contribute nothing)
            lane_ep = jax.lax.broadcasted_iota(jnp.int32, (B, plan.EP), 1)

            @pl.when(jnp.logical_and(~in_lm, s == plan.base_router))
            def _router():
                x_norm[:] = _rms(x_resid[:], args["norms"][0, 1],
                                 eps).astype(jnp.bfloat16)
                rw = args["router_w"][0]                     # [hid, EP]
                logits = jax.lax.dot_general(
                    x_norm[:], rw, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)      # [B, EP]
                ml = jnp.where(lane_ep < E, logits, _NEG_INF)
                m = jnp.max(ml, axis=-1, keepdims=True)
                p = jnp.exp(ml - m)
                p = p / jnp.sum(p, axis=-1, keepdims=True)
                gates = jnp.zeros((B, plan.EP), jnp.float32)
                pw = p
                for _ in range(plan.k_top):
                    mi = jnp.max(pw, axis=-1, keepdims=True)
                    fl = jnp.min(jnp.where(pw >= mi, lane_ep, plan.EP),
                                 axis=-1, keepdims=True)
                    sel = lane_ep == fl
                    gates = jnp.where(sel, p, gates)
                    pw = jnp.where(sel, -1.0, pw)
                if plan.norm_topk:
                    gates = gates / jnp.sum(gates, axis=-1, keepdims=True)
                if plan.has_shared:
                    if plan.has_shared_gate:
                        sval = jnp.sum(
                            jnp.where(lane_ep == E, logits, 0.0),
                            axis=-1, keepdims=True)
                        sg = jax.lax.logistic(sval)
                    else:
                        sg = jnp.ones((B, 1), jnp.float32)
                    gates = jnp.where(lane_ep == E, sg, gates)
                gates_st[:] = gates
                if ILV:
                    acc_dn[:] = jnp.zeros_like(acc_dn)

            if ILV:
                # ------------- per-expert interleaved chunks -------------
                in_expi = jnp.logical_and(
                    s >= plan.base_exp,
                    s < plan.base_exp + E * pg.S)
                end_exp = plan.base_exp + E * pg.S

                @pl.when(jnp.logical_and(~in_lm, in_expi))
                def _emlp():
                    c_all_i = jnp.clip(s - plan.base_exp, 0, E * pg.S - 1)
                    e_i = c_all_i // pg.S
                    y = interleave_chunk(pg, pu, pd, "p", c_all_i)
                    ge = jnp.sum(
                        jnp.where(lane_ep == e_i, gates_st[:], 0.0),
                        axis=-1, keepdims=True)              # [B, 1]
                    acc_dn[:] = acc_dn[:] + ge * y[:, :hid]
                    if not plan.has_shared:
                        @pl.when(c_all_i == E * pg.S - 1)
                        def _():
                            x_resid[:] = x_resid[:] + acc_dn[:]

                if plan.has_shared:
                    psg_, psu_, psd_ = plan.psg, plan.psu, plan.psd

                    @pl.when(jnp.logical_and(~in_lm, s >= end_exp))
                    def _smlp():
                        c = s - end_exp
                        y = interleave_chunk(psg_, psu_, psd_, "s", c)
                        sgv = jnp.sum(
                            jnp.where(lane_ep == E, gates_st[:], 0.0),
                            axis=-1, keepdims=True)
                        acc_dn[:] = acc_dn[:] + sgv * y[:, :hid]

                        @pl.when(c == psg_.S - 1)
                        def _():
                            x_resid[:] = x_resid[:] + acc_dn[:]

            if not ILV:
                in_exp = jnp.logical_and(s >= plan.base_exp, s < plan.base_sgu)
                c_all = jnp.clip(s - plan.base_exp, 0, E * SE - 1)
                e_idx = c_all // SE
                w_in = c_all - e_idx * SE

                # ---------------- expert gate/up (MoE) ----------------
                @pl.when(jnp.logical_and(
                    ~in_lm, jnp.logical_and(in_exp, w_in < gu.S)))
                def _egu():
                    c = w_in
                    y = _stream_dot(plan, gu, x_norm[:],
                                    args["gu_w"], args.get("gu_s"),
                                    args.get("gu_z"), c, wdeq=wdeq)
                    pl_store_cols(gu_out, c * gu.chunk, gu.chunk,
                                  y.astype(jnp.bfloat16))

                    @pl.when(c == gu.S - 1)
                    def _():
                        swiglu_into_guout(plan.inter, dn.Kp)

                # ---------------- expert down (MoE) ----------------
                @pl.when(jnp.logical_and(
                    ~in_lm, jnp.logical_and(in_exp, w_in >= gu.S)))
                def _edn():
                    c = w_in - gu.S
                    xc = pl_load_cols(gu_out, c * dn.chunk, dn.chunk)
                    y = _stream_dot(plan, dn, xc,
                                    args["dn_w"], args.get("dn_s"),
                                    args.get("dn_z"), c, wdeq=wdeq)
                    acc_dn[:] = acc_dn[:] + y[:, :hid]

                    @pl.when(c == dn.S - 1)
                    def _():
                        ge = jnp.sum(
                            jnp.where(lane_ep == e_idx, gates_st[:], 0.0),
                            axis=-1, keepdims=True)              # [B, 1]
                        x_resid[:] = x_resid[:] + ge * acc_dn[:]

                if plan.has_shared:
                    sgu_, sdn_ = plan.sgu, plan.sdn

                    # ---------------- shared expert (CalcExpert) ----------------
                    @pl.when(jnp.logical_and(~in_lm, jnp.logical_and(
                        s >= plan.base_sgu, s < plan.base_sdn)))
                    def _sgu():
                        c = s - plan.base_sgu
                        y = _stream_dot(plan, sgu_, x_norm[:],
                                        args["sg_w"], args.get("sg_s"),
                                        args.get("sg_z"), c, wdeq=wdeq)
                        pl_store_cols(gu_out, c * sgu_.chunk, sgu_.chunk,
                                      y.astype(jnp.bfloat16))

                        @pl.when(c == sgu_.S - 1)
                        def _():
                            swiglu_into_guout(plan.shared_inter, sdn_.Kp)

                    @pl.when(jnp.logical_and(~in_lm, s >= plan.base_sdn))
                    def _sdn():
                        c = s - plan.base_sdn
                        xc = pl_load_cols(gu_out, c * sdn_.chunk, sdn_.chunk)
                        y = _stream_dot(plan, sdn_, xc,
                                        args["sd_w"], args.get("sd_s"),
                                        args.get("sd_z"), c, wdeq=wdeq)
                        acc_dn[:] = acc_dn[:] + y[:, :hid]

                        @pl.when(c == sdn_.S - 1)
                        def _():
                            sgv = jnp.sum(
                                jnp.where(lane_ep == E, gates_st[:], 0.0),
                                axis=-1, keepdims=True)
                            x_resid[:] = x_resid[:] + sgv * acc_dn[:]

        # ---------------- lm phase ----------------
        @pl.when(in_lm)
        def _lm():
            c = t - L * S_layer

            @pl.when(c == 0)
            def _first():
                x_norm[:] = _rms(x_resid[:], args["final_norm"][0],
                                 eps).astype(jnp.bfloat16)
                # Flush the step's new-token KV: one RMW window per slot,
                # flushed in SLOT CHUNKS of SC through a 2-deep ring — each
                # chunk's reads go in flight together, merges run while the
                # other ring slot's writes drain, and the whole pipeline
                # overlaps the lm weight stream. Slots hold distinct
                # logical pages, so windows never overlap. (A per-slot
                # serialized start/wait chain is O(B) DMA round trips and
                # dominated the step at batch 32; a [B, ...] all-at-once
                # window set was ~29 MB of whole-kernel VMEM at bs=64 and
                # de-pipelined the weight stream.)
                def slot_win(b):
                    g = tgt_page[b]
                    off = lens[b] % ps
                    w0 = pl.multiple_of((off // _RMW_W) * _RMW_W, _RMW_W)
                    q0 = pl.multiple_of((off // RWQ) * RWQ, RWQ) \
                        if QL > RWQ else 0
                    return g * L, w0, off, q0

                def read_copies(ring, j, b):
                    row0, w0, off, q0 = slot_win(b)
                    cps = [
                        pltpu.make_async_copy(
                            args["k"].at[pl.ds(row0, L),
                                         pl.ds(w0, _RMW_W), :],
                            rmw_k.at[ring, j], rmw_sems.at[0, ring, j]),
                        pltpu.make_async_copy(
                            args["v"].at[pl.ds(row0, L),
                                         pl.ds(w0, _RMW_W), :],
                            rmw_v.at[ring, j], rmw_sems.at[1, ring, j]),
                    ]
                    if kv_quant:
                        cps += [
                            pltpu.make_async_copy(
                                args["kq"].at[pl.ds(row0, L), :,
                                              pl.ds(q0, RWQ)],
                                rmw_kq.at[ring, j],
                                rmw_sems.at[2, ring, j]),
                            pltpu.make_async_copy(
                                args["vq"].at[pl.ds(row0, L), :,
                                              pl.ds(q0, RWQ)],
                                rmw_vq.at[ring, j],
                                rmw_sems.at[3, ring, j]),
                        ]
                    return cps

                def write_copies(ring, j, b):
                    row0, w0, off, q0 = slot_win(b)
                    cps = [
                        pltpu.make_async_copy(
                            rmw_k.at[ring, j],
                            kpool_o.at[pl.ds(row0, L),
                                       pl.ds(w0, _RMW_W), :],
                            rmw_sems.at[0, ring, j]),
                        pltpu.make_async_copy(
                            rmw_v.at[ring, j],
                            vpool_o.at[pl.ds(row0, L),
                                       pl.ds(w0, _RMW_W), :],
                            rmw_sems.at[1, ring, j]),
                    ]
                    if kv_quant:
                        cps += [
                            pltpu.make_async_copy(
                                rmw_kq.at[ring, j],
                                kqpool_o.at[pl.ds(row0, L), :,
                                            pl.ds(q0, RWQ)],
                                rmw_sems.at[2, ring, j]),
                            pltpu.make_async_copy(
                                rmw_vq.at[ring, j],
                                vqpool_o.at[pl.ds(row0, L), :,
                                            pl.ds(q0, RWQ)],
                                rmw_sems.at[3, ring, j]),
                        ]
                    return cps

                def merge_slot(ring, j, b):
                    row0, w0, off, q0 = slot_win(b)
                    r = off - w0
                    # static per-row 2-D selects (axis-inserting int8
                    # reshapes don't lower on hardware)
                    for w in range(_RMW_W):
                        sel = r == w
                        rmw_k[ring, j, :, w, :] = jnp.where(
                            sel, nk_buf[b], rmw_k[ring, j, :, w, :])
                        rmw_v[ring, j, :, w, :] = jnp.where(
                            sel, nv_buf[b], rmw_v[ring, j, :, w, :])
                    if kv_quant:
                        lane2 = jax.lax.broadcasted_iota(
                            jnp.int32, (L, RWQ), 1)
                        hit = lane2 == off - q0
                        # nkp lanes: [scale(h=0..KH-1), zero(h=0..KH-1)];
                        # pool rows: 2h = scale_h, 2h+1 = zero_h
                        for h in range(KH):
                            for jj in range(2):
                                kcol = nkp_buf[b][:, jj * KH + h:
                                                  jj * KH + h + 1]
                                vcol = nvp_buf[b][:, jj * KH + h:
                                                  jj * KH + h + 1]
                                rmw_kq[ring, j, :, 2 * h + jj, :] = \
                                    jnp.where(hit, kcol,
                                              rmw_kq[ring, j, :,
                                                     2 * h + jj, :])
                                rmw_vq[ring, j, :, 2 * h + jj, :] = \
                                    jnp.where(hit, vcol,
                                              rmw_vq[ring, j, :,
                                                     2 * h + jj, :])

                for ci in range(NCH):
                    ring = ci % RNG2
                    base = ci * SC
                    if ci >= RNG2:
                        # reuse guard: this ring slot's previous chunk
                        # writes must land before its buffers are reread
                        pbase = (ci - RNG2) * SC
                        for j in range(min(SC, B - pbase)):
                            b = pbase + j

                            @pl.when(active[b] > 0)
                            def _(b=b, j=j, ring=ring):
                                for cp in write_copies(ring, j, b):
                                    cp.wait()
                    for j in range(min(SC, B - base)):
                        b = base + j

                        @pl.when(active[b] > 0)
                        def _(b=b, j=j, ring=ring):
                            for cp in read_copies(ring, j, b):
                                cp.start()
                    for j in range(min(SC, B - base)):
                        b = base + j

                        @pl.when(active[b] > 0)
                        def _(b=b, j=j, ring=ring):
                            for cp in read_copies(ring, j, b):
                                cp.wait()
                            merge_slot(ring, j, b)
                            for cp in write_copies(ring, j, b):
                                cp.start()

                for ci in range(max(NCH - RNG2, 0), NCH):
                    ring = ci % RNG2
                    base = ci * SC
                    for j in range(min(SC, B - base)):
                        b = base + j

                        @pl.when(active[b] > 0)
                        def _(b=b, j=j, ring=ring):
                            for cp in write_copies(ring, j, b):
                                cp.wait()

            y = _stream_dot(plan, lm, x_norm[:],
                            args["lm_w"], args.get("lm_s"), args.get("lm_z"),
                            c, wdeq=wdeq)
            logits_ref[:] = y

    # dynamic-column helpers over VMEM scratch (dim -1 slices must be
    # 128-aligned; chunk sizes are)
    def pl_store_cols(ref, col0, width, vals):
        ref[:, pl.ds(pl.multiple_of(col0, 128), width)] = vals.astype(ref.dtype)

    def pl_load_cols(ref, col0, width):
        return ref[:, pl.ds(pl.multiple_of(col0, 128), width)]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=NSCAL,
        grid=(T_total,),
        in_specs=in_specs,
        out_specs=out_specs,
        scratch_shapes=scratch_shapes,
    )

    out_shape = [jax.ShapeDtypeStruct((B, plan.Vp), jnp.float32)]

    def fn(packed: Dict, x0, cosq, sinq, cosk, sink,
           pt, lens, active, tgt_page, sched_b, sched_p, n_sched,
           k, v, kq=None, vq=None, lora=None):
        pools = [k, v] + ([kq, vq] if kv_quant else [])
        shapes = out_shape + [
            jax.ShapeDtypeStruct(p.shape, p.dtype) for p in pools]
        # aliases: indices count ALL args including scalar prefetch
        pool0 = NSCAL + NARG - npools
        aliases = {pool0 + i: 1 + i for i in range(npools)}
        tensors = [x0, cosq, sinq, cosk, sink]
        for sp, _ in stream_defs:
            tensors.append(packed[sp.name + "_w"])
            if sp.bits != 16:
                tensors.append(packed[sp.name + "_s"])
                tensors.append(packed[sp.name + "_z"])
        tensors += [packed["norms"], packed["qkv_b"], packed["final_norm"]]
        if plan.qk_norm:
            tensors.append(packed["qk_norms"])
        if plan.alibi:
            tensors.append(packed["slopes"])
        if MOE:
            tensors.append(packed["router_w"])
        if LORA:
            tensors += [lora[nm] for nm, _ in lora_defs]
        tensors += pools
        outs = pl.pallas_call(
            kernel,
            grid_spec=grid_spec,
            out_shape=shapes,
            input_output_aliases=aliases,
            interpret=interpret,
            compiler_params=None if interpret else pltpu.CompilerParams(
                has_side_effects=True,
                # big streamed weight chunks: lift Mosaic's default 16 MB
                # scoped-vmem cap toward the ~128 MB physical VMEM (v5e)
                vmem_limit_bytes=100 * 1024 * 1024),
        )(pt.astype(jnp.int32), lens.astype(jnp.int32),
          active.astype(jnp.int32), tgt_page.astype(jnp.int32),
          sched_b.astype(jnp.int32), sched_p.astype(jnp.int32),
          n_sched.astype(jnp.int32), *tensors)
        logits = outs[0]
        new_pools = outs[1:]
        return (logits,) + tuple(new_pools)

    return fn


def build_schedule(pt, lens, active, ps: int, chunk: int = 1):
    """In-jit flat page schedule: returns (sched_b, sched_p, n_sched,
    tgt_page). pt: [B, maxP] logical page table; lens: [B].

    With chunk > 1 (plan.page_chunk) each sequence's page count is padded
    to a multiple of `chunk` so the kernel can consume `chunk` consecutive
    pages of one sequence per loop iteration. Dummy tail entries have
    sched_p >= ceil(len/ps), so their tokens fail the in-kernel
    `tok < len` mask; every chunk-group contains >= 1 valid page."""
    B, maxP = pt.shape
    maxP_pad = -(-maxP // chunk) * chunk
    npages = jnp.where(active, -(-lens // ps), 0)             # ceil
    if chunk > 1:
        npages = -(-npages // chunk) * chunk
    p_idx = jnp.arange(maxP_pad, dtype=jnp.int32)[None, :]
    b_idx = jnp.arange(B, dtype=jnp.int32)[:, None]
    valid = p_idx < npages[:, None]
    order = jnp.argsort(~valid.reshape(-1), stable=True)
    sched_b = jnp.broadcast_to(b_idx, (B, maxP_pad)).reshape(-1)[order]
    sched_p = jnp.broadcast_to(p_idx, (B, maxP_pad)).reshape(-1)[order]
    n_sched = jnp.sum(valid).astype(jnp.int32)[None]
    tgt_col = jnp.clip(lens // ps, 0, maxP - 1)
    tgt_page = jnp.take_along_axis(pt, tgt_col[:, None], axis=1)[:, 0]
    return (sched_b.astype(jnp.int32), sched_p.astype(jnp.int32),
            n_sched, tgt_page.astype(jnp.int32))
