"""Whole-model PREFILL megakernel: one pallas_call per prefill.

Why: the XLA prefill path reaches ~42 GB/s effective weight bandwidth even
with dequant fused into the dot operand (ops/linear._quant_matmul_large_m),
because XLA's fused-operand dot re-expands the u4 payload per output tile.
Streaming every weight chunk through VMEM exactly once (the decode
megakernel's scheme, megakernel.py) is bandwidth-optimal: at in128 the
prefill is weight-stream-bound (~3.5 GB u4 -> ~15-20 ms floor) and at
in1024 compute-bound (~75-90 ms) — measured XLA path: 155 / 242 ms.

Structure (1-D grid, T = L * S_layer + S_lm):
  per layer: [qkv chunks (M=S) | attention+KV-writeout | o chunks |
              interleaved mlp chunks]
  then:      [lm chunks on the LAST valid token (M=8 pad)]

The MLP streams INTERLEAVE gate/up/down per intermediate-dim chunk c:
  act_c = silu(x_norm @ G_c) * (x_norm @ U_c);  acc += act_c @ D_c
so no [S, 2*inter] activation buffer is ever materialized (77 MB at
S=1024 — the reason the decode layout can't be reused for prefill).

Attention (one grid step per layer): bias + rope on the accumulated
qkv_out, per-head causal softmax over the full [S, S] score tile in VMEM
(S <= 1024), then the layer's K/V quantized per token and written STRAIGHT
to the paged pools with per-page async copies (fresh pages owned by this
request — no read-modify-write; garbage rows past the real length stay
within owned pages and are masked by `lens` at read time).

Scope (supports_prefill): dense RoPE archs incl. QK-norm, prefix_len == 0,
bucket <= 1024, whole buckets only — prefix-cache hits, chunked
continuations, LoRA, and multimodal embeds use the XLA path. Reference
equivalents: flash/xformer prefill + contextCopySpanLauncher
(span_attn_op_cuda.cpp), SURVEY.md §2.6.
"""

import dataclasses
import functools
import math
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from dashinfer_tpu.config import CacheMode, ModelConfig, RuntimeConfig
from dashinfer_tpu.ops.pallas.megakernel import (
    MegaPlan, StreamPlan, _chunk_leaves, _dequant_chunk, _leaf_to_int,
    _plan_stream, _rms, _rot_half_heads, _round_up, _weight_bits,
    weight_only_decode_view, _NEG_INF)

PREFILL_PACK_VERSION = 1


@dataclasses.dataclass(frozen=True)
class PrefillPlan:
    S: int                 # padded bucket length (tokens)
    L: int
    hid: int
    H: int
    KH: int
    D: int
    QKVN: int
    ps: int
    maxPb: int             # pages covering S
    Vp: int
    kv_mode: CacheMode
    kv_bits: int
    kv_dtype_name: str
    has_qkv_bias: bool
    qkv: StreamPlan
    o: StreamPlan
    pg: StreamPlan         # gate, n-chunked over inter
    pu: StreamPlan         # up, same geometry
    pd: StreamPlan         # down, k-chunked over inter with chunk == pg.chunk
    lm: StreamPlan
    rms_eps: float
    qk_norm: bool = False
    # ALiBi (Baichuan-13B): no rotary; score += slope_h * (k_pos - q_pos).
    # Slopes are baked in as compile-time constants (heads are unrolled).
    alibi: bool = False
    # MoE (reference MOE op + CalcExpert, moe_op.cpp): when E > 0 the
    # pg/pu/pd streams are PER-EXPERT over moe_inter (every expert's
    # weights stream once per layer; each expert's output is scaled by its
    # per-TOKEN gate — zero for tokens that didn't route to it). At small
    # buckets this is weight-stream-bound like decode; the all-token dense
    # compute per expert is the price for static shapes.
    E: int = 0
    k_top: int = 0
    norm_topk: bool = False
    has_shared: bool = False
    has_shared_gate: bool = False
    EP: int = 128
    psg: Optional[StreamPlan] = None   # shared-expert gate (interleaved)
    psu: Optional[StreamPlan] = None
    psd: Optional[StreamPlan] = None
    shared_inter: int = 0

    @property
    def S_layer(self) -> int:
        if self.E:
            s = self.qkv.S + 1 + self.o.S + 1 + self.E * self.pg.S
            if self.has_shared:
                s += self.psg.S
            return s
        return self.qkv.S + 1 + self.o.S + self.pg.S

    @property
    def T_total(self) -> int:
        return self.L * self.S_layer + self.lm.S

    @property
    def base_att(self) -> int:
        return self.qkv.S

    @property
    def base_o(self) -> int:
        return self.qkv.S + 1

    @property
    def base_mlp(self) -> int:
        return self.base_o + self.o.S

    @property
    def base_router(self) -> int:      # MoE only
        return self.base_o + self.o.S

    @property
    def base_exp(self) -> int:         # MoE only
        return self.base_router + 1

    @property
    def base_shared(self) -> int:      # MoE only
        return self.base_exp + self.E * self.pg.S

    @property
    def kv_store_dim(self) -> int:
        return self.D // 2 if self.kv_bits == 4 else self.D


def supports_prefill(cfg: ModelConfig, rt: RuntimeConfig, params: Dict,
                     bucket: int) -> bool:
    from dashinfer_tpu.ops.pallas import megakernel as mk
    if bucket > 1024 or bucket % 128:
        return False
    view = weight_only_decode_view(params)
    if view is None:
        return False
    if not mk.supports(cfg, rt, view):
        return False
    lp = view["layers"]
    if cfg.moe is not None:
        # per-expert interleaved streams: gate/up/down chunked IDENTICALLY
        # over moe_inter — uniform bits; group alignment is covered by
        # mk._moe_supports via mk.supports above
        from dashinfer_tpu.ops.pallas.megakernel import _expert_leaf_bits
        ex = lp["experts"]
        ebits = {_expert_leaf_bits(ex[n]) for n in ("gate_proj", "up_proj",
                                                    "down_proj")}
        if len(ebits) != 1:
            return False
        if cfg.moe.shared_expert_intermediate_size:
            se = lp["shared_expert"]
            sbits = {_weight_bits(se[n]) for n in ("gate_proj", "up_proj",
                                                   "down_proj")}
            if len(sbits) != 1:
                return False
        return True
    # the interleaved mlp stream needs gate/up/down chunked IDENTICALLY
    # over inter: uniform bits and 128-aligned (or per-channel) groups
    bits = {_weight_bits(lp[n]) for n in ("gate_proj", "up_proj",
                                          "down_proj")}
    if len(bits) != 1:
        return False
    dnl = lp["down_proj"]
    if "w_q" in dnl:
        Kdn = dnl["w_q"].shape[1]
        gs = Kdn // dnl["scale"].shape[1]
        # groups must tile the inter chunks — or be per-channel (gs == K,
        # one group spanning every chunk)
        if gs % 128 and gs != Kdn:
            return False
    return True


def make_prefill_plan(cfg: ModelConfig, rt: RuntimeConfig, params: Dict,
                      bucket: int,
                      target_chunk_bytes: int = 1 << 20,
                      decode_plan=None) -> PrefillPlan:
    """`decode_plan`: an interleaved-MLP decode MegaPlan whose StreamPlans
    this prefill plan adopts verbatim — the two kernels then index ONE
    packed weight set (reference shares one weight set between prefill and
    decode workers, engine_worker.cpp:103-117)."""
    if decode_plan is not None:
        assert decode_plan.interleave, "shared pack needs interleave_mlp"
        dp = decode_plan
        mode = rt.cache.mode
        kv_bits = {CacheMode.DEFAULT: 16, CacheMode.INT8: 8,
                   CacheMode.UINT4: 4}[mode]
        if mode == CacheMode.DEFAULT:
            kv_dtype_name = "float32" if rt.dtype == "float32" else "bfloat16"
        else:
            kv_dtype_name = "int8" if mode == CacheMode.INT8 else "uint8"
        return PrefillPlan(
            S=bucket, L=dp.L, hid=dp.hid, H=dp.H, KH=dp.KH, D=dp.D,
            QKVN=dp.QKVN, ps=rt.cache.page_size,
            maxPb=-(-bucket // rt.cache.page_size), Vp=dp.lm.Np,
            kv_mode=mode, kv_bits=kv_bits, kv_dtype_name=kv_dtype_name,
            has_qkv_bias=dp.has_qkv_bias,
            qkv=dp.qkv, o=dp.o, pg=dp.pg, pu=dp.pu, pd=dp.pd, lm=dp.lm,
            rms_eps=dp.rms_eps, qk_norm=dp.qk_norm, alibi=dp.alibi,
            E=dp.E, k_top=dp.k_top, norm_topk=dp.norm_topk,
            has_shared=dp.has_shared, has_shared_gate=dp.has_shared_gate,
            EP=dp.EP, psg=dp.psg, psu=dp.psu, psd=dp.psd,
            shared_inter=dp.shared_inter)
    params = weight_only_decode_view(params)
    lp = params["layers"]
    hid = cfg.hidden_size
    H, KH, D = cfg.num_heads, cfg.num_kv_heads, cfg.head_dim
    QKVN = (H + 2 * KH) * D
    inter = cfg.intermediate_size
    V = cfg.vocab_size
    ps = rt.cache.page_size

    def gs_of(leaf, K, gaxis=1):
        if "w_q" not in leaf:
            return 0
        g = leaf["scale"].shape[gaxis]
        return K if g == 1 else K // g

    qkv = _plan_stream("qkv", _weight_bits(lp["q_proj"]), hid, QKVN,
                       gs_of(lp["q_proj"], hid), target_chunk_bytes)
    o = _plan_stream("o", _weight_bits(lp["o_proj"]), H * D, hid,
                     gs_of(lp["o_proj"], H * D), target_chunk_bytes)
    while hid % o.chunk:
        o = dataclasses.replace(o, chunk=o.chunk - (256 if o.bits == 4
                                                    else 128))
    o = dataclasses.replace(o, S=hid // o.chunk, Np=hid)

    # interleaved mlp: ONE chunk width over inter shared by gate/up/down
    def plan_interleave(prefix, bits, gs_g, gs_d, m_inter):
        step = 256 if bits == 4 else 128
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

    from dashinfer_tpu.ops.pallas.megakernel import (_expert_gs,
                                                     _expert_leaf_bits)
    moe = cfg.moe
    psg = psu = psd = None
    sh_inter = 0
    if moe is not None:
        ex = lp["experts"]
        inter = moe.moe_intermediate_size
        pg, pu, pd = plan_interleave(
            "p", _expert_leaf_bits(ex["gate_proj"]),
            _expert_gs(ex["gate_proj"], hid),
            _expert_gs(ex["down_proj"], inter), inter)
        if moe.shared_expert_intermediate_size:
            se = lp["shared_expert"]
            sh_inter = moe.shared_expert_intermediate_size
            psg, psu, psd = plan_interleave(
                "s", _weight_bits(se["gate_proj"]),
                gs_of(se["gate_proj"], hid),
                gs_of(se["down_proj"], sh_inter), sh_inter)
    else:
        pg, pu, pd = plan_interleave(
            "p", _weight_bits(lp["gate_proj"]),
            gs_of(lp["gate_proj"], hid),
            gs_of(lp["down_proj"], inter), inter)

    lm_leaf = params["lm_head"] if not cfg.tie_word_embeddings else \
        {"w": params["embed_tokens"]["w"]}
    lm = _plan_stream("lm", _weight_bits(lm_leaf), hid, V,
                      gs_of(lm_leaf, hid, gaxis=0), target_chunk_bytes)

    mode = rt.cache.mode
    kv_bits = {CacheMode.DEFAULT: 16, CacheMode.INT8: 8,
               CacheMode.UINT4: 4}[mode]
    if mode == CacheMode.DEFAULT:
        kv_dtype_name = "float32" if rt.dtype == "float32" else "bfloat16"
    else:
        kv_dtype_name = "int8" if mode == CacheMode.INT8 else "uint8"
    return PrefillPlan(
        S=bucket, L=cfg.num_layers, hid=hid, H=H, KH=KH, D=D, QKVN=QKVN,
        ps=ps, maxPb=-(-bucket // ps), Vp=lm.Np, kv_mode=mode,
        kv_bits=kv_bits, kv_dtype_name=kv_dtype_name,
        has_qkv_bias=("b" in lp["q_proj"]),
        qkv=qkv, o=o, pg=pg, pu=pu, pd=pd, lm=lm,
        rms_eps=cfg.rms_norm_eps, qk_norm=cfg.qk_norm,
        alibi=cfg.position_embedding.value == "alibi",
        E=moe.num_experts if moe else 0,
        k_top=moe.num_experts_per_tok if moe else 0,
        norm_topk=moe.norm_topk_prob if moe else False,
        has_shared=psg is not None,
        has_shared_gate=(moe is not None and "shared_expert_gate" in lp),
        EP=(max(128, _round_up(
            moe.num_experts + (1 if psg is not None else 0), 128))
            if moe else 128),
        psg=psg, psu=psu, psd=psd, shared_inter=sh_inter)


def pack_prefill_params(cfg: ModelConfig, plan: PrefillPlan,
                        params: Dict) -> Dict:
    """Streamed-weight arrays for the prefill kernel (one-time at install)."""
    params = weight_only_decode_view(params)
    lp = jax.tree.map(np.asarray, params["layers"])
    L = plan.L
    out: Dict[str, Any] = {}

    def pack(sp: StreamPlan, leaves_per_layer):
        pays, scs, zcs = [], [], []
        for l in range(L):
            pay, sc, zc = _chunk_leaves(sp, leaves_per_layer(l))
            pays.append(pay)
            if sc is not None:
                scs.append(sc)
                zcs.append(zc)
        out[sp.name + "_w"] = jnp.asarray(np.stack(pays))
        if sp.bits != 16:
            out[sp.name + "_s"] = jnp.asarray(np.stack(scs))
            out[sp.name + "_z"] = jnp.asarray(np.stack(zcs))

    def pack_expert(sp: StreamPlan, leaves_per_expert):
        """[L, E*S, rows, cols]: expert e's chunks at rows e*S..(e+1)*S."""
        from dashinfer_tpu.ops.pallas.megakernel import _expert_leaf
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
        out[sp.name + "_w"] = jnp.asarray(np.stack(pays))
        if sp.bits != 16:
            out[sp.name + "_s"] = jnp.asarray(np.stack(scs))
            out[sp.name + "_z"] = jnp.asarray(np.stack(zcs))

    pack(plan.qkv, lambda l: [
        jax.tree.map(lambda a: a[l], lp["q_proj"]),
        jax.tree.map(lambda a: a[l], lp["k_proj"]),
        jax.tree.map(lambda a: a[l], lp["v_proj"])])
    pack(plan.o, lambda l: [jax.tree.map(lambda a: a[l], lp["o_proj"])])
    if plan.E:
        from dashinfer_tpu.ops.pallas.megakernel import _expert_leaf
        ex = lp["experts"]
        pack_expert(plan.pg,
                    lambda l, e: [_expert_leaf(ex["gate_proj"], l, e)])
        pack_expert(plan.pu,
                    lambda l, e: [_expert_leaf(ex["up_proj"], l, e)])
        pack_expert(plan.pd,
                    lambda l, e: [_expert_leaf(ex["down_proj"], l, e)])
        if plan.has_shared:
            se = lp["shared_expert"]
            pack(plan.psg,
                 lambda l: [jax.tree.map(lambda a: a[l], se["gate_proj"])])
            pack(plan.psu,
                 lambda l: [jax.tree.map(lambda a: a[l], se["up_proj"])])
            pack(plan.psd,
                 lambda l: [jax.tree.map(lambda a: a[l], se["down_proj"])])
        # router (+ shared gate col E) padded to EP lanes, bf16
        rw = np.zeros((L, plan.hid, plan.EP), np.float32)
        for l in range(L):
            rw[l, :, :plan.E] = np.asarray(lp["router"]["w"][l], np.float32)
            if plan.has_shared_gate:
                rw[l, :, plan.E:plan.E + 1] = np.asarray(
                    lp["shared_expert_gate"]["w"][l], np.float32)
        out["router_w"] = jnp.asarray(rw.astype(jnp.bfloat16))
    else:
        pack(plan.pg,
             lambda l: [jax.tree.map(lambda a: a[l], lp["gate_proj"])])
        pack(plan.pu,
             lambda l: [jax.tree.map(lambda a: a[l], lp["up_proj"])])
        pack(plan.pd,
             lambda l: [jax.tree.map(lambda a: a[l], lp["down_proj"])])

    lm_leaf = params["lm_head"] if not cfg.tie_word_embeddings else \
        {"w": np.asarray(params["embed_tokens"]["w"]).T}
    sp = plan.lm
    if sp.bits == 16:
        buf = np.zeros((sp.Kp, sp.Np), np.float32)
        w = np.asarray(lm_leaf["w"], np.float32)
        buf[:w.shape[0], :w.shape[1]] = w
        ch = buf.reshape(sp.Kp, sp.S, sp.chunk).transpose(1, 0, 2)
        out["lm_w"] = jnp.asarray(ch.astype(jnp.bfloat16))[None]
    else:
        q, s, z = _leaf_to_int(lm_leaf, sp.bits)
        from dashinfer_tpu.ops.pallas.megakernel import (_chunk_payload,
                                                         _chunk_qparams)
        out["lm_w"] = jnp.asarray(_chunk_payload(sp, q))[None]
        sc, zc = _chunk_qparams(sp, s, z)
        out["lm_s"] = jnp.asarray(sc)[None]
        out["lm_z"] = jnp.asarray(zc)[None]

    out["norms"] = jnp.asarray(np.stack(
        [np.stack([np.asarray(lp["input_layernorm"][l], np.float32),
                   np.asarray(lp["post_attention_layernorm"][l], np.float32)])
         for l in range(L)]).astype(jnp.bfloat16))
    if plan.has_qkv_bias:
        bias = np.concatenate(
            [np.asarray(lp["q_proj"]["b"], np.float32),
             np.asarray(lp["k_proj"]["b"], np.float32),
             np.asarray(lp["v_proj"]["b"], np.float32)], axis=1)
    else:
        bias = np.zeros((L, plan.QKVN), np.float32)
    bp = np.zeros((L, 1, plan.QKVN), np.float32)
    bp[:, 0, :bias.shape[1]] = bias
    out["qkv_b"] = jnp.asarray(bp.astype(jnp.bfloat16))
    out["final_norm"] = jnp.asarray(
        np.asarray(params["norm"], np.float32)[None].astype(jnp.bfloat16))
    if plan.qk_norm:
        HD = plan.H * plan.D
        qk = np.zeros((L, 2, HD), np.float32)
        for l in range(L):
            qk[l, 0] = np.tile(np.asarray(lp["q_norm"][l], np.float32),
                               plan.H)
            qk[l, 1, :plan.KH * plan.D] = np.tile(
                np.asarray(lp["k_norm"][l], np.float32), plan.KH)
        out["qk_norms"] = jnp.asarray(qk.astype(jnp.bfloat16))
    return out


def _wdeq_tile(sp: StreamPlan, w_ref, s_ref, z_ref):
    """Dequantize the current chunk's weight tile to bf16 [rows, cols]
    (weight-side dequant: at M = S tokens the [rows, cols] tile is far
    smaller than result-side [G, S, cols] temporaries)."""
    q = _dequant_chunk(w_ref, sp.bits)
    if sp.bits == 16:
        return q
    rows, cols = q.shape
    gs = sp.gs if sp.gs else rows
    # per-channel k-chunked streams (gs >= Kp > rows): whole chunk is one
    # group sharing the [1, cols] affine
    groups = rows // gs if gs <= rows else 1
    s = s_ref[0, 0].astype(jnp.float32)
    z = z_ref[0, 0].astype(jnp.float32)
    if groups == 1:
        return (q.astype(jnp.float32) * s + z).astype(jnp.bfloat16)
    qf = q.astype(jnp.float32).reshape(groups, gs, cols)
    w = qf * s[:, None, :] + z[:, None, :]
    return w.reshape(rows, cols).astype(jnp.bfloat16)


def _restripe_qrow(vec, ps: int, QL: int):
    """[S] per-token qparams (lane = sequence position) -> [1, maxPb*QL]
    page-strided row (token t of page j at lane j*QL + t; pad lanes zero,
    never read) so each page's write-out is a whole 128-lane-aligned [QL]
    block. Identity (reshaped 2-D) when QL == ps: ps >= 128 is already
    aligned. 2-D concatenate on purpose — Mosaic lowers 1-D lane concats
    only within the first 128-lane tile ("Input offsets outside of the
    first tile"), and `vec[None, a:b]` would trace to an unlowerable
    gather (None + partial slice), so reshape FIRST, slice 2-D after."""
    v2 = vec[None, :]
    if QL == ps:
        return v2
    S = vec.shape[0]
    assert S % ps == 0, (S, ps)  # ps < 128 divides the 128-multiple bucket
    pad = jnp.zeros((1, QL - ps), vec.dtype)
    return jnp.concatenate(
        [part for j in range(S // ps)
         for part in (v2[:, j * ps:(j + 1) * ps], pad)], axis=1)


def build_prefill_megakernel(plan: PrefillPlan,
                             interpret: Optional[bool] = None):
    """Returns fn(packed, x0 [S, hid] bf16, cos [S, D], sin [S, D],
    page_row [maxPb] PHYSICAL-page base rows (g*L), n_tokens scalar,
    k, v[, kq, vq]) -> (logits [8, Vp] f32 (row 0 real), k, v, kq, vq)."""
    S, L, hid = plan.S, plan.L, plan.hid
    H, KH, D = plan.H, plan.KH, plan.D
    HD = H * D
    ps, maxPb = plan.ps, plan.maxPb
    # qparam pool rows are [2*KH, QL], QL = round_up(ps, 128) (see
    # runtime/kv_cache.py — Mosaic requires 128-lane-aligned DMA slices).
    # For ps < 128 the qparam stash is page-strided (page j's tokens at
    # lanes j*QL..j*QL+ps-1) so each page's write-out is one aligned
    # full-row copy; for ps >= 128 the compact layout is already aligned.
    QL = -(-ps // 128) * 128
    SQ = S if QL == ps else maxPb * QL
    S_layer, T_total = plan.S_layer, plan.T_total
    kv_quant = plan.kv_mode != CacheMode.DEFAULT
    Dsc = plan.kv_store_dim
    F = KH * Dsc
    qkv, o_sp, pg, pu, pd, lm = (plan.qkv, plan.o, plan.pg, plan.pu,
                                 plan.pd, plan.lm)
    eps = plan.rms_eps
    scale_att = 1.0 / math.sqrt(D)
    if plan.alibi:
        from dashinfer_tpu.models.transformer import alibi_slopes
        slope_const = [float(x) for x in np.asarray(alibi_slopes(H))]
    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    NSCAL = 2  # page_row, n_tokens

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
        pl.BlockSpec((S, hid), lambda t, *_: (0, 0)),   # x0
        pl.BlockSpec((S, D), lambda t, *_: (0, 0)),     # cos (half-dim x2)
        pl.BlockSpec((S, D), lambda t, *_: (0, 0)),     # sin
    ]
    arg_names = ["x0", "cos", "sin"]

    MOE = plan.E > 0
    E, EP = plan.E, plan.EP
    if MOE:
        stream_defs = [
            (qkv, stream_idx(0, qkv.S)),
            (o_sp, stream_idx(plan.base_o, o_sp.S)),
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
    else:
        stream_defs = [
            (qkv, stream_idx(0, qkv.S)),
            (o_sp, stream_idx(plan.base_o, o_sp.S)),
            (pg, stream_idx(plan.base_mlp, pg.S)),
            (pu, stream_idx(plan.base_mlp, pu.S)),
            (pd, stream_idx(plan.base_mlp, pd.S)),
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

    if MOE:
        in_specs.append(pl.BlockSpec((1, hid, EP), norm_idx))
        arg_names.append("router_w")
    in_specs.append(pl.BlockSpec((1, 2, hid), norm_idx))
    arg_names.append("norms")
    in_specs.append(pl.BlockSpec((1, 1, plan.QKVN), norm_idx))
    arg_names.append("qkv_b")
    in_specs.append(pl.BlockSpec((1, hid), lambda t, *_: (0, 0)))
    arg_names.append("final_norm")
    if plan.qk_norm:
        in_specs.append(pl.BlockSpec((1, 2, HD), norm_idx))
        arg_names.append("qk_norms")
    npools = 4 if kv_quant else 2
    for _ in range(npools):
        in_specs.append(pl.BlockSpec(memory_space=pl.ANY))
    arg_names += ["k", "v", "kq", "vq"][:npools]

    out_specs = [pl.BlockSpec((8, lm.chunk), out_idx)] + \
        [pl.BlockSpec(memory_space=pl.ANY)] * npools

    kv_dtype = jnp.dtype(plan.kv_dtype_name)

    scratch_shapes = [
        pltpu.VMEM((S, hid), jnp.float32),           # 0 x_resid
        pltpu.VMEM((S, hid), jnp.bfloat16),          # 1 x_norm
        pltpu.VMEM((S, qkv.Np), jnp.float32),        # 2 qkv_out
        pltpu.VMEM((S, HD), jnp.bfloat16),           # 3 attn_out
        pltpu.VMEM((S, hid), jnp.float32),           # 4 acc_mlp
        pltpu.VMEM((S, F), kv_dtype),                # 5 kpay
        pltpu.VMEM((S, F), kv_dtype),                # 6 vpay
        pltpu.VMEM((2 * KH, SQ), jnp.float32),       # 7 kq_rows
        pltpu.VMEM((2 * KH, SQ), jnp.float32),       # 8 vq_rows
        pltpu.VMEM((8, hid), jnp.bfloat16),          # 9 x_last
        pltpu.SemaphoreType.DMA((4, maxPb)),         # 10 page write sems
    ]
    if MOE:
        scratch_shapes.append(pltpu.VMEM((S, EP), jnp.float32))  # 11 gates

    NARG = len(arg_names)

    def kernel(*refs):
        page_row, n_tok = refs[:NSCAL]
        args = {n: refs[NSCAL + i] for i, n in enumerate(arg_names)}
        logits_ref = refs[NSCAL + NARG]
        kpool_o = refs[NSCAL + NARG + 1]
        vpool_o = refs[NSCAL + NARG + 2]
        if kv_quant:
            kqpool_o = refs[NSCAL + NARG + 3]
            vqpool_o = refs[NSCAL + NARG + 4]
        sc = refs[NSCAL + NARG + 1 + npools:]
        if MOE:
            (x_resid, x_norm, qkv_out, attn_out, acc_mlp, kpay, vpay,
             kq_rows, vq_rows, x_last, wsems, gates_st) = sc
        else:
            (x_resid, x_norm, qkv_out, attn_out, acc_mlp, kpay, vpay,
             kq_rows, vq_rows, x_last, wsems) = sc

        t = pl.program_id(0)
        l = layer_of(t)
        s = t - l * S_layer
        in_lm = t >= L * S_layer
        n = n_tok[0]

        def page_write_copies(j, lay):
            """The layer `lay` page-j write-out descriptors (same objects
            for start and wait so semaphore byte counts match)."""
            width = min(ps, S - j * ps)
            phys = page_row[j] + lay
            cps = [
                pltpu.make_async_copy(
                    kpay.at[pl.ds(j * ps, width), :],
                    kpool_o.at[phys, pl.ds(0, width), :], wsems.at[0, j]),
                pltpu.make_async_copy(
                    vpay.at[pl.ds(j * ps, width), :],
                    vpool_o.at[phys, pl.ds(0, width), :], wsems.at[1, j]),
            ]
            if kv_quant:
                if QL == ps:  # compact layout; width is a 128-multiple
                    cps.append(pltpu.make_async_copy(
                        kq_rows.at[:, pl.ds(j * ps, width)],
                        kqpool_o.at[phys, :, pl.ds(0, width)],
                        wsems.at[2, j]))
                    cps.append(pltpu.make_async_copy(
                        vq_rows.at[:, pl.ds(j * ps, width)],
                        vqpool_o.at[phys, :, pl.ds(0, width)],
                        wsems.at[3, j]))
                else:  # page-strided stash -> whole [2*KH, QL] pool row
                    cps.append(pltpu.make_async_copy(
                        kq_rows.at[:, pl.ds(j * QL, QL)],
                        kqpool_o.at[phys], wsems.at[2, j]))
                    cps.append(pltpu.make_async_copy(
                        vq_rows.at[:, pl.ds(j * QL, QL)],
                        vqpool_o.at[phys], wsems.at[3, j]))
            return cps

        @pl.when(t == 0)
        def _init():
            x_resid[:] = args["x0"][:].astype(jnp.float32)

        # ---------------- qkv phase ----------------
        @pl.when(jnp.logical_and(~in_lm, s < plan.base_att))
        def _qkv():
            @pl.when(s == 0)
            def _():
                # wait for the PREVIOUS layer's page write-out before the
                # stashes are overwritten this layer
                @pl.when(l > 0)
                def _():
                    for j in range(maxPb):
                        @pl.when(j * ps < n)
                        def _(j=j):
                            for cp in page_write_copies(j, l - 1):
                                cp.wait()
                x_norm[:] = _rms(x_resid[:], args["norms"][0, 0],
                                 eps).astype(jnp.bfloat16)
            c = s
            w = _wdeq_tile(qkv, args["qkv_w"], args.get("qkv_s"),
                           args.get("qkv_z"))
            y = jax.lax.dot_general(
                x_norm[:], w, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            qkv_out[:, pl.ds(pl.multiple_of(c * qkv.chunk, 128),
                             qkv.chunk)] = y

        # ---------------- attention + KV write-out ----------------
        @pl.when(jnp.logical_and(~in_lm, s == plan.base_att))
        def _att():
            bias = args["qkv_b"][0, 0].astype(jnp.float32)   # [QKVN]
            cos1 = args["cos"][:].astype(jnp.float32)        # [S, D]
            sin1 = args["sin"][:].astype(jnp.float32)
            if plan.qk_norm:
                qkn = args["qk_norms"][0]                    # [2, HD] bf16

            def head_slice(base_col, idx, w_norm=None):
                """bias + optional per-head RMS + rope for one [S, D] head."""
                # NB: bias[a:b][None, :] NOT bias[None, a:b] — the latter
                # traces to a 1-D gather Mosaic can't lower
                v = qkv_out[:, base_col + idx * D:base_col + (idx + 1) * D] \
                    + bias[base_col + idx * D:
                           base_col + (idx + 1) * D][None, :]
                if w_norm is not None:
                    var = jnp.mean(v * v, axis=-1, keepdims=True)
                    v = v * jax.lax.rsqrt(var + eps) * w_norm
                if plan.alibi:
                    return v
                return v * cos1 + _rot_half_heads(v, D) * sin1

            def qz_head(x):
                """Quantize one [S, D] head -> (payload [S, Dsc], scale,
                zero [S])."""
                xmin = jnp.min(x, axis=-1)
                xmax = jnp.max(x, axis=-1)
                if plan.kv_bits == 8:
                    sc_ = jnp.maximum((xmax - xmin) / 255.0, 1e-8)
                    qv = jnp.clip(jnp.round(
                        (x - xmin[:, None]) / sc_[:, None]) - 128.0,
                        -128, 127)
                    zr = xmin + 128.0 * sc_
                    pay = qv.astype(jnp.int32).astype(jnp.int8)
                else:
                    sc_ = jnp.maximum((xmax - xmin) / 15.0, 1e-8)
                    qv = jnp.clip(jnp.round(
                        (x - xmin[:, None]) / sc_[:, None]),
                        0, 15).astype(jnp.int32)
                    zr = xmin
                    pay = (qv[:, :D // 2] | (qv[:, D // 2:] << 4)) \
                        .astype(jnp.uint8)
                return pay, sc_, zr

            row = jax.lax.broadcasted_iota(jnp.int32, (S, S), 0)
            col = jax.lax.broadcasted_iota(jnp.int32, (S, S), 1)
            causal = col <= row
            if plan.alibi:
                # k_pos - q_pos as f32, scaled by baked per-head slopes
                dist = (col - row).astype(jnp.float32)
            G = H // KH
            for h in range(KH):
                wk = qkn[1][h * D:(h + 1) * D][None, :] \
                    .astype(jnp.float32) if plan.qk_norm else None
                kh = head_slice(HD, h, wk)                    # [S, D] roped
                vcol = HD + KH * D + h * D
                vh = qkv_out[:, vcol:vcol + D] + bias[vcol:vcol + D][None, :]
                for g in range(G):
                    hh = h * G + g
                    wq = qkn[0][hh * D:(hh + 1) * D][None, :] \
                        .astype(jnp.float32) if plan.qk_norm else None
                    qh = head_slice(0, hh, wq)
                    sco = jax.lax.dot_general(
                        qh, kh, (((1,), (1,)), ((), ())),
                        preferred_element_type=jnp.float32) * scale_att
                    if plan.alibi:
                        sco = sco + slope_const[hh] * dist
                    sco = jnp.where(causal, sco, _NEG_INF)
                    m = jnp.max(sco, axis=-1, keepdims=True)
                    p = jnp.exp(sco - m)
                    p = p / jnp.sum(p, axis=-1, keepdims=True)
                    ov = jnp.dot(p.astype(jnp.bfloat16),
                                 vh.astype(jnp.bfloat16),
                                 preferred_element_type=jnp.float32)
                    attn_out[:, hh * D:(hh + 1) * D] = \
                        ov.astype(jnp.bfloat16)

                # quantize + stash this kv head, column block h of the pools
                if kv_quant:
                    kp, ks, kz = qz_head(kh)
                    vp, vs, vz = qz_head(vh)
                    kpay[:, h * Dsc:(h + 1) * Dsc] = kp
                    vpay[:, h * Dsc:(h + 1) * Dsc] = vp
                    kq_rows[2 * h:2 * h + 1, :] = _restripe_qrow(ks, ps, QL)
                    kq_rows[2 * h + 1:2 * h + 2, :] = \
                        _restripe_qrow(kz, ps, QL)
                    vq_rows[2 * h:2 * h + 1, :] = _restripe_qrow(vs, ps, QL)
                    vq_rows[2 * h + 1:2 * h + 2, :] = \
                        _restripe_qrow(vz, ps, QL)
                else:
                    kpay[:, h * Dsc:(h + 1) * Dsc] = kh.astype(kv_dtype)
                    vpay[:, h * Dsc:(h + 1) * Dsc] = vh.astype(kv_dtype)

            for j in range(maxPb):
                @pl.when(j * ps < n)
                def _(j=j):
                    for cp in page_write_copies(j, l):
                        cp.start()

        # ---------------- o phase ----------------
        @pl.when(jnp.logical_and(
            ~in_lm, jnp.logical_and(s >= plan.base_o, s < plan.base_mlp)))
        def _o():
            c = s - plan.base_o
            w = _wdeq_tile(o_sp, args["o_w"], args.get("o_s"),
                           args.get("o_z"))
            y = jax.lax.dot_general(
                attn_out[:], w, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            cur = x_resid[:, pl.ds(pl.multiple_of(c * o_sp.chunk, 128),
                                   o_sp.chunk)]
            x_resid[:, pl.ds(pl.multiple_of(c * o_sp.chunk, 128),
                             o_sp.chunk)] = cur + y

        def interleave_chunk(g_sp, u_sp, d_sp, pre):
            """One interleaved gate/up/down chunk -> [S, hid] partial."""
            wg = _wdeq_tile(g_sp, args[pre + "g_w"], args.get(pre + "g_s"),
                            args.get(pre + "g_z"))
            wu = _wdeq_tile(u_sp, args[pre + "u_w"], args.get(pre + "u_s"),
                            args.get(pre + "u_z"))
            wd = _wdeq_tile(d_sp, args[pre + "d_w"], args.get(pre + "d_s"),
                            args.get(pre + "d_z"))
            g_ = jax.lax.dot_general(
                x_norm[:], wg, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            u_ = jax.lax.dot_general(
                x_norm[:], wu, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            act = (g_ * jax.lax.logistic(g_) * u_).astype(jnp.bfloat16)
            return jax.lax.dot_general(
                act, wd, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)

        if MOE:
            # ------------- router phase (softmax top-k gates) -------------
            lane_ep = jax.lax.broadcasted_iota(jnp.int32, (S, EP), 1)

            @pl.when(jnp.logical_and(~in_lm, s == plan.base_router))
            def _router():
                x_norm[:] = _rms(x_resid[:], args["norms"][0, 1],
                                 eps).astype(jnp.bfloat16)
                acc_mlp[:] = jnp.zeros_like(acc_mlp)
                rw = args["router_w"][0]                  # [hid, EP] bf16
                logits = jax.lax.dot_general(
                    x_norm[:], rw, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)   # [S, EP]
                ml = jnp.where(lane_ep < E, logits, _NEG_INF)
                m = jnp.max(ml, axis=-1, keepdims=True)
                p = jnp.exp(ml - m)
                p = p / jnp.sum(p, axis=-1, keepdims=True)
                gates = jnp.zeros((S, EP), jnp.float32)
                pw = p
                for _ in range(plan.k_top):
                    mi = jnp.max(pw, axis=-1, keepdims=True)
                    fl = jnp.min(jnp.where(pw >= mi, lane_ep, EP),
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
                        sgv = jax.lax.logistic(sval)
                    else:
                        sgv = jnp.ones((S, 1), jnp.float32)
                    gates = jnp.where(lane_ep == E, sgv, gates)
                gates_st[:] = gates

            # ------------- per-expert interleaved chunks -------------
            in_exp = jnp.logical_and(s >= plan.base_exp,
                                     s < plan.base_shared)

            @pl.when(jnp.logical_and(~in_lm, in_exp))
            def _emlp():
                c_all = jnp.clip(s - plan.base_exp, 0, E * pg.S - 1)
                e_idx = c_all // pg.S
                y = interleave_chunk(pg, pu, pd, "p")
                # per-token gate of THIS expert (0 for unrouted tokens)
                ge = jnp.sum(
                    jnp.where(lane_ep == e_idx, gates_st[:], 0.0),
                    axis=-1, keepdims=True)               # [S, 1]
                acc_mlp[:] = acc_mlp[:] + ge * y[:, :hid]
                if not plan.has_shared:
                    @pl.when(c_all == E * pg.S - 1)
                    def _():
                        x_resid[:] = x_resid[:] + acc_mlp[:]

            # ------------- shared expert (CalcExpert) -------------
            if plan.has_shared:
                psg_, psu_, psd_ = plan.psg, plan.psu, plan.psd

                @pl.when(jnp.logical_and(~in_lm, s >= plan.base_shared))
                def _smlp():
                    c = s - plan.base_shared
                    y = interleave_chunk(psg_, psu_, psd_, "s")
                    sgv = jnp.sum(
                        jnp.where(lane_ep == E, gates_st[:], 0.0),
                        axis=-1, keepdims=True)
                    acc_mlp[:] = acc_mlp[:] + sgv * y[:, :hid]

                    @pl.when(c == psg_.S - 1)
                    def _():
                        x_resid[:] = x_resid[:] + acc_mlp[:]
        else:
            # ---------------- interleaved mlp phase ----------------
            @pl.when(jnp.logical_and(~in_lm, s >= plan.base_mlp))
            def _mlp():
                c = s - plan.base_mlp

                @pl.when(c == 0)
                def _():
                    x_norm[:] = _rms(x_resid[:], args["norms"][0, 1],
                                     eps).astype(jnp.bfloat16)
                    acc_mlp[:] = jnp.zeros_like(acc_mlp)

                y = interleave_chunk(pg, pu, pd, "p")
                acc_mlp[:] = acc_mlp[:] + y[:, :hid]

                @pl.when(c == pg.S - 1)
                def _():
                    x_resid[:] = x_resid[:] + acc_mlp[:]

        # ---------------- lm phase (last valid token only) ----------------
        @pl.when(in_lm)
        def _lm():
            c = t - L * S_layer

            @pl.when(c == 0)
            def _first():
                # gather the last valid token's hidden into row 0 (padded
                # to 8 sublanes); normed with the final norm
                ridx = jax.lax.broadcasted_iota(jnp.int32, (S, hid), 0)
                sel = ridx == (n - 1)
                last = jnp.sum(jnp.where(sel, x_resid[:], 0.0), axis=0,
                               keepdims=True)                    # [1, hid]
                lastn = _rms(last, args["final_norm"][0], eps)
                x_last[:] = jnp.broadcast_to(
                    lastn.astype(jnp.bfloat16), (8, hid))
                # final wait for the last layer's page writes
                for j in range(maxPb):
                    @pl.when(j * ps < n)
                    def _(j=j):
                        for cp in page_write_copies(j, L - 1):
                            cp.wait()

            w = _wdeq_tile(lm, args["lm_w"], args.get("lm_s"),
                           args.get("lm_z"))
            logits_ref[:] = jax.lax.dot_general(
                x_last[:], w, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=NSCAL,
        grid=(T_total,),
        in_specs=in_specs,
        out_specs=out_specs,
        scratch_shapes=scratch_shapes,
    )

    out_shape = [jax.ShapeDtypeStruct((8, plan.Vp), jnp.float32)]

    def fn(packed: Dict, x0, cos, sin, page_row, n_tokens,
           k, v, kq=None, vq=None):
        pools = [k, v] + ([kq, vq] if kv_quant else [])
        shapes = out_shape + [
            jax.ShapeDtypeStruct(p.shape, p.dtype) for p in pools]
        pool0 = NSCAL + NARG - npools
        aliases = {pool0 + i: 1 + i for i in range(npools)}
        tensors = [x0, cos, sin]
        for sp, _ in stream_defs:
            tensors.append(packed[sp.name + "_w"])
            if sp.bits != 16:
                tensors.append(packed[sp.name + "_s"])
                tensors.append(packed[sp.name + "_z"])
        if MOE:
            tensors.append(packed["router_w"])
        tensors += [packed["norms"], packed["qkv_b"], packed["final_norm"]]
        if plan.qk_norm:
            tensors.append(packed["qk_norms"])
        tensors += pools
        outs = pl.pallas_call(
            kernel,
            grid_spec=grid_spec,
            out_shape=shapes,
            input_output_aliases=aliases,
            interpret=interpret,
            compiler_params=None if interpret else pltpu.CompilerParams(
                has_side_effects=True,
                vmem_limit_bytes=110 * 1024 * 1024),
        )(page_row.astype(jnp.int32), n_tokens.astype(jnp.int32)[None],
          *tensors)
        return (outs[0],) + tuple(outs[1:])

    return fn
