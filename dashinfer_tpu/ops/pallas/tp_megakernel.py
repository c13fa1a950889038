"""Tensor-parallel decode megakernel: per-layer Pallas segments + psum.

The whole-model decode megakernel (megakernel.py) fuses the residual adds
between layers inside one kernel, which is incompatible with tensor
parallelism: after the o-projection and after the down-projection the
partial products of all shards must be summed before the next RMSNorm.
This module splits the model step into per-layer SEGMENT kernels that end
exactly at those two reduction points:

  for each layer l:
    seg_attn:  rms1 -> qkv chunks (col-split) -> paged attention over the
               LOCAL kv heads (KV pool head-sharded) + per-layer new-token
               RMW write -> o chunks (row-split)      => o partial [B, hid]
    x += psum(o_partial)                              <- ICI all-reduce
    seg_mlp:   rms2 -> gate/up chunks (col-split) -> swiglu -> down chunks
               (row-split)                            => dn partial [B, hid]
    x += psum(dn_partial)
  seg_lm:      final rms -> lm chunks over the LOCAL vocab shard
                                                      => logits [B, Vp/n]

Each shard streams 1/n of the weight bytes, so the per-step floor scales
~1/n (the single-chip kernel is already at its weight-streaming floor).
XLA overlaps the psums with the next segment's first weight DMAs.

Weight sharding follows the reference's load-time WeightSplitter
(weight_splitter.cpp:10-608): VSPLIT on q/k/v/gate/up out-dims, HSPLIT on
o/down in-dims (the all-reduce "falls out" after the row-split contraction,
here made explicit as the segment boundary), vocab split on lm_head. The
split happens on the RAW params per rank (split_params_tp), then each
rank's streams are packed with the regular pack_params on a LOCAL config —
stream geometry, chunking, and the in-kernel dequant math are reused
unchanged.

Scope (supports_tp): dense RoPE/ALiBi archs (incl. Qwen3 QK-norm) and MoE
(experts split over ranks = reference EPSPLIT, with the router replicated
so every rank computes the same global top-k gates, and the shared expert
split by its intermediate dim); kv quant int8/uint4/none; weights 16-bit /
a16w8 / a16w4. Requires heads, kv heads, intermediate, vocab (and expert
count / shared-inter for MoE) divisible by the shard count.
"""

import dataclasses
import math
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from jax.sharding import Mesh, PartitionSpec as P

from dashinfer_tpu.config import CacheMode, ModelConfig, RuntimeConfig
from dashinfer_tpu.ops.pallas import megakernel as mk
from dashinfer_tpu.ops.pallas.megakernel import (
    MegaPlan, _NEG_INF, _RING, _RMW_W, _rms, _rot_half_heads,
    _round_up, _stream_dot)
from dashinfer_tpu.parallel.mesh import MODEL_AXIS


# ---------------------------------------------------------------------------
# per-rank raw-param splitting (reference WeightSplitter semantics)
# ---------------------------------------------------------------------------

_COL_SPLIT = ("q_proj", "k_proj", "v_proj", "gate_proj", "up_proj")
_ROW_SPLIT = ("o_proj", "down_proj")


def _slice_u4_cols(w_q: np.ndarray, n: int, r: int) -> np.ndarray:
    """Column-slice a tile-128-packed u4 weight [..., K, N/2] to rank r's
    share of the UNPACKED out dim."""
    from dashinfer_tpu.ops.u4pack import (pack_u4_weight,
                                          unpack_u4_weight_np_like,
                                          weight_uses_tile128)
    N = w_q.shape[-1] * 2
    Nl = N // n
    if weight_uses_tile128(N) and Nl % 256 == 0:
        h = Nl // 2   # tile-aligned: packed cols slice directly
        return w_q[..., r * h:(r + 1) * h]
    lead = w_q.shape[:-2]
    K = w_q.shape[-2]
    flat = w_q.reshape((-1, w_q.shape[-1]))
    un = unpack_u4_weight_np_like(np.ascontiguousarray(flat), np)
    un = un.reshape(lead + (K, N))[..., r * Nl:(r + 1) * Nl]
    out = np.stack([pack_u4_weight(m) for m in
                    un.reshape((-1, K, Nl))])
    return out.reshape(lead + (K, Nl // 2))


def _split_leaf(name: str, leaf, n: int, r: int):
    """One layers/ leaf -> rank r's slice. Stacked [L, ...] arrays."""
    col = any(k in name for k in _COL_SPLIT)
    row = any(k in name for k in _ROW_SPLIT)
    if not (col or row):
        return leaf                         # norms etc: replicate
    if not isinstance(leaf, dict):          # plain [L, K, N]
        a = np.asarray(leaf)
        if col:
            N = a.shape[-1]
            return a[..., r * N // n:(r + 1) * N // n]
        K = a.shape[-2]
        return a[..., r * K // n:(r + 1) * K // n, :]
    out = {}
    for k, v in leaf.items():
        a = np.asarray(v)
        if k == "b":
            if col:
                N = a.shape[-1]
                out[k] = a[..., r * N // n:(r + 1) * N // n]
            else:
                # row-split bias: added once on rank 0 (reference zeroes
                # bias on rank>0, weight_splitter.cpp:425)
                out[k] = a if r == 0 else np.zeros_like(a)
        elif k == "w" or k == "w_q8":
            if col:
                N = a.shape[-1]
                out[k] = a[..., r * N // n:(r + 1) * N // n]
            else:
                K = a.shape[-2]
                out[k] = a[..., r * K // n:(r + 1) * K // n, :]
        elif k == "w_q":
            if col:
                if a.dtype == np.uint8:    # packed u4
                    out[k] = _slice_u4_cols(a, n, r)
                else:                      # int8 [L, K, N]
                    N = a.shape[-1]
                    out[k] = a[..., r * N // n:(r + 1) * N // n]
            else:
                K = a.shape[-2]
                out[k] = a[..., r * K // n:(r + 1) * K // n, :]
        elif k in ("scale", "zero"):
            if col:                        # [L, G, N] on out dim
                N = a.shape[-1]
                out[k] = a[..., r * N // n:(r + 1) * N // n]
            elif a.shape[-2] == 1:
                # per-channel: one K-group; scale is per out channel and
                # identical for every rank's K rows
                out[k] = a
            else:                          # groups follow the K rows
                G = a.shape[-2]
                out[k] = a[..., r * G // n:(r + 1) * G // n, :]
        else:
            out[k] = a
    return out


def _slice_experts(leaf, n: int, r: int):
    """Expert stack [L, E, ...] (or quantized dict) -> rank r's expert
    group (reference EPSPLIT, weight_splitter.cpp:856-959)."""
    def sl(a):
        a = np.asarray(a)
        E = a.shape[1]
        return a[:, r * E // n:(r + 1) * E // n]
    if isinstance(leaf, dict):
        return {k: sl(v) for k, v in leaf.items()}
    return sl(leaf)


def _split_rank(params: Dict, cfg: ModelConfig, n: int, r: int) -> Dict:
    """Rank r's slice of the raw params (reference split semantics)."""
    V = cfg.vocab_size
    lp = {}
    for k, v in params["layers"].items():
        if k == "experts":
            lp[k] = {nm: _slice_experts(lf, n, r)
                     for nm, lf in v.items()}
        elif k == "shared_expert":
            # shared expert splits like the dense mlp (col gate/up,
            # row down)
            lp[k] = {nm: _split_leaf(nm, lf, n, r)
                     for nm, lf in v.items()}
        elif k == "router":
            # sliced only so the LOCAL pack has consistent shapes;
            # make_tp_plan overrides the packed router with the GLOBAL
            # one (gates must be computed over all experts)
            a = np.asarray(v["w"])
            E = a.shape[-1]
            lp[k] = {"w": a[..., r * E // n:(r + 1) * E // n]}
        elif k == "shared_expert_gate":
            lp[k] = v                  # replicated (global gates)
        else:
            lp[k] = _split_leaf(k, v, n, r)
    lm = params.get("lm_head")
    if lm is None or cfg.tie_word_embeddings:
        lm = {"w": np.asarray(params["embed_tokens"]["w"]).T}
    lm_r = {}
    for k, v in lm.items():
        a = np.asarray(v)
        if k == "w_q" and a.dtype == np.uint8:
            lm_r[k] = _slice_u4_cols(a[None], n, r)[0]
        else:   # w / w_q int8 [hid, V]; scale/zero [G, V]
            lm_r[k] = a[..., r * V // n:(r + 1) * V // n]
    p = {"embed_tokens": params["embed_tokens"],
         "norm": params["norm"], "lm_head": lm_r, "layers": lp}
    if "embed_norm" in params:
        p["embed_norm"] = params["embed_norm"]
    return p


def split_params_tp(params: Dict, cfg: ModelConfig, n: int) -> List[Dict]:
    """Raw params -> n per-rank pytrees (numpy), reference split semantics."""
    return [_split_rank(params, cfg, n, r) for r in range(n)]


def local_config(cfg: ModelConfig, n: int) -> ModelConfig:
    moe = cfg.moe
    if moe is not None:
        moe = dataclasses.replace(
            moe, num_experts=moe.num_experts // n,
            shared_expert_intermediate_size=(
                moe.shared_expert_intermediate_size // n))
    return dataclasses.replace(
        cfg, num_heads=cfg.num_heads // n,
        num_kv_heads=cfg.num_kv_heads // n,
        intermediate_size=cfg.intermediate_size // n,
        vocab_size=cfg.vocab_size // n,
        tie_word_embeddings=False, moe=moe)


def supports_tp(cfg: ModelConfig, rt: RuntimeConfig, params: Dict,
                n: int) -> bool:
    if n < 2:
        return False
    if cfg.position_embedding.value not in ("rope", "alibi"):
        return False
    if (cfg.num_heads % n or cfg.num_kv_heads % n or
            cfg.intermediate_size % n or cfg.vocab_size % n):
        return False
    # per-rank widths must stay 128-lane-aligned: the MLP segment slices
    # gu_out at the LOCAL intermediate width (Mosaic lane-tiling)
    if cfg.moe is None and (cfg.intermediate_size // n) % 128:
        return False
    moe = cfg.moe
    if moe is not None:
        # experts split over ranks (EPSPLIT); shared expert splits by inter
        if moe.num_experts % n:
            return False
        sh = moe.shared_expert_intermediate_size
        if sh and (sh % n or (sh // n) % 128):
            return False
    view = mk.weight_only_decode_view(params)
    if view is None:
        return False
    # group sizes must tile the per-rank row splits
    lp = view["layers"]
    row_leaves = ["o_proj"]
    if moe is None:
        row_leaves.append("down_proj")
    elif "shared_expert" in lp:
        pass  # shared down checked below
    for name in row_leaves:
        leaf = lp[name]
        if isinstance(leaf, dict) and "scale" in leaf:
            G = leaf["scale"].shape[1]
            if G != 1 and G % n:   # per-channel (G==1) replicates
                return False
    if moe is not None and "shared_expert" in lp:
        dnl = lp["shared_expert"]["down_proj"]
        if isinstance(dnl, dict) and "scale" in dnl:
            G = dnl["scale"].shape[1]
            if G != 1 and G % n:
                return False
    cfg_l = local_config(cfg, n)
    return mk.supports(cfg_l, rt, _split_rank(view, cfg, n, 0))


def make_tp_plan(cfg: ModelConfig, rt: RuntimeConfig, params: Dict,
                 n: int, target_chunk_bytes: Optional[int] = None):
    """(local MegaPlan, packed pytree with leading [n] rank dim)."""
    view = mk.weight_only_decode_view(params)
    parts = split_params_tp(view, cfg, n)
    cfg_l = local_config(cfg, n)
    kw = {}
    if target_chunk_bytes is not None:
        kw["target_chunk_bytes"] = target_chunk_bytes
    plan = mk.make_plan(cfg_l, rt, parts[0], **kw)
    packed_r = [mk.pack_params(cfg_l, plan, p) for p in parts]
    if cfg.moe is not None:
        # gates are computed over the GLOBAL expert set on every rank;
        # replace the local router pack with the full router (+ shared gate
        # col at lane E_global), padded to the global EP lane count
        E_g = cfg.moe.num_experts
        has_sg = "shared_expert_gate" in view["layers"]
        # the shared-gate LANE at E_g is used whenever a shared expert
        # exists (gate value defaults to 1.0 without the gate weights)
        has_sh = "shared_expert" in view["layers"]
        EP_g = max(128, _round_up(E_g + (1 if has_sh else 0), 128))
        L = cfg.num_layers
        rw = np.zeros((L, cfg.hidden_size, EP_g), np.float32)
        lp_full = view["layers"]
        for l in range(L):
            rw[l, :, :E_g] = np.asarray(lp_full["router"]["w"][l],
                                        np.float32)
            if has_sg:
                rw[l, :, E_g:E_g + 1] = np.asarray(
                    lp_full["shared_expert_gate"]["w"][l], np.float32)
        rw_j = jnp.asarray(rw.astype(jnp.bfloat16))
        for r in range(n):
            packed_r[r]["router_w"] = rw_j
    if plan.alibi:
        # pack_params derives slopes from the LOCAL head count; replace
        # with each rank's slice of the GLOBAL slope table
        from dashinfer_tpu.models.transformer import alibi_slopes
        sl = np.asarray(alibi_slopes(cfg.num_heads), np.float32) \
            .reshape(cfg.num_kv_heads, cfg.num_heads // cfg.num_kv_heads)
        KHl = plan.KH
        for r in range(n):
            slp = np.zeros((KHl, plan.G8), np.float32)
            slp[:, :plan.G] = sl[r * KHl:(r + 1) * KHl]
            packed_r[r]["slopes"] = jnp.asarray(slp)
    packed = jax.tree.map(lambda *xs: jnp.stack(
        [np.asarray(x) for x in xs]), *packed_r)
    return plan, packed


# ---------------------------------------------------------------------------
# segment kernels
# ---------------------------------------------------------------------------

def _payload_spec(sp, idx):
    rows = sp.Kp if sp.chunk_axis == "n" else sp.chunk
    return pl.BlockSpec((1, 1, rows, sp.store_cols), idx)


def _qparam_spec(sp, idx):
    gs = sp.gs if sp.gs else (sp.Kp if sp.chunk_axis == "n" else sp.chunk)
    if sp.chunk_axis == "n":
        g = max(sp.Kp // gs, 1)
        cols = sp.chunk
    else:
        g = max(sp.chunk // gs, 1)
        cols = sp.Np
    return pl.BlockSpec((1, 1, g, cols), idx)


def _append_stream(in_specs, arg_names, sp, idx):
    in_specs.append(_payload_spec(sp, idx))
    arg_names.append(sp.name + "_w")
    if sp.bits != 16:
        in_specs.append(_qparam_spec(sp, idx))
        arg_names.append(sp.name + "_s")
        in_specs.append(_qparam_spec(sp, idx))
        arg_names.append(sp.name + "_z")


def build_attn_segment(plan: MegaPlan, interpret: Optional[bool] = None):
    """One layer's attention segment on this shard.

    fn(l, x [B,hid] f32, cosq, sinq, cosk, sink, pt, lens, active, tgt_page,
       sched_b, sched_p, n_sched, packed, *pools)
       -> (o_partial [B, hid] f32, *pools)
    """
    B, L, hid = plan.B, plan.L, plan.hid
    H, KH, D, G, G8 = plan.H, plan.KH, plan.D, plan.G, plan.G8
    HD = H * D
    ps = plan.ps
    # qparam pool rows are [2*KH, QL], QL = round_up(ps, 128) (see
    # runtime/kv_cache.py — Mosaic lane-tile alignment for DMAs)
    QL = -(-ps // 128) * 128
    kv_quant = plan.kv_mode != CacheMode.DEFAULT
    Dsc = plan.kv_store_dim
    F = KH * Dsc
    qkv, o_sp = plan.qkv, plan.o
    eps = plan.rms_eps
    scale_att = 1.0 / math.sqrt(D)
    kv_dtype = jnp.dtype(plan.kv_dtype_name)
    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    T = qkv.S + 1 + o_sp.S
    ATT = qkv.S
    NSCAL = 8  # l, pt, lens, active, tgt_page, sched_b, sched_p, n_sched

    def stream_idx(base, count):
        def idx(t, lref, *_):
            return (lref[0], jnp.clip(t - base, 0, count - 1), 0, 0)
        return idx

    def norm_idx(t, lref, *_):
        return (lref[0], 0, 0)

    in_specs = [
        pl.BlockSpec((B, hid), lambda *_: (0, 0)),           # x
        pl.BlockSpec((B, HD), lambda *_: (0, 0)),            # cosq
        pl.BlockSpec((B, HD), lambda *_: (0, 0)),            # sinq
        pl.BlockSpec((B, KH * D), lambda *_: (0, 0)),        # cosk
        pl.BlockSpec((B, KH * D), lambda *_: (0, 0)),        # sink
    ]
    arg_names = ["x", "cosq", "sinq", "cosk", "sink"]
    _append_stream(in_specs, arg_names, qkv, stream_idx(0, qkv.S))
    _append_stream(in_specs, arg_names, o_sp, stream_idx(ATT + 1, o_sp.S))
    in_specs.append(pl.BlockSpec((1, 2, hid), norm_idx))
    arg_names.append("norms")
    in_specs.append(pl.BlockSpec((1, 1, plan.QKVN), norm_idx))
    arg_names.append("qkv_b")
    if plan.qk_norm:
        in_specs.append(pl.BlockSpec((1, 2, HD), norm_idx))
        arg_names.append("qk_norms")
    if plan.alibi:
        in_specs.append(pl.BlockSpec((KH, G8), lambda *_: (0, 0)))
        arg_names.append("slopes")
    npools = 4 if kv_quant else 2
    for _ in range(npools):
        in_specs.append(pl.BlockSpec(memory_space=pl.ANY))
    arg_names += ["k", "v", "kq", "vq"][:npools]

    out_specs = [pl.BlockSpec((B, hid), lambda *_: (0, 0))] + \
        [pl.BlockSpec(memory_space=pl.ANY)] * npools

    scratch_shapes = [
        pltpu.VMEM((B, hid), jnp.bfloat16),            # x_norm
        pltpu.VMEM((B, qkv.Np), jnp.float32),          # qkv_out
        pltpu.VMEM((B, KH, G8, D), jnp.bfloat16),      # q4
        pltpu.VMEM((B, HD), jnp.bfloat16),             # attn_out
        pltpu.VMEM((B, KH, G8, 2), jnp.float32),       # ml_st
        pltpu.VMEM((B, KH, G8, D), jnp.float32),       # acc_at
        pltpu.VMEM((_RING, ps, F), kv_dtype),          # kbuf
        pltpu.VMEM((_RING, ps, F), kv_dtype),          # vbuf
        pltpu.VMEM((_RING, 2 * KH, QL), jnp.float32),  # kqbuf
        pltpu.VMEM((_RING, 2 * KH, QL), jnp.float32),  # vqbuf
        pltpu.VMEM((B, _RMW_W, F), kv_dtype),          # rmw_k
        pltpu.VMEM((B, _RMW_W, F), kv_dtype),          # rmw_v
        pltpu.VMEM((B, 2 * KH, QL), jnp.float32),      # rmw_kq
        pltpu.VMEM((B, 2 * KH, QL), jnp.float32),      # rmw_vq
        pltpu.SemaphoreType.DMA((4, _RING)),           # page sems
        pltpu.SemaphoreType.DMA((4, B)),               # rmw sems
    ]

    NARG = len(arg_names)

    def kernel(*refs):
        l_arr, pt, lens, active, tgt_page, sched_b, sched_p, n_sched = \
            refs[:NSCAL]
        args = {n: refs[NSCAL + i] for i, n in enumerate(arg_names)}
        o_out = refs[NSCAL + NARG]
        kpool_o = refs[NSCAL + NARG + 1]
        vpool_o = refs[NSCAL + NARG + 2]
        if kv_quant:
            kqpool_o = refs[NSCAL + NARG + 3]
            vqpool_o = refs[NSCAL + NARG + 4]
        (x_norm, qkv_out, q4, attn_out, ml_st, acc_at,
         kbuf, vbuf, kqbuf, vqbuf, rmw_k, rmw_v, rmw_kq, rmw_vq,
         page_sems, rmw_sems) = refs[NSCAL + NARG + 1 + npools:]

        t = pl.program_id(0)
        l = l_arr[0]

        # ---------------- qkv phase ----------------
        @pl.when(t < ATT)
        def _qkv():
            @pl.when(t == 0)
            def _():
                x_norm[:] = _rms(args["x"][:], args["norms"][0, 0],
                                 eps).astype(jnp.bfloat16)
            c = t
            y = _stream_dot(plan, qkv, x_norm[:], args["qkv_w"],
                            args.get("qkv_s"), args.get("qkv_z"), c)
            qkv_out[:, pl.ds(pl.multiple_of(c * qkv.chunk, 128),
                             qkv.chunk)] = y

        # ---------------- attention ----------------
        @pl.when(t == ATT)
        def _att():
            qkvb = qkv_out[:, :plan.QKVN] + \
                args["qkv_b"][0, 0][None, :].astype(jnp.float32)
            qr = qkvb[:, :HD]
            kr = qkvb[:, HD:HD + KH * D]
            vr = qkvb[:, HD + KH * D:HD + 2 * KH * D]
            if plan.qk_norm:
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
                q_rot, k_rot = qr, kr
            else:
                cq = args["cosq"][:].astype(jnp.float32)
                sq = args["sinq"][:].astype(jnp.float32)
                ck = args["cosk"][:].astype(jnp.float32)
                sk = args["sink"][:].astype(jnp.float32)
                q_rot = qr * cq + _rot_half_heads(qr, D) * sq
                k_rot = kr * ck + _rot_half_heads(kr, D) * sk

            k3 = k_rot.reshape(B, KH, D)
            v3 = vr.reshape(B, KH, D)
            if kv_quant:
                def qz(x):
                    xmin = jnp.min(x, axis=-1)
                    xmax = jnp.max(x, axis=-1)
                    if plan.kv_bits == 8:
                        sc_ = jnp.maximum((xmax - xmin) / 255.0, 1e-8)
                        qv = jnp.clip(jnp.round(
                            (x - xmin[..., None]) / sc_[..., None]) - 128.0,
                            -128, 127)
                        zr = xmin + 128.0 * sc_
                        pay = qv.astype(jnp.int32).astype(jnp.int8)
                    else:
                        sc_ = jnp.maximum((xmax - xmin) / 15.0, 1e-8)
                        qv = jnp.clip(jnp.round(
                            (x - xmin[..., None]) / sc_[..., None]),
                            0, 15).astype(jnp.int32)
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

            # start the RMW reads for the per-layer new-token write
            def row_of(b):
                return tgt_page[b] * L + l

            def w0_of(b):
                off = lens[b] % ps
                return pl.multiple_of((off // _RMW_W) * _RMW_W, _RMW_W), off

            for b in range(B):
                @pl.when(active[b] > 0)
                def _(b=b):
                    w0, _off = w0_of(b)
                    pltpu.make_async_copy(
                        args["k"].at[row_of(b), pl.ds(w0, _RMW_W), :],
                        rmw_k.at[b], rmw_sems.at[0, b]).start()
                    pltpu.make_async_copy(
                        args["v"].at[row_of(b), pl.ds(w0, _RMW_W), :],
                        rmw_v.at[b], rmw_sems.at[1, b]).start()
                    if kv_quant:
                        pltpu.make_async_copy(
                            args["kq"].at[row_of(b)], rmw_kq.at[b],
                            rmw_sems.at[2, b]).start()
                        pltpu.make_async_copy(
                            args["vq"].at[row_of(b)], rmw_vq.at[b],
                            rmw_sems.at[3, b]).start()

            # q into padded [B, KH, G8, D]
            if G8 != G:
                q4[:] = jnp.zeros_like(q4)
            qre = q_rot.astype(jnp.bfloat16).reshape(B, H, D)
            for h in range(KH):
                q4[:, h, :G, :] = qre[:, h * G:(h + 1) * G, :]

            ml_st[:] = jnp.concatenate(
                [jnp.full((B, KH, G8, 1), _NEG_INF, jnp.float32),
                 jnp.zeros((B, KH, G8, 1), jnp.float32)], axis=-1)
            acc_at[:] = jnp.zeros_like(acc_at)

            # ---- page loop: ring DMA + online softmax ----
            n = n_sched[0]

            def page_copies(i):
                slot = jax.lax.rem(i, _RING)
                bb = sched_b[i]
                g = pt[bb, sched_p[i]]
                phys = g * L + l
                cps = [
                    pltpu.make_async_copy(args["k"].at[phys], kbuf.at[slot],
                                          page_sems.at[0, slot]),
                    pltpu.make_async_copy(args["v"].at[phys], vbuf.at[slot],
                                          page_sems.at[1, slot]),
                ]
                if kv_quant:
                    cps.append(pltpu.make_async_copy(
                        args["kq"].at[phys], kqbuf.at[slot],
                        page_sems.at[2, slot]))
                    cps.append(pltpu.make_async_copy(
                        args["vq"].at[phys], vqbuf.at[slot],
                        page_sems.at[3, slot]))
                return cps

            def start(i):
                for cp in page_copies(i):
                    cp.start()

            for i in range(_RING):
                @pl.when(i < n)
                def _(i=i):
                    start(jnp.int32(i))

            def page_body(i, _):
                slot = jax.lax.rem(i, _RING)
                bb = sched_b[i]
                base_tok = sched_p[i] * ps
                for cp in page_copies(i):
                    cp.wait()

                tok = base_tok + jax.lax.broadcasted_iota(
                    jnp.int32, (1, ps), 1)
                tmask = tok < lens[bb]

                for h in range(KH):
                    qh = q4[bb, h].astype(jnp.float32)

                    def dot_nt(a, bm):
                        return jax.lax.dot_general(
                            a, bm, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32)

                    if plan.kv_bits == 16:
                        kk = kbuf[slot][:, h * D:(h + 1) * D] \
                            .astype(jnp.float32)
                        sco = dot_nt(qh, kk)
                    elif plan.kv_bits == 8:
                        kk = kbuf[slot][:, h * D:(h + 1) * D] \
                            .astype(jnp.float32)
                        sraw = dot_nt(qh, kk)
                        kscal = kqbuf[slot][2 * h][:ps]
                        kzero = kqbuf[slot][2 * h + 1][:ps]
                        qs = jnp.sum(qh, axis=1, keepdims=True)
                        sco = sraw * kscal[None, :] + qs * kzero[None, :]
                    else:
                        D2 = D // 2
                        p32 = kbuf[slot][:, h * D2:(h + 1) * D2] \
                            .astype(jnp.int32)
                        klo = (p32 & 0xF).astype(jnp.float32)
                        khi = (p32 >> 4).astype(jnp.float32)
                        sraw = dot_nt(qh[:, :D2], klo) + \
                            dot_nt(qh[:, D2:], khi)
                        kscal = kqbuf[slot][2 * h][:ps]
                        kzero = kqbuf[slot][2 * h + 1][:ps]
                        qs = jnp.sum(qh, axis=1, keepdims=True)
                        sco = sraw * kscal[None, :] + qs * kzero[None, :]

                    sco = sco * scale_att
                    if plan.alibi:
                        # slope_h * (k_pos - q_pos); q_pos = lens[bb]
                        slp = args["slopes"][h, :]
                        dist = (tok - lens[bb]).astype(jnp.float32)
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
                        vv = vbuf[slot][:, h * D:(h + 1) * D] \
                            .astype(jnp.float32)
                        pv = jnp.dot(pexp, vv,
                                     preferred_element_type=jnp.float32)
                    else:
                        vscal = vqbuf[slot][2 * h][:ps]
                        vzero = vqbuf[slot][2 * h + 1][:ps]
                        pexp_s = pexp * vscal[None, :]
                        zterm = jnp.dot(pexp, vzero[:, None],
                                        preferred_element_type=jnp.float32)
                        if plan.kv_bits == 8:
                            vv = vbuf[slot][:, h * D:(h + 1) * D] \
                                .astype(jnp.float32)
                            pv = jnp.dot(pexp_s, vv,
                                         preferred_element_type=jnp.float32) \
                                + zterm
                        else:
                            D2 = D // 2
                            p32 = vbuf[slot][:, h * D2:(h + 1) * D2] \
                                .astype(jnp.int32)
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

                nxt = i + _RING
                @pl.when(nxt < n)
                def _():
                    start(nxt)
                return ()

            jax.lax.fori_loop(0, n, page_body, ())

            # ---- new-token column (from VMEM) ----
            k3f = k3.astype(jnp.float32)
            v3f = v3.astype(jnp.float32)
            q4f = q4[:].astype(jnp.float32)
            sco = jnp.sum(q4f * k3f[:, :, None, :], axis=-1,
                          keepdims=True) * scale_att
            m_prev = ml_st[:, :, :, 0:1]
            l_prev = ml_st[:, :, :, 1:2]
            m_new = jnp.maximum(m_prev, sco)
            alpha = jnp.exp(m_prev - m_new)
            pexp = jnp.exp(sco - m_new)
            lv = alpha * l_prev + pexp
            lv = jnp.where(lv == 0.0, 1.0, lv)
            accf = (acc_at[:] * alpha + pexp * v3f[:, :, None, :]) / lv
            for h in range(KH):
                blk = accf[:, h, :G, :].reshape(B, G * D)
                attn_out[:, h * G * D:(h + 1) * G * D] = \
                    blk.astype(jnp.bfloat16)

            # ---- merge the new-token KV into the layer's pool row ----
            for b in range(B):
                @pl.when(active[b] > 0)
                def _(b=b):
                    w0, off = w0_of(b)
                    r = off - w0
                    pltpu.make_async_copy(
                        args["k"].at[row_of(b), pl.ds(w0, _RMW_W), :],
                        rmw_k.at[b], rmw_sems.at[0, b]).wait()
                    pltpu.make_async_copy(
                        args["v"].at[row_of(b), pl.ds(w0, _RMW_W), :],
                        rmw_v.at[b], rmw_sems.at[1, b]).wait()
                    if plan.kv_bits == 4:
                        # u4: Dsc=64 rows — the [KH, 64] -> [1, F] i8
                        # merge reshape doesn't lower; merge per head
                        # into its 64-lane block (see megakernel stash)
                        for w in range(_RMW_W):
                            sel = r == w
                            for h in range(KH):
                                cols = slice(h * Dsc, (h + 1) * Dsc)
                                rmw_k[b, w, cols] = jnp.where(
                                    sel, kpay[b, h, :], rmw_k[b, w, cols])
                                rmw_v[b, w, cols] = jnp.where(
                                    sel, vpay[b, h, :], rmw_v[b, w, cols])
                    else:
                        krow = kpay[b].reshape(1, F)
                        vrow = vpay[b].reshape(1, F)
                        for w in range(_RMW_W):
                            sel = r == w
                            rmw_k[b, w, :] = jnp.where(sel, krow[0],
                                                       rmw_k[b, w, :])
                            rmw_v[b, w, :] = jnp.where(sel, vrow[0],
                                                       rmw_v[b, w, :])
                    pltpu.make_async_copy(
                        rmw_k.at[b],
                        kpool_o.at[row_of(b), pl.ds(w0, _RMW_W), :],
                        rmw_sems.at[0, b]).start()
                    pltpu.make_async_copy(
                        rmw_v.at[b],
                        vpool_o.at[row_of(b), pl.ds(w0, _RMW_W), :],
                        rmw_sems.at[1, b]).start()
                    if kv_quant:
                        pltpu.make_async_copy(
                            args["kq"].at[row_of(b)], rmw_kq.at[b],
                            rmw_sems.at[2, b]).wait()
                        pltpu.make_async_copy(
                            args["vq"].at[row_of(b)], rmw_vq.at[b],
                            rmw_sems.at[3, b]).wait()
                        lane2 = jax.lax.broadcasted_iota(
                            jnp.int32, (1, QL), 1)
                        hit = lane2 == off
                        for h in range(KH):
                            kvals = (ksc[b, h], kzr[b, h])
                            vvals = (vsc[b, h], vzr[b, h])
                            for j in range(2):
                                rmw_kq[b, 2 * h + j, :] = jnp.where(
                                    hit[0], kvals[j],
                                    rmw_kq[b, 2 * h + j, :])
                                rmw_vq[b, 2 * h + j, :] = jnp.where(
                                    hit[0], vvals[j],
                                    rmw_vq[b, 2 * h + j, :])
                        pltpu.make_async_copy(
                            rmw_kq.at[b], kqpool_o.at[row_of(b)],
                            rmw_sems.at[2, b]).start()
                        pltpu.make_async_copy(
                            rmw_vq.at[b], vqpool_o.at[row_of(b)],
                            rmw_sems.at[3, b]).start()

        # ---------------- o phase ----------------
        @pl.when(t > ATT)
        def _o():
            c = t - ATT - 1
            y = _stream_dot(plan, o_sp, attn_out[:], args["o_w"],
                            args.get("o_s"), args.get("o_z"), c)
            o_out[:, pl.ds(pl.multiple_of(c * o_sp.chunk, 128),
                           o_sp.chunk)] = y

            # drain the RMW writes during the first o chunk's compute
            @pl.when(c == 0)
            def _():
                for b in range(B):
                    @pl.when(active[b] > 0)
                    def _(b=b):
                        row = tgt_page[b] * L + l
                        off = lens[b] % ps
                        w0 = pl.multiple_of((off // _RMW_W) * _RMW_W,
                                            _RMW_W)
                        pltpu.make_async_copy(
                            rmw_k.at[b],
                            kpool_o.at[row, pl.ds(w0, _RMW_W), :],
                            rmw_sems.at[0, b]).wait()
                        pltpu.make_async_copy(
                            rmw_v.at[b],
                            vpool_o.at[row, pl.ds(w0, _RMW_W), :],
                            rmw_sems.at[1, b]).wait()
                        if kv_quant:
                            pltpu.make_async_copy(
                                rmw_kq.at[b], kqpool_o.at[row],
                                rmw_sems.at[2, b]).wait()
                            pltpu.make_async_copy(
                                rmw_vq.at[b], vqpool_o.at[row],
                                rmw_sems.at[3, b]).wait()

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=NSCAL,
        grid=(T,),
        in_specs=in_specs,
        out_specs=out_specs,
        scratch_shapes=scratch_shapes,
    )

    def fn(l, x, cosq, sinq, cosk, sink, pt, lens, active, tgt_page,
           sched_b, sched_p, n_sched, packed, *pools):
        shapes = [jax.ShapeDtypeStruct((B, hid), jnp.float32)] + \
            [jax.ShapeDtypeStruct(p.shape, p.dtype) for p in pools]
        pool0 = NSCAL + NARG - npools
        aliases = {pool0 + i: 1 + i for i in range(npools)}
        tensors = [x, cosq, sinq, cosk, sink]
        for nm in arg_names[5:NARG - npools]:
            tensors.append(packed[nm])
        tensors += list(pools)
        outs = pl.pallas_call(
            kernel, grid_spec=grid_spec, out_shape=shapes,
            input_output_aliases=aliases, interpret=interpret,
            compiler_params=None if interpret else pltpu.CompilerParams(
                has_side_effects=True,
                vmem_limit_bytes=100 * 1024 * 1024),
        )(jnp.full((1,), l, jnp.int32), pt.astype(jnp.int32),
          lens.astype(jnp.int32), active.astype(jnp.int32),
          tgt_page.astype(jnp.int32), sched_b.astype(jnp.int32),
          sched_p.astype(jnp.int32), n_sched.astype(jnp.int32), *tensors)
        return outs[0], tuple(outs[1:])

    return fn


def build_mlp_segment(plan: MegaPlan, interpret: Optional[bool] = None):
    """One layer's MLP segment: fn(l, x [B,hid] f32, packed) ->
    dn_partial [B, hid] f32."""
    B, hid = plan.B, plan.hid
    gu, dn = plan.gu, plan.dn
    eps = plan.rms_eps
    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    T = gu.S + dn.S
    NSCAL = 1

    def stream_idx(base, count):
        def idx(t, lref, *_):
            return (lref[0], jnp.clip(t - base, 0, count - 1), 0, 0)
        return idx

    def norm_idx(t, lref, *_):
        return (lref[0], 0, 0)

    in_specs = [pl.BlockSpec((B, hid), lambda *_: (0, 0))]
    arg_names = ["x"]
    _append_stream(in_specs, arg_names, gu, stream_idx(0, gu.S))
    _append_stream(in_specs, arg_names, dn, stream_idx(gu.S, dn.S))
    in_specs.append(pl.BlockSpec((1, 2, hid), norm_idx))
    arg_names.append("norms")

    out_specs = [pl.BlockSpec((B, hid), lambda *_: (0, 0))]
    scratch_shapes = [
        pltpu.VMEM((B, hid), jnp.bfloat16),                   # x_norm
        pltpu.VMEM((B, max(gu.Np, dn.Kp)), jnp.bfloat16),     # gu_out
        pltpu.VMEM((B, hid), jnp.float32),                    # acc_dn
    ]
    NARG = len(arg_names)

    def kernel(*refs):
        l_arr = refs[0]
        args = {n: refs[NSCAL + i] for i, n in enumerate(arg_names)}
        dn_out = refs[NSCAL + NARG]
        x_norm, gu_out, acc_dn = refs[NSCAL + NARG + 1:]
        t = pl.program_id(0)

        @pl.when(t < gu.S)
        def _gu():
            @pl.when(t == 0)
            def _():
                x_norm[:] = _rms(args["x"][:], args["norms"][0, 1],
                                 eps).astype(jnp.bfloat16)
                acc_dn[:] = jnp.zeros_like(acc_dn)
            c = t
            y = _stream_dot(plan, gu, x_norm[:], args["gu_w"],
                            args.get("gu_s"), args.get("gu_z"), c)
            gu_out[:, pl.ds(pl.multiple_of(c * gu.chunk, 128),
                            gu.chunk)] = y.astype(jnp.bfloat16)

        @pl.when(t >= gu.S)
        def _dn():
            c = t - gu.S

            @pl.when(c == 0)
            def _():
                gate = gu_out[:, :plan.inter].astype(jnp.float32)
                up = gu_out[:, plan.inter:2 * plan.inter].astype(jnp.float32)
                act = (gate * jax.lax.logistic(gate) * up) \
                    .astype(jnp.bfloat16)
                gu_out[:, :plan.inter] = act
                if dn.Kp > plan.inter:
                    gu_out[:, plan.inter:dn.Kp] = jnp.zeros(
                        (B, dn.Kp - plan.inter), jnp.bfloat16)

            xc = gu_out[:, pl.ds(pl.multiple_of(c * dn.chunk, 128),
                                 dn.chunk)]
            y = _stream_dot(plan, dn, xc, args["dn_w"],
                            args.get("dn_s"), args.get("dn_z"), c)
            acc_dn[:] = acc_dn[:] + y[:, :hid]

            @pl.when(c == dn.S - 1)
            def _():
                dn_out[:] = acc_dn[:]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=NSCAL,
        grid=(T,),
        in_specs=in_specs,
        out_specs=out_specs,
        scratch_shapes=scratch_shapes,
    )

    def fn(l, x, packed):
        tensors = [x] + [packed[nm] for nm in arg_names[1:]]
        out = pl.pallas_call(
            kernel, grid_spec=grid_spec,
            out_shape=[jax.ShapeDtypeStruct((B, hid), jnp.float32)],
            interpret=interpret,
            compiler_params=None if interpret else pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
        )(jnp.full((1,), l, jnp.int32), *tensors)
        return out[0]

    return fn


def build_moe_mlp_segment(plan: MegaPlan, E_global: int, EP_global: int,
                          interpret: Optional[bool] = None):
    """One layer's MoE segment on this shard: global router (replicated
    math — every rank computes the same gates over ALL experts), this
    rank's expert group streamed (EPSPLIT), shared expert split by inter.

    fn(l, rank, x [B,hid] f32, packed) -> moe_partial [B, hid] f32.
    """
    B, hid = plan.B, plan.hid
    gu, dn = plan.gu, plan.dn
    E_loc = plan.E
    SE = gu.S + dn.S
    eps = plan.rms_eps
    has_shared = plan.has_shared
    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    base_sh = 1 + E_loc * SE
    T = base_sh + ((plan.sgu.S + plan.sdn.S) if has_shared else 0)
    NSCAL = 2  # l, rank

    def norm_idx(t, lref, *_):
        return (lref[0], 0, 0)

    def expert_sub_idx(sub_off, count):
        def idx(t, lref, *_):
            c_all = jnp.clip(t - 1, 0, E_loc * SE - 1)
            e = c_all // SE
            w = c_all - e * SE
            return (lref[0], e * count + jnp.clip(w - sub_off, 0, count - 1),
                    0, 0)
        return idx

    def sh_idx(base, count):
        def idx(t, lref, *_):
            return (lref[0], jnp.clip(t - base, 0, count - 1), 0, 0)
        return idx

    in_specs = [pl.BlockSpec((B, hid), lambda *_: (0, 0))]
    arg_names = ["x"]
    _append_stream(in_specs, arg_names, gu, expert_sub_idx(0, gu.S))
    _append_stream(in_specs, arg_names, dn, expert_sub_idx(gu.S, dn.S))
    if has_shared:
        _append_stream(in_specs, arg_names, plan.sgu,
                       sh_idx(base_sh, plan.sgu.S))
        _append_stream(in_specs, arg_names, plan.sdn,
                       sh_idx(base_sh + plan.sgu.S, plan.sdn.S))
    in_specs.append(pl.BlockSpec((1, 2, hid), norm_idx))
    arg_names.append("norms")
    in_specs.append(pl.BlockSpec((1, hid, EP_global), norm_idx))
    arg_names.append("router_w")

    out_specs = [pl.BlockSpec((B, hid), lambda *_: (0, 0))]
    scratch_shapes = [
        pltpu.VMEM((B, hid), jnp.bfloat16),                   # x_norm
        pltpu.VMEM((B, max([gu.Np, dn.Kp] +
                           ([plan.sgu.Np, plan.sdn.Kp] if has_shared
                            else []))), jnp.bfloat16),        # gu_out
        pltpu.VMEM((B, hid), jnp.float32),                    # acc_dn
        pltpu.VMEM((B, hid), jnp.float32),                    # acc_out
        pltpu.VMEM((B, EP_global), jnp.float32),              # gates
    ]
    NARG = len(arg_names)

    def kernel(*refs):
        l_arr, rank_arr = refs[:NSCAL]
        args = {n: refs[NSCAL + i] for i, n in enumerate(arg_names)}
        moe_out = refs[NSCAL + NARG]
        x_norm, gu_out, acc_dn, acc_out, gates_st = refs[NSCAL + NARG + 1:]
        t = pl.program_id(0)
        rank = rank_arr[0]
        lane_ep = jax.lax.broadcasted_iota(jnp.int32, (B, EP_global), 1)

        def swiglu(inter_v, Kp_dn):
            gate = gu_out[:, :inter_v].astype(jnp.float32)
            up = gu_out[:, inter_v:2 * inter_v].astype(jnp.float32)
            act = (gate * jax.lax.logistic(gate) * up).astype(jnp.bfloat16)
            gu_out[:, :inter_v] = act
            if Kp_dn > inter_v:
                gu_out[:, inter_v:Kp_dn] = jnp.zeros(
                    (B, Kp_dn - inter_v), jnp.bfloat16)
            acc_dn[:] = jnp.zeros_like(acc_dn)

        # ---------------- router (t == 0) ----------------
        @pl.when(t == 0)
        def _router():
            x_norm[:] = _rms(args["x"][:], args["norms"][0, 1],
                             eps).astype(jnp.bfloat16)
            acc_out[:] = jnp.zeros_like(acc_out)
            rw = args["router_w"][0]                         # [hid, EP_g]
            logits = jax.lax.dot_general(
                x_norm[:], rw, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)          # [B, EP_g]
            ml = jnp.where(lane_ep < E_global, logits, _NEG_INF)
            m = jnp.max(ml, axis=-1, keepdims=True)
            p = jnp.exp(ml - m)
            p = p / jnp.sum(p, axis=-1, keepdims=True)
            gates = jnp.zeros((B, EP_global), jnp.float32)
            pw = p
            for _ in range(plan.k_top):
                mi = jnp.max(pw, axis=-1, keepdims=True)
                fl = jnp.min(jnp.where(pw >= mi, lane_ep, EP_global),
                             axis=-1, keepdims=True)
                sel = lane_ep == fl
                gates = jnp.where(sel, p, gates)
                pw = jnp.where(sel, -1.0, pw)
            if plan.norm_topk:
                gates = gates / jnp.sum(gates, axis=-1, keepdims=True)
            if has_shared:
                if plan.has_shared_gate:
                    sval = jnp.sum(
                        jnp.where(lane_ep == E_global, logits, 0.0),
                        axis=-1, keepdims=True)
                    sg = jax.lax.logistic(sval)
                else:
                    sg = jnp.ones((B, 1), jnp.float32)
                gates = jnp.where(lane_ep == E_global, sg, gates)
            gates_st[:] = gates

        in_exp = jnp.logical_and(t >= 1, t < base_sh)
        c_all = jnp.clip(t - 1, 0, E_loc * SE - 1)
        e_idx = c_all // SE
        w_in = c_all - e_idx * SE

        # ---------------- this rank's expert gate/up ----------------
        @pl.when(jnp.logical_and(in_exp, w_in < gu.S))
        def _egu():
            c = w_in
            y = _stream_dot(plan, gu, x_norm[:], args["gu_w"],
                            args.get("gu_s"), args.get("gu_z"), c)
            gu_out[:, pl.ds(pl.multiple_of(c * gu.chunk, 128),
                            gu.chunk)] = y.astype(jnp.bfloat16)

            @pl.when(c == gu.S - 1)
            def _():
                swiglu(plan.inter, dn.Kp)

        # ---------------- this rank's expert down ----------------
        @pl.when(jnp.logical_and(in_exp, w_in >= gu.S))
        def _edn():
            c = w_in - gu.S
            xc = gu_out[:, pl.ds(pl.multiple_of(c * dn.chunk, 128),
                                 dn.chunk)]
            y = _stream_dot(plan, dn, xc, args["dn_w"],
                            args.get("dn_s"), args.get("dn_z"), c)
            acc_dn[:] = acc_dn[:] + y[:, :hid]

            @pl.when(c == dn.S - 1)
            def _():
                # global expert id of this rank's local expert e_idx
                ge = jnp.sum(
                    jnp.where(lane_ep == rank * E_loc + e_idx,
                              gates_st[:], 0.0),
                    axis=-1, keepdims=True)                  # [B, 1]
                acc_out[:] = acc_out[:] + ge * acc_dn[:]

        if has_shared:
            sgu_, sdn_ = plan.sgu, plan.sdn

            @pl.when(jnp.logical_and(t >= base_sh,
                                     t < base_sh + sgu_.S))
            def _sgu():
                c = t - base_sh
                y = _stream_dot(plan, sgu_, x_norm[:], args["sg_w"],
                                args.get("sg_s"), args.get("sg_z"), c)
                gu_out[:, pl.ds(pl.multiple_of(c * sgu_.chunk, 128),
                                sgu_.chunk)] = y.astype(jnp.bfloat16)

                @pl.when(c == sgu_.S - 1)
                def _():
                    swiglu(plan.shared_inter, sdn_.Kp)

            @pl.when(t >= base_sh + sgu_.S)
            def _sdn():
                c = t - base_sh - sgu_.S
                xc = gu_out[:, pl.ds(pl.multiple_of(c * sdn_.chunk, 128),
                                     sdn_.chunk)]
                y = _stream_dot(plan, sdn_, xc, args["sd_w"],
                                args.get("sd_s"), args.get("sd_z"), c)
                acc_dn[:] = acc_dn[:] + y[:, :hid]

                @pl.when(c == sdn_.S - 1)
                def _():
                    sgv = jnp.sum(
                        jnp.where(lane_ep == E_global, gates_st[:], 0.0),
                        axis=-1, keepdims=True)
                    acc_out[:] = acc_out[:] + sgv * acc_dn[:]

        # final write (after the accumulating blocks above in program order)
        @pl.when(t == T - 1)
        def _emit():
            moe_out[:] = acc_out[:]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=NSCAL,
        grid=(T,),
        in_specs=in_specs,
        out_specs=out_specs,
        scratch_shapes=scratch_shapes,
    )

    def fn(l, rank, x, packed):
        tensors = [x] + [packed[nm] for nm in arg_names[1:]]
        out = pl.pallas_call(
            kernel, grid_spec=grid_spec,
            out_shape=[jax.ShapeDtypeStruct((B, hid), jnp.float32)],
            interpret=interpret,
            compiler_params=None if interpret else pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
        )(jnp.full((1,), l, jnp.int32),
          jnp.full((1,), rank, jnp.int32), *tensors)
        return out[0]

    return fn


def build_lm_segment(plan: MegaPlan, interpret: Optional[bool] = None):
    """Final norm + lm head over the local vocab shard:
    fn(x [B,hid] f32, packed) -> logits [B, Vp_local] f32."""
    B, hid = plan.B, plan.hid
    lm = plan.lm
    eps = plan.rms_eps
    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    def stream_idx(t, *_):
        return (0, jnp.clip(t, 0, lm.S - 1), 0, 0)

    in_specs = [pl.BlockSpec((B, hid), lambda *_: (0, 0))]
    arg_names = ["x"]
    _append_stream(in_specs, arg_names, lm, stream_idx)
    in_specs.append(pl.BlockSpec((1, hid), lambda *_: (0, 0)))
    arg_names.append("final_norm")

    out_specs = [pl.BlockSpec((B, lm.chunk), lambda t, *_: (0, t))]
    scratch_shapes = [pltpu.VMEM((B, hid), jnp.bfloat16)]
    NARG = len(arg_names)

    def kernel(*refs):
        args = {n: refs[i] for i, n in enumerate(arg_names)}
        logits_ref = refs[NARG]
        x_norm = refs[NARG + 1]
        t = pl.program_id(0)

        @pl.when(t == 0)
        def _():
            x_norm[:] = _rms(args["x"][:], args["final_norm"][0],
                             eps).astype(jnp.bfloat16)
        y = _stream_dot(plan, lm, x_norm[:], args["lm_w"],
                        args.get("lm_s"), args.get("lm_z"), t)
        logits_ref[:] = y

    def fn(x, packed):
        tensors = [x] + [packed[nm] for nm in arg_names[1:]]
        out = pl.pallas_call(
            kernel,
            grid=(lm.S,),
            in_specs=in_specs,
            out_specs=out_specs,
            out_shape=[jax.ShapeDtypeStruct((B, plan.Vp), jnp.float32)],
            scratch_shapes=scratch_shapes,
            interpret=interpret,
            compiler_params=None if interpret else pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
        )(*tensors)
        return out[0]

    return fn


# ---------------------------------------------------------------------------
# shard_map assembly
# ---------------------------------------------------------------------------

def build_tp_decode_fn(plan: MegaPlan, mesh: Mesh, full_vocab: int,
                       interpret: Optional[bool] = None):
    """Whole-model TP decode step over the mesh's model axis.

    Returns fn(packed [n-leading-rank-dim pytree], x0 [B, hid] bf16,
    cos [B, D] bf16, sin [B, D] bf16, pt, lens, active, tgt_page, sched_b,
    sched_p, n_sched, *pools-sharded) -> (logits [B, full_vocab] f32,
    *pools). Call it inside jit; pools must carry the head-sharded
    NamedShardings from parallel.shard_cache."""
    import inspect
    try:
        from jax import shard_map as _sm
    except ImportError:                       # older jax
        from jax.experimental.shard_map import shard_map as _sm
    # replication checking must be off (pallas_call inside); the kwarg was
    # renamed check_rep -> check_vma in jax 0.8
    _ck = "check_vma" if "check_vma" in \
        inspect.signature(_sm).parameters else "check_rep"

    def shard_map(f, **kw):
        kw[_ck] = kw.pop("check_rep")
        return _sm(f, **kw)

    n = mesh.shape[MODEL_AXIS]
    B, hid, L = plan.B, plan.hid, plan.L
    H, KH, D = plan.H, plan.KH, plan.D
    kv_quant = plan.kv_mode != CacheMode.DEFAULT
    npools = 4 if kv_quant else 2
    V_loc = full_vocab // n

    seg_a = build_attn_segment(plan, interpret)
    if plan.E > 0:
        E_g = plan.E * n
        EP_g = max(128, _round_up(E_g + (1 if plan.has_shared else 0), 128))
        seg_moe = build_moe_mlp_segment(plan, E_g, EP_g, interpret)
    else:
        seg_b = build_mlp_segment(plan, interpret)
    seg_lm = build_lm_segment(plan, interpret)

    def local_fn(packed, x0, cos, sin, pt, lens, active, tgt_page,
                 sched_b, sched_p, n_sched, *pools):
        pk = jax.tree.map(lambda a: a[0], packed)   # drop rank dim
        rank = jax.lax.axis_index(MODEL_AXIS)
        cosq = jnp.tile(cos, (1, H))
        sinq = jnp.tile(sin, (1, H))
        cosk = jnp.tile(cos, (1, KH))
        sink = jnp.tile(sin, (1, KH))
        x = x0.astype(jnp.float32)
        for l in range(L):
            o_part, pools = seg_a(l, x, cosq, sinq, cosk, sink,
                                  pt, lens, active, tgt_page,
                                  sched_b, sched_p, n_sched, pk, *pools)
            x = x + jax.lax.psum(o_part, MODEL_AXIS)
            if plan.E > 0:
                d_part = seg_moe(l, rank, x, pk)
            else:
                d_part = seg_b(l, x, pk)
            x = x + jax.lax.psum(d_part, MODEL_AXIS)
        logits_pad = seg_lm(x, pk)                  # [B, Vp_local]
        logits = logits_pad[:, :V_loc]              # drop shard padding
        return (logits,) + tuple(pools)

    M = MODEL_AXIS
    pool_specs = [P(None, None, M), P(None, None, M)]
    if kv_quant:
        pool_specs += [P(None, M, None), P(None, M, None)]
    out_specs = (P(None, M),) + tuple(pool_specs)

    def fn(packed, x0, cos, sin, pt, lens, active, tgt_page,
           sched_b, sched_p, n_sched, *pools):
        sm = shard_map(
            local_fn, mesh=mesh,
            in_specs=(jax.tree.map(lambda _: P(M), packed),
                      P(), P(), P(), P(), P(), P(), P(), P(), P(), P(),
                      *pool_specs),
            out_specs=out_specs,
            check_rep=False)
        return sm(packed, x0, cos, sin, pt.astype(jnp.int32),
                  lens.astype(jnp.int32), active.astype(jnp.int32),
                  tgt_page.astype(jnp.int32), sched_b.astype(jnp.int32),
                  sched_p.astype(jnp.int32), n_sched.astype(jnp.int32),
                  *pools)

    return fn


# ---------------------------------------------------------------------------
# TP prefill: per-layer segments of the prefill megakernel + psum
# ---------------------------------------------------------------------------

def supports_prefill_tp(cfg: ModelConfig, rt: RuntimeConfig, params: Dict,
                        bucket: int, n: int) -> bool:
    """TP prefill segment eligibility. ALiBi rides the decode approach:
    SPMD runs the SAME program on every rank, so per-rank slope slices of
    the GLOBAL head table come in as an input tensor rather than baked
    constants (reference ALiBiPE op; heads VSPLIT per rank)."""
    from dashinfer_tpu.ops.pallas import prefill_megakernel as pmk
    if cfg.position_embedding.value not in ("rope", "alibi"):
        return False
    if not supports_tp(cfg, rt, params, n):
        return False
    view = mk.weight_only_decode_view(params)
    cfg_l = local_config(cfg, n)
    return pmk.supports_prefill(cfg_l, rt, _split_rank(view, cfg, n, 0),
                                bucket)


def make_tp_prefill_plans(cfg: ModelConfig, rt: RuntimeConfig, params: Dict,
                          buckets: List[int], n: int,
                          target_chunk_bytes: Optional[int] = None):
    """({bucket: local PrefillPlan}, packed pytree with leading [n] rank
    dim). The split and pack run ONCE — stream geometry is
    bucket-independent, only the plan's S differs."""
    from dashinfer_tpu.ops.pallas import prefill_megakernel as pmk
    view = mk.weight_only_decode_view(params)
    parts = split_params_tp(view, cfg, n)
    cfg_l = local_config(cfg, n)
    kw = {}
    if target_chunk_bytes is not None:
        kw["target_chunk_bytes"] = target_chunk_bytes
    plans = {b: pmk.make_prefill_plan(cfg_l, rt, parts[0], b, **kw)
             for b in buckets}
    first = plans[buckets[0]]
    packed_r = [pmk.pack_prefill_params(cfg_l, first, p) for p in parts]
    if first.alibi:
        # per-rank slice of the GLOBAL slope table (heads VSPLIT), shipped
        # as an input tensor shaped [1, Hp] — same scheme as decode TP
        from dashinfer_tpu.models.transformer import alibi_slopes
        sl = np.asarray(alibi_slopes(cfg.num_heads), np.float32)
        H_loc = cfg.num_heads // n
        Hp = _round_up(H_loc, 128)
        for r in range(n):
            row = np.zeros((1, Hp), np.float32)
            row[0, :H_loc] = sl[r * H_loc:(r + 1) * H_loc]
            packed_r[r]["slopes"] = jnp.asarray(row)
    packed = jax.tree.map(lambda *xs: jnp.stack(
        [np.asarray(x) for x in xs]), *packed_r)
    return plans, packed


def make_tp_prefill_plan(cfg: ModelConfig, rt: RuntimeConfig, params: Dict,
                         bucket: int, n: int,
                         target_chunk_bytes: Optional[int] = None):
    """Single-bucket convenience wrapper around make_tp_prefill_plans."""
    plans, packed = make_tp_prefill_plans(cfg, rt, params, [bucket], n,
                                          target_chunk_bytes)
    return plans[bucket], packed


def build_prefill_attn_segment(plan, interpret: Optional[bool] = None):
    """One layer's prefill attention segment on this shard.

    fn(l, x [S, hid] f32, cos, sin, page_row, n_tokens, packed, *pools)
       -> (o_partial [S, hid] f32, *pools)
    """
    from dashinfer_tpu.ops.pallas.prefill_megakernel import (
        _restripe_qrow, _wdeq_tile)
    S, L, hid = plan.S, plan.L, plan.hid
    H, KH, D = plan.H, plan.KH, plan.D
    HD = H * D
    ps, maxPb = plan.ps, plan.maxPb
    # qparam pool rows are [2*KH, QL] (see runtime/kv_cache.py); page-
    # strided stash for ps < 128 as in prefill_megakernel
    QL = -(-ps // 128) * 128
    SQ = S if QL == ps else maxPb * QL
    kv_quant = plan.kv_mode != CacheMode.DEFAULT
    Dsc = plan.kv_store_dim
    F = KH * Dsc
    qkv, o_sp = plan.qkv, plan.o
    eps = plan.rms_eps
    scale_att = 1.0 / math.sqrt(D)
    kv_dtype = jnp.dtype(plan.kv_dtype_name)
    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    T = qkv.S + 1 + o_sp.S
    ATT = qkv.S
    NSCAL = 3  # l, page_row, n_tokens

    def stream_idx(base, count):
        def idx(t, lref, *_):
            return (lref[0], jnp.clip(t - base, 0, count - 1), 0, 0)
        return idx

    def norm_idx(t, lref, *_):
        return (lref[0], 0, 0)

    in_specs = [
        pl.BlockSpec((S, hid), lambda *_: (0, 0)),       # x
        pl.BlockSpec((S, D), lambda *_: (0, 0)),         # cos
        pl.BlockSpec((S, D), lambda *_: (0, 0)),         # sin
    ]
    arg_names = ["x", "cos", "sin"]
    _append_stream(in_specs, arg_names, qkv, stream_idx(0, qkv.S))
    _append_stream(in_specs, arg_names, o_sp, stream_idx(ATT + 1, o_sp.S))
    in_specs.append(pl.BlockSpec((1, 2, hid), norm_idx))
    arg_names.append("norms")
    in_specs.append(pl.BlockSpec((1, 1, plan.QKVN), norm_idx))
    arg_names.append("qkv_b")
    if plan.qk_norm:
        in_specs.append(pl.BlockSpec((1, 2, HD), norm_idx))
        arg_names.append("qk_norms")
    if plan.alibi:
        Hp = _round_up(H, 128)
        in_specs.append(pl.BlockSpec((1, Hp), lambda *_: (0, 0)))
        arg_names.append("slopes")
    npools = 4 if kv_quant else 2
    for _ in range(npools):
        in_specs.append(pl.BlockSpec(memory_space=pl.ANY))
    arg_names += ["k", "v", "kq", "vq"][:npools]

    out_specs = [pl.BlockSpec((S, hid), lambda *_: (0, 0))] + \
        [pl.BlockSpec(memory_space=pl.ANY)] * npools

    scratch_shapes = [
        pltpu.VMEM((S, hid), jnp.bfloat16),          # x_norm
        pltpu.VMEM((S, qkv.Np), jnp.float32),        # qkv_out
        pltpu.VMEM((S, HD), jnp.bfloat16),           # attn_out
        pltpu.VMEM((S, F), kv_dtype),                # kpay
        pltpu.VMEM((S, F), kv_dtype),                # vpay
        pltpu.VMEM((2 * KH, SQ), jnp.float32),       # kq_rows
        pltpu.VMEM((2 * KH, SQ), jnp.float32),       # vq_rows
        pltpu.SemaphoreType.DMA((4, maxPb)),         # page write sems
    ]
    NARG = len(arg_names)

    def kernel(*refs):
        l_arr, page_row, n_tok = refs[:NSCAL]
        args = {nm: refs[NSCAL + i] for i, nm in enumerate(arg_names)}
        o_out = refs[NSCAL + NARG]
        kpool_o = refs[NSCAL + NARG + 1]
        vpool_o = refs[NSCAL + NARG + 2]
        if kv_quant:
            kqpool_o = refs[NSCAL + NARG + 3]
            vqpool_o = refs[NSCAL + NARG + 4]
        (x_norm, qkv_out, attn_out, kpay, vpay, kq_rows, vq_rows,
         wsems) = refs[NSCAL + NARG + 1 + npools:]
        t = pl.program_id(0)
        l = l_arr[0]
        n = n_tok[0]

        def page_write_copies(j):
            width = min(ps, S - j * ps)
            phys = page_row[j] + l
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

        # ---------------- qkv phase ----------------
        @pl.when(t < ATT)
        def _qkv():
            @pl.when(t == 0)
            def _():
                x_norm[:] = _rms(args["x"][:], args["norms"][0, 0],
                                 eps).astype(jnp.bfloat16)
            c = t
            w = _wdeq_tile(qkv, args["qkv_w"], args.get("qkv_s"),
                           args.get("qkv_z"))
            y = jax.lax.dot_general(
                x_norm[:], w, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            qkv_out[:, pl.ds(pl.multiple_of(c * qkv.chunk, 128),
                             qkv.chunk)] = y

        # ---------------- attention + local-head KV write-out ----------
        @pl.when(t == ATT)
        def _att():
            bias = args["qkv_b"][0, 0].astype(jnp.float32)
            cos1 = args["cos"][:].astype(jnp.float32)
            sin1 = args["sin"][:].astype(jnp.float32)
            if plan.qk_norm:
                qkn = args["qk_norms"][0]

            def head_slice(base_col, idx, w_norm=None):
                # slice-then-None: bias[None, a:b] traces to a gather
                # Mosaic can't lower
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
                # k_pos - q_pos as f32; slopes come from the per-rank
                # GLOBAL-table slice input (not baked — SPMD-safe)
                dist = (col - row).astype(jnp.float32)
            G = H // KH
            for h in range(KH):
                wk = qkn[1][h * D:(h + 1) * D][None, :] \
                    .astype(jnp.float32) if plan.qk_norm else None
                kh = head_slice(HD, h, wk)
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
                        sco = sco + args["slopes"][0, hh] * dist
                    sco = jnp.where(causal, sco, _NEG_INF)
                    m = jnp.max(sco, axis=-1, keepdims=True)
                    p = jnp.exp(sco - m)
                    p = p / jnp.sum(p, axis=-1, keepdims=True)
                    ov = jnp.dot(p.astype(jnp.bfloat16),
                                 vh.astype(jnp.bfloat16),
                                 preferred_element_type=jnp.float32)
                    attn_out[:, hh * D:(hh + 1) * D] = \
                        ov.astype(jnp.bfloat16)

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
                    for cp in page_write_copies(j):
                        cp.start()

        # ---------------- o phase ----------------
        @pl.when(t > ATT)
        def _o():
            c = t - ATT - 1
            w = _wdeq_tile(o_sp, args["o_w"], args.get("o_s"),
                           args.get("o_z"))
            y = jax.lax.dot_general(
                attn_out[:], w, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            o_out[:, pl.ds(pl.multiple_of(c * o_sp.chunk, 128),
                           o_sp.chunk)] = y

            @pl.when(c == o_sp.S - 1)
            def _():
                for j in range(maxPb):
                    @pl.when(j * ps < n)
                    def _(j=j):
                        for cp in page_write_copies(j):
                            cp.wait()

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=NSCAL,
        grid=(T,),
        in_specs=in_specs,
        out_specs=out_specs,
        scratch_shapes=scratch_shapes,
    )

    def fn(l, x, cos, sin, page_row, n_tokens, packed, *pools):
        shapes = [jax.ShapeDtypeStruct((S, hid), jnp.float32)] + \
            [jax.ShapeDtypeStruct(p.shape, p.dtype) for p in pools]
        pool0 = NSCAL + NARG - npools
        aliases = {pool0 + i: 1 + i for i in range(npools)}
        tensors = [x, cos, sin]
        for nm in arg_names[3:NARG - npools]:
            tensors.append(packed[nm])
        tensors += list(pools)
        outs = pl.pallas_call(
            kernel, grid_spec=grid_spec, out_shape=shapes,
            input_output_aliases=aliases, interpret=interpret,
            compiler_params=None if interpret else pltpu.CompilerParams(
                has_side_effects=True,
                vmem_limit_bytes=110 * 1024 * 1024),
        )(jnp.full((1,), l, jnp.int32), page_row.astype(jnp.int32),
          n_tokens.astype(jnp.int32)[None], *tensors)
        return outs[0], tuple(outs[1:])

    return fn


def build_prefill_mlp_segment(plan, interpret: Optional[bool] = None):
    """One layer's prefill MLP segment (interleaved gate/up/down streams):
    fn(l, x [S, hid] f32, packed) -> mlp_partial [S, hid] f32."""
    from dashinfer_tpu.ops.pallas.prefill_megakernel import _wdeq_tile
    S, hid = plan.S, plan.hid
    pg, pu, pd = plan.pg, plan.pu, plan.pd
    eps = plan.rms_eps
    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    T = pg.S
    NSCAL = 1

    def stream_idx(t, lref, *_):
        return (lref[0], jnp.clip(t, 0, pg.S - 1), 0, 0)

    def norm_idx(t, lref, *_):
        return (lref[0], 0, 0)

    in_specs = [pl.BlockSpec((S, hid), lambda *_: (0, 0))]
    arg_names = ["x"]
    for sp in (pg, pu, pd):
        _append_stream(in_specs, arg_names, sp, stream_idx)
    in_specs.append(pl.BlockSpec((1, 2, hid), norm_idx))
    arg_names.append("norms")

    out_specs = [pl.BlockSpec((S, hid), lambda *_: (0, 0))]
    scratch_shapes = [
        pltpu.VMEM((S, hid), jnp.bfloat16),          # x_norm
        pltpu.VMEM((S, hid), jnp.float32),           # acc_mlp
    ]
    NARG = len(arg_names)

    def kernel(*refs):
        l_arr = refs[0]
        args = {nm: refs[NSCAL + i] for i, nm in enumerate(arg_names)}
        mlp_out = refs[NSCAL + NARG]
        x_norm, acc_mlp = refs[NSCAL + NARG + 1:]
        t = pl.program_id(0)

        @pl.when(t == 0)
        def _():
            x_norm[:] = _rms(args["x"][:], args["norms"][0, 1],
                             eps).astype(jnp.bfloat16)
            acc_mlp[:] = jnp.zeros_like(acc_mlp)

        wg = _wdeq_tile(pg, args["pg_w"], args.get("pg_s"),
                        args.get("pg_z"))
        wu = _wdeq_tile(pu, args["pu_w"], args.get("pu_s"),
                        args.get("pu_z"))
        wd = _wdeq_tile(pd, args["pd_w"], args.get("pd_s"),
                        args.get("pd_z"))
        g_ = jax.lax.dot_general(
            x_norm[:], wg, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        u_ = jax.lax.dot_general(
            x_norm[:], wu, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        act = (g_ * jax.lax.logistic(g_) * u_).astype(jnp.bfloat16)
        y = jax.lax.dot_general(
            act, wd, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        acc_mlp[:] = acc_mlp[:] + y[:, :hid]

        @pl.when(t == pg.S - 1)
        def _():
            mlp_out[:] = acc_mlp[:]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=NSCAL,
        grid=(T,),
        in_specs=in_specs,
        out_specs=out_specs,
        scratch_shapes=scratch_shapes,
    )

    def fn(l, x, packed):
        tensors = [x] + [packed[nm] for nm in arg_names[1:]]
        out = pl.pallas_call(
            kernel, grid_spec=grid_spec,
            out_shape=[jax.ShapeDtypeStruct((S, hid), jnp.float32)],
            interpret=interpret,
            compiler_params=None if interpret else pltpu.CompilerParams(
                vmem_limit_bytes=110 * 1024 * 1024),
        )(jnp.full((1,), l, jnp.int32), *tensors)
        return out[0]

    return fn


def build_prefill_lm_segment(plan, interpret: Optional[bool] = None):
    """Final norm + lm head on the LAST valid token over the local vocab
    shard: fn(x [S, hid] f32, n_tokens, packed) -> [8, Vp_local] f32."""
    from dashinfer_tpu.ops.pallas.prefill_megakernel import _wdeq_tile
    S, hid = plan.S, plan.hid
    lm = plan.lm
    eps = plan.rms_eps
    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    NSCAL = 1  # n_tokens

    def stream_idx(t, *_):
        return (0, jnp.clip(t, 0, lm.S - 1), 0, 0)

    in_specs = [pl.BlockSpec((S, hid), lambda *_: (0, 0))]
    arg_names = ["x"]
    _append_stream(in_specs, arg_names, lm, stream_idx)
    in_specs.append(pl.BlockSpec((1, hid), lambda *_: (0, 0)))
    arg_names.append("final_norm")

    out_specs = [pl.BlockSpec((8, lm.chunk), lambda t, *_: (0, t))]
    scratch_shapes = [pltpu.VMEM((8, hid), jnp.bfloat16)]
    NARG = len(arg_names)

    def kernel(*refs):
        n_tok = refs[0]
        args = {nm: refs[NSCAL + i] for i, nm in enumerate(arg_names)}
        logits_ref = refs[NSCAL + NARG]
        x_last = refs[NSCAL + NARG + 1]
        t = pl.program_id(0)
        n = n_tok[0]

        @pl.when(t == 0)
        def _():
            ridx = jax.lax.broadcasted_iota(jnp.int32, (S, hid), 0)
            sel = ridx == (n - 1)
            last = jnp.sum(jnp.where(sel, args["x"][:], 0.0), axis=0,
                           keepdims=True)
            lastn = _rms(last, args["final_norm"][0], eps)
            x_last[:] = jnp.broadcast_to(
                lastn.astype(jnp.bfloat16), (8, hid))

        w = _wdeq_tile(lm, args["lm_w"], args.get("lm_s"),
                       args.get("lm_z"))
        logits_ref[:] = jax.lax.dot_general(
            x_last[:], w, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=NSCAL,
        grid=(lm.S,),
        in_specs=in_specs,
        out_specs=out_specs,
        scratch_shapes=scratch_shapes,
    )

    def fn(x, n_tokens, packed):
        tensors = [x] + [packed[nm] for nm in arg_names[1:]]
        out = pl.pallas_call(
            kernel, grid_spec=grid_spec,
            out_shape=[jax.ShapeDtypeStruct((8, plan.Vp), jnp.float32)],
            interpret=interpret,
            compiler_params=None if interpret else pltpu.CompilerParams(
                vmem_limit_bytes=110 * 1024 * 1024),
        )(n_tokens.astype(jnp.int32)[None], *tensors)
        return out[0]

    return fn


def build_tp_prefill_fn(plan, mesh: Mesh, full_vocab: int,
                        interpret: Optional[bool] = None):
    """Whole-prefill TP step: fn(packed, x0 [S, hid] bf16, cos [S, D],
    sin [S, D], page_row [maxPb] physical base rows, n_tokens, *pools)
    -> (logits [8, full_vocab] f32 (row 0 real), *pools)."""
    import inspect
    try:
        from jax import shard_map as _sm
    except ImportError:
        from jax.experimental.shard_map import shard_map as _sm
    _ck = "check_vma" if "check_vma" in \
        inspect.signature(_sm).parameters else "check_rep"

    n = mesh.shape[MODEL_AXIS]
    L = plan.L
    kv_quant = plan.kv_mode != CacheMode.DEFAULT
    npools = 4 if kv_quant else 2
    V_loc = full_vocab // n

    seg_a = build_prefill_attn_segment(plan, interpret)
    seg_m = build_prefill_mlp_segment(plan, interpret)
    seg_lm = build_prefill_lm_segment(plan, interpret)

    def local_fn(packed, x0, cos, sin, page_row, n_tokens, *pools):
        pk = jax.tree.map(lambda a: a[0], packed)
        x = x0.astype(jnp.float32)
        for l in range(L):
            o_part, pools = seg_a(l, x, cos, sin, page_row, n_tokens,
                                  pk, *pools)
            x = x + jax.lax.psum(o_part, MODEL_AXIS)
            m_part = seg_m(l, x, pk)
            x = x + jax.lax.psum(m_part, MODEL_AXIS)
        logits_pad = seg_lm(x, n_tokens, pk)
        return (logits_pad[:, :V_loc],) + tuple(pools)

    M = MODEL_AXIS
    pool_specs = [P(None, None, M), P(None, None, M)]
    if kv_quant:
        pool_specs += [P(None, M, None), P(None, M, None)]
    out_specs = (P(None, M),) + tuple(pool_specs)

    def fn(packed, x0, cos, sin, page_row, n_tokens, *pools):
        kw = {_ck: False}
        sm = _sm(local_fn, mesh=mesh,
                 in_specs=(jax.tree.map(lambda _: P(M), packed),
                           P(), P(), P(), P(), P(), *pool_specs),
                 out_specs=out_specs, **kw)
        return sm(packed, x0, cos, sin, page_row.astype(jnp.int32),
                  n_tokens.astype(jnp.int32), *pools)

    return fn
