"""Grouped (expert-batched) fused-dequant matmul for MoE layers.

Re-design of the reference's MoE dispatch (csrc/core/operator/general/moe/
moe_op.cpp:104-117 token routing/reorder + HIE-DNN batch GEMM,
kernel/cuda/moe/moe_dnn.cu) for TPU: tokens are sorted by expert id and the
per-expert segments are padded up to the kernel's M-tile so that EVERY
M-tile belongs to exactly one expert (megablocks-style boundary padding).
A scalar-prefetch `tile_expert` map then selects the expert's quantized
weight block per tile inside a plain static Pallas grid — no dynamic
shapes, no per-expert unrolling, so Mosaic compiles in seconds where the
dense-all-experts stream program took tens of minutes at large buckets.

The matmul itself is the same affine-after-dot fused dequant as
ops/pallas/quant_matmul.py (SURVEY.md §8.2 gemm_lowp regime): the MXU dot
runs on the raw int payload and the per-group (scale, zero) affine is
applied on the [TM, NT] accumulator, so the int8/uint4 weight is the only
full-size HBM read.

Weight layouts accepted (see ops/u4pack.py):
* int8: [E, K, N] with N % 128 == 0 — consumed directly.
* uint4 with N % 256 == 0: TILE-128 halves packing [E, K, N/2] — directly.
* uint4 with N % 256 != 0 (plain-halves loader layout, e.g. Qwen1.5-MoE's
  moe_intermediate_size=1408): `prepare_grouped_experts` repacks the stack
  once at install into zero-padded TILE-128 layout (extra keys "w_qg"/
  "scale_g"/"zero_g" on the leaf; the raw leaf stays untouched for the
  XLA fallback and the decode megakernel). The reference likewise reorders
  weights at load into its kernels' preferred layout (gemm_a16w8_gpu.h:
  30-44).
"""

import functools
import os
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

import numpy as np


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def default_tm() -> int:
    """M tile: small enough that per-expert boundary padding stays cheap
    (E * TM/2 dummy rows on average), big enough for MXU row utilization."""
    return int(os.environ.get("DI_GQM_TM", "64"))


# ---------------------------------------------------------------------------
# host-side one-time repack (uint4, N % 256 != 0)
# ---------------------------------------------------------------------------

def _needs_repack(w_q, N: int) -> bool:
    return w_q.dtype == np.uint8 and N % 256 != 0


def repack_expert_u4_tile128(leaf: Dict, N: int) -> Dict:
    """leaf arrays [L, E, K, N/2] plain-halves u4 + [L, E, G, N] qparams ->
    zero-padded TILE-128 arrays under new keys (numpy, one-time)."""
    w_q = np.asarray(leaf["w_q"])
    L, E, K, half = w_q.shape
    assert half * 2 == N, (w_q.shape, N)
    Np = _round_up(N, 256)
    # plain halves: byte j = col j (lo) | col j + N/2 (hi)
    lo = (w_q & np.uint8(0xF)).reshape(L * E * K, half)
    hi = (w_q >> np.uint8(4)).reshape(L * E * K, half)
    q = np.zeros((L * E * K, Np), np.uint8)
    q[:, :half] = lo
    q[:, half:N] = hi
    del lo, hi
    # TILE-128 repack: within each 256-col tile, byte j = col j | col j+128
    t = q.reshape(-1, Np // 256, 2, 128)
    w_qg = (t[:, :, 0] | (t[:, :, 1] << np.uint8(4))) \
        .reshape(L, E, K, Np // 2)
    del q, t
    scale = np.asarray(leaf["scale"], np.float32)
    zero = np.asarray(leaf["zero"], np.float32)
    G = scale.shape[2]
    scale_g = np.ones((L, E, G, Np), np.float32)
    zero_g = np.zeros((L, E, G, Np), np.float32)
    scale_g[..., :N] = scale
    zero_g[..., :N] = zero
    return {"w_qg": w_qg, "scale_g": scale_g, "zero_g": zero_g}


def prepare_grouped_experts(params: Dict, cfg) -> Dict:
    """One-time install step: where the loader's u4 expert layout is not
    kernel-tileable, attach the repacked TILE-128 stack to the leaf. Works
    on the numpy/pre-device params tree; no-op otherwise."""
    if cfg.moe is None:
        return params
    lp = params.get("layers", {})
    ex = lp.get("experts")
    if not isinstance(ex, dict):
        return params
    dims = {"gate_proj": cfg.moe.moe_intermediate_size,
            "up_proj": cfg.moe.moe_intermediate_size,
            "down_proj": cfg.hidden_size}
    for name, N in dims.items():
        leaf = ex.get(name)
        if (isinstance(leaf, dict) and "w_q" in leaf and "w_qg" not in leaf
                and _needs_repack(np.asarray(leaf["w_q"]), N)):
            leaf.update(repack_expert_u4_tile128(leaf, N))
    return params


# ---------------------------------------------------------------------------
# group layout (token sort + boundary padding) — jit-traceable
# ---------------------------------------------------------------------------

def build_group_layout(topk_i: jnp.ndarray, E: int, TM: int):
    """topk_i: [T, k] expert ids. Returns (order [T*k], sorted_token [T*k],
    pos [T*k], tile_expert [Mcap/TM]) where pos places each sorted (token,
    expert) row into the boundary-padded buffer of static size Mcap =
    rup(T*k, TM) + E*TM, such that every TM-row tile holds rows of exactly
    one expert."""
    T, k = topk_i.shape
    M0 = T * k
    flat_e = topk_i.reshape(-1).astype(jnp.int32)
    flat_token = jnp.repeat(jnp.arange(T, dtype=jnp.int32), k)
    order = jnp.argsort(flat_e, stable=True)
    sorted_e = flat_e[order]
    sorted_token = flat_token[order]
    sizes = jnp.zeros((E,), jnp.int32).at[flat_e].add(1)
    psizes = ((sizes + TM - 1) // TM) * TM
    pstarts = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32), jnp.cumsum(psizes)[:-1]])
    starts = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32), jnp.cumsum(sizes)[:-1]])
    pos = pstarts[sorted_e] + (jnp.arange(M0, dtype=jnp.int32)
                               - starts[sorted_e])
    Mcap = _round_up(M0, TM) + E * TM
    t_base = jnp.arange(Mcap // TM, dtype=jnp.int32) * TM
    # tiles beyond the padded total clamp to the last expert; their rows are
    # zero and never gathered back
    tile_expert = jnp.clip(
        jnp.searchsorted(pstarts, t_base, side="right") - 1, 0, E - 1
    ).astype(jnp.int32)
    return order, sorted_token, pos, tile_expert


# ---------------------------------------------------------------------------
# the kernel
# ---------------------------------------------------------------------------

def _gkernel(te_ref, x_ref, w_ref, scale_ref, zero_ref, o_ref, acc_ref,
             *, bits: int, kt: int, gs: int):
    k_idx = pl.program_id(2)
    nk = pl.num_programs(2)

    @pl.when(k_idx == 0)
    def _init():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    x = x_ref[:].astype(jnp.float32)                       # [TM, KT]
    xb = x.astype(jnp.bfloat16)
    if bits == 4:
        p32 = w_ref[0].astype(jnp.int32)                   # [KT, NT/2]
        lo = (p32 & 0xF).astype(jnp.bfloat16)
        hi = ((p32 >> 4) & 0xF).astype(jnp.bfloat16)
        q = jnp.concatenate([lo, hi], axis=-1)             # [KT, NT]
    else:
        q = w_ref[0].astype(jnp.bfloat16)                  # int8 exact
    part = jax.lax.dot_general(
        xb, q, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)                # [TM, NT]
    g_idx = (k_idx * kt) // gs
    scale = scale_ref[0, pl.ds(g_idx, 1), :]               # [1, NT]
    zero = zero_ref[0, pl.ds(g_idx, 1), :]
    xsum = jnp.sum(x, axis=1, keepdims=True)               # [TM, 1]
    acc_ref[:] = acc_ref[:] + part * scale + xsum * zero

    @pl.when(k_idx == nk - 1)
    def _flush():
        o_ref[:] = acc_ref[:].astype(o_ref.dtype)


def _leaf_geometry(leaf: Dict) -> Tuple[int, int, int, int]:
    """-> (bits, K, N, gs) of a per-layer grouped leaf [E, K, ...]."""
    w_q, scale = leaf["w_q"], leaf["scale"]
    bits = 8 if w_q.dtype == jnp.int8 else 4
    K = w_q.shape[1]
    N = scale.shape[-1]
    G = scale.shape[1]
    gs = K if G == 1 else K // G
    return bits, K, N, gs


def supports_grouped(leaf: Dict) -> bool:
    """Per-layer leaf [E, K, ...]: can the kernel consume this layout?"""
    if not isinstance(leaf, dict) or "w_q" not in leaf:
        return False
    bits, K, N, gs = _leaf_geometry(leaf)
    kt = min(gs, 512)
    if K % kt or gs % kt:
        return False
    if bits == 4:
        return N % 256 == 0
    return N % 128 == 0


def grouped_quant_matmul(xs: jnp.ndarray, tile_expert: jnp.ndarray,
                         leaf: Dict, out_dtype=jnp.bfloat16,
                         interpret: Optional[bool] = None) -> jnp.ndarray:
    """xs: [Mcap, K] boundary-padded sorted tokens (Mcap % TM == 0, every
    TM tile single-expert); tile_expert: [Mcap/TM] int32; leaf: per-layer
    quantized expert stack {"w_q" [E, K, N(/2)], "scale"/"zero" [E, G, N]}.
    Returns [Mcap, N]."""
    Mcap, K = xs.shape
    nt_tiles = tile_expert.shape[0]
    TM = Mcap // nt_tiles
    bits, Kw, N, gs = _leaf_geometry(leaf)
    assert Kw == K, (Kw, K)
    NT = 256 if bits == 4 else 128
    wNT = 128 if bits == 4 else NT
    KT = min(gs, 512)
    grid = (nt_tiles, N // NT, K // KT)
    G = leaf["scale"].shape[1]
    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=grid,
        in_specs=[
            pl.BlockSpec((TM, KT), lambda m, n, k, te: (m, k)),
            pl.BlockSpec((1, KT, wNT), lambda m, n, k, te: (te[m], k, n)),
            pl.BlockSpec((1, G, NT), lambda m, n, k, te: (te[m], 0, n)),
            pl.BlockSpec((1, G, NT), lambda m, n, k, te: (te[m], 0, n)),
        ],
        out_specs=pl.BlockSpec((TM, NT), lambda m, n, k, te: (m, n)),
        scratch_shapes=[pltpu.VMEM((TM, NT), jnp.float32)],
    )
    out = pl.pallas_call(
        functools.partial(_gkernel, bits=bits, kt=KT, gs=gs),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((Mcap, N), out_dtype),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * Mcap * K * N,
            bytes_accessed=Mcap * K * 2 + Mcap * N * 2
            + min(Mcap // TM, leaf["w_q"].shape[0]) * K * N * bits // 8,
            transcendentals=0),
    )(tile_expert, xs, leaf["w_q"], leaf["scale"], leaf["zero"])
    return out
