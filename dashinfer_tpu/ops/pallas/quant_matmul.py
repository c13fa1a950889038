"""Fused dequant matmul / GEMV Pallas kernels (A16W8 / A16W4).

Re-design of the reference's gemm_lowp regime split (SURVEY.md §8.2,
csrc/core/kernel/cuda/gemm_lowp 12k LoC): small-M decode matmuls must run at
HBM speed-of-light with the int8/uint4 weight as the only full-size HBM read
— never materialize the bf16 weight. Large-M (prefill) takes the
dequant-into-MXU path in ops/linear.py (XLA fuses the affine into the
operand read).

Math (asymmetric, w = q * scale_g + zero_g per group g of input rows):
    out[m, n] = sum_g scale[g,n] * (x_g @ q_g)[m,n] + xsum[m,g] * zero[g,n]
so the MXU dot runs on the raw int payload cast to bf16 and the per-group
affine is applied on the [M, NT] accumulator tile — the same
affine-after-dot trick as the paged-attention kernel.

Grid: (N tiles, K tiles), K innermost so the weight streams HBM->VMEM once;
the f32 accumulator lives in VMEM scratch and is flushed at the last K step.
"""

import functools
from typing import Dict

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_MAX_FUSED_M = 32   # above this, dequant-into-MXU wins (prefill regime)


def use_fused_gemv(m: int, wd: Dict) -> bool:
    if jax.default_backend() != "tpu":
        return False
    if m > _MAX_FUSED_M:
        return False
    k = wd["w_q"].shape[-2]
    n_eff = wd["scale"].shape[-1]
    groups = wd["scale"].shape[-2]
    gs = k // groups
    # kernel constraints: K tile must divide gs; N must be 256-tileable
    kt = min(gs, 512)
    return k % kt == 0 and gs % kt == 0 and n_eff % 256 == 0


def _kernel(x_ref, w_ref, scale_ref, zero_ref, o_ref, acc_ref,
            *, bits: int, kt: int, gs: int):
    k_idx = pl.program_id(1)
    nk = pl.num_programs(1)

    @pl.when(k_idx == 0)
    def _init():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    x = x_ref[:].astype(jnp.float32)                       # [M, KT]
    xb = x.astype(jnp.bfloat16)
    if bits == 4:
        # TILE-128 halves packing (ops/u4pack.py): the [KT, 128] block holds
        # cols [0,128) in low nibbles and [128, 256) in high nibbles of the
        # current 256-col tile -> concat gives the ordered [KT, 256] tile.
        p32 = w_ref[:].astype(jnp.int32)
        lo = (p32 & 0xF).astype(jnp.bfloat16)
        hi = ((p32 >> 4) & 0xF).astype(jnp.bfloat16)
        q = jnp.concatenate([lo, hi], axis=-1)             # [KT, NT]
    else:
        q = w_ref[:].astype(jnp.int32).astype(jnp.bfloat16)
    part = jax.lax.dot_general(
        xb, q, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)                # [M, NT]
    g_idx = (k_idx * kt) // gs
    scale = scale_ref[pl.ds(g_idx, 1), :]                  # [1, NT]
    zero = zero_ref[pl.ds(g_idx, 1), :]
    xsum = jnp.sum(x, axis=1, keepdims=True)               # [M, 1]
    acc_ref[:] = acc_ref[:] + part * scale + xsum * zero

    @pl.when(k_idx == nk - 1)
    def _flush():
        o_ref[:] = acc_ref[:].astype(o_ref.dtype)


def quant_matmul(x: jnp.ndarray, wd: Dict, out_dtype=jnp.bfloat16
                 ) -> jnp.ndarray:
    """x: [..., K] bf16/f32; wd: quantized weight leaf. Returns [..., N]."""
    orig_shape = x.shape[:-1]
    K = x.shape[-1]
    x2 = x.reshape(-1, K)
    M = x2.shape[0]

    w_q, scale, zero = wd["w_q"], wd["scale"], wd["zero"]
    bits = 8 if w_q.dtype == jnp.int8 else 4
    N = scale.shape[-1]
    groups = scale.shape[-2]
    gs = K // groups

    NT = 256                     # u4 tile-128 packing fixes the tile at 256
    KT = min(gs, 512)
    n_tiles = N // NT
    k_tiles = K // KT

    # pad M to the f32 sublane tile
    Mp = max(8, -(-M // 8) * 8)
    if Mp != M:
        x2 = jnp.pad(x2, ((0, Mp - M), (0, 0)))

    w_lastdim = w_q.shape[-1]  # N or N//2 (packed u4)
    wNT = NT if bits == 8 else NT // 2

    out = pl.pallas_call(
        functools.partial(_kernel, bits=bits, kt=KT, gs=gs),
        grid=(n_tiles, k_tiles),
        in_specs=[
            pl.BlockSpec((Mp, KT), lambda n, k: (0, k),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((KT, wNT), lambda n, k: (k, n),
                         memory_space=pltpu.VMEM),
            # full group dim per N tile (Mosaic needs dim -2 full or 8-
            # divisible); the kernel selects its group row dynamically
            pl.BlockSpec((groups, NT), lambda n, k: (0, n),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((groups, NT), lambda n, k: (0, n),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((Mp, NT), lambda n, k: (0, n),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Mp, N), out_dtype),
        scratch_shapes=[pltpu.VMEM((Mp, NT), jnp.float32)],
        interpret=jax.default_backend() != "tpu",
        cost_estimate=pl.CostEstimate(
            flops=2 * Mp * K * N,
            bytes_accessed=K * N * bits // 8 + Mp * K * 2,
            transcendentals=0),
    )(x2, w_q, scale, zero)

    return out[:M].reshape(*orig_shape, N)
