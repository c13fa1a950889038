"""uint4 packing conventions (Mosaic-friendly).

The naive interleave (element 2j in low nibble, 2j+1 high) needs an
interleaving reshape on the minor dim that Mosaic cannot lower. Instead:

* KV pages pack HALVES of head_dim: byte j holds dim j (low nibble) and
  dim j + D/2 (high nibble). The attention kernel then computes the QK dot
  as two MXU dots over the D/2 halves — no unpack reshape at all.

* Weights pack TILE-128 halves along the out dim when out % 256 == 0: within
  each 256-col tile t, byte j holds col 256t+j (low) and col 256t+128+j
  (high) — so one [KT, 128] weight block unpacks to one [KT, 256] kernel
  tile with two aligned slices. (The reference likewise reorders weights at
  load into its kernel's preferred N32_K16 layout, gemm_a16w8_gpu.h:30-44.)
  For out % 256 != 0 (tiny test models) the layout degrades to plain halves
  across the full out dim; the fused kernel then declines and the XLA
  dequant-into-MXU path is used.

Both layouts are deterministic functions of the array shape, so the
quantizer and every consumer agree without metadata.
"""

import numpy as np


def pack_u4_kv(q):
    """q: [..., D] uint4 values -> [..., D/2] uint8, halves packing."""
    D = q.shape[-1]
    lo = q[..., :D // 2]
    hi = q[..., D // 2:]
    return (lo | (hi << 4)).astype(q.dtype if hasattr(q, "dtype") else None)


def weight_uses_tile128(n_out: int) -> bool:
    return n_out % 256 == 0


def pack_u4_weight(q: np.ndarray) -> np.ndarray:
    """q: [K, N] uint4 values (uint8 storage) -> [K, N/2] uint8."""
    K, N = q.shape
    if weight_uses_tile128(N):
        t = q.reshape(K, N // 256, 2, 128)  # [K, T, lo/hi, 128]
        return (t[:, :, 0] | (t[:, :, 1] << 4)).reshape(K, N // 2)
    lo = q[:, :N // 2]
    hi = q[:, N // 2:]
    return (lo | (hi << 4)).astype(np.uint8)


def unpack_u4_weight_np_like(packed, xp):
    """packed: [K, N/2] -> [K, N] int levels using module xp (np or jnp).

    With numpy the unpack stays in uint8 end to end (int32 temporaries
    quadruple the memory traffic and dominated megakernel pack time)."""
    K, half = packed.shape
    N = half * 2
    if xp is np:
        p = np.ascontiguousarray(packed)
        lo = p & np.uint8(0xF)
        hi = p >> np.uint8(4)
    else:
        p32 = packed.astype(xp.int32)
        lo = p32 & 0xF
        hi = (p32 >> 4) & 0xF
    if weight_uses_tile128(N):
        lo_t = lo.reshape(K, N // 256, 128)
        hi_t = hi.reshape(K, N // 256, 128)
        out = xp.concatenate([lo_t, hi_t], axis=-1)   # [K, T, 256]
        return out.reshape(K, N)
    return xp.concatenate([lo, hi], axis=-1)
