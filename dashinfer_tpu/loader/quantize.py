"""Weight quantization at load time.

InstantQuant (reference: tuning-free weight-only quantization,
python/pyhie/allspark/quantization.py:13-80 + model/quantization_utils.py):
asymmetric scale+zero, per-channel or group-wise ("SubChannel", GroupSize
64-512), INT8 or UINT4 (SURVEY.md §8.11: weight-only IQ is asymmetric;
8-bit int8, 4-bit uint4).

Quantized leaf format (consumed by ops/linear.py + the fused GEMV kernel):
  {"w_q": [*, in, out] int8 | [*, in, out/2] uint8 packed,
   "scale"/"zero": [*, groups, out] f32}     (bits inferred from dtype)
Per-channel = groups 1. Dequant: w = q * scale + zero.
"""

import re
from typing import Dict, Tuple

import numpy as np

from dashinfer_tpu.config import QuantConfig
from dashinfer_tpu.utils import get_logger

logger = get_logger("quantize")


def quantize_weight(w: np.ndarray, bits: int, group_size: int) -> Dict:
    """w: [in, out] float -> quantized leaf (numpy)."""
    K, N = w.shape
    gs = K if group_size <= 0 else group_size
    assert K % gs == 0, f"in dim {K} not divisible by group size {gs}"
    G = K // gs
    wf = np.asarray(w, np.float32).reshape(G, gs, N)
    wmin = wf.min(axis=1)                      # [G, N]
    wmax = wf.max(axis=1)
    if bits == 8:
        scale = np.maximum((wmax - wmin) / 255.0, 1e-8)
        q = np.clip(np.rint((wf - wmin[:, None]) / scale[:, None]) - 128,
                    -128, 127).astype(np.int8)
        zero = wmin + 128.0 * scale
        w_q = q.reshape(K, N)
    elif bits == 4:
        from dashinfer_tpu.ops.u4pack import pack_u4_weight
        scale = np.maximum((wmax - wmin) / 15.0, 1e-8)
        q = np.clip(np.rint((wf - wmin[:, None]) / scale[:, None]),
                    0, 15).astype(np.uint8).reshape(K, N)
        w_q = pack_u4_weight(q)
        zero = wmin
    else:
        raise ValueError(bits)
    return {"w_q": w_q, "scale": scale.astype(np.float32),
            "zero": zero.astype(np.float32)}


def _quantize_stacked(w: np.ndarray, bits: int, gs: int) -> Dict:
    """w: [L, in, out] -> leaves stacked over L."""
    outs = [quantize_weight(w[l], bits, gs) for l in range(w.shape[0])]
    return {
        "w_q": np.stack([o["w_q"] for o in outs]),
        "scale": np.stack([o["scale"] for o in outs]),
        "zero": np.stack([o["zero"] for o in outs]),
    }


def quantize_weight_symmetric(w: np.ndarray, fp8: bool = False) -> Dict:
    """Symmetric per-channel weights for activation-quant GEMMs (reference
    A8W8 / FP8A8W8 semantics: symmetric, per-channel only — SURVEY.md §8.11).
    w: [in, out] -> {"w_q8"| "w_f8", "wscale" [1, out]}."""
    wf = np.asarray(w, np.float32)
    amax = np.abs(wf).max(axis=0, keepdims=True)             # [1, N]
    if fp8:
        try:
            import ml_dtypes
            f8 = np.dtype(ml_dtypes.float8_e4m3fn)
        except Exception as e:  # pragma: no cover
            raise RuntimeError("fp8 dtype unavailable") from e
        scale = np.maximum(amax / 448.0, 1e-8)
        return {"w_f8": (wf / scale).astype(f8),
                "wscale": scale.astype(np.float32)}
    scale = np.maximum(amax / 127.0, 1e-8)
    q = np.clip(np.rint(wf / scale), -127, 127).astype(np.int8)
    return {"w_q8": q, "wscale": scale.astype(np.float32)}


def quantize_params(params: Dict, quant: QuantConfig) -> Dict:
    """Walk the params tree; quantize layer linear weights matching the
    include regex (reference quantize_op rewrite Gemm->GemmA16W8,
    qwen_v15.py:393-395 + GroupSettings regex per-layer)."""
    if quant.mode in ("none", ""):
        return params
    act_quant = quant.mode in ("a8w8", "fp8a8w8")
    bits = {"a16w8": 8, "a16w4": 4, "a8w8": 8, "fp8a8w8": 8}[quant.mode]
    pattern = re.compile(quant.include)
    n_q = 0

    def quantize_stack(w):
        if not act_quant:
            return _quantize_stacked(w, bits, quant.group_size)
        outs = [quantize_weight_symmetric(w[l], fp8=quant.mode == "fp8a8w8")
                for l in range(w.shape[0])]
        return {k: np.stack([o[k] for o in outs]) for k in outs[0]}

    def walk(tree, path=""):
        nonlocal n_q
        if isinstance(tree, dict):
            if "w" in tree and not isinstance(tree["w"], dict):
                if pattern.match(path) and tree["w"].ndim == 3:
                    w = np.asarray(tree["w"], np.float32)
                    out = quantize_stack(w)
                    if "b" in tree:
                        out["b"] = tree["b"]
                    n_q += 1
                    return out
                return tree
            return {k: walk(v, f"{path}{k}/" if path or True else k)
                    for k, v in tree.items()}
        if (getattr(tree, "ndim", 0) == 4 and pattern.match(path)
                and not act_quant):
            # stacked MoE expert weights [L, E, in, out] -> per-(layer,
            # expert) weight-only quant (reference MOEA8W8 quantizes experts
            # the same per-matrix way, moe_op_a8w8_gpu.cpp)
            w = np.asarray(tree, np.float32)
            L, E = w.shape[:2]
            out = _quantize_stacked(w.reshape(L * E, *w.shape[2:]), bits,
                                    quant.group_size)
            n_q += 1
            return {k: v.reshape((L, E) + v.shape[1:])
                    for k, v in out.items()}
        return tree

    out = walk(params)
    logger.info("quantized %d weight stacks to %s (group_size=%d)", n_q,
                quant.mode, quant.group_size)
    return out


# ---------------------------------------------------------------------------
# GPTQ checkpoint ingestion (reference quant/gptq_iq_adapter.py; group-wise
# UINT4/INT8 from HF quantization_config; desc_act unsupported, like the
# reference's SubChannel restriction, quantization.py:20-45)
# ---------------------------------------------------------------------------

def gptq_to_leaf(qweight: np.ndarray, qzeros: np.ndarray, scales: np.ndarray,
                 g_idx: np.ndarray = None, bits: int = 4) -> Dict:
    """Convert AutoGPTQ tensors to our leaf format.

    qweight: [in/(32/bits), out] int32 packed along IN; qzeros:
    [groups, out/(32/bits)] int32; scales: [groups, out] f16/f32.
    GPTQ semantics: w = scale * (q - (qz + 1))   [AutoGPTQ stores qz-1]
    => our form: w = q * scale + zero with zero = -scale * (qz + 1).
    """
    pack = 32 // bits
    K = qweight.shape[0] * pack
    N = qweight.shape[1]
    if g_idx is not None:
        expected = np.repeat(np.arange(K // _gptq_gs(scales, K)),
                             _gptq_gs(scales, K))
        if not np.array_equal(np.asarray(g_idx), expected):
            raise NotImplementedError(
                "GPTQ desc_act (permuted g_idx) unsupported "
                "(reference has the same restriction)")
    mask = (1 << bits) - 1
    qw = np.asarray(qweight, np.uint32)
    q = np.zeros((K, N), np.uint8)
    for j in range(pack):
        q[j::pack] = ((qw >> (bits * j)) & mask).astype(np.uint8)

    qz_packed = np.asarray(qzeros, np.uint32)
    G = qz_packed.shape[0]
    qz = np.zeros((G, N), np.uint8)
    for j in range(pack):
        qz[:, j::pack] = ((qz_packed >> (bits * j)) & mask).astype(np.uint8)

    scale = np.asarray(scales, np.float32)
    zero = -scale * (qz.astype(np.float32) + 1.0)

    if bits == 4:
        from dashinfer_tpu.ops.u4pack import pack_u4_weight
        w_q = pack_u4_weight(q)
        # zero/scale stay [G, N]
        return {"w_q": w_q, "scale": scale, "zero": zero}
    return {"w_q": (q.astype(np.int16) - 128).astype(np.int8),
            "scale": scale, "zero": zero + 128.0 * scale}


def _gptq_gs(scales: np.ndarray, K: int) -> int:
    return K // scales.shape[0]
