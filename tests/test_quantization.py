"""Weight quantization tests: roundtrip accuracy, GPTQ ingestion, quantized
model parity (reference gates quantization on perplexity parity,
SURVEY.md §7 M3; here: logits stay close + argmax agreement on tiny model)."""

import numpy as np
import pytest


@pytest.mark.parametrize("bits,gs", [(8, -1), (8, 32), (4, 32), (4, 16)])
def test_quantize_weight_roundtrip(bits, gs):
    from dashinfer_tpu.loader.quantize import quantize_weight
    from dashinfer_tpu.ops.linear import dequantize_weight
    import jax.numpy as jnp

    rng = np.random.RandomState(0)
    w = rng.randn(64, 32).astype(np.float32)
    leaf = quantize_weight(w, bits, gs)
    w2 = np.asarray(dequantize_weight(
        {k: jnp.asarray(v) for k, v in leaf.items()}, jnp.float32))
    err = np.abs(w2 - w).max()
    rng_w = w.max() - w.min()
    tol = rng_w * (0.01 if bits == 8 else 0.1)
    assert err < tol, (err, tol)


def test_gptq_ingestion_matches_reference_dequant():
    """Pack a known uint4 matrix in AutoGPTQ layout and check our unpack."""
    from dashinfer_tpu.loader.quantize import gptq_to_leaf
    from dashinfer_tpu.ops.linear import dequantize_weight
    import jax.numpy as jnp

    rng = np.random.RandomState(1)
    K, N, gs = 64, 16, 32
    G = K // gs
    q = rng.randint(0, 16, size=(K, N)).astype(np.uint8)
    qz = rng.randint(0, 15, size=(G, N)).astype(np.uint8)
    scales = (rng.rand(G, N).astype(np.float32) * 0.1 + 0.01)

    # golden dequant per GPTQ semantics: w = scale * (q - (qz_stored + 1))
    w_gold = np.zeros((K, N), np.float32)
    for g in range(G):
        rows = slice(g * gs, (g + 1) * gs)
        w_gold[rows] = scales[g] * (q[rows].astype(np.float32) - (qz[g] + 1.0))

    # pack as AutoGPTQ int32 (8 nibbles per int32 along rows / cols)
    qweight = np.zeros((K // 8, N), np.uint32)
    for j in range(8):
        qweight |= q[j::8].astype(np.uint32) << (4 * j)
    qzeros = np.zeros((G, N // 8), np.uint32)
    for j in range(8):
        qzeros |= qz[:, j::8].astype(np.uint32) << (4 * j)

    leaf = gptq_to_leaf(qweight.astype(np.int32), qzeros.astype(np.int32),
                        scales, g_idx=np.repeat(np.arange(G), gs), bits=4)
    w2 = np.asarray(dequantize_weight(
        {k: jnp.asarray(v) for k, v in leaf.items()}, jnp.float32))
    np.testing.assert_allclose(w2, w_gold, rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("mode,gs", [("a16w8", -1), ("a16w8", 32),
                                     ("a16w4", 32)])
def test_quantized_model_close_to_fp(mode, gs):
    import tests.hf_util as hf_util
    from dashinfer_tpu.config import QuantConfig
    from dashinfer_tpu.loader import build_from_torch_model
    from dashinfer_tpu.loader.quantize import quantize_params
    from tests.test_model_parity import _run_prefill_decode

    hf_cfg = hf_util.tiny_qwen2_config(hidden=64, inter=128)
    model = hf_util.make_torch_model(hf_cfg)
    cfg, params = build_from_torch_model(model, hf_cfg.to_dict(), "float32")

    rng = np.random.RandomState(3)
    ids = rng.randint(1, hf_cfg.vocab_size, size=10).tolist()
    fp_logits, _, fp_toks = _run_prefill_decode(cfg, params, ids, 4)

    qparams = quantize_params(params, QuantConfig(mode=mode, group_size=gs))
    q_logits, _, q_toks = _run_prefill_decode(cfg, qparams, ids, 4)

    # quantization noise is bounded; distribution shape preserved
    corr = np.corrcoef(fp_logits, q_logits)[0, 1]
    assert corr > (0.999 if mode == "a16w8" else 0.99), corr


def test_fused_gemv_kernel_interpret_matches_dequant():
    """quant_matmul pallas kernel (interpret) vs dequant reference."""
    import jax.numpy as jnp
    from dashinfer_tpu.loader.quantize import quantize_weight
    from dashinfer_tpu.ops.linear import dequantize_weight
    from dashinfer_tpu.ops.pallas.quant_matmul import quant_matmul

    rng = np.random.RandomState(4)
    K, N, gs = 512, 256, 256
    for bits in (8, 4):
        w = rng.randn(K, N).astype(np.float32) * 0.1
        leaf = {k: jnp.asarray(v)
                for k, v in quantize_weight(w, bits, gs).items()}
        x = jnp.asarray(rng.randn(2, K).astype(np.float32) * 0.5)
        want = np.asarray(x) @ np.asarray(dequantize_weight(leaf, jnp.float32))
        got = np.asarray(quant_matmul(x.astype(jnp.bfloat16), leaf,
                                      jnp.float32))
        rel = np.abs(got - want).max() / (np.abs(want).max() + 1e-6)
        assert rel < 0.02, (bits, rel)


@pytest.mark.parametrize("mode", ["a8w8", "fp8a8w8"])
def test_activation_quant_linear_close_to_fp(mode):
    """A8W8 / FP8A8W8 path (reference GemmA8W8 / GemmFP8A8W8, SURVEY.md
    §2.11): symmetric per-channel weights + dynamic per-token activations."""
    import jax.numpy as jnp
    from dashinfer_tpu.loader.quantize import quantize_weight_symmetric
    from dashinfer_tpu.ops.linear import linear

    rng = np.random.RandomState(0)
    K, N, T = 256, 128, 8
    w = rng.randn(K, N).astype(np.float32) * 0.05
    x = rng.randn(T, K).astype(np.float32)
    leaf = {k: jnp.asarray(v)
            for k, v in quantize_weight_symmetric(
                w, fp8=mode == "fp8a8w8").items()}
    got = np.asarray(linear(jnp.asarray(x), leaf, out_dtype=jnp.float32))
    want = x @ w
    denom = np.abs(want).max() + 1e-6
    rel = np.abs(got - want).max() / denom
    assert rel < (0.02 if mode == "a8w8" else 0.06), rel


def test_a8w8_e2e_close_to_fp():
    """End-to-end decode path with a8w8-quantized weights stays close to the
    fp32 model (reference accuracy gate, SURVEY.md §7 M3)."""
    import tests.hf_util as hf_util
    from dashinfer_tpu.config import QuantConfig
    from dashinfer_tpu.loader import build_from_torch_model
    from dashinfer_tpu.loader.quantize import quantize_params
    from tests.test_model_parity import _run_prefill_decode

    hf_cfg = hf_util.tiny_qwen2_config(hidden=64, inter=128)
    model = hf_util.make_torch_model(hf_cfg)
    cfg, params = build_from_torch_model(model, hf_cfg.to_dict(), "float32")
    rng = np.random.RandomState(3)
    ids = rng.randint(1, hf_cfg.vocab_size, size=10).tolist()
    fp_logits, _, _ = _run_prefill_decode(cfg, params, ids, 4)
    qparams = quantize_params(params, QuantConfig(mode="a8w8"))
    q_logits, _, _ = _run_prefill_decode(cfg, qparams, ids, 4)
    corr = np.corrcoef(fp_logits, q_logits)[0, 1]
    assert corr > 0.999, corr


def test_moe_expert_quantization_close_to_fp():
    """4-D expert stacks quantize per-(layer, expert) and the MoE block
    consumes the quantized leaves (reference MOEA8W8 quantizes experts
    per-matrix, moe_op_a8w8_gpu.cpp)."""
    import tests.hf_util as hf_util
    from dashinfer_tpu.config import QuantConfig
    from dashinfer_tpu.loader import build_from_torch_model
    from dashinfer_tpu.loader.quantize import quantize_params
    from tests.test_model_parity import _run_prefill_decode

    hf_cfg = hf_util.tiny_qwen2_moe_config()
    model = hf_util.make_torch_model(hf_cfg)
    cfg, params = build_from_torch_model(model, hf_cfg.to_dict(), "float32")
    rng = np.random.RandomState(4)
    ids = rng.randint(1, hf_cfg.vocab_size, size=10).tolist()
    fp_logits, _, _ = _run_prefill_decode(cfg, params, ids, 4)

    qparams = quantize_params(params, QuantConfig(mode="a16w8",
                                                  group_size=-1))
    ex = qparams["layers"]["experts"]["gate_proj"]
    assert isinstance(ex, dict) and ex["w_q"].ndim == 4
    # shared expert (3-D stack) quantized too
    assert "w_q" in qparams["layers"]["shared_expert"]["gate_proj"]
    q_logits, _, _ = _run_prefill_decode(cfg, qparams, ids, 4)
    corr = np.corrcoef(fp_logits, q_logits)[0, 1]
    assert corr > 0.999, corr
