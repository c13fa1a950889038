"""ChatGLM v1 (GLM block) parity vs a hand-written torch reference.

The upstream ChatGLM-6B v1 class needs trust_remote_code, so the oracle here
is an independent torch implementation of the v1 semantics (alpha-scaled
post-LN residuals, per-head fused QKV, 2-D rotary, prefix-LM mask, GELU
MLP) following modeling_chatglm.py v1. Reference converter: chatglm_v1.py."""

import math

import numpy as np
import pytest
import torch
import torch.nn.functional as F

from tests.test_model_parity import _run_prefill_decode

VOCAB, HID, INNER, LAYERS, HEADS = 128, 64, 128, 2, 4
D = HID // HEADS
EPS = 1e-5


def _make_v1_tensors(seed=0):
    g = torch.Generator().manual_seed(seed)

    def r(*shape, s=0.06):
        return torch.randn(*shape, generator=g) * s

    t = {
        "transformer.word_embeddings.weight": r(VOCAB, HID, s=0.02),
        "transformer.final_layernorm.weight": 1.0 + r(HID, s=0.02),
        "transformer.final_layernorm.bias": r(HID, s=0.02),
        "lm_head.weight": r(VOCAB, HID, s=0.02),
    }
    for i in range(LAYERS):
        b = f"transformer.layers.{i}"
        t[f"{b}.input_layernorm.weight"] = 1.0 + r(HID, s=0.02)
        t[f"{b}.input_layernorm.bias"] = r(HID, s=0.02)
        t[f"{b}.post_attention_layernorm.weight"] = 1.0 + r(HID, s=0.02)
        t[f"{b}.post_attention_layernorm.bias"] = r(HID, s=0.02)
        t[f"{b}.attention.query_key_value.weight"] = r(3 * HID, HID)
        t[f"{b}.attention.query_key_value.bias"] = r(3 * HID, s=0.02)
        t[f"{b}.attention.dense.weight"] = r(HID, HID)
        t[f"{b}.attention.dense.bias"] = r(HID, s=0.02)
        t[f"{b}.mlp.dense_h_to_4h.weight"] = r(INNER, HID)
        t[f"{b}.mlp.dense_h_to_4h.bias"] = r(INNER, s=0.02)
        t[f"{b}.mlp.dense_4h_to_h.weight"] = r(HID, INNER)
        t[f"{b}.mlp.dense_4h_to_h.bias"] = r(HID, s=0.02)
    return t


def _rope_half(x, pos):
    """x: [T, H, Dh]; standard rotate-half rope over Dh with pos [T]."""
    Dh = x.shape[-1]
    inv = 1.0 / (10000.0 ** (torch.arange(0, Dh, 2).float() / Dh))
    ang = pos.float()[:, None] * inv[None, :]          # [T, Dh/2]
    cos = torch.cat([ang.cos(), ang.cos()], -1)[:, None, :]
    sin = torch.cat([ang.sin(), ang.sin()], -1)[:, None, :]
    x1, x2 = x[..., :Dh // 2], x[..., Dh // 2:]
    rot = torch.cat([-x2, x1], -1)
    return x * cos + rot * sin


@torch.no_grad()
def _oracle_logits(t, ids, prompt_len):
    """Full-sequence forward (v1 semantics); ids: python list (prompt +
    generated), prompt_len: P. Returns logits [T, VOCAB] f32."""
    T = len(ids)
    P = prompt_len
    x = t["transformer.word_embeddings.weight"][torch.tensor(ids)]
    idx = torch.arange(T)
    ctx = P - 1
    pos1 = torch.where(idx < ctx, idx, torch.tensor(max(P - 2, 0)))
    pos2 = torch.where(idx < ctx, torch.zeros_like(idx), idx - ctx + 1)
    # prefix-LM mask: causal OR key < P-1
    mask = (idx[None, :] <= idx[:, None]) | (idx[None, :] < ctx)
    alpha = math.sqrt(2.0 * LAYERS)
    for i in range(LAYERS):
        b = f"transformer.layers.{i}"
        xin = F.layer_norm(x, (HID,), t[f"{b}.input_layernorm.weight"],
                           t[f"{b}.input_layernorm.bias"], EPS)
        qkv = xin @ t[f"{b}.attention.query_key_value.weight"].T + \
            t[f"{b}.attention.query_key_value.bias"]
        qkv = qkv.view(T, HEADS, 3, D)
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
        # 2-D rotary on halves
        q = torch.cat([_rope_half(q[..., :D // 2], pos1),
                       _rope_half(q[..., D // 2:], pos2)], -1)
        k = torch.cat([_rope_half(k[..., :D // 2], pos1),
                       _rope_half(k[..., D // 2:], pos2)], -1)
        scores = torch.einsum("thd,shd->hts", q, k) / math.sqrt(D)
        scores = scores.masked_fill(~mask[None], float("-inf"))
        probs = scores.float().softmax(-1)
        attn = torch.einsum("hts,shd->thd", probs, v.float()).reshape(T, HID)
        attn = attn @ t[f"{b}.attention.dense.weight"].T.float() + \
            t[f"{b}.attention.dense.bias"]
        x = xin * alpha + attn.to(x.dtype)
        x2 = F.layer_norm(x, (HID,),
                          t[f"{b}.post_attention_layernorm.weight"],
                          t[f"{b}.post_attention_layernorm.bias"], EPS)
        h = x2 @ t[f"{b}.mlp.dense_h_to_4h.weight"].T + \
            t[f"{b}.mlp.dense_h_to_4h.bias"]
        h = F.gelu(h, approximate="tanh")
        h = h @ t[f"{b}.mlp.dense_4h_to_h.weight"].T + \
            t[f"{b}.mlp.dense_4h_to_h.bias"]
        x = x2 * alpha + h
    x = F.layer_norm(x, (HID,), t["transformer.final_layernorm.weight"],
                     t["transformer.final_layernorm.bias"], EPS)
    return (x @ t["lm_head.weight"].T).float()


@pytest.fixture(scope="module")
def v1_setup():
    from dashinfer_tpu.models.registry import get_model_builder
    hf_cfg = {
        "architectures": ["ChatGLMModel"],
        "position_encoding_2d": True,
        "vocab_size": VOCAB, "hidden_size": HID,
        "inner_hidden_size": INNER, "num_layers": LAYERS,
        "num_attention_heads": HEADS, "layernorm_epsilon": EPS,
        "max_sequence_length": 1024,
    }
    config_fn, converter = get_model_builder("ChatGLMModel")()
    cfg = config_fn(hf_cfg)
    t = _make_v1_tensors()
    params = converter.convert(t, cfg, np.float32)
    return cfg, params, t


def test_chatglm_v1_config(v1_setup):
    cfg, _, _ = v1_setup
    assert cfg.arch == "chatglm_v1"
    assert cfg.rope_glm_2d and cfg.prefix_lm
    assert abs(cfg.glm_residual_alpha - math.sqrt(2.0 * LAYERS)) < 1e-9
    assert cfg.rotary_dim == D // 2


def test_chatglm_v1_prefill_and_decode_match_oracle(v1_setup):
    cfg, params, t = v1_setup
    rng = np.random.RandomState(1)
    ids = rng.randint(1, VOCAB, size=10).tolist()
    P = len(ids)

    prefill_logits, decode_logits, out_tokens = _run_prefill_decode(
        cfg, params, ids, 4)

    golden = _oracle_logits(t, ids, P).numpy()
    np.testing.assert_allclose(prefill_logits, golden[-1], rtol=2e-4,
                               atol=2e-4)
    # greedy continuation: feed our own sampled tokens to the oracle and
    # compare each decode step's logits
    seq = list(ids)
    for step, dl in enumerate(decode_logits):
        seq.append(out_tokens[step])
        golden = _oracle_logits(t, seq, P).numpy()
        np.testing.assert_allclose(dl, golden[-1], rtol=2e-4, atol=2e-4)
