"""ChatGLM1/2/3/GLM-4 (reference converters chatglm_v1-v4; registry
csrc/core/model/chatglm/chatglm.cpp:24-27).

v2+: MQA/GQA with fused query_key_value, rotary over head_dim/2 with
interleaved pairs, SwiGLU with fused dense_h_to_4h. v1 (detected via config
`position_encoding_2d`): GLM block with alpha-scaled post-LN residuals,
2-D rotary, prefix-LM attention, GELU MLP, LayerNorm with bias, per-head
interleaved fused QKV. Conversion splits the fused tensors into the generic
layout. (No offline golden test possible — ChatGLM HF repos need remote
code; v1 is validated against a hand-written torch reference in
tests/test_chatglm_v1.py, v2+ structurally.)"""

import math
from typing import Dict

import numpy as np

from dashinfer_tpu.config import Activation, ModelConfig
from dashinfer_tpu.models.common import _cast, _to_np, stack_layer_trees
from dashinfer_tpu.models.registry import register_model


def _model_config_v1(hf: dict) -> ModelConfig:
    hidden = hf["hidden_size"]
    heads = hf["num_attention_heads"]
    layers = hf["num_layers"]
    return ModelConfig(
        arch="chatglm_v1",
        vocab_size=hf["vocab_size"],
        hidden_size=hidden,
        intermediate_size=hf.get("inner_hidden_size", 4 * hidden),
        num_layers=layers,
        num_heads=heads,
        num_kv_heads=heads,
        head_dim=hidden // heads,
        rms_norm_eps=hf.get("layernorm_epsilon", 1e-5),
        rope_theta=10000.0,
        max_position_embeddings=hf.get("max_sequence_length", 2048),
        activation=Activation.GELU_TANH,
        rotary_dim=(hidden // heads) // 2,
        qkv_bias=True,
        tie_word_embeddings=False,
        glm_residual_alpha=math.sqrt(2.0 * layers),
        rope_glm_2d=True,
        prefix_lm=True,
    )


def _model_config(hf: dict) -> ModelConfig:
    if hf.get("position_encoding_2d"):
        return _model_config_v1(hf)
    hidden = hf["hidden_size"]
    heads = hf["num_attention_heads"]
    kv = hf.get("multi_query_group_num", heads) if hf.get(
        "multi_query_attention", False) else heads
    return ModelConfig(
        arch="chatglm",
        vocab_size=hf.get("padded_vocab_size", hf.get("vocab_size")),
        hidden_size=hidden,
        intermediate_size=hf["ffn_hidden_size"],
        num_layers=hf["num_layers"],
        num_heads=heads,
        num_kv_heads=kv,
        head_dim=hf.get("kv_channels", hidden // heads),
        rms_norm_eps=hf.get("layernorm_epsilon", 1e-5),
        rope_theta=10000.0 * hf.get("rope_ratio", 1.0),
        max_position_embeddings=hf.get("seq_length", 32768),
        rotary_dim=hf.get("kv_channels", hidden // heads) // 2,
        rope_interleaved=True,
        qkv_bias=hf.get("add_qkv_bias", False),
        tie_word_embeddings=False,
    )


class _ChatGLMV1Converter:
    """ChatGLM-6B v1 checkpoints: `transformer.layers.{i}` naming, fused QKV
    interleaved PER HEAD ([H, 3, D] packing), GELU MLP, LN with bias."""

    def convert(self, tensors: Dict, cfg: ModelConfig, dtype) -> Dict:
        t = tensors
        H, D = cfg.num_heads, cfg.head_dim

        def get(name):
            return _to_np(t[name])

        def ln(name):
            return {"w": _cast(get(f"{name}.weight"), dtype),
                    "b": _cast(get(f"{name}.bias"), dtype)}

        def lin(name, bias=True):
            d = {"w": _cast(get(f"{name}.weight").T, dtype)}
            if bias and f"{name}.bias" in t:
                d["b"] = _cast(get(f"{name}.bias"), dtype)
            return d

        def layer(i):
            base = f"transformer.layers.{i}"
            # fused [H, 3, D] per-head interleave -> q/k/v [H*D, hid]
            w = get(f"{base}.attention.query_key_value.weight")
            w = w.reshape(H, 3, D, -1)
            b = get(f"{base}.attention.query_key_value.bias")
            b = b.reshape(H, 3, D)
            qkv = {}
            for j, nm in enumerate(("q_proj", "k_proj", "v_proj")):
                qkv[nm] = {"w": _cast(w[:, j].reshape(H * D, -1).T, dtype),
                           "b": _cast(b[:, j].reshape(H * D), dtype)}
            return {
                "input_layernorm": ln(f"{base}.input_layernorm"),
                "post_attention_layernorm": ln(
                    f"{base}.post_attention_layernorm"),
                **qkv,
                "o_proj": lin(f"{base}.attention.dense"),
                "fc1": lin(f"{base}.mlp.dense_h_to_4h"),
                "fc2": lin(f"{base}.mlp.dense_4h_to_h"),
            }

        return {
            "embed_tokens": {"w": _cast(
                get("transformer.word_embeddings.weight"), dtype)},
            "norm": ln("transformer.final_layernorm"),
            "lm_head": {"w": _cast(get("lm_head.weight").T, dtype)},
            "layers": stack_layer_trees(
                [layer(i) for i in range(cfg.num_layers)]),
        }


class _ChatGLMConverter:
    def convert(self, tensors: Dict, cfg: ModelConfig, dtype) -> Dict:
        if cfg.arch == "chatglm_v1":
            return _ChatGLMV1Converter().convert(tensors, cfg, dtype)
        t = tensors
        H, KH, D = cfg.num_heads, cfg.num_kv_heads, cfg.head_dim

        def get(name):
            return _to_np(t[name])

        def layer(i):
            base = f"transformer.encoder.layers.{i}"
            qkv_w = get(f"{base}.self_attention.query_key_value.weight")
            q_w, k_w, v_w = np.split(qkv_w, [H * D, H * D + KH * D], axis=0)
            lp = {
                "input_layernorm": _cast(get(f"{base}.input_layernorm.weight"), dtype),
                "post_attention_layernorm": _cast(
                    get(f"{base}.post_attention_layernorm.weight"), dtype),
                "q_proj": {"w": _cast(q_w.T, dtype)},
                "k_proj": {"w": _cast(k_w.T, dtype)},
                "v_proj": {"w": _cast(v_w.T, dtype)},
                "o_proj": {"w": _cast(get(f"{base}.self_attention.dense.weight").T, dtype)},
            }
            if cfg.qkv_bias:
                qkv_b = get(f"{base}.self_attention.query_key_value.bias")
                q_b, k_b, v_b = np.split(qkv_b, [H * D, H * D + KH * D])
                lp["q_proj"]["b"] = _cast(q_b, dtype)
                lp["k_proj"]["b"] = _cast(k_b, dtype)
                lp["v_proj"]["b"] = _cast(v_b, dtype)
            # dense_h_to_4h is fused [2*ffn, hidden]: first half gate, second up
            h4 = get(f"{base}.mlp.dense_h_to_4h.weight")
            gate_w, up_w = np.split(h4, 2, axis=0)
            lp["gate_proj"] = {"w": _cast(gate_w.T, dtype)}
            lp["up_proj"] = {"w": _cast(up_w.T, dtype)}
            lp["down_proj"] = {"w": _cast(get(f"{base}.mlp.dense_4h_to_h.weight").T, dtype)}
            return lp

        layers = [layer(i) for i in range(cfg.num_layers)]
        stacked = {}
        for key in layers[0]:
            if isinstance(layers[0][key], dict):
                stacked[key] = {s: np.stack([l[key][s] for l in layers])
                                for s in layers[0][key]}
            else:
                stacked[key] = np.stack([l[key] for l in layers])
        return {
            "embed_tokens": {"w": _cast(
                get("transformer.embedding.word_embeddings.weight"), dtype)},
            "norm": _cast(get("transformer.encoder.final_layernorm.weight"), dtype),
            "lm_head": {"w": _cast(get("transformer.output_layer.weight").T, dtype)},
            "layers": stacked,
        }


@register_model("ChatGLMModel", "ChatGLMForConditionalGeneration", "chatglm")
def build_chatglm():
    return _model_config, _ChatGLMConverter()
