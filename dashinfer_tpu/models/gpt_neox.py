"""GPT-NeoX / Dolly (reference registry name "Dolly" — dolly.cpp:24 — runs
the GPT-NeoX architecture).

Architecture: partial rotary (rotary_pct), LayerNorm with bias, fused
per-head-interleaved QKV, parallel residual, gelu MLP, untied embed_out."""

import numpy as np

from dashinfer_tpu.config import Activation, ModelConfig, PositionEmbedding
from dashinfer_tpu.models.common import _cast, _to_np, stack_layer_trees
from dashinfer_tpu.models.registry import register_model


def _model_config(hf: dict) -> ModelConfig:
    hid = hf["hidden_size"]
    heads = hf["num_attention_heads"]
    D = hid // heads
    return ModelConfig(
        arch="gpt_neox",
        vocab_size=hf["vocab_size"],
        hidden_size=hid,
        intermediate_size=hf.get("intermediate_size", 4 * hid),
        num_layers=hf["num_hidden_layers"],
        num_heads=heads,
        num_kv_heads=heads,
        head_dim=D,
        rms_norm_eps=hf.get("layer_norm_eps", 1e-5),
        rope_theta=hf.get("rotary_emb_base", 10000.0),
        rotary_dim=int(D * hf.get("rotary_pct", 0.25)),
        max_position_embeddings=hf.get("max_position_embeddings", 2048),
        activation=Activation.GELU,
        parallel_residual=hf.get("use_parallel_residual", True),
    )


class GptNeoxConverter:
    def convert(self, tensors, cfg: ModelConfig, dtype):
        t = dict(tensors)

        def get(name):
            key = name if name in t else "gpt_neox." + name
            return _to_np(t[key])

        def nrm(name):
            return {"w": _cast(get(name + ".weight"), dtype),
                    "b": _cast(get(name + ".bias"), dtype)}

        H, D = cfg.num_heads, cfg.head_dim

        def layer(i):
            p = f"layers.{i}."
            qkv_w = get(p + "attention.query_key_value.weight")  # [3h, h]
            qkv_b = get(p + "attention.query_key_value.bias")
            w4 = qkv_w.reshape(H, 3, D, -1)
            b4 = qkv_b.reshape(H, 3, D)

            def proj(j):
                return {"w": _cast(w4[:, j].reshape(H * D, -1).T, dtype),
                        "b": _cast(b4[:, j].reshape(H * D), dtype)}

            return {
                "input_layernorm": nrm(p + "input_layernorm"),
                "post_attention_layernorm": nrm(p + "post_attention_layernorm"),
                "q_proj": proj(0),
                "k_proj": proj(1),
                "v_proj": proj(2),
                "o_proj": {
                    "w": _cast(get(p + "attention.dense.weight").T, dtype),
                    "b": _cast(get(p + "attention.dense.bias"), dtype)},
                "fc1": {"w": _cast(get(p + "mlp.dense_h_to_4h.weight").T,
                                   dtype),
                        "b": _cast(get(p + "mlp.dense_h_to_4h.bias"), dtype)},
                "fc2": {"w": _cast(get(p + "mlp.dense_4h_to_h.weight").T,
                                   dtype),
                        "b": _cast(get(p + "mlp.dense_4h_to_h.bias"), dtype)},
            }

        return {
            "embed_tokens": {"w": _cast(get("embed_in.weight"), dtype)},
            "norm": nrm("final_layer_norm"),
            "lm_head": {"w": _cast(_to_np(t["embed_out.weight"]).T, dtype)},
            "layers": stack_layer_trees(
                [layer(i) for i in range(cfg.num_layers)]),
        }


@register_model("GPTNeoXForCausalLM", "gpt_neox", "dolly")
def build_gpt_neox():
    return _model_config, GptNeoxConverter()
