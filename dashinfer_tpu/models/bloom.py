"""Bloom (reference registry name "Bloom", csrc/core/model/bloom.cpp:24).

Architecture: ALiBi positions, LayerNorm with bias (incl. a post-embedding
word_embeddings_layernorm), fused per-head-interleaved QKV, gelu MLP, tied
lm_head."""

import numpy as np

from dashinfer_tpu.config import Activation, ModelConfig, PositionEmbedding
from dashinfer_tpu.models.common import _cast, _to_np, stack_layer_trees
from dashinfer_tpu.models.registry import register_model


def _model_config(hf: dict) -> ModelConfig:
    hid = hf["hidden_size"]
    heads = hf.get("n_head", hf.get("num_attention_heads"))
    return ModelConfig(
        arch="bloom",
        vocab_size=hf["vocab_size"],
        hidden_size=hid,
        intermediate_size=4 * hid,
        num_layers=hf.get("n_layer", hf.get("num_hidden_layers")),
        num_heads=heads,
        num_kv_heads=heads,
        head_dim=hid // heads,
        rms_norm_eps=hf.get("layer_norm_epsilon", 1e-5),
        max_position_embeddings=hf.get("max_position_embeddings", 2048),
        activation=Activation.GELU_TANH,
        position_embedding=PositionEmbedding.ALIBI,
        tie_word_embeddings=True,
    )


class BloomConverter:
    def convert(self, tensors, cfg: ModelConfig, dtype):
        t = dict(tensors)

        def get(name):
            key = name if name in t else "transformer." + name
            return _to_np(t[key])

        def nrm(name):
            return {"w": _cast(get(name + ".weight"), dtype),
                    "b": _cast(get(name + ".bias"), dtype)}

        H, D = cfg.num_heads, cfg.head_dim

        def layer(i):
            p = f"h.{i}."
            qkv_w = get(p + "self_attention.query_key_value.weight")
            qkv_b = get(p + "self_attention.query_key_value.bias")
            # torch Linear [3*hid, hid]: rows are per-head interleaved
            # [H, 3, D]; our layout wants [in, out] with q|k|v out blocks
            w4 = qkv_w.reshape(H, 3, D, -1)          # [H, 3, D, hid]
            b4 = qkv_b.reshape(H, 3, D)

            def proj(j):
                w = w4[:, j].reshape(H * D, -1).T    # [hid, H*D]
                b = b4[:, j].reshape(H * D)
                return {"w": _cast(w, dtype), "b": _cast(b, dtype)}

            return {
                "input_layernorm": nrm(p + "input_layernorm"),
                "post_attention_layernorm": nrm(p + "post_attention_layernorm"),
                "q_proj": proj(0),
                "k_proj": proj(1),
                "v_proj": proj(2),
                "o_proj": {
                    "w": _cast(get(p + "self_attention.dense.weight").T,
                               dtype),
                    "b": _cast(get(p + "self_attention.dense.bias"), dtype)},
                "fc1": {"w": _cast(get(p + "mlp.dense_h_to_4h.weight").T,
                                   dtype),
                        "b": _cast(get(p + "mlp.dense_h_to_4h.bias"), dtype)},
                "fc2": {"w": _cast(get(p + "mlp.dense_4h_to_h.weight").T,
                                   dtype),
                        "b": _cast(get(p + "mlp.dense_4h_to_h.bias"), dtype)},
            }

        return {
            "embed_tokens": {"w": _cast(get("word_embeddings.weight"), dtype)},
            "embed_norm": nrm("word_embeddings_layernorm"),
            "norm": nrm("ln_f"),
            "layers": stack_layer_trees(
                [layer(i) for i in range(cfg.num_layers)]),
        }


@register_model("BloomForCausalLM", "bloom")
def build_bloom():
    return _model_config, BloomConverter()
