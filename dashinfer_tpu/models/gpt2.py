"""GPT-2 (reference registry name "GPT2", csrc/core/model/gpt2.cpp:22).

Architecture: learned positional embeddings, LayerNorm (with bias), fused
c_attn QKV (Conv1D, already [in, out]), gelu_new MLP, tied lm_head."""

import numpy as np

from dashinfer_tpu.config import Activation, ModelConfig, PositionEmbedding
from dashinfer_tpu.models.common import _cast, _to_np, stack_layer_trees
from dashinfer_tpu.models.registry import register_model


def _model_config(hf: dict) -> ModelConfig:
    hid = hf["n_embd"]
    heads = hf["n_head"]
    return ModelConfig(
        arch="gpt2",
        vocab_size=hf["vocab_size"],
        hidden_size=hid,
        intermediate_size=hf.get("n_inner") or 4 * hid,
        num_layers=hf["n_layer"],
        num_heads=heads,
        num_kv_heads=heads,
        head_dim=hid // heads,
        rms_norm_eps=hf.get("layer_norm_epsilon", 1e-5),
        max_position_embeddings=hf.get("n_positions", 1024),
        activation=Activation.GELU_TANH,
        position_embedding=PositionEmbedding.LEARNED,
        tie_word_embeddings=True,
    )


class Gpt2Converter:
    def convert(self, tensors, cfg: ModelConfig, dtype):
        t = dict(tensors)

        def get(name):
            key = name if name in t else "transformer." + name
            return _to_np(t[key])

        def nrm(name):
            return {"w": _cast(get(name + ".weight"), dtype),
                    "b": _cast(get(name + ".bias"), dtype)}

        hid = cfg.hidden_size

        def layer(i):
            p = f"h.{i}."
            ca_w = get(p + "attn.c_attn.weight")     # [hid, 3*hid] (Conv1D)
            ca_b = get(p + "attn.c_attn.bias")
            return {
                "input_layernorm": nrm(p + "ln_1"),
                "post_attention_layernorm": nrm(p + "ln_2"),
                "q_proj": {"w": _cast(ca_w[:, :hid], dtype),
                           "b": _cast(ca_b[:hid], dtype)},
                "k_proj": {"w": _cast(ca_w[:, hid:2 * hid], dtype),
                           "b": _cast(ca_b[hid:2 * hid], dtype)},
                "v_proj": {"w": _cast(ca_w[:, 2 * hid:], dtype),
                           "b": _cast(ca_b[2 * hid:], dtype)},
                "o_proj": {"w": _cast(get(p + "attn.c_proj.weight"), dtype),
                           "b": _cast(get(p + "attn.c_proj.bias"), dtype)},
                "fc1": {"w": _cast(get(p + "mlp.c_fc.weight"), dtype),
                        "b": _cast(get(p + "mlp.c_fc.bias"), dtype)},
                "fc2": {"w": _cast(get(p + "mlp.c_proj.weight"), dtype),
                        "b": _cast(get(p + "mlp.c_proj.bias"), dtype)},
            }

        return {
            "embed_tokens": {"w": _cast(get("wte.weight"), dtype)},
            "pos_embed": {"w": _cast(get("wpe.weight"), dtype)},
            "norm": nrm("ln_f"),
            "layers": stack_layer_trees(
                [layer(i) for i in range(cfg.num_layers)]),
        }


# reference registers GPT3 as the same decoder graph (gpt3.cpp:23)
@register_model("GPT2LMHeadModel", "gpt2", "gpt3")
def build_gpt2():
    return _model_config, Gpt2Converter()
