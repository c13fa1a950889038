"""Qwen v1.0 (original Qwen-7B/14B, HF arch `QWenLMHeadModel`).

Reference converter python/pyhie/allspark/model/qwen_v10.py (registry name
Qwen_v10, csrc/core/model/qwen/qwen.cpp:25-31). Checkpoint layout:

  transformer.wte.weight                       token embeddings
  transformer.h.{i}.ln_1.weight                RMSNorm (pre-attn)
  transformer.h.{i}.attn.c_attn.{weight,bias}  fused QKV [3*hid, hid]
  transformer.h.{i}.attn.c_proj.weight         o_proj
  transformer.h.{i}.ln_2.weight                RMSNorm (pre-mlp)
  transformer.h.{i}.mlp.w1.weight              "up" branch   [inter/2, hid]
  transformer.h.{i}.mlp.w2.weight              "gate" branch (SiLU applied)
  transformer.h.{i}.mlp.c_proj.weight          down proj
  transformer.ln_f.weight, lm_head.weight

Note the checkpoint's `intermediate_size` is 2x the per-branch width (the
upstream module splits it), and the SwiGLU roles are swapped vs Llama:
out = c_proj(w1(x) * silu(w2(x))) — so w2 maps to our gate_proj and w1 to
up_proj. Long-context features: dynamic NTK rope + logn attention scaling
(config use_dynamic_ntk/use_logn_attn; reference rotary_op.cpp NTK/logn
attrs, SURVEY.md §5.7c)."""

from typing import Dict

import numpy as np

from dashinfer_tpu.config import ModelConfig, RopeScaling
from dashinfer_tpu.models.common import _cast, _to_np, stack_layer_trees
from dashinfer_tpu.models.registry import register_model


def _model_config(hf: dict) -> ModelConfig:
    hidden = hf["hidden_size"]
    heads = hf["num_attention_heads"]
    seq_len = hf.get("seq_length", 8192)
    return ModelConfig(
        arch="qwen_v1",
        vocab_size=hf["vocab_size"],
        hidden_size=hidden,
        intermediate_size=hf["intermediate_size"] // 2,
        num_layers=hf["num_hidden_layers"],
        num_heads=heads,
        num_kv_heads=heads,
        head_dim=hf.get("kv_channels", hidden // heads),
        rms_norm_eps=hf.get("layer_norm_epsilon", 1e-6),
        rope_theta=hf.get("rotary_emb_base", 10000.0),
        max_position_embeddings=seq_len,
        qkv_bias=True,
        tie_word_embeddings=hf.get("tie_word_embeddings", False),
        rope_scaling=RopeScaling(
            kind="dynamic_ntk" if hf.get("use_dynamic_ntk") else "none",
            factor=1.0,
            original_max_position=seq_len,
            use_logn_attn=bool(hf.get("use_logn_attn", False))),
    )


class _QwenV1Converter:
    def convert(self, tensors: Dict, cfg: ModelConfig, dtype) -> Dict:
        t = tensors
        hid = cfg.hidden_size

        def get(name):
            return _to_np(t[name])

        def layer(i):
            base = f"transformer.h.{i}"
            cattn_w = get(f"{base}.attn.c_attn.weight")      # [3*hid, hid]
            q_w, k_w, v_w = np.split(cattn_w, 3, axis=0)
            cattn_b = get(f"{base}.attn.c_attn.bias")
            q_b, k_b, v_b = np.split(cattn_b, 3)
            return {
                "input_layernorm": _cast(get(f"{base}.ln_1.weight"), dtype),
                "post_attention_layernorm": _cast(
                    get(f"{base}.ln_2.weight"), dtype),
                "q_proj": {"w": _cast(q_w.T, dtype), "b": _cast(q_b, dtype)},
                "k_proj": {"w": _cast(k_w.T, dtype), "b": _cast(k_b, dtype)},
                "v_proj": {"w": _cast(v_w.T, dtype), "b": _cast(v_b, dtype)},
                "o_proj": {"w": _cast(
                    get(f"{base}.attn.c_proj.weight").T, dtype)},
                # w2 feeds SiLU (gate), w1 is the linear branch (up)
                "gate_proj": {"w": _cast(
                    get(f"{base}.mlp.w2.weight").T, dtype)},
                "up_proj": {"w": _cast(
                    get(f"{base}.mlp.w1.weight").T, dtype)},
                "down_proj": {"w": _cast(
                    get(f"{base}.mlp.c_proj.weight").T, dtype)},
            }

        params = {
            "embed_tokens": {"w": _cast(get("transformer.wte.weight"), dtype)},
            "norm": _cast(get("transformer.ln_f.weight"), dtype),
            "layers": stack_layer_trees(
                [layer(i) for i in range(cfg.num_layers)]),
        }
        if not cfg.tie_word_embeddings:
            params["lm_head"] = {"w": _cast(get("lm_head.weight").T, dtype)}
        return params


@register_model("QWenLMHeadModel", "qwen_v1", "qwen")
def build_qwen_v1():
    return _model_config, _QwenV1Converter()
