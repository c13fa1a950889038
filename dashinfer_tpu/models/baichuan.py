"""Baichuan 1/2 (reference converters baichuan_v1/v2; registry
csrc/core/model/baichuan/baichuan.cpp:24-25).

7B = Llama-style with RoPE and a fused W_pack QKV; 13B uses ALiBi (position
embedding flag). Baichuan2 normalizes the lm_head rows at load (as HF's
NormHead does on first forward)."""

from typing import Dict

import numpy as np

from dashinfer_tpu.config import ModelConfig, PositionEmbedding
from dashinfer_tpu.models.common import _cast, _to_np
from dashinfer_tpu.models.registry import register_model


def _model_config(hf: dict) -> ModelConfig:
    heads = hf["num_attention_heads"]
    hidden = hf["hidden_size"]
    # 13B checkpoints have no rope; HF config carries no explicit flag, the
    # convention is 40-layer/13B = ALiBi (alibi_mask in remote code)
    alibi = hf.get("position_embedding", "").lower() == "alibi" or (
        hf.get("num_hidden_layers") == 40 and hf.get("model_max_length", 0) >= 4096)
    return ModelConfig(
        arch="baichuan",
        vocab_size=hf["vocab_size"],
        hidden_size=hidden,
        intermediate_size=hf["intermediate_size"],
        num_layers=hf["num_hidden_layers"],
        num_heads=heads,
        num_kv_heads=heads,
        head_dim=hidden // heads,
        rms_norm_eps=hf.get("rms_norm_eps", 1e-6),
        rope_theta=hf.get("rope_theta", 10000.0),
        max_position_embeddings=hf.get("model_max_length",
                                       hf.get("max_position_embeddings", 4096)),
        position_embedding=(PositionEmbedding.ALIBI if alibi
                            else PositionEmbedding.ROPE),
        tie_word_embeddings=False,
    )


class _BaichuanConverter:
    def __init__(self, normalize_head: bool):
        self.normalize_head = normalize_head

    def convert(self, tensors: Dict, cfg: ModelConfig, dtype) -> Dict:
        t = tensors
        H, D = cfg.num_heads, cfg.head_dim

        def get(name):
            return _to_np(t[name])

        def layer(i):
            base = f"model.layers.{i}"
            w_pack = get(f"{base}.self_attn.W_pack.weight")
            q_w, k_w, v_w = np.split(w_pack, 3, axis=0)
            return {
                "input_layernorm": _cast(get(f"{base}.input_layernorm.weight"), dtype),
                "post_attention_layernorm": _cast(
                    get(f"{base}.post_attention_layernorm.weight"), dtype),
                "q_proj": {"w": _cast(q_w.T, dtype)},
                "k_proj": {"w": _cast(k_w.T, dtype)},
                "v_proj": {"w": _cast(v_w.T, dtype)},
                "o_proj": {"w": _cast(get(f"{base}.self_attn.o_proj.weight").T, dtype)},
                "gate_proj": {"w": _cast(get(f"{base}.mlp.gate_proj.weight").T, dtype)},
                "up_proj": {"w": _cast(get(f"{base}.mlp.up_proj.weight").T, dtype)},
                "down_proj": {"w": _cast(get(f"{base}.mlp.down_proj.weight").T, dtype)},
            }

        layers = [layer(i) for i in range(cfg.num_layers)]
        stacked = {}
        for key in layers[0]:
            if isinstance(layers[0][key], dict):
                stacked[key] = {s: np.stack([l[key][s] for l in layers])
                                for s in layers[0][key]}
            else:
                stacked[key] = np.stack([l[key] for l in layers])

        head = _to_np(t["lm_head.weight"]).astype(np.float32)
        if self.normalize_head:
            head = head / (np.linalg.norm(head, axis=-1, keepdims=True) + 1e-7)
        return {
            "embed_tokens": {"w": _cast(get("model.embed_tokens.weight"), dtype)},
            "norm": _cast(get("model.norm.weight"), dtype),
            "lm_head": {"w": _cast(head.T, dtype)},
            "layers": stacked,
        }


@register_model("BaichuanForCausalLM", "BaiChuanForCausalLM", "baichuan")
def build_baichuan():
    # Baichuan2 uses NormHead; detecting v1-vs-v2 from config alone is
    # unreliable, default to v2 semantics (the served family in the reference)
    return _model_config, _BaichuanConverter(normalize_head=True)
