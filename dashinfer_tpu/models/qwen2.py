"""Qwen1.5 / Qwen2 / Qwen2.5 (reference converters qwen_v15.py / qwen_v20.py;
registry names Qwen_v15/Qwen_v20, csrc/core/model/qwen/qwen.cpp:25-31).

Architecture: Llama-style with attention QKV bias, GQA, SwiGLU, RMSNorm,
optionally tied embeddings (0.5B/1.5B)."""

from dashinfer_tpu.config import ModelConfig
from dashinfer_tpu.models.common import LlamaFamilyConverter
from dashinfer_tpu.models.registry import register_model


def _model_config(hf: dict) -> ModelConfig:
    head_dim = hf.get("head_dim") or hf["hidden_size"] // hf["num_attention_heads"]
    return ModelConfig(
        arch="qwen2",
        vocab_size=hf["vocab_size"],
        hidden_size=hf["hidden_size"],
        intermediate_size=hf["intermediate_size"],
        num_layers=hf["num_hidden_layers"],
        num_heads=hf["num_attention_heads"],
        num_kv_heads=hf.get("num_key_value_heads", hf["num_attention_heads"]),
        head_dim=head_dim,
        rms_norm_eps=hf.get("rms_norm_eps", 1e-6),
        rope_theta=hf.get("rope_theta", 1000000.0),
        max_position_embeddings=hf.get("max_position_embeddings", 32768),
        qkv_bias=True,
        tie_word_embeddings=hf.get("tie_word_embeddings", False),
    )


@register_model("Qwen2ForCausalLM", "qwen2")
def build_qwen2():
    return _model_config, LlamaFamilyConverter(qkv_bias=True)
