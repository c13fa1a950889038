"""Qwen3 (reference converter qwen_v30.py; per-head QK RMSNorm between the
QKV GEMM and rotary — QKLayerNormNoBeta, qwen_v30.py:228-319)."""

from dashinfer_tpu.config import ModelConfig
from dashinfer_tpu.models.common import LlamaFamilyConverter
from dashinfer_tpu.models.registry import register_model


def _model_config(hf: dict) -> ModelConfig:
    head_dim = hf.get("head_dim") or hf["hidden_size"] // hf["num_attention_heads"]
    return ModelConfig(
        arch="qwen3",
        vocab_size=hf["vocab_size"],
        hidden_size=hf["hidden_size"],
        intermediate_size=hf["intermediate_size"],
        num_layers=hf["num_hidden_layers"],
        num_heads=hf["num_attention_heads"],
        num_kv_heads=hf.get("num_key_value_heads", hf["num_attention_heads"]),
        head_dim=head_dim,
        rms_norm_eps=hf.get("rms_norm_eps", 1e-6),
        rope_theta=hf.get("rope_theta", 1000000.0),
        max_position_embeddings=hf.get("max_position_embeddings", 40960),
        qkv_bias=False,
        qk_norm=True,
        tie_word_embeddings=hf.get("tie_word_embeddings", False),
    )


@register_model("Qwen3ForCausalLM", "qwen3")
def build_qwen3():
    return _model_config, LlamaFamilyConverter(qk_norm=True)
