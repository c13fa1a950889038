"""Llama 1/2/3 (reference converters llama.py/llama_v2.py/llama_v3.py;
registry csrc/core/model/llama/llama.cpp:24-26)."""

from dashinfer_tpu.config import ModelConfig, RopeScaling
from dashinfer_tpu.models.common import LlamaFamilyConverter
from dashinfer_tpu.models.registry import register_model


def _rope_scaling(hf: dict) -> RopeScaling:
    rs = hf.get("rope_scaling") or {}
    if not rs:
        return RopeScaling()
    kind = rs.get("rope_type") or rs.get("type") or "none"
    if kind in ("linear",):
        return RopeScaling(kind="linear", factor=rs.get("factor", 1.0))
    if kind in ("dynamic", "dynamic_ntk"):
        return RopeScaling(kind="dynamic_ntk", factor=rs.get("factor", 1.0),
                           original_max_position=rs.get(
                               "original_max_position_embeddings",
                               hf.get("max_position_embeddings", 0)))
    if kind == "yarn":
        return RopeScaling(
            kind="yarn", factor=rs.get("factor", 1.0),
            original_max_position=rs.get("original_max_position_embeddings", 0),
            beta_fast=rs.get("beta_fast", 32.0),
            beta_slow=rs.get("beta_slow", 1.0),
            attention_factor=rs.get("attention_factor"))
    # llama3-style rope scaling is close enough to yarn for serving; treat
    # unknown kinds as none and let the golden test flag any mismatch.
    return RopeScaling()


def _model_config(hf: dict) -> ModelConfig:
    head_dim = hf.get("head_dim") or hf["hidden_size"] // hf["num_attention_heads"]
    return ModelConfig(
        arch="llama",
        vocab_size=hf["vocab_size"],
        hidden_size=hf["hidden_size"],
        intermediate_size=hf["intermediate_size"],
        num_layers=hf["num_hidden_layers"],
        num_heads=hf["num_attention_heads"],
        num_kv_heads=hf.get("num_key_value_heads", hf["num_attention_heads"]),
        head_dim=head_dim,
        rms_norm_eps=hf.get("rms_norm_eps", 1e-5),
        rope_theta=hf.get("rope_theta", 10000.0),
        max_position_embeddings=hf.get("max_position_embeddings", 4096),
        rope_scaling=_rope_scaling(hf),
        tie_word_embeddings=hf.get("tie_word_embeddings", False),
    )


@register_model("LlamaForCausalLM", "MistralForCausalLM", "llama", "mistral")
def build_llama():
    return _model_config, LlamaFamilyConverter()
