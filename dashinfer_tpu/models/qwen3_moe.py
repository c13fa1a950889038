"""Qwen3-MoE (e.g. Qwen3-30B-A3B): per-head QK RMSNorm (reference
qwen_v30.py:228-319) combined with the Qwen2-MoE expert layout (reference
qwen_v20_moe.py, moe_op.cpp) — no shared expert, no qkv bias,
norm_topk_prob defaults true. HF arch: Qwen3MoeForCausalLM."""

from dashinfer_tpu.config import ModelConfig, MoEConfig
from dashinfer_tpu.models.qwen2_moe import _Qwen2MoeConverter
from dashinfer_tpu.models.registry import register_model


def _model_config(hf: dict) -> ModelConfig:
    head_dim = hf.get("head_dim") or hf["hidden_size"] // hf["num_attention_heads"]
    step = hf.get("decoder_sparse_step", 1)
    mlp_only = tuple(hf.get("mlp_only_layers", ()) or
                     (i for i in range(hf["num_hidden_layers"])
                      if step > 1 and (i + 1) % step != 0))
    return ModelConfig(
        arch="qwen3_moe",
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
        moe=MoEConfig(
            num_experts=hf["num_experts"],
            num_experts_per_tok=hf["num_experts_per_tok"],
            moe_intermediate_size=hf["moe_intermediate_size"],
            shared_expert_intermediate_size=0,
            norm_topk_prob=hf.get("norm_topk_prob", True),
            mlp_only_layers=mlp_only,
        ),
    )


@register_model("Qwen3MoeForCausalLM", "qwen3_moe")
def build_qwen3_moe():
    return _model_config, _Qwen2MoeConverter(qkv_bias=False, qk_norm=True)
