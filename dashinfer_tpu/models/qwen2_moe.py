"""Qwen1.5/2-MoE (reference converter qwen_v20_moe.py; MOE + shared-expert
CalcExpert ops, moe_op.cpp). HF arch: Qwen2MoeForCausalLM."""

from typing import Dict

import numpy as np

from dashinfer_tpu.config import ModelConfig, MoEConfig
from dashinfer_tpu.models.common import LlamaFamilyConverter, _cast
from dashinfer_tpu.models.registry import register_model


def _model_config(hf: dict) -> ModelConfig:
    head_dim = hf.get("head_dim") or hf["hidden_size"] // hf["num_attention_heads"]
    step = hf.get("decoder_sparse_step", 1)
    mlp_only = tuple(hf.get("mlp_only_layers", ()) or
                     (i for i in range(hf["num_hidden_layers"])
                      if step > 1 and (i + 1) % step != 0))
    return ModelConfig(
        arch="qwen2_moe",
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
        moe=MoEConfig(
            num_experts=hf["num_experts"],
            num_experts_per_tok=hf["num_experts_per_tok"],
            moe_intermediate_size=hf["moe_intermediate_size"],
            shared_expert_intermediate_size=hf.get(
                "shared_expert_intermediate_size", 0),
            norm_topk_prob=hf.get("norm_topk_prob", False),
            mlp_only_layers=mlp_only,
        ),
    )


class _Qwen2MoeConverter(LlamaFamilyConverter):
    def layer_mlp(self, i, tensors, get, lin, cfg: ModelConfig, dtype) -> Dict:
        p = self.prefix
        if i in cfg.moe.mlp_only_layers:
            raise NotImplementedError(
                "mixed dense/MoE layers break the homogeneous layer scan; "
                "qwen2-moe checkpoints with mlp_only_layers are unsupported")
        E = cfg.moe.num_experts

        def expert_stack(name):
            return np.stack([
                _cast(get(f"{p}layers.{i}.mlp.experts.{e}.{name}.weight").T,
                      dtype) for e in range(E)])

        out = {
            "router": {"w": _cast(get(f"{p}layers.{i}.mlp.gate.weight").T, dtype)},
            "experts": {
                "gate_proj": expert_stack("gate_proj"),
                "up_proj": expert_stack("up_proj"),
                "down_proj": expert_stack("down_proj"),
            },
        }
        if cfg.moe.shared_expert_intermediate_size:
            out["shared_expert"] = {
                "gate_proj": lin(f"{p}layers.{i}.mlp.shared_expert.gate_proj.weight"),
                "up_proj": lin(f"{p}layers.{i}.mlp.shared_expert.up_proj.weight"),
                "down_proj": lin(f"{p}layers.{i}.mlp.shared_expert.down_proj.weight"),
            }
            out["shared_expert_gate"] = {
                "w": _cast(get(f"{p}layers.{i}.mlp.shared_expert_gate.weight").T,
                           dtype)}
        return out


@register_model("Qwen2MoeForCausalLM", "qwen2_moe")
def build_qwen2_moe():
    return _model_config, _Qwen2MoeConverter(qkv_bias=True)
