"""Qwen v1.0 (QWenLMHeadModel) converter parity.

The upstream class needs trust_remote_code, so the oracle is a tiny HF Qwen2
model (MHA, qkv bias — architecturally identical to Qwen v1 modulo naming)
whose state dict is renamed into the v1 checkpoint layout (fused c_attn,
w1/w2 SwiGLU with swapped roles). Converted logits must match the Qwen2
HF forward exactly. Reference converter: qwen_v10.py."""

import numpy as np
import torch

import tests.hf_util as hf_util
from tests.test_model_parity import _run_prefill_decode


def _to_v1_state(sd, layers):
    """Qwen2 HF state dict -> Qwen v1 naming (see models/qwen_v1.py)."""
    out = {
        "transformer.wte.weight": sd["model.embed_tokens.weight"],
        "transformer.ln_f.weight": sd["model.norm.weight"],
        "lm_head.weight": sd["lm_head.weight"],
    }
    for i in range(layers):
        s = f"model.layers.{i}"
        d = f"transformer.h.{i}"
        out[f"{d}.ln_1.weight"] = sd[f"{s}.input_layernorm.weight"]
        out[f"{d}.ln_2.weight"] = sd[f"{s}.post_attention_layernorm.weight"]
        out[f"{d}.attn.c_attn.weight"] = torch.cat(
            [sd[f"{s}.self_attn.q_proj.weight"],
             sd[f"{s}.self_attn.k_proj.weight"],
             sd[f"{s}.self_attn.v_proj.weight"]], dim=0)
        out[f"{d}.attn.c_attn.bias"] = torch.cat(
            [sd[f"{s}.self_attn.q_proj.bias"],
             sd[f"{s}.self_attn.k_proj.bias"],
             sd[f"{s}.self_attn.v_proj.bias"]], dim=0)
        out[f"{d}.attn.c_proj.weight"] = sd[f"{s}.self_attn.o_proj.weight"]
        # our SwiGLU: silu(gate) * up; v1: w1(x) * silu(w2(x))
        out[f"{d}.mlp.w2.weight"] = sd[f"{s}.mlp.gate_proj.weight"]
        out[f"{d}.mlp.w1.weight"] = sd[f"{s}.mlp.up_proj.weight"]
        out[f"{d}.mlp.c_proj.weight"] = sd[f"{s}.mlp.down_proj.weight"]
    return out


def test_qwen_v1_matches_qwen2_oracle():
    from dashinfer_tpu.models.registry import get_model_builder

    hf_cfg = hf_util.tiny_qwen2_config(kv_heads=4)  # v1 is MHA
    model = hf_util.make_torch_model(hf_cfg)
    golden_ids = np.random.RandomState(0).randint(
        1, hf_cfg.vocab_size, size=12).tolist()
    golden = hf_util.hf_full_logits(model, golden_ids)

    v1_cfg = {
        "architectures": ["QWenLMHeadModel"],
        "vocab_size": hf_cfg.vocab_size,
        "hidden_size": hf_cfg.hidden_size,
        "intermediate_size": 2 * hf_cfg.intermediate_size,
        "num_hidden_layers": hf_cfg.num_hidden_layers,
        "num_attention_heads": hf_cfg.num_attention_heads,
        "kv_channels": hf_cfg.hidden_size // hf_cfg.num_attention_heads,
        "layer_norm_epsilon": hf_cfg.rms_norm_eps,
        "rotary_emb_base": hf_cfg.rope_theta,
        "seq_length": 1024,
        "use_dynamic_ntk": False,
        "use_logn_attn": False,
        "no_bias": True,
    }
    config_fn, converter = get_model_builder("QWenLMHeadModel")()
    cfg = config_fn(v1_cfg)
    assert cfg.arch == "qwen_v1"
    assert cfg.intermediate_size == hf_cfg.intermediate_size
    params = converter.convert(_to_v1_state(model.state_dict(),
                                            cfg.num_layers), cfg, np.float32)

    prefill_logits, _, _ = _run_prefill_decode(cfg, params, golden_ids, 1)
    assert np.argmax(prefill_logits) == np.argmax(golden[-1])
    np.testing.assert_allclose(prefill_logits, golden[-1], rtol=6e-3,
                               atol=6e-3)
