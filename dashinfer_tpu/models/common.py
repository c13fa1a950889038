"""Shared HF -> params conversion for Llama-family decoders.

Replaces the reference's Python conversion layer (model_base.py:50-851 +
per-arch builders like qwen_v15.py): instead of emitting a protobuf graph +
.asparam blob, we map HF tensor names to the stacked-params pytree consumed
by models/transformer.py. Weight convention: [in, out] (HF torch Linear
stores [out, in] -> transposed here). Layer leaves are stacked with a leading
num_layers dim for lax.scan.
"""

from typing import Callable, Dict, List, Optional

import numpy as np

from dashinfer_tpu.config import ModelConfig


def _to_np(x):
    """torch tensor / numpy -> numpy, preserving bf16 via ml_dtypes."""
    if isinstance(x, np.ndarray):
        return x
    import ml_dtypes
    import torch
    if x.dtype == torch.bfloat16:
        return x.detach().view(torch.uint16).cpu().numpy().view(ml_dtypes.bfloat16)
    return x.detach().cpu().numpy()


def _cast(x: np.ndarray, dtype) -> np.ndarray:
    return np.asarray(x, dtype=dtype)


def stack_layer_trees(per_layer: List) -> Dict:
    """Stack a list of per-layer param trees into one tree with leading
    num_layers dims (arbitrary dict nesting)."""
    import jax
    return jax.tree.map(lambda *xs: np.stack(xs), *per_layer)


class LlamaFamilyConverter:
    """HF checkpoints with `model.layers.{i}.self_attn...` naming
    (Llama, Qwen2, Qwen3, Mistral, Baichuan...)."""

    def __init__(self, qkv_bias: bool = False, qk_norm: bool = False,
                 prefix: str = "model."):
        self.qkv_bias = qkv_bias
        self.qk_norm = qk_norm
        self.prefix = prefix

    def convert(self, tensors: Dict[str, "np.ndarray"], cfg: ModelConfig,
                dtype) -> Dict:
        p = self.prefix
        t = {k: v for k, v in tensors.items()}

        def get(name):
            return _to_np(t[name])

        def lin(name, bias_name=None):
            d = {"w": _cast(get(name).T, dtype)}
            if bias_name is not None and bias_name in t:
                d["b"] = _cast(get(bias_name), dtype)
            return d

        def stack(fn) -> Dict:
            per_layer: List[Dict] = [fn(i) for i in range(cfg.num_layers)]
            return stack_layer_trees(per_layer)

        def layer(i):
            lp = {
                "input_layernorm": _cast(
                    get(f"{p}layers.{i}.input_layernorm.weight"), dtype),
                "post_attention_layernorm": _cast(
                    get(f"{p}layers.{i}.post_attention_layernorm.weight"), dtype),
                "q_proj": lin(f"{p}layers.{i}.self_attn.q_proj.weight",
                              f"{p}layers.{i}.self_attn.q_proj.bias"),
                "k_proj": lin(f"{p}layers.{i}.self_attn.k_proj.weight",
                              f"{p}layers.{i}.self_attn.k_proj.bias"),
                "v_proj": lin(f"{p}layers.{i}.self_attn.v_proj.weight",
                              f"{p}layers.{i}.self_attn.v_proj.bias"),
                "o_proj": lin(f"{p}layers.{i}.self_attn.o_proj.weight"),
            }
            if self.qk_norm:
                lp["q_norm"] = _cast(
                    get(f"{p}layers.{i}.self_attn.q_norm.weight"), dtype)
                lp["k_norm"] = _cast(
                    get(f"{p}layers.{i}.self_attn.k_norm.weight"), dtype)
            lp.update(self.layer_mlp(i, t, get, lin, cfg, dtype))
            return lp

        params = {
            "embed_tokens": {"w": _cast(get(f"{p}embed_tokens.weight"), dtype)},
            "norm": _cast(get(f"{p}norm.weight"), dtype),
            "layers": stack(layer),
        }
        if not cfg.tie_word_embeddings:
            params["lm_head"] = lin("lm_head.weight")
        return params

    def layer_mlp(self, i, tensors, get, lin, cfg, dtype) -> Dict:
        p = self.prefix
        return {
            "gate_proj": lin(f"{p}layers.{i}.mlp.gate_proj.weight"),
            "up_proj": lin(f"{p}layers.{i}.mlp.up_proj.weight"),
            "down_proj": lin(f"{p}layers.{i}.mlp.down_proj.weight"),
        }
