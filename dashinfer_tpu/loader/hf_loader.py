"""HuggingFace checkpoint ingestion.

Replaces the reference's offline serialize step (.asgraph protobuf +
.asparam "allsparkz" weights, engine_utils.py:55-179, weight file format
SURVEY.md §8.4) AND its load-time WeightManager/WeightSplitter
(weight_manager.cpp, weight_splitter.cpp): on TPU there is no offline IR —
the HF safetensors are read once on the host, converted to the stacked
params pytree, and `jax.device_put` with NamedShardings performs the
"per-rank split" (each host/device fetches only its shard).
"""

import json
import os
from typing import Dict, Optional, Tuple

import numpy as np

from dashinfer_tpu.config import ModelConfig
from dashinfer_tpu.models.registry import get_model_builder
from dashinfer_tpu.utils import get_logger

logger = get_logger("loader")

_DTYPES = {"bfloat16": None, "float32": np.float32, "float16": np.float16}


def _np_dtype(name: str):
    if name == "bfloat16":
        import ml_dtypes
        return ml_dtypes.bfloat16
    return np.dtype(name)


def _arch_of(hf_cfg: dict) -> str:
    archs = hf_cfg.get("architectures") or []
    if archs:
        return archs[0]
    mt = hf_cfg.get("model_type")
    if mt:
        return mt
    raise KeyError("config has neither architectures nor model_type")


def read_hf_config(model_path: str) -> dict:
    with open(os.path.join(model_path, "config.json")) as f:
        return json.load(f)


def load_hf_tensors(model_path: str) -> Dict[str, np.ndarray]:
    """Read all tensors from safetensors (preferred) or torch .bin shards."""
    import glob

    st_files = sorted(glob.glob(os.path.join(model_path, "*.safetensors")))
    tensors: Dict[str, np.ndarray] = {}
    if st_files:
        from safetensors import safe_open
        for fn in st_files:
            # framework="numpy" rejects bf16; go through torch for dtype fidelity
            with safe_open(fn, framework="pt") as f:
                for name in f.keys():
                    tensors[name] = f.get_tensor(name)
        return tensors

    bin_files = sorted(glob.glob(os.path.join(model_path, "*.bin")))
    if not bin_files:
        raise FileNotFoundError(f"no weights found under {model_path}")
    import torch
    for fn in bin_files:
        sd = torch.load(fn, map_location="cpu", weights_only=True)
        tensors.update(sd)
    return tensors


def build_from_hf(model_path: str, dtype: str = "bfloat16"
                  ) -> Tuple[ModelConfig, Dict]:
    """model dir -> (ModelConfig, host-side params pytree of numpy arrays)."""
    hf_cfg = read_hf_config(model_path)
    arch = _arch_of(hf_cfg)
    config_fn, converter = get_model_builder(arch)()
    cfg = config_fn(hf_cfg)
    cfg.validate()
    tensors = load_hf_tensors(model_path)
    params = converter.convert(tensors, cfg, _np_dtype(dtype))
    logger.info("loaded %s (%s): %d layers, hidden %d, vocab %d", model_path,
                cfg.arch, cfg.num_layers, cfg.hidden_size, cfg.vocab_size)
    return cfg, params


def build_from_torch_model(torch_model, hf_cfg: dict, dtype: str = "float32"
                           ) -> Tuple[ModelConfig, Dict]:
    """Direct conversion from an in-memory HF torch model (tests / notebooks;
    the analog of the reference's serialize_model_from_torch, engine.py:97)."""
    arch = _arch_of(hf_cfg)
    config_fn, converter = get_model_builder(arch)()
    cfg = config_fn(hf_cfg)
    cfg.validate()
    tensors = dict(torch_model.state_dict())
    # strip potential "model." duplication of tied lm_head etc. is handled by
    # the converters via exact names
    params = converter.convert(tensors, cfg, _np_dtype(dtype))
    return cfg, params
