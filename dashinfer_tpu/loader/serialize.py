"""Pre-converted model serialization ("DashInferModel" format equivalent).

The reference converts HF -> .asgraph (protobuf IR) + .asparam (allsparkz
weight blob) offline, then serves the converted artifact
(engine_utils.py:55-179, weight format SURVEY.md §8.4, loader
model_loader.py:176 `DashInferModel`). Here the artifact is a directory:

    di_config.json      ModelConfig + quant metadata + format version
    params-*.npz        flattened params tree (bf16 stored as uint16 views)

Quantization (InstantQuant) runs at convert time, so serving cold-start
skips both HF parsing and quantization — the same motivation as the
reference's offline step. A content hash guards against artifact mismatch
(reference BuildMetaProto weight hash, allspark.proto:119-129).
"""

import dataclasses
import hashlib
import json
import os
from typing import Dict, Tuple

import numpy as np

from dashinfer_tpu.config import (Activation, ModelConfig, MoEConfig,
                                  PositionEmbedding, QuantConfig, RopeScaling)
from dashinfer_tpu.utils import get_logger

logger = get_logger("serialize")

FORMAT_VERSION = 1


def _flatten(tree: Dict, prefix="") -> Dict[str, np.ndarray]:
    out = {}
    for k, v in tree.items():
        key = f"{prefix}{k}"
        if isinstance(v, dict):
            out.update(_flatten(v, key + "/"))
        else:
            out[key] = np.asarray(v)
    return out


def _unflatten(flat: Dict[str, np.ndarray]) -> Dict:
    tree: Dict = {}
    for key, v in flat.items():
        parts = key.split("/")
        node = tree
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = v
    return tree


def _storable(a: np.ndarray) -> Tuple[np.ndarray, str]:
    import ml_dtypes
    if a.dtype == ml_dtypes.bfloat16:
        return a.view(np.uint16), "bfloat16"
    return a, str(a.dtype)


def _restore(a: np.ndarray, logical: str) -> np.ndarray:
    import ml_dtypes
    if logical == "bfloat16":
        return a.view(ml_dtypes.bfloat16)
    return a


def save_model(out_dir: str, cfg: ModelConfig, params: Dict,
               quant: QuantConfig = None) -> None:
    os.makedirs(out_dir, exist_ok=True)
    flat = _flatten(params)
    dtypes = {}
    store = {}
    h = hashlib.blake2b(digest_size=16)
    for k in sorted(flat):
        arr, logical = _storable(flat[k])
        store[k.replace("/", "|")] = arr
        dtypes[k] = logical
        h.update(k.encode())
        h.update(arr.tobytes()[:4096])  # sampled hash (cheap, like reference)
    np.savez(os.path.join(out_dir, "params.npz"), **store)
    meta = {
        "format_version": FORMAT_VERSION,
        "model_config": dataclasses.asdict(cfg),
        "quant": dataclasses.asdict(quant) if quant else None,
        "dtypes": dtypes,
        "weight_hash": h.hexdigest(),
    }
    with open(os.path.join(out_dir, "di_config.json"), "w") as f:
        json.dump(meta, f, indent=1, default=str)
    logger.info("serialized model to %s (%d tensors)", out_dir, len(flat))


def _cfg_from_dict(d: Dict) -> ModelConfig:
    d = dict(d)
    d["activation"] = Activation(d["activation"])
    d["position_embedding"] = PositionEmbedding(d["position_embedding"])
    rs = d.get("rope_scaling")
    if isinstance(rs, dict):
        rs = {k: (v if v != "None" else None) for k, v in rs.items()}
        if rs.get("attention_factor") in ("None", None):
            rs["attention_factor"] = None
        else:
            rs["attention_factor"] = float(rs["attention_factor"])
        rs["factor"] = float(rs["factor"])
        d["rope_scaling"] = RopeScaling(**rs)
    moe = d.get("moe")
    if isinstance(moe, dict):
        moe["mlp_only_layers"] = tuple(moe.get("mlp_only_layers", ()))
        d["moe"] = MoEConfig(**moe)
    d["mrope_section"] = tuple(d.get("mrope_section", ()))
    return ModelConfig(**d)


def load_model(model_dir: str, verify_hash: bool = True
               ) -> Tuple[ModelConfig, Dict]:
    with open(os.path.join(model_dir, "di_config.json")) as f:
        meta = json.load(f)
    if meta["format_version"] != FORMAT_VERSION:
        raise ValueError(f"artifact format {meta['format_version']} != "
                         f"{FORMAT_VERSION}")
    cfg = _cfg_from_dict(meta["model_config"])
    z = np.load(os.path.join(model_dir, "params.npz"))
    flat = {}
    h = hashlib.blake2b(digest_size=16)
    for stored_key in sorted(z.files):
        k = stored_key.replace("|", "/")
        arr = z[stored_key]
        h.update(k.encode())
        h.update(arr.tobytes()[:4096])
        flat[k] = _restore(arr, meta["dtypes"][k])
    if verify_hash and h.hexdigest() != meta["weight_hash"]:
        raise ValueError("weight hash mismatch — corrupt or edited artifact")
    return cfg, _unflatten(flat)


def convert_hf_to_di(hf_dir: str, out_dir: str, dtype: str = "bfloat16",
                     quant_mode: str = "none", group_size: int = -1) -> None:
    """Offline conversion CLI body (reference serialize_model_from_torch
    flow, SURVEY.md §3.4)."""
    from dashinfer_tpu.loader.hf_loader import build_from_hf
    from dashinfer_tpu.loader.quantize import quantize_params

    cfg, params = build_from_hf(hf_dir, dtype)
    quant = None
    if quant_mode != "none":
        quant = QuantConfig(mode=quant_mode, group_size=group_size)
        params = quantize_params(params, quant)
    save_model(out_dir, cfg, params, quant)


def main():
    import argparse
    ap = argparse.ArgumentParser(
        description="Convert a HF checkpoint to the dashinfer_tpu serving "
                    "artifact (offline, like the reference's model convert)")
    ap.add_argument("--input", required=True, help="HF checkpoint dir")
    ap.add_argument("--output", required=True, help="output artifact dir")
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--quant", default="none",
                    choices=["none", "a16w8", "a16w4"])
    ap.add_argument("--group-size", type=int, default=-1)
    args = ap.parse_args()
    convert_hf_to_di(args.input, args.output, args.dtype, args.quant,
                     args.group_size)


if __name__ == "__main__":
    main()
