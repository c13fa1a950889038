from dashinfer_tpu.loader.hf_loader import (
    build_from_hf,
    build_from_torch_model,
    read_hf_config,
)

__all__ = ["build_from_hf", "build_from_torch_model", "read_hf_config"]
