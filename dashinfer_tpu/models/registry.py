"""Model-architecture registry.

Equivalent of the reference's REGISTER_MODEL factory
(csrc/core/model/model.h:291-295) + the per-arch Python converters
(python/pyhie/allspark/model/*.py). Here a "model builder" maps a HF config
dict to a ModelConfig and a HF state-dict to the params pytree; the compute
graph itself is the generic transformer (models/transformer.py).
"""

from typing import Callable, Dict

_REGISTRY: Dict[str, Callable] = {}


def register_model(*hf_archs: str):
    def deco(fn):
        for a in hf_archs:
            _REGISTRY[a.lower()] = fn
        return fn
    return deco


def get_model_builder(hf_arch: str):
    key = hf_arch.lower()
    if key not in _REGISTRY:
        # import side-effect registration
        import dashinfer_tpu.models.qwen2  # noqa: F401
        import dashinfer_tpu.models.llama  # noqa: F401
        import dashinfer_tpu.models.qwen3  # noqa: F401
        import dashinfer_tpu.models.qwen2_moe  # noqa: F401
        import dashinfer_tpu.models.qwen3_moe  # noqa: F401
        import dashinfer_tpu.models.chatglm  # noqa: F401
        import dashinfer_tpu.models.baichuan  # noqa: F401
        import dashinfer_tpu.models.qwen2_vl  # noqa: F401
        import dashinfer_tpu.models.gpt2  # noqa: F401
        import dashinfer_tpu.models.bloom  # noqa: F401
        import dashinfer_tpu.models.gpt_neox  # noqa: F401
        import dashinfer_tpu.models.qwen_v1  # noqa: F401
    if key not in _REGISTRY:
        raise KeyError(f"unsupported architecture {hf_arch}; known: "
                       f"{sorted(_REGISTRY)}")
    return _REGISTRY[key]
