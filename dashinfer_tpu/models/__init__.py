from dashinfer_tpu.models.registry import get_model_builder, register_model

__all__ = ["get_model_builder", "register_model"]
