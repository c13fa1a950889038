from dashinfer_tpu.lora.manager import LoraManager

__all__ = ["LoraManager"]
