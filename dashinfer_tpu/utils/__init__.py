from dashinfer_tpu.utils.env import EnvConfig
from dashinfer_tpu.utils.logging import get_logger

__all__ = ["EnvConfig", "get_logger"]
