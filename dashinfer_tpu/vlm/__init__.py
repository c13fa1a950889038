"""Multimodal (VLM) toolkit: vision preprocessing, ViT runner, embedding
cache, and request helpers for Qwen2-VL style models.

Reference: the `dashinfer-vlm` package (SURVEY.md §2.19) — image fetch +
dynamic-resolution preprocess (vl_inference/utils/hie/vit_preprocess.py),
ViT workers outside the engine (runtime/hie_worker.py), an embedding cache
for repeated images (utils/cache/cache_manager.py), and embedding injection
via MultiMediaInfo -> RichEmbedding. Here the ViT is a jitted JAX function
(models/qwen2_vl.vision_forward) and injection rides GenerationConfig.mm_info.
"""

from dashinfer_tpu.vlm.preprocess import preprocess_image, smart_resize
from dashinfer_tpu.vlm.runner import VisionRunner

__all__ = ["preprocess_image", "smart_resize", "VisionRunner"]
