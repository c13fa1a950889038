"""Qwen2-VL image preprocessing: smart resize -> normalized patch rows.

Replicates the HF Qwen2VLImageProcessor math (and the reference's
vit_preprocess.py dynamic-resolution pipeline): resize the image so both
sides are multiples of patch_size*merge_size with total pixels within
[min_pixels, max_pixels], rescale + CLIP-normalize, duplicate to
temporal_patch_size frames, and reorder into flattened patch rows
[grid_t*grid_h*grid_w, C*tp*ps*ps] in spatial-merge order.
"""

import math
from typing import Sequence, Tuple

import numpy as np

OPENAI_CLIP_MEAN = (0.48145466, 0.4578275, 0.40821073)
OPENAI_CLIP_STD = (0.26862954, 0.26130258, 0.27577711)


def smart_resize(height: int, width: int, factor: int,
                 min_pixels: int = 56 * 56,
                 max_pixels: int = 14 * 14 * 4 * 1280) -> Tuple[int, int]:
    """HF Qwen2-VL smart_resize: round sides to `factor` multiples keeping
    the pixel budget."""
    if max(height, width) / min(height, width) > 200:
        raise ValueError("aspect ratio > 200")
    h_bar = max(factor, round(height / factor) * factor)
    w_bar = max(factor, round(width / factor) * factor)
    if h_bar * w_bar > max_pixels:
        beta = math.sqrt((height * width) / max_pixels)
        h_bar = math.floor(height / beta / factor) * factor
        w_bar = math.floor(width / beta / factor) * factor
    elif h_bar * w_bar < min_pixels:
        beta = math.sqrt(min_pixels / (height * width))
        h_bar = math.ceil(height * beta / factor) * factor
        w_bar = math.ceil(width * beta / factor) * factor
    return h_bar, w_bar


def _resize_normalize(image, h_bar: int, w_bar: int) -> np.ndarray:
    """One frame (PIL.Image | np.ndarray [H, W, 3] uint8) -> CLIP-normalized
    [C, h_bar, w_bar] f32."""
    try:
        from PIL import Image
        if isinstance(image, np.ndarray):
            image = Image.fromarray(image)
        image = image.convert("RGB")
        arr = np.asarray(image.resize((w_bar, h_bar),
                                      resample=Image.BICUBIC), np.float32)
    except ImportError:  # numpy-only fallback (nearest resize)
        h, w = image.shape[:2]
        yi = (np.arange(h_bar) * h / h_bar).astype(int)
        xi = (np.arange(w_bar) * w / w_bar).astype(int)
        arr = image[yi][:, xi].astype(np.float32)
    arr = arr / 255.0
    arr = (arr - np.asarray(OPENAI_CLIP_MEAN)) / np.asarray(OPENAI_CLIP_STD)
    return arr.transpose(2, 0, 1)


def _hw_of(image) -> Tuple[int, int]:
    if isinstance(image, np.ndarray):
        return image.shape[0], image.shape[1]
    return image.height, image.width


def _patchify(patches: np.ndarray, h_bar: int, w_bar: int, ps: int, m: int,
              tp: int) -> Tuple[np.ndarray, Tuple[int, int, int]]:
    """[T, C, h_bar, w_bar] f32 (T % tp == 0) -> (patch rows
    [grid_t*grid_h*grid_w, C*tp*ps*ps], grid (t, h, w)); spatial-merge
    order matching HF Qwen2VLImageProcessor._preprocess."""
    C = patches.shape[1]
    grid_t = patches.shape[0] // tp
    grid_h, grid_w = h_bar // ps, w_bar // ps
    patches = patches.reshape(grid_t, tp, C, grid_h // m, m, ps,
                              grid_w // m, m, ps)
    patches = patches.transpose(0, 3, 6, 4, 7, 2, 1, 5, 8)
    flat = patches.reshape(grid_t * grid_h * grid_w, C * tp * ps * ps)
    return flat.astype(np.float32), (grid_t, grid_h, grid_w)


def preprocess_image(image, patch_size: int = 14, merge_size: int = 2,
                     temporal_patch_size: int = 2,
                     min_pixels: int = 56 * 56,
                     max_pixels: int = 14 * 14 * 4 * 1280
                     ) -> Tuple[np.ndarray, Tuple[int, int, int]]:
    """image: PIL.Image | np.ndarray [H, W, 3] uint8 -> (patch rows
    [n, C*tp*ps*ps] f32, grid (t, h, w))."""
    h, w = _hw_of(image)
    factor = patch_size * merge_size
    h_bar, w_bar = smart_resize(h, w, factor, min_pixels, max_pixels)
    arr = _resize_normalize(image, h_bar, w_bar)[None]   # [1, C, H, W]
    patches = np.repeat(arr, temporal_patch_size, axis=0)
    return _patchify(patches, h_bar, w_bar, patch_size, merge_size,
                     temporal_patch_size)


def preprocess_video(frames: Sequence, patch_size: int = 14,
                     merge_size: int = 2, temporal_patch_size: int = 2,
                     min_pixels: int = 56 * 56,
                     max_pixels: int = 14 * 14 * 4 * 1280
                     ) -> Tuple[np.ndarray, Tuple[int, int, int]]:
    """frames: sequence of PIL.Image | np.ndarray [H, W, 3] uint8 (one
    video) -> (patch rows [n, C*tp*ps*ps] f32, grid (t, h, w)).

    Mirrors the HF Qwen2VLImageProcessor video path (and the reference's
    vit_preprocess.py video flow): every frame smart-resized to the size
    derived from the FIRST frame (uniform stack), frame count padded to a
    temporal_patch_size multiple by repeating the last frame, then the
    same spatial-merge patch reorder with grid_t = T / tp."""
    if not frames:
        raise ValueError("empty video")
    h, w = _hw_of(frames[0])
    factor = patch_size * merge_size
    h_bar, w_bar = smart_resize(h, w, factor, min_pixels, max_pixels)
    stack = np.stack([_resize_normalize(f, h_bar, w_bar) for f in frames])
    tp = temporal_patch_size
    if stack.shape[0] % tp:
        pad = tp - stack.shape[0] % tp
        stack = np.concatenate([stack, np.repeat(stack[-1:], pad, axis=0)])
    return _patchify(stack, h_bar, w_bar, patch_size, merge_size, tp)
