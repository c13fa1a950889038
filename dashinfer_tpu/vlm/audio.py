"""Audio modality (Qwen2-Audio style): encoder wrapper + request assembly.

Reference: multimodal/dashinfer_vlm's audio path wraps the HF
`Qwen2AudioEncoder` on the host and injects the resulting embeddings into
the LLM through the same placeholder-token channel as vision
(utils/audio_encoder.py:1-25; extra_embedding.hpp keyed by placeholder id,
SURVEY.md §2.19). The engine-side mechanism here is identical —
`mm_info` = [(placeholder_id, rows)] on the GenerationConfig — so audio
rides the already-tested RichEmbedding-equivalent injection and works with
the prefix cache (embeddings hash into the page identity like text).
"""

from typing import Dict, Optional, Sequence

import numpy as np

from dashinfer_tpu.utils import get_logger

logger = get_logger("vlm.audio")


class AudioEncoder:
    """Host-side audio tower. Wraps the HF Qwen2-Audio encoder when
    transformers provides it (same approach as the reference); otherwise
    accepts precomputed features via `embed_features`."""

    def __init__(self, model_name_or_path: Optional[str] = None,
                 device: str = "cpu"):
        self._model = None
        self._processor = None
        if model_name_or_path is not None:
            from transformers import (AutoProcessor,
                                      Qwen2AudioForConditionalGeneration)
            m = Qwen2AudioForConditionalGeneration.from_pretrained(
                model_name_or_path)
            self._model = m.audio_tower.to(device).eval()
            self._proj = m.multi_modal_projector.to(device).eval()
            self._processor = AutoProcessor.from_pretrained(
                model_name_or_path)

    def embed_waveform(self, audio: np.ndarray, sampling_rate: int
                       ) -> np.ndarray:
        """Raw waveform -> LLM-space embedding rows [n, hidden], cropped to
        the clip's true output length (the feature extractor pads mel
        features to the max 30 s window; HF crops via
        _get_feat_extract_output_lengths(feature_attention_mask))."""
        import torch
        if self._model is None:
            raise RuntimeError("AudioEncoder built without a checkpoint; "
                               "use embed_features with precomputed rows")
        dev = next(self._model.parameters()).device
        feats = self._processor.feature_extractor(
            audio, sampling_rate=sampling_rate, return_tensors="pt",
            return_attention_mask=True)
        x = feats.input_features.to(dev)
        with torch.no_grad():
            enc = self._model(x).last_hidden_state
            rows = self._proj(enc)[0]
        mask = getattr(feats, "attention_mask", None)
        if mask is not None:
            mel_len = int(mask[0].sum())
            out_len = int(self._model._get_feat_extract_output_lengths(
                torch.tensor(mel_len)))
            rows = rows[:out_len]
        return rows.float().cpu().numpy()

    @staticmethod
    def embed_features(rows: np.ndarray) -> np.ndarray:
        """Pass-through for precomputed LLM-space rows [n, hidden]."""
        return np.asarray(rows, np.float32)


def build_request_audio(audio_embeds: Sequence[np.ndarray],
                        audio_pad_token_id: int) -> Dict:
    """GenerationConfig fields injecting audio embeddings at runs of the
    audio placeholder token — the identical channel as vision."""
    from dashinfer_tpu.vlm.runner import build_request_qwen_vl
    return build_request_qwen_vl(audio_embeds, audio_pad_token_id)
