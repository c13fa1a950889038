"""Qwen2-VL: vision tower (JAX) + mRoPE positions + text-model registration.

Reference (SURVEY.md §2.19): the VLM toolkit runs the ViT OUTSIDE the engine
(TensorRT/HIE workers, multimodal/dashinfer_vlm/vl_inference/runtime/
hie_worker.py) and injects the resulting embeddings through the
`RichEmbedding` op keyed by placeholder token ids (rich_embedding_op.cpp,
common/extra_embedding.hpp:17-80), with mRoPE positions computed host-side
per request (hie_allspark_worker.py:31-105). Same split here: the vision
tower below is a pure-jnp function (jit once per grid bucket), the engine
injects `mm_info` embeddings into the prefill embedding buffer, and mRoPE
rides the rotary module's `mrope_cos_sin`.

Vision architecture (HF Qwen2VisionTransformerPretrainedModel): 3D patch
embed (conv == linear over [C*tp*ps*ps]), 2D rotary over (h, w) patch
coordinates in spatial-merge order, pre-norm blocks (LayerNorm + full
attention per image + quick-GELU MLP), then the PatchMerger (LayerNorm +
MLP over spatial_merge_size^2 groups) into the text hidden size.
"""

import dataclasses
import math
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from dashinfer_tpu.config import ModelConfig, PositionEmbedding, RopeScaling
from dashinfer_tpu.models.common import LlamaFamilyConverter, _cast, _to_np, \
    stack_layer_trees
from dashinfer_tpu.models.registry import register_model


@dataclasses.dataclass(frozen=True)
class VisionConfig:
    depth: int
    embed_dim: int
    hidden_size: int          # output (text) hidden size
    num_heads: int
    mlp_ratio: float
    patch_size: int = 14
    spatial_merge_size: int = 2
    temporal_patch_size: int = 2
    in_channels: int = 3

    @property
    def head_dim(self) -> int:
        return self.embed_dim // self.num_heads

    @property
    def patch_input_dim(self) -> int:
        return (self.in_channels * self.temporal_patch_size *
                self.patch_size * self.patch_size)


def vision_config_from_hf(v: dict) -> VisionConfig:
    return VisionConfig(
        depth=v["depth"], embed_dim=v["embed_dim"],
        hidden_size=v["hidden_size"], num_heads=v["num_heads"],
        mlp_ratio=v.get("mlp_ratio", 4),
        patch_size=v.get("patch_size", 14),
        spatial_merge_size=v.get("spatial_merge_size", 2),
        temporal_patch_size=v.get("temporal_patch_size", 2),
        in_channels=v.get("in_channels", 3))


def convert_hf_visual(tensors: Dict, vcfg: VisionConfig, dtype=np.float32,
                      prefix: str = "model.visual.") -> Dict:
    """HF visual.* state dict -> stacked jnp-ready params (numpy)."""
    def get(name):
        return _to_np(tensors[prefix + name])

    def lin(name):
        return {"w": _cast(get(name + ".weight").T, dtype),
                "b": _cast(get(name + ".bias"), dtype)}

    def block(i):
        p = f"blocks.{i}."
        return {
            "norm1_w": _cast(get(p + "norm1.weight"), dtype),
            "norm1_b": _cast(get(p + "norm1.bias"), dtype),
            "norm2_w": _cast(get(p + "norm2.weight"), dtype),
            "norm2_b": _cast(get(p + "norm2.bias"), dtype),
            "qkv": lin(p + "attn.qkv"),
            "proj": lin(p + "attn.proj"),
            "fc1": lin(p + "mlp.fc1"),
            "fc2": lin(p + "mlp.fc2"),
        }

    pe = get("patch_embed.proj.weight")   # [E, C, tp, ps, ps]
    E = pe.shape[0]
    return {
        "patch_embed": {"w": _cast(pe.reshape(E, -1).T, dtype)},
        "blocks": stack_layer_trees([block(i) for i in range(vcfg.depth)]),
        "ln_q_w": _cast(get("merger.ln_q.weight"), dtype),
        "ln_q_b": _cast(get("merger.ln_q.bias"), dtype),
        "merger0": lin("merger.mlp.0"),
        "merger2": lin("merger.mlp.2"),
    }


def vision_rot_pos_ids(grid_thw: Sequence[Sequence[int]],
                       merge: int) -> np.ndarray:
    """Per-patch (h, w) coordinates in spatial-merge order (HF rot_pos_emb)."""
    out = []
    for t, h, w in grid_thw:
        hpos = np.arange(h)[:, None].repeat(w, 1)
        hpos = hpos.reshape(h // merge, merge, w // merge, merge)
        hpos = hpos.transpose(0, 2, 1, 3).reshape(-1)
        wpos = np.arange(w)[None, :].repeat(h, 0)
        wpos = wpos.reshape(h // merge, merge, w // merge, merge)
        wpos = wpos.transpose(0, 2, 1, 3).reshape(-1)
        out.append(np.tile(np.stack([hpos, wpos], axis=-1), (t, 1)))
    return np.concatenate(out, axis=0)


def _layer_norm(x, w, b, eps=1e-6):
    mu = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.var(x, axis=-1, keepdims=True)
    return (x - mu) * jax.lax.rsqrt(var + eps) * w + b


def _quick_gelu(x):
    return x * jax.nn.sigmoid(1.702 * x)


def vision_forward(vcfg: VisionConfig, vparams: Dict, pixels: jnp.ndarray,
                   grid_thw: Sequence[Sequence[int]]) -> jnp.ndarray:
    """pixels: [n_patches, C*tp*ps*ps] f32 (HF pixel_values layout);
    grid_thw: list of (t, h, w) per image/video. Returns
    [n_patches / merge^2, hidden_size] embeddings.

    Attention is segmented per image (HF cu_seqlens): implemented with a
    block mask over the concatenated patch sequence.
    """
    m = vcfg.spatial_merge_size
    D = vcfg.head_dim
    H = vcfg.num_heads
    x = jnp.dot(pixels.astype(jnp.float32), vparams["patch_embed"]["w"])

    # 2D rotary tables: half the rot dims carry h, half w (HF: inv_freq over
    # head_dim//4, emb = cat([h, w]) then duplicated)
    pos = vision_rot_pos_ids(grid_thw, m)                  # [n, 2]
    n = pos.shape[0]
    rot = D // 2
    inv_freq = 1.0 / (10000.0 ** (np.arange(0, rot, 2, dtype=np.float32)
                                  / rot))
    ang = pos[:, :, None].astype(np.float32) * inv_freq    # [n, 2, rot/2]
    ang = ang.reshape(n, -1)                               # [n, rot] (h||w)
    cos = jnp.asarray(np.cos(np.concatenate([ang, ang], -1)))  # [n, D]
    sin = jnp.asarray(np.sin(np.concatenate([ang, ang], -1)))

    # per-image segment ids for masked attention
    seg = np.concatenate([
        np.full(int(t) * int(h) * int(w), i, np.int32)
        for i, (t, h, w) in enumerate(grid_thw)])
    # HF cu_seqlens splits videos per FRAME (h*w per segment)
    seg = np.concatenate([
        np.repeat(np.arange(int(t)) + off * 1000, int(h) * int(w))
        for off, (t, h, w) in enumerate(grid_thw)])
    segj = jnp.asarray(seg)
    mask = (segj[:, None] == segj[None, :])

    def rope(v):  # v: [n, H, D]
        c = cos[:, None, :]
        s = sin[:, None, :]
        half = D // 2
        rot_half = jnp.concatenate([-v[..., half:], v[..., :half]], axis=-1)
        return v * c + rot_half * s

    def block(x, bp):
        h1 = _layer_norm(x, bp["norm1_w"], bp["norm1_b"])
        qkv = jnp.dot(h1, bp["qkv"]["w"]) + bp["qkv"]["b"]
        q, k, v = jnp.split(qkv.reshape(n, 3, H, D), 3, axis=1)
        q, k, v = q[:, 0], k[:, 0], v[:, 0]
        q = rope(q)
        k = rope(k)
        scores = jnp.einsum("qhd,khd->hqk", q, k) / math.sqrt(D)
        scores = jnp.where(mask[None], scores, -1e30)
        probs = jax.nn.softmax(scores, axis=-1)
        attn = jnp.einsum("hqk,khd->qhd", probs, v).reshape(n, -1)
        x = x + jnp.dot(attn, bp["proj"]["w"]) + bp["proj"]["b"]
        h2 = _layer_norm(x, bp["norm2_w"], bp["norm2_b"])
        y = _quick_gelu(jnp.dot(h2, bp["fc1"]["w"]) + bp["fc1"]["b"])
        x = x + jnp.dot(y, bp["fc2"]["w"]) + bp["fc2"]["b"]
        return x

    L = vparams["blocks"]["norm1_w"].shape[0]
    for i in range(L):
        bp = jax.tree.map(lambda a: a[i], vparams["blocks"])
        x = block(x, bp)

    # PatchMerger: ln then group merge^2 patches -> MLP
    x = _layer_norm(x, vparams["ln_q_w"], vparams["ln_q_b"])
    x = x.reshape(-1, vcfg.embed_dim * m * m)
    x = jnp.dot(x, vparams["merger0"]["w"]) + vparams["merger0"]["b"]
    x = jax.nn.gelu(x, approximate=False)
    x = jnp.dot(x, vparams["merger2"]["w"]) + vparams["merger2"]["b"]
    return x


# ---------------------------------------------------------------------------
# mRoPE positions (reference mrope position lists computed host-side,
# hie_allspark_worker.py:31-105; HF Qwen2VLModel.get_rope_index)
# ---------------------------------------------------------------------------

def get_mrope_positions(input_ids: List[int],
                        grid_thw: Sequence[Sequence[int]],
                        image_token_id: int, video_token_id: int,
                        merge: int) -> Tuple[np.ndarray, int]:
    """Returns (positions [3, seq] int32, rope_delta). Text runs advance all
    three axes together; each vision span uses (t, h, w) grids starting at
    the running position."""
    ids = list(map(int, input_ids))
    n = len(ids)
    pos = np.zeros((3, n), np.int32)
    st = 0        # running position base
    i = 0
    img_idx = 0
    while i < n:
        if ids[i] in (image_token_id, video_token_id):
            t, h, w = (int(v) for v in grid_thw[img_idx])
            lh, lw = h // merge, w // merge
            span = t * lh * lw
            t_idx = np.repeat(np.arange(t), lh * lw)
            h_idx = np.tile(np.repeat(np.arange(lh), lw), t)
            w_idx = np.tile(np.arange(lw), t * lh)
            pos[0, i:i + span] = st + t_idx
            pos[1, i:i + span] = st + h_idx
            pos[2, i:i + span] = st + w_idx
            st = st + max(t, lh, lw)
            i += span
            img_idx += 1
        else:
            pos[:, i] = st
            st += 1
            i += 1
    delta = int(pos.max()) + 1 - n if n else 0
    return pos, delta


# ---------------------------------------------------------------------------
# text model registration
# ---------------------------------------------------------------------------

def _text_config(hf: dict) -> ModelConfig:
    t = hf.get("text_config", hf)
    rope_scaling = t.get("rope_scaling") or {}
    section = tuple(rope_scaling.get("mrope_section", ()))
    head_dim = t.get("head_dim") or t["hidden_size"] // t["num_attention_heads"]
    return ModelConfig(
        arch="qwen2_vl",
        vocab_size=t["vocab_size"],
        hidden_size=t["hidden_size"],
        intermediate_size=t["intermediate_size"],
        num_layers=t["num_hidden_layers"],
        num_heads=t["num_attention_heads"],
        num_kv_heads=t.get("num_key_value_heads", t["num_attention_heads"]),
        head_dim=head_dim,
        rms_norm_eps=t.get("rms_norm_eps", 1e-6),
        rope_theta=t.get("rope_theta", 1000000.0),
        max_position_embeddings=t.get("max_position_embeddings", 32768),
        qkv_bias=True,
        tie_word_embeddings=t.get("tie_word_embeddings", False),
        position_embedding=PositionEmbedding.MROPE,
        mrope_section=section,
    )


@register_model("Qwen2VLForConditionalGeneration", "qwen2_vl")
def build_qwen2_vl():
    return _text_config, LlamaFamilyConverter(
        qkv_bias=True, prefix="model.language_model.")
