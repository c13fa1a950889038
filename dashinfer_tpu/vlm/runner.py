"""Vision runner: jitted ViT execution + embedding cache + request assembly.

Reference: the ViT worker pool + embedding cache (hie_worker.py:42-400,
utils/cache/{local_cache,cache_manager}.py — per-image hashing keeps prefix
caching effective, extra_embedding.hpp CityHash note). Here the "worker" is
a jitted vision_forward per grid shape and the cache is a byte-budgeted LRU
keyed by a content hash of the preprocessed patches.
"""

import hashlib
from collections import OrderedDict
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

from dashinfer_tpu.models import qwen2_vl as VL
from dashinfer_tpu.utils import get_logger

logger = get_logger("vlm.runner")


def build_request_qwen_vl(image_embeds: Sequence[np.ndarray],
                          image_pad_token_id: int) -> Dict:
    """Qwen-VL v1 (QWenLMHeadModel + external ViT): each image occupies a
    fixed run of image-pad tokens between <img>/</img> markers; embeddings
    are injected by placeholder id and positions are standard 1-D RoPE (no
    mRoPE). Mirrors the reference's model_type QWEN-VL flow
    (vl_inference/runtime/qwen_vl.py) over the same RichEmbedding channel
    (extra_embedding.hpp:17-80). Returns GenerationConfig fields."""
    mm = [(image_pad_token_id, np.concatenate(list(image_embeds), axis=0))] \
        if len(image_embeds) else []
    return {"mm_info": mm}


class RedisEmbeddingStore:
    """Optional REMOTE embedding tier shared across serving processes
    (reference RedisCache over aquila TensorStore,
    multimodal utils/cache/redis_cache.py; the cache_manager falls back to
    the local LRU when redis is unreachable — same posture here). Values
    are raw float16 bytes + shape header; failures degrade to miss/no-op
    so the local tier always remains authoritative."""

    def __init__(self, host: str, port: int = 6379, password: str = "",
                 ttl_s: int = 300):
        import redis  # not in this image by default; ImportError -> caller
        self._r = redis.Redis(host=host, port=port, password=password,
                              socket_timeout=3.0)
        self.ttl_s = ttl_s

    def get(self, key: bytes) -> Optional[np.ndarray]:
        try:
            blob = self._r.get(b"di-vit:" + key)
        except Exception:
            logger.warning("redis tier get failed; treating as miss")
            return None
        if blob is None or len(blob) < 8:
            return None
        n, d = np.frombuffer(blob[:8], np.int32)
        return np.frombuffer(blob[8:], np.float16).reshape(n, d) \
            .astype(np.float32)

    def put(self, key: bytes, value: np.ndarray) -> None:
        v16 = np.ascontiguousarray(value, np.float16)
        hdr = np.asarray(v16.shape, np.int32).tobytes()
        try:
            self._r.set(b"di-vit:" + key, hdr + v16.tobytes(), ex=self.ttl_s)
        except Exception:
            logger.warning("redis tier put failed; local tier only")


class VisionRunner:
    def __init__(self, vcfg: VL.VisionConfig, vparams,
                 cache_bytes: int = 256 * 1024 * 1024, remote_store=None):
        """`remote_store`: optional second cache tier shared across
        processes — any object with get(key)->array|None and
        put(key, array) (e.g. RedisEmbeddingStore). Checked after the
        local LRU misses; populated on compute."""
        import jax
        import jax.numpy as jnp
        self.vcfg = vcfg
        self.vparams = jax.tree.map(jnp.asarray, vparams)
        self._cache: "OrderedDict[bytes, np.ndarray]" = OrderedDict()
        self._cache_bytes = 0
        self._capacity = cache_bytes
        self.remote_store = remote_store
        self.hits = 0
        self.remote_hits = 0
        self.misses = 0

    @staticmethod
    def content_key(patches: np.ndarray, grid) -> bytes:
        h = hashlib.blake2b(digest_size=16)
        h.update(np.ascontiguousarray(patches).tobytes())
        h.update(repr(tuple(grid)).encode())
        return h.digest()

    def embed(self, patches: np.ndarray, grid: Tuple[int, int, int]
              ) -> np.ndarray:
        """patches [n, C*tp*ps*ps] -> embeddings [n/merge^2, hidden]."""
        import jax.numpy as jnp
        key = self.content_key(patches, grid)
        hit = self._cache.get(key)
        if hit is not None:
            self._cache.move_to_end(key)
            self.hits += 1
            return hit
        if self.remote_store is not None:
            remote = self.remote_store.get(key)
            if remote is not None:
                self.remote_hits += 1
                self._cache_put(key, remote)
                return remote
        self.misses += 1
        out = np.asarray(VL.vision_forward(
            self.vcfg, self.vparams, jnp.asarray(patches), [tuple(grid)]))
        self._cache_put(key, out)
        if self.remote_store is not None:
            self.remote_store.put(key, out)
        return out

    def _cache_put(self, key: bytes, out: np.ndarray) -> None:
        self._cache[key] = out
        self._cache_bytes += out.nbytes
        while self._cache_bytes > self._capacity and self._cache:
            _, old = self._cache.popitem(last=False)
            self._cache_bytes -= old.nbytes

    def build_request(self, input_ids: List[int],
                      images: Sequence[Tuple[np.ndarray, Tuple[int, int, int]]],
                      image_token_id: int, video_token_id: int,
                      kinds: Optional[Sequence[str]] = None) -> Dict:
        """Run the ViT for each (patches, grid), compute mRoPE positions,
        and return the GenerationConfig fields for injection
        (mm_info / mrope_positions / mrope_position_delta).

        kinds (optional, parallel to `images`): "image" | "video" per
        item — videos' embeddings inject into video_token_id placeholder
        runs (reference model_type QWEN2-VL video flow). Default: all
        images."""
        embeds = [self.embed(p, g) for p, g in images]
        grids = [tuple(g) for _, g in images]
        pos, delta = VL.get_mrope_positions(
            input_ids, grids, image_token_id, video_token_id,
            self.vcfg.spatial_merge_size)
        kinds = list(kinds) if kinds is not None else ["image"] * len(embeds)
        mm = []
        for tok, kind in ((image_token_id, "image"),
                          (video_token_id, "video")):
            rows = [e for e, k in zip(embeds, kinds) if k == kind]
            if rows:
                mm.append((tok, np.concatenate(rows, axis=0)))
        return {"mm_info": mm, "mrope_positions": pos,
                "mrope_position_delta": delta}
