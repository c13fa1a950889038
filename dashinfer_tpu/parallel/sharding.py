"""Tensor-parallel sharding rules for the params pytree, KV cache, and state.

Replaces the reference's WeightSplitter hierarchy (weight_splitter.cpp:10-608
— VSPLIT/HSPLIT/QKVSPLIT/GROUP_VSPLIT/EPSPLIT...) and its graph-inserted
AllReduce/AllGather ops (qwen_v15.py:348-380): here sharding is DECLARED on
the arrays and XLA's SPMD partitioner inserts the collectives inside the
jitted step.

Mapping from the reference's split modes:
  VSPLIT  (col split: q/k/v/gate/up, out-dim)  -> P(..., MODEL) on out dim
  HSPLIT  (row split: o_proj/down, in-dim)     -> P(..., MODEL, None); the
           all-reduce the reference emits after these GEMMs falls out of the
           contraction over a sharded dim
  GROUP_VSPLIT (GQA-aware kv)                  -> same out-dim split; when
           tp > num_kv_heads the KV weights/cache replicate (the reference
           replicates groups the same way)
  EPSPLIT (expert parallel)                    -> experts dim over MODEL
  vocab split (embedding + lm_head)            -> P(MODEL, None) / P(None, MODEL)
"""

from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from dashinfer_tpu.config import ModelConfig, RuntimeConfig
from dashinfer_tpu.parallel.mesh import DATA_AXIS, MODEL_AXIS
from dashinfer_tpu.runtime.batch_state import DecodeState, SamplingParams
from dashinfer_tpu.runtime.kv_cache import KVCache
from dashinfer_tpu.utils import get_logger

logger = get_logger("sharding")


def _ns(mesh: Mesh, *spec) -> NamedSharding:
    return NamedSharding(mesh, P(*spec))


def _leaf_spec(path: str, ndim: int, ep: bool) -> P:
    """PartitionSpec for one params leaf, addressed by its tree path."""
    M = MODEL_AXIS
    # stacked layer leaves have a leading L dim; globals don't.
    lead = (None,) if path.startswith("layers/") else ()

    def spec(*tail):
        return P(*(lead + tail))

    if "embed_tokens" in path:
        return P(M, None)           # vocab split (reference embedding VSPLIT)
    if "lm_head" in path:
        return P(None, M)
    if path.endswith("norm") or "layernorm" in path or "_norm" in path:
        return spec(None) if ndim == 2 else P(None)
    if "experts/" in path:
        # [L, E, in, out]: expert-parallel over the model axis (EPSPLIT)
        if ep:
            return spec(M, None, None)
        # TP within experts on the ffn dim
        if "down_proj" in path:
            return spec(None, M, None)
        return spec(None, None, M)
    if "router" in path or "shared_expert_gate" in path:
        return spec(None, None)
    if any(k in path for k in ("q_proj", "k_proj", "v_proj", "gate_proj",
                               "up_proj")):
        if path.endswith("/b"):
            return spec(M)
        return spec(None, M)        # column split
    if any(k in path for k in ("o_proj", "down_proj")):
        if path.endswith("/b"):
            return spec(None)       # row-split bias replicated (added once —
                                    # reference zeroes bias on rank>0)
        return spec(M, None)        # row split
    return P(*([None] * ndim))


def _tree_paths(tree, prefix=""):
    out = {}
    if isinstance(tree, dict):
        for k, v in tree.items():
            out.update(_tree_paths(v, f"{prefix}{k}/"))
    else:
        out[prefix[:-1]] = tree
    return out


def param_shardings(params: Dict, mesh: Mesh, ep: bool = False):
    """Pytree of NamedShardings matching `params`. A leaf whose sharded
    dim is not divisible by the axis size (e.g. a per-channel quant scale
    with a size-1 group dim against a K-row split) falls back to
    replication — SPMD keeps the math correct either way."""
    def assign(path_tuple, leaf):
        path = "/".join(str(getattr(p, "key", p)) for p in path_tuple)
        spec = _leaf_spec(path, leaf.ndim, ep)
        for i, ax in enumerate(spec):
            if ax is None or i >= leaf.ndim:
                continue
            size = mesh.shape[ax] if isinstance(ax, str) else \
                int(np.prod([mesh.shape[a] for a in ax]))
            if leaf.shape[i] % size:
                spec = P(*([None] * leaf.ndim))
                break
        return NamedSharding(mesh, spec)
    return jax.tree_util.tree_map_with_path(assign, params)


def shard_params(params: Dict, mesh: Mesh, ep: bool = False) -> Dict:
    sh = param_shardings(params, mesh, ep)
    return jax.tree.map(jax.device_put, params, sh)


def cache_sharding(cfg: ModelConfig, mesh: Mesh):
    """Shardings for the KV-pool leaves: over kv heads when divisible, else
    replicated (the reference replicates GQA groups beyond the head count
    the same way). Payload pools [P, ps, KH*D] shard the packed head-major
    lane dim; qparams [P, 2*KH, ps] shard the per-head row pairs."""
    tp = mesh.shape[MODEL_AXIS]
    if cfg.num_kv_heads % tp == 0:
        head = MODEL_AXIS
    else:
        logger.warning("kv heads (%d) not divisible by model axis (%d); "
                       "replicating KV cache", cfg.num_kv_heads, tp)
        head = None
    payload = _ns(mesh, None, None, head)
    qparams = _ns(mesh, None, head, None)   # [rows, 2*KH, ps]
    return payload, qparams


def shard_cache(cache: KVCache, cfg: ModelConfig, mesh: Mesh) -> KVCache:
    payload, qparams = cache_sharding(cfg, mesh)
    return KVCache(
        k=jax.device_put(cache.k, payload),
        v=jax.device_put(cache.v, payload),
        k_qparams=(None if cache.k_qparams is None
                   else jax.device_put(cache.k_qparams, qparams)),
        v_qparams=(None if cache.v_qparams is None
                   else jax.device_put(cache.v_qparams, qparams)))


def shard_state(state: DecodeState, mesh: Mesh) -> DecodeState:
    """Decode state is replicated (tiny; sampling is deterministic per seed
    so every shard computes identical tokens — no broadcast needed, unlike
    the reference's NcclBcast of sampled ids, generate_op.cpp:606-637)."""
    rep = NamedSharding(mesh, P())
    return jax.tree.map(lambda x: jax.device_put(x, rep), state)
