"""Arbiter: per-layer numeric parity dumps and comparison.

Reference: the Arbiter dumper (csrc/utility/arbiter.h:20-44 +
python/pyhie/allspark/arbiter_fileclient.py, env ALLSPARK_DUMP) writes per-op
npy files each step and compares them against a golden run (HF/vLLM) — the
de-facto cross-implementation accuracy test (SURVEY.md §5.2, §8.13).

Here: `dump_prefill(path, ...)` runs the functional prefill capturing each
layer's hidden state (plus embeddings and final logits) into one npz;
`compare(path_a, path_b)` reports per-tensor max abs/rel error. Use
`hf_layer_dump` to produce the golden npz from a HF torch model.
"""

import dataclasses
from typing import Dict, List, Optional, Tuple

import numpy as np

from dashinfer_tpu.config import CacheConfig, CacheMode, ModelConfig
from dashinfer_tpu.utils import get_logger

logger = get_logger("arbiter")


def dump_prefill(path: str, cfg: ModelConfig, params, input_ids: List[int],
                 mode: CacheMode = CacheMode.DEFAULT) -> Dict[str, np.ndarray]:
    """Run prefill over `input_ids` capturing per-layer hidden states."""
    import jax
    import jax.numpy as jnp
    from dashinfer_tpu.models import transformer
    from dashinfer_tpu.runtime.kv_cache import create_kv_cache

    T = len(input_ids)
    ps = 128
    maxP = -(-T // ps)
    cache = create_kv_cache(cfg, CacheConfig(page_size=ps, num_pages=maxP + 1),
                            (maxP + 1) * cfg.num_layers,
                            model_dtype=jnp.float32)
    params = jax.tree.map(jnp.asarray, params)
    tokens = jnp.asarray(np.asarray(input_ids, np.int32))

    captures: Dict[str, np.ndarray] = {}
    hidden = params["embed_tokens"]["w"][tokens].astype(
        transformer.params_dtype(params))
    captures["embeddings"] = np.asarray(hidden, np.float32)

    page_row = jnp.arange(maxP, dtype=jnp.int32)
    L = cfg.num_layers
    from dashinfer_tpu.models.transformer import prefill_forward_captured
    hiddens, logits = prefill_forward_captured(
        cfg, params, tokens, cache, page_row, jnp.int32(0), jnp.int32(T),
        mode=mode)
    for i in range(L):
        captures[f"layer_{i:03d}"] = np.asarray(hiddens[i], np.float32)
    captures["logits"] = np.asarray(logits, np.float32)
    np.savez_compressed(path, **captures)
    logger.info("arbiter dump: %d tensors -> %s", len(captures), path)
    return captures


def hf_layer_dump(path: str, torch_model, input_ids: List[int]
                  ) -> Dict[str, np.ndarray]:
    """Golden npz from a HF torch model (output_hidden_states)."""
    import torch
    with torch.no_grad():
        out = torch_model(input_ids=torch.tensor([input_ids]),
                          output_hidden_states=True)
    captures = {"embeddings": out.hidden_states[0][0].float().numpy()}
    for i, h in enumerate(out.hidden_states[1:]):
        captures[f"layer_{i:03d}"] = h[0].float().numpy()
    captures["logits"] = out.logits[0].float().numpy()
    np.savez_compressed(path, **captures)
    return captures


def compare(path_a: str, path_b: str, rtol: float = 1e-3,
            atol: float = 1e-3) -> Dict[str, Tuple[float, float, bool]]:
    """Per-tensor (max_abs_err, max_rel_err, ok). Mirrors the reference's
    strict/tolerance compare modes."""
    a = np.load(path_a)
    b = np.load(path_b)
    report = {}
    for key in sorted(set(a.files) & set(b.files)):
        x, y = a[key], b[key]
        if x.shape != y.shape:
            report[key] = (float("inf"), float("inf"), False)
            continue
        abs_err = float(np.abs(x - y).max())
        denom = float(np.abs(y).max()) + 1e-9
        rel_err = abs_err / denom
        report[key] = (abs_err, rel_err,
                       bool(abs_err <= atol or rel_err <= rtol))
    for key, (ae, re_, ok) in report.items():
        logger.info("%-12s abs=%.3e rel=%.3e %s", key, ae, re_,
                    "OK" if ok else "MISMATCH")
    return report
