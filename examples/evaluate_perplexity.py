"""Perplexity evaluation over a local text file (WikiText-2 style).

Reference methodology (SURVEY.md §8.13): accuracy evals via chat benchmarks
+ per-op arbiter; this repo's north-star accuracy metric is WikiText-2
perplexity delta between quantized and BF16 (BASELINE.json). No network in
this environment, so the harness takes any local text file (or --synthetic
for a deterministic pseudo-corpus) and reports ppl for a checkpoint under
each quantization mode.

Usage:
  python examples/evaluate_perplexity.py --model <hf_dir> \
      [--text wiki.test.txt] [--quant none a16w8 a16w4] [--stride 512]
"""

import argparse
import math
import sys

import numpy as np


def ppl_for_params(cfg, params, token_ids, seq_len=512, stride=512):
    import jax
    import jax.numpy as jnp
    from dashinfer_tpu.config import CacheConfig, CacheMode
    from dashinfer_tpu.models import transformer
    from dashinfer_tpu.runtime.kv_cache import create_kv_cache

    params = jax.tree.map(jnp.asarray, params)
    maxP = -(-seq_len // 128)
    cache0 = create_kv_cache(cfg, CacheConfig(page_size=128,
                                              num_pages=maxP + 1),
                             (maxP + 1) * cfg.num_layers,
                             model_dtype=jnp.bfloat16)
    page_row = jnp.arange(maxP, dtype=jnp.int32)

    @jax.jit
    def window_nll(params, cache, tokens, n_pred):
        _, logits = transformer.prefill_forward_captured(
            cfg, params, tokens, cache, page_row, jnp.int32(0),
            jnp.int32(seq_len), mode=CacheMode.DEFAULT)
        lp = jax.nn.log_softmax(logits[:-1], axis=-1)
        tgt = tokens[1:]
        tok_lp = jnp.take_along_axis(lp, tgt[:, None], axis=1)[:, 0]
        idx = jnp.arange(tok_lp.shape[0])
        mask = idx >= (seq_len - 1 - n_pred)
        return -jnp.sum(jnp.where(mask, tok_lp, 0.0)), jnp.sum(mask)

    total_nll, total_tok = 0.0, 0
    for start in range(0, max(len(token_ids) - seq_len, 1), stride):
        window = token_ids[start:start + seq_len]
        if len(window) < seq_len:
            break
        n_pred = min(stride, seq_len - 1) if start else seq_len - 1
        nll, n = window_nll(params, jax.tree.map(jnp.copy, cache0),
                            jnp.asarray(window, jnp.int32),
                            jnp.int32(n_pred))
        total_nll += float(nll)
        total_tok += int(n)
    return math.exp(total_nll / max(total_tok, 1))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", required=True)
    ap.add_argument("--text", default=None)
    ap.add_argument("--synthetic", action="store_true")
    ap.add_argument("--quant", nargs="*", default=["none"])
    ap.add_argument("--seq-len", type=int, default=512)
    ap.add_argument("--stride", type=int, default=512)
    ap.add_argument("--max-tokens", type=int, default=16384)
    args = ap.parse_args()

    from dashinfer_tpu.config import QuantConfig
    from dashinfer_tpu.loader import build_from_hf
    from dashinfer_tpu.loader.quantize import quantize_params

    cfg, params = build_from_hf(args.model, "bfloat16")

    if args.text:
        text = open(args.text).read()
        try:
            from transformers import AutoTokenizer
            tok = AutoTokenizer.from_pretrained(args.model)
            ids = tok(text)["input_ids"][:args.max_tokens]
        except Exception:
            ids = [ord(c) % cfg.vocab_size for c in text][:args.max_tokens]
    else:
        rng = np.random.RandomState(0)
        ids = rng.randint(1, cfg.vocab_size,
                          size=args.max_tokens).tolist()
        print("(synthetic corpus — ppl values only meaningful as DELTAS "
              "between quant modes)")

    base_ppl = None
    for mode in args.quant:
        qp = params if mode == "none" else \
            quantize_params(params, QuantConfig(mode=mode, group_size=128))
        ppl = ppl_for_params(cfg, qp, ids, args.seq_len, args.stride)
        delta = "" if base_ppl is None else f"  (delta {ppl - base_ppl:+.4f})"
        if base_ppl is None:
            base_ppl = ppl
        print(f"quant={mode:8s} ppl={ppl:.4f}{delta}")


if __name__ == "__main__":
    main()
