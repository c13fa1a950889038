"""Quantization-accuracy artifact (in lieu of the WikiText-2 ppl gate —
no corpus and no checkpoint egress exist in this environment; BASELINE.md
documents that limitation).

What this DOES measure, end to end through the real engine forward: the
numeric error each quantization mode adds over the bf16 reference on the
same weights — logit RMS/max relative error, greedy top-1 agreement, and
KL(bf16 || quant) — for a16w8, a16w4, and the u4 -> per-channel-i8
re-expansion the large-batch decode stream serves. Random weights make
this a HARSH test (random logits are near-tied, so any quant noise flips
argmaxes more easily than a trained model's peaked logits would).

Usage: python tools/quant_accuracy.py [--preset qwen2-0.5b] [--prompts 8]
Writes one JSON line; add --json PATH for an artifact file.
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "examples"))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--preset", default="tiny")
    ap.add_argument("--prompts", type=int, default=8)
    ap.add_argument("--len", type=int, default=64)
    ap.add_argument("--json", default="")
    args = ap.parse_args()

    if os.environ.get("JAX_PLATFORMS") == "cpu":
        import jax
        jax.config.update("jax_platforms", "cpu")
    import jax
    import jax.numpy as jnp
    from benchmark_throughput import PRESETS
    from dashinfer_tpu.config import ModelConfig, QuantConfig
    from dashinfer_tpu.loader.quantize import quantize_params
    from dashinfer_tpu.models import transformer
    from dashinfer_tpu.ops.pallas import megakernel as mk

    hid, inter, L, H, KH, V = PRESETS[args.preset]
    cfg = ModelConfig(arch="qwen2", vocab_size=V, hidden_size=hid,
                      intermediate_size=inter, num_layers=L, num_heads=H,
                      num_kv_heads=KH, head_dim=hid // H, qkv_bias=True,
                      rope_theta=1000000.0)
    rng = np.random.RandomState(7)

    def w(*shape):
        return rng.randn(*shape).astype(np.float32) * 0.02

    D = cfg.head_dim
    base = {
        "embed_tokens": {"w": w(V, hid)},
        "norm": np.ones((hid,), np.float32),
        "lm_head": {"w": w(hid, V)},
        "layers": {
            "input_layernorm": np.ones((L, hid), np.float32),
            "post_attention_layernorm": np.ones((L, hid), np.float32),
            "q_proj": {"w": w(L, hid, H * D), "b": np.zeros((L, H * D),
                                                           np.float32)},
            "k_proj": {"w": w(L, hid, KH * D),
                       "b": np.zeros((L, KH * D), np.float32)},
            "v_proj": {"w": w(L, hid, KH * D),
                       "b": np.zeros((L, KH * D), np.float32)},
            "o_proj": {"w": w(L, H * D, hid)},
            "gate_proj": {"w": w(L, hid, inter)},
            "up_proj": {"w": w(L, hid, inter)},
            "down_proj": {"w": w(L, inter, hid)},
        },
    }

    variants = {
        "a16w8": quantize_params(base, QuantConfig(mode="a16w8",
                                                   group_size=128)),
        "a16w4": quantize_params(base, QuantConfig(mode="a16w4",
                                                   group_size=128)),
    }
    variants["a16w4->i8pc"] = mk.expand_u4_to_i8(variants["a16w4"])

    import functools
    from dashinfer_tpu.config import CacheConfig, CacheMode
    from dashinfer_tpu.runtime.kv_cache import create_kv_cache
    ps = 64
    npages = -(-args.len // ps) + 1
    ccfg = CacheConfig(page_size=ps, num_pages=npages + 1)

    fwd = jax.jit(functools.partial(transformer.prefill_forward_captured,
                                    cfg, mode=CacheMode.DEFAULT))

    def logits_of(params):
        outs = []
        prng = np.random.RandomState(11)
        for _ in range(args.prompts):
            toks = prng.randint(1, V, size=args.len).astype(np.int32)
            cache = create_kv_cache(cfg, ccfg, npages * L,
                                    model_dtype=jnp.bfloat16)
            _, lg = fwd(jax.tree.map(jnp.asarray, params),
                        jnp.asarray(toks), cache,
                        jnp.arange(npages, dtype=jnp.int32), jnp.int32(0),
                        jnp.int32(args.len))
            outs.append(np.asarray(lg, np.float32)[:args.len])
        return np.stack(outs)          # [P, T, V]

    ref = logits_of(base)
    ref_p = np.exp(ref - ref.max(-1, keepdims=True))
    ref_p /= ref_p.sum(-1, keepdims=True)
    results = {}
    for name, params in variants.items():
        lg = logits_of(params)
        d = lg - ref
        scale = np.abs(ref).max(-1, keepdims=True) + 1e-6
        lp = lg - lg.max(-1, keepdims=True)
        lp = lp - np.log(np.exp(lp).sum(-1, keepdims=True))
        kl = float(np.mean(np.sum(
            ref_p * (np.log(ref_p + 1e-20) - lp), axis=-1)))
        results[name] = {
            "logit_rms_rel": round(float(np.sqrt((d / scale) ** 2).mean()),
                                   5),
            "logit_max_rel": round(float(np.abs(d / scale).max()), 5),
            "top1_agree": round(float(
                (lg.argmax(-1) == ref.argmax(-1)).mean()), 4),
            "kl_vs_bf16": round(kl, 6),
        }
    art = {"metric": "quantization numeric accuracy vs bf16 "
                     f"({args.preset}, {args.prompts}x{args.len} random "
                     "prompts, random weights — HARSH near-tie regime; "
                     "no corpus/checkpoint egress in this env)",
           "modes": results}
    print(json.dumps(art))
    if args.json:
        with open(args.json, "w") as f:
            json.dump(art, f, indent=1)


if __name__ == "__main__":
    main()
