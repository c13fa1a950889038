"""Quantization-accuracy artifact (in lieu of the WikiText-2 ppl gate —
no corpus and no checkpoint egress exist in this environment; BASELINE.md
documents that limitation).

Measured end to end through the real engine forward, per quantization
mode (a16w8, a16w4, and the u4 -> per-channel-i8 re-expansion the
large-batch decode stream serves):

- the ENGINE row: the quantized forward vs the bf16 reference;
- the ORACLE row (VERDICT r4 #6): the SAME quantized leaves dequantized
  to dense f32 and run through the DENSE forward — this isolates the
  intrinsic quantizer error from any kernel error;
- engine_vs_oracle: the engine forward against its own dequant oracle.
  engine ~= oracle (top-1 ~1.0, tiny rms) means every logit difference
  vs bf16 is the QUANTIZER's rounding, not a kernel bug.

Two weight styles: "random" i.i.d. gaussians (HARSH: random logits are
near-tied, so quant noise flips argmaxes far more than trained stats
would) and "structured" (low-rank + heavy-tailed outliers — closer to
trained-model spectra, so top-1 agreement is interpretable).

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


def dequant_leaf_np(wd):
    """Dense f32 weight from a quantized leaf (group or per-channel,
    packed-u4 or int8 payload, any leading stack dims) — the oracle's
    weights are BY CONSTRUCTION the same numbers the engine kernels
    dequantize."""
    from dashinfer_tpu.ops.u4pack import unpack_u4_weight_np_like
    w_q = np.asarray(wd["w_q"])
    scale = np.asarray(wd["scale"], np.float32)
    zero = np.asarray(wd["zero"], np.float32)
    if w_q.dtype == np.int8:
        q = w_q.astype(np.float32)
    else:
        flat = w_q.reshape(-1, w_q.shape[-1])   # unpacker wants 2-D
        q = np.asarray(unpack_u4_weight_np_like(flat, np)).astype(
            np.float32).reshape(w_q.shape[:-1] + (2 * w_q.shape[-1],))
    K, N = q.shape[-2], q.shape[-1]
    G = scale.shape[-2]
    gs = K // G
    qg = q.reshape(q.shape[:-2] + (G, gs, N))
    w = qg * scale[..., :, None, :] + zero[..., :, None, :]
    out = {"w": w.reshape(q.shape).astype(np.float32)}
    if "b" in wd:
        out["b"] = wd["b"]
    return out


def dequant_tree(params):
    def walk(node):
        if isinstance(node, dict):
            if "w_q" in node:
                return dequant_leaf_np(node)
            return {k: walk(v) for k, v in node.items()}
        return node
    return walk(params)


def metrics(lg, ref):
    """rms/max relative logit error, greedy top-1 agreement, KL(ref||lg)."""
    d = lg - ref
    scale = np.abs(ref).max(-1, keepdims=True) + 1e-6
    ref_p = np.exp(ref - ref.max(-1, keepdims=True))
    ref_p /= ref_p.sum(-1, keepdims=True)
    lp = lg - lg.max(-1, keepdims=True)
    lp = lp - np.log(np.exp(lp).sum(-1, keepdims=True))
    kl = float(np.mean(np.sum(
        ref_p * (np.log(ref_p + 1e-20) - lp), axis=-1)))
    return {
        "logit_rms_rel": round(
            float(np.sqrt(((d / scale) ** 2).mean())), 5),
        "logit_max_rel": round(float(np.abs(d / scale).max()), 5),
        "top1_agree": round(float(
            (lg.argmax(-1) == ref.argmax(-1)).mean()), 4),
        "kl": round(kl, 6),
    }


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

    def build_base(style, seed=7):
        rng = np.random.RandomState(seed)

        def w(*shape):
            if style == "random":
                return rng.randn(*shape).astype(np.float32) * 0.02
            # structured: low-rank spectrum + heavy-tailed outliers —
            # trained-weight-like stats (peaked logits, so top-1
            # agreement measures what a real checkpoint would see)
            *lead, kin, kout = shape
            r = max(8, min(kin, kout) // 8)
            u = rng.randn(*lead, kin, r).astype(np.float32)
            vt = rng.randn(*lead, r, kout).astype(np.float32)
            base = (u @ vt) / np.sqrt(r)
            out_mask = (rng.rand(*base.shape) < 1e-3).astype(np.float32)
            base = base + out_mask * rng.randn(*base.shape).astype(
                np.float32) * 8.0
            return (base * 0.02).astype(np.float32)

        D = cfg.head_dim
        return {
            "embed_tokens": {"w": rng.randn(V, hid).astype(np.float32)
                             * 0.02},
            "norm": np.ones((hid,), np.float32),
            "lm_head": {"w": w(hid, V)},
            "layers": {
                "input_layernorm": np.ones((L, hid), np.float32),
                "post_attention_layernorm": np.ones((L, hid), np.float32),
                "q_proj": {"w": w(L, hid, H * D),
                           "b": np.zeros((L, H * D), np.float32)},
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

    import functools
    from dashinfer_tpu.config import CacheConfig, CacheMode
    from dashinfer_tpu.runtime.kv_cache import create_kv_cache
    ps = 64
    npages = -(-args.len // ps) + 1
    ccfg = CacheConfig(page_size=ps, num_pages=npages + 1)

    fwd = jax.jit(functools.partial(transformer.prefill_forward_captured,
                                    cfg, mode=CacheMode.DEFAULT))

    def logits_of(params):
        # upload the param tree ONCE (re-uploading ~GBs per prompt through
        # the tunneled runtime made the 0.5b preset take hours)
        dev = jax.tree.map(jnp.asarray, params)
        jax.block_until_ready(dev)
        outs = []
        prng = np.random.RandomState(11)
        for _ in range(args.prompts):
            toks = prng.randint(1, V, size=args.len).astype(np.int32)
            cache = create_kv_cache(cfg, ccfg, npages * L,
                                    model_dtype=jnp.bfloat16)
            _, lg = fwd(dev, jnp.asarray(toks), cache,
                        jnp.arange(npages, dtype=jnp.int32), jnp.int32(0),
                        jnp.int32(args.len))
            outs.append(np.asarray(lg, np.float32)[:args.len])
        del dev
        return np.stack(outs)          # [P, T, V]

    import sys as _sys
    results = {}
    for style in ("structured", "random"):
        base = build_base(style)
        ref = logits_of(base)
        rows = {}
        w4 = quantize_params(base, QuantConfig(mode="a16w4",
                                               group_size=128))
        del base
        for name, qp_fn in (
                ("a16w8", lambda: quantize_params(
                    build_base(style), QuantConfig(mode="a16w8",
                                                   group_size=128))),
                ("a16w4", lambda: w4),
                ("a16w4->i8pc", lambda: mk.expand_u4_to_i8(w4))):
            qp = qp_fn()   # one variant in RAM at a time
            eng = logits_of(qp)
            orc = logits_of(dequant_tree(qp))
            rows[name] = {
                "engine_vs_bf16": metrics(eng, ref),
                "oracle_vs_bf16": metrics(orc, ref),
                # engine ~= oracle ==> every delta vs bf16 is quantizer
                # rounding, not a kernel bug
                "engine_vs_oracle": metrics(eng, orc),
            }
            print(f"[{style}] {name} done", file=_sys.stderr, flush=True)
            del qp, eng, orc
        del w4
        results[style] = rows
    art = {"metric": "quantization numeric accuracy vs bf16 "
                     f"({args.preset}, {args.prompts}x{args.len} prompts; "
                     "oracle = dense forward on dequantized SAME leaves; "
                     "no corpus/checkpoint egress in this env)",
           "weights": results}
    print(json.dumps(art))
    if args.json:
        with open(args.json, "w") as f:
            json.dump(art, f, indent=1)


if __name__ == "__main__":
    main()
