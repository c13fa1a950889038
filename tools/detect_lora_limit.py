"""Detect serviceable LoRA pool limits for a model on this chip.

Reference: tools/detect-lora-limit.py probes how many adapters of what rank
fit by trial engine startups. The TPU build's LoRA pool is a fixed-shape
stacked array `[L, max_num, in, r_max]` + `[L, max_num, r_max, out]` per
target (lora/manager.py), so the memory is exactly computable — no trial
runs needed. This tool reports the pool bytes for a (max_num, max_rank)
grid against the chip's free HBM after weights + KV pool, and the largest
config that fits.

Usage:
  python tools/detect_lora_limit.py --model qwen2-7b [--hbm-gb 16]
         [--weight-bits 4] [--kv-fraction 0.3]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SHAPES = {
    # (hidden, inter, layers, heads, kv_heads, head_dim, vocab)
    "qwen2-0.5b": (896, 4864, 24, 14, 2, 64, 151936),
    "qwen2-7b": (3584, 18944, 28, 28, 4, 128, 152064),
    "llama3-8b": (4096, 14336, 32, 32, 8, 128, 128256),
}


def lora_pool_bytes(hid, inter, H, KH, D, L, max_num, max_rank,
                    dtype_bytes=2):
    """Stacked A/B pool bytes across the 7 target modules
    (lora/manager.py TARGETS)."""
    dims = [(hid, H * D), (hid, KH * D), (hid, KH * D), (H * D, hid),
            (hid, inter), (hid, inter), (inter, hid)]
    total = 0
    for kin, kout in dims:
        total += L * max_num * (kin * max_rank + max_rank * kout) \
            * dtype_bytes
    return total


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="qwen2-7b", choices=sorted(SHAPES))
    ap.add_argument("--hbm-gb", type=float, default=16.0,
                    help="chip HBM (v5e = 16)")
    ap.add_argument("--weight-bits", type=int, default=4)
    ap.add_argument("--kv-fraction", type=float, default=0.3,
                    help="fraction of post-weight HBM reserved for KV")
    args = ap.parse_args()

    hid, inter, L, H, KH, D, V = SHAPES[args.model]
    params = (L * (hid * (H + 2 * KH) * D + H * D * hid + 3 * hid * inter)
              + 2 * V * hid)
    weight_bytes = params * args.weight_bits / 8
    hbm = args.hbm_gb * (1 << 30)
    free = (hbm - weight_bytes) * (1 - args.kv_fraction)
    print(f"{args.model}: ~{params/1e9:.2f}B params, weights "
          f"{weight_bytes/2**30:.2f} GiB at {args.weight_bits}-bit, "
          f"budget for LoRA pool {free/2**30:.2f} GiB")

    best = None
    print(f"{'max_num':>8} {'max_rank':>9} {'pool GiB':>9} fits")
    for max_num in (1, 2, 4, 8, 16, 32):
        for max_rank in (8, 16, 32, 64, 128):
            b = lora_pool_bytes(hid, inter, H, KH, D, L, max_num, max_rank)
            fits = b <= free
            print(f"{max_num:>8} {max_rank:>9} {b/2**30:>9.3f} "
                  f"{'yes' if fits else 'no'}")
            if fits and (best is None or max_num * max_rank >
                         best[0] * best[1]):
                best = (max_num, max_rank)
    if best:
        print(f"\nlargest fitting config: lora_max_num={best[0]} "
              f"lora_max_rank={best[1]}  (RuntimeConfigBuilder().lora("
              f"True, {best[0]}, {best[1]}))")
    else:
        print("\nno LoRA pool fits the remaining HBM")


if __name__ == "__main__":
    main()
