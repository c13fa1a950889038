"""Throughput benchmark harness.

Equivalent of the reference examples/benchmark/benchmark_throughput.py
(SURVEY.md §8.8): drives the engine at a request rate, reports per-config
Avg_context_time (TTFT), Avg_generate_time, Avg_Req_Tput, Total_Tput, QPS,
plus prefix-cache hit rate sweeps.

Run (random weights, shape-faithful):
  python examples/benchmark_throughput.py --preset qwen2-0.5b --batch 8 \
      --in-len 128 --out-len 128
"""

import argparse
import sys
import threading
import time

import numpy as np

PRESETS = {
    # (hidden, inter, layers, heads, kv_heads, vocab)
    "tiny": (256, 512, 2, 8, 4, 2048),
    "qwen2-0.5b": (896, 4864, 24, 14, 2, 151936),
    "qwen2-1.5b": (1536, 8960, 28, 12, 2, 151936),
    "qwen2-7b": (3584, 18944, 28, 28, 4, 152064),
}


def build_random_model(preset: str, dtype: str, quant: str, group_size: int):
    import jax
    import jax.numpy as jnp
    from dashinfer_tpu.config import ModelConfig

    hid, inter, L, H, KH, V = PRESETS[preset]
    cfg = ModelConfig(arch="qwen2", vocab_size=V, hidden_size=hid,
                      intermediate_size=inter, num_layers=L, num_heads=H,
                      num_kv_heads=KH, head_dim=hid // H, qkv_bias=True,
                      rope_theta=1000000.0)
    jdt = jnp.bfloat16 if dtype == "bfloat16" else jnp.dtype(dtype)
    key = jax.random.PRNGKey(0)

    def rnd(*shape):
        nonlocal key
        key, k = jax.random.split(key)
        return (jax.random.normal(k, shape, jnp.float32) * 0.02).astype(jdt)

    D = cfg.head_dim
    params = {
        "embed_tokens": {"w": rnd(V, hid)},
        "norm": jnp.ones((hid,), jdt),
        "lm_head": {"w": rnd(hid, V)},
        "layers": {
            "input_layernorm": jnp.ones((L, hid), jdt),
            "post_attention_layernorm": jnp.ones((L, hid), jdt),
            "q_proj": {"w": rnd(L, hid, H * D), "b": jnp.zeros((L, H * D), jdt)},
            "k_proj": {"w": rnd(L, hid, KH * D), "b": jnp.zeros((L, KH * D), jdt)},
            "v_proj": {"w": rnd(L, hid, KH * D), "b": jnp.zeros((L, KH * D), jdt)},
            "o_proj": {"w": rnd(L, H * D, hid)},
            "gate_proj": {"w": rnd(L, hid, inter)},
            "up_proj": {"w": rnd(L, hid, inter)},
            "down_proj": {"w": rnd(L, inter, hid)},
        },
    }
    if quant != "none":
        import numpy as np
        from dashinfer_tpu.config import QuantConfig
        from dashinfer_tpu.loader.quantize import quantize_params
        host = jax.device_get(params)
        host = jax.tree.map(lambda x: np.asarray(x, np.float32)
                            if x.dtype != np.float32 else x, host)
        params = quantize_params(host, QuantConfig(mode=quant,
                                                   group_size=group_size))
    return cfg, params


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--preset", default="tiny", choices=sorted(PRESETS))
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--num-requests", type=int, default=16)
    ap.add_argument("--in-len", type=int, default=128)
    ap.add_argument("--out-len", type=int, default=128)
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--quant", default="none", choices=["none", "a16w8", "a16w4"])
    ap.add_argument("--group-size", type=int, default=128)
    ap.add_argument("--kv-cache-mode", default="default",
                    choices=["default", "int8", "uint4"])
    ap.add_argument("--prefix-cache", action="store_true")
    ap.add_argument("--prefix-share", type=float, default=0.0,
                    help="fraction of prompt shared across requests "
                         "(prefix-cache hit sweep)")
    ap.add_argument("--qps", type=float, default=0.0, help="0 = all at once")
    args = ap.parse_args()

    from dashinfer_tpu import Engine, GenerationConfig, RuntimeConfigBuilder
    from dashinfer_tpu.config import CacheMode

    cfg, params = build_random_model(args.preset, args.dtype, args.quant,
                                     args.group_size)
    rt = (RuntimeConfigBuilder("bench")
          .max_length(args.in_len + args.out_len + 64)
          .max_batch(args.batch)
          .kv_cache_mode(CacheMode(args.kv_cache_mode))
          .prefix_cache(args.prefix_cache)
          .dtype(args.dtype).build())
    eng = Engine()
    eng.install_model("bench", rt, params=params, model_config=cfg)
    eng.start_model("bench")

    rng = np.random.RandomState(0)
    shared = rng.randint(1, cfg.vocab_size,
                         size=int(args.in_len * args.prefix_share)).tolist()
    prompts = [shared + rng.randint(
        1, cfg.vocab_size, size=args.in_len - len(shared)).tolist()
        for _ in range(args.num_requests)]

    gen = lambda p: GenerationConfig(max_length=len(p) + args.out_len,
                                     do_sample=False, top_k=1,
                                     eos_token_id=-1)
    t_start = time.time()
    handles = []
    for p in prompts:
        if args.qps > 0:
            time.sleep(1.0 / args.qps)
        handles.append((time.time(), eng.start_request("bench", p, gen(p))))

    ttfts, gen_times, toks = [], [], 0
    for t0, (_, h, q) in handles:
        eng.sync_request("bench", h, timeout_s=36000)
        stat = q.RequestStatInfo()
        n = len(q.GetAllGeneratedTokens())
        toks += n
        ttfts.append(stat["time_to_first_token"])
        if stat["generate_tps"] > 0:
            gen_times.append((n - 1) / stat["generate_tps"])
        eng.release_request("bench", h)
    wall = time.time() - t_start

    stats = eng.get_engine_stat("bench")
    print(f"preset={args.preset} quant={args.quant} kv={args.kv_cache_mode} "
          f"bs={args.batch} in={args.in_len} out={args.out_len}")
    print(f"Avg_context_time(TTFT): {np.mean(ttfts):.3f} s   "
          f"p50 {np.percentile(ttfts, 50):.3f} s")
    if gen_times:
        print(f"Avg_generate_time:      {np.mean(gen_times):.3f} s")
        print(f"Avg_Req_Tput:           {args.out_len / np.mean(gen_times):.2f} tok/s")
    print(f"Total_Tput:             {toks / wall:.2f} tok/s")
    print(f"QPS:                    {len(prompts) / wall:.3f}")
    if args.prefix_cache:
        print(f"prefix_cache_hit_rate:  {stats['prefix_cache_hit_rate']:.3f}")
    eng.release_model("bench")


if __name__ == "__main__":
    main()
