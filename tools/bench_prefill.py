"""Prefill latency (TTFT) bench on the 7B BENCH shape.

Measures the steady-state device latency of one prefill step per bucket
(XLA path with u4 weight-only leaves — dequant-into-MXU matmuls), i.e. the
TTFT a single request pays after compile. Reference comparison point:
Llama-3-8B bs=1 in128 TTFT = 0.21 s on 48-core EMR (docs/EN/performance.md
:32-66).

Usage: python tools/bench_prefill.py [--mega] [--moe] [buckets...]
       (default buckets 128 1024)
  --mega  route through the Pallas prefill megakernel
          (ops/pallas/prefill_megakernel.py) instead of the XLA path
  --moe   bench the Qwen1.5-MoE-A2.7B shape (router + 60 experts + shared
          expert) instead of the dense 7B shape
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/di_jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
    except Exception:
        pass
    import jax.numpy as jnp
    from dashinfer_tpu.config import (CacheConfig, CacheMode, ModelConfig,
                                      RuntimeConfig)
    from dashinfer_tpu.engine import steps as steps_mod
    from dashinfer_tpu.runtime.batch_state import make_decode_state
    from dashinfer_tpu.runtime.kv_cache import create_kv_cache
    from bench import build_qwen15_moe_params, build_qwen2_7b_params

    args = sys.argv[1:]
    use_mega = "--mega" in args
    use_moe = "--moe" in args
    args = [a for a in args if a not in ("--mega", "--moe")]
    buckets = [int(a) for a in args] or [128, 1024]
    if use_moe:
        from dashinfer_tpu.config import MoEConfig
        cfg = ModelConfig(
            arch="qwen2_moe", vocab_size=151936, hidden_size=2048,
            intermediate_size=5632, num_layers=24, num_heads=16,
            num_kv_heads=16, head_dim=128, qkv_bias=True,
            rope_theta=1000000.0,
            moe=MoEConfig(num_experts=60, num_experts_per_tok=4,
                          moe_intermediate_size=1408,
                          shared_expert_intermediate_size=5632,
                          norm_topk_prob=False))
    else:
        cfg = ModelConfig(
            arch="qwen2", vocab_size=152064, hidden_size=3584,
            intermediate_size=18944, num_layers=28, num_heads=28,
            num_kv_heads=4, head_dim=128, qkv_bias=True,
            rope_theta=1000000.0)
    ps = 256
    max_len = max(buckets) + 64
    rt = RuntimeConfig(
        model_name="bench", max_length=max_len, max_batch=4,
        cache=CacheConfig(page_size=ps, mode=CacheMode.INT8,
                          num_pages=4 * (max_len // ps + 2)),
        dtype="bfloat16", min_prefill_bucket=128)

    t0 = time.time()
    host_params = (build_qwen15_moe_params(cfg) if use_moe
                   else build_qwen2_7b_params(cfg, quantize_lm=True))
    print(f"params built host-side in {time.time()-t0:.1f}s",
          file=sys.stderr)

    mega_params = None
    if use_mega:
        # pack from HOST numpy (device round-trips through the tunnel are
        # painfully slow), then upload only the packed streams + embed
        from dashinfer_tpu.ops.pallas import prefill_megakernel as pmk
        for b in buckets:
            assert pmk.supports_prefill(cfg, rt, host_params, b), b
        t0 = time.time()
        plans = {b: pmk.make_prefill_plan(cfg, rt, host_params, b)
                 for b in buckets}
        packed = pmk.pack_prefill_params(cfg, plans[buckets[0]], host_params)
        mega_params = {"prefill_packed": packed,
                       "embed": jnp.asarray(
                           host_params["embed_tokens"]["w"])}
        params = None
        print(f"prefill weights packed+on device in {time.time()-t0:.1f}s",
              file=sys.stderr)
    else:
        t0 = time.time()
        if use_moe:
            from dashinfer_tpu.ops.pallas.grouped_quant_matmul import \
                prepare_grouped_experts
            host_params = prepare_grouped_experts(host_params, cfg)
            print(f"grouped expert repack in {time.time()-t0:.1f}s",
                  file=sys.stderr)
            t0 = time.time()
        params = jax.tree.map(jnp.asarray, host_params)
        print(f"params on device in {time.time()-t0:.1f}s", file=sys.stderr)
    del host_params

    cache = create_kv_cache(cfg, rt.cache, rt.cache.num_pages * cfg.num_layers,
                            model_dtype=jnp.bfloat16)
    state = make_decode_state(cfg, rt)

    for bucket in buckets:
        if use_mega:
            fn = steps_mod.build_prefill_step(cfg, rt, bucket,
                                              use_kernel=True,
                                              mega_plan=plans[bucket])
        else:
            fn = steps_mod.build_prefill_step(cfg, rt, bucket,
                                              use_kernel=True)
        maxPb = (bucket + ps - 1) // ps
        toks = jnp.asarray(np.random.RandomState(0).randint(
            1, cfg.vocab_size, size=bucket), jnp.int32)
        row = jnp.arange(maxPb, dtype=jnp.int32) + 1
        init = steps_mod.SlotInit(
            slot=jnp.int32(0), temperature=jnp.float32(1.0),
            top_k=jnp.int32(1), top_p=jnp.float32(1.0),
            repetition_penalty=jnp.float32(1.0),
            presence_penalty=jnp.float32(0.0),
            frequency_penalty=jnp.float32(0.0), seed=jnp.uint32(0),
            min_gen_len=jnp.int32(0),
            stop_token_ids=jnp.full((rt.max_stop_token_ids,), -1, jnp.int32),
            lora_idx=jnp.int32(-1), pos_offset=jnp.int32(0),
            bad_words=jnp.full((rt.max_bad_words, rt.max_bad_word_len), -1,
                               jnp.int32),
            ngram_n=jnp.int32(0))

        p = mega_params if use_mega else params
        t0 = time.time()
        tok, _, cache, state = fn(p, cache, state, toks, row,
                                  jnp.int32(0), jnp.int32(bucket), init)
        int(tok)
        compile_s = time.time() - t0

        iters = 8
        t0 = time.time()
        for _ in range(iters):
            tok, _, cache, state = fn(p, cache, state, toks, row,
                                      jnp.int32(0), jnp.int32(bucket), init)
        int(tok)
        dt = (time.time() - t0) / iters
        print(f"bucket {bucket:5d}: TTFT {dt*1e3:8.2f} ms "
              f"({bucket/dt:9.0f} tok/s prefill)  [compile {compile_s:.1f}s]")


if __name__ == "__main__":
    main()
