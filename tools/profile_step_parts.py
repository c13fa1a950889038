"""Time the decode step's components separately on the TPU at the bench
shape: (a) full decode step, (b) sampler alone, (c) bare megakernel call,
(d) step minus sampler (greedy argmax). Pinpoints O(batch) costs outside
the kernel.

Usage: [DI_BENCH_BATCH=32] python tools/profile_step_parts.py
"""

import dataclasses
import os
import pickle
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def timeit_pipe(fn, drain, iters=24):
    """Pipelined timing: launch i+1 before draining i."""
    prev = None
    out = fn()
    drain(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn()
        if prev is not None:
            drain(prev)
        prev = out
    drain(prev)
    return (time.perf_counter() - t0) / iters


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir", "/tmp/di_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
    import jax.numpy as jnp
    from dashinfer_tpu.config import (CacheConfig, CacheMode, ModelConfig,
                                      RuntimeConfig)
    from dashinfer_tpu.engine import steps as steps_mod
    from dashinfer_tpu.ops.pallas import megakernel as mk
    from dashinfer_tpu.ops import sampling as sampling_ops
    from dashinfer_tpu.runtime.batch_state import make_decode_state
    from dashinfer_tpu.runtime.kv_cache import create_kv_cache
    import bench
    import hashlib

    cfg = ModelConfig(
        arch="qwen2", vocab_size=152064, hidden_size=3584,
        intermediate_size=18944, num_layers=28, num_heads=28,
        num_kv_heads=4, head_dim=128, qkv_bias=True, rope_theta=1000000.0)
    B = int(os.environ.get("DI_BENCH_BATCH", "32"))
    ctx = int(os.environ.get("DI_BENCH_CTX", "1024"))
    ps = 256
    num_pages = 8 * (B * ((ctx + 255) // 256 + 2) // 8 + 2)
    rt = RuntimeConfig(model_name="bench",
                       max_length=max(ctx + 48 + 4 + 64, 256), max_batch=B,
                       cache=CacheConfig(page_size=ps, mode=CacheMode.INT8,
                                         num_pages=num_pages),
                       dtype="bfloat16")
    key_src = repr((cfg, rt.cache, B, os.environ.get("DI_MK_CHUNK_BYTES"),
                    mk.PACK_VERSION))
    ck = hashlib.blake2b(key_src.encode(), digest_size=8).hexdigest()
    with open(f"/tmp/di_bench_pack_{ck}.pkl", "rb") as f:
        plan, packed_np, embed_np = pickle.load(f)
    packed = jax.tree.map(jnp.asarray, packed_np)
    params = {"packed": packed, "embed": jnp.asarray(embed_np)}
    print(f"B={B} plan T={plan.T_total}", flush=True)

    L = cfg.num_layers
    cache = create_kv_cache(cfg, rt.cache, num_pages * L,
                            model_dtype=jnp.bfloat16)
    maxP = rt.max_pages_per_seq
    pt = np.zeros((B, maxP), np.int32)
    g = 0
    for b in range(B):
        for j in range(min(ctx // ps + 2, maxP)):
            pt[b, j] = g % num_pages
            g += 1

    def mkstate():
        return dataclasses.replace(
            make_decode_state(cfg, rt),
            token_ids=jnp.arange(B, dtype=jnp.int32) + 7,
            context_lens=jnp.full((B,), ctx, jnp.int32),
            prompt_lens=jnp.full((B,), ctx, jnp.int32),
            gen_lens=jnp.ones((B,), jnp.int32),
            page_tables=jnp.asarray(pt),
            active=jnp.ones((B,), bool))

    no_new = jnp.full((B,), -1, jnp.int32)

    # (a) full decode step
    decode = steps_mod.build_decode_step(cfg, rt, use_kernel=True,
                                         megakernel_plan=plan)
    holder = {"c": jax.tree.map(jnp.copy, cache), "s": mkstate()}

    def run_full():
        toks, _, holder["c"], holder["s"] = decode(
            params, holder["c"], holder["s"], no_new)
        return toks
    dt = timeit_pipe(run_full, lambda o: np.asarray(o))
    print(f"full step        : {dt*1e3:8.2f} ms", flush=True)

    # (b) sampler alone on random logits
    st = mkstate()
    logits = jnp.asarray(
        np.random.RandomState(0).randn(B, cfg.vocab_size).astype(np.float32))
    samp = jax.jit(lambda lg, s: sampling_ops.sample(
        lg, s.sampling, s.token_counts, s.gen_lens, s.context_lens,
        max_top_k=rt.sampler_max_top_k))

    def run_samp():
        return samp(logits, st)
    dt = timeit_pipe(run_samp, lambda o: np.asarray(o[0]))
    print(f"sampler alone    : {dt*1e3:8.2f} ms", flush=True)

    # (c) bare megakernel
    fn = mk.build_decode_megakernel(plan)
    H, KH, D = cfg.num_heads, cfg.num_kv_heads, cfg.head_dim
    x0 = jnp.ones((B, cfg.hidden_size), jnp.bfloat16)
    cosq = jnp.ones((B, H * D), jnp.bfloat16)
    sinq = jnp.zeros((B, H * D), jnp.bfloat16)
    cosk = jnp.ones((B, KH * D), jnp.bfloat16)
    sink = jnp.zeros((B, KH * D), jnp.bfloat16)
    lens = jnp.full((B,), ctx, jnp.int32)
    active = jnp.ones((B,), jnp.int32)
    sb, sp_, ns, tgt = mk.build_schedule(jnp.asarray(pt), lens, active > 0,
                                         ps)
    jbare = jax.jit(lambda *a: fn(*a),
                    donate_argnums=tuple(range(13, 13 + (4 if
                                         cache.k_qparams is not None else 2))))
    pools = {"p": [cache.k, cache.v] + ([cache.k_qparams, cache.v_qparams]
                                        if cache.k_qparams is not None
                                        else [])}

    def run_bare():
        outs = jbare(packed, x0, cosq, sinq, cosk, sink, jnp.asarray(pt),
                     lens, active, tgt, sb, sp_, ns, *pools["p"])
        pools["p"] = list(outs[1:])
        return outs[0]
    dt = timeit_pipe(run_bare, lambda o: np.asarray(o[0, :8]))
    print(f"bare megakernel  : {dt*1e3:8.2f} ms", flush=True)


if __name__ == "__main__":
    main()
