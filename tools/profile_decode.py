"""Micro-profile the decode step's components on the bench config.

Usage: python tools/profile_decode.py [--steps N]
Prints per-component times so kernel work can be targeted.
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np


def timeit(fn, *args, warm=3, iters=20, **kw):
    for _ in range(warm):
        out = fn(*args, **kw)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args, **kw)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def main():
    from dashinfer_tpu.config import (CacheConfig, CacheMode, ModelConfig,
                                      RuntimeConfig)
    from dashinfer_tpu.ops.pallas.quant_matmul import quant_matmul
    from dashinfer_tpu.ops.pallas.paged_attention import paged_attention
    from dashinfer_tpu.runtime.kv_cache import create_kv_cache
    from bench import build_qwen2_7b_params

    cfg = ModelConfig(
        arch="qwen2", vocab_size=152064, hidden_size=3584,
        intermediate_size=18944, num_layers=28, num_heads=28,
        num_kv_heads=4, head_dim=128, qkv_bias=True, rope_theta=1000000.0)
    B, ctx_len = 8, 1024
    page_size = 64
    num_logical_pages = 256
    rt = RuntimeConfig(model_name="prof", max_length=1280, max_batch=B,
                       cache=CacheConfig(page_size=page_size,
                                         mode=CacheMode.INT8,
                                         num_pages=num_logical_pages),
                       dtype="bfloat16")

    key = jax.random.PRNGKey(0)
    hid, inter = cfg.hidden_size, cfg.intermediate_size
    x = jax.random.normal(key, (B, hid), jnp.bfloat16)
    h = jax.random.normal(key, (B, inter), jnp.bfloat16)

    params = build_qwen2_7b_params(cfg)
    jax.block_until_ready(params)
    lp = jax.tree.map(lambda a: a[0], params["layers"])

    shapes = [("q_proj", x, lp["q_proj"]),
              ("kv_proj", x, lp["k_proj"]),
              ("o_proj", x, lp["o_proj"]),
              ("gate_proj", x, lp["gate_proj"]),
              ("down_proj", h, lp["down_proj"])]

    total_mm = 0.0
    qmm = jax.jit(quant_matmul)
    for name, xx, wd in shapes:
        dt = timeit(qmm, xx, wd)
        kbytes = wd["w_q"].size * wd["w_q"].dtype.itemsize
        bw = kbytes / dt / 1e9
        mult = 2 if "kv" in name or name in ("gate_proj",) else 1
        total_mm += dt * mult
        print(f"{name:12s} {dt*1e6:9.1f} us   weight {kbytes/1e6:7.1f} MB  "
              f"-> {bw:6.1f} GB/s")

    # paged attention, one layer
    L = cfg.num_layers
    cache = create_kv_cache(cfg, rt.cache, num_logical_pages * L,
                            model_dtype=jnp.bfloat16)
    maxP = rt.max_pages_per_seq
    pt = np.zeros((B, maxP), np.int32)
    g = 0
    for b in range(B):
        for j in range(maxP):
            pt[b, j] = g * L
            g = (g + 1) % num_logical_pages
    lens = jnp.full((B,), ctx_len, jnp.int32)
    q = jax.random.normal(key, (B, cfg.num_heads, cfg.head_dim), jnp.bfloat16)
    pa = jax.jit(lambda q, c, p, l: paged_attention(
        q, c, rt.cache.mode, p, l, 1.0 / cfg.head_dim ** 0.5))
    dt = timeit(pa, q, cache, jnp.asarray(pt), lens)
    kv_bytes = 2 * B * ctx_len * cfg.num_kv_heads * cfg.head_dim
    print(f"paged_attn   {dt*1e6:9.1f} us   kv {kv_bytes/1e6:7.1f} MB  "
          f"-> {kv_bytes/dt/1e9:6.1f} GB/s   x{L} = {dt*L*1e3:.2f} ms")

    # embedding + lm_head (pass tables as args — closure capture would inline
    # them as giant constants and hang the compile)
    toks = jnp.arange(B, dtype=jnp.int32)
    emb = jax.jit(lambda w, t: w[t])
    print(f"embed        {timeit(emb, params['embed_tokens']['w'], toks)*1e6:9.1f} us")
    lm = jax.jit(lambda w, hh: jnp.dot(hh, w,
                                       preferred_element_type=jnp.float32))
    print(f"lm_head      {timeit(lm, params['lm_head']['w'], x)*1e6:9.1f} us")

    # sampler
    from dashinfer_tpu.ops import sampling as sampling_ops
    from dashinfer_tpu.runtime.batch_state import make_decode_state
    state = make_decode_state(cfg, rt)
    logits = jax.random.normal(key, (B, cfg.vocab_size), jnp.float32)
    samp = jax.jit(lambda lg, st: sampling_ops.sample(
        lg, st.sampling, st.token_counts, st.gen_lens,
        jnp.full((B,), ctx_len, jnp.int32), max_top_k=rt.sampler_max_top_k))
    print(f"sampler      {timeit(samp, logits, state)*1e6:9.1f} us")

    # per-layer matmul total estimate
    print(f"\nmatmul-only estimate/step: {total_mm * L * 1e3:.2f} ms "
          f"(x{L} layers)")

    # forward-only (scan composition, no sampler)
    from dashinfer_tpu.models import transformer
    maxP_l = rt.max_pages_per_seq
    ptfull = np.zeros((B, L, maxP_l), np.int32)
    g = 0
    for b in range(B):
        for j in range(maxP_l):
            ptfull[b, :, j] = (g % num_logical_pages) * L + np.arange(L)
            g += 1
    lens_b = jnp.full((B,), ctx_len, jnp.int32)
    act = jnp.ones((B,), bool)

    fwd = jax.jit(lambda p, t, c, pt_, ln, a: transformer.decode_forward(
        cfg, p, t, c, pt_, ln, a, mode=rt.cache.mode, use_kernel=True),
        donate_argnums=(2,))
    c2 = jax.tree.map(jnp.copy, cache)
    for _ in range(3):
        lg, c2 = fwd(params, toks, c2, jnp.asarray(ptfull), lens_b, act)
    jax.block_until_ready(lg)
    t0 = time.perf_counter()
    for _ in range(10):
        lg, c2 = fwd(params, toks, c2, jnp.asarray(ptfull), lens_b, act)
    jax.block_until_ready(lg)
    print(f"decode_forward only: {(time.perf_counter()-t0)/10*1e3:.2f} ms")

    # full decode step for comparison
    from dashinfer_tpu.engine import steps as steps_mod
    from dashinfer_tpu.runtime.batch_state import make_decode_state
    import dataclasses
    state = make_decode_state(cfg, rt)
    ptL = np.zeros((B, L, maxP), np.int32)
    g = 0
    for b in range(B):
        for j in range(maxP):
            ptL[b, :, j] = g * L + np.arange(L)
            g += 1
    state = dataclasses.replace(
        state, token_ids=jnp.arange(B, dtype=jnp.int32) + 7,
        context_lens=jnp.full((B,), ctx_len, jnp.int32),
        prompt_lens=jnp.full((B,), ctx_len, jnp.int32),
        gen_lens=jnp.ones((B,), jnp.int32),
        page_tables=jnp.asarray(ptL), active=jnp.ones((B,), bool))
    decode = steps_mod.build_decode_step(cfg, rt, use_kernel=True)
    no_new = jnp.full((B, L), -1, jnp.int32)

    for _ in range(3):
        toks, _, cache, state = decode(params, cache, state, no_new)
    jax.block_until_ready(toks)
    t0 = time.perf_counter()
    iters = 10
    for _ in range(iters):
        toks, _, cache, state = decode(params, cache, state, no_new)
        jax.block_until_ready(toks)
    dt = (time.perf_counter() - t0) / iters
    print(f"full decode step: {dt*1e3:.2f} ms  -> "
          f"{B/dt:.1f} tok/s")


if __name__ == "__main__":
    main()
