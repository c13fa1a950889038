"""Split the megakernel decode step into weight-stream vs attention cost.

Reuses bench.py's pack cache and compiled kernel; runs the SAME compiled
step with full context lens (all pages scheduled) vs len=1 (no page DMAs,
n_sched ~ B) — the delta is the attention page-loop cost.

Usage: python tools/profile_megakernel.py
"""

import dataclasses
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    import jax
    if os.environ.get("JAX_PLATFORMS") == "cpu" or \
            os.environ.get("DI_PROF_PACK_ONLY"):
        # the axon plugin ignores JAX_PLATFORMS; pack-only runs must not
        # touch (or hang on) the TPU tunnel
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", "/tmp/di_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
    import jax.numpy as jnp
    from dashinfer_tpu.config import (CacheConfig, CacheMode, ModelConfig,
                                      RuntimeConfig)
    from dashinfer_tpu.engine import steps as steps_mod
    from dashinfer_tpu.ops.pallas import megakernel as mk
    from dashinfer_tpu.runtime.batch_state import make_decode_state
    from dashinfer_tpu.runtime.kv_cache import create_kv_cache
    import bench

    cfg = ModelConfig(
        arch="qwen2", vocab_size=152064, hidden_size=3584,
        intermediate_size=18944, num_layers=28, num_heads=28,
        num_kv_heads=4, head_dim=128, qkv_bias=True, rope_theta=1000000.0)
    B = int(os.environ.get("DI_BENCH_BATCH", "16"))
    ctx_len = int(os.environ.get("DI_BENCH_CTX", "1024"))
    page_size = 256
    num_logical_pages = 8 * (B * ((ctx_len + 255) // 256 + 2) // 8 + 2)
    rt = RuntimeConfig(
        model_name="bench", max_length=max(ctx_len + 48 + 4 + 64, 256),
        max_batch=B,
        cache=CacheConfig(page_size=page_size,
                          mode=CacheMode[os.environ.get("DI_BENCH_KV",
                                                        "INT8").upper()],
                          num_pages=num_logical_pages),
        dtype="bfloat16")

    import pickle
    # pack contents are KV-mode independent: key on the INT8 shape so bf16
    # KV probes reuse the same multi-GB pack cache; bench.pack_cache_file
    # is the SHARED batch-independent key (ADVICE r4)
    import dataclasses as _dc
    _key_cache = _dc.replace(rt.cache, mode=CacheMode.INT8)
    stream = bench._stream_kind("dense", B)
    cache_file = bench.pack_cache_file(cfg, _key_cache, stream)
    t0 = time.time()
    if os.path.exists(cache_file):
        with open(cache_file, "rb") as f:
            plan, packed_np, embed_np = pickle.load(f)
        # packed weights are KV-mode independent; rewrite the plan's KV
        # fields for the probed mode (DI_BENCH_KV)
        import dataclasses as _dc
        from dashinfer_tpu.runtime.kv_cache import cache_dtype_and_dim
        _kvdt, _kvdim, _ = cache_dtype_and_dim(
            rt.cache.mode, cfg.head_dim, jnp.bfloat16)
        _bits = {"int8": 8, "uint8": 4}.get(str(np.dtype(_kvdt)), 16)
        plan = _dc.replace(plan, kv_mode=rt.cache.mode, kv_bits=_bits,
                           kv_dtype_name=str(np.dtype(_kvdt)),
                           B=B, maxP=rt.max_pages_per_seq,
                           MAXPG=B * rt.max_pages_per_seq)
        print(f"pack cache hit in {time.time()-t0:.1f}s", file=sys.stderr)
    else:
        params_np = bench.build_qwen2_7b_params(cfg)
        if stream == "i8":
            t_e = time.time()
            params_np = mk.expand_u4_to_i8(params_np) or params_np
            print(f"u4->i8 re-expansion in {time.time()-t_e:.1f}s",
                  file=sys.stderr)
        plan = mk.make_plan(
            cfg, rt, params_np,
            interleave_mlp=os.environ.get("DI_MK_ILV", "1") != "0")
        packed_np = jax.tree.map(np.asarray, mk.pack_params(cfg, plan,
                                                            params_np))
        embed_np = np.asarray(params_np["embed_tokens"]["w"])
        with open(cache_file, "wb") as f:
            pickle.dump((plan, packed_np, embed_np), f)
    if os.environ.get("DI_PROF_PACK_ONLY"):
        # pre-build the pack cache from a CPU process while the TPU is busy
        print(f"pack ready: {cache_file}")
        return
    packed = jax.tree.map(jnp.asarray, packed_np)
    params = {"packed": packed, "embed": jnp.asarray(embed_np)}

    L = cfg.num_layers
    cache = create_kv_cache(cfg, rt.cache, num_logical_pages * L,
                            model_dtype=jnp.bfloat16)
    state0 = make_decode_state(cfg, rt)
    ps = rt.cache.page_size
    maxP = rt.max_pages_per_seq
    pages_per_seq = (ctx_len + ps - 1) // ps
    pt = np.zeros((B, maxP), np.int32)
    g = 0
    for b in range(B):
        for j in range(min(pages_per_seq + 2, maxP)):
            pt[b, j] = g % num_logical_pages
            g += 1

    def mkstate(lens):
        # fresh state each call — decode donates its buffers
        return dataclasses.replace(
            make_decode_state(cfg, rt),
            token_ids=jnp.arange(B, dtype=jnp.int32) + 7,
            context_lens=jnp.full((B,), lens, jnp.int32),
            prompt_lens=jnp.full((B,), lens, jnp.int32),
            gen_lens=jnp.ones((B,), jnp.int32),
            page_tables=jnp.asarray(pt),
            active=jnp.ones((B,), bool))

    no_new = jnp.full((B,), -1, jnp.int32)

    # DI_PROF_U4DEQ=i32,u8,split sweeps dequant variants in ONE process
    # (shared backend init + pack load; each variant recompiles its kernel).
    # DI_PROF_CTXS overrides the context list (default "1,256,full").
    variants = os.environ.get("DI_PROF_U4DEQ",
                              os.environ.get("DI_MK_U4DEQ", "i32")).split(",")
    # DI_PROF_GDOT_TILES sweeps the looped-epilogue live-tile cap (bytes);
    # crossed with the dequant variants
    tiles = os.environ.get("DI_PROF_GDOT_TILES", "").split(",") \
        if os.environ.get("DI_PROF_GDOT_TILES") else [None]
    ctx_spec = os.environ.get("DI_PROF_CTXS", "1,256,full").split(",")
    ctxs = [(f"ctx={c}", ctx_len if c == "full" else int(c))
            for c in ctx_spec]

    for var0 in variants:
      for tile in tiles:
        var = var0 if tile is None else f"{var0}/t{tile}"
        # "split+bdot" = split dequant with the batched-3D epilogue
        parts = var0.split("+")
        os.environ["DI_MK_U4DEQ"] = parts[0]
        os.environ["DI_MK_GDOT"] = "bdot" if "bdot" in parts[1:] else "loop"
        if tile is not None:
            os.environ["DI_MK_GDOT_TILE_BYTES"] = tile
        decode = steps_mod.build_decode_step(cfg, rt, use_kernel=True,
                                             megakernel_plan=plan)
        for name, lens in ctxs:
            st = mkstate(lens)
            c2 = jax.tree.map(jnp.copy, cache)
            t0 = time.time()
            for _ in range(4):
                toks, _, c2, st = decode(params, c2, st, no_new)
            np.asarray(toks)
            print(f"[{var}] {name}: warmup {time.time()-t0:.1f}s",
                  file=sys.stderr)
            st = mkstate(lens)
            t0 = time.time()
            iters = 24
            prev = None
            for _ in range(iters):
                toks, _, c2, st = decode(params, c2, st, no_new)
                if prev is not None:
                    np.asarray(prev)
                prev = toks
            np.asarray(prev)
            dt = (time.time() - t0) / iters
            print(f"[{var}] {name}: {dt*1e3:.2f} ms/step -> "
                  f"{B/dt:.1f} tok/s (pipelined)", flush=True)


if __name__ == "__main__":
    main()
