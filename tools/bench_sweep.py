"""One-process batch sweep for the decode megakernel.

VERDICT r3 #1 asks for a bs in {16,32,64,128} table that is monotonically
non-decreasing in aggregate throughput under the engine's batch-aware
stream default (u4 below DI_MK_I8_BATCH, per-channel i8 at/above —
docs/megakernel.md "i8 streaming"). Per-process bench.py runs would pay
the multi-GB pack upload through the tunneled runtime once PER POINT
(~25 MB/s observed); this tool uploads each pack ONCE and sweeps batches
in-process, reusing bench.py's host-side pack pickle cache.

Env: DI_SWEEP_BATCHES="16,32,64,128", DI_SWEEP_STREAMS="auto" (or
"u4,i8" to A/B both streams at every batch), DI_SWEEP_OUT (JSON path).
Writes one JSON object: {"points": [{batch, stream, ms_per_step, tok_s}],
"monotonic_auto": bool}.
"""

import dataclasses
import hashlib
import json
import os
import pickle
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    import jax
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
    ctx_len = int(os.environ.get("DI_BENCH_CTX", "1024"))
    page_size = 256
    NSTEP = int(os.environ.get("DI_BENCH_MULTISTEP", "8"))
    batches = [int(b) for b in
               os.environ.get("DI_SWEEP_BATCHES", "16,32,64,128").split(",")]
    streams = os.environ.get("DI_SWEEP_STREAMS", "auto").split(",")

    def log(*a):
        print(*a, file=sys.stderr, flush=True)

    def rt_for(B):
        num_logical_pages = 8 * (B * ((ctx_len + 255) // 256 + 2) // 8 + 2)
        return RuntimeConfig(
            model_name="bench",
            max_length=max(ctx_len + 48 + 4 + 64, 256), max_batch=B,
            cache=CacheConfig(page_size=page_size, mode=CacheMode.INT8,
                              num_pages=num_logical_pages),
            dtype="bfloat16")

    def load_pack(stream):
        """bench.py's pack pickle cache (build on miss)."""
        rt = rt_for(batches[0])
        key_src = repr((cfg, rt.cache, os.environ.get("DI_MK_CHUNK_BYTES"),
                        mk.PACK_VERSION, stream,
                        os.environ.get("DI_MK_ILV", "1")))
        ck = hashlib.blake2b(key_src.encode(), digest_size=8).hexdigest()
        cache_file = f"/tmp/di_bench_pack_{ck}.pkl"
        t0 = time.time()
        if os.path.exists(cache_file):
            with open(cache_file, "rb") as f:
                plan, packed_np, embed_np = pickle.load(f)
            log(f"[{stream}] pack cache hit in {time.time()-t0:.1f}s")
            return plan, packed_np, embed_np
        params_np = bench.build_qwen2_7b_params(cfg)
        if stream == "i8":
            params_np = mk.expand_u4_to_i8(params_np) or params_np
        os.environ["DI_MK_STREAM"] = stream  # make_plan keys dtype off params
        plan = mk.make_plan(
            cfg, rt, params_np,
            interleave_mlp=os.environ.get("DI_MK_ILV", "1") != "0")
        packed_np = jax.tree.map(np.asarray, mk.pack_params(cfg, plan,
                                                            params_np))
        embed_np = np.asarray(params_np["embed_tokens"]["w"])
        with open(cache_file, "wb") as f:
            pickle.dump((plan, packed_np, embed_np), f)
        log(f"[{stream}] pack built in {time.time()-t0:.1f}s")
        return plan, packed_np, embed_np

    points = []
    # group batches per stream so each pack uploads once
    groups = {}
    for B in batches:
        for s in streams:
            real = bench._stream_kind("dense", B) if s == "auto" else s
            groups.setdefault(real, []).append((B, s == "auto"))
    # DI_SWEEP_EXTRA="u4:32,u4:64" adds A/B points without a full extra
    # stream sweep
    for spec in filter(None, os.environ.get("DI_SWEEP_EXTRA", "").split(",")):
        s, b = spec.split(":")
        if (int(b), False) not in groups.get(s, []) and \
                (int(b), True) not in groups.get(s, []):
            groups.setdefault(s, []).append((int(b), False))

    for stream, blist in groups.items():
        plan0, packed_np, embed_np = load_pack(stream)
        t0 = time.time()
        packed = jax.tree.map(jnp.asarray, packed_np)
        embed = jnp.asarray(embed_np)
        jax.block_until_ready(packed)
        log(f"[{stream}] pack uploaded in {time.time()-t0:.1f}s")
        params = {"packed": packed, "embed": embed}
        for B, is_auto in blist:
            rt = rt_for(B)
            plan = dataclasses.replace(plan0, B=B,
                                       maxP=rt.max_pages_per_seq,
                                       MAXPG=B * rt.max_pages_per_seq)
            maxP = rt.max_pages_per_seq
            npages = rt.cache.num_pages
            cache = create_kv_cache(cfg, rt.cache, npages * cfg.num_layers,
                                    model_dtype=jnp.bfloat16)
            pt = np.zeros((B, maxP), np.int32)
            g = 0
            pages_per_seq = (ctx_len + page_size - 1) // page_size
            for b in range(B):
                for j in range(min(pages_per_seq + 2, maxP)):
                    pt[b, j] = g % npages
                    g += 1
            state = dataclasses.replace(
                make_decode_state(cfg, rt),
                token_ids=jnp.arange(B, dtype=jnp.int32) + 7,
                context_lens=jnp.full((B,), ctx_len, jnp.int32),
                prompt_lens=jnp.full((B,), ctx_len, jnp.int32),
                gen_lens=jnp.ones((B,), jnp.int32),
                page_tables=jnp.asarray(pt),
                active=jnp.ones((B,), bool))
            decode = steps_mod.build_multi_decode_step(
                cfg, rt, NSTEP, use_kernel=True, megakernel_plan=plan)

            def page_window(state_lens):
                npi = np.full((NSTEP, B), -1, np.int32)
                for b in range(B):
                    for i in range(NSTEP):
                        t = int(state_lens[b]) + i
                        if t % page_size == 0:
                            npi[i, b] = pt[b, min(t // page_size, maxP - 1)]
                return jnp.asarray(npi)

            lens_h = np.full((B,), ctx_len, np.int64)
            t0 = time.time()
            try:
                for _ in range(4):
                    toks, cache, state = decode(params, cache, state,
                                                page_window(lens_h))
                    lens_h += NSTEP
                np.asarray(toks)
            except Exception as e:  # OOM at the largest batch is data too
                log(f"[{stream}] B={B} FAILED: {type(e).__name__}: "
                    f"{str(e)[:200]}")
                points.append({"batch": B, "stream": stream,
                               "auto": is_auto, "error": str(e)[:200]})
                del cache, state, decode
                continue
            log(f"[{stream}] B={B} compile+warmup in {time.time()-t0:.1f}s")
            nlaunch = max(48 // NSTEP, 1)
            t0 = time.time()
            prev = None
            for _ in range(nlaunch):
                toks, cache, state = decode(params, cache, state,
                                            page_window(lens_h))
                lens_h += NSTEP
                toks.copy_to_host_async()
                if prev is not None:
                    np.asarray(prev)
                prev = toks
            np.asarray(prev)
            dt = time.time() - t0
            tok_s = B * nlaunch * NSTEP / dt
            ms = dt / (nlaunch * NSTEP) * 1e3
            log(f"[{stream}] B={B}: {ms:.2f} ms/step -> {tok_s:.1f} tok/s")
            points.append({"batch": B, "stream": stream, "auto": is_auto,
                           "ms_per_step": round(ms, 2),
                           "tok_s": round(tok_s, 1)})
            del cache, state, decode, toks, prev
        del packed, embed, params
    auto_pts = [p for p in points if p.get("auto") and "tok_s" in p]
    auto_pts.sort(key=lambda p: p["batch"])
    mono = all(b["tok_s"] >= a["tok_s"] * 0.98
               for a, b in zip(auto_pts, auto_pts[1:]))
    out = {"config": {"model": "qwen2-7b-shape", "ctx": ctx_len,
                      "kv": "int8", "multistep": NSTEP},
           "points": points, "monotonic_auto": mono}
    path = os.environ.get("DI_SWEEP_OUT", "BENCH_SWEEP_r04.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
