"""One-process batch sweep for the decode megakernel — the CANONICAL
batch-scaling artifact (BENCH_SWEEP_r*.json).

VERDICT r3 #1 / r4 #1 ask for a bs in {16,32,64,128} table that is
monotonically non-decreasing in aggregate throughput under the engine's
batch-aware stream default (u4 below DI_MK_I8_BATCH, per-channel i8 at/
above — docs/megakernel.md "i8 streaming"). Per-process bench.py runs
would pay the multi-GB pack upload through the tunneled runtime once PER
POINT (~25 MB/s observed); this tool uploads each pack ONCE and sweeps
batches in-process, sharing bench.py's batch-independent pack pickle
cache AND bench.timed_decode_loop (the same measurement bench.py's
headline uses, so the two tools agree by construction).

Batches the decode megakernel does not support (B > 64 — megakernel.py
supports()) are measured through the engine's ACTUAL fallback: the
per-op XLA multi-step decode over the raw u4 params (the path
model_runtime warns about at max_batch > 64). Those points carry
"path": "xla-fallback" and are excluded from monotonic_auto, which is
null (not true) whenever any requested megakernel auto point errored.

Env: DI_SWEEP_BATCHES="16,32,64,128", DI_SWEEP_STREAMS="auto" (or
"u4,i8" to A/B both streams at every batch), DI_SWEEP_EXTRA="u4:32,..."
for A/B points, DI_SWEEP_OUT (JSON path).
"""

import dataclasses
import json
import os
import pickle
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

MK_MAX_BATCH = 64  # megakernel.py supports(): rt.max_batch > 64 -> False
MONO_TOL = 0.02    # b >= a * (1 - MONO_TOL); recorded in the artifact


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
    steps = int(os.environ.get("DI_BENCH_STEPS", "96"))
    batches = [int(b) for b in
               os.environ.get("DI_SWEEP_BATCHES", "16,32,64,128").split(",")]
    streams = os.environ.get("DI_SWEEP_STREAMS", "auto").split(",")

    def log(*a):
        print(*a, file=sys.stderr, flush=True)

    def rt_for(B):
        num_logical_pages = 8 * (B * ((ctx_len + 255) // 256 + 2) // 8 + 2)
        return RuntimeConfig(
            model_name="bench",
            max_length=max(ctx_len + steps + 4 + 64, 256), max_batch=B,
            cache=CacheConfig(page_size=page_size, mode=CacheMode.INT8,
                              num_pages=num_logical_pages),
            dtype="bfloat16")

    def load_pack(stream):
        """bench.py's batch-independent pack pickle cache (build on miss)."""
        cache_file = bench.pack_cache_file(cfg, rt_for(batches[0]).cache,
                                           stream)
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
            cfg, rt_for(batches[0]), params_np,
            interleave_mlp=os.environ.get("DI_MK_ILV", "1") != "0")
        packed_np = jax.tree.map(np.asarray, mk.pack_params(cfg, plan,
                                                            params_np))
        embed_np = np.asarray(params_np["embed_tokens"]["w"])
        with open(cache_file, "wb") as f:
            pickle.dump((plan, packed_np, embed_np), f)
        log(f"[{stream}] pack built in {time.time()-t0:.1f}s")
        return plan, packed_np, embed_np

    def seeded_state_and_pages(B, rt):
        maxP = rt.max_pages_per_seq
        npages = rt.cache.num_pages
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
        return state, pt

    def page_window_fn(B, pt, maxP):
        def page_window(state_lens):
            npi = np.full((NSTEP, B), -1, np.int32)
            for b in range(B):
                for i in range(NSTEP):
                    t = int(state_lens[b]) + i
                    if t % page_size == 0:
                        npi[i, b] = pt[b, min(t // page_size, maxP - 1)]
            return jnp.asarray(npi)
        return page_window

    def run_point(B, decode, params, rt, label):
        """Warm + measure one batch point through bench.timed_decode_loop
        (the shared canonical loop). Returns the point dict."""
        state, pt = seeded_state_and_pages(B, rt)
        cache = create_kv_cache(cfg, rt.cache,
                                rt.cache.num_pages * cfg.num_layers,
                                model_dtype=jnp.bfloat16)
        page_window = page_window_fn(B, pt, rt.max_pages_per_seq)
        lens_h = np.full((B,), ctx_len, np.int64)
        t0 = time.time()
        for _ in range(4):
            toks, cache, state = decode(params, cache, state,
                                        page_window(lens_h))
            lens_h += NSTEP
        np.asarray(toks)
        log(f"[{label}] B={B} compile+warmup in {time.time()-t0:.1f}s")
        nlaunch = max(steps // NSTEP, 1)
        tok_s, ms, cache, state = bench.timed_decode_loop(
            decode, params, cache, state, page_window, lens_h, B, NSTEP,
            nlaunch)
        log(f"[{label}] B={B}: {ms:.2f} ms/step -> {tok_s:.1f} tok/s")
        return {"ms_per_step": round(ms, 2), "tok_s": round(tok_s, 1)}

    points = []
    any_auto_error = False
    out_path = os.environ.get("DI_SWEEP_OUT", "BENCH_SWEEP_r05.json")

    def flush_partial():
        # incremental write so a crash mid-sweep still leaves the
        # completed points on disk (final write below adds the verdict)
        with open(out_path + ".partial", "w") as f:
            json.dump({"points": points}, f, indent=1)
    # group megakernel batches per stream so each pack uploads once
    groups = {}
    fallback_batches = []
    for B in batches:
        if B > MK_MAX_BATCH:
            fallback_batches.append(B)
            continue
        for s in streams:
            real = bench._stream_kind("dense", B) if s == "auto" else s
            groups.setdefault(real, []).append((B, s == "auto"))
    # DI_SWEEP_EXTRA="u4:32,u4:64" adds A/B points without a full extra
    # stream sweep
    for spec in filter(None, os.environ.get("DI_SWEEP_EXTRA", "").split(",")):
        s, b = spec.split(":")
        if int(b) > MK_MAX_BATCH:
            log(f"DI_SWEEP_EXTRA {spec} exceeds the megakernel's supported "
                f"batch ({MK_MAX_BATCH}); skipping")
            continue
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
            try:
                decode = steps_mod.build_multi_decode_step(
                    cfg, rt, NSTEP, use_kernel=True, megakernel_plan=plan)
                pt = run_point(B, decode, params, rt, stream)
                points.append({"batch": B, "stream": stream,
                               "auto": is_auto, "path": "megakernel", **pt})
                flush_partial()
            except Exception as e:  # OOM at the largest batch is data too
                log(f"[{stream}] B={B} FAILED: {type(e).__name__}: "
                    f"{str(e)[:200]}")
                points.append({"batch": B, "stream": stream,
                               "auto": is_auto, "path": "megakernel",
                               "error": str(e)[:200]})
                flush_partial()
                any_auto_error = any_auto_error or is_auto
        del packed, embed, params, plan0, packed_np, embed_np

    # B > 64: the engine's ACTUAL fallback — per-op XLA decode on raw u4
    # params (ADVICE r4: don't drive the megakernel outside its supported
    # range; model_runtime.py warns and takes this path in production)
    if fallback_batches:
        t0 = time.time()
        params_np = bench.build_qwen2_7b_params(cfg)
        params = jax.tree.map(jnp.asarray, params_np)
        del params_np
        jax.block_until_ready(params)
        log(f"[xla] raw u4 params uploaded in {time.time()-t0:.1f}s")
        for B in fallback_batches:
            rt = rt_for(B)
            try:
                decode = steps_mod.build_multi_decode_step(
                    cfg, rt, NSTEP, use_kernel=True, megakernel_plan=None)
                pt = run_point(B, decode, params, rt, "xla")
                points.append({"batch": B, "stream": "u4", "auto": True,
                               "path": "xla-fallback", **pt})
                flush_partial()
            except Exception as e:
                log(f"[xla] B={B} FAILED: {type(e).__name__}: "
                    f"{str(e)[:200]}")
                points.append({"batch": B, "stream": "u4", "auto": True,
                               "path": "xla-fallback",
                               "error": str(e)[:200]})
                flush_partial()
                # an errored fallback point doesn't void the megakernel
                # scaling claim, but record that the requested table is
                # incomplete (ADVICE r4 #1)
        del params

    # monotonicity over the MEGAKERNEL auto points only (the B>64 fallback
    # is a different path, reported but not part of the scaling claim);
    # null — not true — if any requested auto point errored out
    auto_pts = [p for p in points
                if p.get("auto") and "tok_s" in p
                and p.get("path") == "megakernel"]
    auto_pts.sort(key=lambda p: p["batch"])
    incomplete = any("error" in p for p in points)
    if any_auto_error or not auto_pts:
        mono = None
    else:
        mono = all(b["tok_s"] >= a["tok_s"] * (1 - MONO_TOL)
                   for a, b in zip(auto_pts, auto_pts[1:]))
    out = {"config": {"model": "qwen2-7b-shape", "ctx": ctx_len,
                      "kv": "int8", "multistep": NSTEP, "steps": steps},
           "points": points, "monotonic_auto": mono,
           "table_complete": not incomplete,
           "monotonic_tolerance": MONO_TOL,
           "monotonic_definition":
               "each megakernel auto point >= prev * (1 - tol); null when "
               "any requested auto point errored"}
    path = os.environ.get("DI_SWEEP_OUT", "BENCH_SWEEP_r05.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
