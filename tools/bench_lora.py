"""On-chip timing of the in-kernel LoRA epilogue (VERDICT r4 #5 / r3 #8
acceptance: adapter-carrying batches should keep >= 80% of the no-LoRA
megakernel throughput).

Three configs in ONE process (pack uploaded once), all through the
SINGLE-STEP decode launch (the engine's LoRA path — per-token host
interaction keeps adapter batches off the multi-step window):

  1. no-LoRA single-step megakernel       (baseline for the ratio)
  2. 1 adapter-active slot out of B       (the common serving mix)
  3. all B slots adapter-active           (worst case)

Also reports the 8-step multi-step no-LoRA rate for context (what a
LoRA-free batch would do).

Usage (real TPU): DI_BENCH_BATCH=32 python tools/bench_lora.py
Env: DI_LORA_RANK (16), DI_BENCH_STEPS (96), DI_LORA_OUT (JSON path).
"""

import dataclasses
import json
import os
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
    from dashinfer_tpu.lora.manager import LoraManager, _dims
    from dashinfer_tpu.ops.pallas import megakernel as mk
    from dashinfer_tpu.runtime.batch_state import make_decode_state
    from dashinfer_tpu.runtime.kv_cache import create_kv_cache
    import bench

    def log(*a):
        print(*a, file=sys.stderr, flush=True)

    cfg = ModelConfig(
        arch="qwen2", vocab_size=152064, hidden_size=3584,
        intermediate_size=18944, num_layers=28, num_heads=28,
        num_kv_heads=4, head_dim=128, qkv_bias=True, rope_theta=1000000.0)
    B = int(os.environ.get("DI_BENCH_BATCH", "32"))
    ctx_len = int(os.environ.get("DI_BENCH_CTX", "1024"))
    steps = int(os.environ.get("DI_BENCH_STEPS", "96"))
    rank = int(os.environ.get("DI_LORA_RANK", "16"))
    page_size = 256
    npages = 8 * (B * ((ctx_len + 255) // 256 + 2) // 8 + 2)
    rt = RuntimeConfig(
        model_name="bench", max_length=max(ctx_len + steps + 4 + 64, 256),
        max_batch=B,
        cache=CacheConfig(page_size=page_size, mode=CacheMode.INT8,
                          num_pages=npages),
        dtype="bfloat16", enable_lora=True, lora_max_num=4,
        lora_max_rank=rank)

    stream = bench._stream_kind("dense", B)
    cache_file = bench.pack_cache_file(cfg, rt.cache, stream)
    import pickle
    if os.path.exists(cache_file):
        with open(cache_file, "rb") as f:
            plan, packed_np, embed_np = pickle.load(f)
    else:   # fresh machine: build like bench_sweep.load_pack
        t0 = time.time()
        params_np = bench.build_qwen2_7b_params(cfg)
        if stream == "i8":
            params_np = mk.expand_u4_to_i8(params_np) or params_np
        os.environ["DI_MK_STREAM"] = stream
        plan = mk.make_plan(
            cfg, rt, params_np,
            interleave_mlp=os.environ.get("DI_MK_ILV", "1") != "0")
        packed_np = jax.tree.map(np.asarray,
                                 mk.pack_params(cfg, plan, params_np))
        embed_np = np.asarray(params_np["embed_tokens"]["w"])
        with open(cache_file, "wb") as f:
            pickle.dump((plan, packed_np, embed_np), f)
        log(f"[{stream}] pack built in {time.time()-t0:.1f}s")
    plan = dataclasses.replace(plan, B=B, maxP=rt.max_pages_per_seq,
                               MAXPG=B * rt.max_pages_per_seq)
    assert mk.supports_lora_epilogue(plan), \
        "plan must support the in-kernel LoRA epilogue"
    t0 = time.time()
    packed = jax.tree.map(jnp.asarray, packed_np)
    params = {"packed": packed, "embed": jnp.asarray(embed_np)}
    jax.block_until_ready(packed)
    log(f"[{stream}] pack uploaded in {time.time()-t0:.1f}s")

    # one random adapter in pool slot 0
    lm = LoraManager(cfg, rt, jnp.bfloat16)
    rng = np.random.RandomState(3)
    tensors = {}
    for l in range(cfg.num_layers):
        for t in ("q_proj", "k_proj", "v_proj", "o_proj", "gate_proj",
                  "up_proj", "down_proj"):
            i, o = _dims(cfg, t)
            tensors[(l, t, "A")] = rng.randn(rank, i).astype(
                np.float32) * 0.01
            tensors[(l, t, "B")] = rng.randn(o, rank).astype(
                np.float32) * 0.01
    lm.load("ad", tensors, alpha=2.0 * rank, rank=rank)
    pool = lm.pool_for_mega(plan)
    jax.block_until_ready(pool)
    log("adapter loaded into pool slot 0")

    maxP = rt.max_pages_per_seq
    pt = np.zeros((B, maxP), np.int32)
    g = 0
    for b in range(B):
        for j in range(min((ctx_len + page_size - 1) // page_size + 2,
                           maxP)):
            pt[b, j] = g % npages
            g += 1

    def fresh_state(n_lora):
        li = np.full((B,), -1, np.int32)
        li[:n_lora] = 0
        return dataclasses.replace(
            make_decode_state(cfg, rt),
            token_ids=jnp.arange(B, dtype=jnp.int32) + 7,
            context_lens=jnp.full((B,), ctx_len, jnp.int32),
            prompt_lens=jnp.full((B,), ctx_len, jnp.int32),
            gen_lens=jnp.ones((B,), jnp.int32),
            page_tables=jnp.asarray(pt),
            lora_idx=jnp.asarray(li),
            active=jnp.ones((B,), bool))

    def npi_for(lens_h):
        out = np.full((B,), -1, np.int32)
        for b in range(B):
            t = int(lens_h[b])
            if t % page_size == 0:
                out[b] = pt[b, min(t // page_size, maxP - 1)]
        return jnp.asarray(out)

    def run_single(label, with_lora, n_lora):
        cache = create_kv_cache(cfg, rt.cache, npages * cfg.num_layers,
                                model_dtype=jnp.bfloat16)
        state = fresh_state(n_lora)
        decode = steps_mod.build_decode_step(
            cfg, rt, use_kernel=True, with_lora=with_lora,
            megakernel_plan=plan)
        kw = {"lora_pool": pool} if with_lora else {}
        lens_h = np.full((B,), ctx_len, np.int64)
        t0 = time.time()
        for _ in range(8):
            tok, _, cache, state = decode(params, cache, state,
                                          npi_for(lens_h), **kw)
            lens_h += 1
        np.asarray(tok)
        log(f"[{label}] compile+warmup in {time.time()-t0:.1f}s")
        t0 = time.time()
        prev = None
        for _ in range(steps):
            tok, _, cache, state = decode(params, cache, state,
                                          npi_for(lens_h), **kw)
            lens_h += 1
            tok.copy_to_host_async()
            if prev is not None:
                np.asarray(prev)
            prev = tok
        np.asarray(prev)
        dt = time.time() - t0
        ms = dt / steps * 1e3
        tok_s = B * steps / dt
        log(f"[{label}] {ms:.2f} ms/step -> {tok_s:.1f} tok/s")
        del cache, state, decode
        return {"ms_per_step": round(ms, 2), "tok_s": round(tok_s, 1)}

    out = {"config": {"model": "qwen2-7b-shape", "ctx": ctx_len,
                      "batch": B, "stream": stream, "rank": rank,
                      "steps": steps, "launch": "single-step"}}
    out["no_lora"] = run_single("no-lora", False, 0)
    out["lora_1_slot"] = run_single("lora-1", True, 1)
    out[f"lora_{B}_slots"] = run_single(f"lora-{B}", True, B)
    base = out["no_lora"]["tok_s"]
    out["ratio_1_slot"] = round(out["lora_1_slot"]["tok_s"] / base, 3)
    out[f"ratio_{B}_slots"] = round(
        out[f"lora_{B}_slots"]["tok_s"] / base, 3)
    out["target"] = ">= 0.80 of no-LoRA (VERDICT r3 #8)"
    path = os.environ.get("DI_LORA_OUT", "BENCH_LORA_r05.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
