"""On-TPU Mosaic compile gate for every quantized kernel plan variant.

Round-1 shipped TWO hardware-breaking kernel regressions that every
interpret-mode test passed: a uint8->bfloat16 dequant cast Mosaic cannot
lower, and sub-128-lane qparam DMA windows Mosaic rejects at the default
page_size=64. Interpret mode executes ANY jaxpr; the ONLY faithful oracle
for "does this kernel run on the TPU" is Mosaic itself. This gate
`jit(...).lower(...).compile()`s (no execution — seconds per case at tiny
shapes) every supported plan variant:

  {bf16, a16w8, a16w4} weights x {default, int8, uint4} KV x
  page_size {16, 64, 128, 256} x {dense, qk_norm, alibi, moe} x
  {decode, prefill} megakernels, page_chunk {1,2}, both u4-dequant
  variants, the TP-2-shard decode/prefill segment kernels, and the
  fallback paged-attention kernel.

Run: `python tools/tpu_compile_gate.py [--quick]` on a host with a real
TPU; exits nonzero listing every variant that fails to compile. `--quick`
covers the regression-prone core (~10 cases) for use as a pre-commit
check; the full matrix is the pre-bench gate. The reference's analog is
its golden model tests as release gate
(tests/cpp/model/cuda/model_cuda_test.cpp:205-1277) — run on real GPUs
because only the hardware toolchain can veto a kernel.
"""

import argparse
import dataclasses
import os
import sys
import time
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def _sds(tree):
    return jax.tree.map(
        lambda x: jax.ShapeDtypeStruct(jnp.shape(x), jnp.result_type(x)),
        tree)


def _fixtures():
    sys.path.insert(0, ".")
    from tests.test_megakernel import _tiny, _tiny_moe
    return _tiny, _tiny_moe


def _quantize(params, quant):
    if quant == "none":
        return params
    from dashinfer_tpu.config import QuantConfig
    from dashinfer_tpu.loader.quantize import quantize_params
    return quantize_params(params, QuantConfig(mode=quant, group_size=128))


def _cache_sds(cfg, rt, kv_mode):
    from dashinfer_tpu.runtime.kv_cache import create_kv_cache
    import dataclasses as dc
    cc = dc.replace(rt.cache, mode=kv_mode)
    cache = jax.eval_shape(
        lambda: create_kv_cache(cfg, cc, rt.cache.num_pages * cfg.num_layers,
                                model_dtype=jnp.bfloat16))
    pools = [cache.k, cache.v]
    if cache.k_qparams is not None:
        pools += [cache.k_qparams, cache.v_qparams]
    return pools


def gate_decode(quant, kv_name, ps, qk_norm=False, alibi=False, moe=False,
                page_chunk=1, u4deq=None):
    import os
    from dashinfer_tpu.config import CacheMode
    from dashinfer_tpu.ops.pallas import megakernel as mk
    _tiny, _tiny_moe = _fixtures()

    if u4deq is not None:
        os.environ["DI_MK_U4DEQ"] = u4deq
    else:
        os.environ.pop("DI_MK_U4DEQ", None)
    if page_chunk != 1:
        os.environ["DI_MK_PAGE_CHUNK"] = str(page_chunk)
    else:
        os.environ.pop("DI_MK_PAGE_CHUNK", None)
    try:
        if moe:
            cfg, rt, params = _tiny_moe(ps=ps)
        else:
            kh = 2 if kv_name == "uint4" else 1  # u4 KV needs KH*D/2 >= 128
            cfg, rt, params = _tiny(qk_norm=qk_norm, alibi=alibi, ps=ps,
                                    KH=kh, H=2 * kh, dtype="bfloat16")
        kv_mode = CacheMode[kv_name.upper()] if kv_name != "default" \
            else CacheMode.DEFAULT
        rt = dataclasses.replace(
            rt, cache=dataclasses.replace(rt.cache, mode=kv_mode))
        params = _quantize(params, quant)
        assert mk.supports(cfg, rt, params), "supports() rejected variant"
        plan = mk.make_plan(cfg, rt, params, target_chunk_bytes=64 * 1024)
        packed = mk.pack_params(cfg, plan, params)
        fn = mk.build_decode_megakernel(plan, interpret=False)

        B = rt.max_batch
        maxP = rt.max_pages_per_seq
        i32 = jnp.int32
        pt = jax.ShapeDtypeStruct((B, maxP), i32)
        vec = jax.ShapeDtypeStruct((B,), i32)
        x = jax.ShapeDtypeStruct((B, plan.hid), jnp.bfloat16)
        cq = jax.ShapeDtypeStruct((B, plan.H * plan.D), jnp.bfloat16)
        ck = jax.ShapeDtypeStruct((B, plan.KH * plan.D), jnp.bfloat16)
        # schedule arrays: padded page count per build_schedule
        C = plan.page_chunk
        n_pad = B * (-(-maxP // C)) * C
        sched = jax.ShapeDtypeStruct((n_pad,), i32)
        n1 = jax.ShapeDtypeStruct((1,), i32)
        pools = _cache_sds(cfg, rt, kv_mode)
        jax.jit(fn).lower(_sds(packed), x, cq, cq, ck, ck,
                          pt, vec, vec, vec, sched, sched, n1,
                          *pools).compile()
    finally:
        os.environ.pop("DI_MK_U4DEQ", None)
        os.environ.pop("DI_MK_PAGE_CHUNK", None)


def gate_prefill(quant, kv_name, ps, qk_norm=False, alibi=False, moe=False,
                 bucket=128):
    from dashinfer_tpu.config import CacheMode
    from dashinfer_tpu.ops.pallas import prefill_megakernel as pmk
    _tiny, _tiny_moe = _fixtures()

    if moe:
        cfg, rt, params = _tiny_moe()
    else:
        kh = 2 if kv_name == "uint4" else 1  # u4 KV needs KH*D/2 >= 128
        cfg, rt, params = _tiny(qk_norm=qk_norm, alibi=alibi, ps=ps,
                                KH=kh, H=2 * kh, dtype="bfloat16")
    kv_mode = CacheMode[kv_name.upper()] if kv_name != "default" \
        else CacheMode.DEFAULT
    rt = dataclasses.replace(
        rt, max_length=bucket + rt.cache.page_size,
        cache=dataclasses.replace(rt.cache, mode=kv_mode, page_size=ps))
    params = _quantize(params, quant)
    assert pmk.supports_prefill(cfg, rt, params, bucket), "unsupported"
    plan = pmk.make_prefill_plan(cfg, rt, params, bucket)
    packed = pmk.pack_prefill_params(cfg, plan, params)
    fn = pmk.build_prefill_megakernel(plan, interpret=False)

    x0 = jax.ShapeDtypeStruct((bucket, plan.hid), jnp.bfloat16)
    cos = jax.ShapeDtypeStruct((bucket, plan.D), jnp.float32)
    maxPb = -(-bucket // ps)
    page_row = jax.ShapeDtypeStruct((maxPb,), jnp.int32)
    n_tok = jax.ShapeDtypeStruct((), jnp.int32)
    pools = _cache_sds(cfg, rt, kv_mode)
    jax.jit(fn).lower(_sds(packed), x0, cos, cos, page_row, n_tok,
                      *pools).compile()


def gate_paged_attention(kv_name, ps):
    from dashinfer_tpu.config import CacheMode, CacheConfig, ModelConfig
    from dashinfer_tpu.ops.pallas import paged_attention as pa
    from dashinfer_tpu.runtime.kv_cache import create_kv_cache

    kv_mode = CacheMode[kv_name.upper()] if kv_name != "default" \
        else CacheMode.DEFAULT
    cfg = ModelConfig(arch="qwen2", vocab_size=512, hidden_size=256,
                      intermediate_size=256, num_layers=1, num_heads=2,
                      num_kv_heads=1, head_dim=128)
    cc = CacheConfig(page_size=ps, num_pages=16, mode=kv_mode)
    cache = create_kv_cache(cfg, cc, 16, model_dtype=jnp.bfloat16)
    B, maxP = 2, 4
    q = jax.ShapeDtypeStruct((B, cfg.num_heads, cfg.head_dim), jnp.bfloat16)
    pt = jax.ShapeDtypeStruct((B, maxP), jnp.int32)
    lens = jax.ShapeDtypeStruct((B,), jnp.int32)
    fn = lambda q_, pt_, lens_, c: pa.paged_attention(  # noqa: E731
        q_, c, kv_mode, pt_, lens_, 0.0883883, interpret=False)
    jax.jit(fn).lower(q, pt, lens, _sds(cache)).compile()


def gate_tp_segments(quant, kv_name, ps, shards=2, prefill=False):
    """Compile the per-shard TP segment kernels standalone (the shard_map
    wrapper only adds psum outside the kernels; Mosaic lowering is decided
    per-kernel, so a 1-chip AOT compile of the shard body is the gate)."""
    from dashinfer_tpu.config import CacheMode, QuantConfig
    from dashinfer_tpu.loader.quantize import quantize_params
    from dashinfer_tpu.ops.pallas import tp_megakernel as tpk
    sys.path.insert(0, ".")
    from tests.test_tp_megakernel import _tp_tiny

    cfg, rt, params = _tp_tiny(ps=ps)
    kv_mode = CacheMode[kv_name.upper()] if kv_name != "default" \
        else CacheMode.DEFAULT
    rt = dataclasses.replace(
        rt, cache=dataclasses.replace(rt.cache, mode=kv_mode))
    if quant != "none":
        params = quantize_params(params, QuantConfig(mode=quant,
                                                     group_size=128))
    assert tpk.supports_tp(cfg, rt, params, shards), "unsupported"
    if prefill:
        plan, packed = tpk.make_tp_prefill_plan(cfg, rt, params, 128, shards,
                                                target_chunk_bytes=64 * 1024)
    else:
        plan, packed = tpk.make_tp_plan(cfg, rt, params, shards,
                                        target_chunk_bytes=64 * 1024)
    # per-shard view: the shard_map body drops the leading rank dim
    # (build_tp_decode_fn local_fn: pk = tree.map(a[0], packed))
    shard0 = jax.tree.map(lambda a: a[0], packed)

    B = rt.max_batch
    maxP = rt.max_pages_per_seq
    i32 = jnp.int32
    pools = _cache_sds_tp(cfg, rt, kv_mode, plan)
    if prefill:
        S = 128
        seg = tpk.build_prefill_attn_segment(plan, interpret=False)
        x = jax.ShapeDtypeStruct((S, plan.hid), jnp.float32)
        cos = jax.ShapeDtypeStruct((S, plan.D), jnp.float32)
        maxPb = -(-S // ps)
        pr = jax.ShapeDtypeStruct((maxPb,), i32)
        nt = jax.ShapeDtypeStruct((), i32)
        li = jax.ShapeDtypeStruct((), i32)
        jax.jit(seg).lower(li, x, cos, cos, pr, nt, _sds(shard0),
                           *pools).compile()
    else:
        seg = tpk.build_attn_segment(plan, interpret=False)
        x = jax.ShapeDtypeStruct((B, plan.hid), jnp.float32)
        cq = jax.ShapeDtypeStruct((B, plan.H * plan.D), jnp.bfloat16)
        ck = jax.ShapeDtypeStruct((B, plan.KH * plan.D), jnp.bfloat16)
        pt = jax.ShapeDtypeStruct((B, maxP), i32)
        vec = jax.ShapeDtypeStruct((B,), i32)
        sched = jax.ShapeDtypeStruct((B * maxP,), i32)
        n1 = jax.ShapeDtypeStruct((1,), i32)
        li = jax.ShapeDtypeStruct((), i32)
        jax.jit(seg).lower(li, x, cq, cq, ck, ck, pt, vec, vec, vec,
                           sched, sched, n1, _sds(shard0), *pools).compile()


def _cache_sds_tp(cfg, rt, kv_mode, plan):
    from dashinfer_tpu.runtime.kv_cache import create_kv_cache
    cc = dataclasses.replace(rt.cache, mode=kv_mode)
    cache = jax.eval_shape(
        lambda: create_kv_cache(cfg, cc, rt.cache.num_pages * cfg.num_layers,
                                model_dtype=jnp.bfloat16,
                                kv_heads_override=plan.KH))
    pools = [cache.k, cache.v]
    if cache.k_qparams is not None:
        pools += [cache.k_qparams, cache.v_qparams]
    return pools


# (name, callable) matrix builders ------------------------------------------

def gate_grouped_moe(bits, repack=False):
    """Grouped fused-dequant MoE matmul (ops/pallas/grouped_quant_matmul)."""
    import numpy as np
    from dashinfer_tpu.loader.quantize import _quantize_stacked
    from dashinfer_tpu.ops.pallas.grouped_quant_matmul import (
        build_group_layout, grouped_quant_matmul, repack_expert_u4_tile128)
    E, K, TM = 4, 256, 16
    N = 192 if repack else (512 if bits == 4 else 384)
    rng = np.random.default_rng(0)
    w = rng.standard_normal((E, K, N), dtype=np.float32)
    leaf = _quantize_stacked(w, bits, 128)
    if repack:
        st = {k: v[None] for k, v in leaf.items()}
        g = repack_expert_u4_tile128(st, N)
        leaf = {"w_q": g["w_qg"][0], "scale": g["scale_g"][0],
                "zero": g["zero_g"][0]}
    T, ktop = 16, 2
    topk_i = jnp.asarray(rng.integers(0, E, size=(T, ktop)).astype("int32"))
    _, _, _, te = build_group_layout(topk_i, E, TM)
    Mcap = int(te.shape[0]) * TM
    leaf = jax.tree.map(jnp.asarray, leaf)
    fn = jax.jit(lambda xs, tee: grouped_quant_matmul(
        xs, tee, leaf, interpret=False))
    fn.lower(jax.ShapeDtypeStruct((Mcap, K), jnp.bfloat16),
             jax.ShapeDtypeStruct(te.shape, jnp.int32)).compile()


def build_cases(quick: bool):
    cases = []

    def add(name, fn, *a, **kw):
        cases.append((name, lambda: fn(*a, **kw)))

    # regression-prone core (the two round-1 breakers live here)
    add("decode a16w4+int8 ps=64", gate_decode, "a16w4", "int8", 64)
    add("decode a16w4+int8 ps=16", gate_decode, "a16w4", "int8", 16)
    add("decode a16w4+uint4 ps=64", gate_decode, "a16w4", "uint4", 64)
    add("decode a16w4+int8 ps=256", gate_decode, "a16w4", "int8", 256)
    add("decode a16w4+int8 ps=64 u4deq=u8", gate_decode, "a16w4", "int8",
        64, u4deq="u8")
    add("decode a16w4+int8 ps=16 chunk=2", gate_decode, "a16w4", "int8",
        16, page_chunk=2)
    add("prefill a16w4+int8 ps=64", gate_prefill, "a16w4", "int8", 64)
    add("prefill a16w4+uint4 ps=16", gate_prefill, "a16w4", "uint4", 16)
    add("paged_attention int8 ps=16", gate_paged_attention, "int8", 16)
    add("paged_attention uint4 ps=64", gate_paged_attention, "uint4", 64)
    if quick:
        return cases

    add("decode bf16+int8 ps=64", gate_decode, "none", "int8", 64)
    add("decode a16w8+int8 ps=128", gate_decode, "a16w8", "int8", 128)
    add("decode a16w8+uint4 ps=256", gate_decode, "a16w8", "uint4", 256)
    add("decode a16w4+default ps=64", gate_decode, "a16w4", "default", 64)
    add("decode a16w4+int8 ps=64 qk_norm", gate_decode, "a16w4", "int8",
        64, qk_norm=True)
    add("decode a16w4+int8 ps=64 alibi", gate_decode, "a16w4", "int8",
        64, alibi=True)
    add("decode a16w4+int8 moe", gate_decode, "a16w4", "int8", 16, moe=True)
    add("decode a16w4+int8 ps=64 u4deq=i32", gate_decode, "a16w4", "int8",
        64, u4deq="i32")
    add("prefill a16w8+int8 ps=128", gate_prefill, "a16w8", "int8", 128)
    add("prefill bf16+int8 ps=64", gate_prefill, "none", "int8", 64)
    add("prefill a16w4+default ps=64", gate_prefill, "a16w4", "default", 64)
    add("prefill a16w4+int8 moe", gate_prefill, "a16w4", "int8", 16,
        moe=True)
    add("paged_attention int8 ps=256", gate_paged_attention, "int8", 256)
    add("paged_attention default ps=64", gate_paged_attention, "default", 64)
    add("tp-decode a16w4+int8 ps=64", gate_tp_segments, "a16w4", "int8", 64)
    add("tp-decode a16w4+int8 ps=16", gate_tp_segments, "a16w4", "int8", 16)
    add("tp-prefill a16w4+int8 ps=64", gate_tp_segments, "a16w4", "int8",
        64, prefill=True)
    add("grouped-moe u4 tile128", gate_grouped_moe, 4)
    add("grouped-moe int8", gate_grouped_moe, 8)
    add("grouped-moe u4 repacked", gate_grouped_moe, 4, repack=True)
    return cases


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true",
                    help="regression-prone core only (~10 compiles)")
    ap.add_argument("-k", default="", help="substring filter")
    args = ap.parse_args()

    if jax.default_backend() not in ("tpu", "axon"):
        print(f"SKIP: backend is {jax.default_backend()!r}, not TPU — "
              "this gate is only meaningful against Mosaic hardware "
              "lowering")
        return 0

    failures = []
    cases = [c for c in build_cases(args.quick) if args.k in c[0]]
    for name, fn in cases:
        t0 = time.time()
        try:
            fn()
            print(f"PASS  {name}  ({time.time() - t0:.1f}s)")
        except Exception as e:  # noqa: BLE001
            msg = str(e).splitlines()
            head = next((ln for ln in msg if "Mosaic" in ln or
                         "NotImplemented" in ln or "Unsupported" in ln),
                        msg[0] if msg else repr(e))
            print(f"FAIL  {name}  ({time.time() - t0:.1f}s): {head[:160]}")
            failures.append((name, traceback.format_exc()))
    print(f"\n{len(cases) - len(failures)}/{len(cases)} variants compile")
    if failures:
        print("\nFailures:")
        for name, tb in failures:
            print(f"--- {name} ---\n{tb[-2000:]}")
        return 1
    return 0


if __name__ == "__main__":
    sys.exit(main())
