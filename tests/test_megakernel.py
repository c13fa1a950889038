"""Whole-model decode megakernel vs the scanned decode_forward reference
(interpret mode on CPU; the reference validates its span-attention library
against CPU golden kernels the same way, span-attention/test/)."""

import numpy as np
import pytest


def _tiny(B=4, L=2, KH=1, H=2, hid=256, inter=256, vocab=512, ps=16,
          dtype="float32", qk_norm=False, alibi=False):
    import jax
    import jax.numpy as jnp
    from dashinfer_tpu.config import CacheConfig, CacheMode, ModelConfig, \
        PositionEmbedding, RuntimeConfig

    cfg = ModelConfig(arch="baichuan" if alibi
                      else ("qwen3" if qk_norm else "qwen2"),
                      vocab_size=vocab, hidden_size=hid,
                      intermediate_size=inter, num_layers=L, num_heads=H,
                      num_kv_heads=KH, head_dim=128,
                      qkv_bias=not (qk_norm or alibi), qk_norm=qk_norm,
                      position_embedding=(PositionEmbedding.ALIBI if alibi
                                          else PositionEmbedding.ROPE))
    rt = RuntimeConfig(model_name="mk", max_length=ps * 4, max_batch=B,
                       cache=CacheConfig(page_size=ps, num_pages=64),
                       dtype=dtype, min_prefill_bucket=16)
    key = jax.random.PRNGKey(0)
    jdt = jnp.float32 if dtype == "float32" else jnp.bfloat16

    def rnd(*shape):
        nonlocal key
        key, k = jax.random.split(key)
        return (jax.random.normal(k, shape, jnp.float32) * 0.05).astype(jdt)

    D = 128
    params = {
        "embed_tokens": {"w": rnd(vocab, hid)},
        "norm": jnp.ones((hid,), jdt),
        "lm_head": {"w": rnd(hid, vocab)},
        "layers": {
            "input_layernorm": 1.0 + 0.1 * rnd(L, hid).astype(jdt),
            "post_attention_layernorm": 1.0 + 0.1 * rnd(L, hid).astype(jdt),
            "q_proj": {"w": rnd(L, hid, H * D), "b": rnd(L, H * D) * 0.2},
            "k_proj": {"w": rnd(L, hid, KH * D), "b": rnd(L, KH * D) * 0.2},
            "v_proj": {"w": rnd(L, hid, KH * D), "b": rnd(L, KH * D) * 0.2},
            "o_proj": {"w": rnd(L, H * D, hid)},
            "gate_proj": {"w": rnd(L, hid, inter)},
            "up_proj": {"w": rnd(L, hid, inter)},
            "down_proj": {"w": rnd(L, inter, hid)},
        },
    }
    if qk_norm:
        params["layers"]["q_norm"] = 1.0 + 0.2 * rnd(L, 128).astype(jdt)
        params["layers"]["k_norm"] = 1.0 - 0.2 * rnd(L, 128).astype(jdt)
    if qk_norm or alibi:
        for nm in ("q_proj", "k_proj", "v_proj"):
            params["layers"][nm].pop("b")
    return cfg, rt, params


_fixture_cache = {}


def _quantized_fixture(quant, qk_norm, alibi, ps, kh):
    """Memoized (cfg, rt, params) per geometry+quant combo: quantize_params
    costs seconds per call on the single-core CI box, and parametrized
    cases share most combos. Params are immutable jax arrays — sharing
    across cases is safe; callers must not mutate rt in place
    (dataclasses.replace only)."""
    key = (quant, qk_norm, alibi, ps, kh)
    if key not in _fixture_cache:
        from dashinfer_tpu.config import QuantConfig
        cfg, rt, params = _tiny(qk_norm=qk_norm, alibi=alibi, ps=ps,
                                KH=kh, H=2 * kh)
        if quant != "none":
            from dashinfer_tpu.loader.quantize import quantize_params
            params = quantize_params(params, QuantConfig(mode=quant,
                                                         group_size=128))
        _fixture_cache[key] = (cfg, rt, params)
    return _fixture_cache[key]


def _prep_cache(cfg, rt, params, mode, lens, pt):
    """Prefill each slot's pages through the functional prefill path so both
    decode paths see identical cache contents."""
    import functools
    import jax
    import jax.numpy as jnp
    from dashinfer_tpu.models import transformer
    from dashinfer_tpu.runtime.kv_cache import create_kv_cache

    B = rt.max_batch
    cache = create_kv_cache(cfg, rt.cache,
                            rt.cache.num_pages * cfg.num_layers,
                            model_dtype=jnp.float32
                            if rt.dtype == "float32" else jnp.bfloat16)
    ps = rt.cache.page_size
    maxT = max(int(t) for t in lens) if len(lens) else 1
    S = max(32, -(-maxT // ps) * ps)
    n_pages = -(-S // ps)
    rng = np.random.RandomState(3)
    # jit once (T is a traced scalar): per-slot eager dispatch dominated
    # the fixture cost on the single-core CI box
    pf = jax.jit(functools.partial(transformer.prefill_forward, cfg,
                                   mode=mode, use_kernel=False))
    for b in range(B):
        T = int(lens[b])
        if T == 0:
            continue
        toks = np.zeros((S,), np.int32)
        toks[:T] = rng.randint(1, cfg.vocab_size, size=T)
        _, cache = pf(params, jnp.asarray(toks), cache,
                      jnp.asarray(pt[b, :n_pages]),
                      jnp.int32(0), jnp.int32(T))
    return cache


@pytest.mark.parametrize("quant,kv_mode_name,qk_norm,alibi,page_chunk,ps", [
    ("none", "default", False, False, 1, 16),
    ("none", "int8", False, False, 1, 16),
    ("a16w4", "int8", False, False, 1, 16),
    ("a16w8", "uint4", False, False, 1, 16),
    ("none", "int8", True, False, 1, 16),    # Qwen3 per-head QK RMSNorm
    ("a16w4", "int8", True, False, 1, 16),
    ("a8w8", "int8", False, False, 1, 16),   # decoder_weight_only_ (§2.11)
    ("none", "int8", False, True, 1, 16),    # ALiBi (Baichuan-13B)
    ("a16w4", "int8", False, True, 1, 16),
    ("none", "int8", False, False, 2, 16),   # chunked page loop + dummies
    ("a16w4", "uint4", False, False, 2, 16),
    ("a16w4", "int8", False, False, 1, 256),  # 128-lane RMW qparam windows
    # u4 -> per-channel i8 stream re-expansion (docs/megakernel.md §i8
    # streaming): both paths consume the SAME expanded leaves, so parity is
    # exact-class; the 32 KB chunk target forces a multi-chunk per-channel
    # k-chunked down stream (the geometry the round-4 change unlocked)
    ("a16w4i8", "int8", False, False, 1, 16),
    ("a16w4i8", "uint4", False, False, 1, 16),
    # interleaved pg/pu/pd MLP streams (prefill geometry -> ONE shared
    # pack for decode + prefill; docs/megakernel.md §shared pack)
    ("none+ilv", "int8", False, False, 1, 16),
    ("a16w4+ilv", "int8", False, False, 1, 16),
    ("a16w4i8+ilv", "int8", False, False, 1, 16),
    ("a16w4+ilv", "uint4", False, False, 2, 16),
])
def test_megakernel_matches_reference(quant, kv_mode_name, qk_norm, alibi,
                                      page_chunk, ps):
    run_megakernel_parity_case(quant, kv_mode_name, qk_norm, alibi,
                               page_chunk, ps, interpret=True)


def run_megakernel_parity_case(quant, kv_mode_name, qk_norm, alibi,
                               page_chunk, ps, interpret=True):
    """Megakernel decode step vs the XLA decode_forward reference on the
    SAME cache/inputs: logits rel-tol + argmax (greedy) parity, plus KV/
    qparam write-back checks. interpret=True = CPU CI; interpret=False on
    a TPU = the hardware numerics gate (tools/tpu_parity_check.py quant
    cases — Mosaic-lowered code, no interpret shortcut)."""
    import jax
    import jax.numpy as jnp
    from dashinfer_tpu.config import CacheConfig, CacheMode, QuantConfig, \
        RuntimeConfig
    import dataclasses
    from dashinfer_tpu.models import transformer
    from dashinfer_tpu.ops.pallas import megakernel as mk
    from dashinfer_tpu.ops import kv_ops

    kv_mode = CacheMode(kv_mode_name)
    # uint4 KV packs head_dim to 64 lanes; the megakernel needs the pool's
    # KH*D/2 lane dim to fill a 128 tile (supports() gates KH=1 + u4 off
    # the fast path), so u4-KV cases run the realistic GQA geometry
    kh = 2 if kv_mode == CacheMode.UINT4 else 1
    ilv = quant.endswith("+ilv")     # interleaved pg/pu/pd (shared pack)
    if ilv:
        quant = quant[:-4]
    expand_i8 = quant == "a16w4i8"
    fixture_quant = "a16w4" if expand_i8 else quant
    cfg, rt, params = _quantized_fixture(fixture_quant, qk_norm, alibi, ps,
                                         kh)
    rt = dataclasses.replace(
        rt, cache=dataclasses.replace(rt.cache, mode=kv_mode))
    chunk_bytes = 64 * 1024
    if expand_i8:
        conv = mk.expand_u4_to_i8(params)
        assert conv is not None
        for nm in ("q_proj", "o_proj", "gate_proj", "down_proj"):
            leaf = conv["layers"][nm]
            assert leaf["w_q"].dtype == np.int8
            assert leaf["scale"].shape[1] == 1        # per-channel
        params = conv
        chunk_bytes = 32 * 1024   # force S>1 per-channel k-chunked dn
    if quant == "a8w8":
        # reference decoder_weight_only_ (device_context.h:148-149): decode
        # runs the weight-only view of the symmetric per-channel int8 leaves;
        # both paths below consume the view, so parity is exact-class
        view = mk.weight_only_decode_view(params)
        assert view is not params
        assert "w_q" in view["layers"]["q_proj"]
        assert view["layers"]["q_proj"]["scale"].shape[1] == 1
        params = view

    assert mk.supports(cfg, rt, params)
    plan = mk.make_plan(cfg, rt, params, target_chunk_bytes=chunk_bytes,
                        interleave_mlp=ilv)
    if ilv:
        assert plan.interleave and plan.pg.S >= 1
    if expand_i8 and not ilv:
        assert plan.dn.S > 1 and plan.dn.gs >= cfg.intermediate_size
    if page_chunk != 1:
        plan = dataclasses.replace(plan, page_chunk=page_chunk)
    packed = mk.pack_params(cfg, plan, params)
    fn = mk.build_decode_megakernel(plan, interpret=interpret)

    B, L, ps = rt.max_batch, cfg.num_layers, rt.cache.page_size
    maxP = rt.max_pages_per_seq
    if ps > 128:
        # offsets past lane 128 exercise the windowed RMW qparam writes
        lens = np.asarray([2 * ps - 60, ps, 140, 0], np.int32)[:B]
    else:
        lens = np.asarray([17, 16, 5, 0], np.int32)[:B]
    active = np.asarray([1, 1, 1, 0], np.int32)[:B]
    pt = np.zeros((B, maxP), np.int32)
    g = 1
    for b in range(B):
        for j in range(maxP):
            pt[b, j] = g
            g += 1

    cache = _prep_cache(cfg, rt, params, kv_mode, lens, pt)
    tokens = jnp.asarray([7, 11, 13, 0], jnp.int32)[:B]

    # reference path (appends quantized kv, then attends)
    ref_logits, ref_cache = transformer.decode_forward(
        cfg, params, tokens, jax.tree.map(jnp.copy, cache), jnp.asarray(pt),
        jnp.asarray(lens), jnp.asarray(active > 0), mode=kv_mode,
        use_kernel=False)

    # megakernel path
    x0 = params["embed_tokens"]["w"][tokens].astype(jnp.bfloat16)
    H, KH = cfg.num_heads, cfg.num_kv_heads
    D = cfg.head_dim
    if alibi:
        cosq = jnp.ones((B, H * D), jnp.bfloat16)
        sinq = jnp.zeros((B, H * D), jnp.bfloat16)
        cosk = jnp.ones((B, KH * D), jnp.bfloat16)
        sink = jnp.zeros((B, KH * D), jnp.bfloat16)
    else:
        from dashinfer_tpu.ops.rotary import (compute_inv_freq, rope_cos_sin,
                                              _mscale)
        inv_freq = compute_inv_freq(cfg)
        cos, sin = rope_cos_sin(jnp.asarray(lens), inv_freq,
                                _mscale(cfg.rope_scaling))
        cos = jnp.concatenate([cos, cos], axis=-1).astype(jnp.bfloat16)
        sin = jnp.concatenate([sin, sin], axis=-1).astype(jnp.bfloat16)
        cosq = jnp.tile(cos, (1, H))
        sinq = jnp.tile(sin, (1, H))
        cosk = jnp.tile(cos, (1, KH))
        sink = jnp.tile(sin, (1, KH))
    sched_b, sched_p, n_sched, tgt_page = mk.build_schedule(
        jnp.asarray(pt), jnp.asarray(lens), jnp.asarray(active > 0), ps,
        chunk=plan.page_chunk)
    pools = [cache.k, cache.v]
    if cache.k_qparams is not None:
        pools += [cache.k_qparams, cache.v_qparams]
    outs = fn(packed, x0, cosq, sinq, cosk, sink,
              jnp.asarray(pt), jnp.asarray(lens), jnp.asarray(active),
              tgt_page, sched_b, sched_p, n_sched, *pools)
    logits = np.asarray(outs[0])[:, :cfg.vocab_size]

    ref = np.asarray(ref_logits)
    # compare active rows; bf16 megakernel vs f32 reference needs loose tol
    for b in range(B):
        if active[b] == 0:
            continue
        denom = np.abs(ref[b]).max() + 1e-6
        rel = np.abs(logits[b] - ref[b]).max() / denom
        tol = 0.05 if quant == "none" else 0.08
        assert rel < tol, (b, rel)
        # argmax agreement (greedy token parity)
        assert int(np.argmax(logits[b])) == int(np.argmax(ref[b])), b

    # new-token KV landed in the pool (dequantized compare vs reference pool)
    new_k = outs[1]
    ref_k = ref_cache.k
    for b in range(B):
        if active[b] == 0:
            continue
        gpage = pt[b, lens[b] // ps]
        off = int(lens[b] % ps)
        for l in range(L):
            got = np.asarray(new_k[gpage * L + l, off], np.float32)
            want = np.asarray(ref_k[gpage * L + l, off], np.float32)
            if kv_mode == CacheMode.DEFAULT:
                np.testing.assert_allclose(got, want, atol=5e-2, rtol=5e-2)
            else:
                # quant levels may differ by rounding; compare dequantized
                assert got.shape == want.shape
        if kv_mode != CacheMode.DEFAULT:
            # the RMW windowed qparam write: only column `off` of the
            # target page changed (loose — the kernel's bf16 K/V shifts
            # the computed scale slightly vs the f32 reference); every
            # OTHER column must be untouched (a mis-offset window would
            # corrupt them)
            keep = np.arange(ps) != off
            for pool_i, ref_q in ((3, ref_cache.k_qparams),
                                  (4, ref_cache.v_qparams)):
                for l in range(L):
                    got = np.asarray(outs[pool_i][gpage * L + l],
                                     np.float32)[:, :ps]  # drop pad lanes
                    want = np.asarray(ref_q[gpage * L + l],
                                      np.float32)[:, :ps]
                    np.testing.assert_array_equal(got[:, keep],
                                                  want[:, keep])
                    np.testing.assert_allclose(got[:, off], want[:, off],
                                               atol=5e-2, rtol=5e-2)


def test_megakernel_looped_gdot_epilogue_parity():
    """The B >= _GDOT_LOOP_B looped group-dot epilogue (with the folded
    zero-point MXU dot) must match the reference exactly like the default
    batched epilogue — forced on here since parity configs use B=4."""
    from dashinfer_tpu.ops.pallas import megakernel as mk_mod
    old = mk_mod._GDOT_LOOP_B
    mk_mod._GDOT_LOOP_B = 1
    try:
        test_megakernel_matches_reference(
            "a16w4", "int8", False, False, 1, 16)
        test_megakernel_matches_reference(
            "a16w8", "uint4", False, False, 1, 16)
    finally:
        mk_mod._GDOT_LOOP_B = old


def test_make_plan_batch_aware_chunks():
    """Chunk bytes must shrink as batch grows: the grouped-dequant dot
    materializes [groups, B, cols] f32 temporaries, and at bs=32 a 2 MB
    chunk spills VMEM (kernel 14.6 -> 60 ms measured on v5e)."""
    from dashinfer_tpu.config import CacheConfig, CacheMode, ModelConfig, \
        RuntimeConfig
    from dashinfer_tpu.ops.pallas import megakernel as mk

    cfg = ModelConfig(
        arch="qwen2", vocab_size=152064, hidden_size=3584,
        intermediate_size=18944, num_layers=28, num_heads=28,
        num_kv_heads=4, head_dim=128, qkv_bias=True, rope_theta=1000000.0)
    L, hid, inter, V = 28, 3584, 18944, 152064
    gs = 128

    def qleaf(kin, kout, layers=True):
        shape = (L, kin, kout // 2) if layers else (kin, kout // 2)
        gshape = (L, kin // gs, kout) if layers else (kin // gs, kout)
        return {"w_q": np.zeros(shape, np.uint8),
                "scale": np.zeros(gshape, np.float32),
                "zero": np.zeros(gshape, np.float32)}

    params = {
        "embed_tokens": {"w": np.zeros((V, hid), np.float32)},
        "norm": np.ones((hid,), np.float32),
        "lm_head": qleaf(hid, V, layers=False),
        "layers": {
            "input_layernorm": np.ones((L, hid), np.float32),
            "post_attention_layernorm": np.ones((L, hid), np.float32),
            "q_proj": qleaf(hid, 28 * 128),
            "k_proj": qleaf(hid, 4 * 128),
            "v_proj": qleaf(hid, 4 * 128),
            "o_proj": qleaf(28 * 128, hid),
            "gate_proj": qleaf(hid, inter),
            "up_proj": qleaf(hid, inter),
            "down_proj": qleaf(inter, hid),
        },
    }

    def plan_for(B):
        rt = RuntimeConfig(
            model_name="bench", max_length=1152, max_batch=B,
            cache=CacheConfig(page_size=256, mode=CacheMode.INT8,
                              num_pages=B * 8),
            dtype="bfloat16")
        return mk.make_plan(cfg, rt, params)

    import dashinfer_tpu.ops.pallas.megakernel as mk_mod

    p16, p32 = plan_for(16), plan_for(32)
    # the looped group-dot epilogue (B >= _GDOT_LOOP_B) removes the
    # [G, B, cols] spill driver, so bs=32 keeps full-size chunks
    # (measured: 1427 tok/s vs 1280 with the old 1 MB cap)
    assert p32.qkv.chunk >= p16.qkv.chunk - 512

    # with the loop epilogue disabled the batched grouped dot spills at
    # bs>=32 with big chunks — the plan must cap at 32 MB / B
    old = mk_mod._GDOT_LOOP_B
    mk_mod._GDOT_LOOP_B = 10 ** 9
    try:
        p32c = plan_for(32)
    finally:
        mk_mod._GDOT_LOOP_B = old
    assert p16.qkv.chunk > p32c.qkv.chunk
    assert p32c.qkv.chunk == 512 and p32c.qkv.S == 9


def test_build_schedule():
    import jax.numpy as jnp
    from dashinfer_tpu.ops.pallas.megakernel import build_schedule

    pt = jnp.asarray(np.arange(12).reshape(3, 4), jnp.int32)
    lens = jnp.asarray([17, 0, 33], jnp.int32)
    active = jnp.asarray([True, False, True])
    sb, sp, n, tgt = build_schedule(pt, lens, active, 16)
    n = int(n[0])
    assert n == 2 + 3  # ceil(17/16) + ceil(33/16)
    pairs = {(int(sb[i]), int(sp[i])) for i in range(n)}
    assert pairs == {(0, 0), (0, 1), (2, 0), (2, 1), (2, 2)}
    assert int(tgt[0]) == int(pt[0, 1])   # 17 // 16 = col 1
    assert int(tgt[2]) == int(pt[2, 2])

    # chunk=2: per-seq counts pad to multiples of 2, groups never straddle
    # sequences, dummies carry sched_p >= ceil(len/ps)
    sb, sp, n, _ = build_schedule(pt, lens, active, 16, chunk=2)
    n = int(n[0])
    assert n == 2 + 4  # 2 stays, 3 pads to 4
    assert n % 2 == 0
    for gi in range(n // 2):
        assert int(sb[2 * gi]) == int(sb[2 * gi + 1])  # same seq per group
    pairs = [(int(sb[i]), int(sp[i])) for i in range(n)]
    assert pairs[:2] == [(0, 0), (0, 1)]
    assert pairs[2:5] == [(2, 0), (2, 1), (2, 2)]
    assert pairs[5][0] == 2 and pairs[5][1] >= 3  # dummy tail, masked


def test_engine_serving_uses_megakernel_greedy_parity():
    """Engine decode through the megakernel fast path (interpret mode on
    CPU) produces the same greedy tokens as the fallback path."""
    import dataclasses
    import jax
    import numpy as np
    from dashinfer_tpu import Engine, GenerationConfig
    from dashinfer_tpu.config import CacheMode, QuantConfig, RuntimeConfig, \
        CacheConfig
    from dashinfer_tpu.loader.quantize import quantize_params
    from dashinfer_tpu.runtime.request import GenerateRequestStatus

    cfg, rt, params = _tiny(B=2)
    rt = dataclasses.replace(
        rt, max_length=48,
        cache=dataclasses.replace(rt.cache, mode=CacheMode.INT8))
    params = quantize_params(params, QuantConfig(mode="a16w4",
                                                 group_size=128))

    def run(enable_mega):
        rt2 = dataclasses.replace(rt, enable_megakernel=enable_mega)
        eng = Engine()
        # use_kernel normally requires TPU; force it so the megakernel packs
        from dashinfer_tpu.engine.model_runtime import ModelRuntime
        runtime = ModelRuntime("mk", cfg, params, rt2, use_kernel=enable_mega)
        if enable_mega:
            assert runtime.mega_plan is not None, "megakernel did not engage"
        eng._models["mk"] = runtime
        eng.start_model("mk")
        gen = GenerationConfig(max_length=20, do_sample=False, top_k=1,
                               eos_token_id=-1)
        _, h, q = eng.start_request("mk", [5, 9, 2, 41, 77, 3], gen)
        eng.sync_request("mk", h, timeout_s=900)
        toks = q.GetAllGeneratedTokens()
        eng.release_model("mk")
        return toks

    # interpret-mode megakernel: prefill still runs the (non-kernel-capable)
    # fallback — force use_kernel only for the packing decision
    fast = run(True)
    slow = run(False)
    assert len(fast) == len(slow) == 14
    # bf16 megakernel vs f32 fallback can flip a late near-tie argmax on a
    # random tiny model; require agreement over the first 10 steps
    assert fast[:10] == slow[:10], (fast, slow)


def test_engine_serving_alibi_megakernel_greedy_parity():
    """Baichuan-13B-style ALiBi arch through the megakernel fast path
    (exercises the identity cos/sin tiles in _megakernel_forward and the
    in-kernel slope bias) vs the XLA fallback."""
    import dataclasses
    from dashinfer_tpu import Engine, GenerationConfig
    from dashinfer_tpu.config import CacheMode, QuantConfig
    from dashinfer_tpu.loader.quantize import quantize_params

    cfg, rt, params = _tiny(B=2, alibi=True)
    rt = dataclasses.replace(
        rt, max_length=48,
        cache=dataclasses.replace(rt.cache, mode=CacheMode.INT8))
    params = quantize_params(params, QuantConfig(mode="a16w4",
                                                 group_size=128))

    def run(enable_mega):
        rt2 = dataclasses.replace(rt, enable_megakernel=enable_mega)
        eng = Engine()
        from dashinfer_tpu.engine.model_runtime import ModelRuntime
        runtime = ModelRuntime("ab", cfg, params, rt2, use_kernel=enable_mega)
        if enable_mega:
            assert runtime.mega_plan is not None and \
                runtime.mega_plan.alibi, "alibi megakernel did not engage"
        eng._models["ab"] = runtime
        eng.start_model("ab")
        gen = GenerationConfig(max_length=20, do_sample=False, top_k=1,
                               eos_token_id=-1)
        _, h, q = eng.start_request("ab", [5, 9, 2, 41, 77, 3], gen)
        eng.sync_request("ab", h, timeout_s=900)
        toks = q.GetAllGeneratedTokens()
        eng.release_model("ab")
        return toks

    fast = run(True)
    slow = run(False)
    assert len(fast) == len(slow) == 14
    assert fast[:10] == slow[:10], (fast, slow)


def test_engine_serving_a8w8_weight_only_decode():
    """An A8W8 model installs the weight-only megakernel view for decode
    (reference decoder_weight_only_, device_context.h:148-149) and serves
    greedy tokens matching the fallback path."""
    import dataclasses
    from dashinfer_tpu import Engine, GenerationConfig
    from dashinfer_tpu.config import CacheMode, QuantConfig
    from dashinfer_tpu.loader.quantize import quantize_params

    cfg, rt, params = _tiny(B=2)
    rt = dataclasses.replace(
        rt, max_length=48,
        cache=dataclasses.replace(rt.cache, mode=CacheMode.INT8))
    params = quantize_params(params, QuantConfig(mode="a8w8"))
    assert "w_q8" in params["layers"]["q_proj"]

    def run(enable_mega):
        rt2 = dataclasses.replace(rt, enable_megakernel=enable_mega)
        eng = Engine()
        from dashinfer_tpu.engine.model_runtime import ModelRuntime
        runtime = ModelRuntime("a8", cfg, params, rt2, use_kernel=enable_mega)
        if enable_mega:
            assert runtime.mega_plan is not None, \
                "weight-only view did not engage the megakernel"
        eng._models["a8"] = runtime
        eng.start_model("a8")
        gen = GenerationConfig(max_length=20, do_sample=False, top_k=1,
                               eos_token_id=-1)
        _, h, q = eng.start_request("a8", [5, 9, 2, 41, 77, 3], gen)
        eng.sync_request("a8", h, timeout_s=900)
        toks = q.GetAllGeneratedTokens()
        eng.release_model("a8")
        return toks

    fast = run(True)
    slow = run(False)   # activation-quant decode (XLA path)
    assert len(fast) == len(slow) == 14
    # weight-only decode vs activation-quant decode: same weights, slightly
    # different numerics class — require early-step agreement
    assert fast[:8] == slow[:8], (fast, slow)


def _tiny_moe(B=3, L=2, KH=1, H=2, hid=256, Im=256, E=4, k=2, vocab=512,
              ps=16, shared=True, shared_gate=True, norm_topk=True,
              qk_norm=False):
    import jax
    import jax.numpy as jnp
    from dashinfer_tpu.config import CacheConfig, CacheMode, MoEConfig, \
        ModelConfig, RuntimeConfig

    cfg = ModelConfig(
        arch="qwen3_moe" if qk_norm else "qwen2_moe", vocab_size=vocab,
        hidden_size=hid,
        intermediate_size=Im, num_layers=L, num_heads=H, num_kv_heads=KH,
        head_dim=128, qkv_bias=not qk_norm, qk_norm=qk_norm,
        moe=MoEConfig(num_experts=E, num_experts_per_tok=k,
                      moe_intermediate_size=Im,
                      shared_expert_intermediate_size=Im if shared else 0,
                      norm_topk_prob=norm_topk))
    rt = RuntimeConfig(model_name="mkmoe", max_length=ps * 4, max_batch=B,
                       cache=CacheConfig(page_size=ps, num_pages=64,
                                         mode=CacheMode.INT8),
                       dtype="float32", min_prefill_bucket=16)
    key = jax.random.PRNGKey(1)

    def rnd(*shape):
        nonlocal key
        key, kk = jax.random.split(key)
        return jax.random.normal(kk, shape, jnp.float32) * 0.05

    D = 128
    layers = {
        "input_layernorm": 1.0 + 0.1 * rnd(L, hid),
        "post_attention_layernorm": 1.0 + 0.1 * rnd(L, hid),
        "q_proj": {"w": rnd(L, hid, H * D), "b": rnd(L, H * D) * 0.2},
        "k_proj": {"w": rnd(L, hid, KH * D), "b": rnd(L, KH * D) * 0.2},
        "v_proj": {"w": rnd(L, hid, KH * D), "b": rnd(L, KH * D) * 0.2},
        "o_proj": {"w": rnd(L, H * D, hid)},
        "router": {"w": rnd(L, hid, E) * 4.0},
        "experts": {
            "gate_proj": rnd(L, E, hid, Im),
            "up_proj": rnd(L, E, hid, Im),
            "down_proj": rnd(L, E, Im, hid),
        },
    }
    if qk_norm:
        layers["q_norm"] = 1.0 + 0.2 * rnd(L, 128)
        layers["k_norm"] = 1.0 - 0.2 * rnd(L, 128)
        for nm in ("q_proj", "k_proj", "v_proj"):
            layers[nm].pop("b")
    if shared:
        layers["shared_expert"] = {
            "gate_proj": {"w": rnd(L, hid, Im)},
            "up_proj": {"w": rnd(L, hid, Im)},
            "down_proj": {"w": rnd(L, Im, hid)},
        }
        if shared_gate:
            layers["shared_expert_gate"] = {"w": rnd(L, hid, 1)}
    params = {
        "embed_tokens": {"w": rnd(vocab, hid)},
        "norm": jnp.ones((hid,), jnp.float32),
        "lm_head": {"w": rnd(hid, vocab)},
        "layers": layers,
    }
    return cfg, rt, params


def test_megakernel_moe_wide_router_lanes():
    """Expert counts past 128 pad the router to 128-lane multiples
    (Qwen3-MoE's 128 experts fit exactly; >=128+shared spills to 256) —
    plan + pack shapes; the kernel math is lane-count generic."""
    from dashinfer_tpu.ops.pallas import megakernel as mk

    cfg, rt, params = _tiny_moe(E=128, shared=False, shared_gate=False)
    assert mk.supports(cfg, rt, params)
    plan = mk.make_plan(cfg, rt, params, target_chunk_bytes=64 * 1024)
    assert plan.EP == 128            # 128 experts, no shared lane

    cfg2, rt2, params2 = _tiny_moe(E=130, shared=True, shared_gate=True)
    assert mk.supports(cfg2, rt2, params2)
    plan2 = mk.make_plan(cfg2, rt2, params2, target_chunk_bytes=64 * 1024)
    assert plan2.EP == 256           # 130 experts + shared gate col
    packed = mk.pack_params(cfg2, plan2, params2)
    assert packed["router_w"].shape == (cfg2.num_layers,
                                        cfg2.hidden_size, 256)


@pytest.mark.parametrize("quant,shared,shared_gate,qk_norm", [
    ("none", True, True, False),
    ("none", False, False, False),
    ("a16w8", True, True, False),    # quantized experts + shared expert
    ("a16w4", True, False, False),
    ("a16w4", False, False, True),   # Qwen3-MoE: QK-norm + no shared expert
    ("none+ilv", True, True, False),   # interleaved expert streams
    ("a16w4+ilv", True, False, False),
    ("a16w4+ilv", False, False, False),
])
def test_megakernel_moe_matches_reference(quant, shared, shared_gate,
                                          qk_norm):
    """MoE megakernel (router + gated expert streams + shared expert) vs
    the XLA moe_block path (reference MOE op, moe_op.cpp)."""
    import dataclasses
    import jax
    import jax.numpy as jnp
    from dashinfer_tpu.config import CacheMode, QuantConfig
    from dashinfer_tpu.models import transformer
    from dashinfer_tpu.ops.pallas import megakernel as mk
    from dashinfer_tpu.ops.rotary import (compute_inv_freq, rope_cos_sin,
                                          _mscale)

    ilv = quant.endswith("+ilv")
    if ilv:
        quant = quant[:-4]
    cfg, rt, params = _tiny_moe(shared=shared, shared_gate=shared_gate,
                                qk_norm=qk_norm)
    if quant != "none":
        from dashinfer_tpu.loader.quantize import quantize_params
        params = quantize_params(params, QuantConfig(mode=quant,
                                                     group_size=128))
        assert params["layers"]["experts"]["gate_proj"]["w_q"].ndim == 4

    assert mk.supports(cfg, rt, params), "MoE model must take the fast path"
    plan = mk.make_plan(cfg, rt, params, target_chunk_bytes=48 * 1024,
                        interleave_mlp=ilv)
    assert plan.E == 4 and plan.k_top == 2
    packed = mk.pack_params(cfg, plan, params)
    fn = mk.build_decode_megakernel(plan, interpret=True)

    B, L, ps = rt.max_batch, cfg.num_layers, rt.cache.page_size
    maxP = rt.max_pages_per_seq
    lens = np.asarray([17, 9, 0], np.int32)[:B]
    active = np.asarray([1, 1, 0], np.int32)[:B]
    pt = np.zeros((B, maxP), np.int32)
    g = 1
    for b in range(B):
        for j in range(maxP):
            pt[b, j] = g
            g += 1
    cache = _prep_cache(cfg, rt, params, CacheMode.INT8, lens, pt)
    tokens = jnp.asarray([7, 11, 0], jnp.int32)[:B]

    ref_logits, _ = transformer.decode_forward(
        cfg, params, tokens, jax.tree.map(jnp.copy, cache), jnp.asarray(pt),
        jnp.asarray(lens), jnp.asarray(active > 0), mode=CacheMode.INT8,
        use_kernel=False)

    x0 = params["embed_tokens"]["w"][tokens].astype(jnp.bfloat16)
    inv_freq = compute_inv_freq(cfg)
    cos, sin = rope_cos_sin(jnp.asarray(lens), inv_freq,
                            _mscale(cfg.rope_scaling))
    H, KH = cfg.num_heads, cfg.num_kv_heads
    cos = jnp.concatenate([cos, cos], axis=-1).astype(jnp.bfloat16)
    sin = jnp.concatenate([sin, sin], axis=-1).astype(jnp.bfloat16)
    sched_b, sched_p, n_sched, tgt_page = mk.build_schedule(
        jnp.asarray(pt), jnp.asarray(lens), jnp.asarray(active > 0), ps)
    pools = [cache.k, cache.v, cache.k_qparams, cache.v_qparams]
    outs = fn(packed, x0, jnp.tile(cos, (1, H)), jnp.tile(sin, (1, H)),
              jnp.tile(cos, (1, KH)), jnp.tile(sin, (1, KH)),
              jnp.asarray(pt), jnp.asarray(lens), jnp.asarray(active),
              tgt_page, sched_b, sched_p, n_sched, *pools)
    logits = np.asarray(outs[0])[:, :cfg.vocab_size]

    ref = np.asarray(ref_logits)
    for b in range(B):
        if active[b] == 0:
            continue
        denom = np.abs(ref[b]).max() + 1e-6
        rel = np.abs(logits[b] - ref[b]).max() / denom
        assert rel < 0.08, (b, rel)
        assert int(np.argmax(logits[b])) == int(np.argmax(ref[b])), b


def test_engine_serving_moe_megakernel_greedy_parity():
    """Qwen2-MoE-style model serves through the MoE megakernel fast path
    with greedy tokens matching the XLA fallback."""
    import dataclasses
    from dashinfer_tpu import Engine, GenerationConfig

    cfg, rt, params = _tiny_moe()
    rt = dataclasses.replace(rt, max_length=48)

    def run(enable_mega):
        rt2 = dataclasses.replace(rt, enable_megakernel=enable_mega)
        eng = Engine()
        from dashinfer_tpu.engine.model_runtime import ModelRuntime
        runtime = ModelRuntime("moe", cfg, params, rt2,
                               use_kernel=enable_mega)
        if enable_mega:
            assert runtime.mega_plan is not None and runtime.mega_plan.E == 4
        eng._models["moe"] = runtime
        eng.start_model("moe")
        gen = GenerationConfig(max_length=18, do_sample=False, top_k=1,
                               eos_token_id=-1)
        _, h, q = eng.start_request("moe", [5, 9, 2, 41, 77, 3], gen)
        eng.sync_request("moe", h, timeout_s=900)
        toks = q.GetAllGeneratedTokens()
        eng.release_model("moe")
        return toks

    fast = run(True)
    slow = run(False)
    assert len(fast) == len(slow) == 12
    assert fast[:8] == slow[:8], (fast, slow)


def test_expand_u4_to_i8_error_bound():
    """u4 -> per-channel i8 re-expansion: per-element requant error is
    bounded by half the per-channel i8 step (range/255/2), and stays below
    the u4 quantization step itself unless group ranges within a channel
    diverge ~17x (docs/megakernel.md §i8 streaming)."""
    from dashinfer_tpu.config import QuantConfig
    from dashinfer_tpu.loader.quantize import quantize_params
    from dashinfer_tpu.ops.pallas import megakernel as mk
    from dashinfer_tpu.ops.u4pack import unpack_u4_weight_np_like

    rng = np.random.RandomState(5)
    K, N, L = 256, 384, 2
    w = rng.randn(L, K, N).astype(np.float32) * 0.02
    params = {"layers": {"down_proj": {"w": w}}}
    qp = quantize_params(params, QuantConfig(mode="a16w4", group_size=128))
    leaf = qp["layers"]["down_proj"]

    conv = mk.expand_u4_to_i8({"layers": {"down_proj": leaf}})
    assert conv is not None
    nl = conv["layers"]["down_proj"]
    assert nl["w_q"].dtype == np.int8 and nl["w_q"].shape == (L, K, N)
    assert nl["scale"].shape == (L, 1, N)

    for l in range(L):
        q4 = unpack_u4_weight_np_like(np.asarray(leaf["w_q"][l]),
                                      np).astype(np.float32)
        s4 = np.repeat(np.asarray(leaf["scale"][l]), 128, axis=0)
        z4 = np.repeat(np.asarray(leaf["zero"][l]), 128, axis=0)
        w_u4 = q4 * s4 + z4                        # what u4 decode serves
        w_i8 = (nl["w_q"][l].astype(np.float32) * nl["scale"][l]
                + nl["zero"][l])
        err = np.abs(w_i8 - w_u4)
        # half-step bound per channel
        assert np.all(err <= nl["scale"][l][0] * 0.5 + 1e-7)
        # and far below the u4 step (same-scale groups here)
        assert err.max() < np.asarray(leaf["scale"][l]).max()

    # meta view matches real shapes/dtypes without doing the work
    meta = mk.expand_u4_to_i8({"layers": {"down_proj": leaf}},
                              meta_only=True)
    ml = meta["layers"]["down_proj"]
    assert ml["w_q"].shape == nl["w_q"].shape
    assert ml["w_q"].dtype == nl["w_q"].dtype
    assert ml["scale"].shape == nl["scale"].shape


def test_megakernel_lora_epilogue_parity():
    """In-kernel multi-adapter LoRA epilogue (reference SGMV,
    sgmv_lora_op_gpu.cpp) vs the XLA LoRA decode path on a MIXED batch
    (rows with and without adapters) — the fast path the round-3 build
    dropped to XLA for."""
    import dataclasses
    import jax
    import jax.numpy as jnp
    from dashinfer_tpu.config import CacheMode
    from dashinfer_tpu.models import transformer
    from dashinfer_tpu.ops.pallas import megakernel as mk
    from dashinfer_tpu.lora.manager import LoraManager, _dims, TARGETS

    cfg, rt, params = _quantized_fixture("a16w4", False, False, 16, 1)
    rt = dataclasses.replace(
        rt, cache=dataclasses.replace(rt.cache, mode=CacheMode.INT8),
        enable_lora=True, lora_max_num=2, lora_max_rank=8)
    mgr = LoraManager(cfg, rt, dtype=jnp.float32)
    rng = np.random.RandomState(11)
    tensors = {}
    for l in range(cfg.num_layers):
        for t in TARGETS:
            i, o = _dims(cfg, t)
            tensors[(l, t, "A")] = rng.randn(8, i).astype(np.float32) * 0.05
            tensors[(l, t, "B")] = rng.randn(o, 8).astype(np.float32) * 0.05
    mgr.load("ad", tensors, alpha=16.0, rank=8)

    plan = mk.make_plan(cfg, rt, params, target_chunk_bytes=32 * 1024,
                        interleave_mlp=True)
    assert mk.supports_lora_epilogue(plan)
    packed = mk.pack_params(cfg, plan, params)
    NR = rt.lora_max_num * rt.lora_max_rank
    fn = mk.build_decode_megakernel(plan, interpret=True, lora_nr=NR)

    B, L, ps = rt.max_batch, cfg.num_layers, rt.cache.page_size
    maxP = rt.max_pages_per_seq
    lens = np.asarray([17, 16, 5, 0], np.int32)[:B]
    active = np.asarray([1, 1, 1, 0], np.int32)[:B]
    pt = np.zeros((B, maxP), np.int32)
    g = 1
    for b in range(B):
        for j in range(maxP):
            pt[b, j] = g
            g += 1
    cache = _prep_cache(cfg, rt, params, CacheMode.INT8, lens, pt)
    tokens = jnp.asarray([7, 11, 13, 0], jnp.int32)[:B]
    lora_idx = jnp.asarray([0, -1, 0, -1], jnp.int32)[:B]
    onehot = jax.nn.one_hot(lora_idx, rt.lora_max_num, dtype=jnp.float32)

    ref_logits, _ = transformer.decode_forward(
        cfg, params, tokens, jax.tree.map(jnp.copy, cache), jnp.asarray(pt),
        jnp.asarray(lens), jnp.asarray(active > 0), mode=CacheMode.INT8,
        use_kernel=False, lora=mgr.pool, lora_onehot=onehot)

    from dashinfer_tpu.ops.rotary import (compute_inv_freq, rope_cos_sin,
                                          _mscale)
    x0 = params["embed_tokens"]["w"][tokens].astype(jnp.bfloat16)
    H, KH, D = cfg.num_heads, cfg.num_kv_heads, cfg.head_dim
    inv_freq = compute_inv_freq(cfg)
    cos, sin = rope_cos_sin(jnp.asarray(lens), inv_freq,
                            _mscale(cfg.rope_scaling))
    cos = jnp.concatenate([cos, cos], axis=-1).astype(jnp.bfloat16)
    sin = jnp.concatenate([sin, sin], axis=-1).astype(jnp.bfloat16)
    sched_b, sched_p, n_sched, tgt_page = mk.build_schedule(
        jnp.asarray(pt), jnp.asarray(lens), jnp.asarray(active > 0), ps)

    view = mgr.build_mega_view(plan)
    R = rt.lora_max_rank
    NRp = -(-NR // 128) * 128
    m = jnp.repeat(onehot, R, axis=1)
    mask1 = jnp.zeros((B, NRp), jnp.float32).at[:, :NR].set(m)
    lora_args = dict(view, lmask1=mask1, lmask3=jnp.tile(mask1, (1, 3)))

    pools = [cache.k, cache.v, cache.k_qparams, cache.v_qparams]
    outs = fn(packed, x0, jnp.tile(cos, (1, H)), jnp.tile(sin, (1, H)),
              jnp.tile(cos, (1, KH)), jnp.tile(sin, (1, KH)),
              jnp.asarray(pt), jnp.asarray(lens), jnp.asarray(active),
              tgt_page, sched_b, sched_p, n_sched, *pools, lora=lora_args)
    logits = np.asarray(outs[0])[:, :cfg.vocab_size]

    ref = np.asarray(ref_logits)
    deltas = []
    for b in range(B):
        if active[b] == 0:
            continue
        denom = np.abs(ref[b]).max() + 1e-6
        rel = np.abs(logits[b] - ref[b]).max() / denom
        assert rel < 0.08, (b, rel)
        assert int(np.argmax(logits[b])) == int(np.argmax(ref[b])), b
        deltas.append(rel)

    # and the adapter actually changed the output (the epilogue is live)
    base_logits, _ = transformer.decode_forward(
        cfg, params, tokens, jax.tree.map(jnp.copy, cache), jnp.asarray(pt),
        jnp.asarray(lens), jnp.asarray(active > 0), mode=CacheMode.INT8,
        use_kernel=False)
    b0 = np.asarray(base_logits)
    assert np.abs(b0[0] - ref[0]).max() > 1e-3   # row 0 has the adapter
    assert np.abs(b0[1] - ref[1]).max() < 1e-5   # row 1 does not


def test_make_plan_interleave_group_aligned_chunks():
    """group_size > 128 checkpoints must get group-aligned interleave
    chunks (a gs=256 a16w8 model crashed pack_params' qparam reshape when
    cols=128 < gs — round-4 review finding)."""
    import jax
    jax.config.update("jax_platforms", "cpu")
    from dashinfer_tpu.config import (CacheConfig, CacheMode, ModelConfig,
                                      QuantConfig, RuntimeConfig)
    from dashinfer_tpu.loader.quantize import quantize_params
    from dashinfer_tpu.ops.pallas import megakernel as mk

    L, hid, inter, V = 2, 512, 512, 512
    cfg = ModelConfig(arch="qwen2", vocab_size=V, hidden_size=hid,
                      intermediate_size=inter, num_layers=L, num_heads=4,
                      num_kv_heads=2, head_dim=128, qkv_bias=False)
    rng = np.random.RandomState(0)

    def w(*s):
        return rng.randn(*s).astype(np.float32) * 0.05

    params = {"embed_tokens": {"w": w(V, hid)},
              "norm": np.ones((hid,), np.float32),
              "lm_head": {"w": w(hid, V)},
              "layers": {
                  "input_layernorm": np.ones((L, hid), np.float32),
                  "post_attention_layernorm": np.ones((L, hid), np.float32),
                  "q_proj": {"w": w(L, hid, 512)},
                  "k_proj": {"w": w(L, hid, 256)},
                  "v_proj": {"w": w(L, hid, 256)},
                  "o_proj": {"w": w(L, 512, hid)},
                  "gate_proj": {"w": w(L, hid, inter)},
                  "up_proj": {"w": w(L, hid, inter)},
                  "down_proj": {"w": w(L, inter, hid)}}}
    for gs, mode in ((256, "a16w8"), (512, "a16w4")):
        qp = quantize_params(params, QuantConfig(mode=mode, group_size=gs))
        rt = RuntimeConfig(model_name="t", max_length=64, max_batch=2,
                           cache=CacheConfig(page_size=16, num_pages=32,
                                             mode=CacheMode.INT8),
                           dtype="float32")
        assert mk.supports(cfg, rt, qp)
        plan = mk.make_plan(cfg, rt, qp, target_chunk_bytes=32 * 1024,
                            interleave_mlp=True)
        assert plan.pd.chunk % gs == 0 or plan.pd.chunk <= plan.pd.gs
        mk.pack_params(cfg, plan, qp)   # must not raise


def test_megakernel_rmw_slot_chunked_flush_parity(monkeypatch):
    """The slot-chunked RMW flush ring (DI_MK_RMW_SLOTS) must be
    bit-identical to the all-at-once flush: SC=1 at B=4 forces 4 chunks
    through the 2-deep ring including the ring-reuse wait path."""
    monkeypatch.setenv("DI_MK_RMW_SLOTS", "1")
    run_megakernel_parity_case("a16w4", "int8", False, False, 1, 16)
    run_megakernel_parity_case("none", "int8", False, False, 1, 16)
