"""TP (sharded) decode megakernel vs the XLA reference, on a 2-shard
virtual CPU mesh in interpret mode. Parity covers logits AND the KV pages
written through the per-layer RMW path."""

import dataclasses

import numpy as np
import pytest

from tests.test_megakernel import _prep_cache, _tiny


def _tp_tiny(KH=2, **kw):
    """TP-shaped tiny model: heads/kv-heads/inter/vocab divisible by 2."""
    cfg, rt, params = _tiny(B=4, L=2, KH=KH, H=4, hid=256, inter=256,
                            vocab=512, **kw)
    return cfg, rt, params


@pytest.mark.parametrize("quant,kv_mode_name,alibi", [
    ("none", "default", False),
    ("none", "int8", False),
    ("a16w8", "int8", False),
    # uint4 KV needs per-RANK kv lanes >= 128 (KH/n * D/2): KH=4 keeps the
    # local shard at 2 heads x 64 lanes — the KH=2 shape is correctly
    # rejected by mk.supports (sub-128-lane u4 RMW relayout, megakernel.py)
    ("a16w4", "uint4", False),
    ("a16w4", "int8", True),    # ALiBi: per-rank global slope slices
])
def test_tp_megakernel_matches_reference(quant, kv_mode_name, alibi):
    import jax
    import jax.numpy as jnp
    from dashinfer_tpu.config import CacheMode, QuantConfig
    from dashinfer_tpu.models import transformer
    from dashinfer_tpu.ops.pallas import tp_megakernel as tpk
    from dashinfer_tpu.ops.pallas import megakernel as mk
    from dashinfer_tpu.ops.rotary import (compute_inv_freq, rope_cos_sin,
                                          _mscale)
    from dashinfer_tpu.parallel import make_mesh, shard_cache

    N = 2
    kv_mode = CacheMode(kv_mode_name)
    cfg, rt, params = _tp_tiny(alibi=alibi,
                               KH=4 if kv_mode_name == "uint4" else 2)
    rt = dataclasses.replace(
        rt, cache=dataclasses.replace(rt.cache, mode=kv_mode))
    if quant != "none":
        from dashinfer_tpu.loader.quantize import quantize_params
        params = quantize_params(params, QuantConfig(mode=quant,
                                                     group_size=128))

    assert tpk.supports_tp(cfg, rt, params, N)
    plan, packed = tpk.make_tp_plan(cfg, rt, params, N,
                                    target_chunk_bytes=48 * 1024)

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

    cache = _prep_cache(cfg, rt, params, kv_mode, lens, pt)
    tokens = jnp.asarray([7, 11, 13, 0], jnp.int32)[:B]

    # XLA reference (full model, single device)
    ref_logits, ref_cache = transformer.decode_forward(
        cfg, params, tokens, jax.tree.map(jnp.copy, cache), jnp.asarray(pt),
        jnp.asarray(lens), jnp.asarray(active > 0), mode=kv_mode,
        use_kernel=False)

    # TP megakernel on a (1, 2) mesh
    mesh = make_mesh((1, N))
    from jax.sharding import NamedSharding, PartitionSpec as P
    packed = jax.tree.map(
        lambda a: jax.device_put(a, NamedSharding(mesh, P("model"))), packed)
    cache_s = shard_cache(cache, cfg, mesh)

    view = mk.weight_only_decode_view(params)
    x0 = jnp.asarray(np.asarray(view["embed_tokens"]["w"]))[tokens] \
        .astype(jnp.bfloat16)
    if alibi:
        assert plan.alibi
        cos = jnp.ones((B, cfg.head_dim), jnp.bfloat16)
        sin = jnp.zeros((B, cfg.head_dim), jnp.bfloat16)
    else:
        inv_freq = compute_inv_freq(cfg)
        cos, sin = rope_cos_sin(jnp.asarray(lens), inv_freq,
                                _mscale(cfg.rope_scaling))
        cos = jnp.concatenate([cos, cos], axis=-1).astype(jnp.bfloat16)
        sin = jnp.concatenate([sin, sin], axis=-1).astype(jnp.bfloat16)
    sched_b, sched_p, n_sched, tgt_page = mk.build_schedule(
        jnp.asarray(pt), jnp.asarray(lens), jnp.asarray(active > 0), ps)

    fn = tpk.build_tp_decode_fn(plan, mesh, cfg.vocab_size, interpret=True)
    pools = [cache_s.k, cache_s.v]
    if cache_s.k_qparams is not None:
        pools += [cache_s.k_qparams, cache_s.v_qparams]
    outs = jax.jit(fn)(packed, x0, cos, sin, jnp.asarray(pt),
                       jnp.asarray(lens), jnp.asarray(active), tgt_page,
                       sched_b, sched_p, n_sched, *pools)
    logits = np.asarray(outs[0])[:, :cfg.vocab_size]
    new_k = np.asarray(outs[1])

    ref = np.asarray(ref_logits)
    for b in range(B):
        if active[b] == 0:
            continue
        denom = np.abs(ref[b]).max() + 1e-6
        rel = np.abs(logits[b] - ref[b]).max() / denom
        tol = 0.05 if quant == "none" else 0.08
        assert rel < tol, (b, rel)
        assert int(np.argmax(logits[b])) == int(np.argmax(ref[b])), b

    # the per-layer RMW wrote the new token KV into the sharded pool
    ref_k = np.asarray(ref_cache.k)
    for b in range(B):
        if active[b] == 0:
            continue
        gpage = pt[b, lens[b] // ps]
        off = int(lens[b] % ps)
        for l in range(L):
            got = np.asarray(new_k[gpage * L + l, off], np.float32)
            want = np.asarray(ref_k[gpage * L + l, off], np.float32)
            from dashinfer_tpu.config import CacheMode as CM
            if kv_mode == CM.DEFAULT:
                np.testing.assert_allclose(got, want, atol=5e-2, rtol=5e-2)
            else:
                assert got.shape == want.shape


def test_split_params_tp_roundtrip():
    """Column/row splits reassemble to the full weights (u4 incl. repack)."""
    import jax.numpy as jnp
    from dashinfer_tpu.config import QuantConfig
    from dashinfer_tpu.loader.quantize import quantize_params
    from dashinfer_tpu.ops.pallas import tp_megakernel as tpk
    from dashinfer_tpu.ops.u4pack import unpack_u4_weight_np_like

    cfg, rt, params = _tp_tiny()
    qp = quantize_params(params, QuantConfig(mode="a16w4", group_size=128))
    parts = tpk.split_params_tp(qp, cfg, 2)

    # col-split leaf: unpacked halves concatenate back to the original
    full = np.asarray(qp["layers"]["q_proj"]["w_q"])
    L = full.shape[0]
    for l in range(L):
        want = unpack_u4_weight_np_like(
            np.ascontiguousarray(full[l]), np)
        got = np.concatenate([
            unpack_u4_weight_np_like(
                np.ascontiguousarray(np.asarray(
                    parts[r]["layers"]["q_proj"]["w_q"])[l]), np)
            for r in range(2)], axis=1)
        np.testing.assert_array_equal(got, want)

    # row-split leaf: K rows concatenate back
    full_o = np.asarray(qp["layers"]["o_proj"]["w_q"])
    got_o = np.concatenate([np.asarray(parts[r]["layers"]["o_proj"]["w_q"])
                            for r in range(2)], axis=1)
    np.testing.assert_array_equal(got_o, full_o)
    # scale groups follow the K rows
    full_s = np.asarray(qp["layers"]["o_proj"]["scale"])
    got_s = np.concatenate([np.asarray(parts[r]["layers"]["o_proj"]["scale"])
                            for r in range(2)], axis=1)
    np.testing.assert_array_equal(got_s, full_s)


def test_engine_serving_tp_megakernel_greedy_parity():
    """Engine serving on a (1, 2) mesh engages the TP megakernel for
    decode AND the TP prefill segments (bucket 128), and produces the same
    greedy tokens as the single-device engine's fast paths."""
    import dataclasses
    from dashinfer_tpu import Engine, GenerationConfig
    from dashinfer_tpu.config import CacheMode, QuantConfig
    from dashinfer_tpu.loader.quantize import quantize_params

    cfg, rt, params = _tp_tiny()
    rt = dataclasses.replace(
        rt, max_length=160, max_batch=2, min_prefill_bucket=128,
        cache=dataclasses.replace(rt.cache, mode=CacheMode.INT8,
                                  num_pages=48))
    params = quantize_params(params, QuantConfig(mode="a16w8"))

    def run(mesh_shape):
        rt2 = dataclasses.replace(rt, mesh_shape=mesh_shape)
        eng = Engine()
        from dashinfer_tpu.engine.model_runtime import ModelRuntime
        runtime = ModelRuntime("tpk", cfg, params, rt2, use_kernel=True)
        if mesh_shape[1] > 1:
            assert runtime.tp_mega_plan is not None, \
                "TP megakernel did not engage"
            assert 128 in runtime._tp_pmk_plans, \
                "TP prefill segments did not engage"
        else:
            assert runtime.mega_plan is not None
            assert 128 in runtime._pmk_plans
        eng._models["tpk"] = runtime
        eng.start_model("tpk")
        gen = GenerationConfig(max_length=20, do_sample=False, top_k=1,
                               eos_token_id=-1)
        _, h, q = eng.start_request("tpk", [5, 9, 2, 41, 77, 3], gen)
        eng.sync_request("tpk", h, timeout_s=900)
        toks = q.GetAllGeneratedTokens()
        eng.release_model("tpk")
        return toks

    single = run((1, 1))
    tp = run((1, 2))
    assert len(single) == len(tp) == 14
    assert single[:10] == tp[:10], (single, tp)


@pytest.mark.parametrize("quant,shared,shared_gate", [
    ("none", True, True),
    ("a16w8", True, True),
    ("a16w4", False, False),    # Qwen3-MoE shape (no shared expert)
])
def test_tp_megakernel_moe_matches_reference(quant, shared, shared_gate):
    """MoE-EP TP: experts split over 2 ranks (EPSPLIT), global router on
    every rank, shared expert split by inter — vs the XLA moe_block path."""
    import jax
    import jax.numpy as jnp
    from dashinfer_tpu.config import CacheMode, QuantConfig
    from dashinfer_tpu.models import transformer
    from dashinfer_tpu.ops.pallas import megakernel as mk
    from dashinfer_tpu.ops.pallas import tp_megakernel as tpk
    from dashinfer_tpu.ops.rotary import (compute_inv_freq, rope_cos_sin,
                                          _mscale)
    from dashinfer_tpu.parallel import make_mesh, shard_cache
    from tests.test_megakernel import _tiny_moe

    N = 2
    cfg, rt, params = _tiny_moe(B=4, KH=2, H=4, shared=shared,
                                shared_gate=shared_gate)
    kv_mode = rt.cache.mode
    if quant != "none":
        from dashinfer_tpu.loader.quantize import quantize_params
        params = quantize_params(params, QuantConfig(mode=quant,
                                                     group_size=128))

    assert tpk.supports_tp(cfg, rt, params, N)
    plan, packed = tpk.make_tp_plan(cfg, rt, params, N,
                                    target_chunk_bytes=48 * 1024)
    assert plan.E == cfg.moe.num_experts // N

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

    cache = _prep_cache(cfg, rt, params, kv_mode, lens, pt)
    tokens = jnp.asarray([7, 11, 13, 0], jnp.int32)[:B]

    ref_logits, _ = transformer.decode_forward(
        cfg, params, tokens, jax.tree.map(jnp.copy, cache), jnp.asarray(pt),
        jnp.asarray(lens), jnp.asarray(active > 0), mode=kv_mode,
        use_kernel=False)

    mesh = make_mesh((1, N))
    from jax.sharding import NamedSharding, PartitionSpec as P
    packed = jax.tree.map(
        lambda a: jax.device_put(a, NamedSharding(mesh, P("model"))), packed)
    cache_s = shard_cache(cache, cfg, mesh)

    view = mk.weight_only_decode_view(params)
    x0 = jnp.asarray(np.asarray(view["embed_tokens"]["w"]))[tokens] \
        .astype(jnp.bfloat16)
    inv_freq = compute_inv_freq(cfg)
    cos, sin = rope_cos_sin(jnp.asarray(lens), inv_freq,
                            _mscale(cfg.rope_scaling))
    cos = jnp.concatenate([cos, cos], axis=-1).astype(jnp.bfloat16)
    sin = jnp.concatenate([sin, sin], axis=-1).astype(jnp.bfloat16)
    sched_b, sched_p, n_sched, tgt_page = mk.build_schedule(
        jnp.asarray(pt), jnp.asarray(lens), jnp.asarray(active > 0), ps)

    fn = tpk.build_tp_decode_fn(plan, mesh, cfg.vocab_size, interpret=True)
    pools = [cache_s.k, cache_s.v, cache_s.k_qparams, cache_s.v_qparams]
    outs = jax.jit(fn)(packed, x0, cos, sin, jnp.asarray(pt),
                       jnp.asarray(lens), jnp.asarray(active), tgt_page,
                       sched_b, sched_p, n_sched, *pools)
    logits = np.asarray(outs[0])[:, :cfg.vocab_size]

    ref = np.asarray(ref_logits)
    for b in range(B):
        if active[b] == 0:
            continue
        denom = np.abs(ref[b]).max() + 1e-6
        rel = np.abs(logits[b] - ref[b]).max() / denom
        tol = 0.05 if quant == "none" else 0.08
        assert rel < tol, (b, rel)
        assert int(np.argmax(logits[b])) == int(np.argmax(ref[b])), b


@pytest.mark.parametrize("quant,kv_mode_name,alibi", [
    ("none", "default", False),
    ("a16w4", "int8", False),
    ("a16w8", "uint4", False),
    ("a16w4", "int8", True),    # ALiBi: per-rank global slope slices
])
def test_tp_prefill_megakernel_matches_reference(quant, kv_mode_name,
                                                 alibi):
    """TP prefill segments (per-layer attn/mlp + psum): last-token logits
    and written KV pages vs the single-device XLA prefill."""
    import jax
    import jax.numpy as jnp
    from dashinfer_tpu.config import CacheMode, QuantConfig
    from dashinfer_tpu.models import transformer
    from dashinfer_tpu.ops.pallas import megakernel as mk
    from dashinfer_tpu.ops.pallas import tp_megakernel as tpk
    from dashinfer_tpu.ops.rotary import (compute_inv_freq, rope_cos_sin,
                                          _mscale)
    from dashinfer_tpu.parallel import make_mesh, shard_cache
    from dashinfer_tpu.runtime.kv_cache import create_kv_cache

    N = 2
    bucket, ps, n_tokens = 128, 16, 45
    kv_mode = CacheMode(kv_mode_name)
    # uint4 KV: per-rank kv lanes must be >= 128 (see decode test note)
    cfg, rt, params = _tp_tiny(ps=ps, alibi=alibi,
                               KH=4 if kv_mode_name == "uint4" else 2)
    rt = dataclasses.replace(
        rt, max_length=bucket + ps,
        cache=dataclasses.replace(rt.cache, mode=kv_mode))
    if quant != "none":
        from dashinfer_tpu.loader.quantize import quantize_params
        params = quantize_params(params, QuantConfig(mode=quant,
                                                     group_size=128))

    assert tpk.supports_prefill_tp(cfg, rt, params, bucket, N)
    plan, packed = tpk.make_tp_prefill_plan(cfg, rt, params, bucket, N,
                                            target_chunk_bytes=48 * 1024)

    L = cfg.num_layers
    num_pages = rt.cache.num_pages
    rng = np.random.RandomState(7)
    toks = np.zeros((bucket,), np.int32)
    toks[:n_tokens] = rng.randint(1, cfg.vocab_size, size=n_tokens)
    maxPb = plan.maxPb
    page_row = np.arange(1, maxPb + 1, dtype=np.int32)

    # exact reference: DEFAULT-mode XLA run (same rationale as the
    # single-chip prefill test — the kernel attends over exact K/V)
    from dashinfer_tpu.config import CacheConfig
    rt_d = dataclasses.replace(
        rt, cache=dataclasses.replace(rt.cache, mode=CacheMode.DEFAULT))
    cache_d = create_kv_cache(cfg, rt_d.cache, num_pages * L,
                              model_dtype=jnp.float32)
    ref_logits, cache_d = transformer.prefill_forward(
        cfg, params, jnp.asarray(toks), cache_d, jnp.asarray(page_row),
        jnp.int32(0), jnp.int32(n_tokens), mode=CacheMode.DEFAULT,
        use_kernel=False)

    mesh = make_mesh((1, N))
    from jax.sharding import NamedSharding, PartitionSpec as P
    packed = jax.tree.map(
        lambda a: jax.device_put(a, NamedSharding(mesh, P("model"))), packed)
    cache_mk = create_kv_cache(cfg, rt.cache, num_pages * L,
                               model_dtype=jnp.float32)
    cache_mk = shard_cache(cache_mk, cfg, mesh)

    view = mk.weight_only_decode_view(params)
    x0 = jnp.asarray(np.asarray(view["embed_tokens"]["w"])) \
        [jnp.asarray(toks)].astype(jnp.bfloat16)
    if alibi:
        assert plan.alibi
        cos = jnp.ones((bucket, cfg.head_dim), jnp.bfloat16)
        sin = jnp.zeros((bucket, cfg.head_dim), jnp.bfloat16)
    else:
        inv_freq = compute_inv_freq(cfg)
        pos = jnp.arange(bucket, dtype=jnp.int32)
        cos, sin = rope_cos_sin(pos, inv_freq, _mscale(cfg.rope_scaling))
        cos = jnp.concatenate([cos, cos], axis=-1).astype(jnp.bfloat16)
        sin = jnp.concatenate([sin, sin], axis=-1).astype(jnp.bfloat16)

    fn = tpk.build_tp_prefill_fn(plan, mesh, cfg.vocab_size, interpret=True)
    pools = [cache_mk.k, cache_mk.v]
    if cache_mk.k_qparams is not None:
        pools += [cache_mk.k_qparams, cache_mk.v_qparams]
    outs = jax.jit(fn)(packed, x0, cos, sin,
                       jnp.asarray(page_row * L), jnp.int32(n_tokens),
                       *pools)
    logits = np.asarray(outs[0])[0, :cfg.vocab_size]

    ref = np.asarray(ref_logits)
    denom = np.abs(ref).max() + 1e-6
    rel = np.abs(logits - ref).max() / denom
    assert rel < 0.08, rel
    assert int(np.argmax(logits)) == int(np.argmax(ref))

    # written pages: dequantize and compare vs the exact reference K
    from dashinfer_tpu.ops.kv_ops import dequantize_page_tokens
    KH = cfg.num_kv_heads
    new_k = outs[1]
    new_kq = outs[3] if kv_mode != CacheMode.DEFAULT else None
    for j in range(maxPb):
        if j * ps >= n_tokens:
            break
        w_tok = min(ps, n_tokens - j * ps)
        for l in range(L):
            phys = page_row[j] * L + l
            pay = np.asarray(new_k[phys])
            if kv_mode == CacheMode.DEFAULT:
                a = pay.astype(np.float32).reshape(ps, KH, -1)
                asc = np.zeros(a.shape[:-1] + (1,), np.float32)
            else:
                qp = np.asarray(new_kq[phys], np.float32)[:, :ps]  # drop pad
                sc = qp[0::2].T
                zr = qp[1::2].T
                a = np.asarray(dequantize_page_tokens(
                    jnp.asarray(pay.reshape(ps, KH, -1)), jnp.asarray(sc),
                    jnp.asarray(zr), kv_mode))
                asc = sc[..., None]
            b = np.asarray(cache_d.k[phys], np.float32).reshape(ps, KH, -1)
            a, b, asc = a[:w_tok], b[:w_tok], asc[:w_tok]
            tol = 1.5 * asc + 0.03 * (np.abs(b).max() + 1e-6)
            assert (np.abs(a - b) - tol).max() < 0, (j, l)
