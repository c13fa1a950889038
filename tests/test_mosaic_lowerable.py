"""Guard against jaxpr constructs interpret mode executes but Mosaic can't
lower on real TPU hardware.

The megakernel unit tests run in interpret mode on CPU, which happily
executes ANY jaxpr — including `gather` ops that the Mosaic TPU lowering
rejects ("Only 2D gather is supported"). jnp indexing silently produces
gathers for innocuous-looking expressions: `bias[None, a:b]` (None + partial
slice on a 1-D value) and `qkn[1, None, a:b]` both trace to gather, while
`bias[a:b][None, :]` traces to a plain slice. This bit the prefill
megakernel in production: every CPU test passed, and the first on-TPU
compile crashed.

These tests trace every kernel variant to a jaxpr and assert no gather /
scatter primitives appear, which is the cheapest CPU-side proxy for "Mosaic
can lower this"."""

import dataclasses

import numpy as np
import pytest

from tests.test_megakernel import _tiny, _tiny_moe, _prep_cache
from tests.test_tp_megakernel import _tp_tiny


def _jaxpr_primitives(fn, *args):
    """Primitives appearing INSIDE pallas_call kernels reached from fn
    (ops outside kernels — e.g. embedding gathers — are XLA's business)."""
    import jax
    jaxpr = jax.make_jaxpr(fn)(*args)
    prims = set()

    def collect(jx, inside):
        for eqn in jx.eqns:
            here = inside or eqn.primitive.name == "pallas_call"
            if inside:
                prims.add(eqn.primitive.name)
            for sub in eqn.params.values():
                for s in (sub if isinstance(sub, (list, tuple)) else [sub]):
                    if hasattr(s, "jaxpr"):
                        collect(s.jaxpr if hasattr(s.jaxpr, "eqns")
                                else s.jaxpr.jaxpr, here)
                    elif hasattr(s, "eqns"):
                        collect(s, here)
    collect(jaxpr.jaxpr, False)
    assert prims, "no pallas_call kernel reached from fn"
    return prims


_BANNED = {"gather", "scatter", "scatter-add", "scatter_add"}


def _assert_lowerable(prims, what):
    bad = prims & _BANNED
    assert not bad, f"{what} traces {bad} — Mosaic cannot lower these on TPU"


@pytest.mark.parametrize("qk_norm,alibi,moe,ilv", [
    (False, False, False, False),
    (True, False, False, False),  # Qwen3 QK-norm (historically broken path)
    (False, True, False, False),  # ALiBi
    (False, False, True, False),  # MoE
    (False, False, False, True),  # interleaved MLP (production default)
    (True, False, False, True),
    (False, False, True, True),   # MoE interleaved
    (False, False, False, "lora"),  # in-kernel LoRA epilogue
])
def test_decode_megakernel_no_gather(qk_norm, alibi, moe, ilv):
    import jax
    import jax.numpy as jnp
    from dashinfer_tpu.config import CacheMode
    from dashinfer_tpu.ops.pallas import megakernel as mk
    from dashinfer_tpu.runtime.kv_cache import create_kv_cache

    if moe:
        cfg, rt, params = _tiny_moe()
    else:
        cfg, rt, params = _tiny(qk_norm=qk_norm, alibi=alibi)
    rt = dataclasses.replace(
        rt, cache=dataclasses.replace(rt.cache, mode=CacheMode.INT8))
    assert mk.supports(cfg, rt, params)
    lora = ilv == "lora"
    plan = mk.make_plan(cfg, rt, params, target_chunk_bytes=64 * 1024,
                        interleave_mlp=bool(ilv))
    packed = mk.pack_params(cfg, plan, params)
    lora_nr = 16 if lora else 0
    fn = mk.build_decode_megakernel(plan, interpret=True, lora_nr=lora_nr)
    if lora:
        import dataclasses as _dc
        from dashinfer_tpu.lora.manager import LoraManager
        rt_l = _dc.replace(rt, enable_lora=True, lora_max_num=2,
                           lora_max_rank=8)
        mgr = LoraManager(cfg, rt_l, dtype=jnp.float32)
        view = mgr.build_mega_view(plan)
        NRp = 128
        mask1 = jnp.zeros((rt.max_batch, NRp), jnp.float32)
        lora_args = dict(view, lmask1=mask1,
                         lmask3=jnp.tile(mask1, (1, 3)))
    else:
        lora_args = None

    B, ps = rt.max_batch, rt.cache.page_size
    lens = np.full((B,), ps, np.int32)
    pt = np.arange(B * rt.max_pages_per_seq,
                   dtype=np.int32).reshape(B, -1)
    cache = _prep_cache(cfg, rt, params, CacheMode.INT8, lens, pt)

    x = jnp.zeros((B, plan.hid), jnp.bfloat16)
    cos = jnp.ones((B, plan.D), jnp.bfloat16)
    cosq, sinq = jnp.tile(cos, (1, plan.H)), jnp.tile(cos, (1, plan.H))
    cosk, sink = jnp.tile(cos, (1, plan.KH)), jnp.tile(cos, (1, plan.KH))
    active = np.ones((B,), np.int32)
    sched_b, sched_p, n_sched, tgt_page = mk.build_schedule(
        jnp.asarray(pt), jnp.asarray(lens), jnp.ones((B,), bool), ps)
    pools = [cache.k, cache.v, cache.k_qparams, cache.v_qparams]
    prims = _jaxpr_primitives(
        lambda *a: fn(*a, lora=lora_args),
        packed, x, cosq, sinq, cosk, sink,
        jnp.asarray(pt), jnp.asarray(lens), jnp.asarray(active),
        tgt_page, sched_b, sched_p, n_sched, *pools)
    _assert_lowerable(prims, f"decode megakernel qk_norm={qk_norm} "
                             f"alibi={alibi} moe={moe} ilv={ilv}")


@pytest.mark.parametrize("qk_norm,alibi,moe", [
    (False, False, False),
    (True, False, False),
    (False, True, False),
    (False, False, True),
])
def test_prefill_megakernel_no_gather(qk_norm, alibi, moe):
    import jax
    import jax.numpy as jnp
    from dashinfer_tpu.config import CacheMode
    from dashinfer_tpu.ops.pallas import megakernel as mk
    from dashinfer_tpu.ops.pallas import prefill_megakernel as pmk
    from dashinfer_tpu.runtime.kv_cache import create_kv_cache

    if moe:
        cfg, rt, params = _tiny_moe()
    else:
        cfg, rt, params = _tiny(qk_norm=qk_norm, alibi=alibi)
    bucket, ps = 128, rt.cache.page_size
    rt = dataclasses.replace(
        rt, max_length=bucket + ps,
        cache=dataclasses.replace(rt.cache, mode=CacheMode.INT8))
    assert pmk.supports_prefill(cfg, rt, params, bucket)
    plan = pmk.make_prefill_plan(cfg, rt, params, bucket)
    packed = pmk.pack_prefill_params(cfg, plan, params)
    fn = pmk.build_prefill_megakernel(plan, interpret=True)

    cache = create_kv_cache(cfg, rt.cache,
                            rt.cache.num_pages * cfg.num_layers,
                            model_dtype=jnp.bfloat16)
    maxPb = bucket // ps
    x0 = jnp.zeros((bucket, plan.hid), jnp.bfloat16)
    cos = jnp.zeros((bucket, plan.D), jnp.float32)
    page_row = jnp.arange(maxPb, dtype=jnp.int32)
    pools = [cache.k, cache.v]
    if cache.k_qparams is not None:
        pools += [cache.k_qparams, cache.v_qparams]
    prims = _jaxpr_primitives(
        lambda *a: fn(*a),
        packed, x0, cos, cos, page_row, jnp.int32(45), *pools)
    _assert_lowerable(prims, f"prefill megakernel qk_norm={qk_norm} "
                             f"alibi={alibi} moe={moe}")


@pytest.mark.parametrize("qk_norm,alibi", [
    (False, False),
    (True, False),
    (False, True),
])
def test_tp_decode_megakernel_no_gather(qk_norm, alibi):
    import jax
    import jax.numpy as jnp
    from dashinfer_tpu.config import CacheMode, QuantConfig
    from dashinfer_tpu.loader.quantize import quantize_params
    from dashinfer_tpu.ops.pallas import megakernel as mk
    from dashinfer_tpu.ops.pallas import tp_megakernel as tpk
    from dashinfer_tpu.parallel import make_mesh, shard_cache
    from jax.sharding import NamedSharding, PartitionSpec as P

    N = 2
    cfg, rt, params = _tp_tiny(qk_norm=qk_norm, alibi=alibi)
    rt = dataclasses.replace(
        rt, cache=dataclasses.replace(rt.cache, mode=CacheMode.INT8))
    params = quantize_params(params, QuantConfig(mode="a16w4",
                                                 group_size=128))
    assert tpk.supports_tp(cfg, rt, params, N)
    plan, packed = tpk.make_tp_plan(cfg, rt, params, N,
                                    target_chunk_bytes=48 * 1024)

    B, ps = rt.max_batch, rt.cache.page_size
    lens = np.full((B,), ps, np.int32)
    pt = np.arange(B * rt.max_pages_per_seq,
                   dtype=np.int32).reshape(B, -1)
    cache = _prep_cache(cfg, rt, params, CacheMode.INT8, lens, pt)

    mesh = make_mesh((1, N))
    packed = jax.tree.map(
        lambda a: jax.device_put(a, NamedSharding(mesh, P("model"))), packed)
    cache_s = shard_cache(cache, cfg, mesh)
    x0 = jnp.zeros((B, plan.hid), jnp.bfloat16)
    if alibi:
        cos = jnp.ones((B, cfg.head_dim), jnp.bfloat16)
    else:
        cos = jnp.concatenate(
            [jnp.ones((B, cfg.head_dim // 2), jnp.bfloat16)] * 2, axis=-1)
    sched_b, sched_p, n_sched, tgt_page = mk.build_schedule(
        jnp.asarray(pt), jnp.asarray(lens), jnp.ones((B,), bool), ps)
    fn = tpk.build_tp_decode_fn(plan, mesh, cfg.vocab_size, interpret=True)
    pools = [cache_s.k, cache_s.v, cache_s.k_qparams, cache_s.v_qparams]
    prims = _jaxpr_primitives(
        lambda *a: fn(*a),
        packed, x0, cos, cos, jnp.asarray(pt), jnp.asarray(lens),
        jnp.ones((B,), np.int32), tgt_page, sched_b, sched_p, n_sched,
        *pools)
    _assert_lowerable(prims, f"tp decode megakernel qk_norm={qk_norm} "
                             f"alibi={alibi}")


@pytest.mark.parametrize("qk_norm,alibi", [
    (False, False),
    (True, False),
    (False, True),
])
def test_tp_prefill_megakernel_no_gather(qk_norm, alibi):
    import jax
    import jax.numpy as jnp
    from dashinfer_tpu.config import CacheMode, QuantConfig
    from dashinfer_tpu.loader.quantize import quantize_params
    from dashinfer_tpu.ops.pallas import tp_megakernel as tpk
    from dashinfer_tpu.parallel import make_mesh, shard_cache
    from dashinfer_tpu.runtime.kv_cache import create_kv_cache
    from jax.sharding import NamedSharding, PartitionSpec as P

    N = 2
    bucket, ps = 128, 16
    cfg, rt, params = _tp_tiny(ps=ps, qk_norm=qk_norm, alibi=alibi)
    rt = dataclasses.replace(
        rt, max_length=bucket + ps,
        cache=dataclasses.replace(rt.cache, mode=CacheMode.INT8))
    params = quantize_params(params, QuantConfig(mode="a16w4",
                                                 group_size=128))
    assert tpk.supports_prefill_tp(cfg, rt, params, bucket, N)
    plan, packed = tpk.make_tp_prefill_plan(cfg, rt, params, bucket, N,
                                            target_chunk_bytes=48 * 1024)

    L = cfg.num_layers
    mesh = make_mesh((1, N))
    packed = jax.tree.map(
        lambda a: jax.device_put(a, NamedSharding(mesh, P("model"))), packed)
    cache = create_kv_cache(cfg, rt.cache, rt.cache.num_pages * L,
                            model_dtype=jnp.float32)
    cache = shard_cache(cache, cfg, mesh)
    x0 = jnp.zeros((bucket, plan.hid), jnp.bfloat16)
    cos = jnp.ones((bucket, cfg.head_dim), jnp.bfloat16)
    page_row = np.arange(1, plan.maxPb + 1, dtype=np.int32)
    fn = tpk.build_tp_prefill_fn(plan, mesh, cfg.vocab_size, interpret=True)
    pools = [cache.k, cache.v, cache.k_qparams, cache.v_qparams]
    prims = _jaxpr_primitives(
        lambda *a: fn(*a),
        packed, x0, cos, cos, jnp.asarray(page_row * L), jnp.int32(45),
        *pools)
    _assert_lowerable(prims, f"tp prefill megakernel qk_norm={qk_norm} "
                             f"alibi={alibi}")
