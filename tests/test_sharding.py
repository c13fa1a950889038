"""Multi-device sharding tests on the 8-device virtual CPU mesh — the
multi-chip validation strategy the reference lacks (SURVEY.md §4 lesson)."""

import numpy as np
import pytest


def test_param_shardings_specs():
    import jax
    from jax.sharding import PartitionSpec as P
    from dashinfer_tpu.parallel import make_mesh, param_shardings

    mesh = make_mesh((1, 4))
    params = {
        "embed_tokens": {"w": np.zeros((32, 16))},
        "norm": np.zeros((16,)),
        "lm_head": {"w": np.zeros((16, 32))},
        "layers": {
            "input_layernorm": np.zeros((2, 16)),
            "q_proj": {"w": np.zeros((2, 16, 32)), "b": np.zeros((2, 32))},
            "o_proj": {"w": np.zeros((2, 32, 16))},
            "down_proj": {"w": np.zeros((2, 8, 16))},
        },
    }
    sh = param_shardings(params, mesh)
    assert sh["embed_tokens"]["w"].spec == P("model", None)
    assert sh["lm_head"]["w"].spec == P(None, "model")
    assert sh["layers"]["q_proj"]["w"].spec == P(None, None, "model")
    assert sh["layers"]["q_proj"]["b"].spec == P(None, "model")
    assert sh["layers"]["o_proj"]["w"].spec == P(None, "model", None)
    assert sh["layers"]["down_proj"]["w"].spec == P(None, "model", None)
    assert sh["layers"]["input_layernorm"].spec == P(None, None)


def test_dryrun_multichip_8():
    import sys
    sys.path.insert(0, ".")
    import __graft_entry__ as ge
    ge.dryrun_multichip(8)


def test_tp_forward_matches_single_device():
    """Sharded decode step produces the same logits as unsharded."""
    import jax
    import jax.numpy as jnp
    import sys
    sys.path.insert(0, ".")
    import __graft_entry__ as ge
    from dashinfer_tpu.models import transformer
    from dashinfer_tpu.parallel import make_mesh, shard_cache, shard_params

    cfg, rt, params, cache, state = ge._tiny_setup(
        heads=8, kv_heads=4, dtype="float32")
    B = rt.max_batch
    L = cfg.num_layers
    maxP = rt.max_pages_per_seq
    pt = np.zeros((B, maxP), np.int32)
    for b in range(B):
        pt[b, 0] = b
    tokens = jnp.arange(B, dtype=jnp.int32) + 1
    lens = jnp.full((B,), 3, jnp.int32)
    active = jnp.ones((B,), bool)

    def fwd(params, cache):
        logits, _ = transformer.decode_forward(
            cfg, params, tokens, cache, jnp.asarray(pt), lens, active,
            mode=rt.cache.mode, use_kernel=False)
        return logits

    ref = np.asarray(jax.jit(fwd)(params, cache))

    mesh = make_mesh((1, 4))
    params_s = shard_params(params, mesh)
    cache_s = shard_cache(cache, cfg, mesh)
    got = np.asarray(jax.jit(fwd)(params_s, cache_s))
    np.testing.assert_allclose(got, ref, rtol=2e-4, atol=2e-4)


def test_engine_tp_serving_matches_single_device():
    """Engine-level tensor parallelism: install_model with mesh (1, 4)
    shards weights/KV at install (the reference splits per rank at load,
    weight_manager.h:96-103) and the served greedy stream matches the
    single-device engine token for token."""
    import sys
    sys.path.insert(0, ".")
    import tests.hf_util as hf_util
    from dashinfer_tpu import Engine, GenerationConfig, RuntimeConfigBuilder
    from dashinfer_tpu.loader import build_from_torch_model

    hf = hf_util.tiny_qwen2_config()
    tm = hf_util.make_torch_model(hf)
    cfg, params = build_from_torch_model(tm, hf.to_dict(), "float32")

    def run(model_axis):
        rt = (RuntimeConfigBuilder("tp").max_length(64).max_batch(2)
              .kv_cache_page_size(16).kv_cache_num_pages(24)
              .dtype("float32").mesh(1, model_axis)
              .update({"min_prefill_bucket": 16}).build())
        eng = Engine().install_model("tp", rt, params=params,
                                     model_config=cfg)
        eng.start_model("tp")
        if model_axis > 1:
            assert eng._models["tp"].mesh is not None
        _, h, q = eng.start_request(
            "tp", [5, 9, 2, 41, 77, 3],
            GenerationConfig(max_length=18, do_sample=False, top_k=1,
                             eos_token_id=-1))
        eng.sync_request("tp", h, timeout_s=900)
        toks = q.GetAllGeneratedTokens()
        eng.release_model("tp")
        return toks

    single = run(1)
    tp = run(4)
    assert len(single) == 12
    assert single == tp, (single, tp)


def test_expert_parallel_sharding_matches_single_device():
    """EPSPLIT: experts sharded over the model axis produce the same logits
    as single-device (reference use_ep -> EPSPLIT, weight_splitter.cpp:856)."""
    import jax
    import jax.numpy as jnp
    import __graft_entry__ as ge
    from dashinfer_tpu.models import transformer
    from dashinfer_tpu.parallel import make_mesh, shard_cache, shard_params

    import dataclasses
    from dashinfer_tpu.config import MoEConfig
    cfg, rt, params, cache, state = ge._tiny_setup(
        heads=8, kv_heads=4, dtype="float32")
    # graft a tiny MoE block onto every layer
    E, topk = 4, 2
    L, hid = cfg.num_layers, cfg.hidden_size
    moe_inter = 64
    key = jax.random.PRNGKey(3)

    def rnd(*shape):
        nonlocal key
        key, k = jax.random.split(key)
        return jax.random.normal(k, shape, jnp.float32) * 0.05

    lp = dict(params["layers"])
    for name in ("gate_proj", "up_proj", "down_proj"):
        lp.pop(name)
    lp["router"] = {"w": rnd(L, hid, E)}
    lp["experts"] = {
        "gate_proj": rnd(L, E, hid, moe_inter),
        "up_proj": rnd(L, E, hid, moe_inter),
        "down_proj": rnd(L, E, moe_inter, hid),
    }
    params = dict(params)
    params["layers"] = lp
    cfg = dataclasses.replace(cfg, arch="qwen2_moe", moe=MoEConfig(
        num_experts=E, num_experts_per_tok=topk, moe_intermediate_size=moe_inter))

    B = rt.max_batch
    pt = np.zeros((B, rt.max_pages_per_seq), np.int32)
    for b in range(B):
        pt[b, 0] = b
    tokens = jnp.arange(B, dtype=jnp.int32) + 1
    lens = jnp.full((B,), 3, jnp.int32)
    active = jnp.ones((B,), bool)

    def fwd(params, cache):
        logits, _ = transformer.decode_forward(
            cfg, params, tokens, cache, jnp.asarray(pt), lens, active,
            mode=rt.cache.mode, use_kernel=False)
        return logits

    ref = np.asarray(jax.jit(fwd)(params, cache))

    mesh = make_mesh((1, 4))
    sp = shard_params(params, mesh, ep=True)
    sc = shard_cache(cache, cfg, mesh)
    out = np.asarray(jax.jit(fwd)(sp, sc))
    np.testing.assert_allclose(out, ref, rtol=2e-4, atol=2e-4)
