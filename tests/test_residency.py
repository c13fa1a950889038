"""Weight-residency tests (VERDICT r4 #3): with the megakernel pack
installed, the raw quantized params are a second weight set that only the
XLA fallback paths read; pack_only residency demotes them to host and
serves exclusively through the decode + prefill megakernels (the
reference shares ONE weight set between prefill and decode workers,
engine_worker.cpp:103-117)."""

import numpy as np
import pytest

import tests.hf_util as hf_util
from dashinfer_tpu import Engine, GenerationConfig, RuntimeConfigBuilder
from dashinfer_tpu.config import QuantConfig
from dashinfer_tpu.loader import build_from_torch_model
from dashinfer_tpu.loader.quantize import quantize_params


def _mega_model():
    # head_dim must be 128 for mk.supports; a16w4 gs=128 for the u4 stream
    hf = hf_util.tiny_qwen2_config(hidden=256, inter=256, heads=2,
                                   kv_heads=1)
    cfg, params = build_from_torch_model(hf_util.make_torch_model(hf),
                                         hf.to_dict(), "float32")
    params = quantize_params(params, QuantConfig(mode="a16w4",
                                                 group_size=128))
    return hf, cfg, params


def _rt(name, residency, **extra):
    upd = {"min_prefill_bucket": 128, "weight_residency": residency}
    upd.update(extra)
    return (RuntimeConfigBuilder(name).max_length(160).max_batch(2)
            .kv_cache_page_size(16).kv_cache_num_pages(24)
            .dtype("float32").update(upd).build())


def _engine_with(runtime, name):
    eng = Engine()
    with eng._lock:
        eng._models[name] = runtime
    eng.start_model(name)
    return eng


def test_pack_only_serves_and_matches_both():
    """pack_only: raw params leave the device, a fresh request serves
    end-to-end through the prefill+decode megakernels, greedy tokens are
    identical to the both-resident install."""
    from dashinfer_tpu.engine.model_runtime import ModelRuntime

    hf, cfg, params = _mega_model()
    prompt = np.random.RandomState(7).randint(
        1, hf.vocab_size, size=9).tolist()

    def run(residency):
        rt = _rt("res", residency)
        runtime = ModelRuntime("res", cfg, params, rt, use_kernel=True)
        assert runtime.mega_plan is not None
        assert runtime._pmk_plans, "test needs the prefill megakernel"
        if residency == "pack_only":
            assert runtime.residency == "pack_only"
            assert runtime.params is None
            assert runtime._raw_params_host is not None
        else:
            assert runtime.residency == "both"
            # the mega embed must ALIAS the raw embed (no second device
            # copy of the lookup table)
            assert runtime.mega_params["embed"] is \
                runtime.params["embed_tokens"]["w"]
        eng = _engine_with(runtime, "res")
        _, h, q = eng.start_request("res", prompt, GenerationConfig(
            max_length=20, do_sample=False, top_k=1, eos_token_id=-1))
        eng.sync_request("res", h, timeout_s=900)
        toks = q.GetAllGeneratedTokens()
        status = q.GenerateStatus()
        eng.release_model("res")
        return status.name, toks

    st_pack, toks_pack = run("pack_only")
    assert st_pack == "GenerateFinished"
    assert len(toks_pack) == 20 - 9
    st_both, toks_both = run("both")
    assert st_both == "GenerateFinished"
    assert toks_pack == toks_both


def test_pack_only_request_validation():
    """Requests the megakernels cannot serve are rejected at
    start_request with a clear error, not an InternalError at prefill."""
    from dashinfer_tpu.engine.model_runtime import ModelRuntime

    hf, cfg, params = _mega_model()
    rt = _rt("resv", "pack_only")
    runtime = ModelRuntime("resv", cfg, params, rt, use_kernel=True)
    eng = _engine_with(runtime, "resv")
    try:
        long_prompt = list(range(1, 131))   # > the 128-token pmk bucket
        with pytest.raises(ValueError, match="prefill megakernel"):
            eng.start_request("resv", long_prompt, GenerationConfig(
                max_length=140, do_sample=False, top_k=1, eos_token_id=-1))
        with pytest.raises(ValueError, match="multimodal"):
            eng.start_request("resv", [1, 2, 3], GenerationConfig(
                max_length=10, do_sample=False, top_k=1, eos_token_id=-1,
                mm_info=[(2, np.zeros((1, cfg.hidden_size), np.float32))]))
    finally:
        eng.release_model("resv")


def test_pack_only_requires_kernels():
    """Explicit pack_only without the megakernels active must fail at
    install (never silently serve a config with no weights)."""
    from dashinfer_tpu.engine.model_runtime import ModelRuntime

    hf, cfg, params = _mega_model()
    rt = _rt("resk", "pack_only", enable_megakernel=False)
    with pytest.raises(ValueError, match="pack_only"):
        ModelRuntime("resk", cfg, params, rt, use_kernel=True)


def test_auto_residency_pool_starvation(monkeypatch):
    """auto: demote only when the both-resident pool could not hold the
    typical workload; stay both when HBM is ample. (DI_WARMUP=0 keeps the
    planning arithmetic host-side for the test.)"""
    from dashinfer_tpu.engine.model_runtime import ModelRuntime

    monkeypatch.setenv("DI_WARMUP", "0")
    hf, cfg, params = _mega_model()

    def build(hbm_bytes):
        rt = (RuntimeConfigBuilder("resa").max_length(160).max_batch(2)
              .kv_cache_page_size(16).kv_cache_num_pages(0)
              .dtype("float32")
              .update({"min_prefill_bucket": 128,
                       "weight_residency": "auto",
                       "typical_seq_len": 120,
                       "max_prompt_len": 120,
                       "hbm_bytes": hbm_bytes}).build())
        return ModelRuntime("resa", cfg, params, rt, use_kernel=True)

    # 500 MiB: budget < heuristic activation headroom + both weight sets,
    # so the both-resident pool floors out below the 16-page demand
    starved = build(500 * 1024**2)
    assert starved.residency == "pack_only"
    ample = build(64 * 1024**3)   # ample: workload fits with both sets
    assert ample.residency == "both"
    assert ample.params is not None


def test_pack_only_weight_swap_roundtrip():
    """unload/reload under pack_only: the pack round-trips through host
    and serving state stays consistent (raw params remain host-side)."""
    from dashinfer_tpu.engine.model_runtime import ModelRuntime

    hf, cfg, params = _mega_model()
    rt = _rt("ress", "pack_only")
    runtime = ModelRuntime("ress", cfg, params, rt, use_kernel=True)
    assert runtime.residency == "pack_only"
    runtime.unload_weights_to_host()
    assert runtime.mega_params is None
    assert not runtime._weights_resident()
    runtime.reload_weights_to_device()
    assert runtime.mega_params is not None
    assert runtime.params is None           # raw set stays host-resident
    assert runtime._weights_resident()


def test_both_swap_preserves_embed_alias():
    """unload/reload under "both" must restore the embed ALIAS — a second
    device copy after a swap cycle would exceed the planned pool budget
    by the embed's size (round-5 review finding)."""
    from dashinfer_tpu.engine.model_runtime import ModelRuntime

    hf, cfg, params = _mega_model()
    rt = _rt("resw", "both")
    runtime = ModelRuntime("resw", cfg, params, rt, use_kernel=True)
    assert runtime.mega_params["embed"] is \
        runtime.params["embed_tokens"]["w"]
    runtime.unload_weights_to_host()
    # host copy must not hold the embed twice
    assert "embed" not in runtime._mega_host
    runtime.reload_weights_to_device()
    assert runtime.mega_params["embed"] is \
        runtime.params["embed_tokens"]["w"]


def test_i8_stream_budget_gate(monkeypatch):
    """When raw params must stay resident (prefix cache) and the i8 pack
    would not fit beside them, the engine keeps the u4 stream instead of
    OOMing at install (round-5 on-chip finding)."""
    from dashinfer_tpu.engine.model_runtime import ModelRuntime

    monkeypatch.setenv("DI_MK_STREAM", "i8")
    monkeypatch.setenv("DI_WARMUP", "0")
    hf, cfg, params = _mega_model()

    def build(prefix, hbm_bytes):
        rt = (RuntimeConfigBuilder("resi").max_length(160).max_batch(2)
              .kv_cache_page_size(16).kv_cache_num_pages(24)
              .dtype("float32").prefix_cache(prefix)
              .update({"min_prefill_bucket": 128,
                       "max_prompt_len": 120,
                       "hbm_bytes": hbm_bytes}).build())
        return ModelRuntime("resi", cfg, params, rt, use_kernel=True)

    # prefix cache forces raw residency; 4 MiB "HBM" cannot hold both
    # sets -> the u4 stream is kept (payload dtype stays packed uint8)
    tight = build(True, 4 * 1024**2)
    wq = tight._mega_plan_params["layers"]["q_proj"]["w_q"]
    import numpy as np
    assert np.asarray(wq).dtype == np.uint8, "must keep the u4 stream"
    # ample HBM: the i8 re-expansion goes through (int8 payload)
    ample = build(True, 64 * 1024**3)
    wq8 = ample._mega_plan_params["layers"]["q_proj"]["w_q"]
    assert np.asarray(wq8).dtype == np.int8, "i8 stream expected"
