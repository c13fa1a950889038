"""Multi-LoRA serving tests (reference LoraManager + SGMV batch,
SURVEY.md §2.10/§8.10): adapter math parity vs dense-merged weights, and
mixed batches where each request uses a different adapter (or none)."""

import numpy as np
import pytest

import tests.hf_util as hf_util

RANK = 4
ALPHA = 8.0


def _make_adapter_tensors(cfg, seed, targets=("q_proj", "v_proj")):
    """PEFT-layout tensors {(layer, target, 'A'|'B'): np.ndarray}."""
    from dashinfer_tpu.lora.manager import _dims
    rng = np.random.RandomState(seed)
    out = {}
    for l in range(cfg.num_layers):
        for t in targets:
            i, o = _dims(cfg, t)
            out[(l, t, "A")] = rng.randn(RANK, i).astype(np.float32) * 0.15
            out[(l, t, "B")] = rng.randn(o, RANK).astype(np.float32) * 0.15
    return out


def _merge_adapter(params, tensors, cfg):
    """Dense-merge: w' = w + (alpha/r) * A @ B (golden for parity)."""
    import copy
    p2 = {k: v for k, v in params.items()}
    p2["layers"] = {k: (dict(v) if isinstance(v, dict) else v)
                    for k, v in params["layers"].items()}
    scale = ALPHA / RANK
    for t in ("q_proj", "v_proj"):
        w = np.array(p2["layers"][t]["w"], np.float32)
        for l in range(cfg.num_layers):
            A = tensors[(l, t, "A")].T        # [in, r]
            B = tensors[(l, t, "B")].T        # [r, out]
            w[l] = w[l] + scale * (A @ B)
        p2["layers"][t] = dict(p2["layers"][t])
        p2["layers"][t]["w"] = w
    return p2


@pytest.fixture(scope="module")
def lora_setup():
    from dashinfer_tpu import Engine, RuntimeConfigBuilder
    from dashinfer_tpu.loader import build_from_torch_model

    hf_cfg = hf_util.tiny_qwen2_config()
    model = hf_util.make_torch_model(hf_cfg)
    cfg, params = build_from_torch_model(model, hf_cfg.to_dict(), "float32")

    rt = (RuntimeConfigBuilder("lora").max_length(64).max_batch(3)
          .kv_cache_page_size(16).kv_cache_num_pages(24).dtype("float32")
          .lora(True, max_num=2, max_rank=8)
          .update({"min_prefill_bucket": 16}).build())
    eng = Engine()
    eng.install_model("lora", rt, params=params, model_config=cfg)
    eng.start_model("lora")
    yield eng, cfg, params
    eng.release_model("lora")


def test_lora_parity_and_mixed_batch(lora_setup):
    from dashinfer_tpu import GenerationConfig
    from dashinfer_tpu.runtime.request import GenerateRequestStatus
    from tests.test_model_parity import _run_prefill_decode

    eng, cfg, params = lora_setup
    tensors = _make_adapter_tensors(cfg, seed=7)
    eng.load_lora("lora", "adapterA", tensors, alpha=ALPHA, rank=RANK)

    rng = np.random.RandomState(21)
    prompt = rng.randint(1, cfg.vocab_size, size=9).tolist()
    n_new = 5

    # golden: dense-merged weights through the functional path
    merged = _merge_adapter(params, tensors, cfg)
    _, _, golden_lora = _run_prefill_decode(cfg, merged, prompt, n_new)
    _, _, golden_base = _run_prefill_decode(cfg, params, prompt, n_new)
    assert golden_lora != golden_base, "adapter too weak to test"

    gen_l = GenerationConfig(max_length=len(prompt) + n_new, do_sample=False,
                             top_k=1, eos_token_id=-1, lora_name="adapterA")
    gen_b = GenerationConfig(max_length=len(prompt) + n_new, do_sample=False,
                             top_k=1, eos_token_id=-1)
    # mixed batch: with-adapter and without, concurrently
    _, h1, q1 = eng.start_request("lora", prompt, gen_l)
    _, h2, q2 = eng.start_request("lora", prompt, gen_b)
    eng.sync_request("lora", h1, timeout_s=600)
    eng.sync_request("lora", h2, timeout_s=600)
    got_l = q1.GetAllGeneratedTokens()
    got_b = q2.GetAllGeneratedTokens()
    eng.release_request("lora", h1)
    eng.release_request("lora", h2)

    assert got_l == golden_lora
    assert got_b == golden_base


def test_lora_pool_management(lora_setup):
    from dashinfer_tpu import GenerationConfig

    eng, cfg, params = lora_setup
    t2 = _make_adapter_tensors(cfg, seed=8)
    eng.load_lora("lora", "adapterB", t2, alpha=ALPHA, rank=RANK)
    # pool is full (max_num=2, adapterA from prior test)
    with pytest.raises(RuntimeError):
        eng.load_lora("lora", "adapterC", t2, alpha=ALPHA, rank=RANK)
    eng.unload_lora("lora", "adapterB")
    eng.load_lora("lora", "adapterC", t2, alpha=ALPHA, rank=RANK)
    # unknown adapter rejected at request time (reference behavior)
    with pytest.raises(KeyError):
        eng.start_request("lora", [1, 2, 3],
                          GenerationConfig(max_length=8, lora_name="nope"))
    # rank too large rejected
    big = {(0, "q_proj", "A"): np.zeros((32, cfg.hidden_size), np.float32),
           (0, "q_proj", "B"): np.zeros((cfg.num_heads * cfg.head_dim, 32),
                                        np.float32)}
    eng.unload_lora("lora", "adapterC")
    with pytest.raises(ValueError):
        eng.load_lora("lora", "adapterD", big, alpha=8.0, rank=32)


def test_lora_enabled_keeps_megakernel_for_plain_batches():
    """VERDICT r2 #7 (partial): enable_lora no longer disables the decode
    megakernel at install — only steps that actually carry a LoRA request
    take the XLA path. A plain request on a LoRA-enabled engine decodes
    through the megakernel plan and matches the no-LoRA engine's tokens."""
    import numpy as np
    import tests.hf_util as hf_util
    from dashinfer_tpu import Engine, GenerationConfig, RuntimeConfigBuilder
    from dashinfer_tpu.config import CacheMode
    from dashinfer_tpu.loader import build_from_torch_model

    # head_dim must be 128 for mk.supports: hidden=256, heads=2
    hf = hf_util.tiny_qwen2_config(hidden=256, inter=256, heads=2,
                                   kv_heads=1)
    cfg, params = build_from_torch_model(hf_util.make_torch_model(hf),
                                         hf.to_dict(), "float32")
    # 128-dim heads so mk.supports passes; quantize to the mega u4 format
    from dashinfer_tpu.config import QuantConfig
    from dashinfer_tpu.loader.quantize import quantize_params
    params = quantize_params(params, QuantConfig(mode="a16w4",
                                                 group_size=128))

    prompt = np.random.RandomState(9).randint(
        1, hf.vocab_size, size=7).tolist()

    def run(enable_lora):
        rtb = (RuntimeConfigBuilder("lm").max_length(64).max_batch(2)
               .kv_cache_page_size(16).kv_cache_num_pages(24)
               .dtype("float32").update({"min_prefill_bucket": 16}))
        if enable_lora:
            rtb = rtb.lora(max_num=2, max_rank=4)
        rt = rtb.build()
        from dashinfer_tpu.engine.model_runtime import ModelRuntime
        runtime = ModelRuntime("lm", cfg, params, rt, use_kernel=True)
        eng = Engine()
        with eng._lock:
            eng._models["lm"] = runtime
        eng.start_model("lm")
        _, h, q = eng.start_request("lm", prompt, GenerationConfig(
            max_length=20, do_sample=False, top_k=1, eos_token_id=-1))
        eng.sync_request("lm", h, timeout_s=900)
        toks = q.GetAllGeneratedTokens()
        plan = runtime.mega_plan
        eng.release_model("lm")
        return toks, plan

    toks_lora, plan_lora = run(enable_lora=True)
    assert plan_lora is not None, \
        "enable_lora must not disable the megakernel pack"
    toks_plain, _ = run(enable_lora=False)
    assert toks_lora == toks_plain


def test_lora_request_stays_on_megakernel_and_matches_xla():
    """A batch CARRYING an adapter now keeps the megakernel fast path
    (in-kernel LoRA epilogue, VERDICT r3 #8) — greedy tokens match the
    XLA LoRA path."""
    import numpy as np
    import tests.hf_util as hf_util
    from dashinfer_tpu import Engine, GenerationConfig, RuntimeConfigBuilder
    from dashinfer_tpu.loader import build_from_torch_model
    from dashinfer_tpu.config import QuantConfig
    from dashinfer_tpu.loader.quantize import quantize_params
    from dashinfer_tpu.lora.manager import _dims

    hf = hf_util.tiny_qwen2_config(hidden=256, inter=256, heads=2,
                                   kv_heads=1)
    cfg, params = build_from_torch_model(hf_util.make_torch_model(hf),
                                         hf.to_dict(), "float32")
    params = quantize_params(params, QuantConfig(mode="a16w4",
                                                 group_size=128))
    rng = np.random.RandomState(3)
    tensors = {}
    for l in range(cfg.num_layers):
        for t in ("q_proj", "v_proj", "down_proj"):
            i, o = _dims(cfg, t)
            tensors[(l, t, "A")] = rng.randn(4, i).astype(np.float32) * 0.1
            tensors[(l, t, "B")] = rng.randn(o, 4).astype(np.float32) * 0.1
    prompt = rng.randint(1, hf.vocab_size, size=7).tolist()

    def run(enable_mega):
        rtb = (RuntimeConfigBuilder("lm2").max_length(24).max_batch(2)
               .kv_cache_page_size(16).kv_cache_num_pages(24)
               .dtype("float32").lora(max_num=2, max_rank=4)
               .update({"min_prefill_bucket": 16,
                        "enable_megakernel": enable_mega}))
        rt = rtb.build()
        from dashinfer_tpu.engine.model_runtime import ModelRuntime
        runtime = ModelRuntime("lm2", cfg, params, rt, use_kernel=True)
        eng = Engine()
        with eng._lock:
            eng._models["lm2"] = runtime
        eng.start_model("lm2")
        eng.load_lora("lm2", "ad", tensors, alpha=8.0, rank=4)
        if enable_mega:
            assert runtime.mega_plan is not None
            assert runtime._mega_lora_ok, \
                "LoRA batches must keep the megakernel"
        _, h, q = eng.start_request("lm2", prompt, GenerationConfig(
            max_length=16, do_sample=False, top_k=1, eos_token_id=-1,
            lora_name="ad"))
        eng.sync_request("lm2", h, timeout_s=900)
        toks = q.GetAllGeneratedTokens()
        eng.release_model("lm2")
        return toks

    toks_mega = run(True)
    toks_xla = run(False)
    assert toks_mega == toks_xla, (toks_mega, toks_xla)
