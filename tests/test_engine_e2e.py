"""End-to-end engine tests: continuous batching, streaming, greedy parity
with HF, eviction on cache OOM (reference model-level tests,
tests/cpp/model/cuda/model_cuda_test.cpp:205+ incl. interrupted-request)."""

import time

import numpy as np
import pytest

import tests.hf_util as hf_util


@pytest.fixture(scope="module")
def engine_setup():
    from dashinfer_tpu import Engine, GenerationConfig, RuntimeConfigBuilder
    from dashinfer_tpu.loader import build_from_torch_model

    hf_cfg = hf_util.tiny_qwen2_config()
    model = hf_util.make_torch_model(hf_cfg)
    cfg, params = build_from_torch_model(model, hf_cfg.to_dict(), "float32")

    rt = (RuntimeConfigBuilder("tiny")
          .max_length(128).max_batch(4)
          .kv_cache_page_size(16).kv_cache_num_pages(64)
          .dtype("float32")
          .update({"min_prefill_bucket": 16})
          .build())
    eng = Engine()
    eng.install_model("tiny", rt, params=params, model_config=cfg)
    eng.start_model("tiny")
    yield eng, model, hf_cfg
    eng.release_model("tiny")


def test_single_request_greedy_matches_hf(engine_setup):
    from dashinfer_tpu import GenerationConfig
    from dashinfer_tpu.runtime.request import GenerateRequestStatus

    eng, model, hf_cfg = engine_setup
    rng = np.random.RandomState(5)
    prompt = rng.randint(1, hf_cfg.vocab_size, size=11).tolist()
    n_new = 6
    golden = hf_util.hf_greedy_tokens(model, prompt, n_new)

    gen = GenerationConfig(max_length=len(prompt) + n_new, do_sample=False,
                           top_k=1, eos_token_id=-1)
    status, handle, q = eng.start_request("tiny", prompt, gen)
    eng.sync_request("tiny", handle, timeout_s=300)
    assert q.GenerateStatus() == GenerateRequestStatus.GenerateFinished
    got = q.GetAllGeneratedTokens()
    eng.release_request("tiny", handle)
    assert got == golden


def test_concurrent_requests_stream_and_match(engine_setup):
    from dashinfer_tpu import GenerationConfig
    from dashinfer_tpu.runtime.request import GenerateRequestStatus

    eng, model, hf_cfg = engine_setup
    rng = np.random.RandomState(7)
    prompts = [rng.randint(1, hf_cfg.vocab_size,
                           size=rng.randint(4, 14)).tolist()
               for _ in range(5)]  # 5 requests > max_batch=4: queueing
    n_new = 5
    goldens = [hf_util.hf_greedy_tokens(model, p, n_new) for p in prompts]

    handles = []
    for p in prompts:
        gen = GenerationConfig(max_length=len(p) + n_new, do_sample=False,
                               top_k=1, eos_token_id=-1)
        handles.append(eng.start_request("tiny", p, gen))

    for (status, h, q), golden in zip(handles, goldens):
        eng.sync_request("tiny", h, timeout_s=600)
        assert q.GenerateStatus() == GenerateRequestStatus.GenerateFinished
        assert q.GetAllGeneratedTokens() == golden
        eng.release_request("tiny", h)

    stats = eng.get_engine_stat("tiny")
    assert stats["runnings"] == 0 and stats["pendings"] == 0


def test_stop_words_and_max_length(engine_setup):
    from dashinfer_tpu import GenerationConfig
    from dashinfer_tpu.runtime.request import GenerateRequestStatus

    eng, model, hf_cfg = engine_setup
    rng = np.random.RandomState(9)
    prompt = rng.randint(1, hf_cfg.vocab_size, size=8).tolist()
    golden = hf_util.hf_greedy_tokens(model, prompt, 8)

    # stop at the 3rd golden token (single-token stop word)
    gen = GenerationConfig(max_length=64, do_sample=False, top_k=1,
                           eos_token_id=-1,
                           stop_words_ids=[[golden[2]]])
    _, h, q = eng.start_request("tiny", prompt, gen)
    eng.sync_request("tiny", h, timeout_s=300)
    got = q.GetAllGeneratedTokens()
    eng.release_request("tiny", h)
    assert got == golden[:3]

    # max_length cap
    gen2 = GenerationConfig(max_length=len(prompt) + 2, do_sample=False,
                            top_k=1, eos_token_id=-1)
    _, h2, q2 = eng.start_request("tiny", prompt, gen2)
    eng.sync_request("tiny", h2, timeout_s=300)
    assert len(q2.GetAllGeneratedTokens()) == 2
    eng.release_request("tiny", h2)


def test_eviction_on_cache_oom():
    """Tiny pool: a long-running request gets interrupted when a competing
    batch exhausts pages (reference interrupted-request test + eviction,
    as_engine_decode.cpp:112-169)."""
    from dashinfer_tpu import Engine, GenerationConfig, RuntimeConfigBuilder
    from dashinfer_tpu.loader import build_from_torch_model
    from dashinfer_tpu.runtime.request import GenerateRequestStatus

    hf_cfg = hf_util.tiny_qwen2_config()
    model = hf_util.make_torch_model(hf_cfg)
    cfg, params = build_from_torch_model(model, hf_cfg.to_dict(), "float32")

    rt = (RuntimeConfigBuilder("t2").max_length(128).max_batch(3)
          .kv_cache_page_size(16).kv_cache_num_pages(7)
          .dtype("float32").update({"min_prefill_bucket": 16}).build())
    eng = Engine()
    eng.install_model("t2", rt, params=params, model_config=cfg)
    eng.start_model("t2")
    try:
        rng = np.random.RandomState(11)
        handles = []
        for _ in range(3):
            p = rng.randint(1, hf_cfg.vocab_size, size=15).tolist()
            gen = GenerationConfig(max_length=96, do_sample=False, top_k=1,
                                   eos_token_id=-1)
            handles.append(eng.start_request("t2", p, gen))
        statuses = []
        for _, h, q in handles:
            eng.sync_request("t2", h, timeout_s=600)
            statuses.append(q.GenerateStatus())
            eng.release_request("t2", h)
        assert GenerateRequestStatus.GenerateInterrupted in statuses
        # at least one request must have survived to completion
        assert GenerateRequestStatus.GenerateFinished in statuses
    finally:
        eng.release_model("t2")


def test_chunked_prefill_matches_hf():
    """Chunked prefill (max_prefill_chunk > 0) yields identical greedy
    tokens. The reference scaffolds but rejects chunked prefill
    (as_engine.cpp:439-443); here it is supported."""
    from dashinfer_tpu import Engine, GenerationConfig, RuntimeConfigBuilder
    from dashinfer_tpu.loader import build_from_torch_model
    from dashinfer_tpu.runtime.request import GenerateRequestStatus

    hf_cfg = hf_util.tiny_qwen2_config()
    model = hf_util.make_torch_model(hf_cfg)
    cfg, params = build_from_torch_model(model, hf_cfg.to_dict(), "float32")
    rt = (RuntimeConfigBuilder("ck")
          .max_length(128).max_batch(2)
          .kv_cache_page_size(16).kv_cache_num_pages(64)
          .dtype("float32")
          .update({"min_prefill_bucket": 16, "max_prefill_chunk": 16})
          .build())
    eng = Engine()
    eng.install_model("ck", rt, params=params, model_config=cfg)
    eng.start_model("ck")
    rng = np.random.RandomState(11)
    prompt = rng.randint(1, hf_cfg.vocab_size, size=41).tolist()  # 3 chunks
    n_new = 5
    golden = hf_util.hf_greedy_tokens(model, prompt, n_new)
    gen = GenerationConfig(max_length=len(prompt) + n_new, do_sample=False,
                           top_k=1, eos_token_id=-1)
    _, handle, q = eng.start_request("ck", prompt, gen)
    eng.sync_request("ck", handle, timeout_s=600)
    assert q.GenerateStatus() == GenerateRequestStatus.GenerateFinished
    got = q.GetAllGeneratedTokens()
    eng.release_model("ck")
    assert got == golden


def test_run_forward_generic_operator(engine_setup):
    """Non-generative forward (reference generic "Operator" model,
    operator.cpp:19): full-sequence logits match the HF oracle and the API
    leaves the serving pool untouched."""
    eng, model, hf_cfg = engine_setup
    rng = np.random.RandomState(13)
    prompt = rng.randint(1, hf_cfg.vocab_size, size=9).tolist()

    before = eng.get_engine_stat("tiny")["used_span"]
    out = eng.run_forward("tiny", prompt)
    assert out["logits"].shape == (9, hf_cfg.vocab_size)
    assert out["last_hidden_state"].shape == (9, hf_cfg.hidden_size)
    ref = hf_util.hf_full_logits(model, prompt)
    np.testing.assert_allclose(out["logits"], np.asarray(ref), atol=2e-3,
                               rtol=2e-3)
    assert eng.get_engine_stat("tiny")["used_span"] == before


def test_graceful_stop_drains_running_rejects_new():
    """GracefulStop (reference as_engine.cpp:2549-2575): a running request
    decodes to completion, never-admitted pending requests are interrupted,
    and new start_request calls are rejected once the stop begins."""
    from dashinfer_tpu import Engine, GenerationConfig, RuntimeConfigBuilder
    from dashinfer_tpu.loader import build_from_torch_model
    from dashinfer_tpu.runtime.request import GenerateRequestStatus

    hf_cfg = hf_util.tiny_qwen2_config()
    model = hf_util.make_torch_model(hf_cfg)
    cfg, params = build_from_torch_model(model, hf_cfg.to_dict(), "float32")
    rt = (RuntimeConfigBuilder("gs").max_length(128).max_batch(1)
          .kv_cache_page_size(16).kv_cache_num_pages(32).dtype("float32")
          .update({"min_prefill_bucket": 16}).build())
    eng = Engine()
    eng.install_model("gs", rt, params=params, model_config=cfg)
    eng.start_model("gs")
    try:
        rng = np.random.RandomState(21)
        p1 = rng.randint(1, hf_cfg.vocab_size, size=9).tolist()
        golden = hf_util.hf_greedy_tokens(model, p1, 20)
        gen = lambda p, n: GenerationConfig(  # noqa: E731
            max_length=len(p) + n, do_sample=False, top_k=1, eos_token_id=-1)
        _, h1, q1 = eng.start_request("gs", p1, gen(p1, 20))
        # wait until it is actually running (max_batch=1 keeps p2 pending)
        deadline = time.monotonic() + 300
        while not eng._models["gs"].active_requests() and \
                time.monotonic() < deadline:
            time.sleep(0.01)
        p2 = rng.randint(1, hf_cfg.vocab_size, size=7).tolist()
        _, h2, q2 = eng.start_request("gs", p2, gen(p2, 20))

        eng.stop_model("gs", graceful=True, timeout_s=300)

        assert q1.GenerateStatus() == GenerateRequestStatus.GenerateFinished
        assert q1.GetAllGeneratedTokens() == golden
        # the never-admitted request was interrupted, not silently dropped
        assert q2.GenerateStatus() == GenerateRequestStatus.GenerateInterrupted
        with pytest.raises(RuntimeError):
            eng.start_request("gs", p1, gen(p1, 4))
    finally:
        eng.release_model("gs")


def test_infeasible_request_fails_instead_of_deadlocking():
    """A request whose prompt needs more pages than the ENTIRE pool must
    fail with InternalError, not pend forever (round-5 on-chip finding:
    a floored pool + in1024 prompt deadlocked the admission queue)."""
    import numpy as np
    import tests.hf_util as hf_util
    from dashinfer_tpu import Engine, GenerationConfig, RuntimeConfigBuilder
    from dashinfer_tpu.loader import build_from_torch_model

    hf = hf_util.tiny_qwen2_config()
    cfg, params = build_from_torch_model(hf_util.make_torch_model(hf),
                                         hf.to_dict(), "float32")
    # pool of 3 pages x 16 tokens = 48 cached tokens max; 64-token prompt
    # can never fit
    rt = (RuntimeConfigBuilder("inf").max_length(96).max_batch(2)
          .kv_cache_page_size(16).kv_cache_num_pages(3).dtype("float32")
          .update({"min_prefill_bucket": 16}).build())
    eng = Engine().install_model("inf", rt, params=params, model_config=cfg)
    eng.start_model("inf")
    prompt = np.random.RandomState(0).randint(1, hf.vocab_size,
                                              size=64).tolist()
    _, h, q = eng.start_request("inf", prompt, GenerationConfig(
        max_length=80, do_sample=False, top_k=1, eos_token_id=-1))
    eng.sync_request("inf", h, timeout_s=120)
    assert q.GenerateStatus().name == "InternalError"
    eng.release_model("inf")
