"""Regression tests for the double-buffered decode loop (model_runtime
decode_tick pipelining): finish-at-limit, stop while a step is in flight,
slot reuse after an in-flight stop, and staggered admissions. Greedy outputs
must be IDENTICAL to the synchronous semantics (HF oracle)."""

import numpy as np
import pytest

import tests.hf_util as hf_util


@pytest.fixture(scope="module")
def eng_setup():
    from dashinfer_tpu import Engine, RuntimeConfigBuilder
    from dashinfer_tpu.loader import build_from_torch_model

    hf_cfg = hf_util.tiny_qwen2_config()
    model = hf_util.make_torch_model(hf_cfg)
    cfg, params = build_from_torch_model(model, hf_cfg.to_dict(), "float32")
    rt = (RuntimeConfigBuilder("pipe")
          .max_length(64).max_batch(3)
          .kv_cache_page_size(16).kv_cache_num_pages(24)
          .dtype("float32")
          .update({"min_prefill_bucket": 16})
          .build())
    eng = Engine()
    eng.install_model("pipe", rt, params=params, model_config=cfg)
    eng.start_model("pipe")
    yield eng, model, hf_cfg
    eng.release_model("pipe")


def test_exact_max_length_finish(eng_setup):
    """A request finishing exactly at max_length must not overrun (the
    near-limit guard forces a drain before the next launch)."""
    from dashinfer_tpu import GenerationConfig
    from dashinfer_tpu.runtime.request import GenerateRequestStatus

    eng, model, hf_cfg = eng_setup
    prompt = [3, 14, 15, 9, 2, 6]
    n_new = 7
    gen = GenerationConfig(max_length=len(prompt) + n_new, do_sample=False,
                           top_k=1, eos_token_id=-1)
    _, h, q = eng.start_request("pipe", prompt, gen)
    eng.sync_request("pipe", h, timeout_s=600)
    toks = list(q.GetAllGeneratedTokens())
    assert q.GenerateStatus() == GenerateRequestStatus.GenerateFinished
    assert toks == list(hf_util.hf_greedy_tokens(model, prompt, n_new))
    eng.release_request("pipe", h)


def test_stop_midflight_and_slot_reuse(eng_setup):
    """stop_request with a step in flight, then a new request reusing the
    slot — the stale in-flight token must not leak into either queue."""
    from dashinfer_tpu import GenerationConfig
    from dashinfer_tpu.runtime.request import GenerateRequestStatus

    eng, model, hf_cfg = eng_setup
    gen_long = GenerationConfig(max_length=60, do_sample=False, top_k=1,
                                eos_token_id=-1)
    p1 = [7, 8, 9, 10]
    _, h1, q1 = eng.start_request("pipe", p1, gen_long)
    # let a few steps run, then stop while the loop is mid-stream
    import time
    for _ in range(200):
        if len(q1.GetAllGeneratedTokens()) >= 2:
            break
        time.sleep(0.05)
    eng.stop_request("pipe", h1)
    st = q1.GenerateStatus()
    assert st in (GenerateRequestStatus.GenerateInterrupted,
                  GenerateRequestStatus.GenerateFinished)
    n_at_stop = len(q1.GetAllGeneratedTokens())

    # slot reuse: a fresh request must produce clean greedy output
    p2 = [21, 22, 23, 24, 25]
    n_new = 6
    gen2 = GenerationConfig(max_length=len(p2) + n_new, do_sample=False,
                            top_k=1, eos_token_id=-1)
    _, h2, q2 = eng.start_request("pipe", p2, gen2)
    eng.sync_request("pipe", h2, timeout_s=600)
    assert list(q2.GetAllGeneratedTokens()) == \
        list(hf_util.hf_greedy_tokens(model, p2, n_new))
    # stopped request's queue did not grow afterwards
    assert len(q1.GetAllGeneratedTokens()) == n_at_stop
    eng.release_request("pipe", h1)
    eng.release_request("pipe", h2)


def test_staggered_admissions_parity(eng_setup):
    """Admitting a request while others are decoding (prefill drains the
    in-flight step) preserves greedy parity for all of them."""
    from dashinfer_tpu import GenerationConfig

    eng, model, hf_cfg = eng_setup
    rng = np.random.RandomState(5)
    prompts = [rng.randint(1, hf_cfg.vocab_size, size=n).tolist()
               for n in (5, 9, 4)]
    n_new = 8
    handles = []
    import time
    for p in prompts:
        gen = GenerationConfig(max_length=len(p) + n_new, do_sample=False,
                               top_k=1, eos_token_id=-1)
        handles.append(eng.start_request("pipe", p, gen))
        time.sleep(0.3)  # stagger so decode steps interleave with admission
    for (_, h, _q) in handles:
        eng.sync_request("pipe", h, timeout_s=600)
    for p, (_, h, q) in zip(prompts, handles):
        assert list(q.GetAllGeneratedTokens()) == \
            list(hf_util.hf_greedy_tokens(model, p, n_new)), p
        eng.release_request("pipe", h)
