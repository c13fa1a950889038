"""Multi-step decode (decode_steps_per_launch > 1): N scanned steps per
jitted launch must be bit-identical to N single-step launches, including
page-boundary crossings inside the window, EOS/stop mid-window (later rows
discarded), and fallback to single-step near length limits."""

import numpy as np
import pytest

import tests.hf_util as hf_util


def test_steps_multi_equals_single():
    """steps-level: build_multi_decode_step(N=3) == 3x build_decode_step,
    with a page crossing inside the window."""
    import dataclasses
    import jax
    import jax.numpy as jnp
    from dashinfer_tpu.config import CacheConfig, ModelConfig, RuntimeConfig
    from dashinfer_tpu.engine import steps as steps_mod
    from dashinfer_tpu.models import transformer
    from dashinfer_tpu.runtime.batch_state import make_decode_state
    from dashinfer_tpu.runtime.kv_cache import create_kv_cache
    from dashinfer_tpu.loader import build_from_torch_model

    hf_cfg = hf_util.tiny_qwen2_config()
    model = hf_util.make_torch_model(hf_cfg)
    cfg, params = build_from_torch_model(model, hf_cfg.to_dict(), "float32")
    ps = 16
    rt = RuntimeConfig(model_name="ms", max_length=64, max_batch=2,
                       cache=CacheConfig(page_size=ps, num_pages=16),
                       dtype="float32", min_prefill_bucket=16)
    params = jax.tree.map(jnp.asarray, params)

    def fresh():
        cache = create_kv_cache(cfg, rt.cache, 16 * cfg.num_layers,
                                model_dtype=jnp.float32)
        state = make_decode_state(cfg, rt)
        # slot 0: 14 cached tokens (crosses into page 1 mid-window);
        # slot 1: 5 cached tokens
        toks = np.array([[4, 9, 2, 7, 5, 1, 8, 3, 6, 2, 9, 4, 7, 5, 0, 0],
                         [11, 3, 5, 8, 2, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0]],
                        np.int32)
        lens = [14, 5]
        # page-table col 1 for slot 0 intentionally UNSET (0): the decode
        # window must install it via new_page_ids
        pt = np.array([[1, 0, 0, 0], [3, 0, 0, 0]], np.int32)
        for b in range(2):
            _, cache = transformer.prefill_forward(
                cfg, params, jnp.asarray(toks[b]), cache,
                jnp.asarray(pt[b, :2]), jnp.int32(0), jnp.int32(lens[b]),
                mode=rt.cache.mode, use_kernel=False)
        state = dataclasses.replace(
            state,
            token_ids=jnp.asarray([toks[0][13], toks[1][4]], jnp.int32),
            context_lens=jnp.asarray(lens, jnp.int32),
            prompt_lens=jnp.asarray(lens, jnp.int32),
            gen_lens=jnp.ones((2,), jnp.int32),
            page_tables=jnp.asarray(pt),
            active=jnp.ones((2,), bool))
        return cache, state

    single = steps_mod.build_decode_step(cfg, rt, use_kernel=False)
    multi = steps_mod.build_multi_decode_step(cfg, rt, 3, use_kernel=False)

    # window page installs: slot 0 crosses at len 16 (step 2: 14,15,16),
    # slot 1 never crosses
    npi = np.full((3, 2), -1, np.int32)
    npi[2, 0] = 2  # logical page already in pt col 1 -> install explicitly

    cache_s, state_s = fresh()
    toks_s = []
    for i in range(3):
        row = npi[i]
        t, _, cache_s, state_s = single(params, cache_s, state_s,
                                        jnp.asarray(row))
        toks_s.append(np.asarray(t))

    cache_m, state_m = fresh()
    toks_m, cache_m, state_m = multi(params, cache_m, state_m,
                                     jnp.asarray(npi))
    toks_m = np.asarray(toks_m)

    np.testing.assert_array_equal(np.stack(toks_s), toks_m)
    np.testing.assert_array_equal(np.asarray(state_s.context_lens),
                                  np.asarray(state_m.context_lens))
    np.testing.assert_allclose(np.asarray(cache_s.k), np.asarray(cache_m.k),
                               atol=1e-6)


@pytest.fixture(scope="module")
def eng_multi():
    from dashinfer_tpu import Engine, RuntimeConfigBuilder
    from dashinfer_tpu.loader import build_from_torch_model

    hf_cfg = hf_util.tiny_qwen2_config()
    model = hf_util.make_torch_model(hf_cfg)
    cfg, params = build_from_torch_model(model, hf_cfg.to_dict(), "float32")
    rt = (RuntimeConfigBuilder("ms")
          .max_length(64).max_batch(3)
          .kv_cache_page_size(16).kv_cache_num_pages(24)
          .dtype("float32")
          .update({"min_prefill_bucket": 16,
                   "decode_steps_per_launch": 3})
          .build())
    eng = Engine()
    eng.install_model("ms", rt, params=params, model_config=cfg)
    eng.start_model("ms")
    yield eng, model, hf_cfg
    eng.release_model("ms")


def test_engine_multistep_greedy_parity(eng_multi):
    """Window size 3 with n_new=7: two full windows + single-step tail must
    reproduce the HF greedy sequence exactly."""
    from dashinfer_tpu import GenerationConfig
    from dashinfer_tpu.runtime.request import GenerateRequestStatus

    eng, model, hf_cfg = eng_multi
    prompt = [3, 14, 15, 9, 2, 6]
    n_new = 7
    gen = GenerationConfig(max_length=len(prompt) + n_new, do_sample=False,
                           top_k=1, eos_token_id=-1)
    _, h, q = eng.start_request("ms", prompt, gen)
    eng.sync_request("ms", h, timeout_s=600)
    assert q.GenerateStatus() == GenerateRequestStatus.GenerateFinished
    assert list(q.GetAllGeneratedTokens()) == \
        list(hf_util.hf_greedy_tokens(model, prompt, n_new))
    eng.release_request("ms", h)


def test_engine_multistep_stop_word_midwindow(eng_multi):
    """A single-token stop word hit inside a window: generation stops there
    and the window's later rows are discarded."""
    from dashinfer_tpu import GenerationConfig
    from dashinfer_tpu.runtime.request import GenerateRequestStatus

    eng, model, hf_cfg = eng_multi
    prompt = [5, 9, 2, 41, 77, 3]
    ref = list(hf_util.hf_greedy_tokens(model, prompt, 8))
    stop_tok = int(ref[4])
    gen = GenerationConfig(max_length=64, do_sample=False, top_k=1,
                           eos_token_id=-1,
                           stop_words_ids=[[stop_tok]])
    _, h, q = eng.start_request("ms", prompt, gen)
    eng.sync_request("ms", h, timeout_s=600)
    toks = list(q.GetAllGeneratedTokens())
    assert q.GenerateStatus() == GenerateRequestStatus.GenerateFinished
    # generation stopped at the stop token (inclusive), nothing after
    assert toks == ref[:5]
    eng.release_request("ms", h)


def test_engine_multistep_batched_parity(eng_multi):
    """Concurrent requests with different lengths through windowed decode."""
    from dashinfer_tpu import GenerationConfig

    eng, model, hf_cfg = eng_multi
    rng = np.random.RandomState(11)
    prompts = [rng.randint(1, hf_cfg.vocab_size, size=n).tolist()
               for n in (6, 11, 4)]
    n_news = (9, 5, 12)
    handles = []
    for p, n_new in zip(prompts, n_news):
        gen = GenerationConfig(max_length=len(p) + n_new, do_sample=False,
                               top_k=1, eos_token_id=-1)
        handles.append(eng.start_request("ms", p, gen))
    for (_, h, _q) in handles:
        eng.sync_request("ms", h, timeout_s=600)
    for p, n_new, (_, h, q) in zip(prompts, n_news, handles):
        assert list(q.GetAllGeneratedTokens()) == \
            list(hf_util.hf_greedy_tokens(model, p, n_new)), p
        eng.release_request("ms", h)
