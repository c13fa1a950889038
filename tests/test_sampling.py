"""Sampler unit tests (reference tests sampling kernels numerically,
tests/cpp/kernel/...topp/topk; here: behavioral invariants)."""

import numpy as np
import pytest


def _params(B, V, **kw):
    import jax.numpy as jnp
    from dashinfer_tpu.runtime.batch_state import make_sampling_params

    sp = make_sampling_params(B, 4)
    for k, v in kw.items():
        arr = getattr(sp, k)
        sp = sp.__class__(**{**{f.name: getattr(sp, f.name)
                                for f in sp.__dataclass_fields__.values()},
                             k: jnp.asarray(v, arr.dtype)})
    return sp


def test_greedy_topk1():
    import jax.numpy as jnp
    from dashinfer_tpu.ops.sampling import sample

    B, V = 3, 50
    rng = np.random.RandomState(0)
    logits = jnp.asarray(rng.randn(B, V).astype(np.float32))
    sp = _params(B, V, top_k=[1, 1, 1])
    out = sample(logits, sp, jnp.zeros((B, V), jnp.int32),
                 jnp.zeros((B,), jnp.int32), jnp.zeros((B,), jnp.int32),
                 max_top_k=16)
    np.testing.assert_array_equal(np.asarray(out.tokens),
                                  np.argmax(np.asarray(logits), -1))


def test_seed_determinism_and_variation():
    import jax.numpy as jnp
    from dashinfer_tpu.ops.sampling import sample

    B, V = 2, 100
    rng = np.random.RandomState(1)
    logits = jnp.asarray(np.tile(rng.randn(1, V), (B, 1)).astype(np.float32))
    sp = _params(B, V, top_k=[50, 50], temperature=[1.5, 1.5], seed=[7, 7])
    counts = jnp.zeros((B, V), jnp.int32)
    zeros = jnp.zeros((B,), jnp.int32)

    a = sample(logits, sp, counts, zeros, zeros, max_top_k=64)
    b = sample(logits, sp, counts, zeros, zeros, max_top_k=64)
    # same seed+step => identical
    np.testing.assert_array_equal(np.asarray(a.tokens), np.asarray(b.tokens))
    # different step => (almost surely) different over many steps
    toks = [int(np.asarray(sample(logits, sp, counts, zeros,
                                  jnp.full((B,), s, jnp.int32),
                                  max_top_k=64).tokens)[0])
            for s in range(20)]
    assert len(set(toks)) > 3


def test_repetition_penalty_suppresses():
    import jax.numpy as jnp
    from dashinfer_tpu.ops.sampling import process_logits

    B, V = 1, 10
    logits = jnp.zeros((B, V), jnp.float32).at[0, 3].set(5.0).at[0, 4].set(4.9)
    counts = jnp.zeros((B, V), jnp.int32).at[0, 3].set(2)
    sp = _params(B, V, repetition_penalty=[100.0])
    out = process_logits(logits, sp, counts, jnp.zeros((B,), jnp.int32))
    assert np.argmax(np.asarray(out)[0]) == 4


def test_min_length_bans_stop_tokens():
    import jax.numpy as jnp
    from dashinfer_tpu.ops.sampling import sample

    B, V = 1, 10
    logits = jnp.zeros((B, V), jnp.float32).at[0, 7].set(10.0).at[0, 2].set(5.0)
    sp = _params(B, V, top_k=[1], min_gen_len=[5],
                 stop_token_ids=[[7, -1, -1, -1]])
    counts = jnp.zeros((B, V), jnp.int32)
    # gen_len < min_gen_len: eos (7) banned -> 2 wins
    out = sample(logits, sp, counts, jnp.asarray([2], jnp.int32),
                 jnp.zeros((B,), jnp.int32), max_top_k=8)
    assert int(np.asarray(out.tokens)[0]) == 2
    # gen_len >= min: 7 wins
    out = sample(logits, sp, counts, jnp.asarray([6], jnp.int32),
                 jnp.zeros((B,), jnp.int32), max_top_k=8)
    assert int(np.asarray(out.tokens)[0]) == 7


def test_top_p_filters_tail():
    import jax.numpy as jnp
    from dashinfer_tpu.ops.sampling import sample

    B, V = 1, 8
    # one dominant token (p~0.97): top_p=0.5 must always pick it
    logits = jnp.zeros((B, V), jnp.float32).at[0, 5].set(6.0)
    sp = _params(B, V, top_k=[0], top_p=[0.5], temperature=[1.0])
    counts = jnp.zeros((B, V), jnp.int32)
    for s in range(10):
        out = sample(logits, sp, counts, jnp.zeros((B,), jnp.int32),
                     jnp.full((B,), s, jnp.int32), max_top_k=8)
        assert int(np.asarray(out.tokens)[0]) == 5


def test_logprobs_shape():
    import jax.numpy as jnp
    from dashinfer_tpu.ops.sampling import sample

    B, V = 2, 32
    rng = np.random.RandomState(3)
    logits = jnp.asarray(rng.randn(B, V).astype(np.float32))
    sp = _params(B, V, top_k=[1, 1])
    out = sample(logits, sp, jnp.zeros((B, V), jnp.int32),
                 jnp.zeros((B,), jnp.int32), jnp.zeros((B,), jnp.int32),
                 max_top_k=8, top_logprobs=5)
    assert out.top_ids.shape == (B, 5)
    assert out.token_logprobs.shape == (B,)
    # chosen token's logprob equals its entry in the full log-softmax
    lp_full = np.log(np.exp(np.asarray(logits)) /
                     np.exp(np.asarray(logits)).sum(-1, keepdims=True))
    got = np.asarray(out.token_logprobs)
    want = lp_full[np.arange(B), np.asarray(out.tokens)]
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_bad_words_and_ngram_bans():
    """bad_words_ids (single + multi token) and no_repeat_ngram_size are
    enforced (reference bad-words/ngram filters, process_id kernels)."""
    import tests.hf_util as hf_util
    from dashinfer_tpu import Engine, GenerationConfig, RuntimeConfigBuilder
    from dashinfer_tpu.loader import build_from_torch_model
    from dashinfer_tpu.runtime.request import GenerateRequestStatus

    hf_cfg = hf_util.tiny_qwen2_config()
    model = hf_util.make_torch_model(hf_cfg)
    cfg, params = build_from_torch_model(model, hf_cfg.to_dict(), "float32")
    rt = (RuntimeConfigBuilder("bw").max_length(96).max_batch(2)
          .kv_cache_page_size(16).kv_cache_num_pages(32).dtype("float32")
          .update({"min_prefill_bucket": 16}).build())
    eng = Engine().install_model("bw", rt, params=params, model_config=cfg)
    eng.start_model("bw")
    rng = np.random.RandomState(2)
    prompt = rng.randint(1, hf_cfg.vocab_size, size=9).tolist()
    base = hf_util.hf_greedy_tokens(model, prompt, 8)

    # ban the first greedily-chosen token: generation must diverge and the
    # banned token must never appear
    banned_tok = base[0]
    gen = GenerationConfig(max_length=len(prompt) + 8, do_sample=False,
                           top_k=1, eos_token_id=-1,
                           bad_words_ids=[[banned_tok]])
    _, h, q = eng.start_request("bw", prompt, gen)
    eng.sync_request("bw", h, timeout_s=600)
    got = q.GetAllGeneratedTokens()
    assert banned_tok not in got
    eng.release_request("bw", h)

    # multi-token bad word: ban the bigram (base[0], base[1]) — base[0] may
    # appear, but never followed by base[1]
    gen2 = GenerationConfig(max_length=len(prompt) + 8, do_sample=False,
                            top_k=1, eos_token_id=-1,
                            bad_words_ids=[[base[0], base[1]]])
    _, h2, q2 = eng.start_request("bw", prompt, gen2)
    eng.sync_request("bw", h2, timeout_s=600)
    got2 = q2.GetAllGeneratedTokens()
    for i in range(len(got2) - 1):
        assert not (got2[i] == base[0] and got2[i + 1] == base[1])
    eng.release_request("bw", h2)

    # no_repeat_ngram_size=1: every generated token distinct
    gen3 = GenerationConfig(max_length=len(prompt) + 10, do_sample=False,
                            top_k=1, eos_token_id=-1, no_repeat_ngram_size=1)
    _, h3, q3 = eng.start_request("bw", prompt, gen3)
    eng.sync_request("bw", h3, timeout_s=600)
    got3 = q3.GetAllGeneratedTokens()
    seq3 = prompt + got3
    assert len(set(seq3)) == len(seq3)
    eng.release_model("bw")


def test_beam_search_rejected_like_reference():
    from dashinfer_tpu.config import GenerationConfig
    g = GenerationConfig(num_beams=2)
    with pytest.raises(ValueError, match="beam search"):
        g.validate(100, 2048)


def test_device_banned_mask_matches_host_oracle():
    """On-device bad-words/ngram mask (ops/sampling.device_banned_mask;
    reference process_id.cu) agrees exactly with the host oracle
    (_banned_ids) across random histories and ban configs."""
    from dashinfer_tpu.ops.sampling import device_banned_mask

    V, T, MW, WL, NG = 64, 48, 8, 4, 8
    rng = np.random.RandomState(11)

    def host_oracle(ctx, bad_words, n):
        banned = set()
        for w in bad_words:
            w = [int(t) for t in w]
            if len(w) == 1:
                banned.add(w[0])
            elif len(w) - 1 <= len(ctx) and ctx[-(len(w) - 1):] == w[:-1]:
                banned.add(w[-1])
        if n > 0 and len(ctx) >= n - 1:
            tail = tuple(ctx[-(n - 1):]) if n > 1 else ()
            for i in range(len(ctx) - n + 1):
                if tuple(ctx[i:i + n - 1]) == tail:
                    banned.add(ctx[i + n - 1])
        return banned

    for trial in range(30):
        B = rng.randint(1, 4)
        hist = np.full((B, T), -1, np.int32)
        lens = rng.randint(1, T, size=B).astype(np.int32)
        bw = np.full((B, MW, WL), -1, np.int32)
        ng = np.zeros((B,), np.int32)
        ctxs, words = [], []
        for b in range(B):
            # small alphabet so ngram repeats actually occur
            ctx = rng.randint(0, 6, size=lens[b]).tolist()
            hist[b, :lens[b]] = ctx
            ctxs.append(ctx)
            nw = rng.randint(0, MW + 1)
            ws = []
            for j in range(nw):
                wl = rng.randint(1, WL + 1)
                w = rng.randint(0, 6, size=wl).tolist()
                ws.append(w)
                bw[b, j, WL - wl:] = w
            words.append(ws)
            ng[b] = rng.choice([0, 1, 2, 3])
        import jax.numpy as jnp
        mask = np.asarray(device_banned_mask(
            jnp.asarray(hist), jnp.asarray(lens), jnp.asarray(bw),
            jnp.asarray(ng), V, NG))
        for b in range(B):
            want = host_oracle(ctxs[b], words[b], int(ng[b]))
            got = set(np.nonzero(mask[b])[0].tolist())
            assert got == want, (trial, b, got, want, ctxs[b], words[b],
                                 int(ng[b]))


def test_banned_requests_keep_multistep_pipeline():
    """VERDICT r2 #8: bad-words/ngram requests no longer force synchronous
    single-step ticks — the on-device mask keeps the multi-step decode
    window (profiler shows decode_xN launches) and produces the same
    tokens as the synchronous host-fallback path."""
    import os
    import tests.hf_util as hf_util
    from dashinfer_tpu import Engine, GenerationConfig, RuntimeConfigBuilder
    from dashinfer_tpu.engine.model_runtime import ModelRuntime
    from dashinfer_tpu.loader import build_from_torch_model

    hf_cfg = hf_util.tiny_qwen2_config()
    model = hf_util.make_torch_model(hf_cfg)
    cfg, params = build_from_torch_model(model, hf_cfg.to_dict(), "float32")
    prompt = np.random.RandomState(5).randint(
        1, hf_cfg.vocab_size, size=9).tolist()
    base = hf_util.hf_greedy_tokens(model, prompt, 4)
    gen_kwargs = dict(max_length=len(prompt) + 16, do_sample=False, top_k=1,
                      eos_token_id=-1, no_repeat_ngram_size=2,
                      bad_words_ids=[[base[0]], [base[1], base[2]]])

    def run(force_host):
        os.environ["DI_PROFILE"] = "1"
        rt = (RuntimeConfigBuilder("bp").max_length(96).max_batch(2)
              .kv_cache_page_size(16).kv_cache_num_pages(32)
              .dtype("float32")
              .update({"min_prefill_bucket": 16,
                       "decode_steps_per_launch": 4}).build())
        eng = Engine().install_model("bp", rt, params=params,
                                     model_config=cfg)
        eng.start_model("bp")
        if force_host:
            eng._models["bp"]._device_ban_fits = lambda g: False
        _, h, q = eng.start_request("bp", prompt,
                                    GenerationConfig(**gen_kwargs))
        eng.sync_request("bp", h, timeout_s=600)
        toks = q.GetAllGeneratedTokens()
        phases = eng._models["bp"].profiler.report()
        eng.release_model("bp")
        os.environ.pop("DI_PROFILE", None)
        return toks, phases

    dev_toks, dev_phases = run(force_host=False)
    host_toks, host_phases = run(force_host=True)
    assert dev_toks == host_toks, (dev_toks, host_toks)
    # device path used multi-step windows; host fallback could not
    assert any(p.startswith("decode_x") for p in dev_phases), dev_phases
    assert not any(p.startswith("decode_x") for p in host_phases), \
        host_phases
