"""Golden-logits parity vs HF torch (the reference validates ops against
golden dumps + e2e token sequences, SURVEY.md §4; we use HF as the oracle)."""

import numpy as np
import pytest

import tests.hf_util as hf_util


def _run_prefill_decode(cfg, params, input_ids, n_decode, page_size=16,
                        mode=None, use_kernel=False):
    """Functional prefill + greedy decode via the model forward paths."""
    import functools
    import jax
    import jax.numpy as jnp
    from dashinfer_tpu.config import CacheConfig, CacheMode
    from dashinfer_tpu.models import transformer
    from dashinfer_tpu.runtime.kv_cache import create_kv_cache

    mode = mode or CacheMode.DEFAULT
    L = cfg.num_layers
    S = 64
    max_pages = S // page_size
    cache_cfg = CacheConfig(page_size=page_size, mode=mode)
    cache = create_kv_cache(cfg, cache_cfg, num_physical_pages=L * (max_pages + 1) + 8,
                            model_dtype=jnp.float32)
    params = jax.tree.map(jnp.asarray, params)

    prefill_fn = jax.jit(functools.partial(
        transformer.prefill_forward, cfg, mode=mode, use_kernel=use_kernel))
    decode_fn = jax.jit(functools.partial(
        transformer.decode_forward, cfg, mode=mode, use_kernel=use_kernel))

    # page table: LOGICAL page j (logical page g owns pool rows g*L + l)
    pt = jnp.asarray(np.arange(1, max_pages + 1, dtype=np.int32))

    T = len(input_ids)
    tokens = jnp.asarray(np.pad(input_ids, (0, S - T)), jnp.int32)
    logits, cache = prefill_fn(params, tokens, cache, pt, jnp.int32(0),
                               jnp.int32(T))
    prefill_logits = np.asarray(logits)

    out_tokens = [int(np.argmax(prefill_logits))]
    B = 4  # exercise batched decode with one active slot
    page_tables = jnp.tile(pt[None], (B, 1))
    decode_logits = []
    for i in range(n_decode - 1):
        tok = jnp.full((B,), out_tokens[-1], jnp.int32)
        lens = jnp.full((B,), T + i, jnp.int32)
        active = jnp.asarray([True] + [False] * (B - 1))
        lg, cache = decode_fn(params, tok, cache, page_tables, lens, active,
                              prompt_lens=jnp.full((B,), T, jnp.int32))
        decode_logits.append(np.asarray(lg[0]))
        out_tokens.append(int(np.argmax(lg[0])))
    return prefill_logits, decode_logits, out_tokens


@pytest.mark.parametrize("make_cfg,name", [
    (hf_util.tiny_qwen2_config, "qwen2"),
    (hf_util.tiny_llama_config, "llama"),
    (hf_util.tiny_qwen3_config, "qwen3"),
    (hf_util.tiny_qwen2_moe_config, "qwen2_moe"),
    (hf_util.tiny_qwen3_moe_config, "qwen3_moe"),
    (hf_util.tiny_gpt2_config, "gpt2"),
    (hf_util.tiny_bloom_config, "bloom"),
    (hf_util.tiny_gpt_neox_config, "gpt_neox"),
])
def test_prefill_logits_match_hf(make_cfg, name):
    from dashinfer_tpu.loader import build_from_torch_model

    hf_cfg = make_cfg()
    model = hf_util.make_torch_model(hf_cfg)
    cfg, params = build_from_torch_model(model, hf_cfg.to_dict(), "float32")

    rng = np.random.RandomState(0)
    input_ids = rng.randint(1, hf_cfg.vocab_size, size=12).tolist()
    golden = hf_util.hf_full_logits(model, input_ids)        # [T, V]

    prefill_logits, _, _ = _run_prefill_decode(cfg, params, input_ids, 1)
    assert np.argmax(prefill_logits) == np.argmax(golden[-1])
    np.testing.assert_allclose(prefill_logits, golden[-1], rtol=6e-3, atol=6e-3)


def test_greedy_decode_matches_hf():
    from dashinfer_tpu.loader import build_from_torch_model

    hf_cfg = hf_util.tiny_qwen2_config()
    model = hf_util.make_torch_model(hf_cfg)
    cfg, params = build_from_torch_model(model, hf_cfg.to_dict(), "float32")

    rng = np.random.RandomState(1)
    input_ids = rng.randint(1, hf_cfg.vocab_size, size=9).tolist()
    n_new = 8
    golden = hf_util.hf_greedy_tokens(model, input_ids, n_new)

    _, _, ours = _run_prefill_decode(cfg, params, input_ids, n_new)
    assert ours == golden


def test_tied_embeddings():
    from dashinfer_tpu.loader import build_from_torch_model

    hf_cfg = hf_util.tiny_qwen2_config(tie=True)
    model = hf_util.make_torch_model(hf_cfg)
    cfg, params = build_from_torch_model(model, hf_cfg.to_dict(), "float32")
    assert cfg.tie_word_embeddings and "lm_head" not in params

    rng = np.random.RandomState(2)
    input_ids = rng.randint(1, hf_cfg.vocab_size, size=7).tolist()
    golden = hf_util.hf_full_logits(model, input_ids)
    prefill_logits, _, _ = _run_prefill_decode(cfg, params, input_ids, 1)
    assert np.argmax(prefill_logits) == np.argmax(golden[-1])
    np.testing.assert_allclose(prefill_logits, golden[-1], rtol=6e-3, atol=6e-3)


@pytest.mark.parametrize("make_cfg,name", [
    (hf_util.tiny_gpt2_config, "gpt2"),
    (hf_util.tiny_bloom_config, "bloom"),
    (hf_util.tiny_gpt_neox_config, "gpt_neox"),
])
def test_gpt_family_greedy_decode_matches_hf(make_cfg, name):
    """Decode-path parity for the GPT families (ALiBi / learned positions /
    parallel residual; reference registry gpt2/bloom/dolly,
    csrc/core/model/*.cpp)."""
    from dashinfer_tpu.loader import build_from_torch_model

    hf_cfg = make_cfg()
    model = hf_util.make_torch_model(hf_cfg)
    cfg, params = build_from_torch_model(model, hf_cfg.to_dict(), "float32")
    rng = np.random.RandomState(4)
    ids = rng.randint(1, hf_cfg.vocab_size, size=9).tolist()
    golden = hf_util.hf_greedy_tokens(model, ids, 6)
    _, _, toks = _run_prefill_decode(cfg, params, ids, 6)
    assert toks == golden, (name, toks, golden)
