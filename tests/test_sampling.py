"""Sampler unit tests (reference tests sampling kernels numerically,
tests/cpp/kernel/...topp/topk; here: behavioral invariants)."""

import numpy as np


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
