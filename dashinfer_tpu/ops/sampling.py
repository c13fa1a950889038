"""Batched in-device sampler.

Rebuilds the reference's GenerateOp pipeline (generate_op.cpp:472-654 +
kernels process_id.cu, topk_radix/, topp/, sample.cu — SURVEY.md §2.7, §8.1):
logits -> repetition/presence/frequency penalties -> min-length stop-token
suppression -> temperature -> top-k -> top-p -> categorical sample ->
optional logprobs. All per-request knobs are device arrays (SamplingParams),
so one fused jitted pass samples the whole batch.

TPU decisions:
  * top-k uses a STATIC k = max_top_k (reference caps k at 1024,
    generate_op.cpp:383-391); per-request k masks within that window. top-p
    filters inside the top-k window (same approximation as the reference's
    radix-topk -> topp chain).
  * RNG is counter-based: key = fold_in(PRNGKey(seed_b), step_b) — per
    request AND per step, so replicated sampling on every model shard is
    deterministic (the reference instead broadcasts rank-0 tokens via NCCL,
    generate_op.cpp:606-637 — unnecessary here).
"""

import functools
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from dashinfer_tpu.runtime.batch_state import SamplingParams

_NEG = -1e30


class SampleOutput(NamedTuple):
    tokens: jnp.ndarray                 # [B] i32
    token_logprobs: Optional[jnp.ndarray]   # [B] f32 or None
    top_ids: Optional[jnp.ndarray]          # [B, n] i32 or None
    top_logprobs: Optional[jnp.ndarray]     # [B, n] f32 or None


def device_banned_mask(history: jnp.ndarray, lens: jnp.ndarray,
                       bad_words: jnp.ndarray, ngram_n: jnp.ndarray,
                       vocab: int, max_ngram: int) -> jnp.ndarray:
    """On-device bad-words + no-repeat-ngram ban mask — TPU analog of the
    reference's device-side process_id kernels (csrc/core/kernel/cuda/
    process_id.cu; SURVEY.md §2.7): no per-step host sync, so banned
    requests keep double-buffering and multi-step decode windows.

    history: [B, T] i32 prompt+generated ids (-1 pad); lens: [B] tokens in
    history; bad_words: [B, MW, WL] RIGHT-ALIGNED words (-1 pad; last col
    is the banned token, the preceding cols are the required context tail);
    ngram_n: [B] no_repeat_ngram_size (0 = off). Returns [B, vocab] bool
    (True = ban). Semantics mirror the host oracle
    (engine/model_runtime._banned_ids), which unit tests enforce."""
    B, T = history.shape
    b_col = jnp.arange(B)[:, None]
    mask = jnp.zeros((B, vocab), jnp.int32)

    # bad words: word w of length m is triggered when the last m-1 history
    # tokens equal w[:-1] (right-aligned -1 cols are wildcards — shorter
    # words need less context; single-token words are always banned)
    MW, WL = bad_words.shape[1], bad_words.shape[2]
    if MW > 0 and WL > 0:
        m = WL - 1
        if m > 0:
            pos = lens[:, None] - m + jnp.arange(m)[None, :]        # [B, m]
            tail = jnp.where(pos >= 0,
                             history[b_col, jnp.clip(pos, 0, T - 1)], -2)
            prefix = bad_words[:, :, :m]                            # [B,MW,m]
            match = jnp.all((prefix == -1) | (prefix == tail[:, None, :]),
                            axis=-1)                                # [B, MW]
        else:
            match = jnp.ones((B, MW), bool)
        last = bad_words[:, :, -1]                                  # [B, MW]
        match = match & (last >= 0)
        mask = mask.at[b_col, jnp.clip(last, 0, vocab - 1)].max(
            match.astype(jnp.int32))

    # no-repeat-ngram: ban history[i+n-1] wherever history[i:i+n-1] equals
    # the current (n-1)-token tail (host oracle: _banned_ids)
    NG = max_ngram
    if NG > 0:
        m = jnp.clip(ngram_n - 1, 0, NG - 1)                        # [B]
        i = jnp.arange(T)[None, :]                                  # [1, T]
        eq = jnp.ones((B, T), bool)
        for k in range(NG - 1):
            tgt_pos = lens - m + k                                  # [B]
            tgt = jnp.where(
                (k < m) & (tgt_pos >= 0),
                history[jnp.arange(B), jnp.clip(tgt_pos, 0, T - 1)], -2)
            src = jnp.where(i + k < T,
                            history[b_col, jnp.clip(i + k, 0, T - 1)], -3)
            eq = eq & ((k >= m[:, None]) | (src == tgt[:, None]))
        ban_pos = i + m[:, None]                                    # [B, T]
        banned_tok = history[b_col, jnp.clip(ban_pos, 0, T - 1)]
        valid = ((ngram_n[:, None] > 0) & eq &
                 (ban_pos < lens[:, None]) & (banned_tok >= 0))
        mask = mask.at[b_col, jnp.clip(banned_tok, 0, vocab - 1)].max(
            valid.astype(jnp.int32))
    return mask > 0


def process_logits(logits: jnp.ndarray, sp: SamplingParams,
                   token_counts: jnp.ndarray,
                   gen_lens: jnp.ndarray,
                   banned: Optional[jnp.ndarray] = None,
                   banned_mask: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """Apply penalties + min-length stop suppression + bad-word bans
    (reference process_logits_launcher, generate_op.cpp:238-312; bad-words
    and ngram bans ride the same mask)."""
    counts = token_counts.astype(jnp.float32)
    appeared = counts > 0
    rp = sp.repetition_penalty[:, None]
    logits = jnp.where(appeared, jnp.where(logits > 0, logits / rp, logits * rp),
                       logits)
    logits = logits - sp.presence_penalty[:, None] * appeared.astype(jnp.float32)
    logits = logits - sp.frequency_penalty[:, None] * counts

    # min-length: scatter-min -inf onto the request's stop tokens; .min is
    # duplicate-safe (padding entries write +inf = no-op)
    ban = gen_lens < sp.min_gen_len                         # [B]
    ids = sp.stop_token_ids                                 # [B, MAX_STOP]
    valid = ids >= 0
    safe_ids = jnp.maximum(ids, 0)
    upd = jnp.where(ban[:, None] & valid, _NEG, jnp.inf)
    b_idx = jnp.arange(logits.shape[0])[:, None]
    logits = logits.at[b_idx, safe_ids].min(upd)

    # banned next tokens this step (single/multi-token bad_words_ids +
    # no_repeat_ngram, host-computed; -1 = unused slot)
    if banned is not None:
        bvalid = banned >= 0
        bsafe = jnp.maximum(banned, 0)
        bupd = jnp.where(bvalid, _NEG, jnp.inf)
        logits = logits.at[b_idx, bsafe].min(bupd)
    # full [B, V] mask from the on-device banned computation
    # (device_banned_mask) — True entries are suppressed
    if banned_mask is not None:
        logits = jnp.where(banned_mask, _NEG, logits)
    return logits


def sample(logits: jnp.ndarray, sp: SamplingParams, token_counts: jnp.ndarray,
           gen_lens: jnp.ndarray, steps: jnp.ndarray, *, max_top_k: int,
           top_logprobs: int = 0,
           banned: Optional[jnp.ndarray] = None,
           banned_mask: Optional[jnp.ndarray] = None,
           exact_topk: bool = False) -> SampleOutput:
    """logits: [B, V] f32 raw model output; steps: [B] i32 sampling step
    (= sequence position) feeding the counter-based RNG.

    Top-k extraction uses `lax.approx_max_k` by default: XLA's exact top_k
    lowers to a full [B, V] sort on TPU (measured 29 ms at B=32 over a 152k
    vocab — half the decode step), while approx_max_k is a single binned
    pass that ALWAYS returns the true maximum (greedy decoding is exact;
    only far ranks of the sampling window can be displaced). Set
    `exact_topk` (RuntimeConfig.sampler_exact_topk) for the reference's
    radix-exact semantics."""
    B, V = logits.shape
    logits = process_logits(logits, sp, token_counts, gen_lens, banned,
                            banned_mask)

    temp = jnp.maximum(sp.temperature, 1e-5)[:, None]
    scaled = logits / temp

    K = min(max_top_k, V)
    if exact_topk or K >= V:
        vals, idx = jax.lax.top_k(scaled, K)                # [B, K] desc
    else:
        vals, idx = jax.lax.approx_max_k(scaled, K, recall_target=0.95)
    rank = jnp.arange(K, dtype=jnp.int32)[None, :]
    k_eff = jnp.where(sp.top_k == 0, K, jnp.minimum(sp.top_k, K))[:, None]
    vals = jnp.where(rank < k_eff, vals, _NEG)

    # top-p inside the top-k window
    probs = jax.nn.softmax(vals, axis=-1)
    cum = jnp.cumsum(probs, axis=-1)
    keep = (cum - probs) < sp.top_p[:, None]                # first always kept
    vals = jnp.where(keep, vals, _NEG)

    def per_row_gumbel(seed, step):
        key = jax.random.fold_in(jax.random.PRNGKey(seed), step)
        return jax.random.gumbel(key, (K,), jnp.float32)

    gumbel = jax.vmap(per_row_gumbel)(sp.seed, steps)
    choice = jnp.argmax(vals + gumbel, axis=-1)             # [B]
    tokens = jnp.take_along_axis(idx, choice[:, None], axis=1)[:, 0]

    if top_logprobs > 0:
        lp_full = jax.nn.log_softmax(scaled, axis=-1)
        token_lp = jnp.take_along_axis(lp_full, tokens[:, None], axis=1)[:, 0]
        top_lp, top_ids = jax.lax.top_k(lp_full, top_logprobs)
        return SampleOutput(tokens.astype(jnp.int32), token_lp, top_ids, top_lp)
    return SampleOutput(tokens.astype(jnp.int32), None, None, None)
