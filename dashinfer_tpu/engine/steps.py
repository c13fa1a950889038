"""Jitted engine step functions.

The reference walks op lists per phase (runDecoderContext for prefill,
GenerateContinueDecoder for decode — model.cpp:488-743, 1212-1431) with
per-batch Reshape before every step. On TPU the whole phase is ONE jitted
program with fixed shapes:

  prefill_step[bucket S]: model prefill + KV page writes + first-token
      sampling + slot-state initialization (the reference's StartRequest +
      runDecoderContext + gen_graph + UpdateId in one program).
  decode_step: page-table growth scatter + batched model decode + sampler +
      state bookkeeping (the reference's decode tick incl. GenerateOp and
      UpdateId/PostProcessId, SURVEY.md §8.9).

KV cache and DecodeState buffers are donated, so XLA updates them in place
across steps — the pool is allocated once and never copied.
"""

import dataclasses
import functools
from typing import Callable, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from dashinfer_tpu.config import CacheMode, ModelConfig, RuntimeConfig
from dashinfer_tpu.models import transformer
from dashinfer_tpu.ops import sampling as sampling_ops
from dashinfer_tpu.runtime.batch_state import DecodeState, SamplingParams
from dashinfer_tpu.runtime.kv_cache import KVCache


class SlotInit(NamedTuple):
    """Per-request scalars written into a slot at admission (device-side
    mirror of GenerateConfig -> BatchGencfg, generate_op.cpp:238)."""

    slot: jnp.ndarray            # i32 scalar
    temperature: jnp.ndarray     # f32 scalar
    top_k: jnp.ndarray           # i32
    top_p: jnp.ndarray           # f32
    repetition_penalty: jnp.ndarray
    presence_penalty: jnp.ndarray
    frequency_penalty: jnp.ndarray
    seed: jnp.ndarray            # u32
    min_gen_len: jnp.ndarray     # i32
    stop_token_ids: jnp.ndarray  # [MAX_STOP] i32
    lora_idx: jnp.ndarray        # i32; adapter pool slot, -1 = none
    pos_offset: jnp.ndarray      # i32; mRoPE rope delta (0 for text-only)
    # on-device banning config (all -1 / 0 when unused; ALWAYS written so
    # slot reuse cannot leak a previous occupant's bans)
    bad_words: jnp.ndarray       # [MW, WL] i32 right-aligned, -1 pad
    ngram_n: jnp.ndarray         # i32; no_repeat_ngram_size, 0 = off


def _write_slot_sampling(sp: SamplingParams, init: SlotInit) -> SamplingParams:
    s = init.slot
    return SamplingParams(
        temperature=sp.temperature.at[s].set(init.temperature),
        top_k=sp.top_k.at[s].set(init.top_k),
        top_p=sp.top_p.at[s].set(init.top_p),
        repetition_penalty=sp.repetition_penalty.at[s].set(
            init.repetition_penalty),
        presence_penalty=sp.presence_penalty.at[s].set(init.presence_penalty),
        frequency_penalty=sp.frequency_penalty.at[s].set(
            init.frequency_penalty),
        seed=sp.seed.at[s].set(init.seed),
        min_gen_len=sp.min_gen_len.at[s].set(init.min_gen_len),
        stop_token_ids=sp.stop_token_ids.at[s].set(init.stop_token_ids),
    )


def _slot_sampling_params(init: SlotInit) -> SamplingParams:
    """1-row SamplingParams for first-token sampling."""
    def one(x, dt):
        return jnp.asarray(x, dt)[None]
    return SamplingParams(
        temperature=one(init.temperature, jnp.float32),
        top_k=one(init.top_k, jnp.int32),
        top_p=one(init.top_p, jnp.float32),
        repetition_penalty=one(init.repetition_penalty, jnp.float32),
        presence_penalty=one(init.presence_penalty, jnp.float32),
        frequency_penalty=one(init.frequency_penalty, jnp.float32),
        seed=one(init.seed, jnp.uint32),
        min_gen_len=one(init.min_gen_len, jnp.int32),
        stop_token_ids=init.stop_token_ids[None],
    )


def _rope_tiles(cfg, alibi: bool, pos):
    """Full-D cos/sin tiles [len(pos), D] bf16 for the megakernel family
    (half-split rope convention, ops/rotary.py). ALiBi plans never read
    them in-kernel — identity tiles keep the call signature uniform."""
    n = pos.shape[0]
    if alibi:
        return (jnp.ones((n, cfg.head_dim), jnp.bfloat16),
                jnp.zeros((n, cfg.head_dim), jnp.bfloat16))
    from dashinfer_tpu.ops.rotary import (compute_inv_freq, rope_cos_sin,
                                          _mscale)
    inv_freq = compute_inv_freq(cfg)
    cos, sin = rope_cos_sin(pos, inv_freq, _mscale(cfg.rope_scaling))
    cos = jnp.concatenate([cos, cos], axis=-1).astype(jnp.bfloat16)
    sin = jnp.concatenate([sin, sin], axis=-1).astype(jnp.bfloat16)
    return cos, sin


def _rebuild_cache(cache: KVCache, new_pools):
    if cache.k_qparams is not None:
        return KVCache(k=new_pools[0], v=new_pools[1],
                       k_qparams=new_pools[2], v_qparams=new_pools[3])
    return KVCache(k=new_pools[0], v=new_pools[1],
                   k_qparams=None, v_qparams=None)


def _prefill_mega_forward(cfg, plan, fn, params, cache, tokens, page_row,
                          n_tokens):
    """Whole-prefill forward via the Pallas prefill megakernel
    (ops/pallas/prefill_megakernel.py). params = mega params dict with
    'prefill_packed' and 'embed'. Requires prefix_len == 0."""
    x0 = params["embed"][tokens].astype(jnp.bfloat16)
    cos, sin = _rope_tiles(cfg, plan.alibi,
                           jnp.arange(plan.S, dtype=jnp.int32))
    pools = [cache.k, cache.v]
    if cache.k_qparams is not None:
        pools += [cache.k_qparams, cache.v_qparams]
    outs = fn(params["prefill_packed"], x0, cos, sin,
              page_row * cfg.num_layers, n_tokens, *pools)
    logits = outs[0][0, :cfg.vocab_size]
    return logits, _rebuild_cache(cache, outs[1:])


def _tp_prefill_mega_forward(cfg, plan, fn, params, cache, tokens, page_row,
                             n_tokens):
    """Whole-prefill forward via the TP prefill segments
    (tp_megakernel.build_tp_prefill_fn). params holds 'tp_prefill_packed'
    (leading rank dim) + 'embed'. RoPE or ALiBi (supports_prefill_tp)."""
    x0 = params["embed"][tokens].astype(jnp.bfloat16)
    cos, sin = _rope_tiles(cfg, plan.alibi,
                           jnp.arange(plan.S, dtype=jnp.int32))
    pools = [cache.k, cache.v]
    if cache.k_qparams is not None:
        pools += [cache.k_qparams, cache.v_qparams]
    outs = fn(params["tp_prefill_packed"], x0, cos, sin,
              page_row * cfg.num_layers, n_tokens, *pools)
    logits = outs[0][0, :cfg.vocab_size]
    return logits, _rebuild_cache(cache, outs[1:])


def build_prefill_step(cfg: ModelConfig, rt: RuntimeConfig, bucket: int,
                       *, use_kernel: bool, with_logprobs: bool = False,
                       with_guided: bool = False,
                       with_lora: bool = False,
                       with_mm: bool = False,
                       mega_plan=None,
                       tp_mega=None) -> Callable:
    """Returns jitted fn(params, cache, state, tokens[S], page_row[maxPb],
    prefix_len, total_len, init: SlotInit[, allowed [V] bool]) ->
    (token, lp, cache, state). page_row holds LOGICAL page ids.

    With `mega_plan`, the model forward runs as ONE Pallas prefill
    megakernel; params must be the mega params dict ('prefill_packed' +
    'embed') and the caller guarantees prefix_len == 0 (no prefix-cache
    hit, no chunked continuation), no LoRA, no multimodal embeds."""
    mode = rt.cache.mode
    V = cfg.vocab_size
    n_lp = rt.max_top_logprobs if with_logprobs else 0
    if tp_mega is not None:
        assert not (with_lora or with_mm)
        from dashinfer_tpu.ops.pallas import tp_megakernel as _tpk
        _tp_plan, _tp_mesh = tp_mega
        _tp_pfn = _tpk.build_tp_prefill_fn(_tp_plan, _tp_mesh,
                                           cfg.vocab_size)
    elif mega_plan is not None:
        assert not (with_lora or with_mm)
        from dashinfer_tpu.ops.pallas import prefill_megakernel as _pmk
        _pmk_fn = _pmk.build_prefill_megakernel(mega_plan)

    def step(params, cache: KVCache, state: DecodeState, tokens, page_row,
             prefix_len, total_len, init: SlotInit, base_counts=None,
             allowed=None, lora_pool=None, banned=None, embeds=None,
             positions3=None, hist=None):
        if tp_mega is not None:
            logits, cache = _tp_prefill_mega_forward(
                cfg, _tp_plan, _tp_pfn, params, cache, tokens, page_row,
                total_len)
        elif mega_plan is not None:
            logits, cache = _prefill_mega_forward(
                cfg, mega_plan, _pmk_fn, params, cache, tokens, page_row,
                total_len)
        else:
            logits, cache = transformer.prefill_forward(
                cfg, params, tokens, cache, page_row, prefix_len, total_len,
                mode=mode, use_kernel=use_kernel,
                lora=lora_pool if with_lora else None,
                lora_idx=init.lora_idx if with_lora else None,
                embeds=embeds if with_mm else None,
                positions3=positions3 if with_mm else None)
        if with_guided:
            logits = jnp.where(allowed, logits, -1e30)

        # prompt token occurrence counts (penalties run over prompt+generated,
        # like the reference's max_dec_ids accounting, SURVEY.md §8.9).
        # base_counts carries earlier chunks' counts under chunked prefill.
        S = tokens.shape[0]
        num_new = total_len - prefix_len
        valid = jnp.arange(S, dtype=jnp.int32) < num_new
        if base_counts is None:
            base_counts = jnp.zeros((V,), jnp.int32)
        counts = base_counts.at[
            jnp.clip(tokens, 0, V - 1)].add(valid.astype(jnp.int32))

        sp1 = _slot_sampling_params(init)
        out = sampling_ops.sample(
            logits[None], sp1, counts[None], jnp.zeros((1,), jnp.int32),
            total_len[None], max_top_k=rt.sampler_max_top_k,
            top_logprobs=n_lp,
            banned=None if banned is None else banned[None],
            exact_topk=rt.sampler_exact_topk)
        tok = out.tokens[0]
        counts = counts.at[tok].add(1)

        s = init.slot
        maxP = state.page_tables.shape[1]
        row_padded = jnp.zeros((maxP,), jnp.int32)
        row_padded = jax.lax.dynamic_update_slice(
            row_padded, page_row, (0,))

        # token history row: full prompt ids when the caller passes `hist`
        # (the engine always does); otherwise reconstruct the suffix this
        # bucket carries — enough for callers that never use ngram bans.
        maxT = state.history.shape[1]
        if hist is None:
            hrow = jnp.full((maxT,), -1, jnp.int32)
            num_new = total_len - prefix_len
            masked = jnp.where(jnp.arange(S, dtype=jnp.int32) < num_new,
                               tokens, -1)
            off = jnp.clip(prefix_len, 0, max(maxT - S, 0))
            hrow = jax.lax.dynamic_update_slice(hrow, masked, (off,))
        else:
            hrow = hist
        # first sampled token appended at position total_len
        hrow = hrow.at[jnp.clip(total_len, 0, maxT - 1)].set(tok)

        state = DecodeState(
            token_ids=state.token_ids.at[s].set(tok),
            context_lens=state.context_lens.at[s].set(total_len),
            prompt_lens=state.prompt_lens.at[s].set(total_len),
            gen_lens=state.gen_lens.at[s].set(1),
            page_tables=state.page_tables.at[s].set(row_padded),
            active=state.active.at[s].set(True),
            token_counts=state.token_counts.at[s].set(counts),
            lora_idx=state.lora_idx.at[s].set(init.lora_idx),
            pos_offsets=state.pos_offsets.at[s].set(init.pos_offset),
            history=state.history.at[s].set(hrow),
            bad_words=state.bad_words.at[s].set(init.bad_words),
            ngram_n=state.ngram_n.at[s].set(init.ngram_n),
            sampling=_write_slot_sampling(state.sampling, init),
        )
        lp = (out.token_logprobs, out.top_ids, out.top_logprobs) \
            if with_logprobs else None
        return tok, lp, cache, state

    return jax.jit(step, donate_argnums=(1, 2))


def build_prefill_chunk_step(cfg: ModelConfig, rt: RuntimeConfig,
                             bucket: int, *, use_kernel: bool,
                             with_lora: bool = False) -> Callable:
    """KV-only prefill for an INTERMEDIATE chunk of a long prompt (chunked
    prefill — the reference scaffolds but rejects it, as_engine.cpp:439-443;
    supported here). fn(params, cache, tokens[S], page_row, prefix_len,
    total_len[, lora...]) -> cache."""
    mode = rt.cache.mode

    def step(params, cache: KVCache, tokens, page_row, prefix_len,
             total_len, lora_pool=None, lora_idx=None):
        _, cache = transformer.prefill_forward(
            cfg, params, tokens, cache, page_row, prefix_len, total_len,
            mode=mode, use_kernel=use_kernel,
            lora=lora_pool if with_lora else None,
            lora_idx=lora_idx if with_lora else None)
        return cache

    return jax.jit(step, donate_argnums=(1,))


def _megakernel_forward(cfg, plan, fn, params, state, cache, page_tables,
                        lens, lora=None):
    """One whole-model decode forward via the Pallas megakernel."""
    from dashinfer_tpu.ops.pallas import megakernel as mk
    packed = params["packed"]
    H, KH = cfg.num_heads, cfg.num_kv_heads

    x0 = params["embed"][state.token_ids].astype(jnp.bfloat16)
    cos, sin = _rope_tiles(cfg, plan.alibi, lens + state.pos_offsets)
    cosq = jnp.tile(cos, (1, H))
    sinq = jnp.tile(sin, (1, H))
    cosk = jnp.tile(cos, (1, KH))
    sink = jnp.tile(sin, (1, KH))

    sched_b, sched_p, n_sched, tgt_page = mk.build_schedule(
        page_tables, lens, state.active, plan.ps,
        chunk=getattr(plan, "page_chunk", 1))
    pools = [cache.k, cache.v]
    if cache.k_qparams is not None:
        pools += [cache.k_qparams, cache.v_qparams]
    outs = fn(packed, x0, cosq, sinq, cosk, sink,
              page_tables, lens, state.active, tgt_page,
              sched_b, sched_p, n_sched, *pools, lora=lora)
    logits = outs[0][:, :cfg.vocab_size]
    return logits, _rebuild_cache(cache, outs[1:])


def _tp_megakernel_forward(cfg, plan, fn, params, state, cache, page_tables,
                           lens):
    """One decode forward via the TP-sharded megakernel
    (ops/pallas/tp_megakernel.py): per-layer segments + psum over the
    mesh's model axis."""
    from dashinfer_tpu.ops.pallas import megakernel as mk
    cos, sin = _rope_tiles(cfg, plan.alibi, lens + state.pos_offsets)
    x0 = params["embed"][state.token_ids].astype(jnp.bfloat16)
    sched_b, sched_p, n_sched, tgt_page = mk.build_schedule(
        page_tables, lens, state.active, plan.ps)
    pools = [cache.k, cache.v]
    if cache.k_qparams is not None:
        pools += [cache.k_qparams, cache.v_qparams]
    outs = fn(params["packed"], x0, cos, sin, page_tables, lens,
              state.active, tgt_page, sched_b, sched_p, n_sched, *pools)
    return outs[0], _rebuild_cache(cache, outs[1:])


def build_decode_step(cfg: ModelConfig, rt: RuntimeConfig,
                      *, use_kernel: bool, with_logprobs: bool = False,
                      with_guided: bool = False,
                      with_lora: bool = False,
                      with_banned: bool = False,
                      megakernel_plan=None,
                      tp_megakernel=None) -> Callable:
    """Returns jitted fn(params, cache, state, new_page_ids [B]
    [, allowed [B, V] bool]) -> (tokens [B], lp, cache, state).

    new_page_ids[b] >= 0 installs a fresh LOGICAL page for slot b at the
    page-table column the incoming token starts (host allocates when a slot
    crosses a page boundary; reference model.cpp:1480-1521).
    The guided variant masks logits to the host-computed allowed token sets
    (JSON mode; reference format_enforcer.cpp:334-357).

    When `megakernel_plan` is given (and no LoRA), the forward runs as ONE
    Pallas megakernel (ops/pallas/megakernel.py) with packed weights: params
    must then be a dict {"packed": ..., "embed": [V, hid]}."""
    mode = rt.cache.mode
    ps = rt.cache.page_size
    n_lp = rt.max_top_logprobs if with_logprobs else 0
    if tp_megakernel is not None:
        from dashinfer_tpu.ops.pallas import tp_megakernel as _tpk
        _tp_plan, _tp_mesh = tp_megakernel
        _tp_fn = _tpk.build_tp_decode_fn(_tp_plan, _tp_mesh, cfg.vocab_size)
    elif megakernel_plan is not None:
        from dashinfer_tpu.ops.pallas import megakernel as _mk
        _mega_lora_nr = rt.lora_max_num * rt.lora_max_rank \
            if with_lora else 0
        if with_lora:
            assert _mk.supports_lora_epilogue(megakernel_plan)
        _mega_fn = _mk.build_decode_megakernel(megakernel_plan,
                                               lora_nr=_mega_lora_nr)

    def step(params, cache: KVCache, state: DecodeState, new_page_ids,
             allowed=None, lora_pool=None, banned=None):
        B = state.max_batch
        lens = state.context_lens
        col = jnp.clip(lens // ps, 0, state.page_tables.shape[1] - 1)

        b_idx = jnp.arange(B, dtype=jnp.int32)
        old = state.page_tables[b_idx, col]
        vals = jnp.where(new_page_ids >= 0, new_page_ids, old)
        page_tables = state.page_tables.at[b_idx, col].set(vals)

        if with_lora:
            onehot = jax.nn.one_hot(state.lora_idx,
                                    lora_pool["scale"].shape[0],
                                    dtype=jnp.float32)
        if tp_megakernel is not None:
            logits, cache = _tp_megakernel_forward(
                cfg, tp_megakernel[0], _tp_fn, params, state, cache,
                page_tables, lens)
        elif megakernel_plan is not None:
            lora_args = None
            if with_lora:
                # dense rank-lane masks for the in-kernel LoRA epilogue:
                # lane n*R + r of slot n carries the request's adapter
                # one-hot (zeros = no adapter / pad lanes)
                R = rt.lora_max_rank
                nr = lora_pool["scale"].shape[0] * R
                NRp = -(-nr // 128) * 128
                m = jnp.repeat(onehot, R, axis=1)           # [B, nr]
                mask1 = jnp.zeros((B, NRp), jnp.float32)
                mask1 = mask1.at[:, :nr].set(m)
                lora_args = dict(lora_pool["mega"])
                lora_args["lmask1"] = mask1
                lora_args["lmask3"] = jnp.tile(mask1, (1, 3))
            logits, cache = _megakernel_forward(
                cfg, megakernel_plan, _mega_fn, params, state, cache,
                page_tables, lens, lora=lora_args)
        else:
            logits, cache = transformer.decode_forward(
                cfg, params, state.token_ids, cache, page_tables, lens,
                state.active, mode=mode, use_kernel=use_kernel,
                lora=lora_pool if with_lora else None,
                lora_onehot=onehot if with_lora else None,
                pos_offsets=state.pos_offsets,
                prompt_lens=state.prompt_lens)
        if with_guided:
            logits = jnp.where(allowed, logits, -1e30)
        # on-device bad-words/ngram mask from the slot token history
        # (reference process_id.cu keeps bans on device too) — no host sync
        bmask = None
        hlen = state.prompt_lens + state.gen_lens
        if with_banned:
            bmask = sampling_ops.device_banned_mask(
                state.history, hlen, state.bad_words, state.ngram_n,
                cfg.vocab_size, rt.max_ngram)

        out = sampling_ops.sample(
            logits, state.sampling, state.token_counts, state.gen_lens,
            lens, max_top_k=rt.sampler_max_top_k, top_logprobs=n_lp,
            banned=banned, banned_mask=bmask,
            exact_topk=rt.sampler_exact_topk)

        active = state.active
        tok = jnp.where(active, out.tokens, state.token_ids)
        inc = active.astype(jnp.int32)
        counts = state.token_counts.at[
            jnp.arange(B), jnp.clip(tok, 0, cfg.vocab_size - 1)].add(inc)
        hcol = jnp.clip(hlen, 0, state.history.shape[1] - 1)
        hold = state.history[jnp.arange(B), hcol]
        history = state.history.at[jnp.arange(B), hcol].set(
            jnp.where(active, tok, hold))

        state = DecodeState(
            token_ids=tok,
            context_lens=lens + inc,
            prompt_lens=state.prompt_lens,
            gen_lens=state.gen_lens + inc,
            page_tables=page_tables,
            active=active,
            token_counts=counts,
            lora_idx=state.lora_idx,
            pos_offsets=state.pos_offsets,
            history=history,
            bad_words=state.bad_words,
            ngram_n=state.ngram_n,
            sampling=state.sampling,
        )
        lp = (out.token_logprobs, out.top_ids, out.top_logprobs) \
            if with_logprobs else None
        return tok, lp, cache, state

    return jax.jit(step, donate_argnums=(1, 2))


def build_multi_decode_step(cfg: ModelConfig, rt: RuntimeConfig,
                            n_steps: int, *, use_kernel: bool,
                            with_banned: bool = False,
                            megakernel_plan=None,
                            tp_megakernel=None) -> Callable:
    """N decode steps in ONE jitted call (lax.scan over the single-step
    body): fn(params, cache, state, new_page_ids [N, B]) -> (tokens [N, B],
    cache, state).

    Token feedback, sampling, and state bookkeeping are already in-graph, so
    the only per-step host input is page installation — which the scheduler
    can precompute N steps ahead (page crossings are deterministic in
    context_lens; reference decode admission math model.cpp:1480-1521).
    Amortizes per-launch dispatch overhead (~6 ms through this runtime's
    tunnel) across N device steps. Feature-restricted on purpose: logprobs /
    guided JSON / bad-words / LoRA need per-token host interaction and take
    the single-step path."""
    mode = rt.cache.mode
    ps = rt.cache.page_size
    if tp_megakernel is not None:
        from dashinfer_tpu.ops.pallas import tp_megakernel as _tpk
        _tp_plan, _tp_mesh = tp_megakernel
        _tp_fn = _tpk.build_tp_decode_fn(_tp_plan, _tp_mesh, cfg.vocab_size)
    elif megakernel_plan is not None:
        from dashinfer_tpu.ops.pallas import megakernel as _mk
        _mega_fn = _mk.build_decode_megakernel(megakernel_plan)

    def one_step(params, carry, new_page_ids):
        cache, state = carry
        B = state.max_batch
        lens = state.context_lens
        col = jnp.clip(lens // ps, 0, state.page_tables.shape[1] - 1)
        b_idx = jnp.arange(B, dtype=jnp.int32)
        old = state.page_tables[b_idx, col]
        vals = jnp.where(new_page_ids >= 0, new_page_ids, old)
        page_tables = state.page_tables.at[b_idx, col].set(vals)

        if tp_megakernel is not None:
            logits, cache = _tp_megakernel_forward(
                cfg, tp_megakernel[0], _tp_fn, params, state, cache,
                page_tables, lens)
        elif megakernel_plan is not None:
            logits, cache = _megakernel_forward(
                cfg, megakernel_plan, _mega_fn, params, state, cache,
                page_tables, lens)
        else:
            logits, cache = transformer.decode_forward(
                cfg, params, state.token_ids, cache, page_tables, lens,
                state.active, mode=mode, use_kernel=use_kernel,
                pos_offsets=state.pos_offsets,
                prompt_lens=state.prompt_lens)
        bmask = None
        hlen = state.prompt_lens + state.gen_lens
        if with_banned:
            # in-graph banning makes bad-words/ngram requests eligible for
            # the multi-step window: each scanned step recomputes the mask
            # from the history the previous step appended
            bmask = sampling_ops.device_banned_mask(
                state.history, hlen, state.bad_words, state.ngram_n,
                cfg.vocab_size, rt.max_ngram)
        out = sampling_ops.sample(
            logits, state.sampling, state.token_counts, state.gen_lens,
            lens, max_top_k=rt.sampler_max_top_k, top_logprobs=0,
            banned_mask=bmask, exact_topk=rt.sampler_exact_topk)
        active = state.active
        tok = jnp.where(active, out.tokens, state.token_ids)
        inc = active.astype(jnp.int32)
        counts = state.token_counts.at[
            jnp.arange(B), jnp.clip(tok, 0, cfg.vocab_size - 1)].add(inc)
        hcol = jnp.clip(hlen, 0, state.history.shape[1] - 1)
        hold = state.history[jnp.arange(B), hcol]
        history = state.history.at[jnp.arange(B), hcol].set(
            jnp.where(active, tok, hold))
        state = DecodeState(
            token_ids=tok, context_lens=lens + inc,
            prompt_lens=state.prompt_lens, gen_lens=state.gen_lens + inc,
            page_tables=page_tables, active=active, token_counts=counts,
            lora_idx=state.lora_idx, pos_offsets=state.pos_offsets,
            history=history, bad_words=state.bad_words,
            ngram_n=state.ngram_n, sampling=state.sampling)
        return (cache, state), tok

    def step(params, cache: KVCache, state: DecodeState, new_page_ids):
        (cache, state), toks = jax.lax.scan(
            functools.partial(one_step, params), (cache, state),
            new_page_ids, length=n_steps)
        return toks, cache, state

    return jax.jit(step, donate_argnums=(1, 2))


def build_deactivate(cfg: ModelConfig, rt: RuntimeConfig) -> Callable:
    """jitted fn(state, slot_mask [B] bool) -> state with slots released."""

    def fn(state: DecodeState, slot_mask):
        return dataclasses.replace(
            state, active=jnp.where(slot_mask, False, state.active))

    return jax.jit(fn, donate_argnums=(0,))
