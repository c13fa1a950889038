"""Device-side continuous-batching state.

The reference reshapes every operator whenever the running batch changes
(csrc/core/model/model.cpp:1050-1085 FetchDecodeRequest). That is poison for
XLA (recompile per shape), so the TPU design uses FIXED max_batch decode
slots: every per-request quantity lives in a `[max_batch]` device array, and
inactive slots are masked. Admitting / finishing a request is a functional
in-place update of one slot, folded into the jitted prefill step or done via
a tiny jitted `clear_slot`.

Per-request sampling config tensors mirror the reference's `BatchGencfg`
device arrays (csrc/core/operator/generate_opt/generate_op.cpp:238-312).
"""

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp

from dashinfer_tpu.config import ModelConfig, RuntimeConfig


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class SamplingParams:
    """Per-slot generation config (device arrays, all [B] unless noted)."""

    temperature: jax.Array      # f32; 0 => greedy
    top_k: jax.Array            # i32; 0 => full vocab (top-p only), 1 => greedy
    top_p: jax.Array            # f32
    repetition_penalty: jax.Array  # f32
    presence_penalty: jax.Array    # f32
    frequency_penalty: jax.Array   # f32
    seed: jax.Array             # u32
    min_gen_len: jax.Array      # i32: suppress stop tokens before this
    stop_token_ids: jax.Array   # i32 [B, MAX_STOP]; -1 = unused


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class DecodeState:
    """All mutable per-slot state consumed by the jitted decode step."""

    token_ids: jax.Array       # i32 [B] next input token
    context_lens: jax.Array    # i32 [B] tokens currently in KV cache
    prompt_lens: jax.Array     # i32 [B]
    gen_lens: jax.Array        # i32 [B] tokens generated so far
    page_tables: jax.Array     # i32 [B, max_pages_per_seq] LOGICAL page ids
    active: jax.Array          # bool [B]
    token_counts: jax.Array    # i32 [B, vocab] occurrence counts (penalties)
    lora_idx: jax.Array        # i32 [B]; adapter pool slot, -1 = none
    pos_offsets: jax.Array     # i32 [B]; rope position delta (mRoPE), 0 = none
    # on-device token history + ban config (reference keeps max_dec_ids on
    # device and bans in process_id.cu — SURVEY.md §2.7): history holds
    # prompt+generated ids (-1 pad) so bad-words/ngram masks are computed
    # in-graph with no per-step host sync
    history: jax.Array         # i32 [B, max_length] (-1 pad)
    bad_words: jax.Array       # i32 [B, MW, WL] right-aligned, -1 pad
    ngram_n: jax.Array         # i32 [B]; no_repeat_ngram_size, 0 = off
    sampling: SamplingParams

    @property
    def max_batch(self) -> int:
        return self.token_ids.shape[0]


def make_sampling_params(max_batch: int, max_stop: int) -> SamplingParams:
    B = max_batch
    return SamplingParams(
        temperature=jnp.ones((B,), jnp.float32),
        top_k=jnp.ones((B,), jnp.int32),
        top_p=jnp.ones((B,), jnp.float32),
        repetition_penalty=jnp.ones((B,), jnp.float32),
        presence_penalty=jnp.zeros((B,), jnp.float32),
        frequency_penalty=jnp.zeros((B,), jnp.float32),
        seed=jnp.zeros((B,), jnp.uint32),
        min_gen_len=jnp.zeros((B,), jnp.int32),
        stop_token_ids=jnp.full((B, max_stop), -1, jnp.int32),
    )


def make_decode_state(model_cfg: ModelConfig, rt_cfg: RuntimeConfig) -> DecodeState:
    B = rt_cfg.max_batch
    return DecodeState(
        token_ids=jnp.zeros((B,), jnp.int32),
        context_lens=jnp.zeros((B,), jnp.int32),
        prompt_lens=jnp.zeros((B,), jnp.int32),
        gen_lens=jnp.zeros((B,), jnp.int32),
        page_tables=jnp.zeros((B, rt_cfg.max_pages_per_seq), jnp.int32),
        active=jnp.zeros((B,), jnp.bool_),
        token_counts=jnp.zeros((B, model_cfg.vocab_size), jnp.int32),
        lora_idx=jnp.full((B,), -1, jnp.int32),
        pos_offsets=jnp.zeros((B,), jnp.int32),
        history=jnp.full((B, rt_cfg.max_length), -1, jnp.int32),
        bad_words=jnp.full(
            (B, rt_cfg.max_bad_words, rt_cfg.max_bad_word_len), -1,
            jnp.int32),
        ngram_n=jnp.zeros((B,), jnp.int32),
        sampling=make_sampling_params(B, rt_cfg.max_stop_token_ids),
    )


@dataclasses.dataclass(frozen=True)
class SlotRequestConfig:
    """Host-side per-request values written into a slot at admission."""

    temperature: float
    top_k: int
    top_p: float
    repetition_penalty: float
    presence_penalty: float
    frequency_penalty: float
    seed: int
    min_gen_len: int
    stop_token_ids: tuple  # padded to MAX_STOP with -1 by caller
