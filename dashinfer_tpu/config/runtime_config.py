"""Engine runtime configuration.

Equivalent of the reference's `AsModelConfig` (csrc/interface/allspark.h:167-265)
and its fluent Python builder `AsModelRuntimeConfigBuilder`
(python/pyhie/allspark/runtime_config.py:21-257), re-shaped for TPU:
device lists / NUMA knobs become a mesh shape; prefill-mode enum becomes a
kernel choice; BFC ratios become an HBM plan.
"""

import dataclasses
import enum
from typing import Optional, Tuple


class CacheMode(str, enum.Enum):
    """KV-cache storage mode (reference AsCacheMode, allspark.h:73-77)."""

    DEFAULT = "default"  # model dtype (bf16)
    INT8 = "int8"        # asymmetric per-token-per-head int8
    UINT4 = "uint4"      # asymmetric per-token-per-head uint4 (packed)


class EvictionStrategy(str, enum.Enum):
    """Victim choice on cache OOM (reference as_engine_decode.cpp:112-169)."""

    MAX_LENGTH = "max_length"
    RANDOM = "random"


class SchedulingStrategy(str, enum.Enum):
    """Prefill scheduling (reference as_engine_prefill.cpp:149-186)."""

    CONTEXT_PRIORITY = "context_priority"  # prefill until nothing fits
    BALANCE = "balance"                    # one prefill per engine turn


@dataclasses.dataclass(frozen=True)
class CacheConfig:
    """Paged ("span") KV-cache config (reference SpanCacheConfig,
    csrc/common/engine_runtime.h:42-318; span size {16,32,64,128} default 128,
    allspark.h:176,199)."""

    page_size: int = 64          # tokens per page. The reference allows
    # {16,32,64,128} (allspark.h:176,199); TPU adds 256/512 — big pages cut
    # per-page DMA descriptor count, the dominant decode-attention cost.
    mode: CacheMode = CacheMode.DEFAULT
    # total pages in the pool; 0 = size from HBM plan at warmup
    num_pages: int = 0

    def __post_init__(self):
        assert self.page_size in (8, 16, 32, 64, 128, 256, 512), \
            self.page_size


@dataclasses.dataclass(frozen=True)
class QuantConfig:
    """Weight quantization settings (reference python quantization.py:13-80:
    InstantQuant / GPTQ; modes A16W8, A16W4, A8W8)."""

    mode: str = "none"           # none | a16w8 | a16w4 | a8w8 | fp8a8w8
    group_size: int = -1          # -1 = per-channel; else sub-channel group
    # which weights to quantize, regex on param path (reference GroupSettings)
    include: str = r".*(q_proj|k_proj|v_proj|o_proj|gate_proj|up_proj|down_proj).*"


@dataclasses.dataclass(frozen=True)
class RuntimeConfig:
    model_name: str = "model"
    # engine limits (reference AsModelConfig engine_max_length/engine_max_batch)
    max_length: int = 2048
    max_batch: int = 16
    # max prompt tokens prefilled per step (0 = no chunking, like reference
    # which rejects chunked prefill: as_engine.cpp:439-443). When >0 we DO
    # support chunked prefill (improvement over reference).
    max_prefill_chunk: int = 0

    dtype: str = "bfloat16"
    cache: CacheConfig = CacheConfig()
    quant: QuantConfig = QuantConfig()

    eviction_strategy: EvictionStrategy = EvictionStrategy.MAX_LENGTH
    scheduling_strategy: SchedulingStrategy = SchedulingStrategy.CONTEXT_PRIORITY
    # CONTEXT_PRIORITY bound: at most this many consecutive prefill
    # admissions between decode ticks (0 = unbounded, the reference's
    # "prefill until no more fits" — as_engine_prefill.cpp:149-186). A
    # bounded value keeps decode cadence during prefill bursts on a
    # single-stream device: a burst of 32 XLA prefills must not freeze
    # every running stream for its whole duration.
    max_prefills_per_tick: int = 4

    enable_prefix_cache: bool = False
    prefix_cache_ttl_s: float = 300.0   # reference default (allspark.h:201,255)
    # "auto" = native C++ unless a host tier needs the device pager;
    # "python" forced for lockstep multi-host (TTL decisions must accept
    # the leader's replicated clock — docs/multihost.md)
    prefix_cache_impl: str = "auto"
    # host-RAM prefix-cache tier capacity in bytes (0 = disabled)
    prefix_cache_host_bytes: int = 0

    # parallelism: data-parallel x model(tensor)-parallel mesh
    mesh_shape: Tuple[int, int] = (1, 1)  # (data, model)
    # MoE expert-parallel split over the model axis instead of TP within
    # experts (reference converter flag use_ep -> EPSPLIT,
    # qwen_v20_moe.py:68,177-179; weight_splitter.cpp:856-959)
    use_ep: bool = False

    # prefill length buckets are powers of two between these bounds
    min_prefill_bucket: int = 32

    # MoE prefill-megakernel bucket cap: the dense-all-experts kernel wins
    # on weight streaming at small buckets but pays an all-experts FLOP
    # tax that grows with tokens; buckets above this cap take the XLA
    # path (capacity-bucketed grouped matmul, ops/moe.py). 0 disables the
    # MoE prefill megakernel entirely.
    moe_prefill_mega_max_bucket: int = 1024

    # hard admission cap on PROMPT length (reference
    # engine_max_prefill_length, as_engine.cpp:439-443 — there it gates
    # chunking; here it is a start_request-time reject). 0 = prompts may
    # be up to max_length-1. Setting it also lets auto weight_residency
    # prove the prefill megakernel covers every admissible prompt.
    max_prompt_len: int = 0

    # expected steady-state sequence length (prompt + generation) of the
    # workload, used to cross-check the KV pool plan at install: when set
    # (> 0) and the pool cannot hold max_batch concurrent sequences of
    # this length, admission is capped at the supported concurrency
    # instead of serving through OOM-eviction churn (reference adaptive
    # span-count calc, as_engine.cpp:602-647). 0 = no cap.
    typical_seq_len: int = 0

    # sampler static limits
    sampler_max_top_k: int = 128   # reference caps k at 1024 (generate_op.cpp:383-391)
    # exact radix-style top-k (XLA full sort, ~29 ms/step at B=32 on a 152k
    # vocab) vs approx_max_k (single binned pass; true max always exact, so
    # greedy is unaffected). Default approximate.
    sampler_exact_topk: bool = False
    max_top_logprobs: int = 10     # reference max 10 (device_context.h:182)
    max_stop_token_ids: int = 8
    # cap on per-step banned next-tokens (bad_words_ids / no_repeat_ngram)
    max_banned_tokens: int = 32
    # on-device bad-words/ngram banning (reference process_id.cu keeps
    # these on device too): requests whose bad_words fit [max_bad_words x
    # max_bad_word_len] and whose no_repeat_ngram_size <= max_ngram are
    # enforced in-graph from the device token history — no per-step host
    # sync, multi-step decode windows stay enabled. Oversized requests
    # fall back to the synchronous host-computed banned channel.
    max_bad_words: int = 8
    max_bad_word_len: int = 4
    max_ngram: int = 8

    # LoRA serving limits (reference lora_max_num/lora_max_rank)
    enable_lora: bool = False
    lora_max_num: int = 4
    lora_max_rank: int = 16

    # memory planning
    hbm_bytes: int = 0             # 0 = probe / assume 16 GiB per chip
    kv_pool_bytes: int = 0         # explicit KV pool override

    # weight residency (reference: ONE weight set shared across prefill
    # and decode workers, engine_worker.cpp:103-117). With the megakernel
    # pack installed, the raw quantized params are a SECOND weight set
    # that only the XLA fallback paths read; at 7B on a 16 GiB chip the
    # two together leave almost no KV pool. "pack_only" demotes the raw
    # params to host RAM and serves exclusively through the decode +
    # prefill megakernels (prefix cache, chunked prefill, LoRA and
    # multimodal prefill become unavailable; prompts must fit the prefill
    # megakernel buckets). "auto" picks pack_only only when the
    # both-resident pool could not hold the configured typical_seq_len
    # workload. "both" always keeps both sets resident.
    weight_residency: str = "auto"   # auto | both | pack_only

    # json/guided decoding vocabulary (token string map) set by loader
    enable_json_mode: bool = False

    # whole-model decode megakernel fast path (auto-disabled when the
    # architecture/quant combination is unsupported)
    enable_megakernel: bool = True

    # decode steps fused into one jitted launch (lax.scan): amortizes the
    # per-launch host dispatch (~6 ms through the TPU runtime tunnel) at the
    # cost of streaming granularity. Requests using per-token host features
    # (guided JSON, bad words, logprobs, LoRA) or within N tokens of their
    # length limit transparently fall back to single-step launches.
    decode_steps_per_launch: int = 1

    def __post_init__(self):
        assert self.max_batch >= 1
        assert self.max_length >= 2

    @property
    def max_pages_per_seq(self) -> int:
        ps = self.cache.page_size
        return (self.max_length + ps - 1) // ps


class RuntimeConfigBuilder:
    """Fluent builder mirroring AsModelRuntimeConfigBuilder
    (python/pyhie/allspark/runtime_config.py:21-257)."""

    def __init__(self, model_name: str = "model"):
        self._kw = {"model_name": model_name}
        self._cache_kw = {}
        self._quant_kw = {}

    def model_name(self, name: str) -> "RuntimeConfigBuilder":
        self._kw["model_name"] = name
        return self

    def max_length(self, n: int) -> "RuntimeConfigBuilder":
        self._kw["max_length"] = n
        return self

    def max_batch(self, n: int) -> "RuntimeConfigBuilder":
        self._kw["max_batch"] = n
        return self

    def dtype(self, dt: str) -> "RuntimeConfigBuilder":
        self._kw["dtype"] = dt
        return self

    def kv_cache_mode(self, mode: CacheMode) -> "RuntimeConfigBuilder":
        self._cache_kw["mode"] = mode
        return self

    def kv_cache_page_size(self, n: int) -> "RuntimeConfigBuilder":
        self._cache_kw["page_size"] = n
        return self

    def kv_cache_num_pages(self, n: int) -> "RuntimeConfigBuilder":
        self._cache_kw["num_pages"] = n
        return self

    def prefix_cache(self, enable: bool = True, ttl_s: float = 300.0,
                     host_bytes: int = 0) -> "RuntimeConfigBuilder":
        self._kw["enable_prefix_cache"] = enable
        self._kw["prefix_cache_ttl_s"] = ttl_s
        self._kw["prefix_cache_host_bytes"] = host_bytes
        return self

    def weight_quant(self, mode: str, group_size: int = -1) -> "RuntimeConfigBuilder":
        self._quant_kw["mode"] = mode
        self._quant_kw["group_size"] = group_size
        return self

    def mesh(self, data: int = 1, model: int = 1,
             use_ep: bool = False) -> "RuntimeConfigBuilder":
        self._kw["mesh_shape"] = (data, model)
        self._kw["use_ep"] = use_ep
        return self

    def eviction_strategy(self, s: EvictionStrategy) -> "RuntimeConfigBuilder":
        self._kw["eviction_strategy"] = s
        return self

    def scheduling_strategy(self, s: SchedulingStrategy) -> "RuntimeConfigBuilder":
        self._kw["scheduling_strategy"] = s
        return self

    def lora(self, enable: bool = True, max_num: int = 4,
             max_rank: int = 16) -> "RuntimeConfigBuilder":
        self._kw["enable_lora"] = enable
        self._kw["lora_max_num"] = max_num
        self._kw["lora_max_rank"] = max_rank
        return self

    def update(self, d: dict) -> "RuntimeConfigBuilder":
        self._kw.update(d)
        return self

    def build(self) -> RuntimeConfig:
        kw = dict(self._kw)
        if self._cache_kw:
            kw["cache"] = CacheConfig(**self._cache_kw)
        if self._quant_kw:
            kw["quant"] = QuantConfig(**self._quant_kw)
        return RuntimeConfig(**kw)
