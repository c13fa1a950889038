"""Typed environment-variable configuration.

Mirrors the reference's `EnvVarConfig` (csrc/utility/env_config.h:15-60) and
its documented knobs (docs/sphinx/get_started/env_var_options_en.rst), with a
`DI_` prefix. Knobs kept from the reference:

  reference                     here
  ------------------------      -----------------------------
  BFC_MEM_RATIO                 DI_HBM_MEM_RATIO      (fraction of HBM the engine may plan for)
  ALLSPARK_DISABLE_WARMUP       DI_DISABLE_WARMUP
  ALLSPARK_TIME_LOG             DI_TIME_LOG           (per-phase timing logs)
  AS_PROFILE                    DI_PROFILE            (op/phase profiler)
  CPU_CACHE_RATIO               DI_HOST_CACHE_RATIO   (host-RAM prefix-cache tier share)
  ALLSPARK_USE_TORCH_SAMPLE     (n/a — sampler is deterministic counter-based PRNG)
  ALLSPARK_KVCACHE_ALLOC_SIZE   DI_KV_POOL_BYTES      (explicit KV pool size override)
  ALLSPARK_DUMP_OUTPUT_TOKEN    DI_DUMP_OUTPUT_TOKEN
"""

import os


def _get(name: str, default):
    raw = os.environ.get(name)
    if raw is None:
        return default
    if isinstance(default, bool):
        return raw.lower() in ("1", "true", "on", "yes")
    if isinstance(default, int):
        return int(raw)
    if isinstance(default, float):
        return float(raw)
    return raw


class EnvConfig:
    """Read-at-call typed env access (values may be monkeypatched in tests)."""

    @staticmethod
    def hbm_mem_ratio() -> float:
        return _get("DI_HBM_MEM_RATIO", 0.92)

    @staticmethod
    def kv_pool_bytes() -> int:
        return _get("DI_KV_POOL_BYTES", 0)

    @staticmethod
    def disable_warmup() -> bool:
        return _get("DI_DISABLE_WARMUP", False)

    @staticmethod
    def time_log() -> bool:
        return _get("DI_TIME_LOG", False)

    @staticmethod
    def profile() -> bool:
        return _get("DI_PROFILE", False)

    @staticmethod
    def host_cache_ratio() -> float:
        return _get("DI_HOST_CACHE_RATIO", 0.0)

    @staticmethod
    def dump_output_token() -> bool:
        return _get("DI_DUMP_OUTPUT_TOKEN", False)

    @staticmethod
    def kernels_enabled() -> bool:
        # DI_KERNELS=0: pure-XLA compute path even on TPU (no Pallas at
        # all) — the cross-implementation oracle for parity checks
        return _get("DI_KERNELS", "1") != "0"

    @staticmethod
    def megakernel_enabled() -> bool:
        return _get("DI_MEGAKERNEL", "1") != "0"

    @staticmethod
    def prefill_megakernel_enabled() -> bool:
        return _get("DI_PREFILL_MEGAKERNEL", "1") != "0"

    @staticmethod
    def mk_stream() -> str:
        # decode megakernel weight-stream format: "auto" (batch-aware:
        # u4 checkpoints re-expand to per-channel i8 at max_batch >=
        # DI_MK_I8_BATCH — docs/megakernel.md §i8 streaming), "u4" (never
        # re-expand), "i8" (always re-expand)
        return str(_get("DI_MK_STREAM", "auto"))

    @staticmethod
    def mk_i8_batch() -> int:
        # batch threshold for auto u4->i8 re-expansion (measured crossover
        # on v5e; see docs/megakernel.md)
        return _get("DI_MK_I8_BATCH", 24)

    @staticmethod
    def log_status_interval_s() -> float:
        # reference: HIE_LOG_STATUS_INTERVAL (as_engine.cpp:2508-2513)
        return _get("DI_LOG_STATUS_INTERVAL", 30.0)

    @staticmethod
    def weight_residency() -> str:
        # DI_WEIGHT_RESIDENCY overrides RuntimeConfig.weight_residency
        # ("auto" | "both" | "pack_only"); "" = use the config field
        return str(_get("DI_WEIGHT_RESIDENCY", ""))

    @staticmethod
    def warmup_enabled() -> bool:
        # DI_WARMUP=0 skips the AOT warmup measurement in KV-pool planning
        # (reference BFC warmup analog, as_engine.cpp:1035-1258) and falls
        # back to the analytic activation-headroom heuristic
        return _get("DI_WARMUP", "1") != "0"

    @staticmethod
    def ttl_sweep_interval_s() -> float:
        # how often the scheduler loop sweeps TTL-expired prefix-cache nodes
        # (the TTL itself is RuntimeConfig.prefix_cache_ttl_s, reference
        # default 300 s — allspark.h:201)
        return _get("DI_TTL_SWEEP_INTERVAL", 10.0)

    @staticmethod
    def compile_cache_dir() -> str:
        # persistent XLA compilation cache for the SERVING path (production
        # cold-start story): default ON under ~/.cache; DI_COMPILE_CACHE=0
        # disables, any other value overrides the directory. The reference's
        # analog is its pre-converted model artifact (model_loader.py:176)
        # — load instead of rebuild.
        import os as _os
        v = _get("DI_COMPILE_CACHE",
                 _os.path.expanduser("~/.cache/dashinfer_tpu/xla"))
        return "" if v in ("0", 0, False) else str(v)
