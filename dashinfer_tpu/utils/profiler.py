"""Profiling & tracing.

Reference (SURVEY.md §5.1): NVTX `Tracer` ranges + `ModelProfiler` op-level
min/max/sum stats gated by AS_PROFILE, phase timing logs via ALLSPARK_TIME_LOG,
surfaced through GetOpProfilingInfo (allspark.h:642).

TPU mapping: whole phases are single XLA programs, so "op-level" granularity
becomes PHASE-level (prefill[bucket] / decode / host-sections), plus the jax
profiler (tensorboard trace) for intra-program kernel timing:
  * PhaseProfiler — always-cheap wall-clock aggregation per phase, enabled by
    DI_PROFILE; per-phase log lines with DI_TIME_LOG.
  * trace(path) — wraps jax.profiler.trace for device-level kernel profiles.
"""

import contextlib
import threading
import time
from typing import Dict, Optional

from dashinfer_tpu.utils.env import EnvConfig
from dashinfer_tpu.utils.logging import get_logger

logger = get_logger("profiler")


class _PhaseStat:
    __slots__ = ("count", "total_s", "min_s", "max_s")

    def __init__(self):
        self.count = 0
        self.total_s = 0.0
        self.min_s = float("inf")
        self.max_s = 0.0

    def add(self, dt: float):
        self.count += 1
        self.total_s += dt
        self.min_s = min(self.min_s, dt)
        self.max_s = max(self.max_s, dt)

    def as_dict(self) -> Dict:
        if not self.count:
            return {}
        return {"count": self.count, "total_ms": self.total_s * 1e3,
                "mean_ms": self.total_s / self.count * 1e3,
                "min_ms": self.min_s * 1e3, "max_ms": self.max_s * 1e3}


class PhaseProfiler:
    """Per-model phase profiler (reference ModelProfiler,
    utility/model_profiler.h:34+)."""

    def __init__(self, name: str):
        self.name = name
        self.enabled = EnvConfig.profile()
        self.time_log = EnvConfig.time_log()
        self._stats: Dict[str, _PhaseStat] = {}
        self._lock = threading.Lock()

    @contextlib.contextmanager
    def phase(self, phase_name: str):
        if not (self.enabled or self.time_log):
            yield
            return
        t0 = time.monotonic()
        try:
            yield
        finally:
            dt = time.monotonic() - t0
            if self.time_log:
                logger.info("[%s] %s: %.2f ms", self.name, phase_name,
                            dt * 1e3)
            if self.enabled:
                with self._lock:
                    self._stats.setdefault(phase_name, _PhaseStat()).add(dt)

    def report(self) -> Dict[str, Dict]:
        """GetOpProfilingInfo equivalent."""
        with self._lock:
            return {k: v.as_dict() for k, v in self._stats.items()}

    def reset(self):
        with self._lock:
            self._stats.clear()


@contextlib.contextmanager
def trace(log_dir: str):
    """Device-level kernel trace (tensorboard format). The TPU analog of the
    reference's NVTX/nsys hooks (device/cuda/gpu_profiler.h:13-76)."""
    import jax
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
