"""dashinfer_tpu — a TPU-native LLM inference engine.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
modelscope/dash-infer (the "AllSpark" engine): continuous batching with
paged ("span") KV cache, int8/uint4 KV quantization, InstantQuant/GPTQ
weight-only quantization fused into Pallas matmul kernels, prefix caching
with an HBM<->host-RAM tier, guided decoding, multi-LoRA, and an
OpenAI-compatible server — scaling over a `jax.sharding.Mesh`.

Architecture notes (vs the reference, see SURVEY.md):
  * The reference's protobuf graph IR + C++ op interpreter dissolves into
    jitted pure-JAX model functions (SURVEY.md §1 "key structural fact").
  * NCCL cliques / weight splitters dissolve into NamedSharding over a Mesh.
  * The BFC allocator dissolves into XLA's arena; only the KV page pool is
    explicitly managed (as one preallocated sharded array per model).
  * The three-thread reactor engine (csrc/common/as_engine.cpp:1310-1326)
    becomes a single scheduler loop dispatching async jitted steps on the
    single logical TPU stream, plus a control-message queue.
"""

from dashinfer_tpu.version import __version__

from dashinfer_tpu.config import (
    CacheConfig,
    CacheMode,
    GenerationConfig,
    ModelConfig,
    RuntimeConfig,
    RuntimeConfigBuilder,
)
from dashinfer_tpu.engine.engine import Engine
from dashinfer_tpu.runtime.request import GenerateRequestStatus, RequestHandle
from dashinfer_tpu.runtime.result_queue import ResultQueue

__all__ = [
    "__version__",
    "CacheConfig",
    "CacheMode",
    "Engine",
    "GenerationConfig",
    "GenerateRequestStatus",
    "ModelConfig",
    "RequestHandle",
    "ResultQueue",
    "RuntimeConfig",
    "RuntimeConfigBuilder",
]
