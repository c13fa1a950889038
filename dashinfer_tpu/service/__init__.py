"""Multi-process serving service: engine daemon + client.

Re-design of the reference's multi-NUMA service layer (SURVEY.md §2.17):
a gRPC daemon (`AllSparkServiceImpl`) wraps a full engine and mirrors the
whole AsEngine API including ResultQueue ops by request UUID
(csrc/service/allspark_service.proto:11-78), consumed by `AsClientEngine`.

On TPU the analog is one engine process per host (the process owns the
chip(s) via the JAX runtime) with a lightweight line-JSON TCP control plane:
`EngineDaemon` serves the engine API; `ClientEngine` + `ClientResultQueue`
mirror the in-process `Engine`/`ResultQueue` surface so callers can switch
between in-process and remote engines without code changes.
"""

from dashinfer_tpu.service.client import ClientEngine, ClientResultQueue
from dashinfer_tpu.service.daemon import EngineDaemon

__all__ = ["EngineDaemon", "ClientEngine", "ClientResultQueue"]
