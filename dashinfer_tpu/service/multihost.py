"""Multi-host serving control plane: leader/follower replication.

Reference analog: the multi-NUMA gRPC daemon (csrc/service/
allspark_service.cpp:86) — one engine process per NUMA node, requests
routed via node 0. On TPU the equivalent deployment is a multi-HOST slice:
each host owns a subset of chips of ONE global `jax.sharding.Mesh`
(multi-controller SPMD via `jax.distributed.initialize`), and every jitted
step must be entered by EVERY host with identical shapes and
scheduler-chosen indices (slot assignments, page ids, prefill buckets) or
the program hangs at the first collective. See docs/multihost.md for the
full design; the invariants this module enforces:

  1. Requests enter ONLY via the leader (host 0).
  2. Every control operation (start/stop/release request) gets a
     monotonically increasing sequence number; the leader replicates
     (seq, op) to every follower BEFORE applying it locally, and each
     follower applies ops strictly in seq order (out-of-order arrivals are
     buffered). The control stream is therefore identical on all hosts.
  3. All scheduler state transitions are pure functions of that ordered
     stream: the page allocator's free list is deterministic, slot choice
     is lowest-free-index, eviction victims are chosen by MAX_LENGTH (not
     random) when `deterministic` is set, sampling is counter-based from
     the per-request seed, and request uuids are assigned by the leader
     and pinned on followers (Engine.start_request(request_uuid=...)).

The 2-process CPU simulation (tests/test_multihost.py) runs a full replica
engine per process — the strongest determinism property that can be
validated without a multi-host slice: both processes consume the same
control stream and must emit IDENTICAL token streams per request. On real
DCN-connected hosts the same control plane drives per-host shards of one
mesh instead of full replicas; the remaining lockstep concern (decode-tick
cadence) is handled by the leader broadcasting its tick decisions in the
same stream — followers in `lockstep` mode do not run their own admission
logic (see docs/multihost.md "Tick replication").
"""

import threading
from typing import Dict, List, Optional, Tuple

from dashinfer_tpu.runtime.request import new_uuid
from dashinfer_tpu.service.client import _Rpc
from dashinfer_tpu.service.daemon import EngineDaemon
from dashinfer_tpu.utils import get_logger

logger = get_logger("service.multihost")


class FollowerDaemon(EngineDaemon):
    """EngineDaemon that additionally accepts replicated control ops
    (`apply` RPC) and applies them strictly in sequence order."""

    def __init__(self, engine):
        super().__init__(engine)
        self._seq_lock = threading.Condition()
        self._next_seq = 0
        self._pending: Dict[int, Tuple[str, dict]] = {}

    def rpc_apply(self, seq, op, params):
        """Replicated control op from the leader. Ops may arrive on
        different connections/threads; apply in seq order, buffering
        gaps."""
        with self._seq_lock:
            self._pending[int(seq)] = (op, params or {})
            while self._next_seq in self._pending:
                m, p = self._pending.pop(self._next_seq)
                try:
                    self.dispatch(m, p)
                except Exception:
                    # followers must not diverge from the leader on op
                    # failures; the leader surfaces errors to the client
                    logger.exception("replicated op %d %s failed",
                                     self._next_seq, m)
                self._next_seq += 1
            self._seq_lock.notify_all()
        return self._next_seq

    def rpc_wait_seq(self, seq, timeout_s=60.0):
        """Block until all ops below `seq` have been applied (barrier for
        tests / leader sync points)."""
        import time
        deadline = time.monotonic() + (timeout_s or 60.0)
        with self._seq_lock:
            while self._next_seq < int(seq):
                left = deadline - time.monotonic()
                if left <= 0 or not self._seq_lock.wait(timeout=left):
                    break
            return self._next_seq

    def rpc_start_request_pinned(self, name, input_ids, uuid, gen_cfg=None):
        from dashinfer_tpu.config import GenerationConfig
        cfg = GenerationConfig()
        if gen_cfg:
            cfg.update(gen_cfg)
        status, handle, _ = self.engine.start_request(
            name, input_ids, cfg, request_uuid=uuid)
        with self._lock:
            self._handles[handle.uuid] = handle
        return {"uuid": handle.uuid, "status": status.name}


class MultiHostEngine:
    """Leader-side engine wrapper: every control op is sequence-numbered,
    replicated to all followers, then applied to the local engine. The
    local engine's queues serve results (followers compute identical
    streams; the leader's copy is what clients read — reference host-0
    routing)."""

    def __init__(self, engine, followers: List[Tuple[str, int]],
                 model_name: str):
        self.engine = engine
        self.name = model_name
        self._rpcs = [_Rpc(h, p) for (h, p) in followers]
        self._seq = 0
        self._lock = threading.Lock()

    def _replicate(self, method: str, **params):
        with self._lock:
            seq = self._seq
            self._seq += 1
            # replicate BEFORE local apply: a leader crash mid-op must not
            # leave followers missing an op the leader already executed
            for rpc in self._rpcs:
                rpc.call("apply", seq=seq, op=method, params=params)
        return seq

    # -- replicated control ops ------------------------------------------------
    def start_request(self, input_ids: List[int], gen_cfg=None):
        uuid = new_uuid()
        cfg_dict = dict(gen_cfg or {})
        self._replicate("start_request_pinned", name=self.name,
                        input_ids=list(map(int, input_ids)), uuid=uuid,
                        gen_cfg=cfg_dict)
        from dashinfer_tpu.config import GenerationConfig
        cfg = GenerationConfig()
        cfg.update(cfg_dict)
        _, handle, queue = self.engine.start_request(
            self.name, input_ids, cfg, request_uuid=uuid)
        return handle, queue

    def stop_request(self, handle):
        self._replicate("stop_request", uuid=handle.uuid)
        self.engine.stop_request(self.name, handle)

    def release_request(self, handle):
        self._replicate("release_request", uuid=handle.uuid)
        self.engine.release_request(self.name, handle)

    def sync_request(self, handle, timeout_s: Optional[float] = None):
        self.engine.sync_request(self.name, handle, timeout_s=timeout_s)

    def barrier(self, timeout_s: float = 60.0) -> None:
        """Wait until every follower has applied all replicated ops."""
        with self._lock:
            seq = self._seq
        for rpc in self._rpcs:
            rpc.call("wait_seq", seq=seq, timeout_s=timeout_s)

    def close(self):
        for rpc in self._rpcs:
            rpc.close()
