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

from dashinfer_tpu.runtime.request import GenerateRequestStatus, new_uuid
from dashinfer_tpu.service.client import _Rpc
from dashinfer_tpu.service.daemon import EngineDaemon
from dashinfer_tpu.utils import get_logger

logger = get_logger("service.multihost")


def _check_lockstep_compatible(rt) -> None:
    """Lockstep determinism preconditions (same checks on leader and
    follower): MAX_LENGTH eviction, and the Python prefix cache (its
    TTL decisions accept the leader's replicated clock; the native C++
    cache reads the local clock)."""
    from dashinfer_tpu.config import EvictionStrategy
    if rt.rt.eviction_strategy != EvictionStrategy.MAX_LENGTH:
        raise ValueError(
            "lockstep multi-host requires the deterministic MAX_LENGTH "
            "eviction strategy (reference rejects RANDOM here too)")
    if rt.prefix_cache is not None:
        from dashinfer_tpu.runtime.prefix_cache import PrefixCacheManager
        if not isinstance(rt.prefix_cache, PrefixCacheManager):
            raise ValueError(
                "lockstep multi-host requires the Python prefix cache "
                "(native cache TTLs read the local clock)")


class FollowerDaemon(EngineDaemon):
    """EngineDaemon that additionally accepts replicated control ops
    (`apply` RPC) and applies them strictly in sequence order.

    lockstep=True (docs/multihost.md §Tick replication): the follower's
    scheduler loop runs NO admission/decode of its own — every prefill
    admission, decode tick, and TTL sweep arrives as a replicated `tick`
    op from the leader, so step boundaries are identical on all hosts.
    The tick payload carries the leader's decision (slot, pages, bucket
    crc) and clock; the follower recomputes its own deterministic decision,
    verifies it BYTE-EQUAL against the leader's, and executes. A mismatch
    increments `lockstep_divergence` in the engine stats (the follower
    must then be restarted — reference restart-the-worker posture)."""

    def __init__(self, engine, lockstep: bool = False):
        super().__init__(engine)
        self.lockstep = lockstep
        self._seq_lock = threading.Condition()
        self._next_seq = 0
        self._pending: Dict[int, Tuple[str, dict]] = {}
        # a tick whose EXECUTION failed leaves this host's device/scheduler
        # state behind the stream — consuming further ticks would silently
        # diverge; reject them until restart (reference posture: restart
        # the worker)
        self._diverged = False

    def rpc_start_model(self, name):
        self.engine.start_model(name)
        if self.lockstep:
            _check_lockstep_compatible(self.engine._models[name])
            self.engine._loops[name].lockstep_follower = True
        return True

    def rpc_tick(self, name, kind, now=None, **leader):
        """Replicated scheduler tick. Executed ON the follower's loop
        thread (ordering vs control messages), synchronously (ordering vs
        the next replicated op)."""
        rt = self.engine._models[name]
        loop = self.engine._loops[name]
        if self._diverged:
            raise RuntimeError("follower diverged; restart required")
        done = threading.Event()
        err: list = []

        def run():
            try:
                if now is not None:
                    rt.logical_now = float(now)
                if kind == "ttl":
                    if rt.prefix_cache is not None:
                        rt.prefix_cache.expire_ttl(now=float(now))
                elif kind == "prefill":
                    d = rt.prefill_decide()
                    self._verify(rt, kind, leader, d)
                    if d is not None:
                        rt.prefill_execute(d)
                elif kind == "decode":
                    d = rt.decode_decide()
                    self._verify(rt, kind, leader, d)
                    if d is not None:
                        rt.decode_execute(d)
                else:
                    raise ValueError(f"unknown tick kind {kind}")
            except Exception as e:
                err.append(e)
                logger.exception("lockstep tick %s failed", kind)
            done.set()

        loop.submit(run)
        if not done.wait(timeout=600):
            raise TimeoutError(f"lockstep tick {kind} timed out")
        if err:
            raise err[0]
        return True

    @staticmethod
    def _verify(rt, kind, leader: dict, decision) -> None:
        mine = decision.payload() if decision is not None else None
        want = {k: v for k, v in leader.items() if k != "kind"} or None
        got = None
        if mine is not None:
            got = {k: v for k, v in mine.items() if k != "kind"}
        if got != want:
            rt.stat.lockstep_divergence += 1
            logger.error("LOCKSTEP DIVERGENCE on %s tick: leader=%s mine=%s",
                         kind, want, got)

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
                    logger.exception("replicated op %d %s failed",
                                     self._next_seq, m)
                    if m == "tick" and not self._diverged:
                        # a failed TICK means this host's state is behind
                        # the stream — that IS divergence, not a client
                        # error the leader can surface. Mark it fatal and
                        # count ONE event (later ticks are rejected by the
                        # flag; counting each rejection would inflate the
                        # counter unboundedly) so check_divergence names
                        # this host.
                        self._diverged = True
                        name = (p or {}).get("name")
                        mrt = self.engine._models.get(name) if name else None
                        if mrt is not None:
                            mrt.stat.lockstep_divergence += 1
                    # non-tick control-op failures stay leader-surfaced:
                    # the leader hit the same error applying it locally
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


class LeaderDaemon(EngineDaemon):
    """Leader-side daemon: client REQUEST RPCs route through the
    MultiHostEngine so every admission/stop/release is replicated into the
    sequenced lockstep stream. (A plain EngineDaemon would admit the
    request locally only — followers would then byte-verify prefill ticks
    for a request they never received and every tick would diverge.)
    Reference analog: the gRPC daemon IS the full API mirror,
    allspark_service.cpp:86."""

    def __init__(self, engine, mh: "MultiHostEngine"):
        super().__init__(engine)
        self.mh = mh

    def rpc_start_request(self, name, input_ids, gen_cfg=None):
        if name != self.mh.name:
            raise ValueError(f"multi-host leader serves model "
                             f"{self.mh.name!r}, not {name!r}")
        handle, _ = self.mh.start_request(input_ids, gen_cfg)
        with self._lock:
            self._handles[handle.uuid] = handle
        return {"uuid": handle.uuid,
                "status": GenerateRequestStatus.Init.name}

    def rpc_stop_request(self, uuid):
        h = self._handles[uuid]
        self.mh.stop_request(h)
        return True

    def rpc_release_request(self, uuid):
        h = self._handles.pop(uuid, None)
        if h is not None:
            self.mh.release_request(h)
        return True

    def rpc_check_divergence(self):
        return self.mh.check_divergence()


class MultiHostEngine:
    """Leader-side engine wrapper: every control op is sequence-numbered,
    replicated to all followers, then applied to the local engine. The
    local engine's queues serve results (followers compute identical
    streams; the leader's copy is what clients read — reference host-0
    routing)."""

    def __init__(self, engine, followers: List[Tuple[str, int]],
                 model_name: str, lockstep: bool = False):
        self.engine = engine
        self.name = model_name
        self._rpcs = [_Rpc(h, p) for (h, p) in followers]
        self._seq = 0
        self._lock = threading.Lock()
        self.lockstep = lockstep
        if lockstep:
            self._enable_lockstep()

    def _enable_lockstep(self):
        """Wire the leader's scheduler loop to replicate every tick
        decision into the sequenced stream BEFORE executing it
        (docs/multihost.md §Tick replication). Must be called after
        engine.start_model."""
        rt = self.engine._models[self.name]
        _check_lockstep_compatible(rt)
        loop = self.engine._loops.get(self.name)
        if loop is None:
            raise RuntimeError("start_model before enabling lockstep")
        loop.decision_sink = \
            lambda op, p: self._replicate(op, name=self.name, **p)

    def _loop_call(self, fn):
        """Run fn on the scheduler loop thread and wait — lockstep control
        ops must be sequenced at the exact stream position where the
        leader applies them locally (between ticks, not concurrently)."""
        loop = self.engine._loops[self.name]
        done = threading.Event()
        box: list = []

        def run():
            try:
                box.append(fn())
            except Exception as e:
                box.append(e)
            done.set()

        loop.submit(run)
        if not done.wait(timeout=600):
            raise TimeoutError("lockstep control op timed out")
        if box and isinstance(box[0], Exception):
            raise box[0]
        return box[0] if box else None

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
        from dashinfer_tpu.config import GenerationConfig
        cfg = GenerationConfig()
        cfg.update(cfg_dict)
        if self.lockstep:
            # replicate + enqueue as ONE closure on the loop thread: the
            # op's stream position is exactly where the local enqueue
            # lands, and two racing client threads cannot interleave
            # replicate/enqueue into different orders on leader vs follower
            import time as _time
            from dashinfer_tpu.runtime.request import (Request,
                                                       RequestHandle)
            from dashinfer_tpu.runtime.result_queue import ResultQueue
            runtime = self.engine._models[self.name]
            loop = self.engine._loops[self.name]
            cfg.validate(runtime.cfg.vocab_size, runtime.rt.max_length)
            if len(input_ids) >= cfg.max_length:
                raise ValueError(
                    f"prompt length {len(input_ids)} >= max_length "
                    f"{cfg.max_length}")
            req = Request(uuid=uuid, input_ids=list(map(int, input_ids)),
                          gen_cfg=cfg)
            req.stat.arrival_time = _time.monotonic()
            rq = ResultQueue(uuid)
            runtime.register(req, rq)

            def do():
                self._replicate("start_request_pinned", name=self.name,
                                input_ids=list(map(int, input_ids)),
                                uuid=uuid, gen_cfg=cfg_dict)
                runtime.enqueue(req, rq)

            loop.submit(do)
            return RequestHandle(uuid, self.name), rq
        self._replicate("start_request_pinned", name=self.name,
                        input_ids=list(map(int, input_ids)), uuid=uuid,
                        gen_cfg=cfg_dict)
        _, handle, queue = self.engine.start_request(
            self.name, input_ids, cfg, request_uuid=uuid)
        return handle, queue

    def stop_request(self, handle):
        if self.lockstep:
            rt = self.engine._models[self.name]

            def do():
                self._replicate("stop_request", uuid=handle.uuid)
                rt.stop_request(handle.uuid)
            self._loop_call(do)
            return
        self._replicate("stop_request", uuid=handle.uuid)
        self.engine.stop_request(self.name, handle)

    def release_request(self, handle):
        if self.lockstep:
            rt = self.engine._models[self.name]

            def do():
                self._replicate("release_request", uuid=handle.uuid)
                rt.release_request(handle.uuid)
            self._loop_call(do)
            return
        self._replicate("release_request", uuid=handle.uuid)
        self.engine.release_request(self.name, handle)

    # -- divergence detection (docs/multihost.md "Failure semantics") ---------
    def check_divergence(self) -> List[Dict]:
        """Compare the leader's scheduler state digest against every
        follower's. Returns a report per follower; any entry with
        matches=False (or a non-zero lockstep_divergence counter) names a
        follower that must be restarted.

        The comparison happens at a SEQUENCE BARRIER: followers first drain
        every replicated op up to the leader's current seq (rpc wait_seq),
        then digests are read. The barrier is one-sided — the leader may
        replicate further ticks while the digests are read — so a
        mismatch on an ACTIVE stream is a prompt to re-check at
        quiescence; a mismatch on a quiesced stream (or a non-zero
        lockstep_divergence counter, which only real tick failures
        increment) is definitive."""
        rt = self.engine._models[self.name]
        with self._lock:
            seq = self._seq
        for rpc in self._rpcs:
            rpc.call("wait_seq", seq=seq, timeout_s=120.0)
        local = rt.state_digest()
        out = []
        for rpc in self._rpcs:
            st = rpc.call("engine_stats", name=self.name)
            out.append({
                "digest": st.get("state_digest"),
                "leader_digest": local,
                "matches": st.get("state_digest") == local,
                "lockstep_divergence": st.get("lockstep_divergence", 0),
            })
        return out

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


def initialize_distributed(coordinator: str, num_processes: int,
                           process_id: int) -> None:
    """Stand up the JAX multi-controller runtime: after this, every host
    sees the GLOBAL device set and `jax.sharding.Mesh(jax.devices(), ...)`
    spans the whole slice; jitted steps launched by all hosts in lockstep
    run XLA collectives over ICI/DCN (scaling-book recipe). Reference
    analog: the mpirun-launched daemon set + NCCL uniqueId plumbing
    (as_engine.cpp:246-298) — here one call replaces all of it."""
    import jax
    jax.distributed.initialize(coordinator_address=coordinator,
                               num_processes=num_processes,
                               process_id=process_id)
    logger.info("jax.distributed up: process %d/%d, %d global devices",
                process_id, num_processes, len(jax.devices()))


def main(argv=None):
    """Launch one host of a lockstep multi-host serving deployment.

    Leader (process 0) serves clients and replicates the decision stream;
    followers apply it. With --coordinator the hosts also form one global
    JAX mesh (multi-controller SPMD); without it each host runs a full
    replica (the CPU-testable configuration).

      python -m dashinfer_tpu.service.multihost --role follower \
          --model <dir> --name m --port 7040 \
          [--coordinator host:1234 --num-processes 2 --process-id 1]
      python -m dashinfer_tpu.service.multihost --role leader \
          --model <dir> --name m --port 7031 --followers host:7040 \
          [--coordinator host:1234 --num-processes 2 --process-id 0]
    """
    import argparse
    ap = argparse.ArgumentParser(description="lockstep multi-host serving")
    ap.add_argument("--role", choices=["leader", "follower"], required=True)
    ap.add_argument("--model", required=True, help="HF checkpoint dir")
    ap.add_argument("--name", default="model")
    ap.add_argument("--port", type=int, required=True)
    ap.add_argument("--host", default="127.0.0.1")
    ap.add_argument("--followers", default="",
                    help="comma-separated host:port list (leader only)")
    ap.add_argument("--coordinator", default=None,
                    help="jax.distributed coordinator address host:port")
    ap.add_argument("--num-processes", type=int, default=0)
    ap.add_argument("--process-id", type=int, default=-1)
    ap.add_argument("--max-batch", type=int, default=8)
    ap.add_argument("--max-length", type=int, default=2048)
    ap.add_argument("--quant", default="none")
    ap.add_argument("--prefix-cache", action="store_true")
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--page-size", type=int, default=0, help="0 = default")
    ap.add_argument("--num-pages", type=int, default=0, help="0 = auto")
    ap.add_argument("--min-bucket", type=int, default=0, help="0 = default")
    args = ap.parse_args(argv)

    import os
    if os.environ.get("JAX_PLATFORMS") == "cpu":
        # the axon plugin ignores the env var and would probe the TPU tunnel
        import jax
        jax.config.update("jax_platforms", "cpu")

    if args.coordinator:
        initialize_distributed(args.coordinator, args.num_processes,
                               args.process_id)

    from dashinfer_tpu import Engine, RuntimeConfigBuilder
    rtb = (RuntimeConfigBuilder(args.name)
           .max_length(args.max_length).max_batch(args.max_batch)
           .prefix_cache(args.prefix_cache).dtype(args.dtype))
    if args.page_size:
        rtb = rtb.kv_cache_page_size(args.page_size)
    if args.num_pages:
        rtb = rtb.kv_cache_num_pages(args.num_pages)
    if args.min_bucket:
        rtb = rtb.update({"min_prefill_bucket": args.min_bucket})
    if args.prefix_cache:
        # lockstep TTL decisions use the LEADER's replicated clock — only
        # the Python cache accepts it (the native C++ cache reads the local
        # clock and _check_lockstep_compatible rejects it)
        rtb = rtb.update({"prefix_cache_impl": "python"})
    if args.quant != "none":
        rtb = rtb.weight_quant(args.quant)
    engine = Engine().install_model(args.model, rtb.build())

    if args.role == "follower":
        daemon = FollowerDaemon(engine, lockstep=True)
        daemon.rpc_start_model(args.name)
        daemon.serve(args.port, args.host)
        return

    engine.start_model(args.name)
    followers = []
    for hp in filter(None, args.followers.split(",")):
        h, _, p = hp.rpartition(":")
        followers.append((h, int(p)))
    mh = MultiHostEngine(engine, followers, args.name, lockstep=True)
    # LeaderDaemon routes request RPCs through the replicated MultiHostEngine
    LeaderDaemon(engine, mh).serve(args.port, args.host)


if __name__ == "__main__":
    main()
