"""Engine: the public serving API + control loop.

Equivalent of the reference `AsEngine`/`AsEngineImpl`
(csrc/interface/allspark.h:331-670, csrc/common/as_engine.cpp): install/
start/stop models, start/stop/release requests, streaming ResultQueues,
engine stats.

TPU re-design of the reactor: the reference runs 3 threads per model
(control / prefill / decode, as_engine.cpp:1310-1326) because each CUDA rank
needs host threads to feed it. JAX dispatch is async on a single logical
device stream, so ONE scheduler thread per model suffices: it drains control
messages, admits prefills by scheduling strategy, and runs batched decode
ticks — compute overlap comes from XLA's async dispatch, not host threads.
"""

import queue
import threading
import time
from typing import Dict, List, Optional, Tuple, Union

from dashinfer_tpu.config import (GenerationConfig, RuntimeConfig,
                                  SchedulingStrategy)
from dashinfer_tpu.engine.model_runtime import ModelRuntime
from dashinfer_tpu.runtime.request import (GenerateRequestStatus, Request,
                                           RequestHandle, new_uuid)
from dashinfer_tpu.runtime.result_queue import ResultQueue
from dashinfer_tpu.utils import EnvConfig, get_logger

logger = get_logger("engine")


class _ModelLoop:
    """Scheduler loop for one model (reference ModelControlState +
    Prefill/Decode threads collapsed into one)."""

    def __init__(self, runtime: ModelRuntime):
        self.rt = runtime
        self.msgs: "queue.Queue" = queue.Queue()
        self.wake = threading.Event()
        self.stop_flag = False
        # GracefulStop (reference as_engine.cpp:2549-2575): stop admitting,
        # drain running requests to completion, then exit the loop
        self.draining = False
        self.thread: Optional[threading.Thread] = None
        self.last_stat_log = time.monotonic()
        self.last_ttl_sweep = time.monotonic()
        # lockstep multi-host (docs/multihost.md §Tick replication):
        # decision_sink (leader) replicates every scheduler decision into
        # the sequenced control stream BEFORE the local jit launch;
        # lockstep_follower (follower) disables local admission/decode —
        # ticks arrive as replicated control messages instead
        self.decision_sink = None
        self.lockstep_follower = False

    def start(self):
        self.thread = threading.Thread(target=self._run, daemon=True,
                                       name=f"di-loop-{self.rt.name}")
        self.thread.start()

    def submit(self, fn, *args):
        self.msgs.put((fn, args))
        self.wake.set()

    def _run(self):
        rt = self.rt
        strategy = rt.rt.scheduling_strategy
        while not self.stop_flag:
            # 1. control messages
            try:
                while True:
                    fn, args = self.msgs.get_nowait()
                    try:
                        fn(*args)
                    except Exception:
                        logger.exception("control message failed")
            except queue.Empty:
                pass

            did_work = False
            # 2. prefill admission (reference scheduling strategies,
            #    as_engine_prefill.cpp:149-186); suspended while draining —
            #    GracefulStop admits nothing new (as_engine.cpp:2549)
            if self.draining:
                try:
                    while rt.pending:
                        # never-admitted requests are interrupted, running
                        # ones drain to completion below
                        req = rt.pending[0]
                        if not rt.stop_request(req.uuid) and \
                                rt.pending and rt.pending[0] is req:
                            rt.pending.popleft()
                except Exception:
                    logger.exception("drain of pending queue failed")
                if not rt.active_requests():
                    rt._drain_inflight()
                    if not rt.active_requests():
                        self.stop_flag = True
                        continue
            elif not self.lockstep_follower:
                # CONTEXT_PRIORITY admits up to max_prefills_per_tick
                # consecutive prefills, then yields to the decode tick
                # below so a prefill burst cannot starve running streams
                # (the reference runs prefill on its own thread instead,
                # as_engine.cpp:1321-1326)
                cap = rt.rt.max_prefills_per_tick \
                    if strategy == SchedulingStrategy.CONTEXT_PRIORITY else 1
                try:
                    if self.decision_sink is not None:
                        did_work |= self._lockstep_prefill(cap)
                    else:
                        n = 0
                        while (cap <= 0 or n < cap) and rt.try_prefill_one():
                            did_work = True
                            n += 1
                except Exception:
                    logger.exception("prefill scheduling failed")
                    self._fail_head()

            # 3. decode tick (lockstep followers decode only on replicated
            #    tick ops, which arrive as control messages)
            if not self.lockstep_follower:
                try:
                    if self.decision_sink is not None:
                        did_work |= self._lockstep_decode()
                    else:
                        did_work |= rt.decode_tick() > 0
                except Exception:
                    logger.exception("decode tick failed; interrupting batch")
                    for r in rt.active_requests():
                        rt.release_request(r.uuid)

            # 4. periodic stats + prefix-cache TTL sweep (reference TTLs
            #    unreferenced nodes at prefix_cache_ttl_s, default 300 s —
            #    filter_timeout_hash, prefix_cache_manager.cpp:211).
            #    Lockstep: the sweep is a replicated op carrying the
            #    leader's clock; followers never sweep on their own timer.
            now = time.monotonic()
            if rt.prefix_cache is not None and not self.lockstep_follower and \
                    now - self.last_ttl_sweep > EnvConfig.ttl_sweep_interval_s():
                try:
                    if self.decision_sink is not None:
                        self.decision_sink("tick", {"kind": "ttl", "now": now})
                        n = rt.prefix_cache.expire_ttl(now=now)
                    else:
                        n = rt.prefix_cache.expire_ttl()
                    if n:
                        logger.info("prefix cache TTL: expired %d pages", n)
                except Exception:
                    logger.exception("prefix cache TTL sweep failed")
                self.last_ttl_sweep = now
            if now - self.last_stat_log > EnvConfig.log_status_interval_s():
                rt.update_stats()
                rt.stat.tick_throughput()
                logger.info("stat: %s", rt.stat.as_dict())
                self.last_stat_log = now

            if not did_work:
                self.wake.wait(timeout=0.005)
                self.wake.clear()

    def _lockstep_prefill(self, cap: int) -> bool:
        """Leader-side admission under lockstep: decide, replicate the
        decision (with the leader clock), then execute the launch. At most
        `cap` admissions per call (0 = unbounded) — same decode-cadence
        bound as the local path."""
        rt = self.rt
        did = False
        n = 0
        while True:
            rt.logical_now = time.monotonic()
            d = rt.prefill_decide()
            if d is None:
                return did
            p = d.payload()
            p["now"] = rt.logical_now
            try:
                self.decision_sink("tick", p)
            except Exception:
                # prefill_decide already committed scheduler state (slot,
                # pages, popped from pending) — a replication failure must
                # fail THIS request and unwind that state, not fall through
                # to _fail_head (which would fail the NEW pending head and
                # strand the decided request in its slot)
                logger.exception("lockstep replication failed; failing the "
                                 "decided request %s", d.req.uuid[:8])
                rt.fail_decision(d)
                return did
            rt.prefill_execute(d)
            did = True
            n += 1
            if cap > 0 and n >= cap:
                return did

    def _lockstep_decode(self) -> bool:
        rt = self.rt
        rt.logical_now = time.monotonic()
        d = rt.decode_decide()
        if d is None:
            return False
        p = d.payload()
        p["now"] = rt.logical_now
        self.decision_sink("tick", p)
        return rt.decode_execute(d) > 0

    def _fail_head(self):
        rt = self.rt
        if rt.pending:
            req = rt.pending.popleft()
            rt.stat.pendings -= 1
            req.status = GenerateRequestStatus.InternalError
            q = rt.queues.get(req.uuid)
            if q:
                q.set_status(GenerateRequestStatus.InternalError)

    def shutdown(self, graceful: bool = False, timeout_s: float = 600.0):
        """graceful=True (reference GracefulStop, as_engine.cpp:2549-2575):
        stop admitting, interrupt never-admitted pending requests, let every
        RUNNING request decode to completion, then join. graceful=False:
        interrupt everything now."""
        if graceful and self.thread and self.thread.is_alive():
            self.draining = True
            self.wake.set()
            self.thread.join(timeout=timeout_s)
            if self.thread.is_alive():
                logger.warning("graceful stop timed out; forcing")
        self.stop_flag = True
        self.wake.set()
        if self.thread:
            self.thread.join(timeout=10)


_cc_enabled = False


def _enable_compile_cache() -> None:
    """Wire the persistent XLA compilation cache into the serving path
    (DI_COMPILE_CACHE; default ~/.cache/dashinfer_tpu/xla) so a second
    process start skips the multi-minute megakernel/bucket compiles —
    the production cold-start story (VERDICT r2 #5)."""
    global _cc_enabled
    if _cc_enabled:
        return
    _cc_enabled = True
    d = EnvConfig.compile_cache_dir()
    if not d:
        return
    try:
        import jax
        jax.config.update("jax_compilation_cache_dir", d)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
        logger.info("persistent compile cache: %s", d)
    except Exception:
        logger.exception("could not enable the persistent compile cache")


class Engine:
    """Public API (mirrors the canonical user flow, SURVEY.md §8.17)."""

    def __init__(self):
        self._models: Dict[str, ModelRuntime] = {}
        self._loops: Dict[str, _ModelLoop] = {}
        self._lock = threading.Lock()

    # -- model lifecycle ------------------------------------------------------
    def install_model(self, model, runtime_config: RuntimeConfig,
                      params=None, model_config=None, tokenizer=None):
        """model: a HF checkpoint dir path, or a name when (model_config,
        params) are given directly (reference BuildModelFromConfigStruct,
        as_engine.cpp:385). `tokenizer` enables guided (JSON) decoding
        (the reference's JSON-mode vocab plumbing, engine.py:218-243)."""
        name = runtime_config.model_name
        _enable_compile_cache()
        if params is None:
            from dashinfer_tpu.loader import build_from_hf
            model_config, params = build_from_hf(str(model),
                                                 runtime_config.dtype)
        if runtime_config.quant.mode not in ("none", ""):
            from dashinfer_tpu.loader.quantize import quantize_params
            params = quantize_params(params, runtime_config.quant)
        if model_config is not None and model_config.moe is not None:
            # one-time TILE-128 repack of u4 expert stacks whose loader
            # layout the grouped MoE kernel can't tile (no-op otherwise)
            from dashinfer_tpu.ops.pallas.grouped_quant_matmul import \
                prepare_grouped_experts
            import jax as _jax
            if _jax.default_backend() == "tpu":
                params = prepare_grouped_experts(params, model_config)
        with self._lock:
            if name in self._models:
                raise ValueError(f"model {name} already installed")
            runtime = ModelRuntime(name, model_config, params, runtime_config,
                                   tokenizer=tokenizer)
            if runtime_config.enable_prefix_cache and \
                    runtime.residency == "pack_only":
                # prefix-hit suffix prefill is an XLA path over the raw
                # params, which pack_only residency demoted to host
                logger.warning("prefix cache disabled: weight_residency="
                               "pack_only serves megakernel prefills only")
            elif runtime_config.enable_prefix_cache:
                if runtime_config.prefix_cache_host_bytes > 0 or \
                        runtime_config.prefix_cache_impl == "python":
                    # host tier needs the device pager (python impl only);
                    # lockstep multi-host forces python for the replicated
                    # clock (docs/multihost.md)
                    from dashinfer_tpu.runtime.prefix_cache import \
                        PrefixCacheManager
                    runtime.prefix_cache = PrefixCacheManager(
                        runtime.cfg, runtime_config, runtime.allocator,
                        pager=runtime.make_pager()
                        if runtime_config.prefix_cache_host_bytes > 0
                        else None)
                else:
                    from dashinfer_tpu.native import make_prefix_cache
                    runtime.prefix_cache = make_prefix_cache(
                        runtime.cfg, runtime_config, runtime.allocator)
            self._models[name] = runtime
        return self

    def start_model(self, name: str):
        with self._lock:
            if name in self._loops:
                return self
            runtime = self._models[name]
            loop = _ModelLoop(runtime)
            self._loops[name] = loop
            loop.start()
        return self

    def stop_model(self, name: str, graceful: bool = False,
                   timeout_s: float = 600.0):
        """graceful=True mirrors the reference GracefulStopModel
        (allspark.h:527, as_engine.cpp:2549-2575): new requests are
        rejected, never-admitted pending ones are interrupted, and every
        running request decodes to completion before the loop exits."""
        with self._lock:
            loop = self._loops.pop(name, None)
        if loop:
            loop.shutdown(graceful=graceful, timeout_s=timeout_s)
        return self

    def release_model(self, name: str):
        self.stop_model(name)
        with self._lock:
            self._models.pop(name, None)
        return self

    # -- requests -------------------------------------------------------------
    def start_request(self, name: str, input_ids: List[int],
                      gen_cfg: Optional[GenerationConfig] = None,
                      request_uuid: Optional[str] = None
                      ) -> Tuple[GenerateRequestStatus, RequestHandle,
                                 ResultQueue]:
        """`request_uuid` pins the request id (multi-host replication needs
        the SAME uuid on every controller, service/multihost.py); omit it
        for normal use."""
        gen_cfg = gen_cfg or GenerationConfig()
        runtime = self._models[name]
        loop = self._loops.get(name)
        if loop is None:
            raise RuntimeError(f"model {name} not started")
        gen_cfg.validate(runtime.cfg.vocab_size, runtime.rt.max_length)
        runtime.validate_request(input_ids, gen_cfg)
        if gen_cfg.lora_name is not None:
            if runtime.lora_manager is None:
                raise ValueError("lora_name given but LoRA is not enabled")
            runtime.lora_manager.index_of(gen_cfg.lora_name)  # raises if unknown
        if len(input_ids) >= gen_cfg.max_length:
            raise ValueError(
                f"prompt length {len(input_ids)} >= max_length "
                f"{gen_cfg.max_length}")
        uuid = request_uuid or new_uuid()
        req = Request(uuid=uuid, input_ids=list(map(int, input_ids)),
                      gen_cfg=gen_cfg)
        req.stat.arrival_time = time.monotonic()
        rq = ResultQueue(uuid)
        runtime.register(req, rq)
        loop.submit(runtime.enqueue, req, rq)
        handle = RequestHandle(uuid, name)
        return GenerateRequestStatus.Init, handle, rq

    def stop_request(self, name: str, handle: RequestHandle):
        runtime = self._models[name]
        loop = self._loops[name]
        done = threading.Event()
        loop.submit(lambda: (runtime.stop_request(handle.uuid), done.set()))
        done.wait(timeout=30)
        return self

    def release_request(self, name: str, handle: RequestHandle):
        runtime = self._models[name]
        loop = self._loops.get(name)
        if loop is None:
            runtime.release_request(handle.uuid)
            return self
        done = threading.Event()
        loop.submit(lambda: (runtime.release_request(handle.uuid), done.set()))
        done.wait(timeout=30)
        return self

    def sync_request(self, name: str, handle: RequestHandle,
                     timeout_s: Optional[float] = None):
        """Block until the request reaches a final state (reference
        SyncRequest, allspark.h:606)."""
        q = self._models[name].queues.get(handle.uuid)
        if q is None:
            return self
        deadline = None if timeout_s is None else time.monotonic() + timeout_s
        while q.GenerateStatus() not in (
                GenerateRequestStatus.GenerateFinished,
                GenerateRequestStatus.GenerateInterrupted,
                GenerateRequestStatus.InternalError):
            if deadline and time.monotonic() > deadline:
                raise TimeoutError(f"sync_request {handle.uuid[:8]}")
            time.sleep(0.002)
        return self

    # -- LoRA (reference LoadLoraByName/UnloadLoraByName, allspark.h:625-627)
    def load_lora(self, name: str, lora_name: str, adapter_path_or_tensors,
                  alpha: float = None, rank: int = None):
        runtime = self._models[name]
        if runtime.lora_manager is None:
            raise RuntimeError("LoRA not enabled in RuntimeConfig")
        loop = self._loops.get(name)
        if loop is None:
            runtime.lora_manager.load(lora_name, adapter_path_or_tensors,
                                      alpha, rank)
            return self
        done = threading.Event()
        err = []

        def do():
            try:
                runtime.lora_manager.load(lora_name, adapter_path_or_tensors,
                                          alpha, rank)
            except Exception as e:
                err.append(e)
            done.set()

        loop.submit(do)
        done.wait(timeout=120)
        if err:
            raise err[0]
        return self

    def unload_lora(self, name: str, lora_name: str):
        runtime = self._models[name]
        if runtime.lora_manager is None:
            return self
        loop = self._loops.get(name)
        if loop is None:
            runtime.lora_manager.unload(lora_name)
            return self
        done = threading.Event()
        loop.submit(lambda: (runtime.lora_manager.unload(lora_name),
                             done.set()))
        done.wait(timeout=120)
        return self

    # -- generic non-generative forward (reference "Operator" model,
    #    csrc/core/model/operator.cpp:19 — run the graph once, no sampler;
    #    for reward / embedding / classification heads) ----------------------
    def run_forward(self, name: str, input_ids: List[int]) -> Dict:
        """Returns {"logits": [T, V] f32, "last_hidden_state": [T, hid]}."""
        runtime = self._models[name]
        loop = self._loops.get(name)
        if loop is None:
            return runtime.run_forward(input_ids)
        done = threading.Event()
        box: List = []

        def do():
            try:
                box.append(runtime.run_forward(input_ids))
            except Exception as e:  # surfaced to the caller below
                box.append(e)
            done.set()

        loop.submit(do)
        done.wait(timeout=600)
        if not box:
            raise TimeoutError("run_forward timed out")
        if isinstance(box[0], Exception):
            raise box[0]
        return box[0]

    # -- text convenience (reference start_request_text, engine.py:379-416) --
    def start_request_text(self, name: str, tokenizer, prompt: str,
                           gen_cfg: Optional[GenerationConfig] = None):
        ids = tokenizer.encode(prompt)
        if gen_cfg is not None and gen_cfg.eos_token_id < 0 and \
                tokenizer.eos_token_id is not None:
            gen_cfg.eos_token_id = int(tokenizer.eos_token_id)
        return self.start_request(name, ids, gen_cfg)

    # -- weight swap (reference UnloadModelFromDeviceMemory, allspark.h:542) --
    def unload_model_from_device_memory(self, name: str):
        runtime = self._models[name]
        loop = self._loops.get(name)
        if loop is not None and (runtime.active_requests() or runtime.pending):
            raise RuntimeError("stop requests before unloading weights")
        if loop is None:
            runtime.unload_weights_to_host()
            return self
        done = threading.Event()
        loop.submit(lambda: (runtime.unload_weights_to_host(), done.set()))
        done.wait(timeout=600)
        return self

    def reload_model_to_device_memory(self, name: str):
        runtime = self._models[name]
        loop = self._loops.get(name)
        if loop is None:
            runtime.reload_weights_to_device()
            return self
        done = threading.Event()
        loop.submit(lambda: (runtime.reload_weights_to_device(), done.set()))
        done.wait(timeout=600)
        return self

    # -- prefix-cache auto-tuning (reference TunePrefixCache,
    #    as_engine.cpp:796-868: probe doubling prompt lengths cold vs warm;
    #    the first length where a cache hit is not faster becomes the
    #    seqlen threshold below which caching is skipped) -------------------
    def tune_prefix_cache(self, name: str, max_len: Optional[int] = None,
                          start_len: int = 64) -> int:
        import numpy as np
        from dashinfer_tpu.config import GenerationConfig
        runtime = self._models[name]
        if runtime.prefix_cache is None:
            return 0
        max_len = max_len or runtime.rt.max_length // 2
        rng = np.random.RandomState(1234)
        threshold = 0
        length = start_len
        while length <= max_len:
            gen = lambda: GenerationConfig(max_length=length + 2,  # noqa
                                           do_sample=False, top_k=1,
                                           eos_token_id=-1)
            # compile pre-warm (reference probes a warmed engine,
            # as_engine.cpp:796-868): a DIFFERENT random prompt of the same
            # bucket pays the prefill/decode jit so the timed cold run
            # measures prefill work, not compilation; its cache nodes are
            # evicted so the timed cold run gets no prefix hit either.
            warm_ids = rng.randint(1, runtime.cfg.vocab_size,
                                   size=length).tolist()
            _, hw, _ = self.start_request(name, warm_ids, gen())
            self.sync_request(name, hw, timeout_s=600)
            self.release_request(name, hw)
            runtime.prefix_cache.evict(10 ** 9)

            ids = rng.randint(1, runtime.cfg.vocab_size,
                              size=length).tolist()
            times = []
            for _ in range(2):   # cold then warm
                t0 = time.monotonic()
                _, h, q = self.start_request(name, ids, gen())
                self.sync_request(name, h, timeout_s=600)
                times.append(q.RequestStatInfo().get(
                    "time_to_first_token", time.monotonic() - t0))
                self.release_request(name, h)
            cold, warm = times
            logger.info("tune_prefix_cache len=%d cold=%.4fs warm=%.4fs",
                        length, cold, warm)
            if warm >= cold:
                threshold = length
            length *= 2
        runtime.prefix_cache.seqlen_threshold = threshold
        logger.info("prefix-cache seqlen threshold set to %d", threshold)
        return threshold

    # -- stats ------------------------------------------------------------
    def get_op_profiling_info(self, name: str) -> Dict:
        """Reference GetOpProfilingInfo (allspark.h:642); enable DI_PROFILE."""
        return self._models[name].profiler.report()

    def get_engine_stat(self, name: str) -> Dict:
        runtime = self._models[name]
        runtime.update_stats()
        return runtime.stat.as_dict()
