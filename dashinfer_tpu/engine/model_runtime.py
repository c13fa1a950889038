"""Per-model runtime: device state + synchronous scheduling primitives.

The Engine's control loop (engine/engine.py) calls into this; keeping the
logic synchronous makes scheduler behavior unit-testable without threads
(the reference interleaves it across 3 threads, as_engine.cpp:1310-1326).

Page accounting: the allocator hands out LOGICAL pages; logical page `g`
owns physical pages `g*L + l` for each layer l — so one allocation covers
all layers, mirroring the reference's per-layer span batch
(model.cpp:1480-1521 reserve = 2*layers*crossings).
"""

import dataclasses
import functools
import math
import os
import time
from collections import deque
from typing import Callable, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from dashinfer_tpu.config import (CacheMode, EvictionStrategy, GenerationConfig,
                                  ModelConfig, RuntimeConfig,
                                  SchedulingStrategy)
from dashinfer_tpu.engine import steps as steps_mod
from dashinfer_tpu.engine.stats import EngineStat
from dashinfer_tpu.runtime.batch_state import make_decode_state
from dashinfer_tpu.runtime.kv_cache import (create_kv_cache,
                                            logical_page_bytes)
from dashinfer_tpu.native import make_page_allocator
from dashinfer_tpu.runtime.page_allocator import NoFreePages
from dashinfer_tpu.runtime.request import (GenerateRequestStatus, Request,
                                           StatInfo)
from dashinfer_tpu.runtime.result_queue import ResultQueue
from dashinfer_tpu.utils import EnvConfig, get_logger
from dashinfer_tpu.utils.profiler import PhaseProfiler

logger = get_logger("model_runtime")


@dataclasses.dataclass
class PrefillDecision:
    """One admission decision (request, slot, pages) — serialized to
    followers in lockstep multi-host mode before the jit launch
    (docs/multihost.md §Tick replication)."""

    req: Request
    slot: int
    pages: List[int]
    prefix_len: int

    def payload(self) -> Dict:
        return {"kind": "prefill", "uuid": self.req.uuid,
                "slot": int(self.slot),
                "pages": [int(p) for p in self.pages],
                "prefix_len": int(self.prefix_len)}


@dataclasses.dataclass
class DecodeDecision:
    """One decode-tick decision: which slots step, which new pages they
    get, single vs multi-step window."""

    kind: str                               # "multi" | "single"
    act: List[Request]
    npi: Optional[np.ndarray] = None        # [N, B] multi-step page grid
    new_page_ids: Optional[np.ndarray] = None   # [B] single-step pages
    sync_mode: bool = False
    with_banned: bool = False               # on-device bad-words/ngram

    def payload(self) -> Dict:
        import zlib
        crc = zlib.crc32(",".join(r.uuid for r in self.act).encode())
        if self.kind == "multi":
            pages = [[int(i), int(s), int(self.npi[i, s])]
                     for i in range(self.npi.shape[0])
                     for s in range(self.npi.shape[1])
                     if self.npi[i, s] >= 0]
        else:
            pages = [[0, int(s), int(g)]
                     for s, g in enumerate(self.new_page_ids) if g >= 0]
        return {"kind": "decode", "mode": self.kind, "pages": pages,
                "slots": sorted(int(r.slot) for r in self.act),
                "crc": crc & 0xFFFFFFFF}


class _DevicePager:
    """Moves one logical page's pool rows device<->host for the prefix
    cache's host tier.

    Swap-OUT is asynchronous (gather_page_async): the row gather is
    dispatched on the scheduler thread (single-stream dispatch order
    guarantees it reads the pool before any later donated step overwrites
    the freed page), copy_to_host_async starts the D2H DMA, and a worker
    thread materializes the blob and lands it in the host tier — decode
    ticks never block on jax.device_get (reference overlaps swaps via a
    32-thread pool + pinned buffers, prefix_cache_manager.h:201-210).
    Swap-IN (restore_page) stays on the scheduler thread: its scatter is
    async-dispatched by JAX anyway and the result must be visible to the
    very next prefill."""

    def __init__(self, runtime: "ModelRuntime"):
        import queue as _queue
        import threading
        self.rt = runtime
        self._q: "_queue.Queue" = _queue.Queue()
        self._thread = threading.Thread(target=self._drain, daemon=True,
                                        name="di-pager")
        self._thread.start()

    def _rows(self, logical_page: int):
        L = self.rt.cfg.num_layers
        return jnp.asarray(logical_page * L + np.arange(L), jnp.int32)

    def gather_page(self, logical_page: int):
        return self.rt._pager_gather(self._rows(logical_page))

    def gather_page_async(self, logical_page: int, done_cb, fail_cb) -> None:
        arrs = self.rt._gather_rows_fn()(self.rt.cache,
                                         self._rows(logical_page))
        for a in arrs:
            try:
                a.copy_to_host_async()
            except AttributeError:
                pass
        self._q.put((arrs, done_cb, fail_cb))

    def _drain(self):
        while True:
            arrs, done_cb, fail_cb = self._q.get()
            try:
                done_cb(jax.device_get(arrs))
            except Exception:
                logger.exception("pager swap-out drain failed")
                try:
                    fail_cb()
                except Exception:
                    pass
            finally:
                self._q.task_done()

    def flush(self) -> None:
        """Block until all pending swap-outs have landed (tests/shutdown)."""
        self._q.join()

    def restore_page(self, blob) -> int:
        page = self.rt.allocator.alloc(1)[0]
        try:
            self.rt._pager_scatter(self._rows(page), blob)
        except Exception:
            self.rt.allocator.free([page])
            raise
        return page

def _file_digest(path: str, chunk: int = 16 << 20) -> str:
    import hashlib
    h = hashlib.blake2b(digest_size=16)
    with open(path, "rb") as f:
        while True:
            b = f.read(chunk)
            if not b:
                break
            h.update(b)
    return h.hexdigest()


_DEFAULT_HBM = 16 * 1024**3  # v5e per-chip (fallback when probing fails)


def _detect_hbm_bytes() -> int:
    """Per-chip HBM capacity from the runtime (v5e 16G / v5p 95G / v4 32G)
    instead of a hardcoded generation guess."""
    try:
        st = jax.local_devices()[0].memory_stats()
        if st:
            for key in ("bytes_limit", "bytes_reservable_limit"):
                if st.get(key):
                    return int(st[key])
    except Exception:  # memory_stats unsupported on this backend
        pass
    return _DEFAULT_HBM


def _weight_bytes(params) -> int:
    return sum(x.size * x.dtype.itemsize for x in jax.tree.leaves(params))


class ModelRuntime:
    def __init__(self, name: str, cfg: ModelConfig, params, rt: RuntimeConfig,
                 use_kernel: Optional[bool] = None, tokenizer=None):
        self.name = name
        self.cfg = cfg
        self.rt = rt
        self.tokenizer = tokenizer
        if use_kernel is None:
            # DI_KERNELS=0 forces the pure-XLA path even on TPU — the
            # cross-implementation oracle for tools/tpu_parity_check.py
            use_kernel = (jax.default_backend() == "tpu" and
                          EnvConfig.kernels_enabled())
        self.use_kernel = use_kernel
        self.dtype = jnp.bfloat16 if rt.dtype == "bfloat16" else jnp.dtype(rt.dtype)

        # double-buffered decode: the last launched step's (tokens, logprobs,
        # batch) pending host-side drain — see decode_tick/_drain_inflight
        self._inflight = None
        # async prefills: first tokens still on device, drained with the
        # same in-flight mechanism decode uses (the reference runs prefill
        # on its own thread so context work never blocks generation,
        # as_engine.cpp:1321-1326; here the launch is async and the loop
        # thread never blocks on the first-token transfer)
        self._inflight_prefills: List[Tuple] = []

        # raw-param upload is DEFERRED on single-chip installs until the
        # weight-residency decision (below): uploading raw + pack
        # together put a transient raw+pack peak on the device that
        # OOM'd MoE installs whose steady state (pack_only) fits fine —
        # the reference holds one weight set and never double-buffers a
        # whole model either (engine_worker.cpp:103-117)
        self.params = None
        # tensor-parallel mesh (reference: per-rank WeightSplitter + NCCL
        # graph ops, SURVEY.md §2.13; here NamedShardings declared on the
        # arrays — XLA's SPMD partitioner inserts the ICI collectives inside
        # the already-jitted steps, so no step code changes)
        self.mesh = None
        if tuple(rt.mesh_shape) != (1, 1):
            self.params = jax.tree.map(jnp.asarray, params)
            from dashinfer_tpu.parallel import make_mesh, shard_params
            self.mesh = make_mesh(tuple(rt.mesh_shape))
            self.params = shard_params(self.params, self.mesh,
                                       ep=rt.use_ep)
            logger.info("TP mesh %s (ep=%s): params sharded",
                        dict(self.mesh.shape), rt.use_ep)
        # megakernel fast path for decode: pack the weight streams once at
        # install when the architecture qualifies (ops/pallas/megakernel.py).
        # Raw params stay for prefill/LoRA/fallback; DI_MEGAKERNEL=0 disables.
        # Under a TP mesh the sharded per-layer-segment variant runs instead
        # (ops/pallas/tp_megakernel.py); unsupported combos fall back to the
        # XLA SPMD path.
        self.mega_plan = None
        self.mega_params = None
        self.tp_mega_plan = None
        self._mega_plan_params = None
        self._mega_lora_ok = False
        # LoRA no longer disables the megakernels at install: batches
        # without an active LoRA request decode through the fast path, and
        # only steps that actually carry an adapter fall back to the XLA
        # path (_decode_fn drops the plan when with_lora).
        if (self.use_kernel and rt.enable_megakernel and
                self.mesh is not None and EnvConfig.megakernel_enabled()):
            from dashinfer_tpu.ops.pallas import tp_megakernel as tpk
            from dashinfer_tpu.parallel.mesh import DATA_AXIS, MODEL_AXIS
            from jax.sharding import NamedSharding, PartitionSpec as P
            n = self.mesh.shape[MODEL_AXIS]
            if (self.mesh.shape[DATA_AXIS] == 1 and
                    tpk.supports_tp(cfg, rt, params, n)):
                t0 = time.monotonic()
                self.tp_mega_plan, packed = tpk.make_tp_plan(cfg, rt,
                                                             params, n)
                rank_sh = NamedSharding(self.mesh, P("model"))
                rep = NamedSharding(self.mesh, P())
                self.mega_params = {
                    "packed": jax.tree.map(
                        lambda a: jax.device_put(a, rank_sh), packed),
                    "embed": jax.device_put(
                        jnp.asarray(np.asarray(params["embed_tokens"]["w"])),
                        rep)}
                logger.info("TP megakernel packed in %.1fs (%d shards)",
                            time.monotonic() - t0, n)
        if (self.use_kernel and rt.enable_megakernel and self.mesh is None and
                EnvConfig.megakernel_enabled()):
            from dashinfer_tpu.ops.pallas import megakernel as mk
            # reference decoder_weight_only_ (device_context.h:148-149):
            # a8w8 models decode through the weight-only megakernel while
            # prefill keeps activation-quant GEMMs on the raw params
            mk_params = mk.weight_only_decode_view(params)
            # u4 -> per-channel-i8 stream re-expansion (batch-aware; see
            # docs/megakernel.md §i8 streaming): large batches are
            # VPU-dequant-bound on the u4 stream, so serve u4 checkpoints
            # through the i8 stream. The expansion itself is deferred into
            # the pack build so a pack-cache hit skips the dequant+requant
            # pass; make_plan/supports run on a zero-payload meta view.
            stream = EnvConfig.mk_stream()
            i8_meta = None
            if (mk_params is not None and stream != "u4" and
                    cfg.moe is None and
                    (stream == "i8" or
                     rt.max_batch >= EnvConfig.mk_i8_batch())):
                # MoE keeps u4: its decode step is weight-STREAM-bound
                # across all experts, so doubling the bytes has no
                # epilogue win to pay for it (bench._stream_kind mirrors
                # this rule)
                i8_meta = mk.expand_u4_to_i8(mk_params, meta_only=True)
            if i8_meta is not None:
                # HBM-budget gate (round-5 on-chip finding: prefix-cache
                # serving at 7B with residency "both" OOM'd — raw 7.5 GiB
                # + i8 pack 9.2 GiB > 16 GiB). When the raw params MUST
                # stay resident (prefix cache / LoRA / explicit "both" /
                # auto that cannot engage pack_only) and the i8 pack does
                # not fit beside them, keep the u4 stream: slower per
                # step at large batch, but it serves.
                res_req = EnvConfig.weight_residency() or rt.weight_residency
                may_drop_raw = (res_req != "both" and not rt.enable_lora
                                and not rt.enable_prefix_cache
                                and rt.max_prompt_len > 0)
                if not may_drop_raw:
                    raw_b = self._per_device_nbytes(params)
                    est = self._estimate_pack_bytes(mk_params,
                                                    expand_i8=True)
                    budget = int((rt.hbm_bytes or _detect_hbm_bytes()) *
                                 EnvConfig.hbm_mem_ratio())
                    if raw_b + est + 512 * 1024**2 > budget:
                        logger.warning(
                            "i8 stream re-expansion skipped: raw params "
                            "stay resident (%s) and raw %.2f GiB + "
                            "estimated i8 pack %.2f GiB exceeds the "
                            "%.2f GiB budget; keeping the u4 stream",
                            "residency=both" if res_req == "both"
                            else "prefix/LoRA/auto-ineligible",
                            raw_b / 1024**3, est / 1024**3,
                            budget / 1024**3)
                        i8_meta = None
            expand_i8 = i8_meta is not None
            pack_tag, plan_params = "decode", mk_params
            if expand_i8:
                pack_tag = "decode_i8"
                plan_params = i8_meta
                logger.info("decode stream: u4 -> per-channel i8 "
                            "re-expansion (max_batch=%d)", rt.max_batch)
            if mk_params is not None and not mk.supports(cfg, rt,
                                                         plan_params):
                # batch-aware guidance (round-3 weak #5): if max_batch is
                # the ONLY reason the fast path disengaged, say so — the
                # per-op XLA fallback is ~15x slower per step and a bigger
                # batch cannot make up for that
                import dataclasses as _dc
                rt64 = _dc.replace(rt, max_batch=64)
                if rt.max_batch > 64 and mk.supports(cfg, rt64, plan_params):
                    logger.warning(
                        "max_batch=%d exceeds the decode megakernel's "
                        "supported batch (64); decode falls back to the "
                        "per-op XLA path — a max_batch <= 64 config has "
                        "HIGHER aggregate throughput", rt.max_batch)
            if mk_params is not None and mk.supports(cfg, rt, plan_params):
                t0 = time.monotonic()
                # interleaved pg/pu/pd MLP streams: the prefill megakernel's
                # exact geometry, so ONE packed weight set serves BOTH
                # kernels (reference shares one weight set between its
                # prefill and decode workers, engine_worker.cpp:103-117)
                self.mega_plan = mk.make_plan(cfg, rt, plan_params,
                                              interleave_mlp=True)
                self._mega_plan_params = plan_params

                def _build_pack():
                    src = mk.expand_u4_to_i8(mk_params) if expand_i8 \
                        else mk_params
                    return mk.pack_params(cfg, self.mega_plan, src)

                packed = self._cached_pack(
                    pack_tag, _build_pack, self.mega_plan, mk_params)
                self._mega_lora_ok = (rt.enable_lora and
                                      mk.supports_lora_epilogue(
                                          self.mega_plan))
                self.mega_params = {
                    "packed": packed,
                    # ONE embed upload; if the raw params are uploaded
                    # later (residency "both"), their embed leaf aliases
                    # THIS array — never two device copies of ~1 GiB
                    "embed": jnp.asarray(
                        np.asarray(params["embed_tokens"]["w"]))}
                logger.info("megakernel packed in %.1fs (S_layer=%d T=%d)",
                            time.monotonic() - t0, self.mega_plan.S_layer,
                            self.mega_plan.T_total)
        self.buckets = self._make_buckets()
        # prefill megakernel fast path: one packed weight-stream set (shared
        # across buckets — stream geometry is bucket-independent) + a plan
        # per qualifying bucket. DI_PREFILL_MEGAKERNEL=0 disables.
        self._pmk_plans: Dict[int, object] = {}
        if (self.mega_params is not None and self.mega_plan is not None and
                self.mesh is None and
                EnvConfig.prefill_megakernel_enabled()):
            from dashinfer_tpu.ops.pallas import prefill_megakernel as pmk
            # the prefill plans adopt the decode plan's StreamPlans, so
            # BOTH kernels index the ONE decode pack already in HBM — no
            # second weight copy, no install-time HBM guard needed
            # (round-3's "skipping prefill megakernel pack" is gone).
            # Under the i8-expanded stream this means prefill ALSO serves
            # from the re-expanded weights (requant error <= range/510
            # per weight, below the kernels' bf16 operand rounding) —
            # docs/megakernel.md §i8 streaming
            src = self._mega_plan_params
            cap_b = 1024 if cfg.moe is None else \
                min(1024, rt.moe_prefill_mega_max_bucket)
            qual = [b for b in self.buckets
                    if b <= cap_b and b % 128 == 0 and
                    pmk.supports_prefill(cfg, rt, src, b)]
            if qual:
                for b in qual:
                    self._pmk_plans[b] = pmk.make_prefill_plan(
                        cfg, rt, src, b, decode_plan=self.mega_plan)
                self.mega_params["prefill_packed"] = \
                    self.mega_params["packed"]
                logger.info("prefill megakernel shares the decode pack "
                            "(buckets %s)", qual)
        # TP prefill segments (same bucket gating, per-rank packed streams)
        self._tp_pmk_plans: Dict[int, object] = {}
        if (self.tp_mega_plan is not None and
                EnvConfig.prefill_megakernel_enabled()):
            from dashinfer_tpu.ops.pallas import tp_megakernel as tpk
            from dashinfer_tpu.parallel.mesh import MODEL_AXIS
            from jax.sharding import NamedSharding, PartitionSpec as P
            n = self.mesh.shape[MODEL_AXIS]
            qual = [b for b in self.buckets
                    if b <= 1024 and b % 128 == 0 and
                    tpk.supports_prefill_tp(cfg, rt, params, b, n)]
            if qual:
                t0 = time.monotonic()
                self._tp_pmk_plans, packed = tpk.make_tp_prefill_plans(
                    cfg, rt, params, qual, n)
                rank_sh = NamedSharding(self.mesh, P("model"))
                self.mega_params["tp_prefill_packed"] = jax.tree.map(
                    lambda a: jax.device_put(a, rank_sh), packed)
                logger.info(
                    "TP prefill megakernel packed in %.1fs (buckets %s)",
                    time.monotonic() - t0, qual)
        # -- weight residency (VERDICT r4 #3; reference shares ONE weight
        # set between prefill and decode workers, engine_worker.cpp:103-117)
        self.residency = "both"
        self._raw_params_host = None
        self._swapped_out = False
        self._decide_residency(raw_src=params)

        self.num_logical_pages = self._plan_pool()
        self.cache = create_kv_cache(
            cfg, rt.cache, self.num_logical_pages * cfg.num_layers,
            model_dtype=self.dtype)
        self.state = make_decode_state(cfg, rt)
        if self.mesh is not None:
            from dashinfer_tpu.parallel import shard_cache, shard_state
            self.cache = shard_cache(self.cache, cfg, self.mesh)
            self.state = shard_state(self.state, self.mesh)
        self.allocator = make_page_allocator(self.num_logical_pages)

        self._decode_step = steps_mod.build_decode_step(
            cfg, rt, use_kernel=use_kernel)
        self._decode_step_lp = None     # built on demand
        self._decode_step_guided = None
        self._prefill_steps: Dict[Tuple, Callable] = {}
        self._deactivate = steps_mod.build_deactivate(cfg, rt)

        self.pending: deque = deque()           # Requests awaiting prefill
        self.requests: Dict[str, Request] = {}  # uuid -> Request (all live)
        self.slots: List[Optional[Request]] = [None] * rt.max_batch
        self.queues: Dict[str, ResultQueue] = {}
        self.stat = EngineStat(model_name=name)
        self.prefix_cache = None                # installed by engine if enabled
        self.lora_manager = None
        if rt.enable_lora:
            from dashinfer_tpu.lora import LoraManager
            self.lora_manager = LoraManager(cfg, rt, self.dtype)
        self.profiler = PhaseProfiler(name)
        self._gather_rows = None
        self._scatter_rows = None
        self._params_host = None   # set while weights are swapped out
        # slot-level host mirrors
        self._cached_len: Dict[str, int] = {}
        # lockstep multi-host: when set, time-driven prefix-cache decisions
        # (TTL validity/expiry) use the LEADER's clock, replicated per tick,
        # instead of the local one — followers stay bit-deterministic
        # (docs/multihost.md §Tick replication)
        self.logical_now: Optional[float] = None

    def _cached_pack(self, tag: str, build, plan, src_params):
        """Host-side pack cache (production cold start): the megakernel
        pack is a deterministic rearrangement of the weights, minutes of
        numpy work per process start at 7B.

        Key = plan geometry + a FULL-CONTENT blake2b of every source leaf
        (a checkpoint updated in place with identical shapes must miss —
        sampled fingerprints can silently serve stale weights; ADVICE r3).
        Layout = a directory of raw .npy files + a JSON manifest carrying
        per-file digests (verified on load), replacing the single multi-GB
        unverified pickle blob: mmap'd .npy loads stream straight into
        device transfers without a second host copy. DI_PACK_CACHE
        overrides the directory; =0 disables."""
        import hashlib
        import json as _json
        d = os.environ.get(
            "DI_PACK_CACHE",
            os.path.expanduser("~/.cache/dashinfer_tpu/packs"))
        if d in ("0", ""):
            # pack_params builds host-side; upload the one copy here
            return jax.tree.map(jnp.asarray, build())
        from dashinfer_tpu.ops.pallas.megakernel import pack_cache_key_fields
        h = hashlib.blake2b(digest_size=16)
        try:
            key_fields = pack_cache_key_fields(plan)
        except AttributeError:   # non-MegaPlan (TP/prefill plans)
            key_fields = plan
        h.update(repr((tag, key_fields)).encode())
        for path, leaf in sorted(
                jax.tree_util.tree_flatten_with_path(src_params)[0],
                key=lambda kv: str(kv[0])):
            arr = np.ascontiguousarray(np.asarray(leaf))
            h.update(str(path).encode())
            h.update(repr((arr.shape, str(arr.dtype))).encode())
            h.update(arr.view(np.uint8).reshape(-1))
        cd = os.path.join(d, f"pack_{tag}_{h.hexdigest()}")
        manifest_fn = os.path.join(cd, "manifest.json")
        try:
            if os.path.exists(manifest_fn):
                with open(manifest_fn) as f:
                    man = _json.load(f)
                out = {}
                for key, ent in man["arrays"].items():
                    path = os.path.join(cd, ent["file"])
                    # digest the FILE bytes in streamed chunks — hashing
                    # the mmap'd array would materialize a full host copy
                    # of every multi-GB pack on the hit path
                    if _file_digest(path) != ent["digest"]:
                        raise ValueError(f"pack cache corrupt: {key}")
                    arr = np.load(path, mmap_mode="r", allow_pickle=False)
                    if str(arr.dtype) != ent.get("store", ent["dtype"]):
                        # legacy rescue: np.save wrote ml_dtypes arrays
                        # (bfloat16, fp8) with a VOID descriptor — view
                        # them back to the logical dtype when the
                        # itemsize matches instead of rebuilding the
                        # multi-GB pack
                        want = np.dtype(ent["dtype"])
                        if arr.dtype.kind == "V" and \
                                arr.dtype.itemsize == want.itemsize:
                            arr = arr.view(want)
                        else:
                            raise ValueError(
                                f"pack cache dtype mismatch: {key}")
                    elif "store" in ent:
                        arr = arr.view(np.dtype(ent["dtype"]))
                    if list(arr.shape) != ent["shape"] or \
                            str(arr.dtype) != ent["dtype"]:
                        raise ValueError(f"pack cache shape mismatch: {key}")
                    out[key] = jnp.asarray(arr)
                logger.info("pack cache hit: %s (%d arrays verified)", cd,
                            len(out))
                return out
        except Exception:
            logger.exception("pack cache read failed; rebuilding")
        packed = build()
        try:
            flat = {str(k): np.asarray(v) for k, v in packed.items()}
            tmp = cd + ".tmp"
            os.makedirs(tmp, exist_ok=True)
            man = {"arrays": {}}
            for i, (key, arr) in enumerate(sorted(flat.items())):
                fn = f"{i}.npy"
                ent = {"file": fn, "shape": list(arr.shape),
                       "dtype": str(arr.dtype)}
                save_arr = arr
                if arr.dtype.char not in np.typecodes["All"]:
                    # ml_dtypes (bfloat16/fp8) round-trip through np.save
                    # as VOID descriptors that np.load can't re-type —
                    # store as a same-width uint view and record it
                    store = np.dtype(f"uint{8 * arr.dtype.itemsize}")
                    save_arr = arr.view(store)
                    ent["store"] = str(store)
                np.save(os.path.join(tmp, fn), save_arr,
                        allow_pickle=False)
                ent["digest"] = _file_digest(os.path.join(tmp, fn))
                man["arrays"][key] = ent
            with open(os.path.join(tmp, "manifest.json"), "w") as f:
                _json.dump(man, f)
            import shutil
            if os.path.exists(cd):
                shutil.rmtree(cd, ignore_errors=True)
            os.replace(tmp, cd)
        except Exception:
            logger.exception("pack cache write failed")
        # build() returns host arrays (no device round trip through the
        # cache-write path); upload the single device copy last
        return jax.tree.map(jnp.asarray, packed)

    def _pc(self, fn, *args, **kw):
        """Call a prefix-cache method, threading the logical clock when the
        engine runs in lockstep mode (Python prefix cache only; the native
        cache is rejected for lockstep at configuration time)."""
        if self.logical_now is not None:
            kw["now"] = self.logical_now
        return fn(*args, **kw)

    # -- planning ------------------------------------------------------------
    def _per_device_nbytes(self, tree) -> int:
        """HBM bytes ONE device holds for a (possibly sharded) pytree —
        shard_shape metadata only, no device access. Unsharded leaves count
        in full (replicated). ALIASED leaves count ONCE: the shared-pack
        design makes prefill_packed the same arrays as packed, and the
        mega embed aliases the raw embed — double-counting them made the
        pool planner see ~9 GiB of phantom weights at 7B and floor the
        pool."""
        total = 0
        seen = set()
        for leaf in jax.tree.leaves(tree):
            if id(leaf) in seen:
                continue
            seen.add(id(leaf))
            shape = tuple(jnp.shape(leaf))
            sh = getattr(leaf, "sharding", None)
            if sh is not None and self.mesh is not None:
                shape = sh.shard_shape(shape)
            total += math.prod(shape) * np.dtype(jnp.result_type(leaf)).itemsize
        return total

    def _estimate_pack_bytes(self, mk_params, expand_i8: bool) -> int:
        """Rough (over by <10%) size of the megakernel pack for mk_params:
        quantized payloads stream at their own width (u4 doubles under
        the i8 re-expansion), dense leaves stream as bf16, plus the
        embed table."""
        total = 0
        lp = mk_params.get("layers", {})
        leaves = list(lp.values()) + [mk_params.get("lm_head")]
        for leaf in leaves:
            if not isinstance(leaf, dict):
                continue
            if "w_q" in leaf:
                wq = np.asarray(leaf["w_q"])
                mult = 2 if (expand_i8 and wq.dtype == np.uint8) else 1
                total += wq.nbytes * mult
                total += np.asarray(leaf["scale"]).nbytes * 2
            elif "w" in leaf:
                w = np.asarray(leaf["w"])
                total += w.size * 2       # streams as bf16
        emb = mk_params.get("embed_tokens", {}).get("w")
        if emb is not None:
            total += np.asarray(emb).size * 2
        return total

    def _plan_pool(self) -> int:
        """Size the KV pool from per-DEVICE budgets: probed HBM minus the
        per-device share of weights minus measured step temps. Under a TP
        mesh every quantity is per-shard (weights via shard_shape, temps
        via SPMD memory_analysis, page bytes via the cache sharding) —
        the reference measures warmup high-water per rank the same way
        (as_engine.cpp:1035-1258)."""
        rt, cfg = self.rt, self.cfg
        if rt.cache.num_pages:
            return self._check_pool_vs_workload(rt.cache.num_pages)
        lpb = logical_page_bytes(cfg, rt.cache, self.dtype)
        lpb_dev = lpb
        if self.mesh is not None:
            lpb_dev = self._per_device_cache_page_bytes()
        kv_bytes = rt.kv_pool_bytes or EnvConfig.kv_pool_bytes()
        if not kv_bytes:
            hbm = rt.hbm_bytes or _detect_hbm_bytes()
            # raw params + packed megakernel streams in ONE count so the
            # embed/prefill-pack aliases dedup across the two trees
            w = self._per_device_nbytes(
                [t for t in (self.params, self.mega_params)
                 if t is not None])
            act = None
            if EnvConfig.warmup_enabled():
                act = self._measure_step_temp_bytes()
            if act is not None:
                # measured XLA temps + program code/runtime slack (the
                # reference warms up with fake requests and reads the
                # allocator high-water instead, as_engine.cpp:1035-1258;
                # AOT memory_analysis gives the same number without
                # executing)
                logger.info("warmup-measured step temps: %.2f GiB/device",
                            act / 1024**3)
                act += 256 * 1024**2
            else:
                # heuristic fallback (warmup disabled or unmeasurable):
                # scales with the per-device weight footprint
                act = min(2 * 1024**3, max(512 * 1024**2, w // 4))
            kv_bytes = int(hbm * EnvConfig.hbm_mem_ratio()) - w - act
            # kv_bytes is now a per-DEVICE budget; divide by per-device
            # page bytes below
            n = max(kv_bytes // lpb_dev, 2 * rt.max_batch)
        else:
            n = max(kv_bytes // lpb, 2 * rt.max_batch)
        # never exceed what max_batch sequences can use
        n = min(n, rt.max_batch * rt.max_pages_per_seq)
        logger.info("KV pool: %d logical pages (%.2f GiB global)", n,
                    n * lpb / 1024**3)
        return self._check_pool_vs_workload(int(n))

    def _check_pool_vs_workload(self, n: int) -> int:
        """Cross-check the planned pool against the workload's steady-state
        page demand (VERDICT r3: a 64-page pool admitted an in512/bs32
        workload wanting 96 pages and served through OOM-eviction churn).
        With typical_seq_len set, admission is capped at the concurrency
        the pool can actually hold; the cap is deterministic host state,
        lockstep-safe."""
        rt = self.rt
        self.admission_cap = rt.max_batch
        if rt.typical_seq_len > 0:
            typ = min(rt.typical_seq_len, rt.max_length)
            per_seq = -(-typ // rt.cache.page_size)
            cap = max(1, min(rt.max_batch, n // per_seq))
            if cap < rt.max_batch:
                logger.warning(
                    "KV pool (%d logical pages) cannot hold %d concurrent "
                    "sequences of typical length %d (%d pages each); "
                    "admission capped at %d concurrent requests",
                    n, rt.max_batch, typ, per_seq, cap)
            self.admission_cap = cap
        return n

    # -- weight residency (VERDICT r4 #3) --------------------------------
    def _decide_residency(self, raw_src=None) -> None:
        """Decide whether the raw quantized params stay in HBM alongside
        the megakernel pack ("both") or are demoted to host RAM
        ("pack_only"). The reference keeps ONE weight set shared between
        its prefill and decode workers (engine_worker.cpp:103-117); here
        the pack IS that one set for the kernel paths, and the raw params
        only serve the XLA fallbacks (non-128 buckets, prefix-hit
        suffixes, chunked continuations, LoRA, multimodal, run_forward).
        At 7B on a 16 GiB chip both sets together (~13 GiB) starve the KV
        pool, so "auto" drops the raw set when the configured workload
        could not fit otherwise. The decision is logged either way."""
        rt = self.rt
        res = EnvConfig.weight_residency() or rt.weight_residency
        if res not in ("auto", "both", "pack_only"):
            logger.warning("unknown weight_residency %r; using auto", res)
            res = "auto"
        eligible = (self.mesh is None and self.mega_params is not None and
                    self.mega_plan is not None and bool(self._pmk_plans) and
                    not rt.enable_lora)
        if res == "pack_only" and not eligible:
            raise ValueError(
                "weight_residency=pack_only needs the decode AND prefill "
                "megakernels active on a single-chip mesh without LoRA "
                f"(megakernel={self.mega_params is not None}, "
                f"prefill_buckets={sorted(self._pmk_plans)}, "
                f"mesh={self.mesh is not None}, lora={rt.enable_lora})")
        src = self.params if self.params is not None else raw_src
        raw_gib = (self._per_device_nbytes(src) / 1024**3
                   if src is not None else 0.0)
        pack_gib = (self._per_device_nbytes(self.mega_params) / 1024**3
                    if self.mega_params is not None else 0.0)
        if eligible and (res == "pack_only" or
                         (res == "auto" and self._auto_pack_only(src))):
            self._demote_raw_params(raw_src)
        elif self.params is None:
            # deferred single-chip upload: the raw set joins the pack on
            # device only once we KNOW both stay resident — no transient
            # raw+pack double peak for pack_only installs
            self.params = jax.tree.map(jnp.asarray, raw_src)
            if self.mega_params is not None and \
                    "embed" in self.mega_params:
                # alias the already-uploaded embed (frees the duplicate)
                self.params["embed_tokens"]["w"] = \
                    self.mega_params["embed"]
        logger.info(
            "weight residency: %s (raw params %.2f GiB, megakernel pack "
            "%.2f GiB, requested %s)", self.residency, raw_gib, pack_gib,
            res)

    def _auto_pack_only(self, src=None) -> bool:
        """auto residency: demote the raw params only when the
        both-resident KV pool could NOT hold the configured workload
        (typical_seq_len x max_batch) but the prompts still fit the
        prefill megakernel's bucket coverage. Host-side arithmetic only
        (the measured-temps pass runs later, once, under the residency
        chosen here)."""
        rt = self.rt
        if rt.typical_seq_len <= 0 or rt.cache.num_pages or                 rt.kv_pool_bytes or EnvConfig.kv_pool_bytes():
            return False
        if not (0 < rt.max_prompt_len <= max(self._pmk_plans)):
            return False      # prompts not provably within pmk coverage
        lpb = logical_page_bytes(self.cfg, rt.cache, self.dtype)
        w_both = self._per_device_nbytes(
            [src if src is not None else self.params, self.mega_params])
        act = min(2 * 1024**3, max(512 * 1024**2, w_both // 4))
        budget = int((rt.hbm_bytes or _detect_hbm_bytes()) *
                     EnvConfig.hbm_mem_ratio())
        n_both = max((budget - w_both - act) // lpb,
                     2 * rt.max_batch)
        per_seq = -(-min(rt.typical_seq_len, rt.max_length) //
                    rt.cache.page_size)
        demand = rt.max_batch * per_seq
        if n_both >= demand:
            return False
        logger.warning(
            "both-resident KV pool (~%d pages) cannot hold the workload "
            "(%d slots x %d pages); auto weight_residency selects "
            "pack_only", n_both, rt.max_batch, per_seq)
        return True

    def _demote_raw_params(self, raw_src=None) -> None:
        """Move the raw quantized params to host RAM; serving continues
        exclusively through the megakernel pack (decode + prefill). The
        host copy is kept so a later install/config can reload it. When
        the caller handed us host arrays (the loader path), keep THOSE —
        a device_get of ~5 GiB through the tunneled runtime costs
        minutes."""
        if raw_src is not None and all(
                isinstance(l, np.ndarray)
                for l in jax.tree.leaves(raw_src)):
            self._raw_params_host = raw_src
        elif self.params is not None:
            self._raw_params_host = jax.device_get(self.params)
        else:
            self._raw_params_host = jax.device_get(raw_src)
        self.params = None
        self.residency = "pack_only"
        self._pack_only_buckets = sorted(self._pmk_plans)
        logger.warning(
            "weight residency: pack_only — raw params demoted to host; "
            "serving through the megakernels only (prefill buckets %s). "
            "Prefix cache, chunked prefill, LoRA and multimodal prefill "
            "are unavailable; prompts above %d tokens are rejected at "
            "start_request.", self._pack_only_buckets,
            max(self._pack_only_buckets))

    def _weights_resident(self) -> bool:
        if self._swapped_out:
            return False
        if self.residency == "pack_only":
            return self.mega_params is not None
        return self.params is not None

    def validate_request(self, input_ids, gen_cfg) -> None:
        """start_request-time guards (user thread). pack_only residency
        serves only what the megakernels cover — reject the rest with a
        clear error instead of an InternalError at prefill time."""
        if self.rt.max_prompt_len and \
                len(input_ids) > self.rt.max_prompt_len:
            raise ValueError(
                f"prompt length {len(input_ids)} exceeds max_prompt_len "
                f"{self.rt.max_prompt_len}")
        if self.residency != "pack_only":
            return
        if gen_cfg.lora_name is not None:
            raise ValueError("weight_residency=pack_only cannot serve "
                             "LoRA requests")
        if gen_cfg.mm_info or gen_cfg.mrope_positions is not None:
            raise ValueError("weight_residency=pack_only cannot serve "
                             "multimodal requests (XLA prefill path)")
        cap = max(self._pack_only_buckets)
        if len(input_ids) > cap:
            raise ValueError(
                f"prompt length {len(input_ids)} exceeds the prefill "
                f"megakernel coverage ({cap} tokens) under "
                "weight_residency=pack_only")

    def _per_device_cache_page_bytes(self) -> int:
        """Per-device HBM bytes of ONE logical page under the mesh's cache
        sharding (payload shards over kv heads; qparams likewise)."""
        n0 = 8
        return self._per_device_nbytes_sds(self._cache_sds(n0)) // n0

    @staticmethod
    def _per_device_nbytes_sds(tree) -> int:
        total = 0
        for leaf in jax.tree.leaves(tree):
            shape = tuple(leaf.shape)
            if getattr(leaf, "sharding", None) is not None:
                shape = leaf.sharding.shard_shape(shape)
            total += math.prod(shape) * np.dtype(leaf.dtype).itemsize
        return total

    def _cache_sds(self, n_logical: int):
        """ShapeDtypeStructs of a KV pool with `n_logical` logical pages,
        carrying the mesh cache shardings when a mesh is active (so AOT
        lowering + memory_analysis see the SPMD layout)."""
        cfg, rt = self.cfg, self.rt
        cache_sds = jax.eval_shape(lambda: create_kv_cache(
            cfg, rt.cache, n_logical * cfg.num_layers,
            model_dtype=self.dtype))
        if self.mesh is None:
            return cache_sds
        from dashinfer_tpu.parallel.sharding import cache_sharding
        from dashinfer_tpu.runtime.kv_cache import KVCache
        payload, qparams = cache_sharding(cfg, self.mesh)

        def att(s, sh):
            return None if s is None else jax.ShapeDtypeStruct(
                s.shape, s.dtype, sharding=sh)

        return KVCache(k=att(cache_sds.k, payload),
                       v=att(cache_sds.v, payload),
                       k_qparams=att(cache_sds.k_qparams, qparams),
                       v_qparams=att(cache_sds.v_qparams, qparams))

    def _measure_step_temp_bytes(self) -> Optional[int]:
        """AOT-compile (lower+compile, NO execution) the decode step and the
        largest-bucket XLA prefill step against ShapeDtypeStruct args and
        return the max XLA temp footprint — the warmup phase of the
        reference's two-phase pool sizing (as_engine.cpp:1035-1258,
        model.cpp:1527-1576) without running fake requests. The XLA prefill
        bounds the megakernel prefill (any request can fall back to it:
        prefix hits, chunked continuations, LoRA), and pool arguments are
        donated so temps are the only unaccounted HBM. Under a TP mesh the
        args carry their NamedShardings, so the SPMD executable's
        memory_analysis reports PER-DEVICE temps — the per-rank warmup
        measurement of the reference (as_engine.cpp:1035-1258). Returns
        None when unmeasurable (backend without memory_analysis)."""
        try:
            cfg, rt = self.cfg, self.rt
            B = rt.max_batch
            i32 = jnp.int32
            mesh = self.mesh

            def sds(tree):
                def one(x):
                    sh = getattr(x, "sharding", None)
                    if sh is not None and mesh is not None:
                        return jax.ShapeDtypeStruct(
                            jnp.shape(x), jnp.result_type(x), sharding=sh)
                    return jax.ShapeDtypeStruct(jnp.shape(x),
                                                jnp.result_type(x))
                return jax.tree.map(one, tree)

            n0 = 2 * B  # provisional pool size; temps do not scale with it
            cache_sds = self._cache_sds(n0)
            state_sds = jax.eval_shape(
                lambda: make_decode_state(cfg, rt))
            if mesh is not None:
                from jax.sharding import NamedSharding, PartitionSpec
                rep = NamedSharding(mesh, PartitionSpec())
                state_sds = jax.tree.map(
                    lambda s: jax.ShapeDtypeStruct(s.shape, s.dtype,
                                                   sharding=rep), state_sds)

            def temp_of(lowered):
                ma = lowered.compile().memory_analysis()
                if ma is None:
                    return None
                return int(ma.temp_size_in_bytes)

            tp = ((self.tp_mega_plan, mesh)
                  if self.tp_mega_plan is not None else None)
            dec = steps_mod.build_decode_step(
                cfg, rt, use_kernel=self.use_kernel,
                megakernel_plan=self.mega_plan, tp_megakernel=tp)
            t_dec = temp_of(dec.lower(
                sds(self._decode_params(False)), cache_sds, state_sds,
                jax.ShapeDtypeStruct((B,), i32)))

            bucket = rt.max_length  # == self._make_buckets()[-1]
            maxPb = -(-bucket // rt.cache.page_size)
            init_sds = jax.eval_shape(lambda: steps_mod.SlotInit(
                slot=jnp.int32(0), temperature=jnp.float32(1),
                top_k=jnp.int32(1), top_p=jnp.float32(1),
                repetition_penalty=jnp.float32(1),
                presence_penalty=jnp.float32(0),
                frequency_penalty=jnp.float32(0), seed=jnp.uint32(0),
                min_gen_len=jnp.int32(0),
                stop_token_ids=jnp.zeros((rt.max_stop_token_ids,),
                                         jnp.int32),
                lora_idx=jnp.int32(-1), pos_offset=jnp.int32(0),
                bad_words=jnp.full(
                    (rt.max_bad_words, rt.max_bad_word_len), -1, jnp.int32),
                ngram_n=jnp.int32(0)))
            terms = [t_dec]
            if self.params is not None:
                pf = steps_mod.build_prefill_step(
                    cfg, rt, bucket, use_kernel=self.use_kernel)
                terms.append(temp_of(pf.lower(
                    sds(self.params), cache_sds, state_sds,
                    jax.ShapeDtypeStruct((bucket,), i32),
                    jax.ShapeDtypeStruct((maxPb,), i32),
                    jax.ShapeDtypeStruct((), i32),
                    jax.ShapeDtypeStruct((), i32),
                    init_sds)))
            if self._pmk_plans:
                # the prefill MEGAKERNEL's temps are measured, not assumed
                # bounded by the XLA prefill (round-4 weak #6): one AOT
                # lowering of the largest qualifying bucket — and the ONLY
                # prefill bound under pack_only residency, where the XLA
                # prefill does not exist
                bm = max(self._pmk_plans)
                maxPm = -(-bm // rt.cache.page_size)
                pfm = steps_mod.build_prefill_step(
                    cfg, rt, bm, use_kernel=self.use_kernel,
                    mega_plan=self._pmk_plans[bm])
                terms.append(temp_of(pfm.lower(
                    sds(self.mega_params), cache_sds, state_sds,
                    jax.ShapeDtypeStruct((bm,), i32),
                    jax.ShapeDtypeStruct((maxPm,), i32),
                    jax.ShapeDtypeStruct((), i32),
                    jax.ShapeDtypeStruct((), i32),
                    init_sds)))
            if any(t is None for t in terms):
                return None
            return max(terms)
        except Exception:
            logger.exception("warmup temp measurement failed; falling back "
                             "to the analytic headroom heuristic")
            return None

    def _make_buckets(self) -> List[int]:
        rt = self.rt
        b, out = rt.min_prefill_bucket, []
        while b < rt.max_length:
            out.append(b)
            b *= 2
        out.append(rt.max_length)
        return out

    def bucket_for(self, n: int) -> int:
        for b in self.buckets:
            if n <= b:
                return b
        raise ValueError(f"length {n} exceeds max_length {self.rt.max_length}")

    def _page_row_len(self, total_tokens: int, bucket: int) -> int:
        """QUANTIZED page-row length for a prefill step. The page row is
        part of the jitted step's shape: an exact per-prompt ceil would
        compile one executable per distinct total page count within the
        same bucket (up to maxP per bucket — TTFT compile spikes in the
        serving hot path). Snap to ceil(bucket/ps) when that covers the
        context (one shape per bucket, the common no-prefix case), else to
        the next multiple of 8 (trailing zero pages are ignored by the
        step's length masks)."""
        ps = self.rt.cache.page_size
        need = -(-total_tokens // ps)
        full = -(-bucket // ps)
        if need <= full:
            return full
        return min(-(-need // 8) * 8, self.rt.max_pages_per_seq)

    def _prefill_chunk_fn(self, bucket: int, maxPb: int) -> Callable:
        key = ("chunk", bucket, maxPb)
        if key not in self._prefill_steps:
            self._prefill_steps[key] = steps_mod.build_prefill_chunk_step(
                self.cfg, self.rt, bucket, use_kernel=self.use_kernel)
        return self._prefill_steps[key]

    def _prefill_fn(self, bucket: int, with_logprobs: bool,
                    with_guided: bool = False,
                    with_lora: bool = False,
                    with_banned: bool = False,
                    with_mm: bool = False,
                    mega: bool = False) -> Callable:
        tp = mega and bucket in self._tp_pmk_plans
        key = (bucket, with_logprobs, with_guided, with_lora, with_banned,
               with_mm, mega, tp)
        if key not in self._prefill_steps:
            self._prefill_steps[key] = steps_mod.build_prefill_step(
                self.cfg, self.rt, bucket, use_kernel=self.use_kernel,
                with_logprobs=with_logprobs, with_guided=with_guided,
                with_lora=with_lora, with_mm=with_mm,
                mega_plan=(self._pmk_plans[bucket]
                           if mega and not tp else None),
                tp_mega=((self._tp_pmk_plans[bucket], self.mesh)
                         if tp else None))
        return self._prefill_steps[key]

    def _mm_prefill_inputs(self, req: Request, tok_buf, bucket: int,
                           prefix_len: int) -> Dict:
        """Multimodal prefill inputs: embedding buffer with placeholder runs
        replaced by injected embeddings (reference RichEmbedding op,
        rich_embedding_op.cpp + extra_embedding.hpp:17-80) and mRoPE
        positions (hie_allspark_worker.py:31-105)."""
        gen = req.gen_cfg
        emb = self.params["embed_tokens"]["w"][jnp.asarray(tok_buf)] \
            .astype(self.dtype)
        for item in (gen.mm_info or ()):
            placeholder, rows = int(item[0]), np.asarray(item[1])
            idx = np.nonzero(np.asarray(tok_buf) == placeholder)[0]
            n = min(len(idx), rows.shape[0])
            if n:
                emb = emb.at[jnp.asarray(idx[:n])].set(
                    jnp.asarray(rows[:n], self.dtype))
        out = {"embeds": emb}
        if gen.mrope_positions is not None:
            pos = np.zeros((3, bucket), np.int32)
            p3 = np.asarray(gen.mrope_positions, np.int32)
            seg = p3[:, prefix_len:prefix_len + bucket]
            pos[:, :seg.shape[1]] = seg
            out["positions3"] = jnp.asarray(pos)
            req.pos_offset = int(gen.mrope_position_delta)
        return out

    def _decode_fn(self, with_logprobs: bool, with_guided: bool,
                   with_lora: bool = False,
                   with_banned: bool = False) -> Callable:
        # LoRA batches keep the megakernel when the plan supports the
        # in-kernel epilogue (interleaved dense; ops/pallas/megakernel.py
        # supports_lora_epilogue) — only unsupported layouts fall back
        plan = self.mega_plan
        if with_lora and not self._mega_lora_ok:
            plan = None
        tp = (self.tp_mega_plan, self.mesh) \
            if (self.tp_mega_plan is not None and not with_lora) else None
        if (not (with_logprobs or with_guided or with_lora or with_banned)
                and plan is None and tp is None):
            return self._decode_step
        key = ("dec", with_logprobs, with_guided, with_lora, with_banned,
               plan is not None, tp is not None)
        if key not in self._prefill_steps:
            self._prefill_steps[key] = steps_mod.build_decode_step(
                self.cfg, self.rt, use_kernel=self.use_kernel,
                with_logprobs=with_logprobs, with_guided=with_guided,
                with_lora=with_lora, with_banned=with_banned,
                megakernel_plan=plan, tp_megakernel=tp)
        return self._prefill_steps[key]

    def _decode_params(self, with_lora: bool):
        if self.mega_params is not None and (not with_lora or
                                             self._mega_lora_ok):
            return self.mega_params
        return self.params

    def _multi_decode_fn(self, with_banned: bool = False) -> Callable:
        tp = (self.tp_mega_plan, self.mesh) \
            if self.tp_mega_plan is not None else None
        key = ("multidec", self.rt.decode_steps_per_launch, with_banned,
               self.mega_plan is not None, tp is not None)
        if key not in self._prefill_steps:
            self._prefill_steps[key] = steps_mod.build_multi_decode_step(
                self.cfg, self.rt, self.rt.decode_steps_per_launch,
                use_kernel=self.use_kernel, with_banned=with_banned,
                megakernel_plan=self.mega_plan, tp_megakernel=tp)
        return self._prefill_steps[key]

    def _make_enforcer(self, req: Request):
        fmt = req.gen_cfg.response_format or {}
        if fmt.get("type") not in ("json_object", "json"):
            return None
        if self.tokenizer is None:
            logger.warning("json response_format requested but no tokenizer "
                           "installed; ignoring")
            return None
        from dashinfer_tpu.engine.guided import JsonFormatEnforcer
        return JsonFormatEnforcer(self.tokenizer, req.gen_cfg.eos_token_id,
                                  self.cfg.vocab_size)

    # -- request entry -------------------------------------------------------
    def register(self, req: Request, queue: ResultQueue):
        """Called on the USER thread before the enqueue message is submitted,
        so sync_request/Get observe the request immediately (GIL-atomic dict
        writes)."""
        self.requests[req.uuid] = req
        self.queues[req.uuid] = queue

    def enqueue(self, req: Request, queue: ResultQueue = None):
        if req.release_requested:   # released before the loop saw it
            return
        self.pending.append(req)
        self.stat.pendings += 1

    def free_slot_index(self) -> int:
        # admission_cap < max_batch when the KV pool cannot hold max_batch
        # sequences of the configured typical length (_check_pool_vs_workload)
        if sum(1 for r in self.slots if r is not None) >= self.admission_cap:
            return -1
        for i, r in enumerate(self.slots):
            if r is None:
                return i
        return -1

    # -- prefill admission ---------------------------------------------------
    def try_prefill_one(self) -> bool:
        """Admit + prefill the head of the pending queue. Returns True if a
        request was prefilled (reference RunTextGenerationContext,
        as_engine_prefill.cpp:188). Split into decide (pure scheduler
        bookkeeping: slot choice, prefix lookup, page commit) + execute
        (jit launch) so lockstep multi-host replication can serialize the
        decision before the launch (docs/multihost.md §Tick replication)."""
        d = self.prefill_decide()
        if d is None:
            return False
        self.prefill_execute(d)
        return True

    def prefill_decide(self) -> Optional["PrefillDecision"]:
        """Scheduler decision for one admission: which request, which slot,
        which pages. Mutates only host-side bookkeeping (slot map, allocator,
        pending queue) — no device work. Returns None when nothing can be
        admitted (empty queue, no slot, no memory)."""
        if not self.pending or not self._weights_resident():
            return None
        # admission may need slots/pages freed by finish processing of the
        # in-flight decode step — but draining unconditionally would
        # re-serialize every admission against the device; only block when
        # the free-slot scan actually comes up empty
        slot = self.free_slot_index()
        if slot < 0:
            self._drain_inflight()
            slot = self.free_slot_index()
            if slot < 0:
                return None
        req: Request = self.pending[0]

        prefix_len = 0
        prefix_pages: List[int] = []
        if self.prefix_cache is not None:
            prefix_len, prefix_pages, nodes = self._pc(
                self.prefix_cache.lookup, req.input_ids)
            req.prefix_nodes = nodes
            req.stat.prefix_cache_hit_len = prefix_len

        total_len = req.prompt_len
        new_tokens = req.input_ids[prefix_len:]
        if not new_tokens:
            # full hit: recompute the last token so there are fresh logits
            prefix_len -= 1
            if req.prefix_nodes:
                # keep node refs; the last page is still valid to reuse
                pass
            new_tokens = req.input_ids[prefix_len:]

        need_pages = math.ceil(total_len / self.rt.cache.page_size) - len(prefix_pages)
        if need_pages > self.allocator.num_pages:
            # PERMANENTLY infeasible: the prompt alone wants more pages
            # than the whole pool — waiting can never satisfy it (found
            # live: a pure-XLA MoE install floored the pool at
            # 2*max_batch and an in1024 request pended forever). Fail it
            # now with a clear error instead of deadlocking the queue.
            logger.error(
                "request %s needs %d pages but the pool has %d total; "
                "failing (raise kv pool / reduce prompt or max_length)",
                req.uuid[:8], need_pages, self.allocator.num_pages)
            if self.prefix_cache is not None:
                self.prefix_cache.release_nodes(req.prefix_nodes)
                req.prefix_nodes = []
            self.pending.popleft()
            self.stat.pendings -= 1
            req.status = GenerateRequestStatus.InternalError
            q = self.queues.get(req.uuid)
            if q is not None:
                q.set_status(GenerateRequestStatus.InternalError)
            return None
        if need_pages > 0 and not self.allocator.reserve(req.uuid, need_pages):
            # a finished in-flight request may free pages; then
            # pressure-release unreferenced prefix-cache pages, then retry
            # (reserve ACCUMULATES per uuid — at most one successful call)
            self._drain_inflight()
            ok = self.allocator.reserve(req.uuid, need_pages)
            if not ok and self.prefix_cache is not None:
                self.prefix_cache.evict(need_pages - self.allocator.num_free)
                ok = self.allocator.reserve(req.uuid, need_pages)
            if not ok:
                if self.prefix_cache is not None:
                    self.prefix_cache.release_nodes(req.prefix_nodes)
                    req.prefix_nodes = []
                return None  # no memory; stay pending (caller may evict/stop)

        try:
            pages = (list(prefix_pages) +
                     self.allocator.commit(req.uuid, max(need_pages, 0)))
        finally:
            self.allocator.release_reservation(req.uuid)

        req.logical_pages = [[p] for p in pages]
        req.slot = slot
        self.slots[slot] = req
        self.pending.popleft()
        self.stat.pendings -= 1
        self.stat.runnings += 1
        return PrefillDecision(req=req, slot=slot, pages=pages,
                               prefix_len=prefix_len)

    def prefill_execute(self, d: "PrefillDecision") -> None:
        req, slot, pages, prefix_len = d.req, d.slot, d.pages, d.prefix_len
        total_len = req.prompt_len
        new_tokens = req.input_ids[prefix_len:]

        # chunked prefill (improvement over the reference, which rejects
        # engine_max_prefill_length > 0, as_engine.cpp:439-443): run all but
        # the final chunk through KV-only steps, then finish normally.
        # pack_only residency: chunked prefill needs the XLA chunk step on
        # raw params — disabled (validate_request bounds prompts to the
        # prefill-megakernel buckets, so nothing needs chunking)
        chunk = self.rt.max_prefill_chunk \
            if self.residency != "pack_only" else 0
        base_counts = None
        if chunk > 0 and len(new_tokens) > chunk:
            base_counts = np.zeros((self.cfg.vocab_size,), np.int64)
            while len(new_tokens) > chunk:
                head, new_tokens = new_tokens[:chunk], new_tokens[chunk:]
                cbucket = self.bucket_for(len(head))
                cmaxPb = self._page_row_len(prefix_len + len(head), cbucket)
                crow = np.zeros((cmaxPb,), np.int32)
                crow[:min(len(pages), cmaxPb)] = pages[:cmaxPb]
                ctoks = np.zeros((cbucket,), np.int32)
                ctoks[:len(head)] = head
                cfn = self._prefill_chunk_fn(cbucket, cmaxPb)
                with self.profiler.phase(f"prefill_chunk[{cbucket}]"):
                    self.cache = cfn(self.params, self.cache,
                                     jnp.asarray(ctoks), jnp.asarray(crow),
                                     jnp.int32(prefix_len),
                                     jnp.int32(prefix_len + len(head)))
                np.add.at(base_counts, np.asarray(head, np.int64), 1)
                prefix_len += len(head)
            base_counts = jnp.asarray(
                np.clip(base_counts, 0, 2**31 - 1).astype(np.int32))

        # bucket by the NEW suffix only: a prefix-cache hit must not pay
        # query FLOPs for cached positions (reference RefFill crops the
        # input the same way — 0.254 s -> 0.030 s TTFT at 96% hit,
        # prefix_caching.rst). The page row independently covers the FULL
        # context; the query-offset attention path is the same machinery
        # chunked prefill uses.
        ps_ = self.rt.cache.page_size
        if self.residency == "pack_only":
            # snap to the smallest prefill-megakernel bucket (every
            # admitted prompt fits one — validate_request): sub-128
            # buckets would take the XLA path the raw params no longer
            # serve
            bucket = next(b for b in self._pack_only_buckets
                          if len(new_tokens) <= b)
        else:
            bucket = self.bucket_for(len(new_tokens))
        maxPb = self._page_row_len(prefix_len + len(new_tokens), bucket)

        page_row = np.zeros((maxPb,), np.int32)
        npg = min(len(pages), maxPb)
        page_row[:npg] = pages[:npg]

        tok_buf = np.zeros((bucket,), np.int32)
        tok_buf[:len(new_tokens)] = new_tokens

        gen = req.gen_cfg
        with_lp = bool(gen.logprobs)
        req.format_enforcer = self._make_enforcer(req)
        with_lora = (self.lora_manager is not None and
                     gen.lora_name is not None)
        banned = self._banned_ids(req)
        with_mm = bool(gen.mm_info) or gen.mrope_positions is not None
        # prefill megakernel fast path: whole-bucket fresh prefill only
        # (prefix-cache hits, chunked continuations, LoRA, multimodal take
        # the XLA path — see prefill_megakernel.supports_prefill)
        use_mega = ((bucket in self._pmk_plans or
                     bucket in self._tp_pmk_plans) and prefix_len == 0 and
                    base_counts is None and not with_lora and not with_mm and
                    self.mega_params is not None)
        if self.residency == "pack_only" and not use_mega:
            # defense in depth: validate_request should make this
            # unreachable; never launch an XLA prefill against params=None
            logger.error("pack_only prefill fell off the megakernel path "
                         "(bucket=%d prefix=%d) — failing request",
                         bucket, prefix_len)
            self._fail_admitted(req)
            return
        mm_kwargs = {}
        if with_mm:
            # after the pack_only guard: this path reads self.params
            mm_kwargs = self._mm_prefill_inputs(req, tok_buf, bucket,
                                                prefix_len)
        init = self._slot_init(req, slot)
        fn = self._prefill_fn(bucket, with_lp,
                              with_guided=req.format_enforcer is not None,
                              with_lora=with_lora,
                              with_banned=banned is not None,
                              with_mm=with_mm, mega=use_mega)
        t0 = time.monotonic()
        try:
            kwargs = dict(mm_kwargs)
            # full prompt ids for the on-device token history (ngram bans
            # scan it in-graph during decode)
            hr = np.full((self.rt.max_length,), -1, np.int32)
            hr[:req.prompt_len] = req.input_ids
            kwargs["hist"] = jnp.asarray(hr)
            if banned is not None:
                kwargs["banned"] = jnp.asarray(banned, jnp.int32)
            if base_counts is not None:
                kwargs["base_counts"] = base_counts
            if req.format_enforcer is not None:
                kwargs["allowed"] = jnp.asarray(
                    req.format_enforcer.allowed_mask())
            if with_lora:
                kwargs["lora_pool"] = self.lora_manager.pool
            with self.profiler.phase(f"prefill[{bucket}]"):
                tok, lp, self.cache, self.state = fn(
                    self.mega_params if use_mega else self.params,
                    self.cache, self.state,
                    jnp.asarray(tok_buf), jnp.asarray(page_row),
                    jnp.int32(prefix_len), jnp.int32(total_len), init,
                    **kwargs)
        except Exception:
            # fail THIS request atomically (reference converts per-rank
            # exceptions to request status, as_engine_prefill.cpp:216-232)
            logger.exception("prefill failed for %s", req.uuid[:8])
            self._fail_admitted(req)
            return

        self._cached_len[req.uuid] = total_len
        req.prefilled_len = total_len
        req.status = GenerateRequestStatus.Generating
        req.stat.time_in_queue = t0 - req.enqueue_time

        if self.prefix_cache is not None:
            self._pc(self.prefix_cache.insert, req.input_ids, pages, req)

        # the first token drains ASYNCHRONOUSLY through the same in-flight
        # mechanism decode uses — a blocking int(tok) here is a device sync
        # on the scheduler thread that stalls every running decode stream
        # for the whole transfer RTT (reference prefill/decode thread
        # split, as_engine.cpp:1321-1326)
        for arr in [tok] + list(lp or ()):
            try:
                arr.copy_to_host_async()
            except AttributeError:
                pass
        self._inflight_prefills.append((tok, lp, req, t0))
        self.stat.total_prefill_tokens += total_len

    def fail_decision(self, d: "PrefillDecision") -> None:
        """Unwind a prefill decision whose replication (or other
        pre-launch step) failed AFTER prefill_decide committed scheduler
        state: release the slot and pages and fail the decided request
        itself (engine._lockstep_prefill error path)."""
        self._fail_admitted(d.req)

    def _fail_admitted(self, req: Request) -> None:
        """Tear down an admitted-but-unserved request: clear its slot,
        release pages (incl. prefix-node refs), mark InternalError."""
        if req.slot >= 0 and self.slots[req.slot] is req:
            self.slots[req.slot] = None
        req.slot = -1
        self.stat.runnings -= 1
        self._release_pages(req)
        req.status = GenerateRequestStatus.InternalError
        q = self.queues.get(req.uuid)
        if q is not None:
            q.set_status(GenerateRequestStatus.InternalError)

    def _banned_ids(self, req: Request) -> Optional[List[int]]:
        """Next tokens banned THIS step: single/multi-token bad_words_ids +
        no_repeat_ngram (reference bad-words & ngram filters in the
        process_id kernels, SURVEY.md §2.7)."""
        g = req.gen_cfg
        if not g.bad_words_ids and not g.no_repeat_ngram_size:
            return None
        ctx = req.input_ids + req.generated_ids
        banned = set()
        for w in g.bad_words_ids:
            w = [int(t) for t in w]
            if len(w) == 1:
                banned.add(w[0])
            elif len(w) - 1 <= len(ctx) and ctx[-(len(w) - 1):] == w[:-1]:
                banned.add(w[-1])
        n = g.no_repeat_ngram_size
        if n > 0 and len(ctx) >= n - 1:
            tail = tuple(ctx[-(n - 1):]) if n > 1 else ()
            for i in range(len(ctx) - n + 1):
                if tuple(ctx[i:i + n - 1]) == tail:
                    banned.add(ctx[i + n - 1])
        cap = self.rt.max_banned_tokens
        out = sorted(banned)[:cap]
        return (out + [-1] * cap)[:cap]

    def _device_ban_fits(self, g: GenerationConfig) -> bool:
        """True when this request's bad-words/ngram config fits the
        on-device banning arrays (state.bad_words / max_ngram) — such
        requests are enforced in-graph with no per-step host sync.
        Oversized configs fall back to the synchronous host channel."""
        rt = self.rt
        if g.no_repeat_ngram_size > rt.max_ngram:
            return False
        if len(g.bad_words_ids) > rt.max_bad_words:
            return False
        return all(1 <= len(w) <= rt.max_bad_word_len
                   for w in g.bad_words_ids)

    def _needs_host_banned(self, req: Request) -> bool:
        g = req.gen_cfg
        if not g.bad_words_ids and not g.no_repeat_ngram_size:
            return False
        return not self._device_ban_fits(g)

    def _slot_init(self, req: Request, slot: int) -> steps_mod.SlotInit:
        g = req.gen_cfg
        max_stop = self.rt.max_stop_token_ids
        stop_ids = []
        if g.eos_token_id >= 0 and g.early_stopping:
            stop_ids.append(g.eos_token_id)
        for w in g.stop_words_ids:
            if len(w) == 1:
                stop_ids.append(int(w[0]))
        stop_ids = (stop_ids + [-1] * max_stop)[:max_stop]
        top_k = g.top_k if g.do_sample else 1
        lora_idx = -1
        if self.lora_manager is not None and g.lora_name is not None:
            lora_idx = self.lora_manager.index_of(g.lora_name)
        MW, WL = self.rt.max_bad_words, self.rt.max_bad_word_len
        bw = np.full((MW, WL), -1, np.int32)
        ng = 0
        if (g.bad_words_ids or g.no_repeat_ngram_size) and \
                self._device_ban_fits(g):
            # right-aligned: last col = banned token, preceding cols = the
            # required context tail (-1 = wildcard / shorter word)
            for j, w in enumerate(g.bad_words_ids):
                w = [int(t) for t in w]
                bw[j, WL - len(w):] = w
            ng = g.no_repeat_ngram_size
        return steps_mod.SlotInit(
            slot=jnp.int32(slot),
            temperature=jnp.float32(g.temperature),
            top_k=jnp.int32(top_k),
            top_p=jnp.float32(g.top_p),
            repetition_penalty=jnp.float32(g.repetition_penalty),
            presence_penalty=jnp.float32(g.presence_penalty),
            frequency_penalty=jnp.float32(g.frequency_penalty),
            seed=jnp.uint32(g.seed & 0xFFFFFFFF),
            min_gen_len=jnp.int32(g.min_length),
            stop_token_ids=jnp.asarray(stop_ids, jnp.int32),
            lora_idx=jnp.int32(lora_idx),
            pos_offset=jnp.int32(getattr(req, "pos_offset", 0)),
            bad_words=jnp.asarray(bw),
            ngram_n=jnp.int32(ng),
        )

    # -- decode --------------------------------------------------------------
    def active_requests(self) -> List[Request]:
        return [r for r in self.slots if r is not None]

    def decode_tick(self) -> int:
        """One batched decode step over all active slots. Returns number of
        active requests stepped (reference RunTextGenerationContinue,
        as_engine_decode.cpp:183).

        The loop is DOUBLE-BUFFERED: the step is launched asynchronously and
        the PREVIOUS step's tokens are drained to the host while it runs
        (blocking per-step sync costs tens of ms of dispatch round-trip on
        the TPU runtime; the reference similarly decouples token drain from
        the decode tick via lock-free queues, as_engine.cpp:2221-2319).
        Requests whose next logits depend on the previous host-visible token
        (guided JSON, bad-words/ngram bans) force a synchronous tick, as does
        a request one token from its length limit (so the pipeline never
        launches a step past a finished request).

        Split into decide (page allocations, evictions — pure host
        bookkeeping) + execute (jit launch) for lockstep multi-host
        replication (docs/multihost.md §Tick replication)."""
        d = self.decode_decide()
        if d is None:
            return 0
        return self.decode_execute(d)

    def decode_decide(self) -> Optional["DecodeDecision"]:
        act = self.active_requests()
        if not act or not self._weights_resident():
            self._drain_inflight()
            return None
        # bad-words/ngram bans run ON DEVICE from the slot token history
        # (steps.py with_banned; reference process_id.cu) so they no longer
        # force synchronous ticks — only guided JSON (host char-FSM, like
        # the reference's pinned-host format_enforcer.cpp masking) and
        # oversized ban configs (host fallback channel) do.
        sync_mode = any(
            r.format_enforcer is not None or self._needs_host_banned(r)
            for r in act)
        near_limit = any(
            self._cached_len.get(r.uuid, 0) >=
            min(r.gen_cfg.max_length, self.rt.max_length) for r in act)
        if (sync_mode or near_limit) and (self._inflight is not None or
                                          self._inflight_prefills):
            # sync requests (guided JSON / host-banned) need the enforcer
            # advanced through EVERY emitted token — including async
            # prefill first tokens still in flight — before this step's
            # allowed/banned sets are computed
            self._drain_inflight()
            act = self.active_requests()
            if not act:
                return None
        B, ps = self.rt.max_batch, self.rt.cache.page_size

        # -- multi-step fast path: N decode steps per launch (lax.scan) ------
        # eligible only when no request needs per-token host interaction and
        # every request has at least N tokens of budget left, so the window
        # never runs past a length limit (EOS/stop-words may still finish a
        # request mid-window; its later rows are discarded at drain time).
        N = self.rt.decode_steps_per_launch
        if N > 1 and not sync_mode and not any(
                r.gen_cfg.logprobs or r.gen_cfg.lora_name is not None
                for r in act):
            ok = all(
                r.uuid in self._cached_len and
                min(r.gen_cfg.max_length, self.rt.max_length) -
                self._cached_len[r.uuid] >= N for r in act)
            if ok:
                needs = []   # (req, step_i) page crossings inside the window
                for req in act:
                    clen = self._cached_len[req.uuid]
                    for i in range(N):
                        if (clen + i) % ps == 0:
                            needs.append((req, i))
                pages = None
                try:
                    pages = self.allocator.alloc(len(needs)) if needs else []
                except NoFreePages:
                    pass  # fall through to the single-step path (it evicts)
                if pages is not None:
                    npi = np.full((N, B), -1, np.int32)
                    for (req, i), g in zip(needs, pages):
                        req.logical_pages.append([g])
                        npi[i, req.slot] = g
                    wb = any(r.gen_cfg.bad_words_ids or
                             r.gen_cfg.no_repeat_ngram_size for r in act)
                    return DecodeDecision(kind="multi", act=act, npi=npi,
                                          with_banned=wb)

        new_page_ids = np.full((B,), -1, np.int32)

        # allocate pages for slots whose incoming token starts a new page
        for req in list(act):
            clen = self._cached_len.get(req.uuid)
            if clen is None:  # defensive: orphaned slot
                logger.error("slot %d holds unknown request %s; clearing",
                             req.slot, req.uuid[:8])
                self._finish(req, GenerateRequestStatus.InternalError)
                continue
            if clen % ps == 0:
                while True:
                    try:
                        g = self.allocator.alloc(1)[0]
                        break
                    except NoFreePages:
                        if (self.prefix_cache is not None and
                                self.prefix_cache.evict(1) > 0):
                            continue
                        if not self._evict_victim(exclude=req.uuid):
                            # evicting even this request is allowed in the
                            # reference; interrupt it too
                            self._interrupt(req)
                            g = None
                            break
                if g is None:
                    continue
                req.logical_pages.append([g])
                new_page_ids[req.slot] = g

        act = self.active_requests()
        if not act:
            return None
        return DecodeDecision(kind="single", act=act,
                              new_page_ids=new_page_ids, sync_mode=sync_mode)

    def decode_execute(self, d: "DecodeDecision") -> int:
        act = d.act
        if d.kind == "multi":
            N = self.rt.decode_steps_per_launch
            fn = self._multi_decode_fn(with_banned=d.with_banned)
            with self.profiler.phase(f"decode_x{N}"):
                tokens, self.cache, self.state = fn(
                    self._decode_params(False), self.cache,
                    self.state, jnp.asarray(d.npi))
            for req in act:
                self._cached_len[req.uuid] += N
            try:
                tokens.copy_to_host_async()
            except AttributeError:
                pass
            prev, self._inflight = self._inflight, (tokens, None, act)
            if prev is not None:
                self._drain_batch(prev)
            return len(act)

        B = self.rt.max_batch
        sync_mode, new_page_ids = d.sync_mode, d.new_page_ids
        with_lp = any(r.gen_cfg.logprobs for r in act)
        guided = [r for r in act if r.format_enforcer is not None]
        with_lora = (self.lora_manager is not None and
                     any(r.gen_cfg.lora_name is not None for r in act))
        # on-device banning for requests whose config fits the state
        # arrays; the host-computed channel only serves oversized configs
        # (those forced sync_mode in decode_decide)
        dev_banned = any(
            (r.gen_cfg.bad_words_ids or r.gen_cfg.no_repeat_ngram_size) and
            not self._needs_host_banned(r) for r in act)
        banned_rows = {r.slot: self._banned_ids(r) for r in act
                       if self._needs_host_banned(r)}
        host_banned = any(v is not None for v in banned_rows.values())
        fn = self._decode_fn(with_lp, bool(guided), with_lora,
                             with_banned=dev_banned)
        kwargs = {}
        if host_banned:
            cap = self.rt.max_banned_tokens
            bmat = np.full((B, cap), -1, np.int32)
            for slot, v in banned_rows.items():
                if v is not None:
                    bmat[slot] = v
            kwargs["banned"] = jnp.asarray(bmat)
        if guided:
            allowed = np.ones((B, self.cfg.vocab_size), bool)
            for r in guided:
                allowed[r.slot] = r.format_enforcer.allowed_mask()
            kwargs["allowed"] = jnp.asarray(allowed)
        if with_lora:
            kwargs["lora_pool"] = (
                self.lora_manager.pool_for_mega(self.mega_plan)
                if self._mega_lora_ok else self.lora_manager.pool)
        with self.profiler.phase("decode"):
            tokens, lp, self.cache, self.state = fn(
                self._decode_params(with_lora), self.cache, self.state,
                jnp.asarray(new_page_ids), **kwargs)

        # the launched step appends one token to every active slot's cache
        for req in act:
            self._cached_len[req.uuid] += 1
        # start the device->host token transfer NOW; the drain one tick later
        # then finds it complete (the transfer RTT on this runtime is ~30 ms,
        # well above the device step time — profiled via jax.profiler)
        try:
            tokens.copy_to_host_async()
        except AttributeError:
            pass
        prev, self._inflight = self._inflight, (tokens, lp, act)
        if sync_mode:
            self._drain_inflight()
        elif prev is not None:
            self._drain_batch(prev)
        return len(act)

    def _drain_inflight(self):
        """Block on the in-flight decode step (if any) and emit its tokens."""
        self._drain_prefill_tokens()
        batch, self._inflight = self._inflight, None
        if batch is not None:
            self._drain_batch(batch)

    def _drain_prefill_tokens(self):
        """Emit first tokens of async-launched prefills (oldest first).
        Runs before any decode-batch drain so a request's token order is
        preserved (its first decode batch was launched after its
        prefill)."""
        lst, self._inflight_prefills = self._inflight_prefills, []
        for tok_j, lp, req, t_launch in lst:
            if self.requests.get(req.uuid) is not req or req.slot < 0:
                continue   # stopped/evicted while the prefill was in flight
            try:
                tok = int(np.asarray(tok_j))
            except Exception:
                logger.exception("prefill drain failed for %s", req.uuid[:8])
                self._finish(req, GenerateRequestStatus.InternalError)
                continue
            t1 = time.monotonic()
            req.stat.first_token_time = t1
            req.stat.time_to_first_token = t1 - req.enqueue_time
            # NB: measured launch -> drain, which includes up to ~a decode
            # tick of in-flight queueing on top of the device prefill time
            # (the async drain has no completion timestamp); TTFT above is
            # exact — it's defined to first-token VISIBILITY
            req.stat.context_tps = req.prefilled_len / max(t1 - t_launch,
                                                           1e-9)
            if req.format_enforcer is not None:
                req.format_enforcer.advance(tok)
            self._emit(req, [tok], lp, 0)
            self._maybe_finish(req, tok)

    def _drain_batch(self, batch):
        self._drain_prefill_tokens()
        tokens_j, lp, act = batch
        tokens = np.asarray(tokens_j)
        # single-step launches yield [B]; multi-step launches yield [N, B]
        rows = tokens[None, :] if tokens.ndim == 1 else tokens
        n = 0
        for req in act:
            if self.requests.get(req.uuid) is not req or req.slot < 0:
                continue  # stopped/evicted while the step was in flight
            slot = req.slot
            for row in rows:
                tok = int(row[slot])
                if req.format_enforcer is not None:
                    req.format_enforcer.advance(tok)
                self._emit(req, [tok], lp, slot)
                self._maybe_finish(req, tok)
                n += 1
                if req.status not in (GenerateRequestStatus.Generating,
                                      GenerateRequestStatus.ContextFinished):
                    break  # finished mid-window; later rows are garbage
        self.stat.total_gen_tokens += n

    # -- token emission & finish ---------------------------------------------
    def _emit(self, req: Request, toks: List[int], lp, row: int):
        req.generated_ids.extend(toks)
        q = self.queues.get(req.uuid)
        if q is None:
            return
        if lp is not None and req.gen_cfg.logprobs:
            token_lp, top_ids, top_lp = lp
            n = req.gen_cfg.top_logprobs or 1
            pairs = [list(zip(np.asarray(top_ids)[row][:n].tolist(),
                              np.asarray(top_lp)[row][:n].tolist()))]
            q.append(toks, logprobs=pairs,
                     token_logprobs=[float(np.asarray(token_lp)[row])])
        else:
            q.append(toks)

    def _maybe_finish(self, req: Request, last_tok: int):
        g = req.gen_cfg
        finished = False
        if req.format_enforcer is not None and req.format_enforcer.complete:
            finished = True
        if g.early_stopping and g.eos_token_id >= 0 and last_tok == g.eos_token_id:
            finished = True
        if not finished and req.prompt_len + len(req.generated_ids) >= g.max_length:
            finished = True
        if not finished and g.stop_words_ids:
            gen = req.generated_ids
            for w in g.stop_words_ids:
                w = list(w)
                if len(w) <= len(gen) and gen[-len(w):] == w:
                    finished = True
                    break
        if finished:
            self._finish(req, GenerateRequestStatus.GenerateFinished)

    def _finish(self, req: Request, status: GenerateRequestStatus):
        req.status = status
        if req.slot >= 0:
            mask = np.zeros((self.rt.max_batch,), bool)
            mask[req.slot] = True
            self.state = self._deactivate(self.state, jnp.asarray(mask))
            self.slots[req.slot] = None
            req.slot = -1
            self.stat.runnings -= 1
        self._release_pages(req)
        gen_time = time.monotonic() - (req.stat.first_token_time or
                                       time.monotonic())
        if len(req.generated_ids) > 1 and gen_time > 0:
            req.stat.generate_tps = (len(req.generated_ids) - 1) / gen_time
        q = self.queues.get(req.uuid)
        if q is not None:
            q.set_stat(req.stat)
            q.set_status(status)

    def _release_pages(self, req: Request):
        pages = [g for grp in req.logical_pages for g in grp]
        if self.prefix_cache is not None:
            pages = self.prefix_cache.unref(req, pages)
        if pages:
            self.allocator.free(pages)
        req.logical_pages = []

    # -- eviction (reference ChooseVictimRequest, as_engine_decode.cpp) ------
    def _evict_victim(self, exclude: Optional[str] = None) -> bool:
        self._drain_inflight()  # a finished in-flight request may free pages
        cands = [r for r in self.active_requests() if r.uuid != exclude]
        if not cands:
            return False
        if self.rt.eviction_strategy == EvictionStrategy.MAX_LENGTH:
            victim = max(cands, key=lambda r: self._cached_len[r.uuid])
        else:
            import random
            victim = random.choice(cands)
        logger.warning("cache OOM: interrupting request %s (len %d)",
                       victim.uuid[:8], self._cached_len[victim.uuid])
        self._interrupt(victim)
        return True

    def _interrupt(self, req: Request):
        req.interrupted = True
        self.stat.interrupted += 1
        self._finish(req, GenerateRequestStatus.GenerateInterrupted)

    def stop_request(self, uuid: str) -> bool:
        self._drain_inflight()
        req = self.requests.get(uuid)
        if req is None:
            return False
        if req in self.pending:
            self.pending.remove(req)
            self.stat.pendings -= 1
            self._finish(req, GenerateRequestStatus.GenerateInterrupted)
            return True
        if req.status in (GenerateRequestStatus.Generating,
                          GenerateRequestStatus.ContextFinished):
            self._finish(req, GenerateRequestStatus.GenerateInterrupted)
        return True

    def release_request(self, uuid: str):
        self.stop_request(uuid)
        self.requests.pop(uuid, None)
        self.queues.pop(uuid, None)
        self._cached_len.pop(uuid, None)

    def _gather_rows_fn(self):
        if self._gather_rows is None:
            def g(cache, rows):
                out = [cache.k[rows], cache.v[rows]]
                if cache.k_qparams is not None:
                    out += [cache.k_qparams[rows], cache.v_qparams[rows]]
                return tuple(out)
            self._gather_rows = jax.jit(g)
        return self._gather_rows

    def _pager_gather(self, rows):
        return jax.device_get(self._gather_rows_fn()(self.cache, rows))

    def _pager_scatter(self, rows, blob):
        if self._scatter_rows is None:
            def sct(cache, rows, blob):
                from dashinfer_tpu.runtime.kv_cache import KVCache
                k = cache.k.at[rows].set(blob[0])
                v = cache.v.at[rows].set(blob[1])
                if cache.k_qparams is not None:
                    kq = cache.k_qparams.at[rows].set(blob[2])
                    vq = cache.v_qparams.at[rows].set(blob[3])
                else:
                    kq = vq = None
                return KVCache(k=k, v=v, k_qparams=kq, v_qparams=vq)
            self._scatter_rows = jax.jit(sct, donate_argnums=(0,))
        self.cache = self._scatter_rows(self.cache, rows, blob)

    # -- generic non-generative forward (reference "Operator" model,
    #    csrc/core/model/operator.cpp:19: runs the graph without the
    #    generation loop, for reward/embedding-style models) ----------------
    def run_forward(self, input_ids: List[int]) -> Dict[str, np.ndarray]:
        """One full forward over the prompt; no slot, no sampling. Returns
        {"logits": [T, V] f32, "last_hidden_state": [T, hid]}. KV pages are
        scratch — allocated for the call and freed before returning."""
        from dashinfer_tpu.models import transformer
        if self.params is None:
            raise RuntimeError(
                "run_forward needs the raw params resident "
                "(weight_residency=pack_only serves generation only)")
        T = len(input_ids)
        bucket = self.bucket_for(T)
        ps = self.rt.cache.page_size
        npages = -(-bucket // ps)
        # throwaway KV cache sized to this call: the forward is functional
        # and must not force XLA to copy the serving pool (no donation here)
        scratch = create_kv_cache(
            self.cfg, dataclasses.replace(self.rt.cache, num_pages=npages),
            npages * self.cfg.num_layers, model_dtype=self.dtype)
        key = ("opfwd", bucket)
        if key not in self._prefill_steps:
            self._prefill_steps[key] = jax.jit(functools.partial(
                transformer.prefill_forward_captured, self.cfg,
                mode=self.rt.cache.mode))
        toks = np.zeros((bucket,), np.int32)
        toks[:T] = input_ids
        per_layer, logits = self._prefill_steps[key](
            self.params, jnp.asarray(toks), scratch,
            jnp.arange(npages, dtype=jnp.int32), jnp.int32(0), jnp.int32(T))
        return {
            "logits": np.asarray(logits)[:T],
            "last_hidden_state": np.asarray(per_layer)[-1][:T],
        }

    # -- weight swap (reference UnloadModelFromDeviceMemory /
    #    ReloadModelToDeviceMemory, allspark.h:542-549; weight_manager.h:108-120)
    def unload_weights_to_host(self):
        self._drain_inflight()
        if self._swapped_out:
            return
        self._swapped_out = True
        emb_alias = (self.params is not None and
                     self.mega_params is not None and
                     self.mega_params.get("embed")
                     is self.params["embed_tokens"]["w"])
        if self.params is not None:
            # remember shardings so a TP-sharded layout survives the trip
            self._params_sh = jax.tree.map(
                lambda a: a.sharding, self.params) \
                if self.mesh is not None else None
            self._params_host = jax.device_get(self.params)
            self.params = None
        if self.mega_params is not None:
            # prefill_packed may alias the decode pack (shared pack), and
            # the mega embed may alias the raw embed — drop the aliases
            # before the host round trip so reload doesn't materialize
            # second device copies the pool plan never budgeted
            self._mega_shared_pp = (
                self.mega_params.get("prefill_packed")
                is self.mega_params.get("packed"))
            self._mega_shared_embed = emb_alias
            mp = dict(self.mega_params)
            if self._mega_shared_pp:
                mp.pop("prefill_packed")
            if self._mega_shared_embed:
                mp.pop("embed")
            self._mega_sh = jax.tree.map(
                lambda a: a.sharding, mp) \
                if self.mesh is not None else None
            self._mega_host = jax.device_get(mp)
            self.mega_params = None
        logger.info("weights swapped to host RAM")

    def reload_weights_to_device(self):
        if not self._swapped_out:
            return
        self._swapped_out = False
        if self._params_host is not None:
            if getattr(self, "_params_sh", None) is not None:
                self.params = jax.tree.map(
                    jax.device_put, self._params_host, self._params_sh)
            else:
                self.params = jax.tree.map(jnp.asarray, self._params_host)
            self._params_host = None
        if getattr(self, "_mega_host", None) is not None:
            if getattr(self, "_mega_sh", None) is not None:
                self.mega_params = jax.tree.map(
                    jax.device_put, self._mega_host, self._mega_sh)
            else:
                self.mega_params = jax.tree.map(jnp.asarray, self._mega_host)
            if getattr(self, "_mega_shared_pp", False):
                self.mega_params["prefill_packed"] = \
                    self.mega_params["packed"]
            if getattr(self, "_mega_shared_embed", False):
                # restore the embed alias (ONE device copy, as planned)
                self.mega_params["embed"] = \
                    self.params["embed_tokens"]["w"]
            self._mega_host = None
        logger.info("weights reloaded to device")

    # -- host-tier pager (reference swap pools + pinned workspace,
    #    prefix_cache_manager.h:201-210; here: jitted pool-row gather/scatter
    #    + device_get/put) ----------------------------------------------------
    def make_pager(self):
        return _DevicePager(self)

    # -- stats ----------------------------------------------------------------
    def update_stats(self):
        s = self.stat
        s.total_span = self.allocator.num_pages
        s.free_span = self.allocator.num_free
        s.used_span = s.total_span - s.free_span
        if self.prefix_cache is not None:
            s.prefix_cache_hit_rate = self.prefix_cache.hit_rate()
        s.state_digest = self.state_digest()

    def state_digest(self) -> str:
        """Deterministic hash of scheduler state (allocator free count,
        active slot map, per-request progress, pending queue). Hosts
        consuming the same lockstep stream must agree; a mismatch means a
        diverged follower that must be restarted (docs/multihost.md)."""
        import zlib
        sig: List = [self.allocator.num_free]
        for i, r in enumerate(self.slots):
            if r is not None:
                sig.append((i, r.uuid, self._cached_len.get(r.uuid, -1),
                            len(r.generated_ids),
                            [int(g) for grp in r.logical_pages for g in grp]))
        sig.append([r.uuid for r in self.pending])
        return "%08x" % (zlib.crc32(repr(sig).encode()) & 0xFFFFFFFF)
