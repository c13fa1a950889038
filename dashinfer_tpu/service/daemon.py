"""Engine daemon: serves the full engine API over a line-JSON TCP socket.

Protocol: one JSON object per line. Request: {"id": n, "method": str,
"params": {...}}; response: {"id": n, "ok": bool, "result"|"error": ...}.
Every method of the in-process Engine is mirrored, including the
ResultQueue operations keyed by request uuid (reference
allspark_service.proto:11-78 — Get/GetNoWait/GenerateStatus RPCs).

Launch:  python -m dashinfer_tpu.service.daemon --model <hf_dir> \
             --name m --port 7031 [--quant a16w4] [--max-batch 16] ...
or embed: EngineDaemon(engine).serve(port) from an existing process.
"""

import argparse
import json
import socket
import socketserver
import threading
from typing import Any, Dict, Optional

from dashinfer_tpu.runtime.request import GenerateRequestStatus, RequestHandle
from dashinfer_tpu.utils import get_logger

logger = get_logger("service.daemon")


class _Handler(socketserver.StreamRequestHandler):
    def handle(self):
        daemon: "EngineDaemon" = self.server.daemon  # type: ignore
        for line in self.rfile:
            line = line.strip()
            if not line:
                continue
            try:
                msg = json.loads(line)
                if msg.get("method") == "stream_request":
                    # server-push: MULTIPLE response lines with the same id,
                    # final one marked done (the reference streams via gRPC
                    # server streaming; the polling get/get_no_wait RPCs
                    # remain for parity)
                    self._stream(daemon, msg)
                    continue
                result = daemon.dispatch(msg["method"],
                                         msg.get("params") or {})
                resp = {"id": msg.get("id"), "ok": True, "result": result}
            except Exception as e:
                logger.exception("rpc %s failed", line[:80])
                resp = {"id": msg.get("id") if isinstance(msg, dict) else None,
                        "ok": False, "error": f"{type(e).__name__}: {e}"}
            self.wfile.write((json.dumps(resp) + "\n").encode())
            self.wfile.flush()

    def _stream(self, daemon: "EngineDaemon", msg):
        mid = msg.get("id")
        p = msg.get("params") or {}
        try:
            q = daemon._queue(p["uuid"])
            tick = float(p.get("tick_s") or 0.5)
            while True:
                elems = q.Get(timeout_s=tick)
                status = q.GenerateStatus()
                done = status in (GenerateRequestStatus.GenerateFinished,
                                  GenerateRequestStatus.GenerateInterrupted,
                                  GenerateRequestStatus.InternalError)
                toks = list(getattr(elems, "ids_from_generate", []) or []) \
                    if elems is not None else []
                if toks or done:
                    self.wfile.write((json.dumps(
                        {"id": mid, "ok": True,
                         "result": {"tokens": toks, "status": status.name,
                                    "done": done}}) + "\n").encode())
                    self.wfile.flush()
                if done:
                    return
        except Exception as e:
            logger.exception("stream_request failed")
            self.wfile.write((json.dumps(
                {"id": mid, "ok": False,
                 "error": f"{type(e).__name__}: {e}"}) + "\n").encode())
            self.wfile.flush()


class _Server(socketserver.ThreadingTCPServer):
    allow_reuse_address = True
    daemon_threads = True


class EngineDaemon:
    """Wraps an Engine; dispatches RPC methods (reference
    AllSparkServiceImpl, csrc/service/allspark_service.cpp:86)."""

    def __init__(self, engine):
        self.engine = engine
        self._handles: Dict[str, RequestHandle] = {}
        self._lock = threading.Lock()
        self._server: Optional[_Server] = None

    # -- dispatch -------------------------------------------------------------
    def dispatch(self, method: str, p: Dict[str, Any]):
        fn = getattr(self, "rpc_" + method, None)
        if fn is None:
            raise ValueError(f"unknown method {method}")
        return fn(**p)

    def _queue(self, uuid: str):
        h = self._handles.get(uuid)
        if h is None:
            raise KeyError(f"unknown request {uuid}")
        q = self.engine._models[h.model_name].queues.get(uuid)
        if q is None:
            raise KeyError(f"request {uuid} has no queue")
        return q

    # -- engine control --------------------------------------------------------
    def rpc_ping(self):
        return "pong"

    def rpc_start_model(self, name):
        self.engine.start_model(name)
        return True

    def rpc_stop_model(self, name):
        self.engine.stop_model(name)
        return True

    def rpc_release_model(self, name):
        self.engine.release_model(name)
        return True

    def rpc_models(self):
        return list(self.engine._models.keys())

    def rpc_engine_stats(self, name):
        return self.engine.get_engine_stat(name)

    def rpc_profiling_info(self, name):
        return self.engine.get_op_profiling_info(name)

    def rpc_unload_model_from_device_memory(self, name):
        self.engine.unload_model_from_device_memory(name)
        return True

    def rpc_reload_model_to_device_memory(self, name):
        self.engine.reload_model_to_device_memory(name)
        return True

    # -- requests ---------------------------------------------------------------
    def rpc_start_request(self, name, input_ids, gen_cfg=None):
        from dashinfer_tpu.config import GenerationConfig
        cfg = GenerationConfig()
        if gen_cfg:
            cfg.update(gen_cfg)
        status, handle, _ = self.engine.start_request(name, input_ids, cfg)
        with self._lock:
            self._handles[handle.uuid] = handle
        return {"uuid": handle.uuid, "status": status.name}

    @staticmethod
    def _tokens(elems):
        if elems is None:
            return []
        return list(getattr(elems, "ids_from_generate", []) or [])

    def rpc_get(self, uuid, timeout_s=None):
        q = self._queue(uuid)
        elems = q.Get(timeout_s=timeout_s)
        return {"tokens": self._tokens(elems),
                "status": q.GenerateStatus().name}

    def rpc_get_no_wait(self, uuid):
        q = self._queue(uuid)
        elems = q.GetNoWait()
        return {"tokens": self._tokens(elems),
                "status": q.GenerateStatus().name}

    def rpc_generate_status(self, uuid):
        return self._queue(uuid).GenerateStatus().name

    def rpc_all_tokens(self, uuid):
        return self._queue(uuid).GetAllGeneratedTokens()

    def rpc_request_stats(self, uuid):
        return self._queue(uuid).RequestStatInfo()

    def rpc_sync_request(self, uuid, timeout_s=None):
        h = self._handles[uuid]
        self.engine.sync_request(h.model_name, h, timeout_s=timeout_s)
        return True

    def rpc_stop_request(self, uuid):
        h = self._handles[uuid]
        self.engine.stop_request(h.model_name, h)
        return True

    def rpc_release_request(self, uuid):
        h = self._handles.pop(uuid, None)
        if h is not None:
            self.engine.release_request(h.model_name, h)
        return True

    # -- lora -------------------------------------------------------------------
    def rpc_load_lora(self, name, lora_name, path, alpha=None, rank=None):
        self.engine.load_lora(name, lora_name, path, alpha, rank)
        return True

    def rpc_unload_lora(self, name, lora_name):
        self.engine.unload_lora(name, lora_name)
        return True

    # -- serving ----------------------------------------------------------------
    def serve(self, port: int, host: str = "127.0.0.1", block: bool = True):
        self._server = _Server((host, port), _Handler)
        self._server.daemon = self  # type: ignore
        logger.info("engine daemon listening on %s:%d", host, port)
        if block:
            self._server.serve_forever()
        else:
            t = threading.Thread(target=self._server.serve_forever,
                                 daemon=True)
            t.start()
        return self._server

    def shutdown(self):
        if self._server is not None:
            self._server.shutdown()
            self._server = None


def main(argv=None):
    ap = argparse.ArgumentParser(description="dashinfer_tpu engine daemon")
    ap.add_argument("--model", required=True, help="HF checkpoint dir")
    ap.add_argument("--name", default="model")
    ap.add_argument("--port", type=int, default=7031)
    ap.add_argument("--host", default="127.0.0.1")
    ap.add_argument("--max-batch", type=int, default=16)
    ap.add_argument("--max-length", type=int, default=4096)
    ap.add_argument("--quant", default="none")
    ap.add_argument("--kv-cache", default="default",
                    choices=["default", "int8", "uint4"])
    ap.add_argument("--prefix-cache", action="store_true")
    args = ap.parse_args(argv)

    from dashinfer_tpu import Engine, RuntimeConfigBuilder
    from dashinfer_tpu.config import CacheMode
    rt = (RuntimeConfigBuilder(args.name)
          .max_length(args.max_length).max_batch(args.max_batch)
          .kv_cache_mode(CacheMode(args.kv_cache))
          .prefix_cache(args.prefix_cache))
    if args.quant != "none":
        rt = rt.weight_quant(args.quant)
    engine = Engine().install_model(args.model, rt.build())
    engine.start_model(args.name)
    EngineDaemon(engine).serve(args.port, args.host)


if __name__ == "__main__":
    main()
