"""Client engine: the in-process Engine API over the daemon's TCP socket.

Mirrors the reference's `AsClientEngine` (csrc/service/allspark_client.h:18,
allspark_client_impl.*): every engine method proxied, ResultQueue operations
routed by request uuid, so servers/benchmarks run unchanged against a remote
engine process.
"""

import json
import socket
import threading
from typing import Any, Dict, List, Optional, Tuple

from dashinfer_tpu.runtime.request import GenerateRequestStatus, RequestHandle
from dashinfer_tpu.utils import get_logger

logger = get_logger("service.client")


class _Rpc:
    def __init__(self, host: str, port: int, timeout_s: float = 600.0):
        self._sock = socket.create_connection((host, port), timeout=timeout_s)
        self._f = self._sock.makefile("rwb")
        self._lock = threading.Lock()
        self._next_id = 0

    def call(self, method: str, **params):
        with self._lock:
            self._next_id += 1
            mid = self._next_id
            line = json.dumps({"id": mid, "method": method,
                               "params": params}) + "\n"
            self._f.write(line.encode())
            self._f.flush()
            resp = json.loads(self._f.readline())
        if not resp.get("ok"):
            raise RuntimeError(f"rpc {method}: {resp.get('error')}")
        return resp.get("result")

    def stream(self, method: str, **params):
        """Server-push generator: yields each result line until the server
        marks done. Holds the connection lock for the stream's duration —
        use a dedicated _Rpc connection per concurrent stream."""
        with self._lock:
            self._next_id += 1
            mid = self._next_id
            line = json.dumps({"id": mid, "method": method,
                               "params": params}) + "\n"
            self._f.write(line.encode())
            self._f.flush()
            while True:
                resp = json.loads(self._f.readline())
                if not resp.get("ok"):
                    raise RuntimeError(f"rpc {method}: {resp.get('error')}")
                result = resp.get("result")
                yield result
                if result.get("done"):
                    return

    def close(self):
        try:
            self._sock.close()
        except Exception:
            pass


class ClientResultQueue:
    """Remote ResultQueue proxy (reference per-request UUID RPCs,
    allspark_service.proto Get/GetNoWait/GenerateStatus)."""

    def __init__(self, rpc: _Rpc, uuid: str):
        self._rpc = rpc
        self.uuid = uuid

    def Get(self, timeout_s: Optional[float] = None) -> List[int]:
        r = self._rpc.call("get", uuid=self.uuid, timeout_s=timeout_s)
        return r["tokens"]

    def GetNoWait(self) -> List[int]:
        return self._rpc.call("get_no_wait", uuid=self.uuid)["tokens"]

    def GenerateStatus(self) -> GenerateRequestStatus:
        return GenerateRequestStatus[self._rpc.call("generate_status",
                                                    uuid=self.uuid)]

    def GetAllGeneratedTokens(self) -> List[int]:
        return self._rpc.call("all_tokens", uuid=self.uuid)

    def RequestStatInfo(self) -> Dict[str, Any]:
        return self._rpc.call("request_stats", uuid=self.uuid)

    def Stream(self, host: Optional[str] = None, port: Optional[int] = None,
               tick_s: float = 0.5):
        """Server-push token stream: yields {"tokens", "status", "done"}
        chunks as the daemon emits them (no per-chunk RPC round trip —
        the reference's gRPC server-streaming analog). Opens a dedicated
        connection (defaults to the daemon that issued this queue): the
        stream occupies it until the request finishes."""
        if host is None or port is None:
            host, port = self._addr
        rpc = _Rpc(host, port)
        try:
            for chunk in rpc.stream("stream_request", uuid=self.uuid,
                                    tick_s=tick_s):
                yield chunk
        finally:
            rpc.close()


class ClientEngine:
    """Drop-in Engine facade over a remote daemon (reference AsClientEngine)."""

    def __init__(self, host: str = "127.0.0.1", port: int = 7031,
                 timeout_s: float = 600.0):
        self._host, self._port = host, port
        self._rpc = _Rpc(host, port, timeout_s)
        assert self._rpc.call("ping") == "pong"

    # -- model control ---------------------------------------------------------
    def models(self) -> List[str]:
        return self._rpc.call("models")

    def start_model(self, name: str):
        self._rpc.call("start_model", name=name)
        return self

    def stop_model(self, name: str):
        self._rpc.call("stop_model", name=name)
        return self

    def release_model(self, name: str):
        self._rpc.call("release_model", name=name)
        return self

    def get_engine_stat(self, name: str) -> Dict:
        return self._rpc.call("engine_stats", name=name)

    def get_op_profiling_info(self, name: str) -> Dict:
        return self._rpc.call("profiling_info", name=name)

    def unload_model_from_device_memory(self, name: str):
        self._rpc.call("unload_model_from_device_memory", name=name)
        return self

    def reload_model_to_device_memory(self, name: str):
        self._rpc.call("reload_model_to_device_memory", name=name)
        return self

    # -- requests ----------------------------------------------------------------
    def start_request(self, name: str, input_ids: List[int], gen_cfg=None
                      ) -> Tuple[GenerateRequestStatus, RequestHandle,
                                 ClientResultQueue]:
        cfg = None
        if gen_cfg is not None:
            cfg = {k: v for k, v in gen_cfg.__dict__.items()
                   if v is not None and k not in ("mm_info",
                                                  "mrope_positions")}
            cfg["stop_words_ids"] = [list(w) for w in
                                     cfg.get("stop_words_ids", ())]
            cfg["bad_words_ids"] = [list(w) for w in
                                    cfg.get("bad_words_ids", ())]
        r = self._rpc.call("start_request", name=name,
                           input_ids=[int(t) for t in input_ids],
                           gen_cfg=cfg)
        handle = RequestHandle(r["uuid"], name)
        q = ClientResultQueue(self._rpc, r["uuid"])
        q._addr = (self._host, self._port)  # for Stream()
        return (GenerateRequestStatus[r["status"]], handle, q)

    def sync_request(self, name: str, handle: RequestHandle,
                     timeout_s: Optional[float] = None):
        self._rpc.call("sync_request", uuid=handle.uuid, timeout_s=timeout_s)
        return self

    def stop_request(self, name: str, handle: RequestHandle):
        self._rpc.call("stop_request", uuid=handle.uuid)
        return self

    def release_request(self, name: str, handle: RequestHandle):
        self._rpc.call("release_request", uuid=handle.uuid)
        return self

    # -- lora --------------------------------------------------------------------
    def load_lora(self, name: str, lora_name: str, path: str,
                  alpha=None, rank=None):
        self._rpc.call("load_lora", name=name, lora_name=lora_name,
                       path=path, alpha=alpha, rank=rank)
        return self

    def unload_lora(self, name: str, lora_name: str):
        self._rpc.call("unload_lora", name=name, lora_name=lora_name)
        return self

    def close(self):
        self._rpc.close()
