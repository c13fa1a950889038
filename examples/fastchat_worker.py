"""FastChat model worker backed by the dashinfer_tpu Engine.

TPU-native analog of the reference's FastChat integration
(examples/api_server/fschat/allspark_worker.py): registers with a FastChat
controller, serves /worker_generate_stream and /worker_generate by
streaming tokens out of the Engine's ResultQueue, and maps the FastChat
parameter surface onto GenerationConfig (same unsupported-parameter
warnings as the reference: stop strings, beam search, best_of).

Requires `fastchat` + `fastapi` + `uvicorn` (not bundled); run:

  python examples/fastchat_worker.py --model <hf_dir> \
      --controller http://localhost:21001 \
      --worker http://localhost:21002 --port 21002 \
      [--quant a16w4] [--kv-cache int8] [--max-batch 16]
"""

import argparse
import asyncio
import json
import uuid as uuid_mod

try:
    from fastapi import FastAPI, Request
    from fastapi.responses import JSONResponse, StreamingResponse
    import uvicorn
    from fastchat.serve.base_model_worker import BaseModelWorker
except ImportError as e:  # pragma: no cover - optional integration
    raise SystemExit(
        f"fastchat integration needs fastchat/fastapi/uvicorn: {e}")

from dashinfer_tpu import Engine, GenerationConfig, RuntimeConfigBuilder
from dashinfer_tpu.runtime.request import GenerateRequestStatus

app = FastAPI()


def _gen_cfg(params, tokenizer, max_length):
    """FastChat params -> GenerationConfig (reference generate_stream
    mapping, allspark_worker.py:133-199)."""
    cfg = GenerationConfig(max_length=max_length)
    if params.get("temperature") is not None:
        cfg.temperature = float(params["temperature"])
        cfg.do_sample = cfg.temperature > 1e-4
    if params.get("top_k") is not None:
        k = int(params["top_k"])
        cfg.top_k = 0 if k == -1 else k
    if params.get("top_p") is not None:
        cfg.top_p = float(params["top_p"])
    if params.get("repetition_penalty") is not None:
        cfg.repetition_penalty = float(params["repetition_penalty"])
    if params.get("presence_penalty") is not None:
        cfg.presence_penalty = float(params["presence_penalty"])
    if params.get("frequency_penalty") is not None:
        cfg.frequency_penalty = float(params["frequency_penalty"])
    if params.get("seed") is not None:
        cfg.seed = int(params["seed"])
    stop_ids = set(params.get("stop_token_ids") or [])
    if tokenizer.eos_token_id is not None:
        stop_ids.add(int(tokenizer.eos_token_id))
        cfg.eos_token_id = int(tokenizer.eos_token_id)
    cfg.stop_words_ids = [[int(t)] for t in stop_ids]
    if params.get("response_format") is not None:
        cfg.response_format = params["response_format"]  # guided JSON works
    for unsupported in ("stop", "use_beam_search", "best_of"):
        if params.get(unsupported):
            print(f"warning: `{unsupported}` is not supported; ignored")
    return cfg


class DashInferTpuWorker(BaseModelWorker):
    def __init__(self, controller_addr, worker_addr, model_path,
                 model_names, limit_worker_concurrency, conv_template,
                 engine_args):
        super().__init__(controller_addr, worker_addr,
                         str(uuid_mod.uuid4())[:8], model_path, model_names,
                         limit_worker_concurrency,
                         conv_template=conv_template)
        rt = (RuntimeConfigBuilder("worker")
              .max_length(engine_args.max_length)
              .max_batch(engine_args.max_batch))
        if engine_args.quant != "none":
            rt = rt.weight_quant(engine_args.quant)
        if engine_args.kv_cache != "default":
            from dashinfer_tpu.config import CacheMode
            rt = rt.kv_cache_mode(CacheMode(engine_args.kv_cache))
        self.engine = Engine().install_model(
            model_path, rt.build(), tokenizer=self.tokenizer)
        self.engine.start_model("worker")
        self.max_length = engine_args.max_length
        self.context_len = engine_args.max_length
        self.init_heart_beat()

    async def generate_stream(self, params):
        self.call_ct += 1
        prompt = params.pop("prompt")
        echo = params.get("echo", True)
        ids = self.tokenizer.encode(prompt)
        max_new = int(params.get("max_new_tokens") or 256)
        cfg = _gen_cfg(params, self.tokenizer,
                       min(len(ids) + max_new, self.max_length))
        _, handle, queue = self.engine.start_request("worker", ids, cfg)
        prefix = prompt if echo else ""
        try:
            sent = 0
            while True:
                elems = await asyncio.to_thread(queue.Get, 1.0)
                toks = queue.GetAllGeneratedTokens()
                status = queue.GenerateStatus()
                if len(toks) > sent or elems is None:
                    sent = len(toks)
                    yield {
                        "text": prefix + self.tokenizer.decode(toks),
                        "usage": {"prompt_tokens": len(ids),
                                  "completion_tokens": len(toks),
                                  "total_tokens": len(ids) + len(toks)},
                        "error_code": 0,
                        "finish_reason": None,
                    }
                if status in (GenerateRequestStatus.GenerateFinished,
                              GenerateRequestStatus.GenerateInterrupted,
                              GenerateRequestStatus.InternalError):
                    done = "stop" if status == \
                        GenerateRequestStatus.GenerateFinished else "abort"
                    yield {
                        "text": prefix + self.tokenizer.decode(toks),
                        "usage": {"prompt_tokens": len(ids),
                                  "completion_tokens": len(toks),
                                  "total_tokens": len(ids) + len(toks)},
                        "error_code": 0,
                        "finish_reason": done,
                    }
                    break
        finally:
            self.engine.release_request("worker", handle)

    async def generate(self, params):
        out = None
        async for out in self.generate_stream(params):
            pass
        return out


worker: DashInferTpuWorker = None  # set in main()


@app.post("/worker_generate_stream")
async def api_generate_stream(request: Request):
    params = await request.json()

    async def gen():
        async for chunk in worker.generate_stream(params):
            yield json.dumps(chunk).encode() + b"\0"

    return StreamingResponse(gen())


@app.post("/worker_generate")
async def api_generate(request: Request):
    params = await request.json()
    return JSONResponse(await worker.generate(params))


@app.post("/worker_get_status")
async def api_get_status(request: Request):
    return worker.get_status()


@app.post("/count_token")
async def api_count_token(request: Request):
    return worker.count_token(await request.json())


@app.post("/worker_get_conv_template")
async def api_get_conv(request: Request):
    return worker.get_conv_template()


@app.post("/model_details")
async def api_model_details(request: Request):
    return {"context_length": worker.context_len}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", required=True)
    ap.add_argument("--model-names", default=None)
    ap.add_argument("--controller", default="http://localhost:21001")
    ap.add_argument("--worker", default="http://localhost:21002")
    ap.add_argument("--host", default="0.0.0.0")
    ap.add_argument("--port", type=int, default=21002)
    ap.add_argument("--limit-worker-concurrency", type=int, default=64)
    ap.add_argument("--conv-template", default=None)
    ap.add_argument("--max-batch", type=int, default=16)
    ap.add_argument("--max-length", type=int, default=4096)
    ap.add_argument("--quant", default="none")
    ap.add_argument("--kv-cache", default="default")
    args = ap.parse_args()

    global worker
    names = (args.model_names.split(",") if args.model_names
             else [args.model.rstrip("/").split("/")[-1]])
    worker = DashInferTpuWorker(args.controller, args.worker, args.model,
                                names, args.limit_worker_concurrency,
                                args.conv_template, args)
    uvicorn.run(app, host=args.host, port=args.port, log_level="info")


if __name__ == "__main__":
    main()
