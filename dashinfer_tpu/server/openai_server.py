"""OpenAI-compatible API server.

Equivalent of the reference's FastAPI server (examples/api_server/
fastapi-server.py:127-235 — /v1/completions + /v1/chat/completions with SSE
streaming) and the VLM server's protocol surface (multimodal/dashinfer_vlm/
api_server/server.py:219-634). Built on aiohttp (this image has no fastapi);
the engine is thread-blocking, so queue drains run in the default executor.

Run: python -m dashinfer_tpu.server.openai_server --model <hf_dir> [--port 8000]
"""

import argparse
import asyncio
import json
import time
import uuid as _uuid
from typing import Any, Dict, List, Optional

from dashinfer_tpu.config import GenerationConfig, RuntimeConfigBuilder
from dashinfer_tpu.runtime.request import GenerateRequestStatus
from dashinfer_tpu.utils import get_logger

logger = get_logger("server")

_FINAL = (GenerateRequestStatus.GenerateFinished,
          GenerateRequestStatus.GenerateInterrupted,
          GenerateRequestStatus.InternalError)


class OpenAIServer:
    """OpenAI-compatible server. With `vision_runner` + `vision_ids`
    ({"image_token_id", "video_token_id", "vision_start_id",
    "vision_end_id"}) the chat endpoint accepts image_url content parts
    (base64 data URLs; this environment has no egress) — the reference's
    dashinfer-vlm server surface (multimodal api_server/server.py:219)."""

    def __init__(self, engine, model_name: str, tokenizer,
                 vision_runner=None, vision_ids: Optional[Dict] = None):
        self.engine = engine
        self.model_name = model_name
        self.tokenizer = tokenizer
        self.vision = vision_runner
        self.vision_ids = vision_ids or {}

    # -- request translation --------------------------------------------------
    def _gen_config(self, body: Dict, prompt_len: int) -> GenerationConfig:
        max_tokens = int(body.get("max_tokens") or 256)
        g = GenerationConfig(
            max_length=prompt_len + max_tokens,
            do_sample=body.get("temperature", 1.0) > 0,
            temperature=float(body.get("temperature", 1.0) or 1.0),
            top_p=float(body.get("top_p", 1.0) or 1.0),
            top_k=int(body.get("top_k", 50) or 0),
            repetition_penalty=float(body.get("repetition_penalty", 1.0)),
            presence_penalty=float(body.get("presence_penalty", 0.0)),
            frequency_penalty=float(body.get("frequency_penalty", 0.0)),
            seed=int(body.get("seed") or 0),
            logprobs=bool(body.get("logprobs")),
            top_logprobs=int(body.get("top_logprobs") or 0),
        )
        if body.get("response_format"):
            g.response_format = body["response_format"]
        eos = self.tokenizer.eos_token_id
        if eos is not None:
            g.eos_token_id = int(eos)
        return g

    def _stops(self, body: Dict) -> List[str]:
        stop = body.get("stop")
        if stop is None:
            return []
        return [stop] if isinstance(stop, str) else list(stop)

    # -- generation core -------------------------------------------------------
    async def _generate(self, input_ids: List[int], gen_cfg: GenerationConfig,
                        stops: List[str]):
        """Async generator of (new_text, finish_reason|None)."""
        loop = asyncio.get_event_loop()
        status, handle, queue = self.engine.start_request(
            self.model_name, input_ids, gen_cfg)
        all_ids: List[int] = []
        emitted = 0
        finish = None
        try:
            while True:
                el = await loop.run_in_executor(None, queue.Get, 1.0)
                st = queue.GenerateStatus()
                if el is not None and len(el):
                    all_ids.extend(el.ids_from_generate)
                text = self.tokenizer.decode(all_ids,
                                             skip_special_tokens=True)
                # host-side stop-string scan (reference handles stop tokens in
                # UpdateId; strings are a server concern)
                cut = None
                for s in stops:
                    idx = text.find(s, max(emitted - len(s), 0))
                    if idx >= 0:
                        cut = idx if cut is None else min(cut, idx)
                if cut is not None:
                    if cut > emitted:
                        yield text[emitted:cut], None
                    self.engine.stop_request(self.model_name, handle)
                    finish = "stop"
                    break
                # hold back a partial-stop suffix
                safe = len(text)
                for s in stops:
                    for k in range(len(s) - 1, 0, -1):
                        if text.endswith(s[:k]):
                            safe = min(safe, len(text) - k)
                            break
                if safe > emitted:
                    yield text[emitted:safe], None
                    emitted = safe
                if st in _FINAL:
                    if len(text) > emitted:
                        yield text[emitted:], None
                    if st == GenerateRequestStatus.GenerateFinished:
                        last = all_ids[-1] if all_ids else -1
                        finish = ("stop" if last == gen_cfg.eos_token_id
                                  else "length")
                    elif st == GenerateRequestStatus.GenerateInterrupted:
                        finish = "length"
                    else:
                        finish = "error"
                    break
            yield "", finish or "stop"
        finally:
            self.engine.release_request(self.model_name, handle)

    # -- handlers ---------------------------------------------------------------
    async def completions(self, request):
        from aiohttp import web
        body = await request.json()
        prompt = body.get("prompt", "")
        if isinstance(prompt, list):
            prompt = prompt[0]
        input_ids = self.tokenizer.encode(prompt)
        gen_cfg = self._gen_config(body, len(input_ids))
        stops = self._stops(body)
        rid = f"cmpl-{_uuid.uuid4().hex[:24]}"
        created = int(time.time())

        if body.get("stream"):
            return await self._stream_response(
                request, rid, created, "text_completion",
                self._generate(input_ids, gen_cfg, stops),
                lambda delta, fin: {"index": 0, "text": delta,
                                    "finish_reason": fin})
        text, finish, n_out = await self._collect(
            self._generate(input_ids, gen_cfg, stops))
        return web.json_response({
            "id": rid, "object": "text_completion", "created": created,
            "model": self.model_name,
            "choices": [{"index": 0, "text": text, "finish_reason": finish,
                         "logprobs": None}],
            "usage": self._usage(len(input_ids), n_out),
        })

    _IMG_MARK = "\x00<di:image>\x00"
    _VID_MARK = "\x00<di:video>\x00"

    @staticmethod
    def _decode_data_url(url):
        import base64
        if not url.startswith("data:"):
            raise ValueError(
                "only base64 data URLs supported (no egress)")
        return base64.b64decode(url.split(",", 1)[1])

    def _extract_images(self, messages):
        """Decode image_url / video_url parts (base64 data URLs) ->
        preprocessed (patches, grid) list + parallel kinds list; parts are
        replaced by markers in the text. Video sources: a multi-frame
        data URL (GIF/APNG via PIL ImageSequence) or a list of per-frame
        data URLs (qwen-vl-utils style {"type": "video", "video": [...]})."""
        import io
        from dashinfer_tpu.vlm.preprocess import (preprocess_image,
                                                  preprocess_video)
        images = []
        kinds = []
        flat = []
        vc = self.vision.vcfg

        def frames_of(raw):
            from PIL import Image, ImageSequence
            img = Image.open(io.BytesIO(raw))
            return [f.convert("RGB")
                    for f in ImageSequence.Iterator(img)]

        for m in messages:
            content = m.get("content")
            if not isinstance(content, list):
                flat.append(m)
                continue
            parts = []
            for part in content:
                ptype = part.get("type")
                if ptype == "image_url":
                    raw = self._decode_data_url(part["image_url"]["url"])
                    from PIL import Image
                    img = Image.open(io.BytesIO(raw))
                    images.append(preprocess_image(
                        img, patch_size=vc.patch_size,
                        merge_size=vc.spatial_merge_size,
                        temporal_patch_size=vc.temporal_patch_size))
                    kinds.append("image")
                    parts.append(self._IMG_MARK)
                elif ptype in ("video_url", "video"):
                    if ptype == "video":
                        src = part["video"]
                    else:
                        src = part["video_url"]["url"]
                    if isinstance(src, (list, tuple)):
                        frames = []
                        for u in src:
                            frames.extend(frames_of(self._decode_data_url(u)))
                    else:
                        frames = frames_of(self._decode_data_url(src))
                    images.append(preprocess_video(
                        frames, patch_size=vc.patch_size,
                        merge_size=vc.spatial_merge_size,
                        temporal_patch_size=vc.temporal_patch_size))
                    kinds.append("video")
                    parts.append(self._VID_MARK)
                elif ptype == "text":
                    parts.append(part.get("text", ""))
            flat.append({"role": m.get("role"), "content": "".join(parts)})
        return flat, images, kinds

    def _vl_input_ids(self, messages):
        """Tokenize chat with image/video placeholders expanded to
        vision_start + {image,video}_pad*n + vision_end (reference
        placeholder-run injection, extra_embedding.hpp)."""
        import re
        flat, images, kinds = self._extract_images(messages)
        try:
            text = self.tokenizer.apply_chat_template(
                flat, add_generation_prompt=True, tokenize=False)
        except Exception:
            text = "\n".join(f"{m.get('role')}: {m.get('content')}"
                             for m in flat) + "\nassistant: "
        vi = self.vision_ids
        merge2 = self.vision.vcfg.spatial_merge_size ** 2
        ids: List[int] = []
        img_i = 0
        pat = "(%s|%s)" % (re.escape(self._IMG_MARK),
                           re.escape(self._VID_MARK))
        for seg in re.split(pat, text):
            if seg in (self._IMG_MARK, self._VID_MARK):
                patches, grid = images[img_i]
                n = (grid[0] * grid[1] * grid[2]) // merge2
                tok = vi["image_token_id"] if kinds[img_i] == "image" \
                    else vi["video_token_id"]
                ids.append(vi["vision_start_id"])
                ids.extend([tok] * n)
                ids.append(vi["vision_end_id"])
                img_i += 1
            elif seg:
                ids.extend(self.tokenizer.encode(seg,
                                                 add_special_tokens=False))
        return ids, images, kinds

    async def chat_completions(self, request):
        from aiohttp import web
        body = await request.json()
        messages = body.get("messages", [])
        has_vision_parts = any(isinstance(m.get("content"), list)
                               for m in messages)
        mm_fields = None
        if has_vision_parts and self.vision is not None:
            input_ids, images, kinds = self._vl_input_ids(messages)
            mm_fields = self.vision.build_request(
                input_ids, images, self.vision_ids["image_token_id"],
                self.vision_ids.get("video_token_id", -1), kinds=kinds)
        else:
            try:
                input_ids = self.tokenizer.apply_chat_template(
                    messages, add_generation_prompt=True, tokenize=True)
            except Exception:
                text = "\n".join(f"{m.get('role')}: {m.get('content')}"
                                 for m in messages) + "\nassistant: "
                input_ids = self.tokenizer.encode(text)
        gen_cfg = self._gen_config(body, len(input_ids))
        if mm_fields:
            gen_cfg.mm_info = mm_fields["mm_info"]
            gen_cfg.mrope_positions = mm_fields["mrope_positions"]
            gen_cfg.mrope_position_delta = mm_fields["mrope_position_delta"]
        stops = self._stops(body)
        rid = f"chatcmpl-{_uuid.uuid4().hex[:24]}"
        created = int(time.time())

        if body.get("stream"):
            return await self._stream_response(
                request, rid, created, "chat.completion.chunk",
                self._generate(input_ids, gen_cfg, stops),
                lambda delta, fin: {
                    "index": 0,
                    "delta": ({"content": delta} if delta else {}),
                    "finish_reason": fin})
        text, finish, n_out = await self._collect(
            self._generate(input_ids, gen_cfg, stops))
        return web.json_response({
            "id": rid, "object": "chat.completion", "created": created,
            "model": self.model_name,
            "choices": [{"index": 0,
                         "message": {"role": "assistant", "content": text},
                         "finish_reason": finish}],
            "usage": self._usage(len(input_ids), n_out),
        })

    async def _collect(self, gen):
        parts, finish, n = [], "stop", 0
        async for delta, fin in gen:
            if delta:
                parts.append(delta)
            if fin:
                finish = fin
        text = "".join(parts)
        n = len(self.tokenizer.encode(text)) if text else 0
        return text, finish, n

    def _usage(self, n_in, n_out):
        return {"prompt_tokens": n_in, "completion_tokens": n_out,
                "total_tokens": n_in + n_out}

    async def _stream_response(self, request, rid, created, obj, gen,
                               choice_fn):
        from aiohttp import web
        resp = web.StreamResponse(
            headers={"Content-Type": "text/event-stream",
                     "Cache-Control": "no-cache"})
        await resp.prepare(request)
        async for delta, fin in gen:
            if not delta and not fin:
                continue
            chunk = {"id": rid, "object": obj, "created": created,
                     "model": self.model_name,
                     "choices": [choice_fn(delta, fin)]}
            await resp.write(f"data: {json.dumps(chunk)}\n\n".encode())
        await resp.write(b"data: [DONE]\n\n")
        await resp.write_eof()
        return resp

    async def models(self, request):
        from aiohttp import web
        return web.json_response({"object": "list", "data": [
            {"id": self.model_name, "object": "model",
             "owned_by": "dashinfer_tpu"}]})

    async def health(self, request):
        from aiohttp import web
        return web.json_response({"status": "ok"})

    async def stats(self, request):
        from aiohttp import web
        return web.json_response(self.engine.get_engine_stat(self.model_name))

    def build_app(self):
        from aiohttp import web
        app = web.Application()
        app.router.add_post("/v1/completions", self.completions)
        app.router.add_post("/v1/chat/completions", self.chat_completions)
        app.router.add_get("/v1/models", self.models)
        app.router.add_get("/health", self.health)
        app.router.add_get("/stats", self.stats)
        return app


def main():
    from aiohttp import web
    from transformers import AutoTokenizer
    from dashinfer_tpu.engine.engine import Engine

    ap = argparse.ArgumentParser()
    ap.add_argument("--model", required=True, help="HF checkpoint dir")
    ap.add_argument("--served-name", default=None)
    ap.add_argument("--host", default="0.0.0.0")
    ap.add_argument("--port", type=int, default=8000)
    ap.add_argument("--max-length", type=int, default=4096)
    ap.add_argument("--max-batch", type=int, default=16)
    ap.add_argument("--quant", default="none",
                    choices=["none", "a16w8", "a16w4"])
    ap.add_argument("--group-size", type=int, default=-1)
    ap.add_argument("--kv-cache-mode", default="default",
                    choices=["default", "int8", "uint4"])
    ap.add_argument("--prefix-cache", action="store_true")
    ap.add_argument("--vlm", action="store_true",
                    help="enable Qwen2-VL vision endpoints")
    args = ap.parse_args()

    name = args.served_name or args.model.rstrip("/").split("/")[-1]
    from dashinfer_tpu.config import CacheMode
    builder = (RuntimeConfigBuilder(name)
               .max_length(args.max_length).max_batch(args.max_batch)
               .kv_cache_mode(CacheMode(args.kv_cache_mode))
               .prefix_cache(args.prefix_cache))
    if args.quant != "none":
        builder.weight_quant(args.quant, args.group_size)
    rt = builder.build()

    tokenizer = AutoTokenizer.from_pretrained(args.model)
    engine = Engine()
    engine.install_model(args.model, rt, tokenizer=tokenizer)
    engine.start_model(name)
    vision_runner = vision_ids = None
    if args.vlm:
        import json as _json
        import os as _os
        from dashinfer_tpu.loader.hf_loader import load_hf_tensors
        from dashinfer_tpu.models import qwen2_vl as VL
        from dashinfer_tpu.vlm import VisionRunner
        hf_cfg = _json.load(open(_os.path.join(args.model, "config.json")))
        vcfg = VL.vision_config_from_hf(hf_cfg["vision_config"])
        vparams = VL.convert_hf_visual(load_hf_tensors(args.model), vcfg)
        vision_runner = VisionRunner(vcfg, vparams)
        vision_ids = {
            "image_token_id": hf_cfg.get("image_token_id"),
            "video_token_id": hf_cfg.get("video_token_id"),
            "vision_start_id": hf_cfg.get("vision_start_token_id"),
            "vision_end_id": hf_cfg.get("vision_end_token_id"),
        }
    server = OpenAIServer(engine, name, tokenizer, vision_runner, vision_ids)
    logger.info("serving %s on %s:%d", name, args.host, args.port)
    web.run_app(server.build_app(), host=args.host, port=args.port)


if __name__ == "__main__":
    main()
