"""OpenAI-compatible server: text completions + VLM chat with an image
(reference fastapi server + dashinfer-vlm server surfaces, SURVEY.md §8.14,
§2.19)."""

import base64
import io

import numpy as np
import pytest

aiohttp = pytest.importorskip("aiohttp")
torch = pytest.importorskip("torch")


class _FakeTokenizer:
    """Minimal tokenizer: 1 char = 1 token (ids offset by 32)."""

    eos_token_id = 1

    def encode(self, text, add_special_tokens=False):
        return [32 + (ord(c) % 400) for c in text]

    def decode(self, ids, skip_special_tokens=True):
        return "".join(chr(32 + ((t - 32) % 90)) if t >= 32 else "?"
                       for t in ids)

    def apply_chat_template(self, messages, add_generation_prompt=True,
                            tokenize=True):
        text = "\n".join(f"{m['role']}: {m['content']}" for m in messages)
        text += "\nassistant: "
        return self.encode(text) if tokenize else text


@pytest.fixture(scope="module")
def vl_server():
    import tests.test_qwen2_vl as tvl
    from dashinfer_tpu import Engine, RuntimeConfigBuilder
    from dashinfer_tpu.loader import build_from_torch_model
    from dashinfer_tpu.models import qwen2_vl as VL
    from dashinfer_tpu.server.openai_server import OpenAIServer
    from dashinfer_tpu.vlm import VisionRunner
    from transformers import Qwen2VLForConditionalGeneration

    torch.manual_seed(0)
    cfg = tvl._tiny_vl_cfg()
    m = Qwen2VLForConditionalGeneration(cfg).eval().float()
    tcfg, params = build_from_torch_model(m, cfg.to_dict(), "float32")
    rt = (RuntimeConfigBuilder("vls").max_length(160).max_batch(2)
          .kv_cache_page_size(16).kv_cache_num_pages(48).dtype("float32")
          .update({"min_prefill_bucket": 16}).build())
    eng = Engine().install_model("vls", rt, params=params, model_config=tcfg)
    eng.start_model("vls")
    vcfg = VL.vision_config_from_hf(cfg.vision_config.to_dict())
    vparams = VL.convert_hf_visual(dict(m.state_dict()), vcfg)
    server = OpenAIServer(
        eng, "vls", _FakeTokenizer(),
        vision_runner=VisionRunner(vcfg, vparams),
        vision_ids={"image_token_id": cfg.image_token_id,
                    "video_token_id": cfg.video_token_id,
                    "vision_start_id": cfg.vision_start_token_id,
                    "vision_end_id": cfg.vision_end_token_id})
    yield server
    eng.release_model("vls")


async def _post(app, path, payload):
    from aiohttp.test_utils import TestClient, TestServer
    client = TestClient(TestServer(app))
    await client.start_server()
    try:
        resp = await client.post(path, json=payload)
        assert resp.status == 200, await resp.text()
        return await resp.json()
    finally:
        await client.close()


def test_text_completion(vl_server):
    import asyncio
    app = vl_server.build_app()
    out = asyncio.get_event_loop().run_until_complete(_post(
        app, "/v1/completions",
        {"prompt": "hello", "max_tokens": 4, "temperature": 0}))
    assert out["object"] == "text_completion"
    assert out["usage"]["completion_tokens"] >= 1


def test_vlm_chat_with_image(vl_server):
    import asyncio
    from PIL import Image

    rng = np.random.RandomState(0)
    img = Image.fromarray((rng.rand(16, 16, 3) * 255).astype(np.uint8))
    buf = io.BytesIO()
    img.save(buf, format="PNG")
    b64 = base64.b64encode(buf.getvalue()).decode()

    app = vl_server.build_app()
    out = asyncio.get_event_loop().run_until_complete(_post(
        app, "/v1/chat/completions",
        {"messages": [{"role": "user", "content": [
            {"type": "text", "text": "describe "},
            {"type": "image_url",
             "image_url": {"url": f"data:image/png;base64,{b64}"}},
        ]}],
         "max_tokens": 4, "temperature": 0}))
    assert out["object"] == "chat.completion"
    assert out["choices"][0]["message"]["role"] == "assistant"
    assert out["usage"]["completion_tokens"] >= 1
    # vision runner actually ran (cache has one entry)
    assert vl_server.vision.misses >= 1


def test_vlm_chat_with_video(vl_server):
    """Multi-frame GIF data URL -> video content part -> video_token_id
    placeholder run with grid_t > 1 (reference video modality, §2.19)."""
    import asyncio
    from PIL import Image

    rng = np.random.RandomState(5)
    frames = [Image.fromarray((rng.rand(16, 16, 3) * 255).astype(np.uint8))
              for _ in range(4)]
    buf = io.BytesIO()
    frames[0].save(buf, format="GIF", save_all=True,
                   append_images=frames[1:])
    b64 = base64.b64encode(buf.getvalue()).decode()

    app = vl_server.build_app()
    out = asyncio.new_event_loop().run_until_complete(_post(
        app, "/v1/chat/completions",
        {"messages": [{"role": "user", "content": [
            {"type": "text", "text": "what happens "},
            {"type": "video_url",
             "video_url": {"url": f"data:image/gif;base64,{b64}"}},
        ]}],
         "max_tokens": 4, "temperature": 0}))
    assert out["object"] == "chat.completion"
    assert out["usage"]["completion_tokens"] >= 1
