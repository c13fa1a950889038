"""Qwen-VL v1 flow: QWenLMHeadModel text side + image-pad embedding
injection through the engine (the reference routes external-ViT embeddings
through RichEmbedding the same way — runtime/qwen_vl.py, model_type
QWEN-VL). Oracle: HF Qwen2 forward with inputs_embeds substituted at the
placeholder positions."""

import numpy as np
import pytest
import torch

import tests.hf_util as hf_util
from tests.test_qwen_v1 import _to_v1_state

IMG_PAD = 77  # placeholder token id ("image pad") inside the prompt


@torch.no_grad()
def _oracle_greedy(model, input_ids, inject_rows, n_new):
    """Greedy continuation with prompt embeddings overridden at IMG_PAD
    positions (full re-forward each step; tiny model)."""
    emb = model.get_input_embeddings()
    ids = list(input_ids)
    out = []
    for _ in range(n_new):
        e = emb(torch.tensor(ids)[None])
        k = 0
        for i, t in enumerate(ids):
            if t == IMG_PAD and k < inject_rows.shape[0]:
                e[0, i] = inject_rows[k]
                k += 1
        logits = model(inputs_embeds=e).logits[0, -1]
        tok = int(torch.argmax(logits))
        out.append(tok)
        ids.append(tok)
    return out


def test_qwen_vl_v1_injection_engine_parity():
    from dashinfer_tpu import Engine, GenerationConfig, RuntimeConfigBuilder
    from dashinfer_tpu.models.registry import get_model_builder
    from dashinfer_tpu.vlm.runner import build_request_qwen_vl
    from dashinfer_tpu.runtime.request import GenerateRequestStatus

    hf_cfg = hf_util.tiny_qwen2_config(kv_heads=4)
    model = hf_util.make_torch_model(hf_cfg)
    v1_cfg = {
        "architectures": ["QWenLMHeadModel"],
        "vocab_size": hf_cfg.vocab_size,
        "hidden_size": hf_cfg.hidden_size,
        "intermediate_size": 2 * hf_cfg.intermediate_size,
        "num_hidden_layers": hf_cfg.num_hidden_layers,
        "num_attention_heads": hf_cfg.num_attention_heads,
        "layer_norm_epsilon": hf_cfg.rms_norm_eps,
        "rotary_emb_base": hf_cfg.rope_theta,
        "seq_length": 1024, "no_bias": True,
        "use_dynamic_ntk": False, "use_logn_attn": False,
    }
    config_fn, converter = get_model_builder("QWenLMHeadModel")()
    cfg = config_fn(v1_cfg)
    params = converter.convert(_to_v1_state(model.state_dict(),
                                            cfg.num_layers), cfg, np.float32)

    # prompt: text, <img>, 4x IMG_PAD, </img>, text
    prompt = [11, 12, 200, IMG_PAD, IMG_PAD, IMG_PAD, IMG_PAD, 201, 31, 32]
    rng = np.random.RandomState(9)
    vis = (rng.randn(4, hf_cfg.hidden_size) * 0.3).astype(np.float32)
    n_new = 6
    golden = _oracle_greedy(model, prompt, torch.tensor(vis), n_new)

    rt = (RuntimeConfigBuilder("vl1").max_length(64).max_batch(2)
          .kv_cache_page_size(16).kv_cache_num_pages(24).dtype("float32")
          .update({"min_prefill_bucket": 16}).build())
    eng = Engine().install_model("vl1", rt, params=params, model_config=cfg)
    eng.start_model("vl1")
    fields = build_request_qwen_vl([vis], IMG_PAD)
    gen = GenerationConfig(max_length=len(prompt) + n_new, do_sample=False,
                           top_k=1, eos_token_id=-1, **fields)
    _, h, q = eng.start_request("vl1", prompt, gen)
    eng.sync_request("vl1", h, timeout_s=600)
    toks = list(q.GetAllGeneratedTokens())
    assert q.GenerateStatus() == GenerateRequestStatus.GenerateFinished
    assert toks == golden
    eng.release_model("vl1")
