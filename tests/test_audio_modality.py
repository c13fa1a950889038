"""Audio modality (Qwen2-Audio style): embeddings injected at audio-pad
placeholder runs through the engine, vs an HF inputs_embeds oracle. The
channel is the same RichEmbedding-equivalent as vision (SURVEY.md §2.19);
this test proves it is modality-agnostic."""

import numpy as np
import torch

import tests.hf_util as hf_util

AUDIO_PAD = 88


@torch.no_grad()
def _oracle_greedy(model, input_ids, inject_rows, n_new):
    emb = model.get_input_embeddings()
    ids = list(input_ids)
    out = []
    for _ in range(n_new):
        e = emb(torch.tensor(ids)[None])
        k = 0
        for i, t in enumerate(ids):
            if t == AUDIO_PAD and k < inject_rows.shape[0]:
                e[0, i] = inject_rows[k]
                k += 1
        logits = model(inputs_embeds=e).logits[0, -1]
        nxt = int(torch.argmax(logits))
        out.append(nxt)
        ids.append(nxt)
    return out


def test_audio_embedding_injection_engine_parity():
    from dashinfer_tpu import Engine, GenerationConfig, RuntimeConfigBuilder
    from dashinfer_tpu.loader import build_from_torch_model
    from dashinfer_tpu.runtime.request import GenerateRequestStatus
    from dashinfer_tpu.vlm.audio import AudioEncoder, build_request_audio

    hf_cfg = hf_util.tiny_qwen2_config()
    model = hf_util.make_torch_model(hf_cfg)
    cfg, params = build_from_torch_model(model, hf_cfg.to_dict(), "float32")

    # prompt: text, <audio>, 3x AUDIO_PAD, </audio>, text
    prompt = [11, 12, 210, AUDIO_PAD, AUDIO_PAD, AUDIO_PAD, 211, 31]
    rng = np.random.RandomState(4)
    rows = AudioEncoder.embed_features(
        rng.randn(3, hf_cfg.hidden_size) * 0.3)
    n_new = 6
    golden = _oracle_greedy(model, prompt, torch.tensor(rows), n_new)

    rt = (RuntimeConfigBuilder("au").max_length(64).max_batch(2)
          .kv_cache_page_size(16).kv_cache_num_pages(24).dtype("float32")
          .update({"min_prefill_bucket": 16}).build())
    eng = Engine().install_model("au", rt, params=params, model_config=cfg)
    eng.start_model("au")
    fields = build_request_audio([rows], AUDIO_PAD)
    gen = GenerationConfig(max_length=len(prompt) + n_new, do_sample=False,
                           top_k=1, eos_token_id=-1, **fields)
    _, h, q = eng.start_request("au", prompt, gen)
    eng.sync_request("au", h, timeout_s=600)
    toks = list(q.GetAllGeneratedTokens())
    assert q.GenerateStatus() == GenerateRequestStatus.GenerateFinished
    assert toks == golden
    eng.release_model("au")
