"""Engine daemon + client RPC roundtrip (reference multi-NUMA gRPC service,
SURVEY.md §2.17: AsClientEngine proxies the full engine API incl. per-UUID
ResultQueue ops)."""

import socket

import numpy as np
import pytest

import tests.hf_util as hf_util


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_daemon_client_roundtrip():
    from dashinfer_tpu import Engine, GenerationConfig, RuntimeConfigBuilder
    from dashinfer_tpu.loader import build_from_torch_model
    from dashinfer_tpu.runtime.request import GenerateRequestStatus
    from dashinfer_tpu.service import ClientEngine, EngineDaemon

    hf_cfg = hf_util.tiny_qwen2_config()
    model = hf_util.make_torch_model(hf_cfg)
    cfg, params = build_from_torch_model(model, hf_cfg.to_dict(), "float32")
    rt = (RuntimeConfigBuilder("svc").max_length(96).max_batch(2)
          .kv_cache_page_size(16).kv_cache_num_pages(32).dtype("float32")
          .update({"min_prefill_bucket": 16}).build())
    eng = Engine().install_model("svc", rt, params=params, model_config=cfg)
    eng.start_model("svc")

    daemon = EngineDaemon(eng)
    port = _free_port()
    daemon.serve(port, block=False)
    try:
        client = ClientEngine(port=port)
        assert client.models() == ["svc"]

        rng = np.random.RandomState(9)
        prompt = rng.randint(1, hf_cfg.vocab_size, size=8).tolist()
        golden = hf_util.hf_greedy_tokens(model, prompt, 6)

        gen = GenerationConfig(max_length=len(prompt) + 6, do_sample=False,
                               top_k=1, eos_token_id=-1)
        status, handle, q = client.start_request("svc", prompt, gen)
        assert status == GenerateRequestStatus.Init
        client.sync_request("svc", handle, timeout_s=300)
        assert q.GenerateStatus() == GenerateRequestStatus.GenerateFinished
        assert q.GetAllGeneratedTokens() == golden
        stats = q.RequestStatInfo()
        assert "time_to_first_token" in stats

        es = client.get_engine_stat("svc")
        assert es["model_name"] == "svc"
        client.release_request("svc", handle)

        # streaming Get over RPC
        _, h2, q2 = client.start_request("svc", prompt, gen)
        got = []
        while True:
            toks = q2.Get(timeout_s=120)
            got.extend(toks)
            st = q2.GenerateStatus()
            if st in (GenerateRequestStatus.GenerateFinished,
                      GenerateRequestStatus.GenerateInterrupted):
                got.extend(q2.GetNoWait())
                break
        assert got == golden
        client.release_request("svc", h2)
        client.close()
    finally:
        daemon.shutdown()
        eng.release_model("svc")
