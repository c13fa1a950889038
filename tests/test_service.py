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


def test_daemon_streaming_and_concurrent_clients():
    """Server-push streaming (stream_request: multiple response lines per
    RPC, no per-chunk round trip) and multiple concurrent clients sharing
    one daemon (reference gRPC server streaming + multi-client service)."""
    import threading

    from dashinfer_tpu import Engine, GenerationConfig, RuntimeConfigBuilder
    from dashinfer_tpu.loader import build_from_torch_model
    from dashinfer_tpu.service import ClientEngine, EngineDaemon

    hf_cfg = hf_util.tiny_qwen2_config()
    model = hf_util.make_torch_model(hf_cfg)
    cfg, params = build_from_torch_model(model, hf_cfg.to_dict(), "float32")
    rt = (RuntimeConfigBuilder("svc2").max_length(96).max_batch(4)
          .kv_cache_page_size(16).kv_cache_num_pages(48).dtype("float32")
          .update({"min_prefill_bucket": 16}).build())
    eng = Engine().install_model("svc2", rt, params=params, model_config=cfg)
    eng.start_model("svc2")
    daemon = EngineDaemon(eng)
    port = _free_port()
    daemon.serve(port, block=False)
    try:
        rng = np.random.RandomState(17)
        prompts = [rng.randint(1, hf_cfg.vocab_size, size=n).tolist()
                   for n in (6, 9, 12)]
        goldens = [hf_util.hf_greedy_tokens(model, p, 8) for p in prompts]
        results = [None] * len(prompts)
        errors = []

        def client_run(i):
            try:
                cl = ClientEngine(port=port)  # own connection per client
                gen = GenerationConfig(max_length=len(prompts[i]) + 8,
                                       do_sample=False, top_k=1,
                                       eos_token_id=-1)
                _, h, q = cl.start_request("svc2", prompts[i], gen)
                got, n_chunks = [], 0
                for chunk in q.Stream(tick_s=0.2):
                    got.extend(chunk["tokens"])
                    n_chunks += 1
                assert chunk["done"] and chunk["status"] == \
                    "GenerateFinished"
                results[i] = (got, n_chunks)
                cl.release_request("svc2", h)
                cl.close()
            except Exception as e:  # surface in main thread
                errors.append(e)

        threads = [threading.Thread(target=client_run, args=(i,))
                   for i in range(len(prompts))]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=600)
        assert not errors, errors
        for (got, n_chunks), golden in zip(results, goldens):
            assert got == golden
            assert n_chunks >= 1
    finally:
        daemon.shutdown()
        eng.release_model("svc2")
