"""Multi-host control plane simulation (docs/multihost.md): a leader
engine and a follower engine in SEPARATE PROCESSES consume the same
sequenced control stream and must produce IDENTICAL token streams —
greedy and seeded sampling — across stop/release interleavings. This is
the determinism property a real multi-controller mesh launch depends on
(SURVEY §7 M4 / VERDICT r1 missing #5; reference multi-NUMA daemon,
allspark_service.cpp:86)."""

import os
import socket
import subprocess
import sys
import time

import numpy as np
import pytest

import tests.hf_util as hf_util

_FOLLOWER_SRC = r'''
import sys
sys.path[:0] = [{repo!r}, {repo!r} + "/tests"]
import jax; jax.config.update("jax_platforms", "cpu")
import hf_util
from dashinfer_tpu import Engine, RuntimeConfigBuilder
from dashinfer_tpu.loader import build_from_torch_model
from dashinfer_tpu.service.multihost import FollowerDaemon

hf = hf_util.tiny_qwen2_config()
cfg, params = build_from_torch_model(hf_util.make_torch_model(hf),
                                     hf.to_dict(), "float32")
rt = (RuntimeConfigBuilder("mh").max_length(96).max_batch(2)
      .kv_cache_page_size(16).kv_cache_num_pages(24).dtype("float32")
      .update({{"min_prefill_bucket": 16}}).build())
eng = Engine().install_model("mh", rt, params=params, model_config=cfg)
eng.start_model("mh")
FollowerDaemon(eng).serve({port}, block=True)
'''


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.fixture(scope="module")
def follower():
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    port = _free_port()
    src = _FOLLOWER_SRC.format(repo=repo, port=port)
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    proc = subprocess.Popen([sys.executable, "-c", src], env=env,
                            stdout=subprocess.DEVNULL,
                            stderr=subprocess.DEVNULL)
    # wait for the daemon to accept connections (engine install ~20 s on
    # this box)
    deadline = time.monotonic() + 300
    while time.monotonic() < deadline:
        if proc.poll() is not None:
            raise RuntimeError("follower process died during startup")
        try:
            socket.create_connection(("127.0.0.1", port), timeout=1).close()
            break
        except OSError:
            time.sleep(0.5)
    else:
        proc.kill()
        raise TimeoutError("follower daemon never came up")
    yield port
    proc.terminate()
    proc.wait(timeout=10)


def test_replicated_streams_identical(follower):
    from dashinfer_tpu import Engine, RuntimeConfigBuilder
    from dashinfer_tpu.loader import build_from_torch_model
    from dashinfer_tpu.service.client import _Rpc
    from dashinfer_tpu.service.multihost import MultiHostEngine

    hf = hf_util.tiny_qwen2_config()
    cfg, params = build_from_torch_model(hf_util.make_torch_model(hf),
                                         hf.to_dict(), "float32")
    rt = (RuntimeConfigBuilder("mh").max_length(96).max_batch(2)
          .kv_cache_page_size(16).kv_cache_num_pages(24).dtype("float32")
          .update({"min_prefill_bucket": 16}).build())
    eng = Engine().install_model("mh", rt, params=params, model_config=cfg)
    eng.start_model("mh")
    mh = MultiHostEngine(eng, [("127.0.0.1", follower)], "mh")
    probe = _Rpc("127.0.0.1", follower)
    try:
        rng = np.random.RandomState(77)
        cases = [
            # (prompt_len, gen_cfg) — greedy and seeded sampling
            (11, {"max_length": 24, "do_sample": False, "top_k": 1,
                  "eos_token_id": -1}),
            (7, {"max_length": 20, "do_sample": True, "top_k": 8,
                 "top_p": 0.9, "seed": 1234, "eos_token_id": -1}),
            (19, {"max_length": 30, "do_sample": True, "top_k": 4,
                  "seed": 99, "temperature": 1.3, "eos_token_id": -1}),
        ]
        handles = []
        for n, gc in cases:
            prompt = rng.randint(1, hf.vocab_size, size=n).tolist()
            handles.append(mh.start_request(prompt, gc))

        for h, q in handles:
            mh.sync_request(h, timeout_s=600)
        mh.barrier(timeout_s=300)

        for h, q in handles:
            # follower must have finished the same request with the SAME
            # tokens (poll: follower decode cadence is independent)
            deadline = time.monotonic() + 300
            leader_toks = q.GetAllGeneratedTokens()
            while time.monotonic() < deadline:
                st = probe.call("generate_status", uuid=h.uuid)
                if st in ("GenerateFinished", "GenerateInterrupted",
                          "InternalError"):
                    break
                time.sleep(0.1)
            follower_toks = probe.call("all_tokens", uuid=h.uuid)
            assert follower_toks == leader_toks, h.uuid
            mh.release_request(h)

        # stop_request replication: start one long request, stop it, and
        # require both sides to settle on a final status with a shared
        # token prefix (the stop lands at different decode offsets on
        # replicas — only the real lockstep mesh pins the boundary, see
        # docs/multihost.md "Tick replication")
        prompt = rng.randint(1, hf.vocab_size, size=5).tolist()
        h, q = mh.start_request(prompt, {"max_length": 90,
                                         "do_sample": False, "top_k": 1,
                                         "eos_token_id": -1})
        time.sleep(0.5)
        mh.stop_request(h)
        mh.barrier(timeout_s=300)
        lead = q.GetAllGeneratedTokens()
        foll = probe.call("all_tokens", uuid=h.uuid)
        n = min(len(lead), len(foll))
        assert lead[:n] == foll[:n]
        mh.release_request(h)
        mh.barrier(timeout_s=300)
    finally:
        mh.close()
        probe.close()
        eng.release_model("mh")
