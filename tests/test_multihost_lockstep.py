"""Lockstep tick replication (docs/multihost.md §Tick replication,
VERDICT r2 missing #1): the leader's scheduler loop serializes EVERY
decision — ("prefill", uuid, slot, pages) / ("decode", new pages) / TTL
sweeps — into the sequenced stream, and the follower executes exactly
those ticks instead of running its own admission. Properties proven here
that the plain replication test (test_multihost.py) cannot:

  1. a stop_request lands at the IDENTICAL token offset on both hosts
     (exact list equality, not shared-prefix), because the stop op's
     stream position pins the step boundary;
  2. the scheduler-state digests (get_engine_stat.state_digest) agree;
  3. zero decision divergences (the follower byte-compares its own
     deterministic decision against the leader's payload every tick).
"""

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
      .prefix_cache(True)
      .update({{"min_prefill_bucket": 16, "prefix_cache_impl": "python"}}).build())
eng = Engine().install_model("mh", rt, params=params, model_config=cfg)
d = FollowerDaemon(eng, lockstep=True)
d.rpc_start_model("mh")
d.serve({port}, block=True)
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


@pytest.fixture(scope="module")
def leader(follower):
    from dashinfer_tpu import Engine, RuntimeConfigBuilder
    from dashinfer_tpu.loader import build_from_torch_model
    from dashinfer_tpu.service.client import _Rpc
    from dashinfer_tpu.service.multihost import MultiHostEngine

    hf = hf_util.tiny_qwen2_config()
    cfg, params = build_from_torch_model(hf_util.make_torch_model(hf),
                                         hf.to_dict(), "float32")
    rt = (RuntimeConfigBuilder("mh").max_length(96).max_batch(2)
          .kv_cache_page_size(16).kv_cache_num_pages(24).dtype("float32")
          .prefix_cache(True)
          .update({"min_prefill_bucket": 16, "prefix_cache_impl": "python"}).build())
    eng = Engine().install_model("mh", rt, params=params, model_config=cfg)
    eng.start_model("mh")
    mh = MultiHostEngine(eng, [("127.0.0.1", follower)], "mh",
                         lockstep=True)
    probe = _Rpc("127.0.0.1", follower)
    yield hf, eng, mh, probe
    mh.close()
    probe.close()
    eng.release_model("mh")


def _follower_final(probe, uuid, timeout=300):
    deadline = time.monotonic() + timeout
    while time.monotonic() < deadline:
        st = probe.call("generate_status", uuid=uuid)
        if st in ("GenerateFinished", "GenerateInterrupted",
                  "InternalError"):
            return st
        time.sleep(0.05)
    raise TimeoutError(uuid)


def test_lockstep_streams_and_digests(leader):
    hf, eng, mh, probe = leader
    rng = np.random.RandomState(31)
    cases = [
        (11, {"max_length": 26, "do_sample": False, "top_k": 1,
              "eos_token_id": -1}),
        (7, {"max_length": 22, "do_sample": True, "top_k": 8,
             "top_p": 0.9, "seed": 4321, "eos_token_id": -1}),
    ]
    handles = []
    for n, gc in cases:
        prompt = rng.randint(1, hf.vocab_size, size=n).tolist()
        handles.append(mh.start_request(prompt, gc))
    for h, q in handles:
        mh.sync_request(h, timeout_s=600)
    mh.barrier(timeout_s=300)
    for h, q in handles:
        assert _follower_final(probe, h.uuid) == "GenerateFinished"
        assert probe.call("all_tokens", uuid=h.uuid) == \
            q.GetAllGeneratedTokens(), h.uuid
        mh.release_request(h)
    mh.barrier(timeout_s=300)

    # scheduler-state digest must agree, with zero decision divergences
    for rep in mh.check_divergence():
        assert rep["matches"], rep
        assert rep["lockstep_divergence"] == 0, rep


def test_lockstep_stop_pins_token_offset(leader):
    """THE lockstep property: a stop_request replicated mid-stream lands
    at the identical token offset on leader and follower (plain replication
    can only guarantee a shared prefix — test_multihost.py:131)."""
    hf, eng, mh, probe = leader
    rng = np.random.RandomState(67)
    for trial in range(3):
        prompt = rng.randint(1, hf.vocab_size, size=5).tolist()
        h, q = mh.start_request(prompt, {"max_length": 90,
                                         "do_sample": False, "top_k": 1,
                                         "eos_token_id": -1})
        # let it decode a nondeterministic amount of wall-time, then stop
        time.sleep(0.2 + 0.15 * trial)
        mh.stop_request(h)
        mh.barrier(timeout_s=300)
        _follower_final(probe, h.uuid)
        lead = q.GetAllGeneratedTokens()
        foll = probe.call("all_tokens", uuid=h.uuid)
        assert lead == foll, (trial, len(lead), len(foll))
        mh.release_request(h)
        mh.barrier(timeout_s=300)

    for rep in mh.check_divergence():
        assert rep["matches"], rep
        assert rep["lockstep_divergence"] == 0, rep
