"""The REAL multi-host CLI entry points, end to end (VERDICT r3 #4).

Round 3 shipped `python -m dashinfer_tpu.service.multihost` whose leader
branch admitted client requests LOCALLY (daemon.mh was never consulted),
so followers replicated ticks for requests they never received and every
tick diverged. This test drives the actual mains as subprocesses — leader
+ follower, client over the wire — and asserts identical token streams,
matching scheduler digests, and zero lockstep divergence.
"""

import json
import os
import socket
import subprocess
import sys
import time

import pytest

import tests.hf_util as hf_util


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _wait_port(proc, port, what, deadline_s=420):
    deadline = time.monotonic() + deadline_s
    while time.monotonic() < deadline:
        if proc.poll() is not None:
            raise RuntimeError(f"{what} died during startup "
                               f"(rc={proc.returncode})")
        try:
            socket.create_connection(("127.0.0.1", port), timeout=1).close()
            return
        except OSError:
            time.sleep(0.5)
    proc.kill()
    raise TimeoutError(f"{what} never came up")


@pytest.fixture(scope="module")
def checkpoint(tmp_path_factory):
    """A real on-disk HF checkpoint dir (the CLI's --model input)."""
    d = tmp_path_factory.mktemp("ckpt")
    hf = hf_util.tiny_qwen2_config()
    model = hf_util.make_torch_model(hf)
    model.save_pretrained(str(d), safe_serialization=True)
    return str(d)


@pytest.fixture(scope="module")
def cluster(checkpoint):
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ, JAX_PLATFORMS="cpu",
               PYTHONPATH=repo + os.pathsep + os.environ.get("PYTHONPATH",
                                                             ""))
    fport, lport = _free_port(), _free_port()
    common = ["--model", checkpoint, "--name", "m",
              "--max-batch", "2", "--max-length", "96",
              "--dtype", "float32", "--page-size", "16",
              "--num-pages", "24", "--min-bucket", "16",
              "--prefix-cache"]
    fol = subprocess.Popen(
        [sys.executable, "-m", "dashinfer_tpu.service.multihost",
         "--role", "follower", "--port", str(fport)] + common,
        env=env, cwd=repo, stdout=subprocess.DEVNULL,
        stderr=subprocess.DEVNULL)
    try:
        _wait_port(fol, fport, "follower CLI")
        led = subprocess.Popen(
            [sys.executable, "-m", "dashinfer_tpu.service.multihost",
             "--role", "leader", "--port", str(lport),
             "--followers", f"127.0.0.1:{fport}"] + common,
            env=env, cwd=repo, stdout=subprocess.DEVNULL,
            stderr=subprocess.DEVNULL)
        try:
            _wait_port(led, lport, "leader CLI")
            yield (lport, fport)
        finally:
            led.terminate()
            led.wait(timeout=30)
    finally:
        fol.terminate()
        fol.wait(timeout=30)


def test_cli_leader_replicates_client_requests(cluster):
    from dashinfer_tpu.service.client import _Rpc

    lport, fport = cluster
    leader = _Rpc("127.0.0.1", lport)
    follower = _Rpc("127.0.0.1", fport)
    try:
        gen = {"max_length": 24, "do_sample": False, "top_k": 1,
               "eos_token_id": -1}
        reqs = []
        for i in range(3):
            r = leader.call("start_request", name="m",
                            input_ids=[5 + i, 9, 2, 41, 7], gen_cfg=gen)
            reqs.append(r["uuid"])

        for uuid in reqs:
            leader.call("sync_request", uuid=uuid, timeout_s=600)

        # identical token streams on BOTH hosts (the follower executed the
        # same replicated admissions + ticks; uuids are leader-pinned)
        for uuid in reqs:
            lt = leader.call("all_tokens", uuid=uuid)
            deadline = time.monotonic() + 300
            while time.monotonic() < deadline:
                ft = follower.call("all_tokens", uuid=uuid)
                if len(ft) >= len(lt):
                    break
                time.sleep(0.2)
            assert lt == ft, (uuid, lt, ft)
            assert len(lt) == 24 - 5

        # zero divergence at a sequence barrier; digests agree
        rep = leader.call("check_divergence")
        assert len(rep) == 1
        assert rep[0]["matches"], rep
        assert rep[0]["lockstep_divergence"] == 0, rep

        fstats = follower.call("engine_stats", name="m")
        assert fstats["lockstep_divergence"] == 0

        # stop/release route through replication too
        for uuid in reqs:
            leader.call("release_request", uuid=uuid)
        rep = leader.call("check_divergence")
        assert rep[0]["matches"], rep
    finally:
        leader.close()
        follower.close()
