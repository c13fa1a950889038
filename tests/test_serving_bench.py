"""Serving benchmark harness smoke test (examples/benchmark_throughput.py):
drives the FULL engine loop on the tiny preset and validates the
BENCH-style JSON artifact (VERDICT r2 #4)."""

import json
import os
import runpy
import sys


def test_serving_bench_artifact(tmp_path):
    out = tmp_path / "serve.json"
    argv = ["benchmark_throughput.py", "--preset", "tiny", "--batch", "2",
            "--num-requests", "4", "--in-len", "24", "--out-len", "8",
            "--decode-steps", "2", "--warmup", "--json", str(out)]
    old = sys.argv
    sys.argv = argv
    try:
        runpy.run_path(os.path.join(os.path.dirname(__file__), "..",
                                    "examples", "benchmark_throughput.py"),
                       run_name="__main__")
    finally:
        sys.argv = old
    art = json.loads(out.read_text())
    assert art["total_tok_s"] > 0
    assert art["steady_decode_tok_s"] > 0
    assert 0 < art["p50_ttft_s"] < 60
    assert art["num_requests"] == 4
    assert art["install_s"] >= 0 and art["warmup_s"] > 0
