"""bench.py driver contract: exactly ONE JSON line on stdout, always.

Round-3 lost its perf record to a transient axon-tunnel outage because a
backend exception escaped main() and stdout got a traceback instead of
JSON. These tests pin the hardened behavior: a dead backend still yields a
single parseable line (value null + error), and the retry loop recovers
from transient failures.
"""

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_backend_outage_still_prints_one_json_line():
    # JAX_PLATFORMS=cuda with no CUDA plugin makes every probe subprocess
    # fail fast — a faithful stand-in for the tunnel being UNAVAILABLE.
    env = dict(
        os.environ,
        JAX_PLATFORMS="cuda",
        PALLAS_AXON_POOL_IPS="",  # stop sitecustomize forcing axon back on
        SHAPEGEN_BENCH_ATTEMPTS="2",
        SHAPEGEN_BENCH_BACKOFF_SECONDS="0.1",
        SHAPEGEN_BENCH_PROBE_TIMEOUT="120",
    )
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")],
        capture_output=True, text=True, timeout=300, cwd=REPO, env=env,
    )
    assert out.returncode == 0, out.stderr
    lines = [ln for ln in out.stdout.splitlines() if ln.strip()]
    assert len(lines) == 1, f"stdout must be ONE JSON line, got: {out.stdout!r}"
    rec = json.loads(lines[0])
    assert rec["value"] is None
    assert rec["vs_baseline"] is None
    assert "error" in rec and "attempts" in rec["error"]
    assert rec["metric"].startswith("samples/sec/chip")


def test_retry_recovers_from_transient_outage(monkeypatch):
    sys.path.insert(0, REPO)
    import bench

    calls = {"probe": 0}

    def flaky_probe():
        calls["probe"] += 1
        if calls["probe"] == 1:
            raise RuntimeError("UNAVAILABLE: tunnel down")

    monkeypatch.setattr(bench, "_probe_backend", flaky_probe)
    monkeypatch.setattr(bench, "_measure_tpu_once", lambda: 2.7)
    monkeypatch.setattr(bench, "BENCH_ATTEMPTS", 3)
    monkeypatch.setattr(bench, "BENCH_BACKOFF", [0.01])
    assert bench.measure_tpu_with_retry() == 2.7
    assert calls["probe"] == 2


def test_retry_exhaustion_raises_with_context(monkeypatch):
    sys.path.insert(0, REPO)
    import bench

    def dead_probe():
        raise RuntimeError("UNAVAILABLE: tunnel down")

    monkeypatch.setattr(bench, "_probe_backend", dead_probe)
    monkeypatch.setattr(bench, "BENCH_ATTEMPTS", 2)
    monkeypatch.setattr(bench, "BENCH_BACKOFF", [0.01])
    try:
        bench.measure_tpu_with_retry()
    except RuntimeError as e:
        assert "2 attempts" in str(e) and "UNAVAILABLE" in str(e)
    else:
        raise AssertionError("expected RuntimeError after exhausted retries")
