"""bench.py must ALWAYS print one parseable JSON line (rc=0).

Analog: the reference runtime's stats line always prints
(reference cpp/llm_chat.cc:547-556) even when a session went sideways.
Round-2 lesson: a TPU-tunnel outage turned the whole round's bench record
into an rc=1 stack trace; these tests pin the structured-failure contract.
"""

import json

import pytest


@pytest.fixture()
def bench_mod(monkeypatch):
    import bench

    monkeypatch.delenv("MLC_BENCH_CPU", raising=False)
    monkeypatch.delenv("MLC_BENCH_SKIP_PROBE", raising=False)
    return bench


def _parse_single_json_line(out: str) -> dict:
    lines = [ln for ln in out.strip().splitlines() if ln.strip()]
    assert len(lines) == 1, f"expected exactly one JSON line, got: {lines}"
    return json.loads(lines[0])


def test_backend_unavailable_emits_failure_json(bench_mod, monkeypatch, capsys):
    def dead_probe(*a, **k):
        raise RuntimeError("backend init timed out after 240s (attempt 3)")

    monkeypatch.setattr(bench_mod, "_probe_backend", dead_probe)
    bench_mod.main()  # must NOT raise
    rec = _parse_single_json_line(capsys.readouterr().out)
    assert rec["metric"] == bench_mod.HEADLINE_METRIC
    assert rec["value"] is None
    assert rec["error"] == "backend_unavailable"
    assert "timed out" in rec["detail"]


def test_run_exception_emits_failure_json(bench_mod, monkeypatch, capsys):
    monkeypatch.setenv("MLC_BENCH_SKIP_PROBE", "1")

    def boom():
        raise ValueError("chip fell over")

    monkeypatch.setattr(bench_mod, "_run", boom)
    bench_mod.main()  # must NOT raise
    rec = _parse_single_json_line(capsys.readouterr().out)
    assert rec["error"] == "ValueError"
    assert rec["value"] is None


def test_probe_timeout_kills_child(bench_mod, monkeypatch):
    # a probe child that hangs must be killed by the timeout, not waited on
    import sys

    monkeypatch.setattr(bench_mod, "sys", sys)
    import time

    t0 = time.perf_counter()
    with pytest.raises(RuntimeError):
        # /bin/sleep stands in for a hung `import jax` child
        real_run = bench_mod.subprocess.run

        def fake_run(cmd, **kw):
            return real_run(["sleep", "60"], **kw)

        monkeypatch.setattr(bench_mod.subprocess, "run", fake_run)
        bench_mod._probe_backend(timeout_s=1.0, attempts=1)
    assert time.perf_counter() - t0 < 10
