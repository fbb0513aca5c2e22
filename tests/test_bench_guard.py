"""bench.py must never hang when the TPU relay is unreachable: the
warm-child probe doubles as a liveness check, and two timed-out probes
must produce an explicit one-line JSON error (driver-parseable) instead
of blocking forever in backend init (PERFNOTES.md §6)."""

import importlib.util
import json
import os
import subprocess
import sys

import pytest


def _load_bench():
    path = os.path.join(os.path.dirname(__file__), "..", "bench.py")
    spec = importlib.util.spec_from_file_location("bench_under_test", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_bench_emits_error_json_when_relay_down(monkeypatch, capsys):
    bench = _load_bench()

    def timeout_run(*a, **kw):
        raise subprocess.TimeoutExpired(cmd=a[0], timeout=kw.get("timeout"))

    monkeypatch.setattr(bench.subprocess, "run", timeout_run)
    bench.main()
    line = [l for l in capsys.readouterr().out.splitlines()
            if l.startswith("{")][-1]
    rec = json.loads(line)
    assert rec["unit"] == "pairs/s"
    assert rec["value"] == 0.0
    assert "relay unreachable" in rec["error"]


def test_bench_probe_retries_then_proceeds_on_success(monkeypatch):
    bench = _load_bench()
    calls = []

    class FakeDone:
        returncode = 0
        stdout = "warm child D2H: 1.0ms"
        stderr = ""

    def flaky_run(*a, **kw):
        calls.append(1)
        if len(calls) == 1:
            raise subprocess.TimeoutExpired(cmd=a[0],
                                            timeout=kw.get("timeout"))
        return FakeDone()

    monkeypatch.setattr(bench.subprocess, "run", flaky_run)
    # Stop right after the probe: align is the next call in main().
    sentinel = RuntimeError("probe passed; stopping before device work")

    def stop(*a, **kw):
        raise sentinel

    monkeypatch.setattr(bench, "align", stop, raising=False)
    import aim_tpu.api as api
    monkeypatch.setattr(api, "align", stop)
    with pytest.raises(RuntimeError) as exc:
        bench.main()
    assert exc.value is sentinel       # main() really got past the probe
    assert len(calls) == 2


def test_bench_proceeds_on_fast_child_failure(monkeypatch):
    # A child that exits nonzero QUICKLY (no timeout) is not outage
    # evidence: bench must proceed to the real run (which absorbs any
    # stall itself) instead of emitting a false 'relay unreachable'.
    bench = _load_bench()

    class FakeFail:
        returncode = 1
        stdout = ""
        stderr = "transient backend error"

    monkeypatch.setattr(bench.subprocess, "run",
                        lambda *a, **kw: FakeFail())
    sentinel = RuntimeError("reached the real run")

    def stop(*a, **kw):
        raise sentinel

    monkeypatch.setattr(bench, "align", stop, raising=False)
    import aim_tpu.api as api
    monkeypatch.setattr(api, "align", stop)
    with pytest.raises(RuntimeError) as exc:
        bench.main()
    assert exc.value is sentinel
