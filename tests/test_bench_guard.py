"""bench.py's liveness contract (VERDICT r3 item 1): the JSON line is
emitted within a hard wall-clock budget no matter what the TPU relay
does.  The parent process never touches the device; all device work runs
in a measurement child that checkpoints partial results, so a hung relay
produces either a degraded-but-real JSON line or an explicit error line
— never silence (the round-3 failure mode: rc=124, parsed=null)."""

import importlib.util
import json
import os
import subprocess
import sys
import time

import pytest


def _load_bench():
    path = os.path.join(os.path.dirname(__file__), "..", "bench.py")
    spec = importlib.util.spec_from_file_location("bench_under_test", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_bench_emits_error_json_when_relay_down(monkeypatch, capsys):
    # Every child (warm probe AND measurement) hangs past its timeout:
    # the parent must still emit an explicit error object.
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


def test_bench_emits_degraded_partial_when_child_killed(monkeypatch,
                                                        capsys):
    # The measurement child got real numbers checkpointed before the
    # relay stalled: the parent must emit them, marked degraded.
    bench = _load_bench()

    def fake_run(cmd, **kw):
        if "--measure" in cmd:
            partial = cmd[cmd.index("--measure") + 1]
            with open(partial, "w") as f:
                f.write(json.dumps({
                    "metric": bench._HEADLINE, "value": 123456.0,
                    "unit": "pairs/s", "vs_baseline": 0.03,
                    "cpu_1t_pairs_s": 4e6}))
            raise subprocess.TimeoutExpired(cmd=cmd,
                                            timeout=kw.get("timeout"))

        class Done:
            returncode = 0
            stdout = "warm child D2H: 1.0ms"
            stderr = ""
        return Done()

    monkeypatch.setattr(bench.subprocess, "run", fake_run)
    bench.main()
    line = [l for l in capsys.readouterr().out.splitlines()
            if l.startswith("{")][-1]
    rec = json.loads(line)
    assert rec["value"] == 123456.0
    assert rec["degraded"] is True
    assert "budget" in rec["error"]


def test_bench_passes_through_child_json(monkeypatch, capsys):
    # Healthy path: the measurement child's own JSON line is relayed
    # verbatim; a fast nonzero warm probe is NOT outage evidence.
    bench = _load_bench()
    payload = {"metric": bench._HEADLINE, "value": 99.0, "unit": "pairs/s",
               "vs_baseline": 1.0}

    def fake_run(cmd, **kw):
        class R:
            returncode = 0
            stdout = ""
            stderr = ""
        r = R()
        if "-c" in cmd:          # warm probe: fast failure, not a timeout
            r.returncode = 1
            r.stderr = "transient backend error"
        elif "--measure" in cmd:
            r.stdout = json.dumps(payload) + "\n"
        return r

    monkeypatch.setattr(bench.subprocess, "run", fake_run)
    bench.main()
    line = [l for l in capsys.readouterr().out.splitlines()
            if l.startswith("{")][-1]
    assert json.loads(line) == payload


@pytest.mark.parametrize("budget", ["2"])
def test_bench_wall_clock_bounded_with_hanging_children(budget):
    # REAL wall-clock: both children replaced by a hanging sleep via the
    # test hook; the whole bench.py invocation must finish well inside
    # the driver's window and still print a parseable error line.
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ)
    env.update(AIM_TPU_BENCH_WARM_TIMEOUT="1", AIM_TPU_BENCH_BUDGET=budget,
               AIM_TPU_BENCH_TEST_CHILD_CMD="sleep 600")
    t0 = time.perf_counter()
    r = subprocess.run([sys.executable, os.path.join(repo, "bench.py")],
                       env=env, capture_output=True, text=True, timeout=60)
    wall = time.perf_counter() - t0
    assert wall < 30, f"bench.py took {wall:.1f}s with hanging children"
    lines = [l for l in r.stdout.splitlines() if l.startswith("{")]
    assert lines, r.stderr[-500:]
    rec = json.loads(lines[-1])
    assert rec["value"] == 0.0 and "error" in rec
