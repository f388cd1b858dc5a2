"""bench.py supervisor: the driver's end-of-round benchmark must survive
axon-tunnel hangs (child stuck at 0% CPU indefinitely — the documented
failure mode), so the parent stall-detects, kills, and retries."""

import json
import sys

import pytest


@pytest.fixture
def bench(monkeypatch):
    sys.path.insert(0, "/root/repo")
    import bench as mod
    return mod


def test_supervisor_relays_json(bench, monkeypatch, capfd):
    monkeypatch.setenv("IISAN_BENCH_ATTEMPTS", "1")
    monkeypatch.setenv("IISAN_BENCH_POLL", "0.05")
    code = bench.supervise([sys.executable, "-c",
                            "print('log noise'); "
                            "print('{\"metric\": \"m\", \"value\": 1}')"])
    assert code == 0
    out = capfd.readouterr().out.strip().splitlines()
    assert json.loads(out[-1]) == {"metric": "m", "value": 1}


def test_supervisor_kills_stalled_child_and_retries(bench, monkeypatch,
                                                    capfd, tmp_path):
    """First attempt sleeps forever at 0% CPU (tunnel-hang shape); the
    supervisor stall-kills it and the retry succeeds."""
    marker = tmp_path / "ran_once"
    prog = (
        "import os, sys, time\n"
        f"m = {str(marker)!r}\n"
        "if os.path.exists(m):\n"
        "    print('{\"metric\": \"m\", \"value\": 2}')\n"
        "else:\n"
        "    open(m, 'w').close()\n"
        "    time.sleep(3600)\n"
    )
    monkeypatch.setenv("IISAN_BENCH_ATTEMPTS", "2")
    monkeypatch.setenv("IISAN_BENCH_POLL", "0.05")
    monkeypatch.setenv("IISAN_BENCH_STALL", "1.0")
    monkeypatch.setenv("IISAN_BENCH_TIMEOUT", "30")
    code = bench.supervise([sys.executable, "-c", prog])
    assert code == 0
    out = capfd.readouterr()
    assert json.loads(out.out.strip().splitlines()[-1])["value"] == 2
    assert "CPU ticks in" in out.err


def test_supervisor_fails_after_attempts(bench, monkeypatch, capfd):
    monkeypatch.setenv("IISAN_BENCH_ATTEMPTS", "2")
    monkeypatch.setenv("IISAN_BENCH_POLL", "0.05")
    code = bench.supervise([sys.executable, "-c", "raise SystemExit(3)"])
    assert code == 1
    assert "exited 3" in capfd.readouterr().err


def test_supervisor_salvages_partial_json_on_kill(bench, monkeypatch, capfd):
    """Round-3 postmortem: a kill mid-uncached must not destroy the already
    flushed cached-headline line — the supervisor emits it, degraded."""
    monkeypatch.setenv("IISAN_BENCH_ATTEMPTS", "1")
    monkeypatch.setenv("IISAN_BENCH_POLL", "0.05")
    monkeypatch.setenv("IISAN_BENCH_TIMEOUT", "1.0")
    monkeypatch.setenv("IISAN_BENCH_STALL", "600")
    prog = ("import json, time\n"
            "print(json.dumps({'metric': 'm', 'value': 0.1,"
            " 'vs_baseline': 220.0}), flush=True)\n"
            "time.sleep(3600)\n")
    # -S: skip site init so the child prints well before the 1 s wall cap
    # even on a loaded machine (bare interpreter start is ~25 ms).
    code = bench.supervise([sys.executable, "-S", "-c", prog])
    assert code == 0
    out = capfd.readouterr()
    got = json.loads(out.out.strip().splitlines()[-1])
    assert got["value"] == 0.1 and got["vs_baseline"] == 220.0
    assert "wall cap" in got["degraded"]
    assert "salvaged partial JSON" in out.err


def test_supervisor_salvage_prefers_more_complete_line(bench, monkeypatch,
                                                       capfd, tmp_path):
    """Both attempts die, but the first got further (its line carries the
    uncached numbers): the fuller salvage wins over the later sparser one."""
    marker = tmp_path / "ran_once"
    prog = (
        "import json, os, time\n"
        f"m = {str(marker)!r}\n"
        "full = not os.path.exists(m)\n"
        "open(m, 'w').close()\n"
        "line = {'metric': 'm', 'value': 0.1}\n"
        "if full:\n"
        "    line['uncached_device_users_per_sec'] = 225.0\n"
        "print(json.dumps(line), flush=True)\n"
        "raise SystemExit(7)\n")
    monkeypatch.setenv("IISAN_BENCH_ATTEMPTS", "2")
    monkeypatch.setenv("IISAN_BENCH_POLL", "0.05")
    code = bench.supervise([sys.executable, "-c", prog])
    assert code == 0
    got = json.loads(capfd.readouterr().out.strip().splitlines()[-1])
    assert got["uncached_device_users_per_sec"] == 225.0
    assert "exited 7" in got["degraded"]


def test_supervisor_honors_total_budget(bench, monkeypatch, capfd):
    """A silent hang must not let retries blow the driver's outer timeout:
    once < 120 s of IISAN_BENCH_TOTAL remains, no new attempt starts."""
    monkeypatch.setenv("IISAN_BENCH_ATTEMPTS", "5")
    monkeypatch.setenv("IISAN_BENCH_POLL", "0.05")
    monkeypatch.setenv("IISAN_BENCH_TIMEOUT", "1.0")
    monkeypatch.setenv("IISAN_BENCH_STALL", "600")
    monkeypatch.setenv("IISAN_BENCH_TOTAL", "1.5")
    import time
    t0 = time.time()
    code = bench.supervise([sys.executable, "-c",
                            "import time; time.sleep(3600)"])
    assert code == 1
    assert time.time() - t0 < 30
    err = capfd.readouterr().err
    assert "IISAN_BENCH_TOTAL" in err


def test_supervisor_skips_malformed_json_tail(bench, monkeypatch, capfd):
    """A truncated trailing line (child killed mid-print) must not shadow
    the last complete JSON line."""
    monkeypatch.setenv("IISAN_BENCH_ATTEMPTS", "1")
    monkeypatch.setenv("IISAN_BENCH_POLL", "0.05")
    prog = ("print('{\"metric\": \"m\", \"value\": 3}')\n"
            "import sys; sys.stdout.write('{\"metric\": \"trunc')\n")
    code = bench.supervise([sys.executable, "-c", prog])
    assert code == 0
    got = json.loads(capfd.readouterr().out.strip().splitlines()[-1])
    assert got["value"] == 3
