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
