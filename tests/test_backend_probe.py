"""Backend probe + bench watchdog plumbing (sd_video_gen_tpu/utils/backend.py).

The round-3 driver artifacts died on a dead TPU tunnel relay (BENCH_r03
rc=1 mid-device_put, MULTICHIP_r03 rc=124 hang). These tests pin the
fast-fail contract so a regression can't silently reintroduce the hang.
"""

import json
import os
import subprocess
import sys

import pytest

from sd_video_gen_tpu.utils.backend import init_backend_or_die, probe_backend

ROOT = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..")


def test_probe_pinned_cpu_shortcut(monkeypatch):
    # JAX_PLATFORMS=cpu can't route through the tunnel: no subprocess spent
    monkeypatch.setenv("JAX_PLATFORMS", "cpu")
    calls = []
    monkeypatch.setattr(subprocess, "run",
                        lambda *a, **k: calls.append(a) or (_ for _ in ()).throw(
                            AssertionError("subprocess must not run")))
    assert probe_backend("t") == "cpu"
    assert not calls


def test_probe_live_backend_round_trips_compute(monkeypatch):
    # un-pinned: probe must subprocess AND execute a real matmul (device
    # enumeration alone passes on a half-alive relay — observed r4)
    monkeypatch.delenv("JAX_PLATFORMS", raising=False)
    seen = {}
    real_run = subprocess.run

    def spy(cmd, **kw):
        seen["code"] = cmd[-1]
        # pin the child to cpu at CONFIG level: the axon sitecustomize
        # overrides the JAX_PLATFORMS env var at interpreter boot (see
        # backend.force_cpu), so env-pinning alone still initializes the
        # tunnel backend and hangs on a dead relay (observed r4, 120s)
        cmd = cmd[:-1] + ["import jax; "
                          "jax.config.update('jax_platforms', 'cpu'); "
                          + cmd[-1]]
        return real_run(cmd, env=dict(os.environ, JAX_PLATFORMS="cpu"), **kw)

    monkeypatch.setattr(subprocess, "run", spy)
    assert probe_backend("t", timeout_s=120) == "cpu"
    assert "block_until_ready" in seen["code"]  # compute, not just devices()


def test_probe_dead_backend_exits_fast(monkeypatch):
    monkeypatch.delenv("JAX_PLATFORMS", raising=False)

    def hang(cmd, timeout=None, **kw):
        raise subprocess.TimeoutExpired(cmd, timeout)

    monkeypatch.setattr(subprocess, "run", hang)
    with pytest.raises(SystemExit, match="relay is likely down"):
        probe_backend("bench", timeout_s=1)


def test_init_backend_pinned_cpu_shortcut(monkeypatch):
    # JAX_PLATFORMS=cpu: no watchdog thread, no device round trip needed
    monkeypatch.setenv("JAX_PLATFORMS", "cpu")
    assert init_backend_or_die("t") == "cpu"


def test_init_backend_live_path_returns_platform():
    """Un-pinned env + healthy (cpu) backend: the full in-process path must
    round-trip a matmul and return the platform, monitor disarmed."""
    code = """
import os, sys
os.environ.pop("JAX_PLATFORMS", None)
import jax
jax.config.update("jax_platforms", "cpu")
from sd_video_gen_tpu.utils.backend import init_backend_or_die
print(init_backend_or_die("t", deadline_s=120))
"""
    proc = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True,
        timeout=180, cwd=ROOT,
        env={k: v for k, v in os.environ.items() if k != "JAX_PLATFORMS"})
    assert proc.returncode == 0, proc.stderr[-800:]
    assert proc.stdout.split()[-1] == "cpu"


def test_init_backend_hung_init_exits_init_hung_rc():
    """A jax.devices() that never returns must not hang the tool: the
    monitor thread prints the actionable one-liner and exits
    INIT_HUNG_RC (17) so a supervisor can retry the stuck session."""
    code = """
import os, sys, time
os.environ.pop("JAX_PLATFORMS", None)
import jax
jax.devices = lambda *a, **k: time.sleep(3600)
from sd_video_gen_tpu.utils.backend import init_backend_or_die
init_backend_or_die("toolx", deadline_s=1.0)
print("UNREACHABLE")
"""
    proc = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True,
        timeout=120, cwd=ROOT,
        env={k: v for k, v in os.environ.items() if k != "JAX_PLATFORMS"})
    assert proc.returncode == 17  # INIT_HUNG_RC: retryable, see backend.py
    assert "relay is likely down" in proc.stdout
    assert "UNREACHABLE" not in proc.stdout


def test_bench_supervisor_retries_hung_init_then_gives_up():
    """Un-pinned bench must supervise: retry INIT_HUNG_RC children with the
    REMAINING time budget, pass through other rcs, exit 1 when exhausted."""
    code = """
import os, sys
os.environ.pop("JAX_PLATFORMS", None)
os.environ["SDVG_BENCH_RETRIES"] = "2"
sys.path.insert(0, %r)
import bench, subprocess
calls = []
def fake_call(cmd, env=None):
    calls.append(float(env["SDVG_BENCH_HARD_S"]))
    assert env["SDVG_BENCH_CHILD"] == "1"
    return 17
subprocess.call = fake_call
try:
    bench.main()
except SystemExit as e:
    print("rc", e.code, "calls", len(calls),
          "monotonic", all(b <= a for a, b in zip(calls, calls[1:])))
"""
    proc = subprocess.run(
        [sys.executable, "-c", code % os.path.abspath(ROOT)],
        capture_output=True, text=True, timeout=120,
        env={k: v for k, v in os.environ.items() if k != "JAX_PLATFORMS"})
    assert proc.returncode == 0, proc.stderr[-800:]
    assert "rc 1 calls 3 monotonic True" in proc.stdout


def test_bench_watchdog_emits_partial_results():
    """If the backend hangs mid-run, bench's watchdog must still emit the
    completed scenarios as a parseable final JSON line and exit 0."""
    code = """
import json, os, sys, time
sys.path.insert(0, %r)
os.environ["SDVG_BENCH_HARD_S"] = "2"
os.environ["SDVG_BENCH_SCENARIOS"] = "wd_fast,wd_hang"
import bench
bench.SCENARIOS = [
    ("wd_fast", lambda: (42.0, "u")),
    ("wd_hang", lambda: time.sleep(3600)),
]
bench.BASELINES.update({"wd_fast": 1.0, "wd_hang": 1.0})
bench._probe_backend = lambda *a, **k: None
bench.main()
"""
    proc = subprocess.run(
        [sys.executable, "-c", code % os.path.abspath(ROOT)],
        capture_output=True, text=True, timeout=120,
        env=dict(os.environ, JAX_PLATFORMS="cpu"))
    assert proc.returncode == 0, proc.stderr[-800:]
    final = json.loads(proc.stdout.strip().splitlines()[-1])
    assert final["scenarios"]["wd_fast"]["value"] == 42.0
    assert any("watchdog" in ln for ln in proc.stdout.splitlines())
