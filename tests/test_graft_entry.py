"""Driver-entry contract: the dryrun decision must never initialize a jax
backend in the calling process (a dead TPU relay hangs the first
jax.devices() call indefinitely — MULTICHIP_r03.json rc=124), and the
subprocess child must never recurse."""

import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import __graft_entry__ as graft  # noqa: E402


def test_initialized_count_sees_live_backend():
    # conftest initialized the 8-device CPU backend before this runs
    import jax
    jax.devices()
    assert graft._initialized_device_count() >= 8


def test_probe_does_not_initialize_backend():
    # Run in a cold interpreter: the probe must return None AND leave the
    # backend cache empty (proving it never triggered initialization).
    code = (
        "import sys; sys.path.insert(0, %r)\n"
        "import __graft_entry__ as graft\n"
        "import jax._src.xla_bridge as xb\n"
        "assert graft._initialized_device_count() is None\n"
        "assert not xb._backends, 'probe initialized a backend!'\n"
        "print('cold-probe-ok')\n" % REPO)
    proc = subprocess.run([sys.executable, "-c", code], capture_output=True,
                          text=True, timeout=120)
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert "cold-probe-ok" in proc.stdout


def test_child_guard_refuses_to_recurse(monkeypatch):
    # A child whose backend came up too small must raise, not spawn
    # grandchildren forever.
    monkeypatch.setenv("SDVG_DRYRUN_CHILD", "1")
    monkeypatch.setattr(graft, "_initialized_device_count", lambda: 2)
    with pytest.raises(RuntimeError, match="only 2 devices"):
        graft.dryrun_multichip(4)
