"""Backend liveness probe shared by every long-running CLI tool.

The dev environment reaches the TPU through a tunnel; when the relay dies,
the FIRST jax.devices() call in a process hangs indefinitely (round-3
driver artifacts: BENCH_r03.json rc=1 deep inside a device_put,
MULTICHIP_r03.json rc=124). Any tool that runs on the default backend must
call probe_backend() BEFORE importing/initializing jax devices so a dead
relay produces a one-line actionable error in seconds, not a silent hang.

The probe runs ``jax.devices()`` in a SUBPROCESS with a hard timeout: the
parent's own jax backend stays uninitialized either way, so a hung probe
cannot poison the parent (the round-3 failure mode in __graft_entry__.py).
"""

from __future__ import annotations

import os
import subprocess
import sys

__all__ = ["probe_backend", "init_backend_or_die", "INIT_HUNG_RC"]

# Distinctive exit code for "backend init hung": lets a supervisor
# (bench.py retry loop) distinguish a stuck tunnel session — worth
# retrying in a fresh process — from a real benchmark failure.
INIT_HUNG_RC = 17


def force_cpu() -> None:
    """Pin this process to the CPU backend — at the CONFIG level.

    env-var pinning (JAX_PLATFORMS=cpu) is NOT sufficient here: the axon
    sitecustomize's register() sets jax_platforms at jax.config level at
    interpreter boot, which takes precedence over the env var, so an
    env-pinned process still initializes the axon backend on its first
    jax.devices() (observed r4: hung 5+ min on a dead relay WITH
    JAX_PLATFORMS=cpu exported). jax.config.update after import wins.
    """
    import jax
    jax.config.update("jax_platforms", "cpu")


def _pinned_host_platform() -> str | None:
    """First JAX_PLATFORMS token IF it pins a tunnel-free host platform,
    else None. Enforces a cpu pin at config level (the env var alone is
    overridden by the axon sitecustomize, see force_cpu). Shared by both
    probe entry points so the tunnel-alias list lives in one place."""
    pinned = os.environ.get("JAX_PLATFORMS", "")
    if pinned and "tpu" not in pinned and "axon" not in pinned \
            and "proxy" not in pinned:
        if pinned.split(",")[0] == "cpu":
            force_cpu()
        return pinned.split(",")[0]
    return None


def honor_platform_pin() -> str | None:
    """CLI entry points call this before touching jax so an explicit
    ``JAX_PLATFORMS=cpu`` env pin actually works: the axon sitecustomize
    sets jax_platforms at config level at interpreter boot, which silently
    outranks the env var (see force_cpu) — without this, a 'CPU' child
    process opens a tunnel session and can hang on a dead relay."""
    return _pinned_host_platform()


def probe_backend(tool: str = "tool", timeout_s: float | None = None) -> str:
    """Return the default platform name, or SystemExit fast if it's dead.

    Shortcut: if JAX_PLATFORMS pins a host platform (cpu), the caller asked
    for a tunnel-free run — skip the subprocess round trip.
    """
    host = _pinned_host_platform()
    if host is not None:
        return host
    timeout_s = timeout_s or float(os.environ.get("SDVG_BENCH_PROBE_S", 90))
    # Enumerating devices is NOT enough: a half-dead relay answers
    # jax.devices() but hangs the first real transfer/execution (observed
    # r4: probe passed 'axon', bench then hung in compute). Round-trip a
    # tiny matmul so the probe exercises transfer + compile + execute.
    code = ("import jax, jax.numpy as jnp; d = jax.devices(); "
            "x = jnp.ones((8, 8)); "
            "v = float((x @ x).sum().block_until_ready()); "
            "assert v == 512.0, v; "
            "print(d[0].platform, len(d), flush=True)")
    try:
        proc = subprocess.run([sys.executable, "-c", code],
                              capture_output=True, text=True,
                              timeout=timeout_s)
    except subprocess.TimeoutExpired:
        raise SystemExit(
            f"{tool}: jax backend init hung >{timeout_s:.0f}s — the TPU "
            "tunnel relay is likely down. Restart the relay or set "
            "JAX_PLATFORMS=cpu for a smoke run. No measurements taken.")
    if proc.returncode != 0:
        raise SystemExit(
            f"{tool}: jax backend failed to initialize (rc="
            f"{proc.returncode}). stderr tail:\n" + proc.stderr[-800:])
    return proc.stdout.split()[0] if proc.stdout.split() else "?"


def init_backend_or_die(tool: str = "tool",
                        deadline_s: float | None = None) -> str:
    """Initialize the default backend IN-PROCESS under a watchdog deadline.

    Why not probe_backend for the measuring tools: the tunnel serves client
    sessions erratically — observed r4b with the relay LIVE, one client
    initialized in 0.09 s while the probe subprocess (and every later
    client) hung >300 s. A subprocess probe therefore (a) can false-fail a
    healthy relay and (b) burns one of the scarce session slots the real
    run needs. For a tool whose only job is to run on the default backend,
    the right shape is ONE client session: init here, and if init doesn't
    complete by the deadline, a monitor thread prints the actionable
    one-liner and os._exit(INIT_HUNG_RC)s — the distinctive rc lets a
    supervisor retry a stuck session (a hung jax.devices() never returns
    to Python, so sys.exit/exceptions can't fire).

    probe_backend stays for callers that need a fallback path after
    failure (they must not poison their own process with a hung backend).
    """
    host = _pinned_host_platform()
    if host is not None:
        return host
    deadline_s = deadline_s or float(os.environ.get("SDVG_BENCH_PROBE_S", 600))
    import threading
    done = threading.Event()

    def _monitor() -> None:
        if done.wait(deadline_s):
            return
        msg = (f"{tool}: jax backend init hung >{deadline_s:.0f}s — the TPU "
               "tunnel relay is likely down. Restart the relay or set "
               "JAX_PLATFORMS=cpu for a smoke run. No measurements taken.")
        print(msg, file=sys.stderr, flush=True)
        print(msg, flush=True)
        os._exit(INIT_HUNG_RC)

    threading.Thread(target=_monitor, daemon=True).start()
    import jax
    import jax.numpy as jnp
    d = jax.devices()
    x = jnp.ones((8, 8))
    v = float((x @ x).sum().block_until_ready())
    assert v == 512.0, v
    done.set()
    return d[0].platform
