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

__all__ = ["probe_backend"]


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


def probe_backend(tool: str = "tool", timeout_s: float | None = None) -> str:
    """Return the default platform name, or SystemExit fast if it's dead.

    Shortcut: if JAX_PLATFORMS pins a host platform (cpu), the caller asked
    for a tunnel-free run — ENFORCE it at config level (the env var alone
    is overridden by the axon sitecustomize, see force_cpu) and skip the
    subprocess round trip.
    """
    pinned = os.environ.get("JAX_PLATFORMS", "")
    if pinned and "tpu" not in pinned and "axon" not in pinned \
            and "proxy" not in pinned:
        if pinned.split(",")[0] == "cpu":
            force_cpu()
        return pinned.split(",")[0]
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
