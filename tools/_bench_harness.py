"""Shared measurement harness for the tools/ benchmarks.

One implementation of the CSE-proof timing patterns every probe uses
(previously copied per-tool with drift in REP/perturbation handling):

- ``measure``: scan over ``rep`` perturbed copies of the first argument —
  distinct inputs per iteration so XLA cannot CSE the repeats; min-of-3
  outer runs; scalar fetch syncs the device so the tunnel RPC sits outside
  the timed region. Marginal per-invocation time, immune to the measured
  ~150-280 µs per-dispatch/scan-entry overhead (NOTES_r3.md).
- ``timeit``: carry-dependent index-delta scan (the bench_op_floor2
  pattern) for very high-rep micro-ops where materializing ``rep`` input
  copies would not fit or would dominate.
- ``flops_of``: FLOPs from the compiled executable's own cost analysis —
  no hand modeling.

Hardware constants for v5e rooflines live here too so a correction lands
everywhere at once.
"""

import json
import time

import jax
import jax.numpy as jnp

V5E_PEAK_BF16 = 197e12   # bf16 MXU peak, per chip
V5E_HBM_GBS = 819.0      # HBM bandwidth, GB/s


def measure(fn, *args, rep=6, perturb="add"):
    """Mean seconds per ``fn(*args)`` over ``rep`` chained distinct-input
    invocations inside ONE jit; min of 3 outer runs.

    ``perturb`` makes each iteration's first argument distinct:
      - ``"add"``: ``x + (i % 3) * 1e-3`` on floating leaves (pytree-ok;
        non-float leaves pass through unchanged)
      - ``"roll"``: ``jnp.roll(x, i, axis=1)`` (array-only; use when an
        additive epsilon would denormalize the input, e.g. int8 probes)
    """
    x0 = args[0]
    if perturb == "roll":
        xs = jnp.stack([jnp.roll(x0, i, axis=1) for i in range(rep)])
    else:
        xs = jax.tree.map(
            lambda a: jnp.stack([a + jnp.asarray((i % 3) * 1e-3, a.dtype)
                                 if jnp.issubdtype(a.dtype, jnp.floating)
                                 else a for i in range(rep)]), x0)

    @jax.jit
    def chained(xs, *rest):
        def body(acc, xi):
            r = fn(xi, *rest)
            leaves = [jnp.sum(l.astype(jnp.float32))
                      for l in jax.tree.leaves(r)]
            return acc + sum(leaves), ()
        acc, _ = jax.lax.scan(body, jnp.float32(0), xs)
        return acc

    _ = float(chained(xs, *args[1:]))
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        _ = float(chained(xs, *args[1:]))
        best = min(best, time.perf_counter() - t0)
    return best / rep


def timeit(name, fn, *args, rep=100, flops=None):
    """Print + return µs per ``fn(*args)`` via a carry-dependent
    index-delta scan: iteration i runs fn on ``x.at[0,...].add(i + 0*carry)``
    so inputs differ per step AND each step depends on the previous one
    (identical per-iteration calls DO get CSE'd otherwise)."""
    @jax.jit
    def chained_varied(x, *rest):
        def body(carry, i):
            delta = (i + carry.astype(jnp.int32) * 0).astype(x.dtype)
            xi = x.at[(0,) * x.ndim].add(delta)
            r = fn(xi, *rest)
            return jnp.sum(r.astype(jnp.float32)), ()
        acc, _ = jax.lax.scan(body, jnp.zeros((), jnp.float32),
                              jnp.arange(rep, dtype=jnp.int32))
        return acc

    _ = float(chained_varied(*args))
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        _ = float(chained_varied(*args))
        best = min(best, time.perf_counter() - t0)
    us = best / rep * 1e6
    rec = {"case": name, "us": round(us, 1)}
    if flops:
        rec["tflops"] = round(flops / (us * 1e-6) / 1e12, 1)
    print(json.dumps(rec), flush=True)
    return us


def flops_of(fn, *args):
    """FLOPs of the compiled ``fn(*args)`` per XLA's cost analysis."""
    try:
        cost = jax.jit(fn).lower(*args).compile().cost_analysis()
        if isinstance(cost, list):
            cost = cost[0]
        return float(cost.get("flops", float("nan")))
    except Exception as e:  # noqa: BLE001
        print(json.dumps({"warn": f"cost_analysis failed: {e}"[:160]}),
              flush=True)
        return float("nan")
