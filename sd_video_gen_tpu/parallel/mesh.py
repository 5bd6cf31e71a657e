"""Device mesh construction: the framework's distributed backbone.

The reference has no distributed backend at all (SURVEY.md §2.6: dead
torch.distributed code, multi-node = bash + rsync). Here scale-out is
first-class: one ``jax.sharding.Mesh`` with named axes

  - ``data``  : batch-parallel axis (DP) — gradients are psum'd by XLA
  - ``model`` : tensor-parallel axis (TP) — attention heads / FFN hidden
                sharded; XLA inserts all-reduces on the residual stream

Collectives ride ICI automatically once shardings are annotated; there is
nothing NCCL-like to manage. Multi-host extends this by calling
``jax.distributed.initialize()`` before mesh construction (same axis names,
devices spanning hosts).
"""

from __future__ import annotations

import numpy as np
import jax
from jax.sharding import Mesh


AXIS_DATA = "data"
AXIS_MODEL = "model"


def parse_mesh_spec(spec: str | None, n_devices: int | None = None) -> dict[str, int]:
    """'data=4,model=2' -> {'data': 4, 'model': 2}; None -> all devices on data."""
    n = n_devices if n_devices is not None else len(jax.devices())
    if not spec:
        return {AXIS_DATA: n, AXIS_MODEL: 1}
    out: dict[str, int] = {}
    for part in spec.split(","):
        k, v = part.split("=")
        k = k.strip()
        if k not in (AXIS_DATA, AXIS_MODEL):
            # a typo'd axis would otherwise silently fall back to model=1
            # (pure data parallelism) whenever the remaining product
            # matches the device count
            raise ValueError(
                f"unknown mesh axis '{k}' in spec '{spec}' — valid axes: "
                f"{AXIS_DATA}, {AXIS_MODEL}")
        out[k] = int(v)
    out.setdefault(AXIS_DATA, 1)
    out.setdefault(AXIS_MODEL, 1)
    total = out[AXIS_DATA] * out[AXIS_MODEL]
    if total != n:
        raise ValueError(f"mesh spec {spec} needs {total} devices, have {n}")
    return out


def default_mesh_for_batch(batch_size: int, devices=None) -> Mesh:
    """Largest data-parallel mesh whose axis divides the global batch.

    Uses the first g devices where g = gcd(batch_size, n_devices); keeps
    small-batch CLI runs working on many-device hosts without a mesh flag.
    Warns LOUDLY when that strands devices (e.g. the flagship batch 6 on 8
    chips would silently train on 2) — fix by picking a batch that divides
    the chip count, or pass an explicit --mesh spec.
    """
    import warnings
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if jax.process_count() > 1:
        # multi-host: subsetting devices can strand a process with zero
        # addressable mesh devices (its collectives would deadlock / its
        # global arrays become unconstructible) — the mesh must span every
        # process, so the global batch must divide the device count.
        if batch_size % n:
            raise ValueError(
                f"multi-host run: global batch_size {batch_size} must be "
                f"divisible by the {n} devices across "
                f"{jax.process_count()} processes (a device subset cannot "
                f"be used — it would strand whole processes). Set "
                f"BATCH_SIZE to a multiple of {n} or pass an explicit "
                f"--mesh spec.")
        return make_mesh(f"data={n},model=1", devices=devices)
    g = int(np.gcd(batch_size, n))
    if g < n:
        warnings.warn(
            f"default mesh uses {g} of {n} devices (batch_size {batch_size} "
            f"is not divisible by {n}): {n - g} devices IDLE. Set BATCH_SIZE "
            f"to a multiple of {n} or pass --mesh data={n},model=1 with a "
            f"divisible batch.", stacklevel=2)
    return make_mesh(f"data={g},model=1", devices=devices[:g])


def make_mesh(spec: str | None = None, devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    axes = parse_mesh_spec(spec, len(devices))
    shape = (axes[AXIS_DATA], axes[AXIS_MODEL])
    dev_array = np.asarray(devices).reshape(shape)
    return Mesh(dev_array, (AXIS_DATA, AXIS_MODEL))
