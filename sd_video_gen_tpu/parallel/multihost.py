"""Multi-host (multi-process) initialization for pod-scale training.

The reference's "multi-node" story was bash + rsync between lab machines
(sync_devices.sh; SURVEY.md §2.6). TPU-native equivalent: one SPMD program
across hosts — ``jax.distributed.initialize`` joins the processes, the Mesh
spans all hosts' devices (collectives ride ICI within a slice, DCN across),
and per-host input shards assemble into global arrays.
"""

from __future__ import annotations

import jax
import numpy as np


def initialize(coordinator_address: str | None = None,
               num_processes: int | None = None,
               process_id: int | None = None) -> None:
    """Join the jax.distributed runtime. On TPU pods with default env
    plumbing all arguments are auto-detected; no-op if already initialized."""
    try:
        jax.distributed.initialize(coordinator_address=coordinator_address,
                                   num_processes=num_processes,
                                   process_id=process_id)
    except RuntimeError as e:
        # message drift across jax versions: 0.4.x says "already
        # initialized", 0.9.x says "should only be called once"
        msg = str(e)
        if ("already initialized" not in msg
                and "only be called once" not in msg):
            raise


def global_batch_from_local(mesh, local_batch: np.ndarray):
    """Assemble per-host batch shards into one global sharded array.

    Each process feeds its local slice of the global batch (host data
    loaders stay fully local); the result is a global jax.Array laid out
    batch-over-'data' on the mesh.
    """
    from jax.sharding import NamedSharding, PartitionSpec as P
    sharding = NamedSharding(mesh, P("data"))
    return jax.make_array_from_process_local_data(sharding, local_batch)


def is_coordinator() -> bool:
    return jax.process_index() == 0
