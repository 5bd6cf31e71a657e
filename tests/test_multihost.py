"""Multi-host helpers (single-process semantics over the virtual mesh)."""

import numpy as np
import jax

from sd_video_gen_tpu.parallel import make_mesh
from sd_video_gen_tpu.parallel.multihost import (global_batch_from_local,
                                                 is_coordinator)


def test_global_batch_from_local(rng):
    mesh = make_mesh("data=8,model=1")
    local = rng.standard_normal((8, 4)).astype(np.float32)
    arr = global_batch_from_local(mesh, local)
    assert arr.shape == (8, 4)
    np.testing.assert_allclose(np.asarray(arr), local)
    # sharded over the data axis
    assert len(arr.sharding.device_set) == 8


def test_is_coordinator_single_process():
    assert is_coordinator() is True
