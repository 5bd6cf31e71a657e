"""Worker for the 2-process multi-host integration test.

Usage: python tests/multihost_worker.py <process_id> <num_processes> <port> <data_dir>

Each process gets 4 virtual CPU devices; jax.distributed joins them into one
8-device SPMD run. Runs the same tiny AR training as the single-process
reference in test_multihost.py and prints the per-epoch loss trajectory as
one JSON line. The batch is assembled from per-process loader shards
(BatchLoader process_shard + parallel/multihost.global_batch_from_local), so
the trajectory must match the single-process 8-device run exactly.
"""

import json
import os
import sys

os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=4").strip()

import jax

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))


def main():
    pid, pcount, port, data_dir = (int(sys.argv[1]), int(sys.argv[2]),
                                   int(sys.argv[3]), sys.argv[4])
    mode = sys.argv[5] if len(sys.argv) > 5 else "ar"
    native = len(sys.argv) > 6 and sys.argv[6] == "native"
    from sd_video_gen_tpu.parallel import multihost
    multihost.initialize(coordinator_address=f"localhost:{port}",
                         num_processes=pcount, process_id=pid)
    assert jax.process_count() == pcount
    assert len(jax.devices()) == pcount * 4

    from tests.multihost_case import run_case
    losses = run_case(data_dir, process_shard=(pid, pcount), mode=mode,
                      native=native)
    print("TRAJECTORY " + json.dumps(losses), flush=True)


if __name__ == "__main__":
    main()
