"""Subprocess worker for the REAL two-process multihost test
(tests/test_utils.py::test_initialize_distributed_two_processes).

Run as:  python tests/_multihost_worker.py <coordinator> <num_procs> <pid> \
             <store_path> <result_json>

Forces the CPU platform via jax.config (the axon TPU plugin hijacks BOTH
the JAX_PLATFORMS and JAX_PLATFORM_NAME env vars), enables gloo CPU
collectives so the backend spans the two processes, joins the coordinator
via ``specenh.parallel.multihost.initialize_distributed``, takes its strided
``host_shard`` of a fixed 5-shot campaign, writes its shard into its OWN
store (the per-host store of the multihost campaign design), and reports
(process_id, process_count, shard) as JSON for the parent to assert on.
"""

import json
import sys

import jax
import numpy as np

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_cpu_collectives_implementation", "gloo")


def main() -> None:
    coordinator, n_procs, pid, store_path, result_path = sys.argv[1:6]
    n_procs, pid = int(n_procs), int(pid)

    from specenh.parallel.multihost import host_shard, initialize_distributed

    got_pid, got_n = initialize_distributed(
        coordinator_address=coordinator, num_processes=n_procs, process_id=pid
    )
    assert len(jax.devices()) == n_procs * len(jax.local_devices())

    shots = [f"30{i}" for i in range(5)]
    mine = host_shard(shots)  # no explicit ids: exercises jax.process_*

    from specenh.io.store import SpectrogramStore

    with SpectrogramStore(store_path, "a") as store:
        for shot in mine:
            s = np.full((4, 6), float(shot), np.float32)
            store.write_channel(
                shot, 1, s, np.arange(4.0), np.arange(6.0), s * 0.5
            )

    with open(result_path, "w") as fh:
        json.dump({"pid": got_pid, "n": got_n, "shard": mine}, fh)


if __name__ == "__main__":
    main()
