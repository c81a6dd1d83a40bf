"""Multi-host (pod / DCN) campaign scaling.

The reference's only multi-node story is SLURM job arrays writing to a
shared filesystem (SURVEY.md section 2, parallelism inventory).  The
TPU-native equivalents:

* ``initialize_distributed`` — ``jax.distributed.initialize`` bootstrap
  (coordinator via env or args), after which ``jax.devices()`` spans the
  pod and all single-host code in this package scales transparently via
  the same Mesh APIs (DP/sweep axes over ICI+DCN);
* ``host_shard`` — deterministic partition of a shot list across processes:
  the campaign analog of the SLURM array, but resumable through the shared
  manifest (each host writes its own store + manifest; ``merge_stores``
  combines them);
* ``merge_stores`` — fold per-host HDF5 stores into one dataset file.

Single-host semantics are the identity, so everything here is exercised in
the test-suite without a cluster (SURVEY.md section 4's fake-multi-device
strategy covers the device-mesh side; process-level sharding is plain
Python, tested directly).
"""

from __future__ import annotations

import os
from typing import List, Optional, Sequence

__all__ = ["initialize_distributed", "host_shard", "merge_stores"]


def initialize_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> tuple:
    """Bootstrap multi-host JAX.  With no args, reads the standard cluster
    env (TPU pod metadata / JAX_COORDINATOR_ADDRESS etc.).  Returns
    (process_id, num_processes).  No-op on a single host."""
    import jax

    if coordinator_address or num_processes:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    else:
        # Let JAX auto-detect (GCE TPU metadata, GKE, SLURM, Open MPI all
        # work with no env vars of ours).  If detection fails BUT the env
        # explicitly names a cluster, that is a real pod misconfiguration:
        # swallowing it would leave every host thinking it is process 0
        # of 1 and re-doing the full campaign N times — re-raise.  With
        # no cluster named, failure just means single host: standalone.
        def _int_env(k):
            try:
                return int(os.environ.get(k) or 1)
            except ValueError:
                return 1

        # TPU_WORKER_HOSTNAMES counts only with >1 comma-separated hosts:
        # single-chip rigs (e.g. the axon dev tunnel) legitimately export
        # one hostname, and that is a standalone setup, not a pod
        n_tpu_workers = len(
            [h for h in os.environ.get("TPU_WORKER_HOSTNAMES", "").split(",") if h]
        )
        cluster_named = any(
            os.environ.get(k)
            for k in (
                "JAX_COORDINATOR_ADDRESS", "COORDINATOR_ADDRESS",
                "MEGASCALE_COORDINATOR_ADDRESS",
            )
        ) or n_tpu_workers > 1 or _int_env("SLURM_JOB_NUM_NODES") > 1 \
            or _int_env("OMPI_COMM_WORLD_SIZE") > 1
        try:
            jax.distributed.initialize()
        except Exception:
            if cluster_named:
                raise
            # single host / nothing to detect: run standalone
        if cluster_named and jax.process_count() == 1:
            # jax 0.9's auto-detect can also FAIL SILENTLY on a partially
            # configured cluster (e.g. SLURM_JOB_NUM_NODES set without the
            # rest of the scheduler env) — initialize() returns and the
            # process thinks it is 1 of 1.  That is the every-host-redoes-
            # the-campaign hazard this guard exists for: surface it.
            raise RuntimeError(
                "cluster environment names multiple nodes but "
                "jax.distributed auto-detection came up single-process; "
                "pass coordinator_address/num_processes/process_id "
                "explicitly (a silent fallback would run the campaign once "
                "per host)"
            )
    return jax.process_index(), jax.process_count()


def host_shard(
    items: Sequence, process_id: Optional[int] = None, num_processes: Optional[int] = None
) -> List:
    """Deterministic strided partition of a work list across processes —
    the SLURM-array analog (hyperparam_scan.py:122) minus the scheduler."""
    import jax

    pid = jax.process_index() if process_id is None else process_id
    n = jax.process_count() if num_processes is None else num_processes
    return list(items)[pid::n]


def merge_stores(out_path: str, part_paths: Sequence[str]) -> int:
    """Fold per-host HDF5 stores into one (idempotent; returns channels
    copied).  Uses h5py low-level copy so axis/label datasets stay exact."""
    import h5py

    n = 0
    with h5py.File(out_path, "a") as out:
        for part in part_paths:
            with h5py.File(part, "r") as src:
                for shot in src:
                    for chn in src[shot]:
                        name = f"{shot}/{chn}"
                        if name in out:
                            del out[name]
                        src.copy(name, out, name=name)
                        n += 1
    return n
