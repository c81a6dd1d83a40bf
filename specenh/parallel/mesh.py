"""Device-mesh helpers.

The reference's only parallelism is SLURM job-array sharding over hyperparam
configs (VAE/hyperparam_scan.py:122) — zero inter-process communication.
The TPU framework instead scales over a ``jax.sharding.Mesh``:

* axis ``data``  — batch/data parallelism for training (gradients psum over
  ICI, inserted automatically by the SPMD partitioner);
* axis ``time``  — sequence parallelism for long shots: the raw trace's time
  axis is sharded and STFT/pipeline halos ride ``ppermute`` (see
  specenh.parallel.timeshard);
* axis ``sweep`` — experiment parallelism: independent hyperparameter
  configs pinned one-per-device-group (the SLURM-array analog, on chips).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ["make_mesh", "data_sharding", "replicated", "P"]


def make_mesh(
    n_devices: Optional[int] = None,
    axis_names: Sequence[str] = ("data",),
    shape: Optional[Sequence[int]] = None,
) -> Mesh:
    """1-D (default) or N-D mesh over the first ``n_devices`` devices."""
    devs = jax.devices()
    if n_devices is not None:
        if len(devs) < n_devices:
            raise ValueError(
                f"requested {n_devices} devices but only {len(devs)} available"
            )
        devs = devs[:n_devices]
    if shape is None:
        if len(axis_names) != 1:
            raise ValueError("pass `shape` for multi-axis meshes")
        shape = (len(devs),)
    arr = np.asarray(devs).reshape(tuple(shape))
    return Mesh(arr, tuple(axis_names))


def data_sharding(mesh: Mesh, axis: str = "data") -> NamedSharding:
    """Shard the leading (batch) dimension over ``axis``."""
    return NamedSharding(mesh, P(axis))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
