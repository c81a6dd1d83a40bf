"""Scaling: meshes, data parallelism, sequence (time) sharding, multihost."""

from specenh.parallel.data_parallel import dp_fit, make_dp_train_step, shard_batch  # noqa: F401
from specenh.parallel.mesh import make_mesh  # noqa: F401
from specenh.parallel.timeshard import (  # noqa: F401
    sharded_enhance,
    sharded_spectrogram,
    usable_samples,
)
