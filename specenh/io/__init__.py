"""Host IO: shot readers, HDF5 store, SPEC binaries, native prefetcher."""

from specenh.io.shots import (  # noqa: F401
    ShotReadError,
    bes_key,
    ece_key,
    read_bes_channels,
    read_ece_channels,
    shot_number_from_path,
)
from specenh.io.store import (  # noqa: F401
    CampaignManifest,
    SpectrogramStore,
    StoreWriterPool,
    consolidate_shards,
)
