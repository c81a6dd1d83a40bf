"""Datasets and tiling."""

from specenh.data.dataset import (  # noqa: F401
    SplitArrays,
    assemble_from_store,
    split_tiles,
    synthetic_shot_batch,
)
from specenh.data.tiles import n_tiles_for, patch, patch_nchw, reshape, unpatch  # noqa: F401
