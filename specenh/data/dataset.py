"""Dataset assembly: HDF5 store -> tiled train/tune/test arrays.

Reproduces VAE/hyperparam_scan.py:126-149 / manual_scan.py:134-156:
sample N shots, read `spec` + `pipeline_out` for 20 channels each, ``patch``
into (30*N*C, 256, 128) tiles, then np.split at 60% / 85%.

The reference splits BY TILE after patching, which leaks tiles of a single
shot (even a single spectrogram) across train/tune/test
(hyperparam_scan.py:148-149).  That quirk is the default
(``split_by='tile'``); ``split_by='shot'`` performs the leak-free split at
shot granularity (the dataset.ipynb cell 3 behaviour, which splits the shot
list 60/25/15 BEFORE tiling).
"""

from __future__ import annotations

import random
from dataclasses import dataclass
from typing import Optional, Sequence, Tuple

import numpy as np

from specenh.config import PatchSpec, TrainConfig
from specenh.data.tiles import patch
from specenh.io.store import SpectrogramStore

__all__ = ["SplitArrays", "assemble_from_store", "split_tiles", "synthetic_shot_batch"]


@dataclass
class SplitArrays:
    x_train: np.ndarray
    x_tune: np.ndarray
    x_test: np.ndarray
    y_train: np.ndarray
    y_tune: np.ndarray
    y_test: np.ndarray

    def reshaped(self):
        """All six arrays with the trailing channel axis added
        (``reshape``, hyperparam_scan.py:169-174)."""
        return SplitArrays(*[a[..., None] for a in (
            self.x_train, self.x_tune, self.x_test,
            self.y_train, self.y_tune, self.y_test,
        )])


def split_tiles(
    x: np.ndarray, y: np.ndarray, fracs: Tuple[float, float] = (0.6, 0.85)
) -> SplitArrays:
    """np.split at int(len*0.6) / int(len*0.85) (hyperparam_scan.py:148-149)."""
    a, b = int(len(x) * fracs[0]), int(len(x) * fracs[1])
    return SplitArrays(x[:a], x[a:b], x[b:], y[:a], y[a:b], y[b:])


def assemble_from_store(
    store: SpectrogramStore,
    num_samples: int = 20,
    channels: Optional[Sequence[int]] = None,
    ps: PatchSpec = PatchSpec(),
    cfg: TrainConfig = TrainConfig(),
    seed: Optional[int] = None,
) -> SplitArrays:
    """Sample shots (``random.sample(file.keys(), n)``,
    hyperparam_scan.py:133), stack channels, patch, split.
    ``channels=None`` uses every channel present in the first sampled shot."""
    rng = random.Random(seed)
    keys = store.shots()
    if num_samples < len(keys):
        keys = rng.sample(keys, num_samples)
    if channels is None:
        channels = store.channels_of(keys[0])
    specs, labels = [], []
    for key in keys:
        s, l = store.read_spec_and_labels(key, channels)
        specs.append(s)
        labels.append(l)
    specs = np.concatenate(specs, axis=0)
    labels = np.concatenate(labels, axis=0)

    if cfg.split_by == "shot":
        # leak-free: split the spectrogram list, then tile each split
        a = int(len(specs) * cfg.split_fracs[0])
        b = int(len(specs) * cfg.split_fracs[1])
        parts = [(specs[:a], labels[:a]), (specs[a:b], labels[a:b]), (specs[b:], labels[b:])]
        tiled = [(np.asarray(patch(s, ps)), np.asarray(patch(l, ps))) for s, l in parts]
        return SplitArrays(
            tiled[0][0], tiled[1][0], tiled[2][0],
            tiled[0][1], tiled[1][1], tiled[2][1],
        )
    x = np.asarray(patch(specs, ps))
    y = np.asarray(patch(labels, ps))
    return split_tiles(x, y, cfg.split_fracs)


def synthetic_shot_batch(
    n_shots: int = 2,
    n_channels: int = 4,
    n_samples: int = 1_000_000,
    fs: float = 500_000.0,
    seed: int = 0,
) -> np.ndarray:
    """Synthetic raw campaign (chirp + tone + noise per channel) for demos
    and tests, shape (n_shots, n_channels, n_samples)."""
    rng = np.random.default_rng(seed)
    t = np.arange(n_samples) / fs
    shots = []
    for s in range(n_shots):
        chans = [
            np.sin(2 * np.pi * (4e4 + (1e4 * s + 2e4) * t) * t + c)
            + 0.3 * np.sin(2 * np.pi * (1.0e5 + 5e3 * c) * t)
            + 0.5 * rng.standard_normal(n_samples)
            for c in range(n_channels)
        ]
        shots.append(np.stack(chans))
    return np.asarray(shots, np.float32)
