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
from specenh.data.tiles import n_tiles_for
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


def _patch_host(specs: np.ndarray, ps: PatchSpec = PatchSpec()) -> np.ndarray:
    """``tiles.patch`` in pure numpy — bit-identical reshape/transpose.

    Dataset assembly is a HOST-side operation: the jnp ``patch`` routed
    the WHOLE sampled campaign through the default device, which both
    round-trips gigabytes over the interconnect and OOMs HBM at reference
    scale (a 50-shot assembly is ~16 GB of spec+label tensors vs one
    v5e's 16 GB — found by the round-4 at-scale campaign run).  Device
    placement happens later, batch-by-batch or via the sharded trainers.
    """
    specs = np.asarray(specs, np.float32)
    if specs.ndim == 2:
        specs = specs[None]
    n, f, t = specs.shape
    k = n_tiles_for(t, ps)
    used = specs[:, :, : k * ps.tile_time]
    out = used.reshape(n, f, k, ps.tile_time).transpose(0, 2, 1, 3)
    return np.ascontiguousarray(out).reshape(n * k, f, ps.tile_time)


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
    # random.sample permutes even at n == population (the reference's
    # random.sample(file.keys(), n), hyperparam_scan.py:133); clamping at
    # the population size is our lenient extension of the reference's
    # ValueError for n > population
    keys = rng.sample(keys, min(num_samples, len(keys)))
    if channels is None:
        channels = store.channels_of(keys[0])
    spec_list, label_list = [], []
    for key in keys:
        s, l = store.read_spec_and_labels(key, channels)
        spec_list.append(s)
        label_list.append(l)

    if cfg.split_by == "shot":
        # leak-free: split the SHOT list, then stack + tile each split —
        # every channel of a shot lands on the same side
        a = int(len(keys) * cfg.split_fracs[0])
        b = int(len(keys) * cfg.split_fracs[1])
        if a == 0 or b == a:
            raise ValueError(
                f"{len(keys)} shots are too few for a shot-level "
                f"{cfg.split_fracs} split (train or tune would be empty); "
                "sample more shots or use split_by='tile'"
            )

        def tiled(lst):
            if not lst:
                f = spec_list[0].shape[-2]
                return np.zeros((0, f, ps.tile_time), np.float32)
            return _patch_host(np.concatenate(lst, axis=0), ps)

        return SplitArrays(
            tiled(spec_list[:a]), tiled(spec_list[a:b]), tiled(spec_list[b:]),
            tiled(label_list[:a]), tiled(label_list[a:b]), tiled(label_list[b:]),
        )
    specs = np.concatenate(spec_list, axis=0)
    labels = np.concatenate(label_list, axis=0)
    x = _patch_host(specs, ps)
    y = _patch_host(labels, ps)
    return split_tiles(x, y, cfg.split_fracs)


def synthetic_shot_batch(
    n_shots: int = 2,
    n_channels: int = 4,
    n_samples: int = 1_000_000,
    fs: float = 500_000.0,
    seed: int = 0,
) -> np.ndarray:
    """Synthetic raw campaign (chirp + tone + noise per channel) for demos
    and tests, shape (n_shots, n_channels, n_samples).

    Deliberately NOT bench.harness.example_shot: that one is the frozen
    single-shot bench input (changing it would invalidate cached CPU
    baselines); this one varies chirp rate and tone per shot so multi-shot
    campaigns aren't 20 copies of the same physics."""
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
