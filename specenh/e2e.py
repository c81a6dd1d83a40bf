"""Device-resident end-to-end campaign: raw traces -> trained model.

The reference (and our HDF5-centred path) bounces data through the host:
build spectrograms -> write HDF5 -> read back -> upload for training.  On
TPU the spectrograms and labels are *computed on device in the first
place*, so the natural pipeline keeps them there:

    raw traces (C_total, n_samples)          [one upload, the only transfer]
      -> spectrogram() + classical_pipeline()   [device]
      -> patch -> 60/25/15 split               [device]
      -> fit()                                  [device]

This removes the dataset round-trip entirely — decisive when host<->device
bandwidth is scarce (the tunnelled dev TPU moves ~2 MB/s up; even on local
PCIe it saves seconds per campaign) and HBM can hold the working set
(~0.5 MB/channel-spectrogram x 2; hundreds of channels fit easily).

The HDF5 store remains the durable artifact path (specenh.pipeline); this
module is the fast path when you want a model, not a dataset.
"""

from __future__ import annotations

import functools
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from specenh.config import Config, ModelConfig, TrainConfig
from specenh.data.tiles import patch
from specenh.ops.enhance import classical_pipeline
from specenh.ops.stft import spectrogram
from specenh.train import TrainState, create_state, fit

__all__ = ["prepare_tiles_on_device", "train_from_raw"]


@functools.lru_cache(maxsize=8)
def _prepare_fn(spec_cfg, pipe_cfg, patch_cfg):
    """Jitted STFT + pipeline + patch program, cached per config so repeat
    calls reuse the compiled executable (full-shot programs compile in
    10-40 s and the axon PJRT cannot serialize them)."""

    @jax.jit
    def go(tr):
        specs = spectrogram(tr, spec_cfg)
        labels = classical_pipeline(specs, pipe_cfg)
        return patch(specs, patch_cfg)[..., None], patch(labels, patch_cfg)[..., None]

    return go


def prepare_tiles_on_device(
    traces: jax.Array, cfg: Config
) -> Tuple[jax.Array, jax.Array]:
    """(C, n_samples) raw traces -> device-resident (tiles_x, tiles_y)
    NHWC tensors (the reference's spec/pipeline_out tile pairs)."""
    go = _prepare_fn(cfg.spec, cfg.pipeline, cfg.patch)
    return go(jnp.asarray(traces, jnp.float32))


def train_from_raw(
    traces: jax.Array,
    cfg: Config = Config(),
    model_cfg: Optional[ModelConfig] = None,
    train_cfg: Optional[TrainConfig] = None,
    epochs: Optional[int] = None,
    verbose: bool = False,
    **fit_kwargs,
) -> Tuple[TrainState, Dict[str, list]]:
    """Raw shot batch -> trained autoencoder, all compute on device.

    ``traces``: (C_total, n_samples) — e.g. every channel of a campaign
    stacked.  Split follows ``train_cfg.split_by``: ``'tile'`` is the
    reference-exact leaky tile-level 60/25/15 (hyperparam_scan.py:148-149),
    ``'shot'`` splits at trace granularity BEFORE tiling (dataset.ipynb
    cell 3 semantics) so no trace's tiles straddle train/tune/test — tiles
    are laid out (trace, tile), so that is a split at trace-multiples of
    the tile count.
    """
    model_cfg = model_cfg or cfg.model
    train_cfg = train_cfg or cfg.train
    x, y = prepare_tiles_on_device(traces, cfg)
    n = x.shape[0]
    if train_cfg.split_by == "shot":
        n_ch = traces.shape[0]
        k = n // n_ch  # tiles per trace (patch() guarantees uniformity)
        a = int(n_ch * train_cfg.split_fracs[0]) * k
        b = int(n_ch * train_cfg.split_fracs[1]) * k
    else:
        a, b = int(n * train_cfg.split_fracs[0]), int(n * train_cfg.split_fracs[1])
    state = create_state(model_cfg, train_cfg)
    state, history = fit(
        state,
        x[:a], y[:a], x[a:b], y[a:b],
        train_cfg,
        epochs=epochs,
        verbose=verbose,
        **fit_kwargs,
    )
    return state, history
