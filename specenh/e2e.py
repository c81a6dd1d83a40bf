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
    channels_per_shot: int = 1,
    dtype=None,
    mesh=None,
    verbose: bool = False,
    **fit_kwargs,
) -> Tuple[TrainState, Dict[str, list]]:
    """Raw shot batch -> trained autoencoder, all compute on device.

    ``traces``: (C_total, n_samples) — e.g. every channel of a campaign
    stacked, shot-major (all channels of shot 0, then shot 1, ...).
    Split follows ``train_cfg.split_by``: ``'tile'`` is the
    reference-exact leaky tile-level 60/25/15 (hyperparam_scan.py:148-149);
    ``'shot'`` splits the SHOT list BEFORE tiling (dataset.ipynb cell 3
    semantics, matching data.dataset.assemble_from_store) — pass
    ``channels_per_shot`` so all channels of one physical shot land on the
    same side (the default 1 treats each trace as its own shot, the
    correct value for single-channel campaigns only).

    ``dtype`` forwards to ``create_state`` (bf16 fast mode); engine swaps
    ride ``fit_kwargs`` (``epoch_fn=kernel_epoch_for(...)`` for the fused
    Pallas trainer — the CLI's ``train-raw --engine kernel``).

    ``mesh`` (a ``('data',)`` mesh) runs the WHOLE campaign SPMD: the
    trace upload lands sharded over channels, the jitted STFT/pipeline/
    patch program computes on the shards (channel-major tiling keeps the
    tile axis data-sharded), and training routes through ``dp_fit`` —
    raw-to-model with no single-chip residency point anywhere.
    """
    model_cfg = model_cfg or cfg.model
    train_cfg = train_cfg or cfg.train
    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P

        n_dev = int(np.prod([mesh.shape[a] for a in mesh.axis_names]))
        if not isinstance(traces, jax.Array):
            traces = np.asarray(traces, np.float32)
        if traces.shape[0] % n_dev:
            # zero-padding the channel axis would inject synthetic all-zero
            # channels into the dataset (extra tiles, shifted split
            # boundaries) — refuse with the arithmetic instead of JAX's
            # opaque uneven-sharding error
            raise ValueError(
                f"train_from_raw(mesh=): {traces.shape[0]} channels do not "
                f"divide over the {n_dev}-device mesh; pass a channel count "
                f"that is a multiple of {n_dev}"
            )
        # host arrays go straight onto the NamedSharding: each shard uploads
        # to its own device.  jnp.asarray first would materialize the FULL
        # trace tensor on the default device before resharding — a
        # single-chip residency point (and a whole-tensor upload over the
        # ~2 MB/s tunnel) this path exists to avoid.
        traces = jax.device_put(traces, NamedSharding(mesh, P("data")))
    x, y = prepare_tiles_on_device(traces, cfg)
    n = x.shape[0]
    if train_cfg.split_by == "shot":
        n_ch = traces.shape[0]
        if n_ch % channels_per_shot:
            raise ValueError(
                f"{n_ch} traces do not group into shots of "
                f"{channels_per_shot} channels"
            )
        n_shots = n_ch // channels_per_shot
        k = (n // n_ch) * channels_per_shot  # tiles per shot
        a_s = int(n_shots * train_cfg.split_fracs[0])
        b_s = int(n_shots * train_cfg.split_fracs[1])
        if a_s == 0 or b_s == a_s:
            raise ValueError(
                f"{n_shots} shots are too few for a shot-level "
                f"{train_cfg.split_fracs} split (train or tune would be "
                "empty); add shots or use split_by='tile'"
            )
        a, b = a_s * k, b_s * k
    else:
        a, b = int(n * train_cfg.split_fracs[0]), int(n * train_cfg.split_fracs[1])
    state = create_state(model_cfg, train_cfg, dtype=dtype)
    if mesh is not None:
        from specenh.parallel.data_parallel import dp_fit

        state, history = dp_fit(
            state, x[:a], y[:a], mesh, x[a:b], y[a:b],
            epochs=train_cfg.epochs if epochs is None else epochs,
            batch_size=train_cfg.batch_size, seed=train_cfg.seed,
            shuffle=train_cfg.shuffle, patience=train_cfg.patience,
            verbose=verbose, **fit_kwargs,
        )
    else:
        state, history = fit(
            state,
            x[:a], y[:a], x[a:b], y[a:b],
            train_cfg,
            epochs=epochs,
            verbose=verbose,
            **fit_kwargs,
        )
    return state, history
