"""Spectrogram <-> tile conversion.

Replaces the reference's patchify-based ``patch``/``unpatch``/``reshape``
(VAE/hyperparam_scan.py:30-56 and its four copies) with pure reshapes — no
gather, no Python loop, jit/vmap-safe on device or host.

Reference semantics preserved:
* ``patch``: each (256, 3905) spectrogram -> exactly 30 tiles of (256, 128)
  (time step 128); trailing columns 3840..3904 are silently dropped.
* ``unpatch``: groups of 30 consecutive tiles -> (256, 3840).
* ``reshape``: append a channel axis -> (B, 256, 128, 1).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from specenh.config import PatchSpec

__all__ = ["patch", "unpatch", "reshape", "patch_nchw"]


def patch(specs: jax.Array, ps: PatchSpec = PatchSpec()) -> jax.Array:
    """(N, F, T) or (F, T) spectrograms -> (N * tiles_per_spec, F, tile_time).

    Tile x of spectrogram i lands at index x + tiles_per_spec * i, matching
    the reference's ordering (hyperparam_scan.py:33-36).
    """
    specs = jnp.asarray(specs)
    if specs.ndim == 2:
        specs = specs[None]
    n, f, _ = specs.shape
    used = specs[:, :, : ps.time_cols_used]
    tiles = used.reshape(n, f, ps.tiles_per_spec, ps.tile_time)
    return tiles.transpose(0, 2, 1, 3).reshape(n * ps.tiles_per_spec, f, ps.tile_time)


def unpatch(tiles: jax.Array, ps: PatchSpec = PatchSpec()) -> jax.Array:
    """(30N, F, tile_time) tiles -> (N, F, 3840) spectrograms (inverse of
    ``patch`` on the kept columns; hyperparam_scan.py:41-51)."""
    tiles = jnp.asarray(tiles)
    m, f, w = tiles.shape
    n = m // ps.tiles_per_spec
    grouped = tiles[: n * ps.tiles_per_spec].reshape(n, ps.tiles_per_spec, f, w)
    return grouped.transpose(0, 2, 1, 3).reshape(n, f, ps.tiles_per_spec * w)


def reshape(tiles: jax.Array) -> jax.Array:
    """(B, F, W) -> (B, F, W, 1) NHWC for the conv models
    (hyperparam_scan.py:54-56)."""
    return jnp.asarray(tiles)[..., None]


def patch_nchw(specs: jax.Array, ps: PatchSpec = PatchSpec()) -> jax.Array:
    """patch + reshape in one step: (N, F, T) -> (30N, F, tile_time, 1)."""
    return reshape(patch(specs, ps))
