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

__all__ = ["patch", "unpatch", "reshape", "patch_nchw", "n_tiles_for"]


def n_tiles_for(time_cols: int, ps: PatchSpec = PatchSpec()) -> int:
    """Tiles per spectrogram for a given width — patchify's count
    ``(T - tile)//step + 1``: 30 for the reference's 3905 columns, with
    the trailing remainder silently dropped."""
    return (time_cols - ps.tile_time) // ps.step + 1


def patch(specs: jax.Array, ps: PatchSpec = PatchSpec()) -> jax.Array:
    """(N, F, T) or (F, T) spectrograms -> (N * n_tiles, F, tile_time).

    Tile x of spectrogram i lands at index x + n_tiles * i, matching the
    reference's ordering (hyperparam_scan.py:33-36).  The tile count is
    derived from the input width (== the hard-coded 30 for 256x3905).
    Requires step == tile_time (non-overlapping tiles, the reference
    geometry).
    """
    specs = jnp.asarray(specs)
    if specs.ndim == 2:
        specs = specs[None]
    if ps.step != ps.tile_time:
        raise NotImplementedError("overlapping tiles not supported")
    n, f, t = specs.shape
    k = n_tiles_for(t, ps)
    used = specs[:, :, : k * ps.tile_time]
    tiles = used.reshape(n, f, k, ps.tile_time)
    return tiles.transpose(0, 2, 1, 3).reshape(n * k, f, ps.tile_time)


def unpatch(
    tiles: jax.Array, ps: PatchSpec = PatchSpec(), tiles_per_spec: int | None = None
) -> jax.Array:
    """(kN, F, tile_time) tiles -> (N, F, k*tile_time) spectrograms (inverse
    of ``patch`` on the kept columns; hyperparam_scan.py:41-51).  ``k``
    defaults to the reference's 30; pass ``tiles_per_spec`` when the source
    spectrograms were narrower."""
    tiles = jnp.asarray(tiles)
    k = ps.tiles_per_spec if tiles_per_spec is None else tiles_per_spec
    m, f, w = tiles.shape
    n = m // k
    grouped = tiles[: n * k].reshape(n, k, f, w)
    return grouped.transpose(0, 2, 1, 3).reshape(n, f, k * w)


def reshape(tiles: jax.Array) -> jax.Array:
    """(B, F, W) -> (B, F, W, 1) NHWC for the conv models
    (hyperparam_scan.py:54-56)."""
    return jnp.asarray(tiles)[..., None]


def patch_nchw(specs: jax.Array, ps: PatchSpec = PatchSpec()) -> jax.Array:
    """patch + reshape in one step: (N, F, T) -> (30N, F, tile_time, 1)."""
    return reshape(patch(specs, ps))
