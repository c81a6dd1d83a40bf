"""Tests for patch/unpatch/reshape tiling (specenh.data.tiles) against the
reference's patchify-based semantics (VAE/hyperparam_scan.py:30-56)."""

import numpy as np

import jax.numpy as jnp

from specenh.config import PatchSpec
from specenh.data.tiles import patch, patch_nchw, reshape, unpatch


def _ref_patch(arrs):
    """Reference semantics spelled out directly (hyperparam_scan.py:30-38):
    tile x of spectrogram i is columns [128x, 128x+128) and lands at index
    x + 30 i; columns 3840..3904 dropped."""
    out = np.empty((len(arrs) * 30, 256, 128))
    for i, a in enumerate(arrs):
        for x in range(30):
            out[x + 30 * i] = a[:, x * 128 : (x + 1) * 128]
    return out


def test_patch_matches_reference_ordering():
    rng = np.random.default_rng(0)
    arrs = [rng.standard_normal((256, 3905)) for _ in range(3)]
    want = _ref_patch(arrs)
    got = np.asarray(patch(jnp.asarray(np.stack(arrs), jnp.float32)))
    assert got.shape == (90, 256, 128)
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_patch_single_spectrogram():
    rng = np.random.default_rng(1)
    a = rng.standard_normal((256, 3905))
    got = np.asarray(patch(jnp.asarray(a, jnp.float32)))
    assert got.shape == (30, 256, 128)
    np.testing.assert_allclose(got, _ref_patch([a]), atol=1e-6)


def test_unpatch_roundtrip_drops_tail_columns():
    rng = np.random.default_rng(2)
    a = rng.standard_normal((2, 256, 3905)).astype(np.float32)
    spec = unpatch(patch(jnp.asarray(a)))
    assert spec.shape == (2, 256, 3840)
    np.testing.assert_allclose(np.asarray(spec), a[:, :, :3840], atol=0)


def test_reshape_adds_channel_axis():
    x = jnp.zeros((5, 256, 128))
    assert reshape(x).shape == (5, 256, 128, 1)
    assert patch_nchw(jnp.zeros((1, 256, 3905))).shape == (30, 256, 128, 1)


def test_custom_patch_spec():
    ps = PatchSpec(tile_freq=32, tile_time=16, step=16, tiles_per_spec=4)
    a = np.arange(32 * 70, dtype=np.float32).reshape(32, 70)
    tiles = patch(jnp.asarray(a), ps)
    assert tiles.shape == (4, 32, 16)
    np.testing.assert_array_equal(np.asarray(tiles[2]), a[:, 32:48])
    back = unpatch(tiles, ps)
    np.testing.assert_array_equal(np.asarray(back[0]), a[:, :64])


def test_patch_host_matches_jnp_patch():
    """dataset._patch_host (the host-side assembly tiler) is bit-identical
    to tiles.patch — assembly must not route campaign-scale tensors
    through the device (a 50-shot assembly OOM'd HBM, round 4)."""
    import numpy as np

    from specenh.config import PatchSpec
    from specenh.data.dataset import _patch_host
    from specenh.data.tiles import patch

    rng = np.random.default_rng(3)
    ps = PatchSpec(tile_freq=32, tile_time=16, step=16, tiles_per_spec=5)
    specs = rng.random((3, 32, 83)).astype(np.float32)
    np.testing.assert_array_equal(
        _patch_host(specs, ps), np.asarray(patch(specs, ps))
    )
    np.testing.assert_array_equal(
        _patch_host(specs[0], ps), np.asarray(patch(specs[0], ps))
    )
