"""Smoke tests: every visualisation renders to a file; the Grain pipeline
streams correct tile batches."""

import os

import numpy as np
import pytest

from specenh.io.store import SpectrogramStore
from specenh.viz.plots import (
    display,
    plot_frame_view,
    plot_stages,
    plot_svd_compare,
    plot_val_loss,
    plt_spec_shot,
)


@pytest.fixture(scope="module")
def specs():
    # 780 columns (a 0.4 s shot) keeps gouraud rendering fast while still
    # exercising the t-axis cropping logic
    rng = np.random.default_rng(0)
    return rng.random((3, 256, 780)).astype(np.float32)


@pytest.fixture(scope="module")
def axes():
    return np.arange(256.0) * (5e5 / 512), np.arange(780) * 256 / 5e5


def test_display_renders(tmp_path, specs, axes):
    f, t = axes
    p = str(tmp_path / "d.png")
    display(specs[:, :, :768], specs[:, :, :768], p, f, t, n=2, seed=0)
    assert os.path.getsize(p) > 1000


def test_triptych_renders(tmp_path, specs, axes):
    f, t = axes
    p = str(tmp_path / "t.png")
    plt_spec_shot(specs[0], specs[1], specs[2], "176053", 1, p, f, t)
    assert os.path.getsize(p) > 1000


def test_stage_plot_renders(tmp_path, specs, axes):
    f, t = axes
    p = str(tmp_path / "s.png")
    plot_stages({"quant": specs[1], "final": specs[2]}, specs[0], p, f, t)
    assert os.path.getsize(p) > 1000


def test_svd_compare_renders(tmp_path, specs):
    p = str(tmp_path / "svd.png")
    plot_svd_compare(specs[0], specs[1], specs[2] - 0.5, "122117", 0, p)
    assert os.path.getsize(p) > 1000


def test_frame_view_renders(tmp_path, specs, axes):
    f, t = axes
    stack = specs.transpose(1, 2, 0)  # (F, T, C)
    p = str(tmp_path / "fr.png")
    plot_frame_view(stack, stack, stack, 100, "176053", t, f, p)
    assert os.path.getsize(p) > 1000


def test_val_loss_artifacts(tmp_path):
    png, txt = str(tmp_path / "v.png"), str(tmp_path / "v.txt")
    plot_val_loss([0.5, 0.4, 0.35], png, txt)
    assert os.path.getsize(png) > 500
    assert len(open(txt).read().splitlines()) == 3


# ---------------------------------------------------------------------------


@pytest.fixture()
def small_store(tmp_path):
    rng = np.random.default_rng(1)
    path = str(tmp_path / "g.hdf5")
    store = SpectrogramStore(path)
    for shot in ["1", "2"]:
        for chn in [1, 2]:
            s = rng.random((256, 390)).astype(np.float32)  # 3 tiles each
            store.write_channel(shot, chn, s, np.arange(256.0), np.arange(390.0), s * 0.5)
    yield store
    store.close()


def test_grain_tile_batches(small_store):
    from specenh.data.grain_pipeline import channel_records, iter_tile_batches

    assert len(channel_records(small_store)) == 4
    batches = list(iter_tile_batches(small_store, batch_size=5, seed=0))
    total = sum(len(x) for x, _ in batches)
    assert total == 4 * 3  # 4 channels x 3 tiles
    for x, y in batches:
        assert x.shape[1:] == (256, 128, 1)
        np.testing.assert_allclose(y, x * 0.5, atol=1e-6)


def test_grain_sharding(small_store):
    from specenh.data.grain_pipeline import tile_dataset

    n0 = len(list(tile_dataset(small_store, seed=None, shard_index=0, shard_count=2)))
    n1 = len(list(tile_dataset(small_store, seed=None, shard_index=1, shard_count=2)))
    assert n0 + n1 == 4
