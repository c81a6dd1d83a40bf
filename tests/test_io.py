"""Tests for shot readers, HDF5 store schema parity, campaign manifest, and
the dataset-build campaign (specenh.io, specenh.pipeline, specenh.data)."""

import os
import pickle

import h5py
import numpy as np
import pytest

from specenh.config import Config, SpecParams, TrainConfig
from specenh.data.dataset import assemble_from_store, split_tiles, synthetic_shot_batch
from specenh.io.shots import (
    ShotReadError,
    bes_key,
    ece_key,
    read_bes_channels,
    read_ece_channels,
    shot_number_from_path,
)
from specenh.io.store import CampaignManifest, SpectrogramStore
from specenh.pipeline import build_dataset


def _write_ece_pkl(path, n_channels=3, n=30_000, seed=0):
    rng = np.random.default_rng(seed)
    data = {ece_key(c + 1): rng.standard_normal(n).astype(np.float32) for c in range(n_channels)}
    with open(path, "wb") as fh:
        pickle.dump(data, fh)
    return data


def test_key_formats():
    assert ece_key(1) == "\\tecef01" and ece_key(12) == "\\tecef12"
    assert len(ece_key(1)) == 8  # literal backslash, not a tab
    assert bes_key(7) == "besfu07"


def test_shot_number_from_path():
    assert shot_number_from_path("/a/b/ece_176053.pkl") == "176053"
    assert shot_number_from_path("c/122117_BES.x") == "BES"


def test_read_ece_channels(tmp_path):
    p = str(tmp_path / "ece_1.pkl")
    data = _write_ece_pkl(p)
    out = read_ece_channels(p, [1, 2], n_samples=10_000)
    assert out.shape == (2, 10_000)
    np.testing.assert_array_equal(out[0], data[ece_key(1)][:10_000])
    with pytest.raises(ShotReadError):
        read_ece_channels(p, [99])


def test_read_corrupt_pickle_raises(tmp_path):
    p = str(tmp_path / "ece_2.pkl")
    with open(p, "wb") as fh:
        fh.write(b"not a pickle at all")
    with pytest.raises(ShotReadError):
        read_ece_channels(p, [1])


def test_read_bes_channels(tmp_path):
    p = str(tmp_path / "122117BES")
    rng = np.random.default_rng(1)
    data = {
        bes_key(c + 1): {"data.BES": rng.standard_normal(5000).astype(np.float32)}
        for c in range(2)
    }
    with open(p, "wb") as fh:
        pickle.dump(data, fh)
    out = read_bes_channels(p, [1, 2])
    assert out.shape == (2, 5000)


def test_store_schema_matches_reference(tmp_path):
    """The HDF5 layout must be readable exactly the way
    hyperparam_scan.py:130-141 reads it."""
    path = str(tmp_path / "spectrogram_data.hdf5")
    spec = np.random.default_rng(0).random((256, 390)).astype(np.float32)
    lab = np.random.default_rng(1).random((256, 390)).astype(np.float32)
    f = np.arange(256.0)
    t = np.arange(390.0)
    with SpectrogramStore(path) as store:
        store.write_channel("176053", 1, spec, f, t, lab)
        store.write_channel("176053", 2, spec * 2, f, t, lab)
    with h5py.File(path, "r") as fh:  # read exactly as the reference does
        assert set(fh.keys()) == {"ece_176053"}
        name = "ece_176053/chn_1"
        np.testing.assert_array_equal(np.array(fh[name]["spec"]), spec)
        np.testing.assert_array_equal(np.array(fh[name]["pipeline_out"]), lab)
        np.testing.assert_array_equal(np.array(fh[name]["f"]), f)
        np.testing.assert_array_equal(np.array(fh[name]["t"]), t)


def test_store_idempotent_overwrite(tmp_path):
    path = str(tmp_path / "d.hdf5")
    a = np.zeros((4, 4))
    b = np.ones((4, 4))
    with SpectrogramStore(path) as store:
        store.write_channel("1", 1, a, a[0], a[0], a)
        store.write_channel("1", 1, b, b[0], b[0], b)  # reference would crash here
        np.testing.assert_array_equal(store.read_channel("ece_1", 1)["spec"], b)


def test_store_quarantines_truncated_file(tmp_path):
    """A campaign killed mid-write leaves a truncated HDF5 (seen in the
    wild: eof=96); append mode must quarantine it and start fresh instead
    of bricking every later resume, read mode must not destroy evidence."""
    path = str(tmp_path / "t.hdf5")
    a = np.zeros((4, 4))
    with SpectrogramStore(path) as store:
        store.write_channel("1", 1, a, a[0], a[0], a)
    os.truncate(path, 96)

    with pytest.raises(OSError):
        SpectrogramStore(path, "r")
    assert os.path.getsize(path) == 96  # read mode left it alone

    with pytest.warns(UserWarning, match="quarantined"):
        store = SpectrogramStore(path)
    assert store.quarantined == path + ".corrupt"
    assert os.path.getsize(store.quarantined) == 96
    assert store.shots() == []  # fresh store
    store.write_channel("1", 1, a, a[0], a[0], a)
    store.close()

    # a second crash must not overwrite the first quarantined file
    os.truncate(path, 96)
    with pytest.warns(UserWarning):
        store2 = SpectrogramStore(path)
    assert store2.quarantined == path + ".corrupt1"
    store2.close()


def test_sharded_store_union_read(tmp_path):
    """A StoreWriterPool persists across base + .shardK sidecars; read
    mode presents the union transparently (every consumer keeps opening
    SpectrogramStore(path, 'r'))."""
    from specenh.io.store import StoreWriterPool

    path = str(tmp_path / "d.hdf5")
    a = np.arange(16, dtype=np.float32).reshape(4, 4)
    with StoreWriterPool(path, writers=3) as pool:
        assert pool.quarantined is None
        for shot in ("100", "101", "102", "103"):
            st = pool.stores[pool.shard_of(shot)]
            st.write_channel(shot, 1, a + int(shot), a[0], a[0], a)
        pool.flush()
        # deterministic routing spread the shots over >1 file
        assert sum(1 for s in pool.stores if s.shots()) > 1

    with SpectrogramStore(path, "r") as store:
        assert sorted(store.shots()) == [f"ece_{s}" for s in (100, 101, 102, 103)]
        for shot in (100, 101, 102, 103):
            assert store.has_channel(f"ece_{shot}", 1)
            assert store.spec_shape(f"ece_{shot}", 1) == (4, 4)
            np.testing.assert_array_equal(
                store.read_channel(f"ece_{shot}", 1)["spec"], a + shot
            )
        assert sorted(store.iter_channels()) == [
            (f"ece_{s}", 1) for s in (100, 101, 102, 103)
        ]
        x, y = store.read_spec_and_labels("ece_102", [1])
        np.testing.assert_array_equal(x[0], a + 102)


def test_sharded_store_duplicate_resolves_to_most_complete(tmp_path):
    """A shot group straddling two files (crash left a partial write, the
    retry landed elsewhere — e.g. after changing --writers) resolves to
    the file with the MOST channels, not blindly to the base."""
    path = str(tmp_path / "d.hdf5")
    a = np.zeros((4, 4), np.float32)
    with SpectrogramStore(path) as base:
        base.write_channel("7", 1, a, a[0], a[0], a)  # stale partial: 1 chn
    with SpectrogramStore(path + ".shard1") as sh:
        for c in (1, 2):  # complete retry: 2 chns, different data
            sh.write_channel("7", c, a + 9, a[0], a[0], a)
    with SpectrogramStore(path, "r") as store:
        assert store.shots() == ["ece_7"]
        assert store.channels_of("ece_7") == [1, 2]
        np.testing.assert_array_equal(store.read_channel("ece_7", 1)["spec"], a + 9)


def test_consolidate_shards(tmp_path):
    """merge-shards: fold base + sidecars into one file with the union
    view's duplicate resolution; in-place mode absorbs and removes the
    sidecars, --out mode leaves originals untouched."""
    from specenh.io.store import StoreWriterPool, consolidate_shards

    a = np.arange(16, dtype=np.float32).reshape(4, 4)
    path = str(tmp_path / "d.hdf5")
    with StoreWriterPool(path, writers=3) as pool:
        for shot in ("100", "101", "102", "103"):
            pool.stores[pool.shard_of(shot)].write_channel(
                shot, 1, a + int(shot), a[0], a[0], a
            )
    # merged copy first (originals untouched)
    out = str(tmp_path / "merged.hdf5")
    n = consolidate_shards(path, out_path=out)
    assert os.path.exists(path + ".shard1")  # originals kept
    with SpectrogramStore(out, "r") as st:
        assert st._shards == []
        assert st.shots() == [f"ece_{s}" for s in (100, 101, 102, 103)]
        np.testing.assert_array_equal(
            st.read_channel("ece_103", 1)["spec"], a + 103
        )
    # in-place consolidation absorbs + removes sidecars; idempotent
    n2 = consolidate_shards(path)
    assert n2 > 0
    import glob as _glob

    assert _glob.glob(path + ".shard*") == []
    with SpectrogramStore(path, "r") as st:
        assert st._shards == []
        assert st.shots() == [f"ece_{s}" for s in (100, 101, 102, 103)]
    assert consolidate_shards(path) == 0  # nothing left to fold


def test_quarantine_only_on_corruption(tmp_path, monkeypatch):
    """Append-mode quarantine must fire ONLY for actual HDF5 corruption;
    lock contention / permission errors propagate untouched — renaming a
    healthy multi-GB store because another process holds it would restart
    the whole campaign (review round 3)."""
    import h5py

    from specenh.io.store import _is_corrupt_hdf5_error

    assert _is_corrupt_hdf5_error(OSError("… (truncated file: eof = 96 …)"))
    assert _is_corrupt_hdf5_error(OSError("… (file signature not found)"))
    assert not _is_corrupt_hdf5_error(
        OSError("Unable to synchronously open file (unable to lock file, "
                "errno = 11, error message = 'Resource temporarily unavailable')")
    )
    assert not _is_corrupt_hdf5_error(OSError("No space left on device"))

    path = str(tmp_path / "locked.hdf5")
    a = np.zeros((4, 4))
    with SpectrogramStore(path) as st:
        st.write_channel("1", 1, a, a[0], a[0], a)
    real_file = h5py.File

    def locked_open(p, mode, *args, **kw):
        raise BlockingIOError(
            11, "unable to lock file, errno = 11, error message = "
            "'Resource temporarily unavailable'"
        )

    monkeypatch.setattr(h5py, "File", locked_open)
    with pytest.raises(OSError, match="lock"):
        SpectrogramStore(path)
    monkeypatch.setattr(h5py, "File", real_file)
    assert not os.path.exists(path + ".corrupt")  # store left alone
    with SpectrogramStore(path, "r") as st:
        assert st.shots() == ["ece_1"]


def test_sharded_store_order_is_layout_independent(tmp_path):
    """shots() must come back name-sorted regardless of which shard holds
    which shot — seeded shot sampling (plan_stream_split) has to pick the
    same subset for --writers 1 and --writers 8."""
    a = np.zeros((4, 4), np.float32)
    p1 = str(tmp_path / "one.hdf5")
    with SpectrogramStore(p1) as st:
        for s in ("104", "101", "103", "102"):
            st.write_channel(s, 1, a, a[0], a[0], a)
    p2 = str(tmp_path / "many.hdf5")
    with SpectrogramStore(p2) as st:  # later shots land in the BASE here
        for s in ("104", "103"):
            st.write_channel(s, 1, a, a[0], a[0], a)
    with SpectrogramStore(p2 + ".shard1") as st:
        for s in ("101", "102"):
            st.write_channel(s, 1, a, a[0], a[0], a)
    with SpectrogramStore(p1, "r") as s1, SpectrogramStore(p2, "r") as s2:
        assert s1.shots() == s2.shots() == [f"ece_{k}" for k in (101, 102, 103, 104)]
        assert list(s1.iter_channels()) == list(s2.iter_channels())


def test_writer_pool_dead_writer_keeps_draining(tmp_path):
    """If a writer's handle raises (e.g. recording a failure failed on a
    full disk), the thread must DRAIN its queue instead of dying with a
    full queue that deadlocks every later submit; join reports errors."""
    from specenh.io.store import StoreWriterPool

    pool = StoreWriterPool(str(tmp_path / "p.hdf5"), writers=1)
    hits = []

    def bad_handle(store, item):
        hits.append(item)
        raise RuntimeError("disk on fire")

    pool.start(bad_handle)
    for i in range(8):  # queue maxsize is 2 — would deadlock without drain
        pool.submit("1", i)
    errs = pool.join()
    assert len(errs) == 1 and "disk on fire" in str(errs[0])
    assert hits == [0]  # died on the first item, drained the rest
    with pytest.raises(RuntimeError, match="writer thread"):
        pool.raise_if_failed()
    # restartable after the error is handled
    ok = []
    pool.start(lambda st, item: ok.append(item))
    pool.submit("1", "x")
    assert pool.join() == []
    pool.raise_if_failed()
    assert ok == ["x"]
    pool.close()


def test_streaming_tiles_read_through_shard_union(tmp_path):
    """The streamed-training record reader must resolve records living in
    writer-pool sidecars (it used to read store._f directly and would
    KeyError on any sharded store — review round 3)."""
    from specenh.data.grain_pipeline import (
        PatchSpec,
        RecordSlice,
        _read_slice_tiles,
        channel_records,
    )

    rng = np.random.default_rng(0)
    spec = rng.standard_normal((8, 16)).astype(np.float32)
    lab = rng.standard_normal((8, 16)).astype(np.float32)
    f = np.arange(8.0)
    t = np.arange(16.0)
    path = str(tmp_path / "ds.hdf5")
    with SpectrogramStore(path) as st:
        st.write_channel("100", 1, spec, f, t, lab)
    with SpectrogramStore(path + ".shard1") as st:
        st.write_channel("101", 1, spec + 5, f, t, lab + 5)
    ps = PatchSpec(tile_freq=8, tile_time=4, step=4)
    with SpectrogramStore(path, "r") as st:
        assert channel_records(st) == [("ece_100", 1), ("ece_101", 1)]
        x, y = _read_slice_tiles(st, RecordSlice("ece_101", 1, 1, 3), ps)
        np.testing.assert_allclose(x[0, :, :, 0], spec[:, 4:8] + 5)
        np.testing.assert_allclose(y[1, :, :, 0], lab[:, 8:12] + 5)


def test_manifest_resume(tmp_path):
    p = str(tmp_path / "m.jsonl")
    m = CampaignManifest(p)
    m.mark_done("100")
    m.mark_failed("101", "corrupt")
    m.close()
    m2 = CampaignManifest(p)
    assert m2.is_done("100") and not m2.is_done("101")
    assert "corrupt" in list(m2.failed.values())[0]
    m2.close()


def test_build_dataset_campaign(tmp_path):
    """End-to-end campaign: pkl shots -> STFT+pipeline on device -> HDF5,
    with quarantine and resume."""
    cfg = Config(spec=SpecParams(cut_shot=0.05))
    shots = []
    for i, shot in enumerate(["111", "222"]):
        p = str(tmp_path / f"ece_{shot}.pkl")
        _write_ece_pkl(p, n_channels=2, n=cfg.spec.n_samples, seed=i)
        shots.append(p)
    bad = str(tmp_path / "ece_333.pkl")
    with open(bad, "wb") as fh:
        fh.write(b"garbage")
    shots.append(bad)

    store_path = str(tmp_path / "out.hdf5")
    summary = build_dataset(cfg, shots, channels=[1, 2], store_path=store_path, verbose=False)
    assert summary == {"done": 2, "skipped": 0, "failed": 1}

    with SpectrogramStore(store_path, "r") as store:
        assert sorted(store.shots()) == ["ece_111", "ece_222"]
        d = store.read_channel("ece_111", 1)
        assert d["spec"].shape == (cfg.spec.n_freqs_kept, cfg.spec.n_frames)
        assert d["pipeline_out"].shape == d["spec"].shape

    # resume: nothing re-done; the quarantined shot is skipped once-and-for
    # -all (same semantics as the streaming driver and serve.py)
    summary2 = build_dataset(cfg, shots, channels=[1, 2], store_path=store_path, verbose=False)
    assert summary2 == {"done": 0, "skipped": 3, "failed": 0}

    # crash recovery: a truncated store is quarantined AND the stale
    # manifest retired with it (its "done" records point at lost data), so
    # the campaign rebuilds instead of skipping everything; the bad shot is
    # re-tried and re-quarantined under the fresh manifest
    os.truncate(store_path, 96)
    with pytest.warns(UserWarning, match="quarantined"):
        summary3 = build_dataset(
            cfg, shots, channels=[1, 2], store_path=store_path, verbose=False
        )
    assert summary3 == {"done": 2, "skipped": 0, "failed": 1}
    assert os.path.exists(store_path + ".corrupt")
    assert os.path.exists(store_path + ".corrupt.manifest.jsonl")
    with SpectrogramStore(store_path, "r") as store:
        assert sorted(store.shots()) == ["ece_111", "ece_222"]


def test_assemble_and_split(tmp_path):
    path = str(tmp_path / "ds.hdf5")
    rng = np.random.default_rng(0)
    with SpectrogramStore(path) as store:
        for shot in ["1", "2"]:
            for chn in [1, 2]:
                s = rng.random((256, 3905)).astype(np.float32)
                store.write_channel(shot, chn, s, np.arange(256.0), np.arange(3905.0), s * 0.5)
        splits = assemble_from_store(
            store, num_samples=2, channels=[1, 2], cfg=TrainConfig(), seed=0
        )
    total = len(splits.x_train) + len(splits.x_tune) + len(splits.x_test)
    assert total == 2 * 2 * 30
    assert len(splits.x_train) == int(total * 0.6)
    assert splits.x_train.shape[1:] == (256, 128)
    r = splits.reshaped()
    assert r.x_train.shape[1:] == (256, 128, 1)


def test_assemble_split_by_shot(tmp_path):
    path = str(tmp_path / "ds2.hdf5")
    rng = np.random.default_rng(0)
    with SpectrogramStore(path) as store:
        for shot in ["1", "2", "3", "4"]:
            for chn in [1, 2, 3]:
                s = rng.random((256, 3905)).astype(np.float32)
                store.write_channel(shot, chn, s, np.arange(256.0), np.arange(3905.0), s)
        splits = assemble_from_store(
            store, num_samples=4, channels=[1, 2, 3],
            cfg=TrainConfig(split_by="shot"), seed=0,
        )
    # leak-free at SHOT granularity: every split holds whole shots, i.e.
    # multiples of channels * tiles (3 * 30) — channels of one shot must
    # never straddle the boundary
    per_shot = 3 * 30
    assert len(splits.x_train) % per_shot == 0
    assert len(splits.x_tune) % per_shot == 0
    assert len(splits.x_test) % per_shot == 0
    assert (
        len(splits.x_train) + len(splits.x_tune) + len(splits.x_test)
        == 4 * per_shot
    )


def test_synthetic_shot_batch():
    b = synthetic_shot_batch(n_shots=2, n_channels=3, n_samples=1000)
    assert b.shape == (2, 3, 1000) and b.dtype == np.float32
