"""Tests for the native C++ shot runtime (SPEC binary format, mmap reader,
threaded prefetcher) and its Python fallback."""

import numpy as np
import pytest

from specenh.io.binfmt import convert_ece_pickle, read_shot_bin, write_shot_bin
from specenh.io.native import NativePrefetcher, load_native, native_available, read_shot


def _make_shot(path, c=3, s=1000, seed=0):
    rng = np.random.default_rng(seed)
    traces = rng.standard_normal((c, s)).astype(np.float32)
    write_shot_bin(str(path), traces)
    return traces


def test_binfmt_roundtrip(tmp_path):
    p = tmp_path / "shot.bin"
    traces = _make_shot(p)
    np.testing.assert_array_equal(read_shot_bin(str(p)), traces)


def test_binfmt_rejects_garbage(tmp_path):
    p = tmp_path / "bad.bin"
    p.write_bytes(b"x" * 64)
    with pytest.raises(ValueError):
        read_shot_bin(str(p))


def test_native_builds():
    assert native_available(), "native library failed to build (g++ toolchain)"


def test_native_read_matches_python(tmp_path):
    p = tmp_path / "shot.bin"
    traces = _make_shot(p, c=4, s=2048, seed=1)
    out = read_shot(str(p), 4, 2048)
    np.testing.assert_array_equal(out, traces)
    # truncation + zero-padding semantics
    out2 = read_shot(str(p), 6, 1024)
    np.testing.assert_array_equal(out2[:4], traces[:, :1024])
    assert (out2[4:] == 0).all()


def test_prefetcher_streams_all_shots(tmp_path):
    shots = {}
    paths = []
    for i in range(6):
        p = tmp_path / f"s{i}.bin"
        shots[i] = _make_shot(p, c=2, s=512, seed=i)
        paths.append(str(p))
    seen = {}
    with NativePrefetcher(paths, n_channels=2, n_samples=512, n_threads=3) as pf:
        for idx, traces in pf:
            assert idx >= 0
            seen[idx] = traces
    assert sorted(seen) == list(range(6))
    for i, traces in seen.items():
        np.testing.assert_array_equal(traces, shots[i])


def test_prefetcher_quarantines_corrupt(tmp_path):
    good = tmp_path / "good.bin"
    traces = _make_shot(good, c=2, s=256, seed=9)
    bad = tmp_path / "bad.bin"
    bad.write_bytes(b"not a shot")
    results = list(
        NativePrefetcher([str(good), str(bad)], n_channels=2, n_samples=256)
    )
    ok = [r for r in results if r[1] is not None]
    failed = [r for r in results if r[1] is None]
    assert len(ok) == 1 and len(failed) == 1
    assert ok[0][0] == 0
    np.testing.assert_array_equal(ok[0][1], traces)
    # the failure reports WHICH file so callers can quarantine it
    assert failed[0][0] == 1


def test_streaming_pipeline_quarantines_and_skips(tmp_path):
    """A corrupt SPEC binary is marked failed in the manifest (by SHOT),
    and a rerun skips it instead of re-reading and re-failing forever."""
    import dataclasses

    from specenh.config import Config, SpecParams
    from specenh.pipeline import build_dataset_streaming

    sp = SpecParams(cut_shot=0.01)
    cfg = Config(spec=sp)
    good = tmp_path / "ece_100.bin"
    _make_shot(good, c=2, s=sp.n_samples, seed=1)
    bad = tmp_path / "ece_101.bin"
    bad.write_bytes(b"corrupt")
    files = [str(good), str(bad)]
    store = str(tmp_path / "ds.h5")

    r1 = build_dataset_streaming(cfg, files, 2, store_path=store, verbose=False)
    assert r1["done"] == 1 and r1["failed"] == 1

    r2 = build_dataset_streaming(cfg, files, 2, store_path=store, verbose=False)
    assert r2["done"] == 0 and r2["failed"] == 0 and r2["skipped"] == 2


def test_streaming_pipeline_writer_pool(tmp_path):
    """build_dataset_streaming(writers=N): persist shards over N files,
    union read sees every shot, resume stays idempotent."""
    from specenh.config import Config, SpecParams
    from specenh.io.store import SpectrogramStore
    from specenh.pipeline import build_dataset_streaming

    sp = SpecParams(cut_shot=0.01)
    cfg = Config(spec=sp)
    files = []
    for s in range(4):
        p = tmp_path / f"ece_{100 + s}.bin"
        _make_shot(p, c=2, s=sp.n_samples, seed=s)
        files.append(str(p))
    store = str(tmp_path / "ds.h5")

    r1 = build_dataset_streaming(
        cfg, files, 2, store_path=store, writers=3, verbose=False
    )
    assert r1["done"] == 4 and r1["failed"] == 0
    r2 = build_dataset_streaming(
        cfg, files, 2, store_path=store, writers=3, verbose=False
    )
    assert r2 == {"done": 0, "skipped": 4, "failed": 0}

    with SpectrogramStore(store, "r") as st:
        assert sorted(st.shots()) == [f"ece_{100 + s}" for s in range(4)]
        for s in range(4):
            assert st.channels_of(f"ece_{100 + s}") == [1, 2]
            assert st.read_channel(f"ece_{100 + s}", 1)["spec"].shape[0] == 256
    # the persist genuinely sharded over >1 file
    import glob as _glob

    assert len(_glob.glob(store + ".shard*")) >= 1


def test_convert_ece_pickle(tmp_path):
    import pickle

    from specenh.io.shots import ece_key

    rng = np.random.default_rng(3)
    data = {ece_key(c + 1): rng.standard_normal(400).astype(np.float32) for c in range(2)}
    pkl = tmp_path / "ece_1.pkl"
    with open(pkl, "wb") as fh:
        pickle.dump(data, fh)
    binp = tmp_path / "ece_1.bin"
    traces = convert_ece_pickle(str(pkl), str(binp), [1, 2])
    np.testing.assert_array_equal(read_shot_bin(str(binp)), traces)
