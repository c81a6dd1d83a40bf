"""Streamed training (train_stream) + sharded-dataset dp_fit.

The reference's 200-shot recipe (manual_scan.py:137-156) exceeds one chip's
HBM; these tests pin the two mechanisms that make it run: the host-streamed
epoch (exact split parity with assemble_from_store, trajectory identity
with fit when unchunked) and the data-axis-sharded resident dataset in
dp_fit (identical to the replicated form).
"""

import os

import numpy as np
import pytest

from specenh.config import ModelConfig, PatchSpec, TrainConfig
from specenh.data.dataset import assemble_from_store
from specenh.io.store import SpectrogramStore
from specenh.train import create_state, fit
from specenh.train_stream import (
    _iter_chunks,
    estimate_resident_bytes,
    fit_streaming,
    plan_stream_split,
)

PS = PatchSpec(tile_freq=32, tile_time=16, step=16, tiles_per_spec=5)
TINY = ModelConfig(filters=(4, 4), kernels=((3, 3), (3, 3)), input_shape=(32, 16, 1))


@pytest.fixture()
def stream_store(tmp_path):
    rng = np.random.default_rng(7)
    store = SpectrogramStore(str(tmp_path / "s.hdf5"))
    for shot in ["101", "102", "103"]:
        for chn in [1, 2]:
            s = rng.random((32, 83)).astype(np.float32)  # 5 tiles of (32,16)
            store.write_channel(shot, chn, s, np.arange(32.0), np.arange(83.0), s * 0.5)
    yield store
    store.close()


def _gather(store, slices):
    xs, ys = [], []
    for x, y in _iter_chunks(store, list(slices), PS, chunk_tiles=10**9):
        xs.append(x)
        ys.append(y)
    if not xs:
        return (np.zeros((0, 32, 16, 1), np.float32),) * 2
    return np.concatenate(xs), np.concatenate(ys)


@pytest.mark.parametrize("split_by", ["tile", "shot"])
def test_stream_plan_matches_assemble(stream_store, split_by):
    """The streamed split is tile-for-tile the assemble_from_store split —
    same sampled-shot order, same boundaries, same (leaky) mid-channel
    behaviour."""
    cfg = TrainConfig(split_by=split_by)
    splits = assemble_from_store(
        stream_store, num_samples=3, ps=PS, cfg=cfg, seed=3
    ).reshaped()
    plan = plan_stream_split(stream_store, num_samples=3, ps=PS, cfg=cfg, seed=3)
    for name, want_x in [
        ("train", splits.x_train), ("tune", splits.x_tune), ("test", splits.x_test)
    ]:
        got_x, got_y = _gather(stream_store, getattr(plan, name))
        assert plan.n_tiles(name) == len(want_x)
        np.testing.assert_array_equal(got_x, want_x)
    np.testing.assert_allclose(got_y, got_x * 0.5, atol=1e-6)


def test_tile_split_boundary_mid_channel(stream_store):
    """30 tiles at (0.6, 0.85) -> boundaries 18 / 25: both fall mid-channel
    (5 tiles each), so one record must appear in two splits."""
    plan = plan_stream_split(stream_store, num_samples=3, ps=PS, seed=3)
    assert (plan.n_tiles("train"), plan.n_tiles("tune"), plan.n_tiles("test")) == (18, 7, 5)
    border = [s for s in plan.train if s.hi != 5 or s.lo != 0]
    assert border, "expected a mid-channel boundary slice"


def test_fit_streaming_identity_unchunked(stream_store):
    """chunk >= n, shuffle off: the streamed trajectory IS fit()'s."""
    cfg = TrainConfig(epochs=3, seed=0, shuffle=False, batch_size=8)
    splits = assemble_from_store(stream_store, num_samples=3, ps=PS, cfg=cfg, seed=3).reshaped()
    s1, h1 = fit(create_state(TINY, cfg), splits.x_train, splits.y_train,
                 splits.x_tune, splits.y_tune, cfg)
    plan = plan_stream_split(stream_store, num_samples=3, ps=PS, cfg=cfg, seed=3)
    s2, h2 = fit_streaming(create_state(TINY, cfg), stream_store, plan, cfg,
                           chunk_tiles=10_000, ps=PS)
    np.testing.assert_allclose(h1["loss"], h2["loss"], rtol=1e-6)
    np.testing.assert_allclose(h1["val_loss"], h2["val_loss"], rtol=1e-6)
    for a, b in zip(
        np.asarray(s1.params["params"]["enc_conv0"]["kernel"]).ravel(),
        np.asarray(s2.params["params"]["enc_conv0"]["kernel"]).ravel(),
    ):
        np.testing.assert_allclose(a, b, rtol=1e-6)


def test_fit_streaming_chunked_trains(stream_store):
    cfg = TrainConfig(epochs=4, seed=1, shuffle=True, batch_size=4)
    plan = plan_stream_split(stream_store, num_samples=3, ps=PS, cfg=cfg, seed=3)
    state, hist = fit_streaming(create_state(TINY, cfg), stream_store, plan, cfg,
                                chunk_tiles=8, ps=PS)
    assert len(hist["loss"]) == 4 and len(hist["val_loss"]) == 4
    assert all(np.isfinite(hist["loss"]))
    assert hist["loss"][-1] < hist["loss"][0]


def test_fit_streaming_resume_identical(stream_store, tmp_path):
    """Interrupt at epoch 2, resume to 4: identical to uninterrupted (the
    per-epoch rng is derived from (seed, epoch), so the shuffle stream
    replays exactly)."""
    cfg = TrainConfig(epochs=4, seed=2, shuffle=True, batch_size=4)
    plan = plan_stream_split(stream_store, num_samples=3, ps=PS, cfg=cfg, seed=3)
    _, h_full = fit_streaming(create_state(TINY, cfg), stream_store, plan, cfg,
                              chunk_tiles=8, ps=PS)
    ckdir = str(tmp_path / "ck")
    fit_streaming(create_state(TINY, cfg), stream_store, plan, cfg, epochs=2,
                  chunk_tiles=8, ps=PS, checkpoint_dir=ckdir)
    _, h_res = fit_streaming(create_state(TINY, cfg), stream_store, plan, cfg,
                             epochs=4, chunk_tiles=8, ps=PS,
                             checkpoint_dir=ckdir, resume=True)
    np.testing.assert_allclose(h_full["loss"], h_res["loss"], rtol=1e-6)
    np.testing.assert_allclose(h_full["val_loss"], h_res["val_loss"], rtol=1e-6)


def test_estimate_resident_bytes():
    # reference recipe: 120k tiles of 256x128 f32, x2 tensors ~ 31.5 GB
    assert estimate_resident_bytes(120_000) == 2 * 4 * 120_000 * 256 * 128


def test_dp_fit_sharded_matches_replicated():
    """The data-axis-sharded resident dataset trains identically to the
    replicated round-2 form (n=22 also exercises the shard padding)."""
    import jax

    from specenh.parallel.data_parallel import dp_fit
    from specenh.parallel.mesh import make_mesh

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    rng = np.random.default_rng(0)
    n = 22
    x = rng.random((n, 32, 16, 1)).astype(np.float32)
    y = (x * 0.5).astype(np.float32)
    xv = rng.random((6, 32, 16, 1)).astype(np.float32)
    yv = (xv * 0.5).astype(np.float32)
    mesh = make_mesh(8, ("data",))
    out = {}
    for mode in ("data", "replicated"):
        state = create_state(TINY, TrainConfig(seed=0))
        out[mode] = dp_fit(
            state, x, y, mesh, xv, yv, epochs=2, batch_size=8, seed=0,
            dataset_sharding=mode,
        )
    np.testing.assert_allclose(out["data"][1]["loss"], out["replicated"][1]["loss"], rtol=2e-5)
    np.testing.assert_allclose(
        out["data"][1]["val_loss"], out["replicated"][1]["val_loss"], rtol=2e-5
    )
    pa = np.asarray(out["data"][0].params["params"]["enc_conv0"]["kernel"])
    pb = np.asarray(out["replicated"][0].params["params"]["enc_conv0"]["kernel"])
    np.testing.assert_allclose(pa, pb, rtol=1e-4, atol=1e-6)


def test_fit_streaming_mesh_matches_single_chip(stream_store):
    """fit_streaming(mesh=('data',)) — each streamed chunk sharded over the
    mesh trains the same trajectory as the single-chip stream (same chunk
    composition and shuffle stream; batch_size=8 is a device multiple, so
    the effective batches are identical and only reduction order differs).
    The chunk size also exercises a short final chunk (18 train tiles in
    chunks of 8) whose batch pads to the device count."""
    import jax

    from specenh.parallel.mesh import make_mesh

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    cfg = TrainConfig(epochs=3, seed=0, shuffle=True, batch_size=8)
    plan = plan_stream_split(stream_store, num_samples=3, ps=PS, cfg=cfg, seed=3)
    s1, h1 = fit_streaming(create_state(TINY, cfg), stream_store, plan, cfg,
                           chunk_tiles=8, ps=PS)
    mesh = make_mesh(8, ("data",))
    s2, h2 = fit_streaming(create_state(TINY, cfg), stream_store, plan, cfg,
                           chunk_tiles=8, ps=PS, mesh=mesh)
    np.testing.assert_allclose(h2["loss"], h1["loss"], rtol=2e-5)
    np.testing.assert_allclose(h2["val_loss"], h1["val_loss"], rtol=2e-5)
    pa = np.asarray(s1.params["params"]["enc_conv0"]["kernel"])
    pb = np.asarray(s2.params["params"]["enc_conv0"]["kernel"])
    np.testing.assert_allclose(pa, pb, rtol=1e-4, atol=1e-6)


def test_fit_streaming_mesh_resume_requires_same_devices(stream_store, tmp_path):
    """A mesh-streamed checkpoint cannot be resumed by a single-chip
    command: 'devices' is recorded unconditionally in the run meta, so the
    saved 8 diffs against the current 1 (round-3 advisor finding — the
    one-sided optional-key tolerance used to let this pass silently)."""
    import jax

    from specenh.parallel.mesh import make_mesh

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    cfg = TrainConfig(epochs=2, seed=0, shuffle=True, batch_size=8)
    plan = plan_stream_split(stream_store, num_samples=3, ps=PS, cfg=cfg, seed=3)
    ckdir = str(tmp_path / "ck")
    mesh = make_mesh(8, ("data",))
    fit_streaming(create_state(TINY, cfg), stream_store, plan, cfg, epochs=1,
                  chunk_tiles=8, ps=PS, mesh=mesh, checkpoint_dir=ckdir)
    with pytest.raises(ValueError, match="run parameters changed"):
        fit_streaming(create_state(TINY, cfg), stream_store, plan, cfg,
                      epochs=2, chunk_tiles=8, ps=PS,
                      checkpoint_dir=ckdir, resume=True)


def test_check_run_meta_saved_only_optional_key_raises(tmp_path):
    """check_run_meta diffs optional keys in BOTH directions: present in
    the saved meta but absent from the current one raises too."""
    from specenh.train import check_run_meta, write_run_meta

    ck = str(tmp_path / "ck")
    write_run_meta(ck, {"n": 8, "devices": 4})
    check_run_meta(ck, {"n": 8, "devices": 4}, optional_keys=("devices",))
    with pytest.raises(ValueError, match="run parameters changed"):
        check_run_meta(ck, {"n": 8}, optional_keys=("devices",))
    # absent in the SAVED file stays tolerated (old checkpoints resumable)
    write_run_meta(ck, {"n": 8})
    check_run_meta(ck, {"n": 8, "devices": 1}, optional_keys=("devices",))


def test_fit_streaming_early_stopping(stream_store):
    """patience flows through the streamed fit too (lr=0 -> every epoch
    after the first is stale)."""
    cfg = TrainConfig(epochs=8, seed=1, batch_size=4, learning_rate=0.0,
                      patience=1)
    plan = plan_stream_split(stream_store, num_samples=3, ps=PS, cfg=cfg, seed=3)
    _, hist = fit_streaming(create_state(TINY, cfg), stream_store, plan, cfg,
                            chunk_tiles=8, ps=PS)
    assert hist["stopped_epoch"] == 1
    assert len(hist["loss"]) == 2


def test_chunk_plans_canonical_composition():
    """_chunk_plans cuts the slice list at exact tile boundaries (incl.
    mid-record cuts) independent of epoch: total tiles and per-chunk sizes
    are exact, and re-planning yields the identical composition."""
    from specenh.data.grain_pipeline import RecordSlice
    from specenh.train_stream import _chunk_plans

    slices = [
        RecordSlice("a", 1, 0, 5), RecordSlice("a", 2, 2, 5),
        RecordSlice("b", 1, 0, 4),
    ]
    plans = _chunk_plans(slices, 4)
    assert [sum(s.n_tiles for s in p) for p in plans] == [4, 4, 4]
    # chunk 0 = a1[0:4]; chunk 1 = a1[4:5] + a2[2:5]; chunk 2 = b1[0:4]
    assert plans[0] == [RecordSlice("a", 1, 0, 4)]
    assert plans[1] == [RecordSlice("a", 1, 4, 5), RecordSlice("a", 2, 2, 5)]
    assert plans == _chunk_plans(slices, 4)


def test_fit_streaming_cache_matches_disk(stream_store):
    """cache='always' trains the identical trajectory as cache='never'
    under shuffle=False (canonical composition == stream order), and the
    cached run stops reading the store after its first epoch."""
    from specenh.io.store import SpectrogramStore

    cfg = TrainConfig(epochs=3, seed=1, shuffle=False, batch_size=4)
    plan = plan_stream_split(stream_store, num_samples=3, ps=PS, cfg=cfg, seed=3)
    _, h_disk = fit_streaming(create_state(TINY, cfg), stream_store, plan, cfg,
                              chunk_tiles=8, ps=PS, cache="never")

    reads = {"n": 0}
    orig = SpectrogramStore.read_column_slice

    def counting_read(self, *a, **k):
        reads["n"] += 1
        return orig(self, *a, **k)

    SpectrogramStore.read_column_slice = counting_read
    try:
        _, h_cache = fit_streaming(create_state(TINY, cfg), stream_store, plan,
                                   cfg, chunk_tiles=8, ps=PS, cache="always")
        three_epoch_reads = reads["n"]
        reads["n"] = 0
        fit_streaming(create_state(TINY, cfg), stream_store, plan,
                      cfg, epochs=1, chunk_tiles=8, ps=PS, cache="always")
        # 3 cached epochs read exactly what 1 epoch reads: epochs 2-3
        # never touched the store
        assert three_epoch_reads == reads["n"] > 0
    finally:
        SpectrogramStore.read_column_slice = orig
    np.testing.assert_allclose(h_cache["loss"], h_disk["loss"], rtol=1e-6)
    np.testing.assert_allclose(h_cache["val_loss"], h_disk["val_loss"], rtol=1e-6)


def test_fit_streaming_cache_shuffled_resume_identical(stream_store, tmp_path):
    """Shuffled + cached: interrupt/resume matches uninterrupted exactly —
    canonical chunk composition means the resumed process rebuilds the
    very same chunks the full run cached at epoch 0."""
    cfg = TrainConfig(epochs=4, seed=2, shuffle=True, batch_size=4)
    plan = plan_stream_split(stream_store, num_samples=3, ps=PS, cfg=cfg, seed=3)
    _, h_full = fit_streaming(create_state(TINY, cfg), stream_store, plan, cfg,
                              chunk_tiles=8, ps=PS, cache="always")
    ckdir = str(tmp_path / "ck")
    fit_streaming(create_state(TINY, cfg), stream_store, plan, cfg, epochs=2,
                  chunk_tiles=8, ps=PS, cache="always", checkpoint_dir=ckdir)
    _, h_res = fit_streaming(create_state(TINY, cfg), stream_store, plan, cfg,
                             epochs=4, chunk_tiles=8, ps=PS, cache="always",
                             checkpoint_dir=ckdir, resume=True)
    np.testing.assert_allclose(h_full["loss"], h_res["loss"], rtol=1e-6)
    np.testing.assert_allclose(h_full["val_loss"], h_res["val_loss"], rtol=1e-6)


def test_fit_streaming_bf16_chunks_train(stream_store):
    """cache_dtype='bf16' (half cache RAM + half upload bytes): the run
    trains and tracks the f32 trajectory to input-quantization tolerance."""
    cfg = TrainConfig(epochs=3, seed=1, shuffle=False, batch_size=4)
    plan = plan_stream_split(stream_store, num_samples=3, ps=PS, cfg=cfg, seed=3)
    _, h32 = fit_streaming(create_state(TINY, cfg), stream_store, plan, cfg,
                           chunk_tiles=8, ps=PS)
    _, h16 = fit_streaming(create_state(TINY, cfg), stream_store, plan, cfg,
                           chunk_tiles=8, ps=PS, cache_dtype="bf16")
    np.testing.assert_allclose(h16["loss"], h32["loss"], atol=5e-3)
    # the 'never' branch converts too
    _, h16n = fit_streaming(create_state(TINY, cfg), stream_store, plan, cfg,
                            chunk_tiles=8, ps=PS, cache="never",
                            cache_dtype="bf16")
    np.testing.assert_allclose(h16n["loss"], h16["loss"], rtol=1e-6)


def test_fit_streaming_partial_cache_budget(stream_store, monkeypatch):
    """A cache budget smaller than the split pins only the chunks that
    fit; the rest stream from disk every epoch — trajectory unchanged
    (canonical composition) and the per-epoch read count settles at the
    uncached remainder."""
    from specenh.io.store import SpectrogramStore

    cfg = TrainConfig(epochs=3, seed=1, shuffle=False, batch_size=4)
    plan = plan_stream_split(stream_store, num_samples=3, ps=PS, cfg=cfg, seed=3)
    _, h_full = fit_streaming(create_state(TINY, cfg), stream_store, plan, cfg,
                              chunk_tiles=8, ps=PS, cache="always")
    # one 8-tile chunk of (32,16,1) x/y tiles = 2*8*32*16*4 B; budget for ~1 chunk
    monkeypatch.setenv("SPECENH_STREAM_CACHE_GB",
                       str(1.5 * 2 * 8 * 32 * 16 * 4 / 2**30))
    reads = {"n": 0}
    orig = SpectrogramStore.read_column_slice

    def counting_read(self, *a, **k):
        reads["n"] += 1
        return orig(self, *a, **k)

    monkeypatch.setattr(SpectrogramStore, "read_column_slice", counting_read)
    _, h_part = fit_streaming(create_state(TINY, cfg), stream_store, plan, cfg,
                              chunk_tiles=8, ps=PS, cache="auto")
    np.testing.assert_allclose(h_part["loss"], h_full["loss"], rtol=1e-6)
    np.testing.assert_allclose(h_part["val_loss"], h_full["val_loss"], rtol=1e-6)
    # epoch 1 reads everything; epochs 2-3 read strictly less (some chunks
    # pinned) but not zero (budget excludes at least one chunk)
    reads2 = {"n": 0}
    monkeypatch.setattr(SpectrogramStore, "read_column_slice", orig)
    monkeypatch.setenv("SPECENH_STREAM_CACHE_GB", "0")
    # budget 0: nothing pins, every epoch re-reads — the count triples
    monkeypatch.setattr(SpectrogramStore, "read_column_slice",
                        lambda self, *a, **k: (reads2.__setitem__("n", reads2["n"] + 1), orig(self, *a, **k))[1])
    fit_streaming(create_state(TINY, cfg), stream_store, plan, cfg,
                  chunk_tiles=8, ps=PS, cache="auto")
    assert 0 < reads["n"] < reads2["n"]


def test_tile_cache_roundtrip_and_fingerprint(stream_store, tmp_path):
    """data.tilecache: build -> memmap chunks equal the HDF5-assembled
    chunks; a mismatched plan or dtype is treated as absent (rebuild);
    a build that died before the sidecar is invisible."""
    from specenh.data.tilecache import build_tile_cache, open_tile_cache
    from specenh.train_stream import _chunk_plans, _read_chunk

    cfg = TrainConfig(seed=1)
    plan = plan_stream_split(stream_store, num_samples=3, ps=PS, cfg=cfg, seed=3)
    base = str(tmp_path / "tc")
    sid = stream_store.path
    build_tile_cache(stream_store, plan.train, base, "train", PS, "f32",
                     store_id=sid, chunk_tiles=8)
    r = open_tile_cache(base, "train", sid, plan.train, PS, "f32")
    assert r is not None and r.n == plan.n_tiles("train")
    offs = [0]
    for p in _chunk_plans(plan.train, 8):
        want = _read_chunk(stream_store, p, PS)
        lo = offs[-1]
        offs.append(lo + len(want[0]))
        got = r.read(lo, offs[-1])
        np.testing.assert_array_equal(got[0], want[0])
        np.testing.assert_array_equal(got[1], want[1])
    # wrong dtype / wrong plan -> absent
    assert open_tile_cache(base, "train", sid, plan.train, PS, "bf16") is None
    assert open_tile_cache(base, "train", sid, plan.train[:-1], PS, "f32") is None
    # missing sidecar (interrupted build) -> absent
    os.remove(base + ".train.json")
    assert open_tile_cache(base, "train", sid, plan.train, PS, "f32") is None


def test_fit_streaming_tile_cache(stream_store, tmp_path):
    """tile_cache: identical trajectory, and the SECOND run never touches
    the HDF5 store at all (every read comes from the memmap)."""
    from specenh.io.store import SpectrogramStore

    cfg = TrainConfig(epochs=2, seed=1, shuffle=False, batch_size=4)
    plan = plan_stream_split(stream_store, num_samples=3, ps=PS, cfg=cfg, seed=3)
    _, h_ref = fit_streaming(create_state(TINY, cfg), stream_store, plan, cfg,
                             chunk_tiles=8, ps=PS)
    base = str(tmp_path / "tc2")
    _, h_tc = fit_streaming(create_state(TINY, cfg), stream_store, plan, cfg,
                            chunk_tiles=8, ps=PS, tile_cache=base)
    np.testing.assert_allclose(h_tc["loss"], h_ref["loss"], rtol=1e-6)
    np.testing.assert_allclose(h_tc["val_loss"], h_ref["val_loss"], rtol=1e-6)

    reads = {"n": 0}
    orig = SpectrogramStore.read_column_slice

    def counting_read(self, *a, **k):
        reads["n"] += 1
        return orig(self, *a, **k)

    SpectrogramStore.read_column_slice = counting_read
    try:
        _, h_tc2 = fit_streaming(create_state(TINY, cfg), stream_store, plan,
                                 cfg, chunk_tiles=8, ps=PS, tile_cache=base)
    finally:
        SpectrogramStore.read_column_slice = orig
    assert reads["n"] == 0, "second tile-cached run must not read the store"
    np.testing.assert_allclose(h_tc2["loss"], h_ref["loss"], rtol=1e-6)

    with pytest.raises(ValueError, match="canonical chunk composition"):
        fit_streaming(create_state(TINY, cfg), stream_store, plan, cfg,
                      chunk_tiles=8, ps=PS, tile_cache=base, cache="never")


def test_tile_cache_invalidated_by_store_rewrite(stream_store, tmp_path):
    """store_identity binds the cache to the backing FILE (size+mtime),
    not just its path: a store regenerated in place — same path, same
    shot names/shapes, different bytes — must invalidate the fingerprint
    (round-4 advisor finding)."""
    from specenh.data.tilecache import (
        build_tile_cache,
        open_tile_cache,
        store_identity,
    )

    cfg = TrainConfig(seed=1)
    plan = plan_stream_split(stream_store, num_samples=3, ps=PS, cfg=cfg, seed=3)
    base = str(tmp_path / "tc3")
    sid = store_identity(stream_store)
    assert stream_store.path in sid and ":" in sid
    build_tile_cache(stream_store, plan.train, base, "train", PS, "f32",
                     store_id=sid, chunk_tiles=8)
    assert open_tile_cache(base, "train", sid, plan.train, PS, "f32") is not None
    # simulate an in-place regeneration: bump the backing file's mtime
    st = os.stat(stream_store.path)
    os.utime(stream_store.path, ns=(st.st_atime_ns, st.st_mtime_ns + 10**9))
    sid2 = store_identity(stream_store)
    assert sid2 != sid
    assert open_tile_cache(base, "train", sid2, plan.train, PS, "f32") is None


def test_fit_streaming_mesh_bf16_matches_single_chip(stream_store):
    """cache_dtype='bf16' composes with mesh streaming (round-4 verdict
    gap): chunks shard onto the data axis AS bf16 — no f32 round-trip —
    and the trajectory matches the single-chip bf16 stream (bf16->f32
    promotion in the Flax step is exact, so only reduction order
    differs).  Also asserts the sharded operand really is bf16 (the
    upload-halving claim)."""
    import jax
    import jax.numpy as jnp

    from specenh.parallel import data_parallel as dp
    from specenh.parallel.mesh import make_mesh

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    cfg = TrainConfig(epochs=2, seed=0, shuffle=True, batch_size=8)
    plan = plan_stream_split(stream_store, num_samples=3, ps=PS, cfg=cfg, seed=3)
    s1, h1 = fit_streaming(create_state(TINY, cfg), stream_store, plan, cfg,
                           chunk_tiles=8, ps=PS, cache_dtype="bf16")
    mesh = make_mesh(8, ("data",))
    put_dtypes = []
    orig_put = dp._put_sharded

    def spy_put(a, sharding, n_dev):
        out = orig_put(a, sharding, n_dev)
        put_dtypes.append(out.dtype)
        return out

    # fit_streaming imports _put_sharded from data_parallel at call time,
    # so patching the module attribute intercepts the shard placement
    dp._put_sharded = spy_put
    try:
        s2, h2 = fit_streaming(create_state(TINY, cfg), stream_store, plan,
                               cfg, chunk_tiles=8, ps=PS, mesh=mesh,
                               cache_dtype="bf16")
    finally:
        dp._put_sharded = orig_put
    assert put_dtypes and all(d == jnp.bfloat16 for d in put_dtypes)
    np.testing.assert_allclose(h2["loss"], h1["loss"], rtol=2e-5)
    np.testing.assert_allclose(h2["val_loss"], h1["val_loss"], rtol=2e-5)
    pa = np.asarray(s1.params["params"]["enc_conv0"]["kernel"])
    pb = np.asarray(s2.params["params"]["enc_conv0"]["kernel"])
    np.testing.assert_allclose(pa, pb, rtol=1e-4, atol=1e-6)
