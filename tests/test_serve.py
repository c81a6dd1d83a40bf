"""Tests for the enhancement service (specenh.serve): backlog processing,
idempotent restarts, quarantine."""

import numpy as np

from specenh.config import Config, ModelConfig, SpecParams
from specenh.io.binfmt import write_shot_bin
from specenh.io.store import CampaignManifest, SpectrogramStore
from specenh.serve import EnhanceService, serve_once
from specenh.utils.metrics import ssim


def _setup(tmp_path, n_shots=2, c=2):
    cfg = Config(spec=SpecParams(cut_shot=0.1))
    watch = tmp_path / "in"
    watch.mkdir()
    rng = np.random.default_rng(0)
    for s in range(n_shots):
        write_shot_bin(
            str(watch / f"shot_{100 + s}.bin"),
            rng.standard_normal((c, cfg.spec.n_samples)).astype(np.float32),
        )
    return cfg, str(watch)


def test_serve_processes_backlog_and_is_idempotent(tmp_path):
    cfg, watch = _setup(tmp_path)
    tiny = ModelConfig(filters=(4, 4), kernels=((3, 3), (3, 3)))
    service = EnhanceService(cfg, tiny, n_channels=2)
    out = str(tmp_path / "out.hdf5")
    manifest = CampaignManifest(out + ".serve.jsonl")
    with SpectrogramStore(out) as store:
        r1 = serve_once(service, watch, store, manifest, verbose=False)
        r2 = serve_once(service, watch, store, manifest, verbose=False)
    assert r1 == {"done": 2, "failed": 0}
    assert r2 == {"done": 0, "failed": 0}  # ledger makes restarts idempotent
    manifest.close()
    with SpectrogramStore(out, "r") as store:
        assert sorted(store.shots()) == ["enhanced_100", "enhanced_101"]
        d = store.read_channel("enhanced_100", 1)
        assert d["spec"].shape[0] == 256
        assert 0.0 <= d["pipeline_out"].min() and d["pipeline_out"].max() <= 1.0


def test_serve_metrics_schema(tmp_path):
    """Pipelined server metrics: per-shot read_s + latency_s, per-drain
    serve_batch with shots/s (the dashboard contract; advisor round 2)."""
    import json

    from specenh.utils.logging import MetricsLogger

    cfg, watch = _setup(tmp_path)
    tiny = ModelConfig(filters=(4, 4), kernels=((3, 3), (3, 3)))
    service = EnhanceService(cfg, tiny, n_channels=2)
    out = str(tmp_path / "out.hdf5")
    manifest = CampaignManifest(out + ".serve.jsonl")
    mpath = out + ".metrics.jsonl"
    with SpectrogramStore(out) as store, MetricsLogger(mpath) as metrics:
        serve_once(service, watch, store, manifest, metrics, verbose=False)
    manifest.close()
    events = [json.loads(l) for l in open(mpath)]
    shots = [e for e in events if e["event"] == "shot_enhanced"]
    batch = [e for e in events if e["event"] == "serve_batch"]
    assert len(shots) == 2 and len(batch) == 1
    for e in shots:
        assert e["read_s"] >= 0 and e["latency_s"] >= e["read_s"]
    assert batch[0]["done"] == 2 and batch[0]["shots_per_sec"] > 0


def test_serve_quarantines_corrupt(tmp_path):
    cfg, watch = _setup(tmp_path, n_shots=1)
    (tmp_path / "in" / "shot_999.bin").write_bytes(b"garbage")
    tiny = ModelConfig(filters=(4, 4), kernels=((3, 3), (3, 3)))
    service = EnhanceService(cfg, tiny, n_channels=2)
    out = str(tmp_path / "out.hdf5")
    manifest = CampaignManifest(out + ".serve.jsonl")
    with SpectrogramStore(out) as store:
        r = serve_once(service, watch, store, manifest, verbose=False)
    assert r == {"done": 1, "failed": 1}
    manifest.close()


def test_serve_overlap_with_corrupt_mid_stream(tmp_path):
    """A corrupt shot BETWEEN two good ones: the in-flight device result
    from the previous shot must still be drained and every good shot
    persisted (regression for the one-deep IO/compute overlap)."""
    cfg, watch = _setup(tmp_path, n_shots=2)  # shot_100, shot_101
    (tmp_path / "in" / "shot_100a.bin").write_bytes(b"garbage")  # sorts between
    tiny = ModelConfig(filters=(4, 4), kernels=((3, 3), (3, 3)))
    service = EnhanceService(cfg, tiny, n_channels=2)
    out = str(tmp_path / "out.hdf5")
    manifest = CampaignManifest(out + ".serve.jsonl")
    with SpectrogramStore(out) as store:
        r = serve_once(service, watch, store, manifest, verbose=False)
        assert r == {"done": 2, "failed": 1}
        assert sorted(store.shots()) == ["enhanced_100", "enhanced_101"]
    manifest.close()


def test_serve_max_new_counts_inflight(tmp_path):
    """max_new must bound the number of shots taken including the one in
    flight — with 3 pending and max_new=2, exactly 2 are processed."""
    cfg, watch = _setup(tmp_path, n_shots=3)
    tiny = ModelConfig(filters=(4, 4), kernels=((3, 3), (3, 3)))
    service = EnhanceService(cfg, tiny, n_channels=2)
    out = str(tmp_path / "out.hdf5")
    manifest = CampaignManifest(out + ".serve.jsonl")
    with SpectrogramStore(out) as store:
        r = serve_once(service, watch, store, manifest, max_new=2, verbose=False)
        assert r == {"done": 2, "failed": 0}
        r2 = serve_once(service, watch, store, manifest, verbose=False)
        assert r2 == {"done": 1, "failed": 0}
    manifest.close()


def test_serve_writer_pool_shards_persist(tmp_path):
    """serve_once with a StoreWriterPool: N writer threads each own a
    shard file; the union read view sees every shot; the manifest makes a
    pooled restart idempotent (incl. a corrupt shot quarantined once)."""
    from specenh.io.store import StoreWriterPool

    cfg, watch = _setup(tmp_path, n_shots=4)
    (tmp_path / "in" / "shot_50.bin").write_bytes(b"garbage")
    tiny = ModelConfig(filters=(4, 4), kernels=((3, 3), (3, 3)))
    service = EnhanceService(cfg, tiny, n_channels=2)
    out = str(tmp_path / "out.hdf5")
    manifest = CampaignManifest(out + ".serve.jsonl")
    with StoreWriterPool(out, writers=3) as pool:
        r1 = serve_once(service, watch, pool, manifest, verbose=False)
        r2 = serve_once(service, watch, pool, manifest, verbose=False)
        assert r1 == {"done": 4, "failed": 1}
        assert r2 == {"done": 0, "failed": 0}
        # the persist genuinely sharded over >1 file
        assert sum(1 for s in pool.stores if s.shots()) > 1
    manifest.close()
    with SpectrogramStore(out, "r") as store:
        assert sorted(store.shots()) == [
            f"enhanced_{100 + s}" for s in range(4)
        ]
        for s in range(4):
            assert store.channels_of(f"enhanced_{100 + s}") == [1, 2]


def test_serve_forever_writers_cli_path(tmp_path):
    """serve_forever(writers=N) builds the pool, retires stale manifests
    through it, and drains the backlog."""
    from specenh.serve import serve_forever

    cfg, watch = _setup(tmp_path, n_shots=2)
    tiny = ModelConfig(filters=(4, 4), kernels=((3, 3), (3, 3)))
    service = EnhanceService(cfg, tiny, n_channels=2)
    out = str(tmp_path / "out.hdf5")
    totals = serve_forever(
        service, watch, out, once=True, writers=2, verbose=False
    )
    assert totals == {"done": 2, "failed": 0}
    with SpectrogramStore(out, "r") as store:
        assert sorted(store.shots()) == ["enhanced_100", "enhanced_101"]


def test_mesh_kernel_uneven_channels_clear_error():
    """Forced fused-kernel serving over a mesh with a channel count that
    doesn't divide the axis raises up front (auto mode routes such counts
    to the Flax path instead — advisor round 2)."""
    import jax
    import numpy as np
    import pytest

    from specenh.bench.harness import make_enhance_shot_fn
    from specenh.config import ModelConfig, SpecParams
    from specenh.parallel.mesh import make_mesh

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 devices")
    sp = SpecParams(cut_shot=0.1)
    mesh = make_mesh(8, ("data",))
    fn = make_enhance_shot_fn(ModelConfig(), sp, mesh=mesh, use_kernel=True,
                              interpret=True)
    traces = np.zeros((20, sp.n_samples), np.float32)  # 20 % 8 != 0
    with pytest.raises(ValueError, match="divisible"):
        fn(None, traces)


def test_service_spectrogram_is_golden(tmp_path):
    """The service's spectrogram output (bf16x3 STFT path) must stay at
    SSIM >= 0.999 vs the CPU reference recipe."""
    from specenh.bench.reference_cpu import spectrogram_ref

    cfg = Config(spec=SpecParams(cut_shot=0.1))
    tiny = ModelConfig(filters=(4, 4), kernels=((3, 3), (3, 3)))
    service = EnhanceService(cfg, tiny, n_channels=1)
    rng = np.random.default_rng(1)
    traces = rng.standard_normal((1, cfg.spec.n_samples)).astype(np.float32)
    specs, _ = service.enhance(traces)
    golden, _, _ = spectrogram_ref(traces[0], cfg.spec)
    assert ssim(specs[0], golden) > 0.999

def test_serve_dispatch_exception_retires_threads(tmp_path):
    """A dispatch-path exception must not escape serve_once while the
    reader/writer threads are live: the caller's with-block closes the
    h5py store the writer persists into (round-3 review).  In-flight
    results dispatched BEFORE the failure must still be persisted."""
    import threading

    import pytest

    cfg, watch = _setup(tmp_path, n_shots=4)
    tiny = ModelConfig(filters=(4, 4), kernels=((3, 3), (3, 3)))
    service = EnhanceService(cfg, tiny, n_channels=2)
    real_fn, calls = service.fn, []

    def boom(params, traces):
        calls.append(1)
        if len(calls) >= 2:
            raise RuntimeError("dispatch boom")
        return real_fn(params, traces)

    service.fn = boom
    out = str(tmp_path / "out.hdf5")
    manifest = CampaignManifest(out + ".serve.jsonl")
    with SpectrogramStore(out) as store:
        with pytest.raises(RuntimeError, match="dispatch boom"):
            serve_once(service, watch, store, manifest, verbose=False)
    assert not [t for t in threading.enumerate() if t.name.startswith("serve-")]
    manifest.close()
    with SpectrogramStore(out, "r") as store:
        assert store.shots() == ["enhanced_100"]  # in-flight shot landed
