"""End-to-end CLI smoke test: the whole user journey on synthetic data
(synth-shots -> build-data -> train -> denoise), small workload, in-process."""

import json
import os

import numpy as np
import pytest

from specenh.cli import main


@pytest.fixture(scope="module")
def workspace(tmp_path_factory, capfd_unsafe=None):
    return tmp_path_factory.mktemp("cli")


def _ensure_dataset(workspace, capfd):
    """Build the shared raw dir + dataset if a -k selection skipped the
    journey test that normally creates them (idempotent in full runs)."""
    raw = str(workspace / "raw")
    ds = str(workspace / "data.hdf5")
    if not (os.path.isdir(raw) and os.listdir(raw)):
        main(["synth-shots", "--out", raw, "--shots", "2", "--channels", "2",
              "--samples", "50000", "--seed", "1"])
    if not os.path.exists(ds):
        main(["build-data", "--data-dir", raw, "--out", ds, "--channels", "2",
              "--cut-shot", "0.1", "--quiet"])
    capfd.readouterr()
    return ds


def test_full_cli_journey(workspace, capfd):
    raw = str(workspace / "raw")
    ds = str(workspace / "data.hdf5")

    main(["synth-shots", "--out", raw, "--shots", "2", "--channels", "2",
          "--samples", "50000", "--seed", "1"])
    assert len(os.listdir(raw)) == 2

    main(["build-data", "--data-dir", raw, "--out", ds, "--channels", "2",
          "--cut-shot", "0.1", "--quiet"])
    out = capfd.readouterr().out.strip().splitlines()[-1]
    assert json.loads(out) == {"done": 2, "skipped": 0, "failed": 0}

    train_dir = str(workspace / "train")
    main(["train", "--dataset", ds, "--out-dir", train_dir, "--model", "scan_k3",
          "--epochs", "1", "--num-shots", "2", "--quiet"])
    out = json.loads(capfd.readouterr().out.strip().splitlines()[-1])
    assert np.isfinite(out["val_loss"]) and out["t_pred"] > 0
    for artifact in ["model", "ex_specs.png", "val_loss.png", "val_loss.txt",
                     "t_pred.txt", "metrics.jsonl"]:
        assert os.path.exists(os.path.join(train_dir, artifact)), artifact

    den_dir = str(workspace / "denoise")
    main(["denoise", "--dataset", ds, "--out-dir", den_dir])
    assert os.path.exists(os.path.join(den_dir, "svd_compare.png"))
    assert os.path.exists(os.path.join(den_dir, "svd_denoised.npy"))


def test_resume_skips_done(workspace, capfd):
    _ensure_dataset(workspace, capfd)
    raw = str(workspace / "raw")
    ds = str(workspace / "data.hdf5")
    main(["build-data", "--data-dir", raw, "--out", ds, "--channels", "2",
          "--cut-shot", "0.1", "--quiet"])
    out = json.loads(capfd.readouterr().out.strip().splitlines()[-1])
    assert out == {"done": 0, "skipped": 2, "failed": 0}


def test_train_trace_dir_writes_profile(workspace, capfd):
    """--trace-dir: the xprof device trace actually lands on disk (the
    round-2 'profile_trace has zero callers' gap)."""
    import glob
    _ensure_dataset(workspace, capfd)

    ds = str(workspace / "data.hdf5")
    train_dir = str(workspace / "train_traced")
    trace_dir = str(workspace / "xprof")
    main(["train", "--dataset", ds, "--out-dir", train_dir, "--epochs", "1",
          "--num-shots", "2", "--trace-dir", trace_dir, "--quiet"])
    capfd.readouterr()
    assert glob.glob(os.path.join(trace_dir, "**", "*.xplane.pb"), recursive=True), (
        "no xplane trace written"
    )


def test_train_streamed_cli(workspace, capfd):
    """--stream always: the host-streamed epoch produces the same artifact
    set as the resident path (the 200-shot-recipe mechanism, scaled down)."""
    _ensure_dataset(workspace, capfd)
    ds = str(workspace / "data.hdf5")
    train_dir = str(workspace / "train_stream")
    main(["train", "--dataset", ds, "--out-dir", train_dir, "--model", "scan_k3",
          "--epochs", "1", "--num-shots", "2", "--stream", "always", "--quiet"])
    out = json.loads(capfd.readouterr().out.strip().splitlines()[-1])
    assert np.isfinite(out["val_loss"]) and out["t_pred"] > 0
    for artifact in ["model", "ex_specs.png", "val_loss.png", "metrics.jsonl"]:
        assert os.path.exists(os.path.join(train_dir, artifact)), artifact
    with open(os.path.join(train_dir, "metrics.jsonl")) as fh:
        assert json.loads(fh.readline())["streamed"] is True


def test_sweep_cli_kernel_grid(workspace, capfd):
    """The reference kernel array sweep from the CLI: artifacts +
    production-path pred_times per config."""
    _ensure_dataset(workspace, capfd)
    ds = str(workspace / "data.hdf5")
    out = str(workspace / "sweep")
    main(["sweep", "--dataset", ds, "--out-dir", out, "--grid", "kernel",
          "--epochs", "1", "--num-shots", "2", "--quiet"])
    rec = json.loads(capfd.readouterr().out.strip().splitlines()[-1])
    assert rec["n_configs"] == 3 and np.isfinite(rec["best_val_loss"])
    lc = np.load(os.path.join(out, "loss_comparisons.npz"))
    assert set(lc.files) == {"kernel_loss", "kernel_time"}
    assert (lc["kernel_time"] > 0).all()  # production-path timing ran
    assert os.path.exists(os.path.join(out, "best_model"))
    assert os.path.exists(os.path.join(out, "val_losses.npy"))


def test_sweep_cli_3layer_grid_axes(workspace, capfd):
    """--grid 3layer uses the manual_scan_3layers.py axes, and the CLI
    axis flags override them (tiny custom grid end-to-end)."""
    _ensure_dataset(workspace, capfd)
    ds = str(workspace / "data.hdf5")
    out = str(workspace / "sweep3")
    main(["sweep", "--dataset", ds, "--out-dir", out, "--grid", "3layer",
          "--ker", "3", "--conv1", "4", "--conv2", "4,8", "--conv3", "4",
          "--epochs", "1", "--num-shots", "2", "--no-time-configs",
          "--quiet"])
    rec = json.loads(capfd.readouterr().out.strip().splitlines()[-1])
    assert rec["n_configs"] == 2 and np.isfinite(rec["best_val_loss"])
    lc = np.load(os.path.join(out, "loss_comparisons.npz"))
    # axis names follow manual_scan_3layers.py's val_losses tensor
    assert set(lc.files) == {"ker_loss", "ker_time", "conv1_loss",
                             "conv1_time", "conv2_loss", "conv2_time",
                             "conv3_loss", "conv3_time"}
    assert np.load(os.path.join(out, "val_losses.npy")).shape == (1, 1, 2, 1)


def test_train_raw_device_resident(workspace, capfd):
    _ensure_dataset(workspace, capfd)
    raw = str(workspace / "raw")
    out = str(workspace / "train_raw")
    main(["train-raw", "--data-dir", raw, "--out-dir", out, "--channels", "2",
          "--cut-shot", "0.1", "--epochs", "1", "--quiet"])
    rec = json.loads(capfd.readouterr().out.strip().splitlines()[-1])
    assert np.isfinite(rec["val_loss"]) and rec["channels"] == 4
    assert os.path.exists(os.path.join(out, "model"))


def test_train_raw_kernel_engine(workspace, capfd):
    """train-raw --engine kernel: the device-resident fast path on the
    fused Pallas trainer (interpret shim on CPU)."""
    _ensure_dataset(workspace, capfd)
    raw = str(workspace / "raw")
    out = str(workspace / "train_raw_kernel")
    main(["train-raw", "--data-dir", raw, "--out-dir", out, "--channels", "2",
          "--cut-shot", "0.1", "--epochs", "1", "--engine", "kernel",
          "--quiet"])
    rec = json.loads(capfd.readouterr().out.strip().splitlines()[-1])
    assert np.isfinite(rec["val_loss"]) and rec["channels"] == 4
    assert os.path.exists(os.path.join(out, "model"))

def test_sweep_stray_axis_flag_errors(workspace, capfd):
    """An axis flag the selected grid never reads must error up front, not
    silently run the default grid (round-3 review)."""
    _ensure_dataset(workspace, capfd)
    ds = str(workspace / "data.hdf5")
    with pytest.raises(SystemExit, match="--conv1.*--grid kernel"):
        main(["sweep", "--dataset", ds, "--out-dir", str(workspace / "x"),
              "--grid", "kernel", "--conv1", "16,32", "--epochs", "1",
              "--num-shots", "2", "--quiet"])
    with pytest.raises(SystemExit, match="--kernel-vals"):
        main(["sweep", "--dataset", ds, "--out-dir", str(workspace / "x"),
              "--grid", "2layer", "--kernel-vals", "3,5", "--epochs", "1",
              "--num-shots", "2", "--quiet"])


def test_build_data_writers_without_binary_errors(workspace):
    """--writers on the non-streaming (pickle) path must error up front,
    not silently run single-writer (same policy as sweep's stray axes)."""
    with pytest.raises(SystemExit, match="--writers.*--binary"):
        main(["build-data", "--data-dir", str(workspace),
              "--out", str(workspace / "d.hdf5"), "--writers", "4"])


def test_train_stream_devices_shards_chunks(workspace, capfd):
    """--stream always + --devices N: each streamed chunk is sharded over
    a ('data',) mesh (the beyond-aggregate-HBM campaign path)."""
    _ensure_dataset(workspace, capfd)
    ds = str(workspace / "data.hdf5")
    train_dir = str(workspace / "train_stream_dev")
    main(["train", "--dataset", ds, "--out-dir", train_dir, "--model",
          "scan_k3", "--epochs", "1", "--num-shots", "2", "--stream",
          "always", "--devices", "2"])
    out = capfd.readouterr().out
    assert "streaming chunks sharded over 2 devices" in out
    assert np.isfinite(json.loads(out.strip().splitlines()[-1])["val_loss"])
    with open(os.path.join(train_dir, "metrics.jsonl")) as fh:
        first = json.loads(fh.readline())
    assert first["streamed"] is True and first["devices"] == 2

def test_train_kernel_devices_cli(workspace, capfd):
    """train --engine kernel --devices 2: the data-parallel fused-kernel
    engine (shard_map + gradient psum) end-to-end from the CLI."""
    _ensure_dataset(workspace, capfd)
    ds = str(workspace / "data.hdf5")
    train_dir = str(workspace / "train_dp_kernel")
    main(["train", "--dataset", ds, "--out-dir", train_dir, "--model",
          "scan_k3", "--epochs", "1", "--num-shots", "2", "--devices", "2",
          "--engine", "kernel", "--quiet"])
    out = json.loads(capfd.readouterr().out.strip().splitlines()[-1])
    assert np.isfinite(out["val_loss"]) and out["t_pred"] > 0
    with open(os.path.join(train_dir, "metrics.jsonl")) as fh:
        assert json.loads(fh.readline())["devices"] == 2


def test_train_devices_cli(workspace, capfd):
    """train --devices 2: the dp_fit branch end-to-end — artifacts,
    metrics.jsonl (now passed through, round-3 review), checkpoints, and a
    resume that reports already-complete."""
    _ensure_dataset(workspace, capfd)
    ds = str(workspace / "data.hdf5")
    train_dir = str(workspace / "train_dp")
    argv = ["train", "--dataset", ds, "--out-dir", train_dir, "--model",
            "scan_k3", "--epochs", "1", "--num-shots", "2", "--devices", "2",
            "--checkpoints", "--quiet"]
    main(argv)
    out = json.loads(capfd.readouterr().out.strip().splitlines()[-1])
    assert np.isfinite(out["val_loss"]) and out["t_pred"] > 0
    for artifact in ["model", "metrics.jsonl", "checkpoints", "val_loss.png"]:
        assert os.path.exists(os.path.join(train_dir, artifact)), artifact
    with open(os.path.join(train_dir, "metrics.jsonl")) as fh:
        assert json.loads(fh.readline())["devices"] == 2
    # resume of a finished run: no retraining, explicit report
    main(argv + ["--resume"])
    out2 = capfd.readouterr().out.strip().splitlines()[-1]
    assert json.loads(out2) == {"resumed": "already complete"}


def test_train_recipe_knobs_cli(workspace, capfd):
    """Round-3 verdict #4: --split-by/--batch-size/--lr/--patience are
    reachable from `specenh train` (the reference user edits script
    constants, hyperparam_scan.py:176-184; dataset.ipynb cell 3 split)."""
    raw4 = str(workspace / "raw4")
    ds4 = str(workspace / "data4.hdf5")
    main(["synth-shots", "--out", raw4, "--shots", "4", "--channels", "2",
          "--samples", "50000", "--seed", "2"])
    main(["build-data", "--data-dir", raw4, "--out", ds4, "--channels", "2",
          "--cut-shot", "0.1", "--quiet"])
    capfd.readouterr()
    train_dir = str(workspace / "train_knobs")
    main(["train", "--dataset", ds4, "--out-dir", train_dir,
          "--epochs", "6", "--num-shots", "4", "--split-by", "shot",
          "--batch-size", "4", "--lr", "0.0", "--patience", "1", "--quiet"])
    out = json.loads(capfd.readouterr().out.strip().splitlines()[-1])
    assert np.isfinite(out["val_loss"])
    # lr=0 + patience=1 -> early stop after 2 epochs, visible in metrics
    with open(os.path.join(train_dir, "metrics.jsonl")) as fh:
        lines = fh.read().strip().splitlines()
    assert len(lines) == 2, lines


def test_train_chunk_tiles_on_resident_errors(workspace, capfd):
    """--chunk-tiles on a resident (non-streamed) run is a SystemExit per
    the stray-flag policy, and is honored when streaming is forced."""
    ds = _ensure_dataset(workspace, capfd)
    with pytest.raises(SystemExit, match="streamed epoch only"):
        main(["train", "--dataset", ds, "--out-dir",
              str(workspace / "t_ct"), "--epochs", "1", "--num-shots", "2",
              "--chunk-tiles", "8", "--quiet"])
    main(["train", "--dataset", ds, "--out-dir", str(workspace / "t_ct2"),
          "--epochs", "1", "--num-shots", "2", "--stream", "always",
          "--chunk-tiles", "64", "--quiet"])
    out = json.loads(capfd.readouterr().out.strip().splitlines()[-1])
    assert np.isfinite(out["val_loss"])


def test_sweep_streamed_cli(workspace, capfd):
    """sweep --stream always --engine kernel: the beyond-HBM grid path
    (per-config fit_streaming + tile cache) produces the standard sweep
    artifact set; envelope+stream and stray stream flags are errors."""
    ds = _ensure_dataset(workspace, capfd)
    out = str(workspace / "sweep_streamed")
    main(["sweep", "--dataset", ds, "--out-dir", out, "--grid", "kernel",
          "--kernel-vals", "3", "--epochs", "1", "--num-shots", "2",
          "--stream", "always", "--engine", "kernel",
          "--tile-cache", str(workspace / "sweep_tc"), "--quiet"])
    res = json.loads(capfd.readouterr().out.strip().splitlines()[-1])
    assert res["n_configs"] == 1 and np.isfinite(res["best_val_loss"])
    for artifact in ["val_losses.npy", "loss_comparisons.npz", "best_model"]:
        assert os.path.exists(os.path.join(out, artifact)), artifact
    assert os.path.exists(str(workspace / "sweep_tc") + ".train.tiles")

    with pytest.raises(SystemExit, match="--engine kernel"):
        main(["sweep", "--dataset", ds, "--out-dir", out, "--grid", "kernel",
              "--epochs", "1", "--num-shots", "2", "--stream", "always",
              "--quiet"])
    with pytest.raises(SystemExit, match="streamed sweep only"):
        main(["sweep", "--dataset", ds, "--out-dir", out, "--grid", "kernel",
              "--epochs", "1", "--num-shots", "2", "--engine", "kernel",
              "--tile-cache", "/tmp/x", "--quiet"])


def test_train_tile_cache_artifacts_zero_data_reads(workspace, capfd, monkeypatch):
    """Round-4 verdict: with --tile-cache the SECOND run's whole journey —
    training AND the artifact stage (x_test sample, ex_specs, t_pred,
    plot_chn) — does zero HDF5 *data* reads (only KB-scale f/t axes and
    shape metadata come from the store)."""
    ds = _ensure_dataset(workspace, capfd)
    from specenh.io.store import SpectrogramStore

    base = str(workspace / "tc_train")
    main(["train", "--dataset", ds, "--out-dir", str(workspace / "t_tc1"),
          "--epochs", "1", "--num-shots", "2", "--stream", "always",
          "--tile-cache", base, "--quiet"])
    capfd.readouterr()
    # the artifact-stage caches exist alongside the train/tune ones
    for split in ("train", "tune", "test", "bench"):
        assert os.path.exists(f"{base}.{split}.tiles"), split

    reads = {"n": 0}
    for name in ("read_column_slice", "read_channel", "read_spec_and_labels"):
        orig = getattr(SpectrogramStore, name)

        def counting(self, *a, _o=orig, **k):
            reads["n"] += 1
            return _o(self, *a, **k)

        monkeypatch.setattr(SpectrogramStore, name, counting)
    main(["train", "--dataset", ds, "--out-dir", str(workspace / "t_tc2"),
          "--epochs", "1", "--num-shots", "2", "--stream", "always",
          "--tile-cache", base, "--quiet"])
    out = json.loads(capfd.readouterr().out.strip().splitlines()[-1])
    assert np.isfinite(out["val_loss"]) and out["t_pred"] > 0
    assert reads["n"] == 0, f"second run still read store data {reads['n']}x"
