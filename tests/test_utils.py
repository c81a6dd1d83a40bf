"""Tests for observability utilities, metrics, cv probe, multihost helpers."""

import json

import numpy as np
import pytest

from specenh.parallel.multihost import host_shard, merge_stores
from specenh.utils.logging import MetricsLogger, SpanTimer, nan_guard, span
from specenh.utils.metrics import psnr, ssim

try:
    import cv2

    HAS_CV2 = True
except Exception:
    HAS_CV2 = False


def test_metrics_logger_jsonl(tmp_path):
    p = str(tmp_path / "m.jsonl")
    with MetricsLogger(p) as log:
        log.log("epoch", loss=0.5, epoch=1)
        log.log("span", name="stft", seconds=0.01)
    lines = [json.loads(l) for l in open(p)]
    assert lines[0]["event"] == "epoch" and lines[0]["loss"] == 0.5
    assert "time" in lines[1]


def test_span_timer():
    t = SpanTimer()
    with t("a"):
        pass
    with t("a"):
        pass
    with t("b"):
        pass
    rep = t.report()
    assert rep["a"]["count"] == 2 and rep["b"]["count"] == 1
    assert rep["a"]["total_s"] >= 0


def test_span_logs(tmp_path):
    p = str(tmp_path / "s.jsonl")
    with MetricsLogger(p) as log:
        with span("work", log):
            pass
    rec = json.loads(open(p).read())
    assert rec["name"] == "work" and rec["seconds"] >= 0


def test_nan_guard_catches_nan():
    import jax
    import jax.numpy as jnp

    with nan_guard():
        with pytest.raises(FloatingPointError):
            jax.jit(lambda x: jnp.log(x))(jnp.asarray(-1.0)) + 1
    # disabled again afterwards
    assert not jax.config.jax_debug_nans


def test_ssim_psnr_sanity():
    rng = np.random.default_rng(0)
    a = rng.random((64, 64))
    assert ssim(a, a) == pytest.approx(1.0)
    assert psnr(a, a) == np.inf
    noisy = np.clip(a + 0.2 * rng.standard_normal(a.shape), 0, 1)
    assert 0 < ssim(a, noisy) < 0.9
    assert psnr(a, noisy) < 20


@pytest.mark.skipif(not HAS_CV2, reason="cv2 not available")
def test_cv_probe_recovers_baked_tables():
    from specenh.ops.enhance import opencv_gauss_kernel_q88
    from specenh.utils.cv_probe import probe_gaussian_q88

    for ks in (31, 3):
        probed = probe_gaussian_q88(ks)
        np.testing.assert_array_equal(probed, opencv_gauss_kernel_q88(ks).astype(np.int64))


def test_host_shard_partitions():
    items = list(range(10))
    shards = [host_shard(items, pid, 3) for pid in range(3)]
    assert sorted(sum(shards, [])) == items
    assert shards[0] == [0, 3, 6, 9]


def test_merge_stores(tmp_path):
    from specenh.io.store import SpectrogramStore

    parts = []
    for pid in range(2):
        p = str(tmp_path / f"part{pid}.hdf5")
        with SpectrogramStore(p) as s:
            arr = np.full((4, 4), float(pid))
            s.write_channel(str(pid), 1, arr, arr[0], arr[0], arr)
        parts.append(p)
    out = str(tmp_path / "merged.hdf5")
    n = merge_stores(out, parts)
    assert n == 2
    with SpectrogramStore(out, "r") as s:
        assert sorted(s.shots()) == ["ece_0", "ece_1"]
        assert s.read_channel("ece_1", 1)["spec"][0, 0] == 1.0
