"""Device-resident campaign path (specenh.e2e).

Covers the split semantics that VAE/hyperparam_scan.py:148-149 (leaky
tile-level split, the reference default) and dataset.ipynb cell 3
(leak-free shot-level split) define.
"""

import numpy as np
import pytest

from specenh import e2e
from specenh.config import Config, ModelConfig, SpecParams, TrainConfig


@pytest.fixture(scope="module")
def tiny_cfg():
    return Config(spec=SpecParams(cut_shot=0.2))  # 389 frames -> 3 tiles/trace


def _traces(n_ch, sp):
    rng = np.random.default_rng(0)
    t = np.arange(sp.n_samples) / sp.fs
    return np.stack(
        [
            np.sin(2 * np.pi * (5e4 + 2e4 * t) * t + k)
            + 0.5 * rng.standard_normal(t.size)
            for k in range(n_ch)
        ]
    ).astype(np.float32)


@pytest.mark.parametrize(
    "split_by,want_train,want_tune",
    [
        ("tile", 5, 2),  # int(9*0.6)=5, int(9*0.85)=7 -> tune 2 (leaky quirk)
        ("shot", 3, 3),  # int(3*0.6)=1 trace *3 tiles, int(3*0.85)=2 traces
    ],
)
def test_train_from_raw_split_semantics(
    monkeypatch, tiny_cfg, split_by, want_train, want_tune
):
    captured = {}

    def fake_fit(state, xt, yt, xv, yv, *a, **k):
        captured["train"], captured["tune"] = xt.shape[0], xv.shape[0]
        return state, {"val_loss": [0.0]}

    monkeypatch.setattr(e2e, "fit", fake_fit)
    traces = _traces(3, tiny_cfg.spec)
    e2e.train_from_raw(
        traces, tiny_cfg, ModelConfig(), TrainConfig(split_by=split_by)
    )
    assert captured["train"] == want_train
    assert captured["tune"] == want_tune


def test_train_from_raw_shot_split_no_straddle(monkeypatch, tiny_cfg):
    """With split_by='shot' the train/tune boundary must fall at a
    trace-multiple of the per-trace tile count: tiles from one trace carry
    identical content markers and must not appear on both sides."""
    marker = {}

    def fake_fit(state, xt, yt, xv, yv, *a, **k):
        marker["xt"], marker["xv"] = np.asarray(xt), np.asarray(xv)
        return state, {"val_loss": [0.0]}

    monkeypatch.setattr(e2e, "fit", fake_fit)
    traces = _traces(3, tiny_cfg.spec)
    x, _ = e2e.prepare_tiles_on_device(traces, tiny_cfg)
    k_tiles = x.shape[0] // traces.shape[0]
    e2e.train_from_raw(traces, tiny_cfg, ModelConfig(), TrainConfig(split_by="shot"))
    assert marker["xt"].shape[0] % k_tiles == 0
    assert marker["xv"].shape[0] % k_tiles == 0


def test_train_from_raw_multichannel_shots_never_straddle(monkeypatch, tiny_cfg):
    """channels_per_shot: all channels of one physical shot land on the
    same side of every split (the round-2 gap: the raw path split at
    TRACE granularity under the 'shot' flag)."""
    marker = {}

    def fake_fit(state, xt, yt, xv, yv, *a, **k):
        marker["xt"], marker["xv"] = np.asarray(xt), np.asarray(xv)
        return state, {"val_loss": [0.0]}

    monkeypatch.setattr(e2e, "fit", fake_fit)
    # 5 shots x 2 channels; shot s's channels carry a constant marker s
    sp = tiny_cfg.spec
    base = _traces(1, sp)[0]
    traces = np.stack([base * (1 + 0.1 * s) for s in range(5) for _ in range(2)])
    x, _ = e2e.prepare_tiles_on_device(traces, tiny_cfg)
    tiles_per_shot = 2 * (x.shape[0] // traces.shape[0])
    e2e.train_from_raw(
        traces, tiny_cfg, ModelConfig(), TrainConfig(split_by="shot"),
        channels_per_shot=2,
    )
    # int(5*0.6)=3 shots train, int(5*0.85)=4 -> 1 shot tune
    assert marker["xt"].shape[0] == 3 * tiles_per_shot
    assert marker["xv"].shape[0] == 1 * tiles_per_shot

    with pytest.raises(ValueError, match="group into shots"):
        e2e.train_from_raw(
            traces[:9], tiny_cfg, ModelConfig(), TrainConfig(split_by="shot"),
            channels_per_shot=2,
        )


def test_train_from_raw_smoke(tiny_cfg):
    """One real epoch end-to-end on a tiny model: finite, decreasing-ish loss."""
    traces = _traces(3, tiny_cfg.spec)
    state, hist = e2e.train_from_raw(
        traces,
        tiny_cfg,
        ModelConfig(filters=(4, 4)),
        TrainConfig(epochs=2, batch_size=4, split_by="shot"),
    )
    assert np.isfinite(hist["val_loss"]).all()


def test_train_from_raw_mesh_uneven_channels_raises(tiny_cfg):
    """mesh= with a channel count that does not divide the mesh refuses
    with the arithmetic spelled out (padding would train on synthetic
    all-zero channels) instead of JAX's opaque uneven-sharding error."""
    import jax

    from specenh.parallel.mesh import make_mesh

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    traces = _traces(6, tiny_cfg.spec)  # 6 channels over 8 devices
    with pytest.raises(ValueError, match="divide over the 8-device mesh"):
        e2e.train_from_raw(
            traces, tiny_cfg, ModelConfig(filters=(4, 4)),
            TrainConfig(epochs=1, batch_size=4),
            mesh=make_mesh(8, ("data",)),
        )
