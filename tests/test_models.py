"""Model-family tests: architecture parity with the reference Keras models,
training mechanics, persistence, and Keras weight import."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from specenh.config import MODEL_PRESETS, ModelConfig, TrainConfig
from specenh.models.autoencoder import make_model, param_count
from specenh.train import (
    bce_from_logits,
    create_state,
    evaluate,
    fit,
    load_model,
    predict,
    save_model,
    train_step,
)

SMALL = ModelConfig(filters=(4, 4), kernels=((3, 3), (3, 3)), input_shape=(64, 32, 1))


def _keras_param_count(cfg: ModelConfig) -> int:
    """Closed-form Keras parameter count for the reference architecture."""
    total = 0
    cin = cfg.input_shape[-1]
    for f, k in zip(cfg.filters, cfg.kernels):
        total += k[0] * k[1] * cin * f + f
        cin = f
    for i in reversed(range(cfg.depth)):
        f, k = cfg.filters[i], cfg.kernels[i]
        total += k[0] * k[1] * cin * f + f
        cin = f
    total += cfg.out_kernel[0] * cfg.out_kernel[1] * cin * 1 + 1
    return total


@pytest.mark.parametrize("name", ["scan_k3", "scan_k5", "scan_k7", "manual", "deep3", "graphs"])
def test_preset_shapes_and_param_counts(name):
    cfg = MODEL_PRESETS[name]
    model = make_model(cfg)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, *cfg.input_shape)))
    out = model.apply(params, jnp.zeros((2, *cfg.input_shape)))
    assert out.shape == (2, *cfg.input_shape)  # autoencoder preserves shape
    assert param_count(params) == _keras_param_count(cfg)


def test_output_is_sigmoid_bounded():
    model = make_model(SMALL)
    params = model.init(jax.random.PRNGKey(1), jnp.zeros((1, 64, 32, 1)))
    x = jnp.asarray(np.random.default_rng(0).standard_normal((3, 64, 32, 1)), jnp.float32)
    probs = model.apply(params, x)
    assert float(probs.min()) >= 0.0 and float(probs.max()) <= 1.0
    logits = model.apply(params, x, logits=True)
    np.testing.assert_allclose(np.asarray(jax.nn.sigmoid(logits)), np.asarray(probs), atol=1e-6)


def test_bce_matches_definition():
    rng = np.random.default_rng(2)
    logits = jnp.asarray(rng.standard_normal((4, 8)), jnp.float32)
    y = jnp.asarray(rng.random((4, 8)), jnp.float32)
    p = jax.nn.sigmoid(logits)
    want = -np.mean(np.asarray(y) * np.log(np.asarray(p)) + (1 - np.asarray(y)) * np.log(1 - np.asarray(p)))
    got = float(bce_from_logits(logits, y))
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_bce_mask_ignores_padding():
    rng = np.random.default_rng(3)
    logits = jnp.asarray(rng.standard_normal((4, 8)), jnp.float32)
    y = jnp.asarray(rng.random((4, 8)), jnp.float32)
    mask = jnp.asarray([1, 1, 0, 0], jnp.float32)
    got = float(bce_from_logits(logits, y, mask))
    want = float(bce_from_logits(logits[:2], y[:2]))
    np.testing.assert_allclose(got, want, rtol=1e-6)


def test_fit_bf16_activations_learns():
    """create_state(dtype=bfloat16) — the fast-training option — must
    train (loss decreases) and keep float32 params."""
    from specenh.train import create_state, fit

    rng = np.random.default_rng(3)
    x = rng.random((24, 64, 32, 1)).astype(np.float32)
    y = (x > 0.5).astype(np.float32)
    tc = TrainConfig(batch_size=8, seed=1)
    state = create_state(SMALL, tc, dtype=jnp.bfloat16)
    assert all(
        leaf.dtype == jnp.float32
        for leaf in jax.tree_util.tree_leaves(state.params)
    )
    state, hist = fit(state, x, y, cfg=tc, epochs=4)
    assert hist["loss"][-1] < hist["loss"][0]


def test_bf16_trajectory_parity_vs_f32():
    """The gate that makes --bf16 safe: same data/seed, the bf16-activation
    loss trajectory tracks f32 closely (params and Adam state are f32 in
    both; only conv/matmul activations differ)."""
    from specenh.train import create_state, fit

    rng = np.random.default_rng(5)
    x = rng.random((48, 64, 32, 1)).astype(np.float32)
    y = (x > 0.5).astype(np.float32)
    tc = TrainConfig(batch_size=16, seed=2)
    _, h32 = fit(create_state(SMALL, tc), x, y, x[:16], y[:16], tc, epochs=5)
    _, h16 = fit(create_state(SMALL, tc, dtype=jnp.bfloat16), x, y, x[:16], y[:16], tc, epochs=5)
    np.testing.assert_allclose(h32["loss"], h16["loss"], rtol=2e-2)
    np.testing.assert_allclose(h32["val_loss"], h16["val_loss"], rtol=2e-2)


def test_fit_history_and_determinism():
    rng = np.random.default_rng(4)
    x = rng.random((32, 64, 32, 1)).astype(np.float32)
    y = (x > 0.5).astype(np.float32)
    tc = TrainConfig(batch_size=16, seed=7)
    s1, h1 = fit(create_state(SMALL, tc), x, y, x[:8], y[:8], tc, epochs=3)
    s2, h2 = fit(create_state(SMALL, tc), x, y, x[:8], y[:8], tc, epochs=3)
    assert len(h1["loss"]) == 3 and len(h1["val_loss"]) == 3
    np.testing.assert_allclose(h1["loss"], h2["loss"], atol=1e-6)  # seeded => deterministic
    assert h1["loss"][-1] < h1["loss"][0]


def test_predict_matches_apply_and_handles_remainder():
    model = make_model(SMALL)
    state = create_state(SMALL, TrainConfig())
    x = jnp.asarray(np.random.default_rng(5).random((13, 64, 32, 1)), jnp.float32)
    got = np.asarray(predict(state, x, bs=4))  # 3 full + remainder 1
    want = np.asarray(model.apply(state.params, x))
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_save_load_roundtrip(tmp_path):
    state = create_state(SMALL, TrainConfig())
    path = str(tmp_path / "model")
    save_model(state, path, SMALL)
    restored, cfg = load_model(path)
    assert cfg == SMALL
    x = jnp.asarray(np.random.default_rng(6).random((2, 64, 32, 1)), jnp.float32)
    np.testing.assert_allclose(
        np.asarray(predict(restored, x)), np.asarray(predict(state, x)), atol=1e-7
    )


def test_checkpoint_every_epoch(tmp_path):
    rng = np.random.default_rng(7)
    x = rng.random((8, 64, 32, 1)).astype(np.float32)
    y = x
    ckdir = tmp_path / "ck"
    fit(
        create_state(SMALL, TrainConfig(batch_size=8)),
        x, y, cfg=TrainConfig(batch_size=8), epochs=2,
        checkpoint_dir=str(ckdir),
        metrics_path=str(tmp_path / "metrics.jsonl"),
    )
    assert sorted(p.name for p in ckdir.iterdir()) == [
        "epoch_0000", "epoch_0001", "history.json", "run_meta.json",
    ]
    lines = (tmp_path / "metrics.jsonl").read_text().strip().splitlines()
    assert len(lines) == 2


class TestKerasImport:
    @pytest.fixture(scope="class")
    def tf(self):
        return pytest.importorskip("tensorflow")

    def test_forward_parity_with_keras(self, tf):
        """A Keras reference model's weights imported into Flax must produce
        the same predictions — the best_model portability guarantee."""
        from tensorflow.keras import layers
        from tensorflow.keras.models import Model

        from specenh.models.keras_import import (
            model_config_from_keras_weights,
            params_from_keras_weights,
        )

        inp = layers.Input(shape=(64, 32, 1))
        z = layers.Conv2D(8, (3, 3), activation="relu", padding="same")(inp)
        z = layers.MaxPooling2D((2, 2), padding="same")(z)
        z = layers.Conv2D(4, (5, 5), activation="relu", padding="same")(z)
        z = layers.MaxPooling2D((2, 2), padding="same")(z)
        z = layers.Conv2DTranspose(4, (5, 5), strides=2, activation="relu", padding="same")(z)
        z = layers.Conv2DTranspose(8, (3, 3), strides=2, activation="relu", padding="same")(z)
        z = layers.Conv2D(1, (3, 3), activation="sigmoid", padding="same")(z)
        km = Model(inp, z)

        x = np.random.default_rng(0).standard_normal((2, 64, 32, 1)).astype(np.float32)
        want = km.predict(x, verbose=0)

        cfg = model_config_from_keras_weights(km.get_weights(), input_shape=(64, 32, 1))
        assert cfg.filters == (8, 4) and cfg.kernels == ((3, 3), (5, 5))
        params = params_from_keras_weights(km.get_weights(), cfg)
        got = np.asarray(make_model(cfg).apply(params, jnp.asarray(x)))
        np.testing.assert_allclose(got, want, atol=1e-5)


def test_resume_matches_uninterrupted(tmp_path):
    """Crash after epoch 2, resume, finish — final params must equal an
    uninterrupted 4-epoch run (optimizer state + shuffle stream restored)."""
    from specenh.train import fit

    rng = np.random.default_rng(9)
    x = rng.random((24, 64, 32, 1)).astype(np.float32)
    y = (x > 0.5).astype(np.float32)
    tc = TrainConfig(batch_size=8, seed=5)

    full, full_hist = fit(create_state(SMALL, tc), x, y, cfg=tc, epochs=4)

    ck = str(tmp_path / "ck")
    part, _ = fit(create_state(SMALL, tc), x, y, cfg=tc, epochs=2, checkpoint_dir=ck)
    resumed, hist = fit(
        create_state(SMALL, tc), x, y, cfg=tc, epochs=4,
        checkpoint_dir=ck, resume=True,
    )
    # history covers ALL epochs: 0-1 restored from the sidecar, 2-3 run
    assert len(hist["loss"]) == 4
    np.testing.assert_allclose(hist["loss"], full_hist["loss"], atol=1e-6)
    for a, b in zip(
        jax.tree_util.tree_leaves(full.params), jax.tree_util.tree_leaves(resumed.params)
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_resume_guards_run_meta(tmp_path):
    """fit(resume=True) with a changed dataset size / seed must refuse:
    the replayed shuffle stream would not match the original run."""
    from specenh.train import create_state, fit

    rng = np.random.default_rng(0)
    x = rng.random((16, 64, 32, 1)).astype(np.float32)
    y = (x > 0.5).astype(np.float32)
    tc = TrainConfig(batch_size=8, seed=0)
    ck = str(tmp_path / "ck")
    fit(create_state(SMALL, tc), x, y, cfg=tc, epochs=1, checkpoint_dir=ck)
    with pytest.raises(ValueError, match="run parameters changed"):
        fit(create_state(SMALL, tc), x[:8], y[:8], cfg=tc, epochs=2,
            checkpoint_dir=ck, resume=True)


def test_early_stopping_patience():
    """cfg.patience stops fit after N stale val epochs (Keras EarlyStopping
    semantics, manual_scan.py:175).  lr=0 makes every epoch stale."""
    from specenh.train import create_state, fit

    rng = np.random.default_rng(0)
    x = rng.random((16, 64, 32, 1)).astype(np.float32)
    y = (x > 0.5).astype(np.float32)
    tc = TrainConfig(batch_size=8, seed=0, learning_rate=0.0, patience=2)
    _, hist = fit(create_state(SMALL, tc), x, y, x, y, cfg=tc, epochs=10)
    # epoch 0 sets the best; epochs 1-2 are stale -> stop at epoch 2
    assert hist["stopped_epoch"] == 2
    assert len(hist["loss"]) == 3
    # patience=None trains the full budget
    tc = TrainConfig(batch_size=8, seed=0, learning_rate=0.0)
    _, hist = fit(create_state(SMALL, tc), x, y, x, y, cfg=tc, epochs=4)
    assert "stopped_epoch" not in hist and len(hist["loss"]) == 4


def test_kernel_engine_mosaic_fallback():
    """with_flax_fallback: a Mosaic/VMEM compile failure degrades to the
    Flax epoch (identical result, warning emitted, sticky); other errors
    propagate.  Guards the kernel engines' VMEM-cap geometry corners
    (k7/(64,32,64) depth-3 runs at 114.8M of the 125M cap)."""
    import warnings

    import jax.numpy as jnp

    from specenh.train import (
        _epoch_batches,
        create_state,
        train_epoch,
        with_flax_fallback,
    )

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.random((8, 64, 32, 1)), jnp.float32)
    y = jnp.asarray((np.asarray(x) > 0.5), jnp.float32)
    bi, bm = _epoch_batches(8, 4, np.arange(8))
    bi, bm = jnp.asarray(bi), jnp.asarray(bm)
    state = create_state(SMALL, TrainConfig(seed=0))

    calls = {"kernel": 0}

    def mosaic_boom(st, *a):
        calls["kernel"] += 1
        raise RuntimeError(
            "Mosaic failed to compile TPU kernel: requested scoped memory "
            "exceeds VMEM"
        )

    ep = with_flax_fallback(mosaic_boom, train_epoch)
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        st1, l1 = ep(state, x, y, bi, bm)
        assert any("falling back" in str(x.message) for x in w)
    st2, l2 = train_epoch(state, x, y, bi, bm)
    np.testing.assert_allclose(np.asarray(l1), np.asarray(l2), rtol=1e-6)
    # sticky: the second epoch skips the kernel attempt entirely
    ep(st1, x, y, bi, bm)
    assert calls["kernel"] == 1

    def other_boom(st, *a):
        raise RuntimeError("not a compile problem")

    ep2 = with_flax_fallback(other_boom, train_epoch)
    with pytest.raises(RuntimeError, match="not a compile problem"):
        ep2(state, x, y, bi, bm)


def test_early_stopping_resume_does_not_overtrain(tmp_path):
    """A run that early-stopped, resumed with the same args, must train
    ZERO further epochs: history.json records the stop and the resume
    seeds the stale counter past patience (round-4 advisor finding —
    previously each resume trained one extra epoch past the stop)."""
    import json
    import os

    from specenh.train import create_state, fit

    rng = np.random.default_rng(0)
    x = rng.random((16, 64, 32, 1)).astype(np.float32)
    y = (x > 0.5).astype(np.float32)
    tc = TrainConfig(batch_size=8, seed=0, learning_rate=0.0, patience=2)
    ck = str(tmp_path / "ck")
    _, h1 = fit(create_state(SMALL, tc), x, y, x, y, cfg=tc, epochs=10,
                checkpoint_dir=ck)
    assert h1["stopped_epoch"] == 2 and len(h1["loss"]) == 3
    with open(os.path.join(ck, "history.json")) as fh:
        saved = json.load(fh)
    assert saved.get("stopped_epoch") == 2  # the stop IS persisted
    _, h2 = fit(create_state(SMALL, tc), x, y, x, y, cfg=tc, epochs=10,
                checkpoint_dir=ck, resume=True)
    assert h2["new_epochs"] == 0
    assert len(h2["loss"]) == 3  # no extra epoch past the original stop
