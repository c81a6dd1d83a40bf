"""Tests for the vmapped masked-envelope hyperparameter sweep
(specenh.sweep) against standalone training."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from specenh.config import ModelConfig, SweepConfig, TrainConfig
from specenh.models.autoencoder import make_model
from specenh.sweep import (
    envelope_config,
    expand_grid_2layer,
    expand_grid_3layer,
    extract_config_params,
    init_stacked_params,
    marginal_report,
    sweep_fit,
)

SMALL = (64, 32, 1)


def _data(n=24, seed=0):
    rng = np.random.default_rng(seed)
    x = rng.random((n, *SMALL)).astype(np.float32)
    y = (x > 0.5).astype(np.float32)
    return x, y


def test_grid_expansion_shapes():
    sw = SweepConfig(
        ker1_vals=((3, 3), (5, 5)), ker2_vals=((3, 3),), ker3_vals=((3, 3),),
        conv1_vals=(8, 16), conv2_vals=(8,),
    )
    cfgs, shape = expand_grid_2layer(sw)
    assert shape == (2, 1, 1, 2, 1) and len(cfgs) == 4
    cfgs3, shape3 = expand_grid_3layer(
        SweepConfig(ker_vals_3layer=((3, 3),), conv1_vals_3layer=(4,),
                    conv2_vals_3layer=(4, 8), conv3_vals_3layer=(4,))
    )
    assert shape3 == (1, 1, 2, 1) and len(cfgs3) == 2
    assert cfgs3[0].depth == 3


def test_default_3layer_grid_is_reference_scan():
    # manual_scan_3layers.py:119-123 ships ker=[(5,5)], convs 16/32/64 —
    # the deep3 preset — NOT the 2-layer manual scan's 64/32 filters
    cfgs, shape = expand_grid_3layer(SweepConfig())
    assert shape == (1, 1, 1, 1) and len(cfgs) == 1
    assert cfgs[0].filters == (16, 32, 64)
    assert cfgs[0].kernels == ((5, 5),) * 3 and cfgs[0].out_kernel == (5, 5)


def test_envelope_is_max():
    cfgs = [
        ModelConfig(filters=(8, 4), kernels=((3, 3), (5, 5)), out_kernel=(3, 3), input_shape=SMALL),
        ModelConfig(filters=(4, 8), kernels=((7, 7), (3, 3)), out_kernel=(5, 5), input_shape=SMALL),
    ]
    env = envelope_config(cfgs)
    assert env.filters == (8, 8)
    assert env.kernels == ((7, 7), (5, 5))
    assert env.out_kernel == (5, 5)


def test_masked_forward_equals_standalone():
    """A config embedded in the envelope must compute exactly the same
    function as the standalone model with the cropped params."""
    cfgs = [
        ModelConfig(filters=(4, 8), kernels=((3, 3), (3, 3)), out_kernel=(3, 3), input_shape=SMALL),
        ModelConfig(filters=(8, 8), kernels=((5, 5), (5, 5)), out_kernel=(5, 5), input_shape=SMALL),
    ]
    env = envelope_config(cfgs)
    stacked, masks = init_stacked_params(cfgs, env, seed=3)
    x, _ = _data(4)
    env_model = make_model(env)
    for i, cfg in enumerate(cfgs):
        p_i = jax.tree_util.tree_map(lambda a: a[i], stacked)
        m_i = jax.tree_util.tree_map(lambda a: a[i], masks)
        masked = jax.tree_util.tree_map(lambda a, b: a * b, p_i, m_i)
        out_env = env_model.apply(masked, jnp.asarray(x))
        small = extract_config_params(stacked, i, cfg, env)
        out_small = make_model(cfg).apply(small, jnp.asarray(x))
        np.testing.assert_allclose(np.asarray(out_env), np.asarray(out_small), atol=2e-6)


def test_sweep_trains_and_selects_best():
    cfgs = [
        ModelConfig(filters=(4, 4), kernels=((3, 3), (3, 3)), out_kernel=(3, 3), input_shape=SMALL),
        ModelConfig(filters=(8, 8), kernels=((5, 5), (5, 5)), out_kernel=(5, 5), input_shape=SMALL),
    ]
    x, y = _data(32)
    res = sweep_fit(cfgs, x[:24], y[:24], x[24:], y[24:],
                    TrainConfig(batch_size=8, seed=0), epochs=3)
    assert res.val_history.shape == (3, 2)
    # every config's loss decreased
    assert (res.val_history[-1] < res.val_history[0]).all()
    assert res.best_index == int(np.argmin(res.val_losses))
    # best_params usable standalone
    out = make_model(cfgs[res.best_index]).apply(res.best_params, jnp.asarray(x[:2]))
    assert out.shape == (2, *SMALL)


def test_sweep_matches_standalone_training():
    """Training a config inside the masked sweep must track standalone
    training of the same init (gradient masking => identical trajectory)."""
    cfg = ModelConfig(filters=(4, 4), kernels=((3, 3), (3, 3)), out_kernel=(3, 3), input_shape=SMALL)
    big = ModelConfig(filters=(8, 8), kernels=((5, 5), (5, 5)), out_kernel=(5, 5), input_shape=SMALL)
    x, y = _data(16, seed=1)
    tc = TrainConfig(batch_size=16, seed=0, shuffle=False)
    res = sweep_fit([cfg, big], x, y, x, y, tc, epochs=3)

    # standalone: same init (extract epoch-0 params by re-initialising)
    env = envelope_config([cfg, big])
    stacked, masks = init_stacked_params([cfg, big], env, seed=tc.seed)
    p0 = extract_config_params(stacked, 0, cfg, env)
    import optax
    from specenh.train import bce_from_logits

    model = make_model(cfg)
    tx = optax.adam(tc.learning_rate, b1=tc.beta1, b2=tc.beta2, eps=tc.adam_eps)
    opt = tx.init(p0)
    p = p0
    losses = []
    for _ in range(3):
        def loss_fn(pp):
            return bce_from_logits(model.apply(pp, jnp.asarray(x), logits=True), jnp.asarray(y))
        loss, g = jax.value_and_grad(loss_fn)(p)
        up, opt = tx.update(g, opt, p)
        p = optax.apply_updates(p, up)
        # validation loss after the step, matching sweep_fit's bookkeeping
        losses.append(float(bce_from_logits(model.apply(p, jnp.asarray(x), logits=True), jnp.asarray(y))))
    np.testing.assert_allclose(res.val_history[:, 0], losses, atol=1e-5)


def test_embed_extract_roundtrip():
    """embed_config_params is the exact inverse of extract_config_params."""
    from specenh.sweep import embed_config_params

    cfgs = [
        ModelConfig(filters=(4, 8), kernels=((3, 3), (3, 3)), out_kernel=(3, 3), input_shape=SMALL),
        ModelConfig(filters=(8, 8), kernels=((5, 5), (5, 5)), out_kernel=(5, 5), input_shape=SMALL),
    ]
    env = envelope_config(cfgs)
    stacked, _ = init_stacked_params(cfgs, env, seed=4)
    rng = np.random.default_rng(6)
    small = jax.tree_util.tree_map(
        lambda a: jnp.asarray(rng.standard_normal(a.shape), jnp.float32),
        extract_config_params(stacked, 0, cfgs[0], env),
    )
    stacked2 = embed_config_params(stacked, 0, cfgs[0], env, small)
    back = extract_config_params(stacked2, 0, cfgs[0], env)
    for a, b in zip(jax.tree_util.tree_leaves(small),
                    jax.tree_util.tree_leaves(back)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # config 1 untouched
    for a, b in zip(
        jax.tree_util.tree_leaves(extract_config_params(stacked, 1, cfgs[1], env)),
        jax.tree_util.tree_leaves(extract_config_params(stacked2, 1, cfgs[1], env)),
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_serial_sweep_matches_envelope():
    """sweep_fit_serial (per-config fits, Flax fallback at this tiny
    geometry) must reproduce the envelope sweep's trajectories: same
    per-config glorot init, same shuffle stream, same loss bookkeeping."""
    from specenh.sweep import sweep_fit_serial

    cfgs = [
        ModelConfig(filters=(4, 4), kernels=((3, 3), (3, 3)), out_kernel=(3, 3), input_shape=SMALL),
        ModelConfig(filters=(8, 8), kernels=((5, 5), (5, 5)), out_kernel=(5, 5), input_shape=SMALL),
    ]
    x, y = _data(24)
    xv, yv = _data(8, seed=1)
    tc = TrainConfig(batch_size=8, seed=0)
    res_env = sweep_fit(cfgs, x, y, xv, yv, tc, epochs=3)
    res_ser = sweep_fit_serial(cfgs, x, y, xv, yv, tc, epochs=3)
    np.testing.assert_allclose(
        res_ser.train_history, res_env.train_history, rtol=1e-3, atol=1e-5
    )
    np.testing.assert_allclose(
        res_ser.val_history, res_env.val_history, rtol=1e-3, atol=1e-5
    )
    assert res_ser.best_index == res_env.best_index
    # stacked re-embedding round-trips to the serial finals
    env = res_ser.env
    for i, cfg in enumerate(cfgs):
        got = extract_config_params(res_ser.stacked_params, i, cfg, env)
        fin = (res_ser.best_params if i == res_ser.best_index
               else None)
        if fin is not None:
            for a, b in zip(jax.tree_util.tree_leaves(got),
                            jax.tree_util.tree_leaves(fin)):
                np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                           atol=1e-7)


def test_marginal_report():
    vals = np.arange(12, dtype=np.float64)
    rep = marginal_report(vals, (3, 4), ["a", "b"])
    assert rep["a"].shape == (3, 1) and rep["b"].shape == (4, 1)
    np.testing.assert_allclose(rep["a"][:, 0], vals.reshape(3, 4).mean(1))
    np.testing.assert_allclose(rep["b"][:, 0], vals.reshape(3, 4).mean(0))


def test_sweep_sharded_over_mesh():
    """Config axis sharded over the 8-device mesh — the SLURM-array analog."""
    from specenh.parallel.mesh import make_mesh

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 devices")
    mesh = make_mesh(8, ("sweep",))
    cfgs = [
        ModelConfig(filters=(4, 4), kernels=((k, k), (k, k)), out_kernel=(k, k), input_shape=SMALL)
        for k in (3, 5)
        for _ in range(4)
    ]  # 8 configs, one per device
    x, y = _data(16)
    res = sweep_fit(cfgs, x, y, x, y, TrainConfig(batch_size=16, seed=0),
                    epochs=2, mesh=mesh)
    assert res.val_history.shape == (2, 8)
    assert np.isfinite(res.val_losses).all()


def test_sweep_mesh_pads_uneven_grid():
    """3 configs (the reference kernel grid) on an 8-device sweep mesh:
    the axis is padded with copies of the last config and trimmed from the
    result — losses match the unsharded sweep."""
    from specenh.parallel.mesh import make_mesh

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 devices")
    cfgs = [
        ModelConfig(filters=(4, 4), kernels=((k, k), (k, k)), out_kernel=(k, k), input_shape=SMALL)
        for k in (3, 5, 7)
    ]
    x, y = _data(16)
    tc = TrainConfig(batch_size=16, seed=0)
    res_m = sweep_fit(cfgs, x, y, x, y, tc, epochs=2, mesh=make_mesh(8, ("sweep",)))
    res_s = sweep_fit(cfgs, x, y, x, y, tc, epochs=2)
    assert len(res_m.configs) == 3 and res_m.val_history.shape == (2, 3)
    np.testing.assert_allclose(res_m.val_losses, res_s.val_losses, rtol=1e-4)
    assert res_m.best_index == res_s.best_index


def test_sweep_bf16_dtype_trains():
    cfgs = [
        ModelConfig(filters=(4, 4), kernels=((3, 3), (3, 3)), out_kernel=(3, 3), input_shape=SMALL),
        ModelConfig(filters=(8, 4), kernels=((3, 3), (3, 3)), out_kernel=(3, 3), input_shape=SMALL),
    ]
    x, y = _data(16)
    res = sweep_fit(cfgs, x, y, x, y, TrainConfig(batch_size=16, seed=0),
                    epochs=3, dtype=jnp.bfloat16)
    assert np.isfinite(res.val_losses).all()
    assert (res.train_history[-1] < res.train_history[0]).all()


def test_even_kernels_rejected():
    cfgs = [
        ModelConfig(filters=(4, 4), kernels=((4, 4), (3, 3)), out_kernel=(3, 3), input_shape=SMALL),
        ModelConfig(filters=(4, 4), kernels=((5, 5), (3, 3)), out_kernel=(3, 3), input_shape=SMALL),
    ]
    with pytest.raises(ValueError, match="odd"):
        envelope_config(cfgs)


def test_sweep_resume_matches_uninterrupted(tmp_path):
    """Kill a grid mid-run, resume — final histories and params identical
    to the uninterrupted run (VAE/manual_scan.py:176-252 had no resume)."""
    cfgs = [
        ModelConfig(filters=(4, 4), kernels=((3, 3), (3, 3)), out_kernel=(3, 3), input_shape=SMALL),
        ModelConfig(filters=(8, 8), kernels=((5, 5), (5, 5)), out_kernel=(5, 5), input_shape=SMALL),
    ]
    x, y = _data(32)
    tc = TrainConfig(batch_size=8, seed=0)
    full = sweep_fit(cfgs, x[:24], y[:24], x[24:], y[24:], tc, epochs=4)

    ck = str(tmp_path / "sweepck")
    sweep_fit(cfgs, x[:24], y[:24], x[24:], y[24:], tc, epochs=2,
              checkpoint_dir=ck)  # "crash" after epoch 2
    res = sweep_fit(cfgs, x[:24], y[:24], x[24:], y[24:], tc, epochs=4,
                    checkpoint_dir=ck, resume=True)
    np.testing.assert_allclose(res.val_history, full.val_history, atol=1e-6)
    np.testing.assert_allclose(res.train_history, full.train_history, atol=1e-6)
    for a, b in zip(
        jax.tree_util.tree_leaves(full.stacked_params),
        jax.tree_util.tree_leaves(res.stacked_params),
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_sweep_resume_guards_run_meta(tmp_path):
    """Resuming with a different dataset size must fail loudly (the replayed
    shuffle stream would silently diverge)."""
    cfgs = [
        ModelConfig(filters=(4, 4), kernels=((3, 3), (3, 3)), out_kernel=(3, 3), input_shape=SMALL),
    ]
    x, y = _data(32)
    tc = TrainConfig(batch_size=8, seed=0)
    ck = str(tmp_path / "sweepck")
    sweep_fit(cfgs, x[:24], y[:24], x[24:], y[24:], tc, epochs=1, checkpoint_dir=ck)
    with pytest.raises(ValueError, match="run parameters changed"):
        sweep_fit(cfgs, x[:16], y[:16], x[24:], y[24:], tc, epochs=2,
                  checkpoint_dir=ck, resume=True)


def test_sweep_resume_guards_grid_change(tmp_path):
    """Resuming with a different config GRID (same count, same envelope)
    must fail loudly — shape-compatible slices would otherwise restore
    under the wrong masks and train silently-corrupt trajectories."""
    base = dict(out_kernel=(3, 3), input_shape=SMALL)
    cfgs = [
        ModelConfig(filters=(4, 4), kernels=((3, 3), (3, 3)), **base),
        ModelConfig(filters=(8, 8), kernels=((3, 3), (3, 3)), **base),
    ]
    x, y = _data(32)
    tc = TrainConfig(batch_size=8, seed=0)
    ck = str(tmp_path / "sweepck")
    sweep_fit(cfgs, x[:24], y[:24], x[24:], y[24:], tc, epochs=1, checkpoint_dir=ck)
    with pytest.raises(ValueError, match="run parameters changed"):
        sweep_fit(list(reversed(cfgs)), x[:24], y[:24], x[24:], y[24:], tc,
                  epochs=2, checkpoint_dir=ck, resume=True)


def test_serial_sweep_over_data_mesh():
    """sweep_fit_serial(mesh=('data',)) — each config trains data-parallel
    through dp_fit (Flax fallback at this tiny geometry): histories match
    the single-device serial sweep."""
    from specenh.parallel.mesh import make_mesh
    from specenh.sweep import sweep_fit_serial

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 devices")
    cfgs = [
        ModelConfig(filters=(4, 4), kernels=((3, 3), (3, 3)), out_kernel=(3, 3), input_shape=SMALL),
        ModelConfig(filters=(8, 8), kernels=((5, 5), (5, 5)), out_kernel=(5, 5), input_shape=SMALL),
    ]
    x, y = _data(24)
    xv, yv = _data(8, seed=1)
    tc = TrainConfig(batch_size=8, seed=0)
    res_1 = sweep_fit_serial(cfgs, x, y, xv, yv, tc, epochs=2)
    res_m = sweep_fit_serial(cfgs, x, y, xv, yv, tc, epochs=2,
                             mesh=make_mesh(8, ("data",)))
    np.testing.assert_allclose(res_m.train_history, res_1.train_history,
                               rtol=1e-3, atol=1e-5)
    np.testing.assert_allclose(res_m.val_history, res_1.val_history,
                               rtol=1e-3, atol=1e-5)
    assert res_m.best_index == res_1.best_index
    # final params round-trip the envelope embed identically
    for i, cfg in enumerate(cfgs):
        a = extract_config_params(res_m.stacked_params, i, cfg, res_m.env)
        b = extract_config_params(res_1.stacked_params, i, cfg, res_1.env)
        for la, lb in zip(jax.tree_util.tree_leaves(a),
                          jax.tree_util.tree_leaves(b)):
            np.testing.assert_allclose(np.asarray(la), np.asarray(lb),
                                       rtol=1e-3, atol=1e-5)


def test_serial_sweep_kernel_engine_over_mesh():
    """The `sweep --engine kernel --devices N` path: the per-config fit
    runs the shard_map'd fused train kernel (parallel.dp_kernel) under
    dp_fit — losses match the single-device serial kernel sweep."""
    from specenh.parallel.mesh import make_mesh
    from specenh.sweep import sweep_fit_serial

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 devices")
    cfgs = [ModelConfig()]  # flagship geometry: fused-kernel-covered
    rng = np.random.default_rng(7)
    n = 12  # bs=8 over 8 devices: batch 2 = 4 real + 4 padding tiles
    x = rng.random((n, 256, 128, 1)).astype(np.float32)
    y = (rng.random((n, 256, 128, 1)) > 0.6).astype(np.float32)
    tc = TrainConfig(batch_size=8, seed=0)
    # interpret-mode kernels: force f32 both sides so the comparison is
    # engine-for-engine (the mesh path's CPU shim already picks f32)
    res_1 = sweep_fit_serial(cfgs, x, y, x[:4], y[:4], tc, epochs=1,
                             dtype=jnp.float32)
    res_m = sweep_fit_serial(cfgs, x, y, x[:4], y[:4], tc, epochs=1,
                             dtype=jnp.float32, mesh=make_mesh(8, ("data",)))
    np.testing.assert_allclose(res_m.train_history, res_1.train_history,
                               rtol=1e-4)
    np.testing.assert_allclose(res_m.val_history, res_1.val_history,
                               rtol=1e-4)


def test_sweep_envelope_early_stopping():
    """Envelope sweep stops when EVERY config has gone patience epochs
    without improving its own best val (lr=0: all stale after epoch 0)."""
    from specenh.sweep import sweep_fit

    rng = np.random.default_rng(0)
    x = rng.random((12, 32, 16, 1)).astype(np.float32)
    y = (x > 0.5).astype(np.float32)
    cfgs = [
        ModelConfig(filters=(4, 4), kernels=((3, 3), (3, 3)), input_shape=(32, 16, 1)),
        ModelConfig(filters=(4, 4), kernels=((5, 5), (5, 5)), input_shape=(32, 16, 1)),
    ]
    tc = TrainConfig(batch_size=4, seed=0, learning_rate=0.0, patience=1)
    res = sweep_fit(cfgs, x, y, x[:4], y[:4], tc, epochs=6)
    assert res.val_history.shape[0] == 2  # epoch 0 + one stale epoch


def test_sweep_serial_early_stopping_ragged_histories():
    """Serial engine: per-config patience can stop configs at different
    epochs; histories pad with their final value and stay rectangular."""
    from specenh.sweep import sweep_fit_serial

    rng = np.random.default_rng(1)
    x = rng.random((12, 32, 16, 1)).astype(np.float32)
    y = (x > 0.5).astype(np.float32)
    cfgs = [
        ModelConfig(filters=(4, 4), kernels=((3, 3), (3, 3)), input_shape=(32, 16, 1)),
        ModelConfig(filters=(4, 4), kernels=((5, 5), (5, 5)), input_shape=(32, 16, 1)),
    ]
    tc = TrainConfig(batch_size=4, seed=0, learning_rate=0.0, patience=1)
    res = sweep_fit_serial(cfgs, x, y, x[:4], y[:4], tc, epochs=6, engine="flax")
    assert res.val_history.shape == (2, 2)
    assert np.isfinite(res.val_losses).all()


def test_sweep_serial_streamed_matches_resident(tmp_path):
    """sweep_fit_serial_streamed (the beyond-HBM sweep engine): with
    shuffle=False and chunk >= n each config's trajectory is IDENTICAL to
    the resident serial engine's (fit_streaming's identity contract),
    config for config."""
    from specenh.config import PatchSpec
    from specenh.data.dataset import assemble_from_store
    from specenh.io.store import SpectrogramStore
    from specenh.sweep import sweep_fit_serial, sweep_fit_serial_streamed
    from specenh.train_stream import plan_stream_split

    ps = PatchSpec(tile_freq=32, tile_time=16, step=16, tiles_per_spec=5)
    rng = np.random.default_rng(5)
    store = SpectrogramStore(str(tmp_path / "s.hdf5"))
    for shot in ["201", "202", "203"]:
        for chn in [1, 2]:
            s = rng.random((32, 83)).astype(np.float32)
            store.write_channel(shot, chn, s, np.arange(32.0),
                                np.arange(83.0), s * 0.5)
    cfgs = [
        ModelConfig(filters=(4, 4), kernels=((3, 3), (3, 3)), input_shape=(32, 16, 1)),
        ModelConfig(filters=(4, 4), kernels=((5, 5), (5, 5)), input_shape=(32, 16, 1)),
    ]
    tc = TrainConfig(epochs=3, seed=0, shuffle=False, batch_size=8)
    splits = assemble_from_store(store, num_samples=3, ps=ps, cfg=tc, seed=3)
    splits = splits.reshaped()
    res_res = sweep_fit_serial(
        cfgs, splits.x_train, splits.y_train, splits.x_tune, splits.y_tune,
        tc, epochs=3, engine="flax",
    )
    plan = plan_stream_split(store, num_samples=3, ps=ps, cfg=tc, seed=3)
    res_str = sweep_fit_serial_streamed(
        cfgs, store, plan, tc, epochs=3, engine="flax",
        chunk_tiles=10_000, tile_cache=str(tmp_path / "tc"), ps=ps,
    )
    np.testing.assert_allclose(res_str.val_history, res_res.val_history, rtol=1e-6)
    np.testing.assert_allclose(res_str.val_losses, res_res.val_losses, rtol=1e-6)
    assert res_str.best_index == res_res.best_index
    store.close()


def test_sweep_serial_requires_tune_split(tmp_path):
    """An empty tune split is a clear ValueError, not an IndexError at the
    end of the grid (round-4 advisor finding): val_loss drives model
    selection, so a sweep without one is a config error."""
    from specenh.config import PatchSpec
    from specenh.io.store import SpectrogramStore
    from specenh.sweep import sweep_fit_serial, sweep_fit_serial_streamed
    from specenh.train_stream import StreamPlan, plan_stream_split

    cfgs = [ModelConfig(filters=(4, 4), kernels=((3, 3), (3, 3)),
                        out_kernel=(3, 3), input_shape=SMALL)]
    x, y = _data(8)
    with pytest.raises(ValueError, match="non-empty tune split"):
        sweep_fit_serial(cfgs, x, y, np.zeros((0, *SMALL), np.float32),
                         np.zeros((0, *SMALL), np.float32), TrainConfig())
    with pytest.raises(ValueError, match="non-empty tune split"):
        sweep_fit_serial(cfgs, x, y, None, None, TrainConfig())
    # the default (envelope) engine refuses too, not an IndexError/NaN
    with pytest.raises(ValueError, match="non-empty tune split"):
        sweep_fit(cfgs, x, y, np.zeros((0, *SMALL), np.float32),
                  np.zeros((0, *SMALL), np.float32), TrainConfig())

    ps = PatchSpec(tile_freq=32, tile_time=16, step=16, tiles_per_spec=5)
    store = SpectrogramStore(str(tmp_path / "s.hdf5"))
    s = np.random.default_rng(0).random((32, 83)).astype(np.float32)
    store.write_channel("101", 1, s, np.arange(32.0), np.arange(83.0), s * 0.5)
    plan = plan_stream_split(store, num_samples=1, ps=ps, cfg=TrainConfig(), seed=0)
    empty_tune = StreamPlan(plan.train + plan.tune, [], plan.test, plan.tile_shape)
    with pytest.raises(ValueError, match="non-empty tune split"):
        sweep_fit_serial_streamed(cfgs, store, empty_tune, TrainConfig(), ps=ps)
    store.close()
