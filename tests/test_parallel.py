"""Multi-device tests on the 8-device virtual CPU mesh (conftest.py):
data-parallel training equivalence and halo-exchange time sharding."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from specenh.config import ModelConfig, PipelineConfig, SpecParams, TrainConfig
from specenh.ops.enhance import classical_pipeline
from specenh.ops.stft import spectrogram
from specenh.parallel.data_parallel import dp_fit, make_dp_train_step, shard_batch
from specenh.parallel.mesh import make_mesh
from specenh.parallel.timeshard import (
    sharded_enhance,
    sharded_spectrogram,
    usable_samples,
)
from specenh.train import create_state, train_step
from specenh.utils.metrics import ssim
from tests.conftest import synth_trace

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 (virtual) devices"
)

TINY = ModelConfig(filters=(4, 4), kernels=((3, 3), (3, 3)), input_shape=(64, 32, 1))


@pytest.fixture(scope="module")
def mesh8():
    return make_mesh(8, ("data",))


@pytest.fixture(scope="module")
def tmesh8():
    return make_mesh(8, ("time",))


def test_dp_step_matches_single_device(mesh8):
    rng = np.random.default_rng(0)
    x = rng.random((16, 64, 32, 1)).astype(np.float32)
    y = rng.random((16, 64, 32, 1)).astype(np.float32)
    m = np.ones(16, np.float32)

    s1 = create_state(TINY, TrainConfig(seed=1))
    s1, loss1 = train_step(s1, jnp.asarray(x), jnp.asarray(y), jnp.asarray(m))

    s2 = create_state(TINY, TrainConfig(seed=1))
    step = make_dp_train_step(mesh8)
    xb, yb, mb = shard_batch(mesh8, jnp.asarray(x), jnp.asarray(y), jnp.asarray(m))
    s2, loss2 = step(s2, xb, yb, mb)

    assert abs(float(loss1) - float(loss2)) < 1e-6
    for a, b in zip(jax.tree_util.tree_leaves(s1.params), jax.tree_util.tree_leaves(s2.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_dp_fit_loss_decreases(mesh8):
    rng = np.random.default_rng(1)
    x = rng.random((40, 64, 32, 1)).astype(np.float32)
    y = (x > 0.5).astype(np.float32)
    state = create_state(TINY, TrainConfig(seed=0))
    state, hist = dp_fit(state, x, y, mesh8, epochs=3, batch_size=16)
    assert hist["loss"][-1] < hist["loss"][0]


def test_sharded_spectrogram_matches_unsharded(tmesh8):
    sp = SpecParams(cut_shot=0.2)
    x = synth_trace(sp, seed=5)
    t_use = usable_samples(sp.n_samples, 8, sp)
    xt = jnp.asarray(x[:t_use])
    got = np.asarray(sharded_spectrogram(xt, sp, tmesh8))
    want = np.asarray(spectrogram(xt, SpecParams(cut_shot=t_use / sp.fs)))
    nf = want.shape[-1]
    assert got.shape[-1] == nf + 1  # duplicated final frame
    np.testing.assert_allclose(got[..., :nf], want, atol=5e-5)
    np.testing.assert_allclose(got[..., -1], got[..., -2], atol=0)


def test_sharded_enhance_bitexact(tmesh8):
    sp = SpecParams(cut_shot=0.2)
    x = synth_trace(sp, seed=6)
    t_use = usable_samples(sp.n_samples, 8, sp)
    spec = sharded_spectrogram(jnp.asarray(x[:t_use]), sp, tmesh8)
    want = np.asarray(classical_pipeline(jnp.asarray(spec)))
    got = np.asarray(sharded_enhance(spec, tmesh8, PipelineConfig()))
    # halo exchange is semantically identical to the single-device pipeline;
    # collective reductions reorder float sums, so allow ~1 ulp of noise
    np.testing.assert_allclose(got, want, atol=1e-5)
    assert ssim(got, want) > 0.9999


def test_sharded_enhance_batched(tmesh8):
    sp = SpecParams(cut_shot=0.2)
    xs = synth_trace(sp, seed=7, n_channels=2)
    t_use = usable_samples(sp.n_samples, 8, sp)
    spec = sharded_spectrogram(jnp.asarray(xs[:, :t_use]), sp, tmesh8)
    got = np.asarray(sharded_enhance(spec, tmesh8))
    want = np.asarray(classical_pipeline(jnp.asarray(spec)))
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_sharded_spectrogram_quarter_hop(tmesh8):
    """hop = nperseg/4: the last device's final r-1 = 3 frames lack data and
    must all be copies of the last valid frame (regression: only 1 was)."""
    sp = SpecParams(cut_shot=0.2, noverlap=384)  # hop = 128, r = 4
    x = synth_trace(SpecParams(cut_shot=0.2), seed=8)
    t_use = usable_samples(sp.n_samples, 8, sp)
    got = np.asarray(sharded_spectrogram(jnp.asarray(x[:t_use]), sp, tmesh8))
    want = np.asarray(
        spectrogram(jnp.asarray(x[:t_use]), SpecParams(cut_shot=t_use / sp.fs, noverlap=384))
    )
    nf = want.shape[-1]
    assert got.shape[-1] == nf + 3
    np.testing.assert_allclose(got[..., :nf], want, atol=5e-5)
    for j in range(1, 4):
        np.testing.assert_allclose(got[..., -j], got[..., -4], atol=0)


def test_sharded_enhance_float_path(tmesh8):
    """emulate_uint8=False must select the float blur in the sharded
    pipeline too (regression: flag was ignored)."""
    sp = SpecParams(cut_shot=0.2)
    x = synth_trace(sp, seed=9)
    t_use = usable_samples(sp.n_samples, 8, sp)
    spec = sharded_spectrogram(jnp.asarray(x[:t_use]), sp, tmesh8)
    cfg = PipelineConfig(emulate_uint8=False)
    got = np.asarray(sharded_enhance(spec, tmesh8, cfg))
    want = np.asarray(classical_pipeline(jnp.asarray(spec), cfg))
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_multichip_serving_matches_single(mesh8):
    """The channel-sharded enhance service must equal the single-device one
    (per-channel ops only — no collectives needed)."""
    from specenh.bench.harness import make_enhance_shot_fn
    from specenh.models.autoencoder import make_model

    sp = SpecParams(cut_shot=0.1)  # >= one 128-frame tile
    cfg = ModelConfig()
    params = make_model(cfg).init(jax.random.PRNGKey(0), np.zeros((1, *cfg.input_shape), np.float32))
    rng = np.random.default_rng(12)
    traces = jnp.asarray(rng.standard_normal((8, sp.n_samples)), jnp.float32)
    f1 = make_enhance_shot_fn(cfg, sp, dtype=None)
    fm = make_enhance_shot_fn(cfg, sp, dtype=None, mesh=mesh8)
    s1, e1 = f1(params, traces)
    s2, e2 = fm(params, traces)
    np.testing.assert_allclose(np.asarray(s2), np.asarray(s1), atol=1e-5)
    np.testing.assert_allclose(np.asarray(e2), np.asarray(e1), atol=1e-5)


def test_multichip_serving_kernel_matches_single(mesh8):
    """The fused Pallas kernel service sharded over channels (shard_map)
    must equal the single-device kernel service — every device runs the
    same per-channel program on its block."""
    from specenh.bench.harness import make_enhance_shot_fn
    from specenh.models.autoencoder import make_model

    sp = SpecParams(cut_shot=0.1)
    cfg = ModelConfig()
    params = make_model(cfg).init(
        jax.random.PRNGKey(0), np.zeros((1, *cfg.input_shape), np.float32)
    )
    rng = np.random.default_rng(13)
    traces = jnp.asarray(rng.standard_normal((8, sp.n_samples)), jnp.float32)
    f1 = make_enhance_shot_fn(cfg, sp, use_kernel=True, interpret=True)
    fm = make_enhance_shot_fn(
        cfg, sp, use_kernel=True, interpret=True, mesh=mesh8
    )
    s1, e1 = f1(params, traces)
    s2, e2 = fm(params, traces)
    np.testing.assert_allclose(np.asarray(s2), np.asarray(s1), atol=1e-6)
    np.testing.assert_allclose(np.asarray(e2), np.asarray(e1), atol=1e-6)


def test_composed_long_shot_program(tmesh8):
    """ONE shard_map program: time-sharded STFT -> sharded pipeline ->
    tile-sharded conv-AE -> restitch, vs the same ops unsharded (<=1e-5)."""
    from specenh.bench.harness import make_enhance_shot_fn  # noqa: F401 (geometry ref)
    from specenh.data.tiles import patch, unpatch
    from specenh.models.autoencoder import make_model
    from specenh.parallel.timeshard import (
        make_sharded_enhance_shot,
        usable_samples_tiled,
    )

    sp_full = SpecParams(cut_shot=0.6)
    t_use = usable_samples_tiled(sp_full.n_samples, 8, sp_full)
    sp = SpecParams(cut_shot=t_use / sp_full.fs)
    x = synth_trace(sp_full, seed=11)[:t_use]

    cfg = ModelConfig()  # flagship geometry (256, 128, 1)
    params = make_model(cfg).init(
        jax.random.PRNGKey(2), np.zeros((1, *cfg.input_shape), np.float32)
    )
    fn = make_sharded_enhance_shot(cfg, sp, tmesh8)
    spec, labels, enh = fn(params, jnp.asarray(x))
    spec, labels, enh = np.asarray(spec), np.asarray(labels), np.asarray(enh)

    # unsharded reference on the gathered sharded spectrogram
    want_lab = np.asarray(classical_pipeline(jnp.asarray(spec)))
    k_tiles = spec.shape[-1] // 128
    tiles = patch(jnp.asarray(spec))[..., None]
    pred = make_model(cfg).apply(params, tiles)
    want_enh = np.asarray(unpatch(jnp.squeeze(pred, -1), tiles_per_spec=k_tiles))[0]

    # and the spectrogram itself vs the tested sharded_spectrogram
    want_spec = np.asarray(sharded_spectrogram(jnp.asarray(x), sp, tmesh8))
    np.testing.assert_allclose(spec, want_spec, atol=1e-6)
    np.testing.assert_allclose(labels, want_lab, atol=1e-5)
    np.testing.assert_allclose(enh, want_enh, atol=1e-5)


def test_composed_long_shot_batched(tmesh8):
    """The composed program batches over leading channel axes."""
    from specenh.data.tiles import patch, unpatch
    from specenh.models.autoencoder import make_model
    from specenh.parallel.timeshard import (
        make_sharded_enhance_shot,
        usable_samples_tiled,
    )

    sp_full = SpecParams(cut_shot=0.6)
    t_use = usable_samples_tiled(sp_full.n_samples, 8, sp_full)
    sp = SpecParams(cut_shot=t_use / sp_full.fs)
    xs = synth_trace(sp_full, seed=12, n_channels=2)[:, :t_use]
    cfg = ModelConfig()
    params = make_model(cfg).init(
        jax.random.PRNGKey(3), np.zeros((1, *cfg.input_shape), np.float32)
    )
    fn = make_sharded_enhance_shot(cfg, sp, tmesh8)
    spec, labels, enh = fn(params, jnp.asarray(xs))
    assert spec.shape[0] == labels.shape[0] == enh.shape[0] == 2
    k_tiles = spec.shape[-1] // 128
    tiles = patch(jnp.asarray(np.asarray(spec)))[..., None]
    pred = make_model(cfg).apply(params, tiles)
    want_enh = np.asarray(unpatch(jnp.squeeze(pred, -1), tiles_per_spec=k_tiles))
    np.testing.assert_allclose(np.asarray(enh), want_enh, atol=1e-5)


def test_composed_long_shot_guards(tmesh8):
    """make_sharded_enhance_shot: clear errors for a missing mesh and for
    more than one leading trace axis."""
    from specenh.models.autoencoder import make_model
    from specenh.parallel.timeshard import (
        make_sharded_enhance_shot,
        usable_samples_tiled,
    )

    with pytest.raises(ValueError, match="requires a mesh"):
        make_sharded_enhance_shot(ModelConfig(), SpecParams(cut_shot=0.6))

    sp_full = SpecParams(cut_shot=0.6)
    t_use = usable_samples_tiled(sp_full.n_samples, 8, sp_full)
    sp = SpecParams(cut_shot=t_use / sp_full.fs)
    params = make_model(ModelConfig()).init(
        jax.random.PRNGKey(0), np.zeros((1, *ModelConfig().input_shape), np.float32)
    )
    fn = make_sharded_enhance_shot(ModelConfig(), sp, tmesh8)
    bad = jnp.zeros((2, 2, t_use), jnp.float32)  # two leading axes
    with pytest.raises(ValueError, match=r"\(T,\) or \(C, T\)"):
        fn(params, bad)


def test_dp_fit_checkpoint_resume_matches_uninterrupted(mesh8, tmp_path):
    """dp_fit's checkpoint/resume (round-3 review: the --devices CLI branch
    silently dropped --checkpoints/--resume): interrupt at epoch 2, resume
    to 4 — params and loss history match the uninterrupted run."""
    rng = np.random.default_rng(0)
    x = rng.random((24, 64, 32, 1)).astype(np.float32)
    y = rng.random((24, 64, 32, 1)).astype(np.float32)

    s_full = create_state(TINY, TrainConfig(seed=2))
    s_full, h_full = dp_fit(s_full, x, y, mesh8, x, y,
                            epochs=4, batch_size=8, seed=3)

    ck = str(tmp_path / "ck")
    s_a = create_state(TINY, TrainConfig(seed=2))
    dp_fit(s_a, x, y, mesh8, x, y, epochs=2, batch_size=8, seed=3,
           checkpoint_dir=ck)
    s_b = create_state(TINY, TrainConfig(seed=2))
    s_b, h_b = dp_fit(s_b, x, y, mesh8, x, y, epochs=4, batch_size=8,
                      seed=3, checkpoint_dir=ck, resume=True)

    np.testing.assert_allclose(h_b["loss"], h_full["loss"], rtol=1e-5)
    np.testing.assert_allclose(h_b["val_loss"], h_full["val_loss"], rtol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(s_full.params),
                    jax.tree_util.tree_leaves(s_b.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)
    # metrics path writes one record per trained epoch
    import json as _json
    mpath = str(tmp_path / "m.jsonl")
    s_c = create_state(TINY, TrainConfig(seed=2))
    dp_fit(s_c, x, y, mesh8, epochs=2, batch_size=8, seed=3,
           metrics_path=mpath)
    recs = [_json.loads(l) for l in open(mpath)]
    assert [r["epoch"] for r in recs] == [0, 1]
    assert all(r["devices"] == 8 and r["sec"] > 0 for r in recs)


def test_dp_kernel_epoch_matches_single_device(mesh8):
    """The shard_map'd fused-kernel epoch (parallel.dp_kernel) vs the
    single-device kernel epoch: identical losses and final params.  The
    second batch's tail devices hold ONLY padding tiles — the psum-then-
    normalize formulation must survive an all-padding shard (a per-device
    mean would be 0/0 there)."""
    from specenh.parallel.dp_kernel import dp_kernel_epoch_for
    from specenh.train import _epoch_batches, kernel_epoch_for

    cfg = ModelConfig()
    tc = TrainConfig(seed=0)
    rng = np.random.default_rng(4)
    n = 12  # bs=8 over 8 devices: batch 2 = 4 real + 4 padding tiles
    x = jnp.asarray(rng.random((n, 256, 128, 1)), jnp.float32)
    y = jnp.asarray((rng.random((n, 256, 128, 1)) > 0.6), jnp.float32)
    bi, bm = _epoch_batches(n, 8, np.arange(n))
    bi, bm = jnp.asarray(bi), jnp.asarray(bm)

    s1 = create_state(cfg, tc)
    ep1 = kernel_epoch_for(cfg, tc, interpret=True, dtype=jnp.float32)
    s1, l1 = ep1(s1, x, y, bi, bm)

    s2 = create_state(cfg, tc)
    ep2 = dp_kernel_epoch_for(cfg, tc, mesh8, interpret=True,
                              dtype=jnp.float32)
    s2, l2 = ep2(s2, x, y, bi, bm)

    np.testing.assert_allclose(np.asarray(l2), np.asarray(l1), rtol=1e-5)
    f1, _ = jax.flatten_util.ravel_pytree(s1.params)
    f2, _ = jax.flatten_util.ravel_pytree(s2.params)
    np.testing.assert_allclose(np.asarray(f2), np.asarray(f1),
                               rtol=1e-4, atol=5e-6)


def test_dp_fit_kernel_engine(mesh8):
    """dp_fit(epoch_fn=dp_kernel_epoch_for(...)) — the CLI
    `--engine kernel --devices N` path — trains: finite decreasing loss."""
    from specenh.parallel.dp_kernel import dp_kernel_epoch_for

    cfg = ModelConfig()
    tc = TrainConfig(seed=1)
    rng = np.random.default_rng(5)
    x = rng.random((8, 256, 128, 1)).astype(np.float32)
    y = (rng.random((8, 256, 128, 1)) > 0.6).astype(np.float32)
    state = create_state(cfg, tc)
    ep = dp_kernel_epoch_for(cfg, tc, mesh8, interpret=True,
                             dtype=jnp.float32)
    state, hist = dp_fit(state, x, y, mesh8, epochs=3, batch_size=8,
                         epoch_fn=ep)
    assert np.isfinite(hist["loss"]).all()
    assert hist["loss"][-1] < hist["loss"][0]


def test_dp_fit_device_resident_inputs_match_host(mesh8):
    """jax.Array inputs (the e2e device-resident path) pad/reshard on
    device and train identically to the same data passed as numpy
    (round-3 review: _put_sharded round-tripped device arrays through
    numpy, paying the ~2 MB/s tunnel re-upload)."""
    rng = np.random.default_rng(1)
    x = rng.random((10, 64, 32, 1)).astype(np.float32)  # 10 % 8 != 0: pads
    y = rng.random((10, 64, 32, 1)).astype(np.float32)

    s1 = create_state(TINY, TrainConfig(seed=4))
    s1, h1 = dp_fit(s1, x, y, mesh8, epochs=2, batch_size=8, seed=5)
    s2 = create_state(TINY, TrainConfig(seed=4))
    s2, h2 = dp_fit(s2, jnp.asarray(x), jnp.asarray(y), mesh8,
                    epochs=2, batch_size=8, seed=5)
    np.testing.assert_allclose(h1["loss"], h2["loss"], rtol=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(s1.params),
                    jax.tree_util.tree_leaves(s2.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-7)


def test_dp_fit_early_stopping(mesh8):
    """dp_fit(patience=N): stops after N stale val epochs (lr=0 makes
    every epoch after the first stale), like fit/fit_streaming."""
    from specenh.config import ModelConfig
    from specenh.parallel.data_parallel import dp_fit
    from specenh.train import create_state

    tiny = ModelConfig(filters=(4, 4), kernels=((3, 3), (3, 3)),
                       input_shape=(32, 16, 1))
    rng = np.random.default_rng(0)
    x = rng.random((16, 32, 16, 1)).astype(np.float32)
    y = (x * 0.5).astype(np.float32)
    tc = TrainConfig(seed=0, learning_rate=0.0)
    state = create_state(tiny, tc)
    _, hist = dp_fit(state, x, y, mesh8, x[:8], y[:8], epochs=8,
                     batch_size=8, seed=0, patience=1)
    assert hist["stopped_epoch"] == 1
    assert len(hist["loss"]) == 2


def test_composed_long_shot_kernel_path(tmesh8):
    """Round-4 verdict weak #1: the composed long-shot service rides the
    fused serving kernel — use_kernel=True (interpret on CPU) must match
    the Flax composed program to bf16-kernel tolerance, and the prepared
    handle path is identical."""
    from specenh.models.autoencoder import make_model
    from specenh.parallel.timeshard import (
        make_sharded_enhance_shot,
        usable_samples_tiled,
    )

    sp_full = SpecParams(cut_shot=0.6)
    t_use = usable_samples_tiled(sp_full.n_samples, 8, sp_full)
    sp = SpecParams(cut_shot=t_use / sp_full.fs)
    x = synth_trace(sp_full, seed=13)[:t_use]

    cfg = ModelConfig()
    params = make_model(cfg).init(
        jax.random.PRNGKey(2), np.zeros((1, *cfg.input_shape), np.float32)
    )
    ff = make_sharded_enhance_shot(cfg, sp, tmesh8)  # auto->Flax on CPU
    fk = make_sharded_enhance_shot(cfg, sp, tmesh8, use_kernel=True,
                                   interpret=True)
    sf, lf, ef = ff(params, jnp.asarray(x))
    sk, lk, ek = fk(params, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(sk), np.asarray(sf), atol=1e-6)
    np.testing.assert_allclose(np.asarray(lk), np.asarray(lf), atol=1e-6)
    d = np.abs(np.asarray(ek) - np.asarray(ef))
    assert d.max() < 5e-2 and d.mean() < 2e-3  # bf16 kernel vs f32 Flax

    handle = fk.prepare(params)
    sk2, lk2, ek2 = fk(handle, jnp.asarray(x))
    np.testing.assert_array_equal(np.asarray(ek2), np.asarray(ek))
    assert ff.prepare(params) is params  # Flax path: identity
