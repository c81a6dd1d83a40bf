"""Depth-3 fused Pallas kernel (specenh.ops.ae3_kernel) + the depth-generic
polyphase executor (ops.fused_ae.build_plan_layers / polyphase_apply, the
correctness anchor) — interpret mode on CPU.

Reference family: VAE/manual_scan_3layers.py:185-233 (the deep3 preset:
filters (16, 32, 64), all kernels (5, 5)).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from specenh.config import MODEL_PRESETS, ModelConfig
from specenh.models.autoencoder import make_model
from specenh.ops import ae3_kernel as AK3
from specenh.ops.fused_ae import (
    build_plan,
    build_plan_layers,
    fused_ae_apply,
    polyphase_apply,
)

DEEP3 = MODEL_PRESETS["deep3"]


def _init(cfg, seed=0):
    model = make_model(cfg)
    params = model.init(
        jax.random.PRNGKey(seed), np.zeros((1, *cfg.input_shape), np.float32)
    )
    return model, params


@pytest.fixture(scope="module")
def setup():
    model, params = _init(DEEP3)
    rng = np.random.default_rng(1)
    tiles = jnp.asarray(rng.random((2, 256, 128, 1)), jnp.float32)
    return model, params, tiles


def test_supports3():
    assert AK3.supports3(DEEP3)
    assert AK3.supports3(
        ModelConfig(filters=(16, 32, 64), kernels=((3, 3),) * 3, out_kernel=(3, 3))
    )
    assert not AK3.supports3(ModelConfig())  # depth 2
    assert not AK3.supports3(
        ModelConfig(filters=(16, 32, 128), kernels=((5, 5),) * 3, out_kernel=(5, 5))
    )  # >64 channels
    assert not AK3.supports3(
        ModelConfig(filters=(16, 32, 64), kernels=((9, 9),) * 3, out_kernel=(9, 9))
    )  # kernel > 7


# --- the depth-generic polyphase executor (correctness anchor) -------------


def test_polyphase_matches_flax_deep3(setup):
    model, params, tiles = setup
    want = np.asarray(model.apply(params, tiles))
    got = np.asarray(polyphase_apply(build_plan_layers(params, DEEP3), tiles))
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_polyphase_matches_depth2_plan():
    """Depth-generic executor == the fixed depth-2 plan on the flagship."""
    cfg = ModelConfig()
    _, params = _init(cfg)
    rng = np.random.default_rng(2)
    tiles = jnp.asarray(rng.random((2, 256, 128, 1)), jnp.float32)
    want = np.asarray(fused_ae_apply(build_plan(params, cfg), tiles))
    got = np.asarray(polyphase_apply(build_plan_layers(params, cfg), tiles))
    np.testing.assert_allclose(got, want, atol=1e-7)


def test_polyphase_logits(setup):
    model, params, tiles = setup
    want = np.asarray(model.apply(params, tiles, logits=True))
    got = np.asarray(
        polyphase_apply(build_plan_layers(params, DEEP3), tiles, logits=True)
    )
    np.testing.assert_allclose(got, want, atol=1e-5)


# --- the fused depth-3 Pallas kernel ---------------------------------------


def test_kernel3_f32_exact(setup):
    """f32 kernel vs the polyphase executor — tight parity catches
    tap-table mistakes that bf16 noise would hide."""
    model, params, tiles = setup
    want = np.asarray(polyphase_apply(build_plan_layers(params, DEEP3), tiles))
    wts = AK3.build_kernel3_weights(params, DEEP3, dtype=jnp.float32)
    x64 = AK3.tiles_to_x64(tiles, jnp.float32)
    o64 = AK3._pallas_ae3(x64, wts, 1, True)
    got = np.asarray(AK3.o64_to_tiles(o64, tiles.shape[0]))
    np.testing.assert_allclose(got, want, atol=2e-6)


@pytest.mark.parametrize(
    "cfg",
    [
        ModelConfig(filters=(16, 32, 64), kernels=((3, 3),) * 3, out_kernel=(3, 3)),
        ModelConfig(filters=(32, 32, 32), kernels=((7, 7),) * 3, out_kernel=(7, 7)),
        ModelConfig(filters=(16, 16, 16), kernels=((5, 5), (3, 3), (7, 7)),
                    out_kernel=(5, 5)),
    ],
    ids=["k3", "k7_c32", "mixed"],
)
def test_kernel3_other_geometries(cfg):
    assert AK3.supports3(cfg)
    _, params = _init(cfg, seed=3)
    rng = np.random.default_rng(5)
    tiles = jnp.asarray(rng.random((1, 256, 128, 1)), jnp.float32)
    want = np.asarray(polyphase_apply(build_plan_layers(params, cfg), tiles))
    wts = AK3.build_kernel3_weights(params, cfg, dtype=jnp.float32)
    x64 = AK3.tiles_to_x64(tiles, jnp.float32)
    o64 = AK3._pallas_ae3(x64, wts, 1, True)
    got = np.asarray(AK3.o64_to_tiles(o64, 1))
    np.testing.assert_allclose(got, want, atol=2e-6)


def test_kernel3_apply_bf16_vs_flax(setup):
    model, params, tiles = setup
    want = np.asarray(model.apply(params, tiles))
    wts = AK3.build_kernel3_weights(params, DEEP3)
    got = np.asarray(AK3.ae3_kernel_apply(wts, tiles, interpret=True))
    assert np.max(np.abs(got - want)) < 5e-3  # bf16 weights/activations
    assert np.mean(np.abs(got - want)) < 2e-4


def test_kernel3_batch_grid(setup):
    """grid over multiple blocks == one block (batch 4, block_tiles 2)."""
    model, params, _ = setup
    rng = np.random.default_rng(9)
    tiles = jnp.asarray(rng.random((4, 256, 128, 1)), jnp.float32)
    wts = AK3.build_kernel3_weights(params, DEEP3, dtype=jnp.float32)
    x64 = AK3.tiles_to_x64(tiles, jnp.float32)
    a = np.asarray(AK3._pallas_ae3(x64, wts, 1, True))
    b = np.asarray(AK3._pallas_ae3(x64, wts, 2, True))
    np.testing.assert_allclose(a, b, atol=1e-6)


# --- layout conversions ----------------------------------------------------


def test_x64_roundtrip_layouts():
    rng = np.random.default_rng(11)
    tiles = jnp.asarray(rng.random((3, 256, 128, 1)), jnp.float32)
    x64 = AK3.tiles_to_x64(tiles, jnp.float32)
    assert x64.shape == (64, 3 * 512)
    # o64_to_tiles inverts tiles_to_x64 after the production-row reorder
    x = np.asarray(x64)
    o64 = np.zeros_like(x)
    from specenh.ops.parity_turn import _prod_row3

    for phi in range(8):
        for xi in range(8):
            o64[_prod_row3(phi, xi)] = x[xi * 8 + phi]
    back = np.asarray(AK3.o64_to_tiles(jnp.asarray(o64), 3))
    np.testing.assert_allclose(back, np.asarray(tiles), atol=0)


def test_specs_x64_roundtrip():
    c, k = 2, 3
    rng = np.random.default_rng(13)
    specs = jnp.asarray(rng.random((c, 256, k * 128 + 17)), jnp.float32)
    x64 = AK3.specs_to_x64(specs, k, jnp.float32)
    x = np.asarray(x64)
    o64 = np.zeros_like(x)
    from specenh.ops.parity_turn import _prod_row3

    for phi in range(8):
        for xi in range(8):
            o64[_prod_row3(phi, xi)] = x[xi * 8 + phi]
    back = np.asarray(AK3.o64_to_specs(jnp.asarray(o64), c, k))
    np.testing.assert_allclose(back, np.asarray(specs)[:, :, : k * 128], atol=0)


@pytest.mark.parametrize("c,k", [(2, 2), (1, 4), (2, 3)])
def test_pallas_turn3_roundtrip(c, k):
    """specs_to_x64_2d -> production reorder -> o64_2d_to_specs == identity
    at bf16 input precision (the in-turn casts to bf16)."""
    from specenh.ops.parity_turn import (
        _prod_row3,
        o64_2d_to_specs,
        pick_interleave3,
        specs_to_x64_2d,
    )

    rng = np.random.default_rng(17)
    specs = jnp.asarray(rng.random((c, 256, k * 128)), jnp.float32)
    x64 = np.asarray(specs_to_x64_2d(specs, k, interpret=True)).astype(np.float32)
    o64 = np.zeros_like(x64)
    for phi in range(8):
        for xi in range(8):
            o64[_prod_row3(phi, xi)] = x64[xi * 8 + phi]
    back = np.asarray(o64_2d_to_specs(jnp.asarray(o64), c, k, interpret=True))
    assert pick_interleave3(k) > 1
    np.testing.assert_allclose(back, np.asarray(specs), atol=4e-3)  # bf16 in-turn


def test_harness_dispatch_deep3(setup):
    """make_enhance_shot_fn routes the deep3 preset through the fused
    depth-3 kernel (use_kernel=True + interpret on CPU) and matches the
    Flax path on a short shot."""
    from specenh.bench.harness import _kernel_family, make_enhance_shot_fn
    from specenh.config import SpecParams

    build, apply_, enh = _kernel_family(DEEP3)
    assert build is AK3.build_kernel3_weights
    assert enh is AK3.ae3_kernel_enhance_specs
    assert _kernel_family(ModelConfig())[0] is not None  # depth-2 unchanged
    assert _kernel_family(
        ModelConfig(filters=(16, 32, 128), kernels=((5, 5),) * 3,
                    out_kernel=(5, 5))
    ) == (None, None, None)

    model, params, _ = setup
    sp = SpecParams(cut_shot=0.2)
    rng = np.random.default_rng(23)
    traces = jnp.asarray(rng.standard_normal((2, sp.n_samples)), jnp.float32)
    fk = make_enhance_shot_fn(DEEP3, sp, use_kernel=True, interpret=True)
    ff = make_enhance_shot_fn(DEEP3, sp, use_kernel=False)
    sk, ek = fk(params, traces)
    sf, ef = ff(params, traces)
    np.testing.assert_allclose(np.asarray(sk), np.asarray(sf), atol=2e-2)
    assert np.max(np.abs(np.asarray(ek) - np.asarray(ef))) < 5e-2
    assert np.mean(np.abs(np.asarray(ek) - np.asarray(ef))) < 2e-3


def test_production_predict_fn_deep3_force_kernel(setup):
    from specenh.bench.harness import make_production_predict_fn

    model, params, tiles = setup
    fn = make_production_predict_fn(DEEP3, use_kernel=True, interpret=True)
    got = np.asarray(fn(params, tiles))
    want = np.asarray(model.apply(params, tiles))
    assert np.max(np.abs(got - want)) < 5e-3


def test_enhance_specs_vs_flax(setup):
    """The full depth-3 serving fast path (Pallas turn in, fused kernel,
    Pallas turn out) vs model.apply on the same tiles."""
    model, params, _ = setup
    c, k = 2, 2
    rng = np.random.default_rng(19)
    specs = jnp.asarray(rng.random((c, 256, k * 128)), jnp.float32)
    wts = AK3.build_kernel3_weights(params, DEEP3)
    out = np.asarray(AK3.ae3_kernel_enhance_specs(wts, specs, k, interpret=True))
    tiles = (
        specs.reshape(c, 256, k, 128)
        .transpose(0, 2, 1, 3)
        .reshape(c * k, 256, 128, 1)
    )
    ref = (
        np.asarray(model.apply(params, tiles))
        .reshape(c, k, 256, 128)
        .transpose(0, 2, 1, 3)
        .reshape(c, 256, k * 128)
    )
    assert np.max(np.abs(out - ref)) < 5e-3
    assert np.mean(np.abs(out - ref)) < 2e-4


def test_prepared_weight_handle_matches_params_path(setup):
    """fn.prepare(params) returns the device weight handle; passing it in
    place of Flax params gives the identical output on both serving
    factories, and the Flax path's prepare is the identity (round-4
    verdict #5: resident services pre-scatter once)."""
    from specenh.bench.harness import (
        make_enhance_shot_fn,
        make_production_predict_fn,
    )
    from specenh.config import SpecParams

    model, params, tiles = setup
    sp = SpecParams(cut_shot=0.2)
    rng = np.random.default_rng(29)
    traces = jnp.asarray(rng.standard_normal((2, sp.n_samples)), jnp.float32)

    fk = make_enhance_shot_fn(DEEP3, sp, use_kernel=True, interpret=True)
    handle = fk.prepare(params)
    assert isinstance(handle, AK3.AE3KernelWeights)
    assert fk.prepare(handle) is handle  # idempotent
    s1, e1 = fk(params, traces)
    s2, e2 = fk(handle, traces)
    np.testing.assert_array_equal(np.asarray(e1), np.asarray(e2))
    np.testing.assert_array_equal(np.asarray(s1), np.asarray(s2))

    fp = make_production_predict_fn(DEEP3, use_kernel=True, interpret=True)
    hp = fp.prepare(params)
    np.testing.assert_array_equal(
        np.asarray(fp(params, tiles)), np.asarray(fp(hp, tiles))
    )

    ff = make_enhance_shot_fn(DEEP3, sp, use_kernel=False)
    assert ff.prepare(params) is params  # Flax path: identity
