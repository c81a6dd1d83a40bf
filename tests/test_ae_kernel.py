"""Fused Pallas AE kernel (specenh.ops.ae_kernel) vs the pure-jnp polyphase
executor (ops.fused_ae.fused_ae_apply, the correctness anchor) and the Flax
model — interpret mode on CPU."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from specenh.config import ModelConfig
from specenh.models.autoencoder import make_model
from specenh.ops.ae_kernel import (
    ae_kernel_apply,
    build_kernel_weights,
    o16_to_tiles,
    supports,
    tiles_to_x16,
)
from specenh.ops.fused_ae import build_plan, fused_ae_apply

CFG = ModelConfig()  # flagship: depth-2, (32, 32), k3, (256, 128, 1)


@pytest.fixture(scope="module")
def setup():
    model = make_model(CFG)
    params = model.init(
        jax.random.PRNGKey(0), np.zeros((1, *CFG.input_shape), np.float32)
    )
    rng = np.random.default_rng(1)
    tiles = jnp.asarray(rng.random((4, 256, 128, 1)), jnp.float32)
    return model, params, tiles


def test_supports():
    assert supports(CFG)
    # the full reference depth-2 family is covered since round 3
    assert supports(ModelConfig(kernels=((5, 5), (5, 5)), out_kernel=(5, 5)))
    assert supports(ModelConfig(kernels=((7, 7), (7, 7)), out_kernel=(7, 7)))
    assert supports(ModelConfig(filters=(64, 32), kernels=((5, 5), (5, 5)),
                                out_kernel=(5, 5)))
    assert not supports(ModelConfig(filters=(16, 32)))       # sub-sublane C
    assert not supports(ModelConfig(kernels=((9, 9), (3, 3))))
    assert not supports(ModelConfig(filters=(16, 32, 64),
                                    kernels=((3, 3),) * 3))  # depth 3


# every reference depth-2 geometry: the kernel array sweep's k3/k5/k7
# (hyperparam_scan.py:123) and the manual (64,32)/k5 config
# (manual_scan.py:120-124)
GEOMETRIES = [
    ModelConfig(),
    ModelConfig(kernels=((5, 5), (5, 5)), out_kernel=(5, 5)),
    ModelConfig(kernels=((7, 7), (7, 7)), out_kernel=(7, 7)),
    ModelConfig(filters=(64, 32), kernels=((5, 5), (5, 5)), out_kernel=(5, 5)),
]


@pytest.mark.parametrize("cfg", GEOMETRIES[1:], ids=["k5", "k7", "manual"])
def test_kernel_generalized_geometries_f32_exact(cfg):
    """f32 kernel vs the polyphase executor for every non-flagship
    reference geometry — tight parity catches tap-table mistakes that
    bf16 noise would hide."""
    from specenh.ops import ae_kernel as AK

    model = make_model(cfg)
    params = model.init(
        jax.random.PRNGKey(3), np.zeros((1, *cfg.input_shape), np.float32)
    )
    rng = np.random.default_rng(5)
    tiles = jnp.asarray(rng.random((2, 256, 128, 1)), jnp.float32)
    plan = build_plan(params, cfg)
    want = np.asarray(fused_ae_apply(plan, tiles))
    wts = build_kernel_weights(params, cfg, dtype=jnp.float32)
    x16 = AK.tiles_to_x16(tiles, jnp.float32)
    o16 = AK._pallas_ae(x16, wts, 1, True)
    got = np.asarray(AK.o16_to_tiles(o16, tiles.shape[0]))
    np.testing.assert_allclose(got, want, atol=2e-5)
    # and vs the Flax model at bf16-kernel tolerance
    want_flax = np.asarray(model.apply(params, tiles))
    np.testing.assert_allclose(got, want_flax, atol=5e-3)


def test_layout_roundtrip(setup):
    """tiles -> x16 (xi-major rows: row = xi*4 + phi) -> permute to
    production order (p,q,a,b) -> o16_to_tiles must reproduce the tiles
    exactly."""
    _, _, tiles = setup
    x16 = np.asarray(tiles_to_x16(tiles, jnp.float32))
    perm = [
        (2 * q + b) * 4 + (2 * p + a)
        for p in range(2) for q in range(2) for a in range(2) for b in range(2)
    ]
    back = o16_to_tiles(jnp.asarray(x16[perm]), tiles.shape[0])
    np.testing.assert_array_equal(np.asarray(back), np.asarray(tiles))


def test_kernel_matches_executor(setup):
    """bf16 kernel vs the float32 polyphase executor: bf16 tolerance."""
    model, params, tiles = setup
    plan = build_plan(params, CFG)
    want = np.asarray(fused_ae_apply(plan, tiles))
    wts = build_kernel_weights(params, CFG)
    got = np.asarray(ae_kernel_apply(wts, tiles, interpret=True))
    assert np.abs(got - want).max() < 5e-3
    assert np.abs(got - want).mean() < 5e-4


def test_kernel_matches_flax(setup):
    model, params, tiles = setup
    want = np.asarray(model.apply(params, tiles))
    wts = build_kernel_weights(params, CFG)
    got = np.asarray(ae_kernel_apply(wts, tiles, interpret=True))
    assert np.abs(got - want).max() < 5e-3


def test_kernel_f32_exact(setup):
    """float32 kernel weights/activations vs the executor: tight parity —
    catches any tap-table or scatter-order mistake that bf16 noise could
    hide."""
    model, params, tiles = setup
    plan = build_plan(params, CFG)
    want = np.asarray(fused_ae_apply(plan, tiles))
    wts = build_kernel_weights(params, CFG, dtype=jnp.float32)

    from specenh.ops import ae_kernel as AK

    b = tiles.shape[0]
    x16 = AK.tiles_to_x16(tiles, jnp.float32)
    o16 = AK._pallas_ae(x16, wts, 1, True)
    got = np.asarray(AK.o16_to_tiles(o16, b))
    np.testing.assert_allclose(got, want, atol=2e-5)


def test_block_tiles_two(setup):
    model, params, tiles = setup
    wts = build_kernel_weights(params, CFG)
    one = np.asarray(ae_kernel_apply(wts, tiles, block_tiles=1, interpret=True))
    two = np.asarray(ae_kernel_apply(wts, tiles, block_tiles=2, interpret=True))
    np.testing.assert_allclose(one, two, atol=1e-6)


def test_production_predict_forced_kernel_unsupported_raises():
    """use_kernel=True on an uncovered geometry must raise, matching
    make_enhance_shot_fn's contract — never a silent Flax fallback that a
    'kernel' benchmark would mislabel (round-3 review)."""
    from specenh.bench.harness import make_production_predict_fn

    odd = ModelConfig(filters=(16, 32), kernels=((4, 4), (4, 4)))
    with pytest.raises(NotImplementedError, match="no fused kernel"):
        make_production_predict_fn(odd, use_kernel=True)
