"""Corner-turn Pallas kernels vs the XLA layout paths — interpret mode.

The 2-D kernels speak the AE kernel's (16, m) form with lanes interleaved
I tiles per group (lane = s*32*I + j*32 + t); ground truth is the classic
per-tile layout (specenh.ops.ae_kernel.specs_to_x16 / o16_to_specs,
I = 1 lane order) regrouped in numpy.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from specenh.ops.ae_kernel import o16_to_specs, specs_to_x16
from specenh.ops.parity_turn import (
    o16_2d_to_specs,
    pick_interleave,
    specs_to_x16_2d,
)


def _regroup(x16: np.ndarray, g: int, i_: int) -> np.ndarray:
    """classic per-tile lane order (16, B*2048) -> interleaved (16, m)."""
    return (
        x16.reshape(16, g, i_, 64, 32).transpose(0, 1, 3, 2, 4)
        .reshape(16, -1)
    )


def test_pick_interleave():
    assert pick_interleave(30) == 6
    assert pick_interleave(8) == 4
    assert pick_interleave(9) == 3
    assert pick_interleave(2) == 2
    assert pick_interleave(7) == 1


# (1, 12) and (1, 30) exercise gpc > 1 (several interleave groups per
# channel) — (1, 30) IS the production flagship geometry (gpc = 5)
@pytest.mark.parametrize(
    "c,k", [(1, 6), (3, 2), (2, 4), (1, 3), (1, 12), (1, 30)]
)
def test_specs_to_x16_2d_exact(c, k):
    rng = np.random.default_rng(7)
    i_ = pick_interleave(k)
    specs = jnp.asarray(rng.random((c, 256, k * 128 + 40)), jnp.float32)
    got = np.asarray(specs_to_x16_2d(specs, k, interpret=True), np.float32)
    b = c * k
    assert got.shape == (16, b * 2048)
    classic = np.asarray(specs_to_x16(specs, k_tiles=k), np.float32)
    np.testing.assert_array_equal(got, _regroup(classic, b // i_, i_))


# (1, 12): gpc = 2; (1, 10): gpc = 5 like the production 30-tile geometry
# but at I = 2 — a third of the interpret-mode cost of (1, 30), whose
# compiled form the bench SSIM gate exercises on every TPU run
@pytest.mark.parametrize("c,k", [(1, 6), (3, 2), (2, 4), (1, 12), (1, 10)])
def test_o16_2d_to_specs_close(c, k):
    rng = np.random.default_rng(3)
    i_ = pick_interleave(k)
    b = c * k
    o16 = rng.random((16, b * 2048)).astype(np.float32)
    o16i = _regroup(o16, b // i_, i_)
    got = o16_2d_to_specs(jnp.asarray(o16i), c=c, k_tiles=k, interpret=True)
    want = o16_to_specs(jnp.asarray(o16), c=c, k_tiles=k)
    assert got.shape == want.shape == (c, 256, k * 128)
    # hi/lo bf16 split reconstructs f32 to ~2^-17 relative
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=0, atol=2e-5)


def test_interleave_must_divide():
    specs = jnp.zeros((1, 256, 30 * 128), jnp.float32)
    with pytest.raises(ValueError, match="must divide"):
        specs_to_x16_2d(specs, 30, interleave=4, interpret=True)
    with pytest.raises(ValueError, match="must divide"):
        o16_2d_to_specs(
            jnp.zeros((16, 30 * 2048), jnp.float32), c=1, k_tiles=30,
            interleave=4, interpret=True,
        )


def test_enhance_specs_end_to_end_matches_flax():
    """Full serving fast path (turn-in -> fused kernel -> turn-out) vs the
    Flax model on patch/unpatch, interpret mode."""
    import jax

    from specenh.config import ModelConfig
    from specenh.data.tiles import patch, unpatch
    from specenh.models.autoencoder import make_model
    from specenh.ops.ae_kernel import ae_kernel_enhance_specs, build_kernel_weights

    rng = np.random.default_rng(11)
    cfg = ModelConfig()
    model = make_model(cfg)
    params = model.init(
        jax.random.PRNGKey(0), np.zeros((1, *cfg.input_shape), np.float32)
    )
    wts = build_kernel_weights(params, cfg)
    specs = jnp.asarray(rng.random((2, 256, 6 * 128 + 17)), jnp.float32)

    got = ae_kernel_enhance_specs(wts, specs, k_tiles=6, interpret=True)

    tiles = patch(specs)[..., None]
    pred = model.apply(params, tiles)
    want = unpatch(jnp.squeeze(pred, -1), tiles_per_spec=6)
    assert got.shape == want.shape
    # bf16 kernel vs f32 Flax: same tolerance as the classic-layout kernel
    err = np.abs(np.asarray(got) - np.asarray(want)).max()
    assert err < 5e-3, err


@pytest.mark.parametrize(
    "cfg_kw",
    [
        dict(kernels=((5, 5), (5, 5)), out_kernel=(5, 5)),
        dict(filters=(64, 32), kernels=((5, 5), (5, 5)), out_kernel=(5, 5)),
    ],
    ids=["k5", "manual"],
)
def test_enhance_specs_generalized_geometries(cfg_kw):
    """The serving fast path for the round-3 generalized geometries
    (reference array sweep k5, manual (64,32)/k5) through the SAME corner
    turns — layout is geometry-independent."""
    import jax

    from specenh.config import ModelConfig
    from specenh.data.tiles import patch, unpatch
    from specenh.models.autoencoder import make_model
    from specenh.ops.ae_kernel import ae_kernel_enhance_specs, build_kernel_weights

    rng = np.random.default_rng(13)
    cfg = ModelConfig(**cfg_kw)
    model = make_model(cfg)
    params = model.init(
        jax.random.PRNGKey(1), np.zeros((1, *cfg.input_shape), np.float32)
    )
    wts = build_kernel_weights(params, cfg)
    specs = jnp.asarray(rng.random((1, 256, 3 * 128)), jnp.float32)
    got = ae_kernel_enhance_specs(wts, specs, k_tiles=3, interpret=True)
    pred = model.apply(params, patch(specs)[..., None])
    want = unpatch(jnp.squeeze(pred, -1), tiles_per_spec=3)
    err = np.abs(np.asarray(got) - np.asarray(want)).max()
    assert err < 5e-3, err
