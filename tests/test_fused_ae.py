"""Exact-equivalence tests: the polyphase (space-to-depth) autoencoder
formulation (specenh.ops.fused_ae) vs the standard Flax model.

NOTE: equivalence at 1e-5 holds under float32 math (this suite runs on CPU
per conftest).  On TPU the Flax reference itself uses default-precision
convs, so device-side comparisons should anchor on fused_ae_apply.

This formulation is the validated foundation for the round-2 fused Pallas
kernel (see PERF_NOTES.md); every scatter matrix is exercised here.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from specenh.config import ModelConfig
from specenh.models.autoencoder import make_model
from specenh.ops.fused_ae import build_plan, fused_ae_apply


def _random_params(model, cfg, seed=0):
    """Random weights AND biases (init biases are zero — too weak a test)."""
    params = model.init(jax.random.PRNGKey(7), jnp.zeros((1, *cfg.input_shape)))
    rng = np.random.default_rng(seed)
    leaves, treedef = jax.tree_util.tree_flatten(params)
    return jax.tree_util.tree_unflatten(
        treedef,
        [jnp.asarray(rng.standard_normal(l.shape) * 0.1, jnp.float32) for l in leaves],
    )


@pytest.mark.parametrize("shape", [(256, 128), (64, 32)])
def test_polyphase_matches_flax(shape):
    cfg = ModelConfig(input_shape=(*shape, 1))
    model = make_model(cfg)
    params = _random_params(model, cfg)
    plan = build_plan(params, cfg)
    x = jnp.asarray(
        np.random.default_rng(1).standard_normal((3, *shape, 1)), jnp.float32
    )
    want = np.asarray(model.apply(params, x))
    got = np.asarray(fused_ae_apply(plan, x))
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_polyphase_logits_match():
    cfg = ModelConfig(input_shape=(64, 32, 1))
    model = make_model(cfg)
    params = _random_params(model, cfg, seed=2)
    plan = build_plan(params, cfg)
    x = jnp.asarray(np.random.default_rng(3).standard_normal((2, 64, 32, 1)), jnp.float32)
    want = np.asarray(model.apply(params, x, logits=True))
    got = np.asarray(fused_ae_apply(plan, x, logits=True))
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_border_cells_exact():
    """Zero-padding at every boundary must match SAME-conv semantics —
    borders are where polyphase alignment bugs live.  Checked by comparing
    ONLY the outermost ring of pixels."""
    cfg = ModelConfig(input_shape=(64, 32, 1))
    model = make_model(cfg)
    params = _random_params(model, cfg, seed=4)
    plan = build_plan(params, cfg)
    x = jnp.asarray(np.random.default_rng(5).standard_normal((1, 64, 32, 1)), jnp.float32)
    want = np.asarray(model.apply(params, x))[0, ..., 0]
    got = np.asarray(fused_ae_apply(plan, x))[0, ..., 0]
    ring = np.concatenate([want[0], want[-1], want[:, 0], want[:, -1]])
    ring_got = np.concatenate([got[0], got[-1], got[:, 0], got[:, -1]])
    np.testing.assert_allclose(ring_got, ring, atol=1e-5)


@pytest.mark.parametrize(
    "kernels,out_k",
    [
        (((5, 5), (5, 5)), (5, 5)),   # scan_k5
        (((7, 7), (7, 7)), (7, 7)),   # scan_k7
        (((5, 5), (3, 3)), (7, 7)),   # mixed odd kernels (manual-style)
    ],
)
def test_polyphase_matches_flax_other_kernels(kernels, out_k):
    cfg = ModelConfig(filters=(8, 8), kernels=kernels, out_kernel=out_k, input_shape=(64, 32, 1))
    model = make_model(cfg)
    params = _random_params(model, cfg, seed=6)
    plan = build_plan(params, cfg)
    x = jnp.asarray(np.random.default_rng(7).standard_normal((2, 64, 32, 1)), jnp.float32)
    want = np.asarray(model.apply(params, x))
    got = np.asarray(fused_ae_apply(plan, x))
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_unsupported_geometry_raises():
    cfg = ModelConfig(
        filters=(8, 8, 8), kernels=((3, 3), (3, 3), (3, 3)), out_kernel=(3, 3)
    )  # depth-3 unsupported
    model = make_model(cfg)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 256, 128, 1)))
    with pytest.raises(NotImplementedError):
        build_plan(params, cfg)

    cfg2 = ModelConfig(filters=(8, 8), kernels=((4, 4), (3, 3)), out_kernel=(3, 3))
    model2 = make_model(cfg2)
    params2 = model2.init(jax.random.PRNGKey(0), jnp.zeros((1, 256, 128, 1)))
    with pytest.raises(NotImplementedError):
        build_plan(params2, cfg2)
