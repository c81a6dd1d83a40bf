"""Fused Pallas depth-3 TRAINING kernel (specenh.ops.ae3_train_kernel) vs
jax.value_and_grad on the Flax model — interpret mode on CPU.

Gradient identity with autodiff is the whole ballgame (same test strategy
as the depth-2 trainer): the kernel trains the scattered operands and
unscatters to conv-param grads, so f32 parity catches any tap-adjoint,
pool-routing, parity-reorder, or map mistake.  The fast tests run a small
(16,16,16)/k3 depth-3 geometry; one test covers the real deep3 preset
(VAE/manual_scan_3layers.py:185-201 — k5, chunked-K layers).
"""

import numpy as np
import pytest

import jax
import jax.flatten_util
import jax.numpy as jnp
import optax

from specenh.config import MODEL_PRESETS, ModelConfig, TrainConfig
from specenh.models.autoencoder import make_model
from specenh.ops.ae3_train_kernel import (
    _struct3_of,
    build_train_maps3,
    gather_train_weights3,
    kernel_train_epoch_fn3,
    kernel_value_and_grad3,
    unscatter_grads3,
)
from specenh.train import bce_from_logits, create_state, train_epoch

SMALL = ModelConfig(filters=(16, 16, 16), kernels=((3, 3),) * 3,
                    out_kernel=(3, 3))
DEEP3 = MODEL_PRESETS["deep3"]


@pytest.fixture(scope="module")
def setup():
    model = make_model(SMALL)
    params = model.init(
        jax.random.PRNGKey(0), np.zeros((1, *SMALL.input_shape), np.float32)
    )
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.random((2, 256, 128, 1)), jnp.float32)
    y = jnp.asarray((rng.random((2, 256, 128, 1)) > 0.6), jnp.float32)
    return model, params, x, y


def _flax_value_and_grad(model, params, x, y, mask):
    def loss_fn(p):
        return bce_from_logits(model.apply(p, x, logits=True), y, mask)

    return jax.value_and_grad(loss_fn)(params)


def test_maps_structured(setup):
    """Every supported geometry must assemble without gathers: slices for
    13 operands + the one-hot tap matmul for w0t."""
    assert _struct3_of(build_train_maps3(SMALL)) is not None
    assert _struct3_of(build_train_maps3(DEEP3)) is not None


def test_gather_matches_kernel_weights(setup):
    """Structured assembly == ae3_kernel.build_kernel3_weights on every
    operand (the forward must see the exact serving weights)."""
    from specenh.ops.ae3_kernel import build_kernel3_weights
    from specenh.ops.ae3_train_kernel import _OPS3

    model, params, x, y = setup
    tm = build_train_maps3(SMALL)
    fwd, _ = gather_train_weights3(params, tm, dtype=jnp.float32)
    wts = build_kernel3_weights(params, SMALL, dtype=jnp.float32)
    for name, got in zip(_OPS3, fwd):
        np.testing.assert_array_equal(
            np.asarray(got), np.asarray(getattr(wts, name)), err_msg=name
        )


def test_unscatter_is_gather_transpose(setup):
    """<gather(p), g_ops> == <p, unscatter(g_ops)> for random operand
    grads — the exact-transpose property gradient identity rests on."""
    model, params, x, y = setup
    tm = build_train_maps3(SMALL)
    rng = np.random.default_rng(5)
    gops = [jnp.asarray(rng.standard_normal(np.asarray(m).shape), jnp.float32)
            for m in tm.maps]
    fwd, _ = gather_train_weights3(params, tm, dtype=jnp.float32)
    lhs = sum(float(jnp.vdot(w, g)) for w, g in zip(fwd, gops))
    back = unscatter_grads3(gops, tm)
    leaves_p = jax.tree_util.tree_leaves(params)
    leaves_g = jax.tree_util.tree_leaves(back)
    rhs = sum(float(jnp.vdot(a, b)) for a, b in zip(leaves_p, leaves_g))
    np.testing.assert_allclose(lhs, rhs, rtol=1e-5)


def test_grad_parity_f32(setup):
    """f32 kernel grads vs autodiff of the Flax model: every leaf."""
    model, params, x, y = setup
    mask = jnp.ones(2, jnp.float32)
    ref_loss, ref_grads = _flax_value_and_grad(model, params, x, y, mask)
    tm = build_train_maps3(SMALL)
    loss, grads = kernel_value_and_grad3(
        params, x, y, mask, tm, interpret=True, dtype=jnp.float32
    )
    np.testing.assert_allclose(float(loss), float(ref_loss), rtol=1e-5)
    flat_r, _ = jax.flatten_util.ravel_pytree(ref_grads)
    flat_k, _ = jax.flatten_util.ravel_pytree(grads)
    scale = float(jnp.abs(flat_r).max())
    err = float(jnp.abs(flat_k - flat_r).max())
    assert err < 2e-5 * max(scale, 1.0), (err, scale)


def test_grad_parity_masked_batch(setup):
    """A padded batch (mask 1,0) must produce loss/grads identical to the
    unpadded single-tile batch — compared against Flax autodiff on the
    single tile (one kernel invocation; the padded tile must vanish)."""
    model, params, x, y = setup
    tm = build_train_maps3(SMALL)
    ref_loss, ref_grads = _flax_value_and_grad(
        model, params, x[:1], y[:1], jnp.ones(1)
    )
    loss_p, grads_p = kernel_value_and_grad3(
        params, x, y, jnp.asarray([1.0, 0.0]), tm, interpret=True,
        dtype=jnp.float32,
    )
    np.testing.assert_allclose(float(loss_p), float(ref_loss), rtol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(grads_p),
                    jax.tree_util.tree_leaves(ref_grads)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4,
                                   atol=2e-6)


def test_epoch_trajectory_matches_flax(setup):
    """Two scanned epochs on the kernel vs train.train_epoch: losses track
    to f32-accumulation tolerance."""
    from specenh.train import _epoch_batches

    model, params, x, y = setup
    tc = TrainConfig()
    bi, bm = _epoch_batches(2, 2, np.arange(2))
    bi, bm = jnp.asarray(bi), jnp.asarray(bm)
    tx = optax.adam(tc.learning_rate, b1=tc.beta1, b2=tc.beta2,
                    eps=tc.adam_eps)
    kepoch = kernel_train_epoch_fn3(SMALL, tx, interpret=True,
                                    dtype=jnp.float32)
    st_f = create_state(SMALL, tc).replace(params=params)
    st_k = create_state(SMALL, tc).replace(params=params)
    for _ in range(2):
        st_f, lf = train_epoch(st_f, x, y, bi, bm)
        st_k, lk = kepoch(st_k, x, y, bi, bm)
        np.testing.assert_allclose(
            np.asarray(lk), np.asarray(lf), rtol=5e-5, atol=1e-6
        )


def test_kernel_epoch_for_routes_depth3():
    """train.kernel_epoch_for dispatches depth-3 configs to this kernel."""
    from specenh.train import kernel_epoch_for

    fn = kernel_epoch_for(SMALL, TrainConfig(), interpret=True)
    assert fn is not None  # would raise NotImplementedError on bad routing


def test_grad_parity_deep3_preset():
    """The real deep3 preset (k5: chunked-K layers, (16,32,64) channels,
    3-wide enc0 shift windows) — one tile, f32 parity vs autodiff."""
    model = make_model(DEEP3)
    params = model.init(
        jax.random.PRNGKey(1), np.zeros((1, *DEEP3.input_shape), np.float32)
    )
    rng = np.random.default_rng(7)
    x = jnp.asarray(rng.random((1, 256, 128, 1)), jnp.float32)
    y = jnp.asarray((rng.random((1, 256, 128, 1)) > 0.6), jnp.float32)
    mask = jnp.ones(1, jnp.float32)
    ref_loss, ref_grads = _flax_value_and_grad(model, params, x, y, mask)
    tm = build_train_maps3(DEEP3)
    loss, grads = kernel_value_and_grad3(
        params, x, y, mask, tm, interpret=True, dtype=jnp.float32
    )
    np.testing.assert_allclose(float(loss), float(ref_loss), rtol=1e-5)
    flat_r, _ = jax.flatten_util.ravel_pytree(ref_grads)
    flat_k, _ = jax.flatten_util.ravel_pytree(grads)
    scale = float(jnp.abs(flat_r).max())
    err = float(jnp.abs(flat_k - flat_r).max())
    assert err < 2e-5 * max(scale, 1.0), (err, scale)
