"""Fused Pallas TRAINING kernel (specenh.ops.ae_train_kernel) vs
jax.value_and_grad on the Flax model — interpret mode on CPU.

The gradient identity is the whole ballgame: the kernel trains the
scattered operands and unscatters to conv-param grads; f32 parity with
autodiff catches any tap-adjoint, pool-routing, or map mistake.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import optax

from specenh.config import ModelConfig, TrainConfig
from specenh.models.autoencoder import make_model
from specenh.ops.ae_train_kernel import (
    build_train_maps,
    kernel_train_epoch_fn,
    kernel_value_and_grad,
    make_kernel_train_step,
)
from specenh.train import bce_from_logits, create_state, train_epoch

CFG = ModelConfig()


@pytest.fixture(scope="module")
def setup():
    model = make_model(CFG)
    params = model.init(
        jax.random.PRNGKey(0), np.zeros((1, *CFG.input_shape), np.float32)
    )
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.random((2, 256, 128, 1)), jnp.float32)
    y = jnp.asarray((rng.random((2, 256, 128, 1)) > 0.6), jnp.float32)
    return model, params, x, y


def _flax_value_and_grad(model, params, x, y, mask):
    def loss_fn(p):
        return bce_from_logits(model.apply(p, x, logits=True), y, mask)

    return jax.value_and_grad(loss_fn)(params)


def test_grad_parity_f32(setup):
    """f32 kernel grads vs autodiff of the Flax model: every leaf."""
    model, params, x, y = setup
    mask = jnp.ones(2, jnp.float32)
    ref_loss, ref_grads = _flax_value_and_grad(model, params, x, y, mask)
    tm = build_train_maps(CFG)
    loss, grads = kernel_value_and_grad(
        params, x, y, mask, tm, interpret=True, dtype=jnp.float32
    )
    np.testing.assert_allclose(float(loss), float(ref_loss), rtol=1e-5)
    flat_r, _ = jax.flatten_util.ravel_pytree(ref_grads)
    flat_k, _ = jax.flatten_util.ravel_pytree(grads)
    scale = float(jnp.abs(flat_r).max())
    err = float(jnp.abs(flat_k - flat_r).max())
    assert err < 2e-5 * max(scale, 1.0), (err, scale)


def test_grad_parity_masked_batch(setup):
    """A padded batch (mask 1,0) must produce grads identical to the
    unpadded single-tile batch."""
    model, params, x, y = setup
    tm = build_train_maps(CFG)
    loss_p, grads_p = kernel_value_and_grad(
        params, x, y, jnp.asarray([1.0, 0.0]), tm, interpret=True,
        dtype=jnp.float32,
    )
    loss_1, grads_1 = kernel_value_and_grad(
        params, x[:1], y[:1], jnp.ones(1), tm, interpret=True,
        dtype=jnp.float32,
    )
    np.testing.assert_allclose(float(loss_p), float(loss_1), rtol=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(grads_p),
                    jax.tree_util.tree_leaves(grads_1)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-5,
                                   atol=1e-8)


def test_step_matches_flax_step(setup):
    """One full optimizer step (Adam, Keras eps) matches train.train_step
    to f32 tolerance."""
    from specenh.train import train_step

    model, params, x, y = setup
    tc = TrainConfig()
    mask = jnp.ones(2, jnp.float32)
    state_f = create_state(CFG, tc).replace(params=params)
    state_k = create_state(CFG, tc).replace(params=params)
    tx = optax.adam(tc.learning_rate, b1=tc.beta1, b2=tc.beta2, eps=tc.adam_eps)
    kstep = make_kernel_train_step(CFG, tx, interpret=True, dtype=jnp.float32)
    state_f, loss_f = train_step(state_f, x, y, mask)
    state_k, loss_k = kstep(state_k, x, y, mask)
    np.testing.assert_allclose(float(loss_k), float(loss_f), rtol=1e-5)
    fa, _ = jax.flatten_util.ravel_pytree(state_f.params)
    ka, _ = jax.flatten_util.ravel_pytree(state_k.params)
    # Adam's update is lr * m/(sqrt(v)+eps): for near-zero grads the ratio
    # amplifies f32 reduction-order noise — allow a small fraction of the
    # lr=1e-3 step size
    np.testing.assert_allclose(np.asarray(ka), np.asarray(fa), atol=2e-4)


@pytest.mark.parametrize("pre_layout", [True, False], ids=["pre3d", "turn2d"])
def test_epoch_trajectory_matches_flax(setup, pre_layout):
    """Two scanned epochs on the kernel vs train.train_epoch: losses track
    to f32-accumulation tolerance (both the pre-layout per-tile form and
    the 2-D corner-turn form)."""
    from specenh.train import _epoch_batches

    model, params, x, y = setup
    tc = TrainConfig()
    bi, bm = _epoch_batches(2, 2, np.arange(2))
    bi, bm = jnp.asarray(bi), jnp.asarray(bm)
    tx = optax.adam(tc.learning_rate, b1=tc.beta1, b2=tc.beta2, eps=tc.adam_eps)
    kepoch = kernel_train_epoch_fn(CFG, tx, interpret=True, dtype=jnp.float32,
                                   pre_layout=pre_layout)
    state_f = create_state(CFG, tc).replace(params=params)
    state_k = create_state(CFG, tc).replace(params=params)
    for _ in range(2):
        state_f, losses_f = train_epoch(state_f, x, y, bi, bm)
        state_k, losses_k = kepoch(state_k, x, y, bi, bm)
        np.testing.assert_allclose(
            np.asarray(losses_k), np.asarray(losses_f), rtol=1e-4
        )


def test_fit_with_kernel_engine(setup):
    """fit(epoch_fn=kernel_epoch_for(...)) — the CLI --engine kernel path —
    tracks the stock fit trajectory."""
    from specenh.train import fit, kernel_epoch_for

    model, params, x, y = setup
    tc = TrainConfig(batch_size=2, seed=0, shuffle=False)
    s0 = create_state(CFG, tc).replace(params=params)
    s1 = create_state(CFG, tc).replace(params=params)
    _, h_flax = fit(s0, x, y, cfg=tc, epochs=2)
    ep = kernel_epoch_for(CFG, tc, interpret=True, dtype=jnp.float32)
    _, h_kern = fit(s1, x, y, cfg=tc, epochs=2, epoch_fn=ep)
    np.testing.assert_allclose(h_kern["loss"], h_flax["loss"], rtol=1e-4)


@pytest.mark.parametrize(
    "cfg",
    [
        ModelConfig(),
        ModelConfig(kernels=((5, 5), (5, 5)), out_kernel=(5, 5)),
        ModelConfig(kernels=((7, 7), (7, 7)), out_kernel=(7, 7)),
        ModelConfig(filters=(64, 32), kernels=((5, 5), (5, 5)),
                    out_kernel=(5, 5)),
    ],
    ids=["k3", "k5", "k7", "manual"],
)
def test_structured_assembly_matches_gather(cfg):
    """The gather-free static-slice assembly (the default path) must equal
    the fused-gather assembly on every supported geometry, both directions.
    Also guards the map build against backend precision drift: the ids are
    probed through ConvTranspose at Precision.HIGHEST (fused_ae.py), and
    the affine-tiling derivation rejects any corrupted map outright."""
    from specenh.ops.ae_train_kernel import (
        _fused_maps,
        flatten_params,
        gather_train_weights_structured,
        unflatten_grads,
        unscatter_grads_structured,
    )

    tm = build_train_maps(cfg)
    params = make_model(cfg).init(
        jax.random.PRNGKey(1), np.zeros((1, *cfg.input_shape), np.float32)
    )
    # fused-gather reference, inlined (the public fns route to structured)
    flat = flatten_params(params)
    big_np, sizes, offs = _fused_maps(tm)
    big = jnp.asarray(big_np)
    all_w = jnp.where(big >= 0, flat[jnp.clip(big, 0)], 0.0)
    ops = [
        jax.lax.dynamic_slice_in_dim(all_w, off, size, 0).reshape(
            np.asarray(m).shape
        )
        for m, size, off in zip(tm.maps, sizes, offs)
    ]
    fwd_s, bwd_s = gather_train_weights_structured(params, tm, jnp.float32)
    w_ref = [ops[0], ops[2], ops[4], ops[6], ops[8]]
    w_got = [fwd_s[0], fwd_s[2], fwd_s[4], fwd_s[6], fwd_s[8]]
    for ref, got in zip(w_ref, w_got):
        np.testing.assert_array_equal(np.asarray(ref, np.float32),
                                      np.asarray(got, np.float32))
    b_ref = [ops[1], ops[3], ops[5], ops[7], ops[9]]
    b_got = [fwd_s[1], fwd_s[3], fwd_s[5], fwd_s[7], fwd_s[9]]
    for ref, got in zip(b_ref, b_got):
        np.testing.assert_array_equal(np.asarray(ref), np.asarray(got))

    # unscatter: structured slice-sums vs the fused scatter-add
    rng = np.random.default_rng(0)
    gops = [jnp.asarray(rng.random(np.asarray(m).shape), jnp.float32)
            for m in tm.maps]
    vals = jnp.concatenate([g.ravel() for g in gops])
    flat_g = jnp.zeros((tm.n_params,), jnp.float32).at[
        jnp.clip(big, 0)
    ].add(jnp.where(big >= 0, vals, 0.0))
    ref_grads = unflatten_grads(flat_g, tm.layout)
    got_grads = unscatter_grads_structured(gops, tm)
    for a, b in zip(jax.tree_util.tree_leaves(ref_grads),
                    jax.tree_util.tree_leaves(got_grads)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-6, atol=1e-6)


def test_bf16_kernel_grads_close(setup):
    """bf16 operands (the production mode): grads within bf16 tolerance of
    autodiff — the trajectory-parity analog of the --bf16 gate."""
    model, params, x, y = setup
    mask = jnp.ones(2, jnp.float32)
    _, ref_grads = _flax_value_and_grad(model, params, x, y, mask)
    tm = build_train_maps(CFG)
    _, grads = kernel_value_and_grad(
        params, x, y, mask, tm, interpret=True, dtype=jnp.bfloat16
    )
    flat_r, _ = jax.flatten_util.ravel_pytree(ref_grads)
    flat_k, _ = jax.flatten_util.ravel_pytree(grads)
    denom = float(jnp.abs(flat_r).max())
    assert float(jnp.abs(flat_k - flat_r).max()) / denom < 5e-2


def test_bf16_rounded_inputs_identical_sums():
    """The kernel casts tile operands to bf16 internally (tiles_to_x16/
    y16), so pre-rounded bf16 inputs — the --chunk-dtype bf16 streamed
    cache — produce the IDENTICAL loss/grad sums (value-exactness of the
    half-RAM half-upload cache for --engine kernel)."""
    import jax.numpy as jnp

    from specenh.config import ModelConfig
    from specenh.ops.ae_train_kernel import build_train_maps, kernel_loss_grad_sums
    from specenh.train import create_state

    cfg = ModelConfig()
    tm = build_train_maps(cfg)
    state = create_state(cfg)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.random((2, 256, 128, 1)), jnp.float32)
    y = jnp.asarray(rng.random((2, 256, 128, 1)), jnp.float32)
    m = jnp.ones((2,), jnp.float32)
    a = kernel_loss_grad_sums(state.params, x, y, m, tm,
                              interpret=True, dtype=jnp.bfloat16)
    b = kernel_loss_grad_sums(state.params,
                              x.astype(jnp.bfloat16), y.astype(jnp.bfloat16),
                              m, tm, interpret=True, dtype=jnp.bfloat16)
    assert float(a[0]) == float(b[0])
    for ga, gb in zip(jax.tree_util.tree_leaves(a[2]),
                      jax.tree_util.tree_leaves(b[2])):
        np.testing.assert_array_equal(np.asarray(ga), np.asarray(gb))
