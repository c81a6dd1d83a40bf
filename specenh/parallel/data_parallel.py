"""Data-parallel training over a device mesh.

The reference trains single-process Keras (VAE/hyperparam_scan.py:177-184).
Here the jitted train step runs SPMD over ``mesh``: the batch is sharded on
axis ``data``, parameters/optimizer state are replicated, and XLA's SPMD
partitioner inserts the gradient ``psum`` over ICI — the idiomatic JAX way,
no hand-written collectives needed (they live in timeshard.py where layout
control actually matters).
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from specenh.train import TrainState, bce_from_logits

__all__ = ["shard_batch", "make_dp_train_step", "make_dp_eval_step", "dp_fit"]


def shard_batch(mesh: Mesh, *arrays, axis: str = "data"):
    """Place arrays with their leading dim sharded over ``axis``.  Pads the
    batch up to a multiple of the axis size (mask-aware callers pass masks)."""
    sharding = NamedSharding(mesh, P(axis))
    return tuple(jax.device_put(a, sharding) for a in arrays)


def make_dp_train_step(mesh: Mesh, axis: str = "data"):
    """Jitted SPMD train step: batch sharded over ``axis``, state replicated.

    Returns step(state, x, y, mask) -> (state, loss).  Gradients are averaged
    globally (the masked-BCE mean already weights by real examples), so the
    update is bit-equivalent (up to reduction order) to the single-device
    step on the unsharded batch.
    """
    repl = NamedSharding(mesh, P())
    data = NamedSharding(mesh, P(axis))

    @partial(
        jax.jit,
        in_shardings=(repl, data, data, data),
        out_shardings=(repl, repl),
        donate_argnums=(0,),
    )
    def step(state: TrainState, x, y, mask):
        def loss_fn(params):
            logits = state.apply_fn(params, x, logits=True)
            return bce_from_logits(logits, y, mask)

        loss, grads = jax.value_and_grad(loss_fn)(state.params)
        return state.apply_gradients(grads=grads), loss

    return step


def make_dp_eval_step(mesh: Mesh, axis: str = "data"):
    repl = NamedSharding(mesh, P())
    data = NamedSharding(mesh, P(axis))

    @partial(jax.jit, in_shardings=(repl, data, data, data), out_shardings=repl)
    def step(state: TrainState, x, y, mask):
        logits = state.apply_fn(state.params, x, logits=True)
        return bce_from_logits(logits, y, mask)

    return step


def dp_fit(
    state: TrainState,
    x_train,
    y_train,
    mesh: Mesh,
    x_val=None,
    y_val=None,
    epochs: int = 15,
    batch_size: int = 128,
    seed: int = 0,
    shuffle: bool = True,
    verbose: bool = False,
) -> Tuple[TrainState, dict]:
    """Multi-device Keras-fit equivalent.  ``batch_size`` is GLOBAL; it is
    rounded up to a multiple of the mesh axis size with masked padding."""
    n_dev = int(np.prod([mesh.shape[a] for a in mesh.axis_names]))
    bs = max(batch_size, n_dev)
    bs += (-bs) % n_dev
    n = x_train.shape[0]
    x_train = jnp.asarray(x_train, jnp.float32)
    y_train = jnp.asarray(y_train, jnp.float32)
    rng = np.random.default_rng(seed)
    train_step = make_dp_train_step(mesh)
    eval_step = make_dp_eval_step(mesh)
    state = jax.device_put(state, NamedSharding(mesh, P()))
    history = {"loss": [], "val_loss": []}

    def run_batches(xs, ys, do_train, st):
        m = xs.shape[0]
        perm = rng.permutation(m) if (shuffle and do_train) else np.arange(m)
        losses, weights = [], []
        for i in range(0, m, bs):
            idx = perm[i : i + bs]
            w = np.ones(len(idx), np.float32)
            if len(idx) < bs:
                pad = bs - len(idx)
                idx = np.concatenate([idx, np.zeros(pad, idx.dtype)])
                w = np.concatenate([w, np.zeros(pad, np.float32)])
            xb, yb, wb = shard_batch(
                mesh, xs[jnp.asarray(idx)], ys[jnp.asarray(idx)], jnp.asarray(w)
            )
            if do_train:
                st, loss = train_step(st, xb, yb, wb)
            else:
                loss = eval_step(st, xb, yb, wb)
            losses.append(loss)
            weights.append(w.sum())
        losses = np.asarray(jax.device_get(losses))
        weights = np.asarray(weights)
        return st, float((losses * weights).sum() / weights.sum())

    for epoch in range(epochs):
        state, loss = run_batches(x_train, y_train, True, state)
        history["loss"].append(loss)
        if x_val is not None and len(x_val):
            _, vl = run_batches(
                jnp.asarray(x_val, jnp.float32), jnp.asarray(y_val, jnp.float32), False, state
            )
            history["val_loss"].append(vl)
        if verbose:
            print(f"epoch {epoch+1}/{epochs} loss={loss:.5f}"
                  + (f" val={history['val_loss'][-1]:.5f}" if history["val_loss"] else ""))
    return state, history
