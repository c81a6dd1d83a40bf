"""Data-parallel training over a device mesh.

The reference trains single-process Keras (VAE/hyperparam_scan.py:177-184).
Here the jitted train step runs SPMD over ``mesh``: the batch is sharded on
axis ``data``, parameters/optimizer state are replicated, and XLA's SPMD
partitioner inserts the gradient ``psum`` over ICI — the idiomatic JAX way,
no hand-written collectives needed (they live in timeshard.py where layout
control actually matters).
"""

from __future__ import annotations

import json
import os
import time
from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from specenh.train import TrainState, bce_from_logits

__all__ = [
    "shard_batch",
    "make_dp_train_step",
    "make_dp_eval_step",
    "make_dp_epoch_programs",
    "dp_fit",
]


def shard_batch(mesh: Mesh, *arrays, axis: str = "data"):
    """Place arrays with their leading dim sharded over ``axis``.  The
    leading dim must already be a multiple of the axis size — ``dp_fit``
    pads its batches (with zero masks) before calling this."""
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


def make_dp_epoch_programs(mesh: Mesh, axis: str = "data"):
    """The SPMD epoch programs shared by ``dp_fit`` and
    ``train_stream.fit_streaming(mesh=...)``: one ``lax.scan`` over the
    epoch's batch-index/mask arrays, dataset sharded over ``axis``, state
    replicated.  Each scanned batch gather ``x[idx]`` runs on the sharded
    operand and carries a ``with_sharding_constraint`` back onto ``axis``,
    so the partitioner keeps batches distributed and inserts the gradient
    psum.  Returns ``(train_epoch, eval_epoch)`` with ``train.train_epoch``
    /``eval_epoch``'s exact call contract."""
    from specenh.train import bce_from_logits

    repl = NamedSharding(mesh, P())
    data = NamedSharding(mesh, P(axis))

    def batch_loss(params, apply_fn, xb, yb, wb):
        xb = jax.lax.with_sharding_constraint(xb, data)
        yb = jax.lax.with_sharding_constraint(yb, data)
        wb = jax.lax.with_sharding_constraint(wb, data)
        return bce_from_logits(apply_fn(params, xb, logits=True), yb, wb)

    @partial(jax.jit, out_shardings=(repl, repl), donate_argnums=(0,))
    def train_epoch(st, xs, ys, batch_idx, batch_mask):
        def body(st, args):
            idx, w = args

            def loss_fn(params):
                return batch_loss(params, st.apply_fn, xs[idx], ys[idx], w)

            loss, grads = jax.value_and_grad(loss_fn)(st.params)
            return st.apply_gradients(grads=grads), loss

        return jax.lax.scan(body, st, (batch_idx, batch_mask))

    @partial(jax.jit, out_shardings=repl)
    def eval_epoch(st, xs, ys, batch_idx, batch_mask):
        def body(_, args):
            idx, w = args
            return 0, batch_loss(st.params, st.apply_fn, xs[idx], ys[idx], w)

        return jax.lax.scan(body, 0, (batch_idx, batch_mask))[1]

    return train_epoch, eval_epoch


def _put_sharded(a, sharding, n_dev: int):
    """Place ``a`` with its leading dim sharded, zero-padding it to a
    multiple of the shard count (padded rows are never indexed: batch
    index arrays only cover the real row range).

    Already-device-resident inputs (the e2e paths hand us jax.Arrays) pad
    and reshard ON DEVICE — round-tripping through numpy would cost a
    device->host pull plus a ~2 MB/s tunnel re-upload per tensor.

    bfloat16 host arrays are sharded AS bf16 (half the host->device bytes
    — the binding term of a cached streamed epoch under a mesh): the
    kernel engine casts its tile operands to bf16 anyway
    (ae_train_kernel.tiles_to_x16) and the Flax engines promote bf16
    inputs to f32 in the first conv, so the step equals the single-chip
    stream's on the same bf16 chunks.  Any other non-f32 dtype still
    normalizes to float32."""
    if isinstance(a, jax.Array):
        pad = (-a.shape[0]) % n_dev
        if pad:
            a = jnp.concatenate(
                [a, jnp.zeros((pad, *a.shape[1:]), a.dtype)]
            )
        return jax.device_put(a, sharding)
    a = np.asarray(a)
    if a.dtype != np.float32 and a.dtype.name != "bfloat16":
        a = a.astype(np.float32)
    pad = (-len(a)) % n_dev
    if pad:
        a = np.concatenate([a, np.zeros((pad, *a.shape[1:]), a.dtype)])
    return jax.device_put(a, sharding)


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
    dataset_sharding: str = "data",
    metrics_path: Optional[str] = None,
    checkpoint_dir: Optional[str] = None,
    resume: bool = False,
    epoch_fn=None,
    patience: Optional[int] = None,
    verbose: bool = False,
) -> Tuple[TrainState, dict]:
    """Multi-device Keras-fit equivalent.  ``batch_size`` is GLOBAL; it is
    rounded up to a multiple of the mesh axis size with masked padding.

    One dispatch per epoch: the whole dataset lives on the devices —
    SHARDED over the ``data`` axis (each chip holds 1/n of the tiles, so
    the aggregate HBM of the mesh bounds the dataset, not one chip's; the
    reference's 200-shot recipe needs ~31 GB of tile tensors, over a
    single v5e's 16 GB) — and every epoch is a single ``lax.scan``
    program.  The scanned batch gather ``x[idx]`` runs on the sharded
    operand (the SPMD partitioner distributes it; traffic ~ batch size,
    not dataset size) and each per-batch tensor carries a
    ``with_sharding_constraint`` onto ``data``, so the partitioner keeps
    batches sharded and inserts the gradient psum — no per-batch host
    round-trips (~50 ms RTT each on a tunnelled TPU) and no per-epoch
    re-upload of the validation split.

    ``dataset_sharding='replicated'`` restores the round-2 behaviour
    (every device holds the full dataset; gathers are local) — kept for
    small datasets and as the comparison anchor: the sharded epoch matches
    it to ~1e-6 (see dryrun_multichip / test_data_parallel)."""
    from specenh.train import _epoch_batches, bce_from_logits, weighted_epoch_mean

    if dataset_sharding not in ("data", "replicated"):
        raise ValueError(f"dataset_sharding must be 'data' or 'replicated', got {dataset_sharding!r}")
    n_dev = int(np.prod([mesh.shape[a] for a in mesh.axis_names]))
    bs = max(batch_size, n_dev)
    bs += (-bs) % n_dev
    n = x_train.shape[0]
    # never exceed the (shard-padded) dataset: fit caps bs at n the same
    # way — a 12-tile dataset on 8 devices trains in one 16-tile batch,
    # not a 128-tile batch that is 90% padding
    bs = min(bs, n + (-n) % n_dev)
    repl = NamedSharding(mesh, P())
    data = NamedSharding(mesh, P("data"))
    ds_sh = data if dataset_sharding == "data" else repl
    x_train = _put_sharded(x_train, ds_sh, n_dev)
    y_train = _put_sharded(y_train, ds_sh, n_dev)
    have_val = x_val is not None and len(x_val)
    if have_val:
        n_val = len(x_val)
        x_val = _put_sharded(x_val, ds_sh, n_dev)
        y_val = _put_sharded(y_val, ds_sh, n_dev)
    rng = np.random.default_rng(seed)
    history = {"loss": [], "val_loss": []}

    # checkpoint/metrics/resume: same contract as train.fit — per-epoch
    # orbax (params + optimizer state), replayed shuffle stream, run-meta
    # guard, history sidecar.  Restore happens BEFORE the state is placed
    # on the mesh so orbax sees the plain host template.
    from specenh.train import (
        check_run_meta,
        latest_checkpoint_epoch,
        restore_checkpoint,
        write_run_meta,
    )

    writer = open(metrics_path, "a") if metrics_path else None
    ckptr = None
    if checkpoint_dir:
        import orbax.checkpoint as ocp

        ckptr = ocp.StandardCheckpointer()
        checkpoint_dir = os.path.abspath(checkpoint_dir)
    run_meta = {
        "n": int(n), "seed": int(seed), "batch_size": int(bs),
        "shuffle": bool(shuffle), "devices": int(n_dev),
    }
    start_epoch = 0
    if resume and checkpoint_dir:
        last = latest_checkpoint_epoch(checkpoint_dir)
        if last is not None:
            check_run_meta(checkpoint_dir, run_meta, optional_keys=("devices",))
            state = restore_checkpoint(state, checkpoint_dir, last)
            start_epoch = last + 1
            for _ in range(start_epoch):  # replay shuffle stream
                if shuffle:
                    rng.permutation(n)
            hpath = os.path.join(checkpoint_dir, "history.json")
            if os.path.exists(hpath):
                with open(hpath) as fh:
                    saved_hist = json.load(fh)
                history["loss"] = list(saved_hist.get("loss", []))[:start_epoch]
                history["val_loss"] = list(saved_hist.get("val_loss", []))[:start_epoch]
            if verbose:
                print(f"resumed from epoch {last}")
    if ckptr:
        write_run_meta(checkpoint_dir, run_meta)

    state = jax.device_put(state, repl)

    # epoch_fn: swapped engine (same contract as train.fit's epoch_fn) —
    # e.g. parallel.dp_kernel.dp_kernel_epoch_for's shard_map'd fused kernel
    dp_train, eval_epoch = make_dp_epoch_programs(mesh)
    train_epoch = epoch_fn if epoch_fn is not None else dp_train

    # n_val (not len(x_val)): the device copy may carry shard-padding rows
    val_batches = _epoch_batches(n_val, bs, np.arange(n_val)) if have_val else None

    # opt-in early stopping (see train.fit): seeded from restored history
    best_val = min(history["val_loss"], default=np.inf)
    stale = 0
    if patience is not None and history["val_loss"]:
        b = int(np.argmin(history["val_loss"]))
        stale = len(history["val_loss"]) - 1 - b
        if stale >= patience:
            # restored history already met the stopping criterion: resume
            # must not train further (round-4 advisor finding; see train.fit)
            history["stopped_epoch"] = start_epoch - 1
            start_epoch = epochs

    for epoch in range(start_epoch, epochs):
        t0 = time.perf_counter()
        perm = rng.permutation(n) if shuffle else np.arange(n)
        batch_idx, batch_mask = _epoch_batches(n, bs, perm)
        state, losses = train_epoch(
            state, x_train, y_train, jnp.asarray(batch_idx), jnp.asarray(batch_mask)
        )
        history["loss"].append(float(weighted_epoch_mean(losses, batch_mask)))
        if have_val:
            vi, vm = val_batches
            v_losses = eval_epoch(
                state, x_val, y_val, jnp.asarray(vi), jnp.asarray(vm)
            )
            history["val_loss"].append(float(weighted_epoch_mean(v_losses, vm)))
        dt = time.perf_counter() - t0
        if verbose:
            print(f"epoch {epoch+1}/{epochs} loss={history['loss'][-1]:.5f}"
                  + (f" val={history['val_loss'][-1]:.5f}" if history["val_loss"] else ""))
        if writer:
            writer.write(json.dumps({
                "epoch": epoch,
                "loss": history["loss"][-1],
                "val_loss": history["val_loss"][-1] if history["val_loss"] else None,
                "sec": dt,
                "devices": int(n_dev),
            }) + "\n")
            writer.flush()
        if ckptr:
            ckptr.save(
                os.path.join(checkpoint_dir, f"epoch_{epoch:04d}"),
                {"params": state.params, "opt_state": state.opt_state},
                force=True,
            )
            with open(os.path.join(checkpoint_dir, "history.json"), "w") as fh:
                json.dump(history, fh)
        if patience is not None and history["val_loss"]:
            val = history["val_loss"][-1]
            if val < best_val:
                best_val, stale = val, 0
            else:
                stale += 1
            if stale >= patience:
                history["stopped_epoch"] = epoch
                if ckptr:
                    # persist the stop into history.json (see train.fit)
                    with open(os.path.join(checkpoint_dir,
                                           "history.json"), "w") as fh:
                        json.dump(history, fh)
                if verbose:
                    print(f"early stopping: val_loss stale for "
                          f"{patience} epochs (best {best_val:.5f})")
                break
    if writer:
        writer.close()
    if ckptr:
        ckptr.wait_until_finished()
    # see train.fit: 0 when resume found a finished run
    history["new_epochs"] = max(0, epochs - start_epoch)
    return state, history
