"""Training loop for the denoising autoencoder.

Replaces Keras ``autoencoder.fit(x=noisy, y=pipeline_labels, epochs,
batch_size=128, shuffle=True, validation_data=...)``
(VAE/hyperparam_scan.py:177-184) with a jitted Optax/Flax step:

* Adam with Keras defaults (lr=1e-3, beta=(0.9, 0.999), eps=1e-7);
* sigmoid-BCE from logits (same optimum as Keras binary_crossentropy on
  sigmoid outputs, numerically stable);
* per-epoch shuffle (jax PRNG) and per-epoch validation pass, recorded as a
  Keras-style ``history`` dict — `history['val_loss']` drives model
  selection exactly as in manual_scan.py:216-224;
* optional orbax checkpointing per epoch + JSONL metrics (SURVEY.md section 5:
  the reference checkpoints only once, at the end, with no optimizer state —
  we checkpoint model+optimizer every epoch and can resume);
* the final partial batch is padded and masked (static shapes under jit),
  matching Keras's keep-remainder behaviour.
"""

from __future__ import annotations

import json
import os
import time
from functools import partial
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax.training import train_state

from specenh.config import ModelConfig, TrainConfig
from specenh.models.autoencoder import ConvAutoencoder, make_model

__all__ = [
    "TrainState",
    "create_state",
    "bce_from_logits",
    "train_step",
    "train_epoch",
    "kernel_epoch_for",
    "eval_loss",
    "fit",
    "predict",
    "restore_checkpoint",
    "latest_checkpoint_epoch",
    "write_run_meta",
    "check_run_meta",
]


class TrainState(train_state.TrainState):
    pass


def create_state(
    model_cfg: ModelConfig = ModelConfig(),
    train_cfg: TrainConfig = TrainConfig(),
    rng: Optional[jax.Array] = None,
    dtype=None,
) -> TrainState:
    """``dtype=jnp.bfloat16`` trains with bfloat16 activations (params and
    optimizer state stay float32): measured 0.19 vs 0.29 s/epoch on the
    reference recipe with an indistinguishable loss trajectory.  The
    default (None = float32) is the reference-exact path the Keras
    trajectory-parity test pins down."""
    model = make_model(model_cfg, dtype=dtype)
    rng = jax.random.PRNGKey(train_cfg.seed) if rng is None else rng
    params = model.init(rng, jnp.zeros((1, *model_cfg.input_shape), jnp.float32))
    tx = optax.adam(
        train_cfg.learning_rate,
        b1=train_cfg.beta1,
        b2=train_cfg.beta2,
        eps=train_cfg.adam_eps,
    )
    return TrainState.create(apply_fn=model.apply, params=params, tx=tx)


def bce_from_logits(logits: jax.Array, targets: jax.Array, mask=None) -> jax.Array:
    """Mean binary cross-entropy, computed from logits (stable)."""
    per = jnp.maximum(logits, 0) - logits * targets + jnp.log1p(jnp.exp(-jnp.abs(logits)))
    if mask is None:
        return jnp.mean(per)
    w = mask.reshape((-1,) + (1,) * (per.ndim - 1)).astype(per.dtype)
    return jnp.sum(per * w) / (jnp.sum(w) * np.prod(per.shape[1:]))


@jax.jit
def train_step(state: TrainState, x: jax.Array, y: jax.Array, mask: jax.Array):
    def loss_fn(params):
        logits = state.apply_fn(params, x, logits=True)
        return bce_from_logits(logits, y, mask)

    loss, grads = jax.value_and_grad(loss_fn)(state.params)
    return state.apply_gradients(grads=grads), loss


@jax.jit
def train_epoch(state: TrainState, x: jax.Array, y: jax.Array,
                batch_idx: jax.Array, batch_mask: jax.Array):
    """One full epoch as a single device program (lax.scan over batches).

    One dispatch per epoch instead of per batch — decisive on tunnelled
    backends where each host->device round trip costs ~50 ms.  ``batch_idx``
    (n_batches, bs) indexes the epoch's shuffled batches; padded slots are
    masked by ``batch_mask``.  Returns (state, per-batch losses).
    """

    def body(st, args):
        idx, m = args

        def loss_fn(params):
            logits = st.apply_fn(params, x[idx], logits=True)
            return bce_from_logits(logits, y[idx], m)

        loss, grads = jax.value_and_grad(loss_fn)(st.params)
        return st.apply_gradients(grads=grads), loss

    return jax.lax.scan(body, state, (batch_idx, batch_mask))


@jax.jit
def eval_epoch(state: TrainState, x: jax.Array, y: jax.Array,
               batch_idx: jax.Array, batch_mask: jax.Array):
    def body(_, args):
        idx, m = args
        logits = state.apply_fn(state.params, x[idx], logits=True)
        return None, bce_from_logits(logits, y[idx], m)

    return jax.lax.scan(body, None, (batch_idx, batch_mask))[1]


@jax.jit
def eval_loss(state: TrainState, x: jax.Array, y: jax.Array, mask: jax.Array):
    logits = state.apply_fn(state.params, x, logits=True)
    return bce_from_logits(logits, y, mask)


def _batches(n: int, bs: int, perm: np.ndarray):
    """Yield (index-array, mask) pairs of static size bs (last one padded)."""
    for i in range(0, n, bs):
        idx = perm[i : i + bs]
        m = np.ones(len(idx), np.float32)
        if len(idx) < bs:
            pad = bs - len(idx)
            idx = np.concatenate([idx, np.zeros(pad, idx.dtype)])
            m = np.concatenate([m, np.zeros(pad, np.float32)])
        yield idx, m


def _epoch_batches(n: int, bs: int, perm: np.ndarray):
    """All of an epoch's batches as stacked (n_batches, bs) index/mask
    arrays (the lax.scan form of _batches)."""
    idxs, masks = zip(*_batches(n, bs, perm))
    return np.stack(idxs).astype(np.int32), np.stack(masks)


def weighted_epoch_mean(losses, batch_mask) -> np.ndarray:
    """Mask-weighted mean of a scanned epoch's per-batch losses.

    ``losses``: (n_batches,) or (n_batches, n_cfg) device/host array;
    ``batch_mask``: (n_batches, bs) 0/1 padding mask.  The padded tail
    batch contributes proportionally to its real example count — exactly
    Keras's epoch-mean semantics."""
    losses = np.asarray(jax.device_get(losses))
    w = np.asarray(batch_mask).sum(axis=1)
    w = w.reshape(w.shape + (1,) * (losses.ndim - 1))
    return (losses * w).sum(axis=0) / w.sum()


def write_run_meta(checkpoint_dir: str, meta: Dict[str, Any]) -> None:
    """Record the run parameters the shuffle-stream replay depends on."""
    os.makedirs(checkpoint_dir, exist_ok=True)
    with open(os.path.join(checkpoint_dir, "run_meta.json"), "w") as fh:
        json.dump(meta, fh)


def check_run_meta(
    checkpoint_dir: str, meta: Dict[str, Any], optional_keys=()
) -> None:
    """Refuse to resume when the dataset size / seed / batching differ from
    the checkpointed run: the replayed shuffle stream would silently diverge
    from the uninterrupted trajectory.

    ``optional_keys``: meta keys added after a schema change — ABSENT in
    the saved file is tolerated (old checkpoints stay resumable, the
    pre-meta permissive case), present-but-different still raises — in
    EITHER direction: a key the checkpointed run saved but the current
    meta omits is diffed against None, so e.g. a mesh-streamed run cannot
    be silently resumed by a command that dropped --devices."""
    path = os.path.join(checkpoint_dir, "run_meta.json")
    if not os.path.exists(path):
        return  # pre-meta checkpoints: keep the old permissive behaviour
    with open(path) as fh:
        saved = json.load(fh)
    diffs = {
        k: (saved.get(k), v)
        for k, v in meta.items()
        if saved.get(k) != v and not (k in optional_keys and k not in saved)
    }
    for k in optional_keys:
        if k in saved and k not in meta:
            diffs[k] = (saved[k], None)
    if diffs:
        raise ValueError(
            f"cannot resume from {checkpoint_dir}: run parameters changed "
            f"since the checkpointed run: {diffs} (saved, current) — the "
            "replayed shuffle stream would not match the original run"
        )


def latest_checkpoint_epoch(checkpoint_dir: str) -> Optional[int]:
    """Highest epoch_NNNN under ``checkpoint_dir``, or None."""
    if not os.path.isdir(checkpoint_dir):
        return None
    epochs = [
        int(d.split("_")[1])
        for d in os.listdir(checkpoint_dir)
        if d.startswith("epoch_") and d.split("_")[1].isdigit()
    ]
    return max(epochs) if epochs else None


def restore_checkpoint(state: TrainState, checkpoint_dir: str, epoch: int) -> TrainState:
    """Restore params + optimizer state saved by ``fit``'s per-epoch
    checkpointing (the resume the reference never had, SURVEY.md section 5)."""
    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    restored = ckptr.restore(
        os.path.join(os.path.abspath(checkpoint_dir), f"epoch_{epoch:04d}"),
        {"params": state.params, "opt_state": state.opt_state},
    )
    return state.replace(params=restored["params"], opt_state=restored["opt_state"])


# Error-message markers of a Pallas/Mosaic kernel that failed to COMPILE
# (VMEM overflow, layout rejection): these are geometry/compiler-version
# hazards, not user errors — the kernel engines fall back to the Flax
# epoch instead of hard-failing (e.g. the k7/(64,32,64) depth-3 training
# config sits at 114.8M of the 125M Mosaic VMEM cap; a compiler update
# could push it over).  Anything else propagates.
_KERNEL_COMPILE_MARKERS = (
    "mosaic", "vmem", "resource_exhausted", "resource exhausted",
    "scoped memory", "scratch memory",
)


def _is_kernel_compile_error(e: Exception) -> bool:
    s = str(e).lower()
    return any(m in s for m in _KERNEL_COMPILE_MARKERS)


def with_flax_fallback(kernel_epoch, fallback_epoch, label: str = "fused kernel"):
    """Wrap a Pallas epoch fn so a Mosaic compile failure degrades to the
    Flax epoch with a warning instead of killing the run.  The failure
    surfaces on the FIRST call (jit compile); the epoch state is untouched
    by a failed compile, so retrying the same arguments on the fallback is
    exact.  Subsequent epochs go straight to the fallback."""
    import warnings

    use_fallback = [False]

    def epoch(st, *args):
        if not use_fallback[0]:
            try:
                return kernel_epoch(st, *args)
            except Exception as e:  # noqa: BLE001 — filtered below
                if not _is_kernel_compile_error(e):
                    raise
                warnings.warn(
                    f"{label} failed to compile for this geometry "
                    f"({type(e).__name__}); falling back to the Flax epoch "
                    f"— first error line: {str(e).splitlines()[0][:200]}"
                )
                use_fallback[0] = True
        return fallback_epoch(st, *args)

    return epoch


def kernel_epoch_for(model_cfg: ModelConfig, train_cfg: TrainConfig,
                     block_tiles: int = 1, interpret: bool = False,
                     dtype=None):
    """Epoch function on the fused Pallas TRAINING kernel — pass as
    ``fit(..., epoch_fn=...)``.  Depth-2 geometries route to
    specenh.ops.ae_train_kernel, depth-3 to ops.ae3_train_kernel; both run
    forward+backward in one VMEM-resident kernel and unscatter grads to
    the same conv params, so checkpoints/val/predict are unchanged."""
    import optax

    tx = optax.adam(
        train_cfg.learning_rate, b1=train_cfg.beta1, b2=train_cfg.beta2,
        eps=train_cfg.adam_eps,
    )
    if model_cfg.depth == 3:
        from specenh.ops.ae3_train_kernel import kernel_train_epoch_fn3

        ep = kernel_train_epoch_fn3(
            model_cfg, tx, block_tiles=block_tiles, interpret=interpret,
            dtype=jnp.bfloat16 if dtype is None else dtype,
        )
    else:
        from specenh.ops.ae_train_kernel import kernel_train_epoch_fn

        ep = kernel_train_epoch_fn(
            model_cfg, tx, block_tiles=block_tiles, interpret=interpret,
            dtype=jnp.bfloat16 if dtype is None else dtype,
        )
    return with_flax_fallback(ep, train_epoch)


def fit(
    state: TrainState,
    x_train: jax.Array,
    y_train: jax.Array,
    x_val: Optional[jax.Array] = None,
    y_val: Optional[jax.Array] = None,
    cfg: TrainConfig = TrainConfig(),
    epochs: Optional[int] = None,
    metrics_path: Optional[str] = None,
    checkpoint_dir: Optional[str] = None,
    resume: bool = False,
    epoch_fn=None,
    verbose: bool = False,
) -> tuple[TrainState, Dict[str, list]]:
    """Keras-fit equivalent.  Returns (final_state, history) with history
    keys 'loss' and 'val_loss' (per-epoch means, as Keras reports).

    With ``checkpoint_dir`` set and ``resume=True``, training continues
    from the latest saved epoch (params + optimizer state restored; the
    per-epoch shuffle streams are replayed so the batch order matches an
    uninterrupted run).

    ``epoch_fn`` swaps the scanned-epoch engine (same signature as
    ``train_epoch``) — e.g. ``kernel_epoch_for(...)`` for the fused
    Pallas training kernel."""
    epochs = cfg.epochs if epochs is None else epochs
    n = x_train.shape[0]
    bs = min(cfg.batch_size, n)
    x_train = jnp.asarray(x_train, jnp.float32)
    y_train = jnp.asarray(y_train, jnp.float32)
    rng = np.random.default_rng(cfg.seed)
    history: Dict[str, list] = {"loss": [], "val_loss": []}
    writer = open(metrics_path, "a") if metrics_path else None
    ckptr = None
    if checkpoint_dir:
        import orbax.checkpoint as ocp

        ckptr = ocp.StandardCheckpointer()
        checkpoint_dir = os.path.abspath(checkpoint_dir)

    run_meta = {
        "n": int(n), "seed": int(cfg.seed), "batch_size": int(bs),
        "shuffle": bool(cfg.shuffle),
    }
    start_epoch = 0
    if resume and checkpoint_dir:
        last = latest_checkpoint_epoch(checkpoint_dir)
        if last is not None:
            check_run_meta(checkpoint_dir, run_meta)
            state = restore_checkpoint(state, checkpoint_dir, last)
            start_epoch = last + 1
            for _ in range(start_epoch):  # replay shuffle stream
                if cfg.shuffle:
                    rng.permutation(n)
            # restore the loss history too, so the returned curves cover
            # the pre-resume epochs (sidecar JSON; pre-history checkpoints
            # just resume with an empty history as before)
            hpath = os.path.join(checkpoint_dir, "history.json")
            if os.path.exists(hpath):
                with open(hpath) as fh:
                    saved_hist = json.load(fh)
                history["loss"] = list(saved_hist.get("loss", []))[:start_epoch]
                history["val_loss"] = list(
                    saved_hist.get("val_loss", [])
                )[:start_epoch]
            if verbose:
                print(f"resumed from epoch {last}")
    if ckptr:
        write_run_meta(checkpoint_dir, run_meta)

    # opt-in early stopping (cfg.patience; the reference's commented-out
    # EarlyStopping(monitor='val_loss', patience=15), manual_scan.py:175):
    # stop after `patience` epochs without a val_loss improvement, keeping
    # the final weights — Keras's restore_best_weights=False default.
    # Seeded from any RESTORED history so resume counts stale epochs
    # exactly as the uninterrupted run would.
    best_val = min(history["val_loss"], default=np.inf)
    stale = 0
    if cfg.patience is not None and history["val_loss"]:
        b = int(np.argmin(history["val_loss"]))
        stale = len(history["val_loss"]) - 1 - b
        if stale >= cfg.patience:
            # the restored history already satisfies the stopping
            # criterion — an uninterrupted run stopped here, so a resume
            # must not train one epoch further (round-4 advisor finding)
            history["stopped_epoch"] = start_epoch - 1
            start_epoch = epochs
            if verbose:
                print(f"resume: already early-stopped (val_loss stale "
                      f"{stale} >= patience {cfg.patience})")

    for epoch in range(start_epoch, epochs):
        t0 = time.perf_counter()
        perm = rng.permutation(n) if cfg.shuffle else np.arange(n)
        batch_idx, batch_mask = _epoch_batches(n, bs, perm)
        # whole epoch = ONE device program (scan over batches): one dispatch
        # per epoch instead of per batch
        state, losses = (epoch_fn or train_epoch)(
            state, x_train, y_train, jnp.asarray(batch_idx), jnp.asarray(batch_mask)
        )
        epoch_loss = float(weighted_epoch_mean(losses, batch_mask))
        history["loss"].append(epoch_loss)

        val = None
        if x_val is not None and len(x_val):
            val = evaluate(state, x_val, y_val, bs)
            history["val_loss"].append(val)
        dt = time.perf_counter() - t0
        if verbose:
            msg = f"epoch {epoch + 1}/{epochs} loss={epoch_loss:.5f}"
            if val is not None:
                msg += f" val_loss={val:.5f}"
            print(msg + f" ({dt:.2f}s)")
        if writer:
            writer.write(
                json.dumps(
                    {
                        "epoch": epoch,
                        "loss": epoch_loss,
                        "val_loss": val,
                        "sec": dt,
                    }
                )
                + "\n"
            )
            writer.flush()
        if ckptr:
            ckptr.save(
                os.path.join(checkpoint_dir, f"epoch_{epoch:04d}"),
                {"params": state.params, "opt_state": state.opt_state},
                force=True,
            )
            with open(os.path.join(checkpoint_dir, "history.json"), "w") as fh:
                json.dump(history, fh)
        if cfg.patience is not None and val is not None:
            if val < best_val:
                best_val, stale = val, 0
            else:
                stale += 1
            if stale >= cfg.patience:
                history["stopped_epoch"] = epoch
                if ckptr:
                    # the epoch's history.json predates this key — rewrite
                    # so the persisted history records the stop (resume
                    # reads it back via the stale-seeding above)
                    with open(os.path.join(checkpoint_dir,
                                           "history.json"), "w") as fh:
                        json.dump(history, fh)
                if verbose:
                    print(f"early stopping: val_loss stale for "
                          f"{cfg.patience} epochs (best {best_val:.5f})")
                break
    if writer:
        writer.close()
    if ckptr:
        ckptr.wait_until_finished()
    # epochs actually trained this call (0 when resume found a finished
    # run); lets callers distinguish "resumed complete" from "trained",
    # which the restored loss history alone no longer can
    history["new_epochs"] = max(0, epochs - start_epoch)
    return state, history


def evaluate(state: TrainState, x: jax.Array, y: jax.Array, bs: int = 128) -> float:
    n = x.shape[0]
    x = jnp.asarray(x, jnp.float32)
    y = jnp.asarray(y, jnp.float32)
    batch_idx, batch_mask = _epoch_batches(n, min(bs, n), np.arange(n))
    losses = eval_epoch(state, x, y, jnp.asarray(batch_idx), jnp.asarray(batch_mask))
    return float(weighted_epoch_mean(losses, batch_mask))


@partial(jax.jit, static_argnames=())
def _predict_jit(state: TrainState, x: jax.Array) -> jax.Array:
    return state.apply_fn(state.params, x)


def predict(state: TrainState, x: jax.Array, bs: int = 512) -> jax.Array:
    """Keras ``model.predict`` equivalent: sigmoid probabilities, batched."""
    x = jnp.asarray(x, jnp.float32)
    n = x.shape[0]
    if n <= bs:
        return _predict_jit(state, x)
    outs = []
    for i in range(0, n - bs + 1, bs):
        outs.append(_predict_jit(state, jax.lax.dynamic_slice_in_dim(x, i, bs)))
    rem = n % bs
    if rem:
        pad = jnp.concatenate([x[n - rem :], jnp.zeros((bs - rem, *x.shape[1:]), x.dtype)])
        outs.append(_predict_jit(state, pad)[:rem])
    return jnp.concatenate(outs, axis=0)


def save_model(state: TrainState, path: str, model_cfg: ModelConfig):
    """Persist params + config (orbax), layout mirroring the reference's
    directory-per-variant convention (hyperparam_scan.py:191)."""
    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    ckptr.save(os.path.abspath(path), {"params": state.params}, force=True)
    ckptr.wait_until_finished()
    with open(os.path.join(path, "model_config.json"), "w") as fh:
        json.dump(
            {
                "filters": list(model_cfg.filters),
                "kernels": [list(k) for k in model_cfg.kernels],
                "out_kernel": list(model_cfg.out_kernel),
                "input_shape": list(model_cfg.input_shape),
            },
            fh,
        )


def load_model(path: str, train_cfg: TrainConfig = TrainConfig()):
    """Counterpart of Keras ``load_model`` (hyperparam_scan.py:27)."""
    import orbax.checkpoint as ocp

    with open(os.path.join(path, "model_config.json")) as fh:
        d = json.load(fh)
    model_cfg = ModelConfig(
        filters=tuple(d["filters"]),
        kernels=tuple(tuple(k) for k in d["kernels"]),
        out_kernel=tuple(d["out_kernel"]),
        input_shape=tuple(d["input_shape"]),
    )
    state = create_state(model_cfg, train_cfg)
    ckptr = ocp.StandardCheckpointer()
    restored = ckptr.restore(os.path.abspath(path), {"params": state.params})
    return state.replace(params=restored["params"]), model_cfg
