"""Hyperparameter sweeps, TPU-native.

The reference runs sweeps as a SLURM job array (one process per kernel size,
VAE/hyperparam_scan.py:122-123) or serial nested loops over
(ker1, ker2, ker3, conv1, conv2) (VAE/manual_scan.py:183-252) /
(ker, conv1, conv2, conv3) (VAE/manual_scan_3layers.py).

Here ALL configs train SIMULTANEOUSLY in one jitted, vmapped program:

* every config is embedded in the maximal architecture (largest kernel,
  widest filters) — a conv whose kernel is zero-padded from (3,3) to (7,7)
  computes exactly the same function, and masking the weights in the
  FORWARD pass makes the masked taps' gradients exactly zero, so each
  config's training trajectory is identical to training it standalone;
* per-config parameters are initialised at their TRUE shapes (Keras
  glorot-uniform fan-in/fan-out of the unpadded kernel) then placed into
  the padded buffers;
* ``jax.vmap`` over the stacked config axis turns the sweep into one big
  batched conv program on the MXU; on a multi-chip mesh the config axis can
  additionally be sharded over a 'sweep' axis (the SLURM-array analog, on
  chips, with zero host orchestration).

Artifacts mirror the reference: per-config ``val_losses`` tensor, best-model
selection on final val loss (manual_scan.py:216-224), per-parameter marginal
averages (``loss_comparisons.npz``, manual_scan.py:302-364).
"""

from __future__ import annotations

import dataclasses
import itertools
import json
import os
from dataclasses import dataclass
from functools import partial
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from specenh.config import ModelConfig, SweepConfig, TrainConfig
from specenh.models.autoencoder import make_model
from specenh.train import bce_from_logits

__all__ = [
    "SweepResult",
    "expand_grid_2layer",
    "expand_grid_3layer",
    "envelope_config",
    "init_stacked_params",
    "sweep_fit",
    "sweep_fit_serial",
    "extract_config_params",
    "embed_config_params",
    "marginal_report",
]


# ---------------------------------------------------------------------------
# config grids
# ---------------------------------------------------------------------------


def expand_grid_2layer(sw: SweepConfig) -> Tuple[List[ModelConfig], Tuple[int, ...]]:
    """manual_scan.py grid: (ker1, ker2, ker3, conv1, conv2)."""
    cfgs = [
        ModelConfig(filters=(c1, c2), kernels=(k1, k2), out_kernel=k3)
        for k1, k2, k3, c1, c2 in itertools.product(
            sw.ker1_vals, sw.ker2_vals, sw.ker3_vals, sw.conv1_vals, sw.conv2_vals
        )
    ]
    shape = (
        len(sw.ker1_vals), len(sw.ker2_vals), len(sw.ker3_vals),
        len(sw.conv1_vals), len(sw.conv2_vals),
    )
    return cfgs, shape


def expand_grid_3layer(sw: SweepConfig) -> Tuple[List[ModelConfig], Tuple[int, ...]]:
    """manual_scan_3layers.py grid: (ker, conv1, conv2, conv3).

    Uses the dedicated ``*_3layer`` axes (manual_scan_3layers.py:119-123):
    the shipped reference scan is the single deep3 config — k5, filters
    (16, 32, 64) — not the 2-layer manual scan's 64/32."""
    kers = list(sw.ker_vals_3layer)
    cfgs = [
        ModelConfig(filters=(c1, c2, c3), kernels=(k, k, k), out_kernel=k)
        for k, c1, c2, c3 in itertools.product(
            kers, sw.conv1_vals_3layer, sw.conv2_vals_3layer,
            sw.conv3_vals_3layer
        )
    ]
    shape = (len(kers), len(sw.conv1_vals_3layer),
             len(sw.conv2_vals_3layer), len(sw.conv3_vals_3layer))
    return cfgs, shape


def envelope_config(configs: Sequence[ModelConfig]) -> ModelConfig:
    """The maximal architecture containing every config in the sweep.

    All kernel dims must be ODD: the zero-padding equivalence (centred
    embedding under SAME padding) breaks for even kernels, whose SAME pad
    split shifts by one — an even kernel embedded in a larger envelope
    computes a spatially shifted conv (verified ~4e-2 output divergence).
    """
    for c in configs:
        for k in (*c.kernels, c.out_kernel):
            if k[0] % 2 == 0 or k[1] % 2 == 0:
                raise ValueError(
                    f"sweep kernels must be odd for exact envelope embedding; got {k}"
                )
    depth = {c.depth for c in configs}
    if len(depth) != 1:
        raise ValueError("all sweep configs must share depth")
    d = depth.pop()
    filters = tuple(max(c.filters[i] for c in configs) for i in range(d))
    kernels = tuple(
        (
            max(c.kernels[i][0] for c in configs),
            max(c.kernels[i][1] for c in configs),
        )
        for i in range(d)
    )
    out_kernel = (
        max(c.out_kernel[0] for c in configs),
        max(c.out_kernel[1] for c in configs),
    )
    return ModelConfig(
        filters=filters, kernels=kernels, out_kernel=out_kernel,
        input_shape=configs[0].input_shape,
    )


# ---------------------------------------------------------------------------
# masked parameter embedding
# ---------------------------------------------------------------------------


def _placed(big_shape, small, off):
    out = np.zeros(big_shape, np.float32)
    sl = tuple(slice(o, o + s) for o, s in zip(off, small.shape))
    out[sl] = small
    return out


def _layer_names(depth: int) -> List[str]:
    enc = [f"enc_conv{i}" for i in range(depth)]
    dec = [f"dec_deconv{i}" for i in reversed(range(depth))]
    return enc + dec + ["out_conv"]


def _layer_geometry(cfg: ModelConfig):
    """Per-layer (kernel, cin, cout) in module order (matches the
    ConvAutoencoder definition)."""
    geo = []
    cin = cfg.input_shape[-1]
    for i in range(cfg.depth):
        geo.append((f"enc_conv{i}", cfg.kernels[i], cin, cfg.filters[i]))
        cin = cfg.filters[i]
    for i in reversed(range(cfg.depth)):
        geo.append((f"dec_deconv{i}", cfg.kernels[i], cin, cfg.filters[i]))
        cin = cfg.filters[i]
    geo.append(("out_conv", cfg.out_kernel, cin, 1))
    return geo


def _glorot(rng: np.random.Generator, shape) -> np.ndarray:
    """Keras/Flax glorot_uniform on an HWIO conv kernel: fan from the
    receptive field x channels."""
    kh, kw, cin, cout = shape
    fan_in, fan_out = kh * kw * cin, kh * kw * cout
    limit = np.sqrt(6.0 / (fan_in + fan_out))
    return rng.uniform(-limit, limit, size=shape).astype(np.float32)


def init_stacked_params(
    configs: Sequence[ModelConfig], env: ModelConfig, seed: int = 0
):
    """(stacked_params, stacked_masks): each config initialised at its true
    geometry (correct glorot fan) and zero-embedded into the envelope."""
    env_geo = {g[0]: (g[1], g[2], g[3]) for g in _layer_geometry(env)}
    p_stack: Dict[str, Dict[str, List[np.ndarray]]] = {}
    m_stack: Dict[str, Dict[str, List[np.ndarray]]] = {}
    for ci, cfg in enumerate(configs):
        rng = np.random.default_rng(seed * 100_003 + ci)
        for name, k, cin, cout in _layer_geometry(cfg):
            ek, ecin, ecout = env_geo[name]
            big_k = (ek[0], ek[1], ecin, ecout)
            off = ((ek[0] - k[0]) // 2, (ek[1] - k[1]) // 2, 0, 0)
            kern = _glorot(rng, (k[0], k[1], cin, cout))
            kernel = _placed(big_k, kern, off)
            kmask = _placed(big_k, np.ones((k[0], k[1], cin, cout), np.float32), off)
            bias = np.zeros(ecout, np.float32)
            bmask = _placed((ecout,), np.ones(cout, np.float32), (0,))
            p_stack.setdefault(name, {"kernel": [], "bias": []})
            m_stack.setdefault(name, {"kernel": [], "bias": []})
            p_stack[name]["kernel"].append(kernel)
            p_stack[name]["bias"].append(bias)
            m_stack[name]["kernel"].append(kmask)
            m_stack[name]["bias"].append(bmask)
    params = {
        "params": {
            n: {k: jnp.asarray(np.stack(v)) for k, v in d.items()}
            for n, d in p_stack.items()
        }
    }
    masks = {
        "params": {
            n: {k: jnp.asarray(np.stack(v)) for k, v in d.items()}
            for n, d in m_stack.items()
        }
    }
    return params, masks


def extract_config_params(stacked, idx: int, cfg: ModelConfig, env: ModelConfig):
    """Crop config ``idx`` back out of the stacked envelope into standalone
    params for ``make_model(cfg)`` (kernel window + channel ranges — the
    crop covers exactly the nonzero-mask region by construction)."""
    out = {}
    env_geo = {g[0]: (g[1], g[2], g[3]) for g in _layer_geometry(env)}
    for name, k, cin, cout in _layer_geometry(cfg):
        ek, _, _ = env_geo[name]
        oh, ow = (ek[0] - k[0]) // 2, (ek[1] - k[1]) // 2
        kern = np.asarray(stacked["params"][name]["kernel"][idx])
        bias = np.asarray(stacked["params"][name]["bias"][idx])
        out[name] = {
            "kernel": jnp.asarray(kern[oh : oh + k[0], ow : ow + k[1], :cin, :cout]),
            "bias": jnp.asarray(bias[:cout]),
        }
    return {"params": out}


def embed_config_params(stacked, idx: int, cfg: ModelConfig, env: ModelConfig,
                        params):
    """Inverse of ``extract_config_params``: place standalone params for
    ``cfg`` back into the stacked envelope at config ``idx`` (centred
    kernel window, leading channel ranges; everything outside zero, as at
    init).  Returns the updated stacked pytree."""
    env_geo = {g[0]: (g[1], g[2], g[3]) for g in _layer_geometry(env)}
    out = {"params": {n: dict(d) for n, d in stacked["params"].items()}}
    for name, k, cin, cout in _layer_geometry(cfg):
        ek, ecin, ecout = env_geo[name]
        oh, ow = (ek[0] - k[0]) // 2, (ek[1] - k[1]) // 2
        kern = np.zeros((ek[0], ek[1], ecin, ecout), np.float32)
        kern[oh:oh + k[0], ow:ow + k[1], :cin, :cout] = np.asarray(
            params["params"][name]["kernel"], np.float32
        )
        bias = np.zeros(ecout, np.float32)
        bias[:cout] = np.asarray(params["params"][name]["bias"], np.float32)
        out["params"][name]["kernel"] = (
            out["params"][name]["kernel"].at[idx].set(jnp.asarray(kern))
        )
        out["params"][name]["bias"] = (
            out["params"][name]["bias"].at[idx].set(jnp.asarray(bias))
        )
    return out


# ---------------------------------------------------------------------------
# the vmapped sweep
# ---------------------------------------------------------------------------


@dataclass
class SweepResult:
    configs: List[ModelConfig]
    env: ModelConfig
    val_losses: np.ndarray  # (n_cfg,) final-epoch val loss
    train_history: np.ndarray  # (epochs, n_cfg)
    val_history: np.ndarray  # (epochs, n_cfg)
    best_index: int
    best_params: dict  # standalone params of the best config
    stacked_params: dict
    masks: dict


def sweep_fit(
    configs: Sequence[ModelConfig],
    x_train: np.ndarray,
    y_train: np.ndarray,
    x_val: np.ndarray,
    y_val: np.ndarray,
    train_cfg: TrainConfig = TrainConfig(),
    epochs: Optional[int] = None,
    mesh=None,
    sweep_axis: str = "sweep",
    dtype=None,
    checkpoint_dir: Optional[str] = None,
    resume: bool = False,
    verbose: bool = False,
) -> SweepResult:
    """Train every config simultaneously (vmapped over the config axis).

    With ``mesh`` given (axis ``sweep_axis``), the config axis is sharded
    over devices — each chip trains its slice of the grid, no host loop.
    A grid that doesn't divide the axis is padded with copies of the last
    config (trained redundantly, trimmed from the result).

    ``dtype=jnp.bfloat16`` trains the whole envelope with bfloat16
    activations (params/optimizer f32) — the same measured 1.5x fast mode
    as ``create_state(dtype=...)``.

    With ``checkpoint_dir`` set, every epoch snapshots the stacked envelope
    params + optimizer state + loss histories (orbax) — the resume the
    reference's 100-epoch serial grids (manual_scan.py:176-252) never had.
    ``resume=True`` continues from the latest epoch with the shuffle stream
    replayed, so the final trajectory is identical to an uninterrupted run.
    """
    if x_val is None or len(x_val) == 0:
        raise ValueError(
            "sweep requires a non-empty tune split (x_val/y_val): final "
            "val_loss drives model selection (manual_scan.py:216-224); "
            "sample more shots or adjust split fractions"
        )
    epochs = train_cfg.epochs if epochs is None else epochs
    n_real = len(configs)
    if mesh is not None:
        axis_n = mesh.shape[sweep_axis]
        pad = (-n_real) % axis_n
        if pad:
            configs = list(configs) + [configs[-1]] * pad
    env = envelope_config(configs)
    model = make_model(env, dtype=dtype)
    params, masks = init_stacked_params(configs, env, train_cfg.seed)
    tx = optax.adam(
        train_cfg.learning_rate, b1=train_cfg.beta1, b2=train_cfg.beta2,
        eps=train_cfg.adam_eps,
    )
    opt_state = jax.vmap(tx.init)(params)

    def one_loss(p, m, x, y, w):
        masked = jax.tree_util.tree_map(lambda a, b: a * b, p, m)
        logits = model.apply(masked, x, logits=True)
        return bce_from_logits(logits, y, w)

    def one_step(p, o, m, x, y, w):
        loss, grads = jax.value_and_grad(one_loss)(p, m, x, y, w)
        updates, o = tx.update(grads, o, p)
        return optax.apply_updates(p, updates), o, loss

    v_step = jax.vmap(one_step, in_axes=(0, 0, 0, None, None, None))
    v_loss_fn = jax.vmap(one_loss, in_axes=(0, 0, None, None, None))

    @jax.jit
    def sweep_epoch(p, o, m, xs, ys, batch_idx, batch_mask):
        """One epoch for ALL configs as a single lax.scan device program
        (one dispatch per epoch; see train.train_epoch)."""

        def body(carry, args):
            pp, oo = carry
            idx, w = args
            pp, oo, loss = v_step(pp, oo, m, xs[idx], ys[idx], w)
            return (pp, oo), loss

        (p, o), losses = jax.lax.scan(body, (p, o), (batch_idx, batch_mask))
        return p, o, losses

    @jax.jit
    def sweep_val(p, m, xs, ys, batch_idx, batch_mask):
        """Whole validation pass as one scanned device program (one
        dispatch — per-batch dispatch costs ~50 ms RTT each on the
        tunnelled TPU)."""

        def body(_, args):
            idx, w = args
            return 0, v_loss_fn(p, m, xs[idx], ys[idx], w)

        _, losses = jax.lax.scan(body, 0, (batch_idx, batch_mask))
        return losses

    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P

        sh = NamedSharding(mesh, P(sweep_axis))
        params = jax.tree_util.tree_map(lambda a: jax.device_put(a, sh), params)
        masks = jax.tree_util.tree_map(lambda a: jax.device_put(a, sh), masks)
        opt_state = jax.tree_util.tree_map(
            lambda a: jax.device_put(a, sh) if getattr(a, "ndim", 0) > 0 else a,
            opt_state,
        )

    n = x_train.shape[0]
    bs = min(train_cfg.batch_size, n)
    x_train = jnp.asarray(x_train, jnp.float32)
    y_train = jnp.asarray(y_train, jnp.float32)
    x_val = jnp.asarray(x_val, jnp.float32)
    y_val = jnp.asarray(y_val, jnp.float32)
    rng = np.random.default_rng(train_cfg.seed)

    from specenh.train import (
        _epoch_batches,
        check_run_meta,
        latest_checkpoint_epoch,
        weighted_epoch_mean,
        write_run_meta,
    )

    ckptr = None
    if checkpoint_dir:
        import orbax.checkpoint as ocp

        ckptr = ocp.StandardCheckpointer()
        checkpoint_dir = os.path.abspath(checkpoint_dir)
    run_meta = {
        "n": int(n), "seed": int(train_cfg.seed), "batch_size": int(bs),
        "shuffle": bool(train_cfg.shuffle), "n_configs": len(configs),
        # full grid fingerprint: a reordered/edited config list with the
        # same count and envelope would otherwise restore shape-compatible
        # slices under the WRONG masks and train silently-corrupt
        # trajectories
        "grid": [
            json.dumps(dataclasses.asdict(c), sort_keys=True, default=str)
            for c in configs
        ],
    }

    tr_hist, va_hist = [], []
    start_epoch = 0
    if resume and checkpoint_dir:
        last = latest_checkpoint_epoch(checkpoint_dir)
        if last is not None:
            # 'grid' was added to the meta schema after round 2: absent in
            # an old checkpoint is tolerated (count/envelope still checked)
            check_run_meta(checkpoint_dir, run_meta, optional_keys=("grid",))
            template = {
                "params": jax.device_get(params),
                "opt_state": jax.device_get(opt_state),
                "tr_hist": np.zeros((last + 1, len(configs)), np.float64),
                "va_hist": np.zeros((last + 1, len(configs)), np.float64),
            }
            restored = ckptr.restore(
                os.path.join(checkpoint_dir, f"epoch_{last:04d}"), template
            )
            params = jax.tree_util.tree_map(jnp.asarray, restored["params"])
            opt_state = jax.tree_util.tree_map(jnp.asarray, restored["opt_state"])
            if mesh is not None:
                params = jax.tree_util.tree_map(lambda a: jax.device_put(a, sh), params)
                opt_state = jax.tree_util.tree_map(
                    lambda a: jax.device_put(a, sh) if getattr(a, "ndim", 0) > 0 else a,
                    opt_state,
                )
            tr_hist = [np.asarray(r) for r in restored["tr_hist"]]
            va_hist = [np.asarray(r) for r in restored["va_hist"]]
            start_epoch = last + 1
            for _ in range(start_epoch):  # replay shuffle stream
                if train_cfg.shuffle:
                    rng.permutation(n)
            if verbose:
                print(f"sweep resumed from epoch {last}")
    if ckptr:
        write_run_meta(checkpoint_dir, run_meta)

    # opt-in early stopping (train_cfg.patience; manual_scan.py:175's
    # commented-out EarlyStopping).  The envelope trains every config in
    # lockstep, so the whole sweep stops only when EVERY config has gone
    # `patience` epochs without improving its own best val loss — each
    # config sees at least its Keras stopping horizon.
    if train_cfg.patience is not None:
        best_vals = (np.min(np.asarray(va_hist), axis=0)
                     if va_hist else np.full(len(configs), np.inf))
        stales = np.zeros(len(configs), int)
        if va_hist:
            arg_best = np.argmin(np.asarray(va_hist), axis=0)
            stales = len(va_hist) - 1 - arg_best

    for epoch in range(start_epoch, epochs):
        perm = rng.permutation(n) if train_cfg.shuffle else np.arange(n)
        batch_idx, batch_mask = _epoch_batches(n, bs, perm)
        params, opt_state, losses = sweep_epoch(
            params, opt_state, masks, x_train, y_train,
            jnp.asarray(batch_idx), jnp.asarray(batch_mask),
        )
        tr_hist.append(weighted_epoch_mean(losses, batch_mask))
        # batched validation, scanned (batching keeps the n_configs x val
        # envelope from OOMing; the scan keeps it one dispatch)
        nv = x_val.shape[0]
        val_idx, val_mask = _epoch_batches(nv, min(bs, nv), np.arange(nv))
        v_losses = sweep_val(
            params, masks, x_val, y_val,
            jnp.asarray(val_idx), jnp.asarray(val_mask),
        )                                                # (n_batches, n_cfg)
        va_hist.append(weighted_epoch_mean(v_losses, val_mask))
        if verbose:
            print(f"epoch {epoch+1}/{epochs} val={np.array2string(va_hist[-1], precision=4)}")
        if ckptr:
            ckptr.save(
                os.path.join(checkpoint_dir, f"epoch_{epoch:04d}"),
                {
                    "params": jax.device_get(params),
                    "opt_state": jax.device_get(opt_state),
                    "tr_hist": np.asarray(tr_hist, np.float64),
                    "va_hist": np.asarray(va_hist, np.float64),
                },
                force=True,
            )
        if train_cfg.patience is not None:
            v = np.asarray(va_hist[-1])
            improved = v < best_vals
            best_vals = np.minimum(best_vals, v)
            stales = np.where(improved, 0, stales + 1)
            if (stales >= train_cfg.patience).all():
                if verbose:
                    print(f"early stopping: every config stale for "
                          f"{train_cfg.patience} epochs")
                break

    if ckptr:
        ckptr.wait_until_finished()

    # trim sweep-axis padding (redundant copies of the last config)
    stacked = jax.tree_util.tree_map(lambda a: a[:n_real], jax.device_get(params))
    masks = jax.tree_util.tree_map(lambda a: a[:n_real], masks)
    val_losses = np.asarray(va_hist[-1])[:n_real]
    best = int(np.argmin(val_losses))
    best_params = extract_config_params(stacked, best, configs[best], env)
    return SweepResult(
        configs=list(configs[:n_real]),
        env=env,
        val_losses=val_losses,
        train_history=np.asarray(tr_hist)[:, :n_real],
        val_history=np.asarray(va_hist)[:, :n_real],
        best_index=best,
        best_params=best_params,
        stacked_params=stacked,
        masks=masks,
    )


def sweep_fit_serial(
    configs: Sequence[ModelConfig],
    x_train,
    y_train,
    x_val,
    y_val,
    train_cfg: TrainConfig = TrainConfig(),
    epochs: Optional[int] = None,
    dtype=None,
    checkpoint_dir: Optional[str] = None,
    resume: bool = False,
    interpret: Optional[bool] = None,
    engine: str = "kernel",
    mesh=None,
    verbose: bool = False,
) -> SweepResult:
    """Serial per-config sweep on the fused Pallas TRAINING kernels.

    ``engine='flax'`` forces the stock scanned Flax epoch for every config
    (still serial at own-geometry cost — useful on CPU, where the kernel
    path would run in slow interpret mode).

    The vmapped envelope (``sweep_fit``) trains every config at the cost
    of the LARGEST geometry in the grid; this engine trains each config at
    its OWN cost with the fused forward+backward kernel where the geometry
    supports it (ops.ae_train_kernel depth-2 / ops.ae3_train_kernel
    depth-3; Flax ``train_epoch`` otherwise).  Measured on the reference
    array sweep (k3/k5/k7, 7200 tiles, v5e, incl. per-epoch validation):
    envelope 5.67 s/epoch vs serial-kernel 0.28+0.58+0.86 = 1.72 — 3.3x
    steady-state (per-config compiles amortize over the reference's
    15-100 epochs; on hosts with a working persistent compile cache they
    are one-time).

    Multi-chip: ``mesh`` (a ``('data',)`` mesh) trains each config
    DATA-parallel — the per-config fit routes through ``dp_fit`` with the
    shard_map'd kernel epoch (``parallel.dp_kernel``) where the geometry
    supports it.  This is the complement of ``sweep_fit(mesh=...)``, which
    shards the CONFIG axis ('sweep') and trains the whole grid at the
    envelope geometry's cost: shard configs when the grid is wide, shard
    data when per-config speed (or per-config HBM) is what binds.

    Parity: initial params are the SAME per-config glorot draws as the
    envelope (init_stacked_params), every config replays the same shuffle
    stream (train.fit seeds from train_cfg), and the kernel engines are
    gradient-exact vs autodiff — so trajectories match ``sweep_fit`` to
    engine-dtype tolerance.  Returns the same SweepResult (final params
    re-embedded into the stacked envelope for downstream extraction).

    With ``checkpoint_dir``, each config checkpoints/resumes its own fit
    under ``cfg_<i>/`` (per-epoch orbax, shuffle replay) — a partially
    completed grid resumes config-by-config.
    """
    from specenh.ops.ae3_kernel import supports3 as _supports3
    from specenh.ops.ae_train_kernel import supports as _supports2
    from specenh.train import create_state, fit, kernel_epoch_for

    if x_val is None or len(x_val) == 0:
        raise ValueError(
            "sweep requires a non-empty tune split (x_val/y_val): final "
            "val_loss drives model selection (manual_scan.py:216-224); "
            "sample more shots or adjust split fractions"
        )
    epochs = train_cfg.epochs if epochs is None else epochs
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    env = envelope_config(configs)
    stacked, masks = init_stacked_params(configs, env, train_cfg.seed)
    x_train = jnp.asarray(x_train, jnp.float32)
    y_train = jnp.asarray(y_train, jnp.float32)
    tr_hist, va_hist = [], []
    finals = []
    for ci, cfg in enumerate(configs):
        params0 = extract_config_params(stacked, ci, cfg, env)
        state = create_state(cfg, train_cfg, dtype=dtype).replace(
            params=jax.tree_util.tree_map(jnp.asarray, params0)
        )
        epoch_fn = None
        if engine == "kernel" and (_supports2(cfg) or _supports3(cfg)):
            if mesh is not None:
                from specenh.parallel.dp_kernel import dp_kernel_epoch_for

                # interpret == CPU harness: f32 dots (XLA:CPU rejects bf16
                # DotThunks at tiny per-device batches — see cli.cmd_train)
                epoch_fn = dp_kernel_epoch_for(
                    cfg, train_cfg, mesh, interpret=interpret,
                    dtype=jnp.float32 if interpret else dtype,
                )
            else:
                epoch_fn = kernel_epoch_for(cfg, train_cfg,
                                            interpret=interpret, dtype=dtype)
        ckpt_i = (os.path.join(checkpoint_dir, f"cfg_{ci:03d}")
                  if checkpoint_dir else None)
        if mesh is not None:
            from specenh.parallel.data_parallel import dp_fit

            state, hist = dp_fit(
                state, x_train, y_train, mesh, x_val, y_val,
                epochs=epochs, batch_size=train_cfg.batch_size,
                seed=train_cfg.seed, epoch_fn=epoch_fn,
                checkpoint_dir=ckpt_i, resume=resume,
                patience=train_cfg.patience, verbose=verbose,
            )
        else:
            state, hist = fit(
                state, x_train, y_train, x_val, y_val, cfg=train_cfg,
                epochs=epochs, epoch_fn=epoch_fn,
                checkpoint_dir=ckpt_i, resume=resume, verbose=verbose,
            )
        if verbose:
            print(f"config {ci + 1}/{len(configs)} "
                  f"({'kernel' if epoch_fn else 'flax'}) "
                  f"val={hist['val_loss'][-1]:.5f}")
        tr_hist.append(hist["loss"])
        va_hist.append(hist["val_loss"])
        # mesh-replicated params come back to host before the embed — the
        # stacked envelope lives on the default device, not the mesh
        params = jax.device_get(state.params) if mesh is not None \
            else state.params
        finals.append(params)
        stacked = embed_config_params(stacked, ci, cfg, env, params)
    val_losses = np.asarray([h[-1] for h in va_hist])
    best = int(np.argmin(val_losses))
    # per-config early stopping (train_cfg.patience flows through each
    # fit/dp_fit) can leave ragged histories: pad each with its final value
    # so the (epochs, n_cfg) arrays stay rectangular (a stopped config
    # plateaus at its last loss, which is what the curve means)
    L = max(len(h) for h in tr_hist)
    pad = lambda h: list(h) + [h[-1]] * (L - len(h))  # noqa: E731
    tr_hist = [pad(h) for h in tr_hist]
    va_hist = [pad(h) for h in va_hist]
    return SweepResult(
        configs=list(configs),
        env=env,
        val_losses=val_losses,
        train_history=np.asarray(tr_hist).T,
        val_history=np.asarray(va_hist).T,
        best_index=best,
        best_params=jax.device_get(finals[best]),
        stacked_params=jax.device_get(stacked),
        masks=masks,
    )


def sweep_fit_serial_streamed(
    configs: Sequence[ModelConfig],
    store,
    plan,
    train_cfg: TrainConfig = TrainConfig(),
    epochs: Optional[int] = None,
    dtype=None,
    checkpoint_dir: Optional[str] = None,
    resume: bool = False,
    interpret: Optional[bool] = None,
    engine: str = "kernel",
    mesh=None,
    chunk_tiles: int = 4096,
    cache_dtype: Optional[str] = None,
    tile_cache: Optional[str] = None,
    ps=None,
    verbose: bool = False,
) -> SweepResult:
    """Serial per-config sweep over a HOST-STREAMED dataset — sweeps at
    the reference's largest recipe scale (the 200-shot ~31 GB tile set,
    manual_scan.py:137-156), which the resident engines cannot assemble
    on one chip at all.

    Each config trains through ``train_stream.fit_streaming`` (chunked
    epochs, host-RAM chunk cache, optional bf16 chunks and on-disk tile
    cache — the tile cache makes configs 2..N skip the HDF5 pass
    entirely), on the fused Pallas training kernel where the geometry
    supports it (``engine='flax'`` forces the stock epoch).  ``mesh``
    (a ``('data',)`` mesh) shards each config's streamed chunks over the
    devices, exactly like ``train --stream --devices``.

    Parity mirrors ``sweep_fit_serial``: identical per-config glorot
    draws (init_stacked_params), per-config checkpoint/resume under
    ``cfg_<i>/``, the same SweepResult.  With ``shuffle=False`` and
    ``chunk_tiles >= n`` the per-config trajectories are IDENTICAL to
    the resident serial engine's (fit_streaming's identity contract).
    """
    from specenh.config import PatchSpec
    from specenh.ops.ae3_kernel import supports3 as _supports3
    from specenh.ops.ae_train_kernel import supports as _supports2
    from specenh.train import create_state, kernel_epoch_for
    from specenh.train_stream import fit_streaming

    if plan.n_tiles("tune") == 0:
        raise ValueError(
            "sweep requires a non-empty tune split: final val_loss drives "
            "model selection (manual_scan.py:216-224); this plan's tune "
            "split has zero tiles — sample more shots or adjust split "
            "fractions"
        )
    ps = PatchSpec() if ps is None else ps
    epochs = train_cfg.epochs if epochs is None else epochs
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    env = envelope_config(configs)
    stacked, masks = init_stacked_params(configs, env, train_cfg.seed)
    tr_hist, va_hist = [], []
    finals = []
    for ci, cfg in enumerate(configs):
        params0 = extract_config_params(stacked, ci, cfg, env)
        state = create_state(cfg, train_cfg, dtype=dtype).replace(
            params=jax.tree_util.tree_map(jnp.asarray, params0)
        )
        epoch_fn = None
        if engine == "kernel" and (_supports2(cfg) or _supports3(cfg)):
            if mesh is not None:
                from specenh.parallel.dp_kernel import dp_kernel_epoch_for

                epoch_fn = dp_kernel_epoch_for(
                    cfg, train_cfg, mesh, interpret=interpret,
                    dtype=jnp.float32 if interpret else dtype,
                )
            else:
                epoch_fn = kernel_epoch_for(cfg, train_cfg,
                                            interpret=interpret, dtype=dtype)
        ckpt_i = (os.path.join(checkpoint_dir, f"cfg_{ci:03d}")
                  if checkpoint_dir else None)
        state, hist = fit_streaming(
            state, store, plan, train_cfg, epochs=epochs,
            chunk_tiles=chunk_tiles, ps=ps, epoch_fn=epoch_fn, mesh=mesh,
            cache_dtype=cache_dtype, tile_cache=tile_cache,
            checkpoint_dir=ckpt_i, resume=resume, verbose=verbose,
        )
        if verbose:
            print(f"config {ci + 1}/{len(configs)} "
                  f"({'kernel' if epoch_fn else 'flax'}, streamed) "
                  f"val={hist['val_loss'][-1]:.5f}")
        tr_hist.append(hist["loss"])
        va_hist.append(hist["val_loss"])
        params = jax.device_get(state.params)
        finals.append(params)
        stacked = embed_config_params(stacked, ci, cfg, env, params)
    val_losses = np.asarray([h[-1] for h in va_hist])
    best = int(np.argmin(val_losses))
    L = max(len(h) for h in tr_hist)
    pad = lambda h: list(h) + [h[-1]] * (L - len(h))  # noqa: E731
    tr_hist = [pad(h) for h in tr_hist]
    va_hist = [pad(h) for h in va_hist]
    return SweepResult(
        configs=list(configs),
        env=env,
        val_losses=val_losses,
        train_history=np.asarray(tr_hist).T,
        val_history=np.asarray(va_hist).T,
        best_index=best,
        best_params=jax.device_get(finals[best]),
        stacked_params=jax.device_get(stacked),
        masks=masks,
    )


# ---------------------------------------------------------------------------
# marginal reporting (loss_comparisons.npz parity)
# ---------------------------------------------------------------------------


def marginal_report(
    values: np.ndarray, grid_shape: Tuple[int, ...], names: Sequence[str]
) -> Dict[str, np.ndarray]:
    """Per-parameter marginal means over all other axes
    (manual_scan.py:302-364): returns {name: (len_axis, 1) array}."""
    grid = np.asarray(values).reshape(grid_shape)
    out = {}
    for ax, name in enumerate(names):
        other = tuple(i for i in range(grid.ndim) if i != ax)
        out[name] = grid.mean(axis=other)[:, None]
    return out


def save_loss_comparisons(
    path: str,
    val_losses: np.ndarray,
    pred_times: np.ndarray,
    grid_shape: Tuple[int, ...],
    axis_names: Sequence[str],
):
    """``loss_comparisons.npz`` with the reference's key scheme
    (manual_scan.py:361-364): <axis>_loss and <axis>_time."""
    loss_m = marginal_report(val_losses, grid_shape, axis_names)
    time_m = marginal_report(pred_times, grid_shape, axis_names)
    np.savez(
        path,
        **{f"{n}_loss": v for n, v in loss_m.items()},
        **{f"{n}_time": v for n, v in time_m.items()},
    )
