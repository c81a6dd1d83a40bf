"""Hyperparameter sweeps — the VAE/hyperparam_scan.py SLURM array and the
manual_scan.py nested loops, as ONE vmapped on-device program.

Run:  python examples/04_hyperparameter_sweep.py [out_dir]
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax.numpy as jnp
import numpy as np

from specenh.config import ModelConfig, SpecParams, SweepConfig, TrainConfig
from specenh.data.dataset import synthetic_shot_batch
from specenh.data.tiles import patch
from specenh.ops.enhance import classical_pipeline
from specenh.ops.stft import spectrogram
from specenh.sweep import expand_grid_2layer, save_loss_comparisons, sweep_fit


def main(out_dir="out/example04"):
    os.makedirs(out_dir, exist_ok=True)
    sp = SpecParams(cut_shot=0.2)
    traces = synthetic_shot_batch(2, n_channels=4, n_samples=sp.n_samples)
    specs = spectrogram(jnp.asarray(traces.reshape(-1, traces.shape[-1])), sp)
    labels = classical_pipeline(specs)
    x = np.asarray(patch(specs))[..., None]
    y = np.asarray(patch(labels))[..., None]
    n = len(x)
    a, b = int(n * 0.6), int(n * 0.85)

    # the kernel-size array sweep (hyperparam_scan.py:123), all configs at once
    kernel_configs = [
        ModelConfig(filters=(32, 32), kernels=(k, k), out_kernel=k)
        for k in [(3, 3), (5, 5), (7, 7)]
    ]
    res = sweep_fit(
        kernel_configs, x[:a], y[:a], x[a:b], y[a:b],
        TrainConfig(batch_size=32), epochs=3, verbose=True,
    )
    print("kernel sweep val losses:", res.val_losses, "best:", res.best_index)

    # the same grid on the serial engine (each config at its own geometry
    # cost instead of the envelope's k7 cost for all three; on a TPU drop
    # engine='flax' to train on the fused Pallas kernels — 3.3x measured,
    # `specenh sweep --engine kernel`)
    from specenh.sweep import sweep_fit_serial

    res_k = sweep_fit_serial(
        kernel_configs, x[:a], y[:a], x[a:b], y[a:b],
        TrainConfig(batch_size=32), epochs=3, engine="flax",
    )
    print("serial engine val losses:", res_k.val_losses)
    np.save(os.path.join(out_dir, "val_losses.npy"), res.val_losses)

    # a small manual_scan-style grid with marginal reporting
    sw = SweepConfig(
        ker1_vals=((3, 3), (5, 5)), ker2_vals=((3, 3),), ker3_vals=((3, 3),),
        conv1_vals=(16, 32), conv2_vals=(16,),
    )
    configs, shape = expand_grid_2layer(sw)
    res2 = sweep_fit(configs, x[:a], y[:a], x[a:b], y[a:b],
                     TrainConfig(batch_size=32), epochs=2)
    save_loss_comparisons(
        os.path.join(out_dir, "loss_comparisons.npz"),
        res2.val_losses, np.zeros_like(res2.val_losses), shape,
        ["ker1", "ker2", "ker3", "conv1", "conv2"],
    )
    print("grid val losses:", res2.val_losses.reshape(shape).squeeze())


if __name__ == "__main__":
    main(*sys.argv[1:])
