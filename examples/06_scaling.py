"""Scaling walkthrough: data-parallel training, sequence-parallel long-shot
processing, and sweep parallelism over a device mesh.

Uses whatever devices are attached; to simulate a pod on CPU run with
    JAX_PLATFORM_NAME=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8

Run:  python examples/06_scaling.py
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


import numpy as np

import jax
import jax.numpy as jnp

from specenh.config import ModelConfig, PipelineConfig, SpecParams, TrainConfig
from specenh.parallel.data_parallel import dp_fit
from specenh.parallel.mesh import make_mesh
from specenh.parallel.timeshard import (
    sharded_enhance,
    sharded_spectrogram,
    usable_samples,
)
from specenh.train import create_state


def main():
    n_dev = len(jax.devices())
    print(f"{n_dev} device(s): {jax.devices()[0].platform}")

    # --- data-parallel training over all devices ---
    mesh = make_mesh(n_dev, ("data",))
    tiny = ModelConfig(filters=(8, 8), kernels=((3, 3), (3, 3)), input_shape=(64, 32, 1))
    rng = np.random.default_rng(0)
    x = rng.random((16 * n_dev, 64, 32, 1)).astype(np.float32)
    y = (x > 0.5).astype(np.float32)
    state = create_state(tiny, TrainConfig())
    state, hist = dp_fit(state, x, y, mesh, epochs=2, batch_size=8 * n_dev)
    print("dp training loss:", hist["loss"])

    # --- the same, on the fused Pallas training kernel: per-device kernels
    # under shard_map, gradient psum over the data axis (the CLI
    # `train --engine kernel --devices N` engine) ---
    from specenh.parallel.dp_kernel import dp_kernel_epoch_for

    on_cpu = jax.default_backend() == "cpu"
    kcfg = ModelConfig()  # the kernel wants the full 256x128 tile geometry
    kx = rng.random((n_dev, 256, 128, 1)).astype(np.float32)
    ky = (kx > 0.5).astype(np.float32)
    kstate = create_state(kcfg, TrainConfig())
    kernel_epoch = dp_kernel_epoch_for(
        kcfg, TrainConfig(), mesh,
        interpret=on_cpu, dtype=jnp.float32 if on_cpu else None,
    )
    kstate, khist = dp_fit(kstate, kx, ky, mesh, epochs=1,
                           batch_size=n_dev, epoch_fn=kernel_epoch)
    print("dp fused-kernel training loss:", khist["loss"])

    # --- sequence-parallel long shot (halo-exchange time sharding) ---
    tmesh = make_mesh(n_dev, ("time",))
    sp = SpecParams(cut_shot=4.0)  # a 4-second "long" shot
    t_use = usable_samples(sp.n_samples, n_dev, sp)
    trace = jnp.asarray(rng.standard_normal(t_use), jnp.float32)
    spec = sharded_spectrogram(trace, sp, tmesh)
    out = sharded_enhance(spec, tmesh, PipelineConfig())
    print("time-sharded spectrogram:", spec.shape, "->", out.shape)

    # --- multi-chip serving: channels sharded over the mesh, each chip
    # running the fused Pallas conv-AE kernel on its slice (shard_map) ---
    from specenh.bench.harness import example_shot, make_enhance_shot_fn
    from specenh.models.autoencoder import make_model

    smesh = make_mesh(n_dev, ("data",))
    serve_sp = SpecParams(cut_shot=0.2)
    cfg = ModelConfig()
    params = make_model(cfg).init(
        jax.random.PRNGKey(0), np.zeros((1, *cfg.input_shape), np.float32)
    )
    fn = make_enhance_shot_fn(
        cfg, serve_sp, mesh=smesh, use_kernel=True,
        interpret=jax.default_backend() == "cpu",
    )
    # resident services pre-scatter the kernel weights ONCE (round 5):
    # fn.prepare returns a device handle that replaces the Flax params
    handle = fn.prepare(params)
    traces = jnp.asarray(example_shot(serve_sp, n_channels=2 * n_dev))
    specs, enhanced = fn(handle, traces)
    print("channel-sharded kernel serving:", traces.shape, "->", enhanced.shape)

    # --- composed long shot END-TO-END (STFT -> pipeline -> conv-AE ->
    # restitch in ONE shard_map), the AE stage on the fused serving
    # kernel (use_kernel='auto' routes there off-CPU; 3.80x measured) ---
    from specenh.parallel.timeshard import (
        make_sharded_enhance_shot,
        usable_samples_tiled,
    )

    t_tiled = usable_samples_tiled(sp.n_samples, n_dev, sp)
    # n_samples override (a cut_shot=t/fs round-trip can lose a sample)
    composed = make_sharded_enhance_shot(cfg, sp, tmesh, n_samples=t_tiled)
    cspec, clabels, cenh = composed(
        composed.prepare(params), trace[:t_tiled]
    )
    print("composed long-shot (kernel AE stage):", cenh.shape)


if __name__ == "__main__":
    main()
