"""Cross-power spectrogram — the interferometer/crosspowerspec.py workflow
on synthetic coherent chords (the real chord HDF5 layout is supported by
specenh.io.shots.load_time_series_tensor).

Run:  python examples/05_crosspower.py [out_dir]
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt
import numpy as np
from matplotlib import gridspec

import jax.numpy as jnp

from specenh.ops.crosspower import ae_co2


def main(out_dir="out/example05"):
    os.makedirs(out_dir, exist_ok=True)
    fs = 1.667e6  # CO2 interferometer-like rate
    n = 1 << 20
    t = np.arange(n) / fs
    rng = np.random.default_rng(0)
    # a shared Alfven-eigenmode chirp + independent chord noise
    mode = np.sin(2 * np.pi * (8e4 + 3e4 * t) * t)
    sig1 = mode + 1.0 * rng.standard_normal(n)
    sig2 = 0.6 * mode + 1.0 * rng.standard_normal(n)

    ampsp, freq, time = ae_co2(
        jnp.asarray(sig1, jnp.float32), jnp.asarray(sig2, jnp.float32), t
    )
    ampsp = np.asarray(ampsp)

    # the reference plot (crosspowerspec.py:42-50)
    fig = plt.figure(figsize=(8, 4), dpi=100)
    gs = gridspec.GridSpec(2, 1)
    ax2 = plt.subplot(gs[:])
    ax2.imshow(
        np.log(ampsp).T, origin="lower", cmap="hot", aspect="auto",
        extent=[time.min(), time.max(), freq.min(), freq.max()],
    )
    plt.ylabel("Frequency [kHz]")
    plt.xlabel("Time [ms]")
    out = os.path.join(out_dir, "crosspower.png")
    fig.savefig(out)
    print("ampsp", ampsp.shape, "->", out)


if __name__ == "__main__":
    main(*sys.argv[1:])
