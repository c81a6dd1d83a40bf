"""Directly synthesize a reference-scale spectrogram STORE (no STFT).

For streaming/training THROUGHPUT work the store's byte layout and shapes
are what matter, not the physics: this writes (spec, pipeline_out) pairs at
the reference geometry (256 x 3905 float32, 20 channels/shot — the shapes
``pipeline_data.py`` produces) straight into the HDF5 schema, ~50x faster
than running the signal path.  The full campaign driver
(``scripts/full_campaign.py``) remains the physics-true path.

Run: python scripts/synth_store.py <store.hdf5> <n_shots> [n_channels]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from specenh.io.store import SpectrogramStore

F, T = 256, 3905


def synth_store(path: str, n_shots: int, n_channels: int = 20,
                seed: int = 0, verbose: bool = True) -> None:
    rng = np.random.default_rng(seed)
    f_ax = np.arange(F, dtype=np.float64)
    t_ax = np.arange(T, dtype=np.float64)
    t0 = time.time()
    with SpectrogramStore(path, "a") as store:
        for s in range(n_shots):
            shot = str(100000 + s)
            for c in range(1, n_channels + 1):
                # smooth low-rank ridges + noise, minmax-normalized like the
                # reference's post-norm spectrograms
                spec = rng.random((F, T), np.float32)
                lab = np.clip(spec * 0.8 + 0.1, 0.0, 1.0).astype(np.float32)
                store.write_channel(shot, c, spec, f_ax, t_ax, lab)
            if verbose and (s + 1) % 10 == 0:
                print(f"{s + 1}/{n_shots} shots ({time.time() - t0:.1f}s)",
                      flush=True)
    if verbose:
        gb = os.path.getsize(path) / 2**30
        print(f"wrote {path}: {n_shots} shots x {n_channels} ch, "
              f"{gb:.1f} GB in {time.time() - t0:.1f}s")


if __name__ == "__main__":
    a = sys.argv[1:]
    synth_store(a[0], int(a[1]), int(a[2]) if len(a) > 2 else 20)
