"""Streamed training at beyond-HBM scale — the reference's 200-shot
recipe mechanism (VAE/manual_scan.py:137-156) scaled down to run anywhere.

Demonstrates the round-4 streaming stack end-to-end on a synthetic store:

* ``plan_stream_split``   — the split computed from store METADATA only
  (nothing resident up front; tile- or shot-level semantics);
* ``fit_streaming``       — chunked epochs with the host-RAM chunk cache
  (epochs after the first do no store IO) and early stopping;
* ``cache_dtype='bf16'``  — half the cache RAM and half the per-epoch
  upload bytes (value-exact with the fused kernel engine);
* ``tile_cache``          — the canonical tile stream persisted pre-tiled
  on disk, so a SECOND run (sweeps, resumes) memmaps contiguous slabs
  instead of re-reading HDF5 (measured 10-20x, PERF_NOTES round 4).

Run:  python examples/07_streamed_campaign.py [workdir]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from specenh.config import ModelConfig, PatchSpec, TrainConfig
from specenh.io.store import SpectrogramStore
from specenh.train import create_state
from specenh.train_stream import fit_streaming, plan_stream_split

workdir = sys.argv[1] if len(sys.argv) > 1 else "out/streamed"
os.makedirs(workdir, exist_ok=True)
store_path = os.path.join(workdir, "specs.hdf5")

# -- a small synthetic store at reference-like geometry ---------------------
if not os.path.exists(store_path):
    rng = np.random.default_rng(0)
    with SpectrogramStore(store_path, "a") as store:
        for shot in range(4):
            for chn in range(1, 6):
                spec = rng.random((256, 3905), np.float32)
                store.write_channel(
                    str(100000 + shot), chn, spec,
                    np.arange(256.0), np.arange(3905.0),
                    np.clip(spec * 0.8 + 0.1, 0, 1),
                )

cfg = TrainConfig(epochs=6, batch_size=128, seed=0, patience=3)
store = SpectrogramStore(store_path, "r")

# split planned from metadata only — the store stays on disk
plan = plan_stream_split(store, num_samples=4, cfg=cfg, seed=0)
print({s: plan.n_tiles(s) for s in ("train", "tune", "test")})

state = create_state(ModelConfig(), cfg)
t0 = time.time()
state, hist = fit_streaming(
    state, store, plan, cfg,
    chunk_tiles=512,
    cache_dtype="bf16",                       # half RAM + half upload
    tile_cache=os.path.join(workdir, "tiles"),  # cross-run persistence
    verbose=True,
)
print(f"streamed fit: {time.time() - t0:.1f}s, "
      f"final val_loss={hist['val_loss'][-1]:.4f}")

# a second run reuses the tile cache — no HDF5 reads at all
t0 = time.time()
fit_streaming(create_state(ModelConfig(), cfg), store, plan, cfg, epochs=2,
              chunk_tiles=512, cache_dtype="bf16",
              tile_cache=os.path.join(workdir, "tiles"), verbose=True)
print(f"second run (tile-cached): {time.time() - t0:.1f}s")
store.close()
