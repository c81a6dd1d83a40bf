"""Dataset build walkthrough — the spec_denoising/pipeline_data.py and
dataset.ipynb workflow on synthetic shots.

Raw traces -> batched STFT + classical pipeline on device -> HDF5 store,
then the shot-level 60/25/15 split of dataset.ipynb cell 3.

Run:  python examples/01_dataset_pipeline.py [out_dir]
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax.numpy as jnp
import numpy as np

from specenh.config import Config, SpecParams, TrainConfig
from specenh.data.dataset import assemble_from_store, synthetic_shot_batch
from specenh.io.shots import ece_key
from specenh.io.store import SpectrogramStore
from specenh.ops.enhance import pipeline_stages
from specenh.pipeline import build_dataset
from specenh.viz.plots import plot_stages


def main(out_dir="out/example01"):
    os.makedirs(out_dir, exist_ok=True)
    cfg = Config(spec=SpecParams(cut_shot=0.4))

    # synthetic raw campaign (stands in for the DIII-D ECE pickles)
    import pickle

    raw_dir = os.path.join(out_dir, "raw")
    os.makedirs(raw_dir, exist_ok=True)
    batch = synthetic_shot_batch(n_shots=3, n_channels=6, n_samples=cfg.spec.n_samples)
    files = []
    for s in range(batch.shape[0]):
        path = os.path.join(raw_dir, f"ece_{150000 + s}.pkl")
        with open(path, "wb") as fh:
            pickle.dump({ece_key(c + 1): batch[s, c] for c in range(batch.shape[1])}, fh)
        files.append(path)

    store_path = os.path.join(out_dir, "spectrogram_data.hdf5")
    summary = build_dataset(cfg, files, channels=list(range(1, 7)), store_path=store_path)
    print("campaign:", summary)

    # stage-by-stage plot of one channel (denoising_spectrogram.ipynb cell 5)
    with SpectrogramStore(store_path, "r") as store:
        d = store.read_channel(store.shots()[0], 1)
        stages = pipeline_stages(jnp.asarray(d["spec"], jnp.float32))
        plot_stages(
            {k: np.asarray(v) for k, v in stages.items()},
            d["spec"], os.path.join(out_dir, "stages.png"), d["f"], d["t"],
        )

        # leak-free shot-level split (dataset.ipynb cell 3 behaviour)
        splits = assemble_from_store(
            store, num_samples=3, cfg=TrainConfig(split_by="shot")
        )
    print("split tiles:", splits.x_train.shape, splits.x_tune.shape, splits.x_test.shape)
    print("artifacts in", out_dir)


if __name__ == "__main__":
    main(*sys.argv[1:])
