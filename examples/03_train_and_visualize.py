"""End-to-end training + visualisation — the VAE/graphs.ipynb workflow.

Build spectrograms + labels, tile, train the (32, 32, k=3) autoencoder,
predict, restitch, triptych plots, frame dump + movie.

Run:  python examples/03_train_and_visualize.py [out_dir]
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax.numpy as jnp
import numpy as np

from specenh.config import MODEL_PRESETS, PatchSpec, SpecParams, TrainConfig
from specenh.data.dataset import synthetic_shot_batch
from specenh.data.tiles import n_tiles_for, patch, unpatch
from specenh.ops.enhance import classical_pipeline
from specenh.ops.stft import spectrogram, spectrogram_freqs, spectrogram_times
from specenh.train import create_state, fit, predict
from specenh.viz.movie import dump_frames, render_movie
from specenh.viz.plots import display, plt_spec_shot


def main(out_dir="out/example03"):
    os.makedirs(out_dir, exist_ok=True)
    sp = SpecParams(cut_shot=0.4)
    traces = synthetic_shot_batch(2, n_channels=6, n_samples=sp.n_samples)
    specs = spectrogram(jnp.asarray(traces.reshape(-1, traces.shape[-1])), sp)
    labels = classical_pipeline(specs)

    k = n_tiles_for(specs.shape[-1], PatchSpec())
    x = np.asarray(patch(specs))[..., None]
    y = np.asarray(patch(labels))[..., None]
    n = len(x)
    a, b = int(n * 0.6), int(n * 0.85)

    cfg = MODEL_PRESETS["graphs"]
    tc = TrainConfig(epochs=8, batch_size=32)
    state = create_state(cfg, tc)
    state, hist = fit(state, x[:a], y[:a], x[a:b], y[a:b], tc, verbose=True)

    preds = np.squeeze(np.asarray(predict(state, jnp.asarray(x))), -1)
    noisy = np.asarray(unpatch(jnp.asarray(x[..., 0]), tiles_per_spec=k))
    pred_specs = np.asarray(unpatch(jnp.asarray(preds), tiles_per_spec=k))
    label_specs = np.asarray(unpatch(jnp.asarray(y[..., 0]), tiles_per_spec=k))

    f = spectrogram_freqs(sp)
    t = spectrogram_times(sp)
    display(noisy, pred_specs, os.path.join(out_dir, "ex_specs.png"), f, t, seed=0)
    plt_spec_shot(
        noisy[0], pred_specs[0], label_specs[0], "synthetic", 1,
        os.path.join(out_dir, "triptych.png"), f, t,
    )

    # frame movie over the channel stack (graphs.ipynb cells 16-19)
    c = 6
    stack = lambda a: a[:c].transpose(1, 2, 0)
    frames_dir = os.path.join(out_dir, "frames")
    dump_frames(stack(noisy), stack(label_specs), stack(pred_specs),
                t, f, "demo", frames_dir, start=0, stop=15)
    movie = render_movie(frames_dir, "demo")
    print("final val loss:", hist["val_loss"][-1], "movie:", movie)


if __name__ == "__main__":
    main(*sys.argv[1:])
