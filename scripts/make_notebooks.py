"""Generate the five thin example notebooks mirroring the reference's
notebooks cell-by-cell (SURVEY.md section 7 step 13).

Each notebook pairs a markdown note citing the reference cell(s) with the
specenh call that replaces them; all run on synthetic shots so they execute
anywhere (CPU or TPU).  tests/test_notebooks.py executes every code cell.

Run:  python scripts/make_notebooks.py
"""

import json
import os

OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "notebooks")


def nb(cells):
    return {
        "cells": cells,
        "metadata": {
            "kernelspec": {"display_name": "Python 3", "language": "python",
                           "name": "python3"},
            "language_info": {"name": "python", "version": "3"},
        },
        "nbformat": 4,
        "nbformat_minor": 5,
    }


def md(text):
    return {"cell_type": "markdown", "metadata": {},
            "source": text.strip().splitlines(keepends=True)}


def code(src):
    return {"cell_type": "code", "metadata": {}, "execution_count": None,
            "outputs": [], "source": src.strip("\n").splitlines(keepends=True)}


COMMON_SETUP = """
import os, sys
sys.path.insert(0, os.path.abspath(".."))
import matplotlib
matplotlib.use("Agg")
import numpy as np
import jax.numpy as jnp

out_dir = "out_nb"
os.makedirs(out_dir, exist_ok=True)
"""


def graphs_nb():
    cells = [
        md("""# VAE/graphs.ipynb — train + visualize the denoising autoencoder
TPU-native mirror of `reference: VAE/graphs.ipynb`.  Each cell cites the
reference cell it replaces; data is synthetic so the notebook runs
anywhere."""),
        code(COMMON_SETUP + """
# ref cells 0-1: imports + spec_params + specgr/pipeline helpers
from specenh.config import Config, ModelConfig, SpecParams, TrainConfig
from specenh.ops.stft import spectrogram, spectrogram_freqs, spectrogram_times
from specenh.ops.enhance import classical_pipeline
from specenh.data.tiles import patch, unpatch, reshape
cfg = Config(spec=SpecParams(cut_shot=0.4))  # reference uses 2 s shots
sp = cfg.spec
f, t = spectrogram_freqs(sp), spectrogram_times(sp)"""),
        code("""
# ref cell 2: load 100 random shots, spectrogram + classical pipeline per
# channel.  Here: one batched device program over synthetic channels.
from specenh.data.dataset import synthetic_shot_batch
raw = synthetic_shot_batch(n_shots=2, n_channels=4, n_samples=sp.n_samples)
traces = jnp.asarray(raw.reshape(-1, sp.n_samples))
specs = spectrogram(traces, sp)            # (8, 256, T)
final = classical_pipeline(specs)
print(specs.shape, final.shape)"""),
        code("""
# ref cell 3: patch into strips, 60/25/15 split (the leaky tile-level quirk)
from specenh.data.tiles import n_tiles_for
Sxx = np.asarray(patch(specs, cfg.patch))
fin = np.asarray(patch(final, cfg.patch))
# NOTE: the reference's 3000-tile/30-per-spec grid happens to put both
# split points on spectrogram boundaries; this demo geometry doesn't, so
# round down to tile-row boundaries — otherwise cell 4's unpatch would
# stitch tiles from two different shots into one "spectrogram"
k_t = n_tiles_for(sp.n_frames, cfg.patch)
a = int(len(Sxx) * 0.6) // k_t * k_t
b = int(len(Sxx) * 0.85) // k_t * k_t
Sxx_train, Sxx_tune, Sxx_test = np.split(Sxx, [a, b])
final_train, final_tune, final_test = np.split(fin, [a, b])
print(Sxx_train.shape, Sxx_tune.shape, Sxx_test.shape)"""),
        code("""
# ref cell 4: display(unpatch(Sxx_test), unpatch(final_test))
from specenh.viz.plots import display
display(np.asarray(unpatch(Sxx_test, tiles_per_spec=k_t)),
        np.asarray(unpatch(final_test, tiles_per_spec=k_t)),
        os.path.join(out_dir, "display.png"), f, t, n=1, seed=0)"""),
        code("""
# ref cell 5: the Keras Conv2D/MaxPool/Conv2DTranspose model -> Flax
from specenh.models.autoencoder import make_model
model_cfg = ModelConfig()     # depth-2, (32, 32), k3 — parameter-count exact
autoencoder = make_model(model_cfg)"""),
        code("""
# ref cells 6-7: reshape + autoencoder.fit(epochs=100, batch_size=128)
from specenh.train import create_state, fit
tc = TrainConfig(epochs=3, batch_size=8, seed=0)  # short demo run
state = create_state(model_cfg, tc)
state, history = fit(state, reshape(Sxx_train), reshape(final_train),
                     reshape(Sxx_tune), reshape(final_tune), tc, verbose=True)"""),
        code("""
# ref cells 8-9: predict, squeeze, restitch
from specenh.train import predict
predictions = np.squeeze(np.asarray(predict(state, reshape(Sxx_test))), axis=3)
noisy = np.asarray(unpatch(Sxx_test, tiles_per_spec=k_t))
autoencoder_final = np.asarray(unpatch(predictions, tiles_per_spec=k_t))
pipeline_final = np.asarray(unpatch(final_test, tiles_per_spec=k_t))
print(noisy.shape, autoencoder_final.shape)"""),
        code("""
# ref cells 10-11: Original / Autoencoder / Pipeline triptych
from specenh.viz.plots import plt_spec_shot
plt_spec_shot(noisy[0], autoencoder_final[0], pipeline_final[0],
              "synthetic", 0, os.path.join(out_dir, "triptych.png"), f, t)"""),
        code("""
# ref cells 12-14: full-shot inference on a new shot — the production
# service (on TPU this runs the fused Pallas conv-AE kernel)
from specenh.bench.harness import make_enhance_shot_fn
serve = make_enhance_shot_fn(model_cfg, sp, cfg.patch)
new_traces = jnp.asarray(synthetic_shot_batch(1, 4, sp.n_samples)[0])
specs_new, enhanced_new = serve(state.params, new_traces)
print(enhanced_new.shape)"""),
        code("""
# ref cells 16-17: dstack channels + single-frame cross-channel view
from specenh.ops.enhance import classical_pipeline as _pipe
from specenh.viz.plots import plot_frame_view
stack_noisy = np.stack(np.asarray(specs_new), axis=-1)     # (F, T, C)
stack_pred = np.stack(np.asarray(enhanced_new), axis=-1)
stack_pipe = np.stack(np.asarray(_pipe(specs_new)), axis=-1)
plot_frame_view(stack_noisy, stack_pipe[:, :stack_pred.shape[1]], stack_pred,
                frm=100, shotn="synthetic", t=t, f=f,
                fname=os.path.join(out_dir, "frame.png"))"""),
        code("""
# ref cells 18-19: dump frames + stitch the movie (s<shot>-f<NNNNN>.jpg)
from specenh.viz.movie import dump_frames, render_movie
frames_dir = os.path.join(out_dir, "frames")
n = dump_frames(stack_noisy, stack_pipe[:, :stack_pred.shape[1]], stack_pred,
                t, f, "000001", frames_dir, start=0, stop=3)
print(n, sorted(os.listdir(frames_dir))[:3])"""),
    ]
    return nb(cells)


def dataset_nb():
    cells = [
        md("""# spec_denoising/dataset.ipynb — dataset exploration
Mirror of `reference: spec_denoising/dataset.ipynb` (the notebook that
defines the classical ops incl. `bilateral`, and the leak-free shot-level
split)."""),
        code(COMMON_SETUP + """
# ref cells 0-1: imports + spec params + ops (quantfilt/gaussblr/meansub/
# morph/bilateral) — all live in specenh.ops.enhance, bit-exact vs cv2
from specenh.config import Config, SpecParams
from specenh.ops.stft import spectrogram, spectrogram_freqs, spectrogram_times
from specenh.ops import enhance
cfg = Config(spec=SpecParams(cut_shot=0.4)); sp = cfg.spec
f, t = spectrogram_freqs(sp), spectrogram_times(sp)"""),
        code("""
# ref cell 2: spectrogram + pipeline per sampled shot/channel
from specenh.data.dataset import synthetic_shot_batch
raw = synthetic_shot_batch(n_shots=5, n_channels=2, n_samples=sp.n_samples)
spectrograms = [np.asarray(spectrogram(jnp.asarray(s), sp)) for s in raw[:, 0]]
final = [np.asarray(enhance.classical_pipeline(jnp.asarray(x))) for x in spectrograms]
# the bilateral variant from this notebook (bit-exact cv2 arithmetic):
bil = np.asarray(enhance.bilateral(jnp.asarray(spectrograms[0])))"""),
        code("""
# ref cell 3: leak-free 60/25/15 split of the SHOT list (before tiling)
Sxx_train, final_train = spectrograms[:3], final[:3]
Sxx_tune, final_tune = spectrograms[3:4], final[3:4]
Sxx_test, final_test = spectrograms[4:], final[4:]
print(len(Sxx_train), len(Sxx_tune), len(Sxx_test))"""),
        code("""
# ref cell 4: original vs processed plot of the first training shot
import matplotlib.pyplot as plt
import matplotlib.gridspec as gridspec
fig = plt.figure(figsize=(8, 12))
grd = gridspec.GridSpec(ncols=1, nrows=8, figure=fig)
ax0 = fig.add_subplot(grd[0])
ax0.pcolormesh(t, (f / 1000) + 1, Sxx_train[0], cmap="hot", shading="gouraud")
ax0.set_ylabel("Original")
ax1 = fig.add_subplot(grd[1])
ax1.pcolormesh(t, (f / 1000) + 1, final_train[0], cmap="hot", shading="gouraud")
ax1.set_ylabel("Processed")
fig.savefig(os.path.join(out_dir, "dataset_pair.png")); plt.close(fig)"""),
    ]
    return nb(cells)


def save_specs_nb():
    cells = [
        md("""# spec_denoising/denoise_save_specs.ipynb — build the HDF5 dataset
Mirror of `reference: spec_denoising/denoise_save_specs.ipynb`: spectrogram
+ pipeline per channel, persisted to the `ece_<shot>/chn_<n>` HDF5 schema."""),
        code(COMMON_SETUP + """
# ref cells 0-2: params + specgr/pipeline ops
import pickle
from specenh.config import Config, SpecParams
from specenh.io.shots import ece_key
from specenh.data.dataset import synthetic_shot_batch
cfg = Config(spec=SpecParams(cut_shot=0.4))
raw_dir = os.path.join(out_dir, "raw"); os.makedirs(raw_dir, exist_ok=True)
batch = synthetic_shot_batch(n_shots=2, n_channels=3,
                             n_samples=cfg.spec.n_samples)
flist = []
for s in range(batch.shape[0]):
    p = os.path.join(raw_dir, f"ece_{150000 + s}.pkl")
    with open(p, "wb") as fh:
        pickle.dump({ece_key(c + 1): batch[s, c] for c in range(3)}, fh)
    flist.append(p)"""),
        code("""
# ref cell 3: the shot loop writing spec/pipeline_out/f/t per channel —
# one call; idempotent, manifest-tracked, quarantine on corrupt shots
from specenh.pipeline import build_dataset
store_path = os.path.join(out_dir, "spectrogram_data.hdf5")
summary = build_dataset(cfg, flist, channels=[1, 2, 3], store_path=store_path)
print(summary)"""),
        code("""
# ref cell 5: list the store contents
from specenh.io.store import SpectrogramStore
with SpectrogramStore(store_path, "r") as store:
    for name in store.shots():
        print(name, store.channels_of(name))"""),
    ]
    return nb(cells)


def svd_nb():
    cells = [
        md("""# spec_denoising/denoising_by_svd.ipynb — SVD denoising (BES)
Mirror of `reference: spec_denoising/denoising_by_svd.ipynb`: classical
pipeline vs Gavish-Donoho SVD denoise, 4-panel comparison (including the
`> 0` clamp panel)."""),
        code(COMMON_SETUP + """
# ref cells 0-1: params + omega/computeSignal/denoiseSignal
from specenh.config import Config, SpecParams
from specenh.ops.stft import spectrogram
from specenh.ops.enhance import classical_pipeline
from specenh.ops.svd import denoise_signal
from specenh.data.dataset import synthetic_shot_batch
cfg = Config(spec=SpecParams(cut_shot=0.4)); sp = cfg.spec"""),
        code("""
# ref cell 2: 30 channels -> spectrogram / pipeline / SVD-denoise
raw = synthetic_shot_batch(n_shots=1, n_channels=6, n_samples=sp.n_samples)[0]
Sxx = np.asarray(spectrogram(jnp.asarray(raw), sp))
processed = np.asarray(classical_pipeline(jnp.asarray(Sxx)))
svded = np.stack([np.asarray(denoise_signal(jnp.asarray(s))) for s in Sxx])
print(Sxx.shape, processed.shape, svded.shape)"""),
        code("""
# ref cell 3: 4-panel comparison for one channel (incl. the >0 clamp)
from specenh.viz.plots import plot_svd_compare
plot_svd_compare(Sxx[0], processed[0], svded[0], "122117", 0,
                 os.path.join(out_dir, "svd_compare.png"))"""),
    ]
    return nb(cells)


def denoising_nb():
    cells = [
        md("""# spec_denoising/denoising_spectrogram.ipynb — the pipeline, staged
Mirror of `reference: spec_denoising/denoising_spectrogram.ipynb`: the
5-stage pipeline applied to a 40-channel shot, with the per-stage and
cross-channel frame views."""),
        code(COMMON_SETUP + """
# ref cells 0-2: params + the channel loop -> here one batched call
from specenh.config import Config, SpecParams
from specenh.ops.stft import spectrogram, spectrogram_freqs, spectrogram_times
from specenh.ops.enhance import pipeline_stages
from specenh.data.dataset import synthetic_shot_batch
cfg = Config(spec=SpecParams(cut_shot=0.4)); sp = cfg.spec
f, t = spectrogram_freqs(sp), spectrogram_times(sp)
raw = synthetic_shot_batch(n_shots=1, n_channels=8, n_samples=sp.n_samples)[0]
Sxx = np.asarray(spectrogram(jnp.asarray(raw), sp))   # (C, F, T)"""),
        code("""
# ref cell 3: quantfilt -> gaussblr -> meansub (+ morph/final), all stages
stages = pipeline_stages(jnp.asarray(Sxx))
out_quant = np.asarray(stages["quant"])
out_gauss = np.asarray(stages["gauss"])
out_mean = np.asarray(stages["mean"])
print({k: np.asarray(v).shape for k, v in stages.items()})"""),
        code("""
# ref cell 4: cross-channel frame view at frm=900 (scaled to shot length)
from specenh.viz.plots import plot_frame_view
frm = min(100, Sxx.shape[-1] - 1)
plot_frame_view(np.moveaxis(Sxx, 0, -1), np.moveaxis(out_quant, 0, -1),
                np.moveaxis(out_mean, 0, -1), frm=frm, shotn="146079",
                t=t, f=f, fname=os.path.join(out_dir, "frame900.png"))"""),
        code("""
# ref cell 5: stage-by-stage plot for one channel
from specenh.viz.plots import plot_stages
ch = {k: np.asarray(v)[3] for k, v in stages.items()}
plot_stages(ch, Sxx[3], os.path.join(out_dir, "stages.png"), f, t)"""),
    ]
    return nb(cells)


def main():
    os.makedirs(OUT, exist_ok=True)
    books = {
        "01_graphs.ipynb": graphs_nb(),
        "02_dataset.ipynb": dataset_nb(),
        "03_denoise_save_specs.ipynb": save_specs_nb(),
        "04_denoising_by_svd.ipynb": svd_nb(),
        "05_denoising_spectrogram.ipynb": denoising_nb(),
    }
    for name, book in books.items():
        with open(os.path.join(OUT, name), "w") as fh:
            json.dump(book, fh, indent=1)
        print("wrote", name)


if __name__ == "__main__":
    main()
