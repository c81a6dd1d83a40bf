"""SVD low-rank denoising — the denoising_by_svd.ipynb workflow.

Per channel: spectrogram -> classical pipeline -> denoise_signal (drop the
dominant singular component), then the 4-row compare plot with log-density
histograms (cell 3).

Run:  python examples/02_svd_denoising.py [out_dir]
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax.numpy as jnp
import numpy as np

from specenh.config import PipelineConfig, SpecParams
from specenh.data.dataset import synthetic_shot_batch
from specenh.ops.enhance import classical_pipeline
from specenh.ops.stft import spectrogram
from specenh.ops.svd import compute_signal, denoise_signal
from specenh.viz.plots import plot_svd_compare


def main(out_dir="out/example02"):
    os.makedirs(out_dir, exist_ok=True)
    sp = SpecParams(cut_shot=0.4)
    traces = synthetic_shot_batch(1, n_channels=4, n_samples=sp.n_samples)[0]

    # one batched device call for all channels of the "BES" shot
    specs = spectrogram(jnp.asarray(traces), sp)
    processed = classical_pipeline(specs, PipelineConfig())
    svded = denoise_signal(specs)  # default: drop sigma_0 only

    channel = 0
    plot_svd_compare(
        np.asarray(specs[channel]),
        np.asarray(processed[channel]),
        np.asarray(svded[channel]),
        "synthetic", channel, os.path.join(out_dir, "svd_compare.png"),
    )
    # the Gavish-Donoho variants
    optimal = denoise_signal(specs[channel], use_optimal=True)
    signal = compute_signal(specs[channel])
    print("denoised shapes:", svded.shape, np.asarray(optimal).shape, np.asarray(signal).shape)
    print("artifacts in", out_dir)


if __name__ == "__main__":
    main(*sys.argv[1:])
