"""Full-reference-scale validation run.

Reproduces the reference's end-to-end workflow at its REAL workload shape
(BASELINE.json 'full-campaign streaming' config) on synthetic shots:

  1. N shots x 20 channels x 2 s @ 500 kHz raw traces (SPEC binaries)
  2. streaming campaign: native prefetch -> fused STFT+pipeline -> HDF5
  3. training: scan_k3 autoencoder, batch 128, tile split (reference recipe)
  4. vmapped kernel-size sweep [(3,3),(5,5),(7,7)]
  5. SVD denoise + artifacts
  6. reports wall-clock for every stage + quality metrics

Run: python scripts/full_campaign.py [workdir] [n_shots] [--stream]
         [--engine f32|bf16|kernel] [--writers N] [--epochs N]

--stream forces the host-streamed training epoch (the 200-shot-recipe
mechanism; auto-engages anyway when the tile tensors exceed the HBM
budget), --engine kernel runs the fused Pallas training kernels, and
--writers N shards the campaign's HDF5 persist stage.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from specenh.cli import main as cli
from specenh.utils.logging import SpanTimer


def run(workdir="out/full_campaign", n_shots=5, stream=False, engine=None,
        writers=1, epochs=15):
    os.makedirs(workdir, exist_ok=True)
    t = SpanTimer()
    raw = os.path.join(workdir, "raw")
    bins = os.path.join(workdir, "bin")
    ds = os.path.join(workdir, "specs.hdf5")

    with t("1_synth"):
        cli(["synth-shots", "--out", raw, "--shots", str(n_shots),
             "--channels", "20", "--samples", "1000000"])
    with t("2_convert_bin"):
        cli(["convert-bin", "--data-dir", raw, "--out-dir", bins, "--channels", "20"])
    with t("3_campaign_streaming"):
        cli(["build-data", "--data-dir", bins, "--out", ds, "--channels", "20",
             "--binary", "--writers", str(writers), "--quiet"])
    with t("4_train"):
        cli(["train", "--dataset", ds, "--out-dir", os.path.join(workdir, "train"),
             "--model", "scan_k3", "--epochs", str(epochs),
             "--num-shots", str(n_shots)]
            + (["--stream", "always"] if stream else [])
            + (["--engine", engine] if engine else [])
            + ["--quiet"])
    with t("5_sweep"):
        cli(["sweep", "--dataset", ds, "--out-dir", os.path.join(workdir, "sweep"),
             "--grid", "kernel", "--epochs", "3", "--num-shots", str(n_shots),
             "--quiet"])
    with t("6_svd"):
        cli(["denoise", "--dataset", ds, "--out-dir", os.path.join(workdir, "svd")])

    report = {k: round(v["total_s"], 2) for k, v in t.report().items()}
    report["shots"] = n_shots
    report["channels_processed"] = n_shots * 20
    print(json.dumps(report, indent=2))
    with open(os.path.join(workdir, "campaign_report.json"), "w") as fh:
        json.dump(report, fh)


if __name__ == "__main__":
    import argparse

    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("workdir", nargs="?", default="out/full_campaign")
    ap.add_argument("n_shots", nargs="?", type=int, default=5)
    ap.add_argument("--stream", action="store_true",
                    help="force the host-streamed training epoch")
    ap.add_argument("--engine", choices=["f32", "bf16", "kernel"], default=None)
    ap.add_argument("--writers", type=int, default=1)
    ap.add_argument("--epochs", type=int, default=15)
    a = ap.parse_args()
    run(a.workdir, a.n_shots, stream=a.stream, engine=a.engine,
        writers=a.writers, epochs=a.epochs)
