"""Shot-enhancement service: watch a directory, enhance, persist, report.

The deployment shape implied by the reference's workflow (BASELINE.json
'full-campaign streaming'): new raw shots appear (SPEC binaries from the
digitizer pipeline), each is pushed through the fused
STFT -> conv-AE -> restitch service on the TPU, and enhanced spectrograms
are persisted with per-shot latency metrics.

Design: one resident jitted service function (compiled once), a directory
poller with a processed-ledger (idempotent across restarts, like the
campaign manifest), quarantine for corrupt shots, and JSONL latency
metrics.  ``serve_once`` processes the current backlog and returns; the
CLI's ``specenh serve`` loops with a poll interval until interrupted or
``--max-shots`` is reached.
"""

from __future__ import annotations

import glob
import os
import time
from typing import Optional

import jax
import numpy as np

from specenh.config import Config, ModelConfig
from specenh.bench.harness import make_enhance_shot_fn
from specenh.io.native import read_shot
from specenh.io.shots import shot_number_from_path
from specenh.io.store import CampaignManifest, SpectrogramStore
from specenh.ops.stft import spectrogram_freqs, spectrogram_times
from specenh.utils.logging import MetricsLogger

__all__ = ["EnhanceService", "serve_once", "serve_forever"]


class EnhanceService:
    """Resident enhancement service: compile once, serve many."""

    def __init__(
        self,
        cfg: Config = Config(),
        model_cfg: ModelConfig = ModelConfig(),
        params=None,
        n_channels: int = 20,
        mesh=None,
    ):
        self.cfg = cfg
        self.n_channels = n_channels
        self.fn = make_enhance_shot_fn(
            model_cfg, cfg.spec, cfg.patch, mesh=mesh, n_channels=n_channels
        )
        if params is None:
            from specenh.models.autoencoder import make_model

            params = make_model(model_cfg).init(
                jax.random.PRNGKey(0),
                np.zeros((1, *model_cfg.input_shape), np.float32),
            )
        self.params = params
        self._f = spectrogram_freqs(cfg.spec)
        self._t = spectrogram_times(cfg.spec)

    def warmup(self):
        traces = np.zeros((self.n_channels, self.cfg.spec.n_samples), np.float32)
        specs, enhanced = self.fn(self.params, traces)
        np.asarray(enhanced.ravel()[:1])

    def enhance(self, traces: np.ndarray):
        """(C, n_samples) -> (specs, enhanced) as numpy (host)."""
        specs, enhanced = self.fn(self.params, traces)
        return np.asarray(specs), np.asarray(enhanced)


def serve_once(
    service: EnhanceService,
    watch_dir: str,
    store: SpectrogramStore,
    manifest: CampaignManifest,
    metrics: Optional[MetricsLogger] = None,
    max_new: Optional[int] = None,
    verbose: bool = True,
) -> dict:
    """Process the current backlog of *.bin shots (at most ``max_new``).

    Shots recorded done OR failed in the manifest are skipped — a corrupt
    shot is quarantined exactly once across polls and restarts (delete the
    ledger line or file to force a retry).  Returns counts.

    One device result stays in flight: while the TPU enhances shot i, the
    host reads shot i+1 from disk and persists shot i-1 — the same
    overlap pattern as pipeline.build_dataset_streaming."""
    done = failed = 0
    inflight = None  # (shot, t0, device_result)

    def _drain(item):
        nonlocal done
        shot, t0, (specs, enhanced) = item
        specs, enhanced = np.asarray(specs), np.asarray(enhanced)
        for i in range(specs.shape[0]):
            store.write_channel(
                shot, i + 1, specs[i], service._f, service._t, enhanced[i],
                prefix="enhanced",
            )
        store.flush()
        manifest.mark_done(shot)
        # arrival -> persisted, the true end-to-end latency in the
        # pipelined server (it includes the overlap window in which the
        # NEXT shot was being read — that wait is real)
        latency = time.perf_counter() - t0
        done += 1
        if metrics:
            metrics.log("shot_enhanced", shot=shot, channels=int(specs.shape[0]),
                        latency_s=latency)
        if verbose:
            print(f"shot {shot}: {specs.shape[0]} channels in {latency:.2f}s")

    for path in sorted(glob.glob(os.path.join(watch_dir, "*.bin"))):
        if max_new is not None and done + failed + (inflight is not None) >= max_new:
            break
        shot = shot_number_from_path(os.path.basename(path))
        if manifest.is_done(shot) or shot in manifest.failed_shots:
            continue
        t0 = time.perf_counter()
        try:
            traces = read_shot(path, service.n_channels, service.cfg.spec.n_samples)
        except Exception as e:
            manifest.mark_failed(shot, str(e))
            failed += 1
            if verbose:
                print(f"quarantined {shot}: {e}")
            continue
        result = service.fn(service.params, traces)  # async dispatch
        if inflight is not None:
            _drain(inflight)
        inflight = (shot, t0, result)
    if inflight is not None:
        _drain(inflight)
    return {"done": done, "failed": failed}


def serve_forever(
    service: EnhanceService,
    watch_dir: str,
    out_store: str,
    poll_s: float = 1.0,
    max_shots: Optional[int] = None,
    once: bool = False,
    verbose: bool = True,
) -> dict:
    """Poll ``watch_dir`` until ``max_shots`` NEW shots processed (or
    forever).  ``once=True`` drains the current backlog and returns — use
    for scripted runs; without it a restart against a fully-processed
    directory keeps waiting for new shots (daemon semantics)."""
    manifest = CampaignManifest(out_store + ".serve.jsonl")
    totals = {"done": 0, "failed": 0}
    if not once:
        # daemon mode: pre-pay the compile before shots arrive; in drain
        # mode the first shot pays it (same total, nothing wasted when the
        # backlog is already empty)
        service.warmup()
    try:
        with SpectrogramStore(out_store) as store, MetricsLogger(
            out_store + ".metrics.jsonl"
        ) as metrics:
            while True:
                remaining = (
                    None if max_shots is None
                    else max_shots - totals["done"] - totals["failed"]
                )
                r = serve_once(
                    service, watch_dir, store, manifest, metrics,
                    max_new=remaining, verbose=verbose,
                )
                totals["done"] += r["done"]
                totals["failed"] += r["failed"]
                if once:
                    break
                if max_shots is not None and totals["done"] + totals["failed"] >= max_shots:
                    break
                time.sleep(poll_s)
    except KeyboardInterrupt:
        if verbose:
            print("interrupted; shutting down cleanly")
    finally:
        manifest.close()
    return totals
