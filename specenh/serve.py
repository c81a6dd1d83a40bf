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
from specenh.io.store import (
    CampaignManifest,
    SpectrogramStore,
    StoreWriterPool,
    retire_stale_manifest,
)
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
        # pre-scatter the kernel serving weights once (identity on the
        # Flax path): every enhance() call then skips the per-call weight
        # cache entirely
        self.params = self.fn.prepare(params)
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

    Fully pipelined host side (three stages on their own threads/queues):
    a READER thread pulls shots off disk, the MAIN thread dispatches to
    the device (async; results in flight bounded by the queues), and
    WRITER threads sync results to host and persist them — so disk read
    of shot i+1, device compute of shot i, and the HDF5 persist of shot
    i-1 genuinely overlap.  ``store`` may be a single SpectrogramStore
    (one writer thread, today's layout) or a :class:`StoreWriterPool`
    (N writer threads, each owning its OWN shard file — the persist
    stage is the measured bottleneck and HDF5 serializes writers per
    file).  Each h5py file is touched by exactly one thread; the
    manifest/metrics/counters are serialized by a lock.

    Metrics per shot: ``read_s`` (disk) and ``latency_s`` (arrival ->
    persisted; includes pipeline queueing — the honest end-to-end number).
    Per drain: a ``serve_batch`` event with shots/s."""
    import queue
    import threading

    todo = []
    for path in sorted(glob.glob(os.path.join(watch_dir, "*.bin"))):
        shot = shot_number_from_path(os.path.basename(path))
        if manifest.is_done(shot) or shot in manifest.failed_shots:
            continue
        todo.append((shot, path))
        if max_new is not None and len(todo) >= max_new:
            break
    counts = {"done": 0, "failed": 0}
    if not todo:
        return counts

    pool = (
        store if isinstance(store, StoreWriterPool)
        else StoreWriterPool.from_stores([store])
    )

    q_in: "queue.Queue" = queue.Queue(maxsize=2)
    stop = threading.Event()
    io_lock = threading.Lock()  # manifest + metrics + counts + prints

    def reader():
        for shot, path in todo:
            if stop.is_set():
                break
            t0 = time.perf_counter()
            try:
                traces = read_shot(
                    path, service.n_channels, service.cfg.spec.n_samples
                )
                q_in.put(("ok", shot, t0, time.perf_counter() - t0, traces))
            except Exception as e:  # corrupt shot -> quarantine downstream
                q_in.put(("err", shot, t0, time.perf_counter() - t0, e))
        q_in.put(None)

    def persist(own_store, item):
        kind, shot, t0, read_s, payload = item
        try:
            if kind == "err":
                with io_lock:
                    manifest.mark_failed(shot, str(payload))
                    counts["failed"] += 1
                    if verbose:
                        print(f"quarantined {shot}: {payload}")
                return
            specs, enhanced = payload
            # device -> host sync happens HERE, off the dispatch path
            specs, enhanced = np.asarray(specs), np.asarray(enhanced)
            for i in range(specs.shape[0]):
                own_store.write_channel(
                    shot, i + 1, specs[i], service._f, service._t,
                    enhanced[i], prefix="enhanced",
                )
            own_store.flush()
            latency = time.perf_counter() - t0
            with io_lock:
                manifest.mark_done(shot)
                counts["done"] += 1
                if metrics:
                    metrics.log(
                        "shot_enhanced", shot=shot,
                        channels=int(specs.shape[0]),
                        latency_s=latency, read_s=read_s,
                    )
                if verbose:
                    print(
                        f"shot {shot}: {specs.shape[0]} channels "
                        f"in {latency:.2f}s"
                    )
        except Exception as e:  # persist failure: quarantine, keep serving
            # if even RECORDING the failure fails (disk full), let it
            # escape — the pool's dead-writer drain keeps the pipeline
            # unblocked and join()/raise_if_failed reports it
            with io_lock:
                manifest.mark_failed(shot, f"persist: {e}")
                counts["failed"] += 1
                if verbose:
                    print(f"persist failed for {shot}: {e}")

    rt = threading.Thread(target=reader, name="serve-reader", daemon=True)
    rt.start()
    pool.start(persist)
    t_start = time.perf_counter()
    try:
        while True:
            item = q_in.get()
            if item is None:
                break
            kind, shot, t0, read_s, payload = item
            if kind == "err":
                pool.submit(shot, (kind, shot, t0, read_s, payload))
                continue
            result = service.fn(service.params, payload)  # async dispatch
            pool.submit(shot, ("ok", shot, t0, read_s, result))
    finally:
        # Shutdown MUST complete before serve_once returns or raises:
        # the caller's `with SpectrogramStore(...)` closes the h5py files
        # the writer threads are using, so an exception (dispatch error,
        # KeyboardInterrupt) escaping with threads still live would have
        # a writer persisting into a closed store.  Finish the writers'
        # in-flight work, then unwedge and retire the reader.
        pool.join()
        stop.set()
        while rt.is_alive():  # drain q_in so a blocked reader put returns
            try:
                q_in.get_nowait()
            except queue.Empty:
                time.sleep(0.005)
        rt.join()
    pool.raise_if_failed()
    elapsed = time.perf_counter() - t_start
    if metrics:
        metrics.log(
            "serve_batch", done=counts["done"], failed=counts["failed"],
            seconds=elapsed, writers=pool.writers,
            shots_per_sec=(counts["done"] / elapsed) if elapsed > 0 else 0.0,
        )
    return counts


def serve_forever(
    service: EnhanceService,
    watch_dir: str,
    out_store: str,
    poll_s: float = 1.0,
    max_shots: Optional[int] = None,
    once: bool = False,
    writers: int = 1,
    verbose: bool = True,
) -> dict:
    """Poll ``watch_dir`` until ``max_shots`` NEW shots processed (or
    forever).  ``once=True`` drains the current backlog and returns — use
    for scripted runs; without it a restart against a fully-processed
    directory keeps waiting for new shots (daemon semantics).

    ``writers > 1`` shards the persist stage (the measured serving
    bottleneck) over that many HDF5 writer threads/files — see
    :class:`StoreWriterPool`; downstream readers see one union store."""
    store = (
        StoreWriterPool(out_store, writers)
        if writers > 1 else SpectrogramStore(out_store)
    )
    retire_stale_manifest(store, out_store + ".serve.jsonl")
    manifest = CampaignManifest(out_store + ".serve.jsonl")
    totals = {"done": 0, "failed": 0}
    if not once:
        # daemon mode: pre-pay the compile before shots arrive; in drain
        # mode the first shot pays it (same total, nothing wasted when the
        # backlog is already empty)
        service.warmup()
    try:
        with store, MetricsLogger(
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
