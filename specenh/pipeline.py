"""Dataset-build campaign: raw shots -> spectrograms + pipeline labels -> HDF5.

The TPU-native equivalent of ``python spec_denoising/pipeline_data.py``
(call stack SURVEY.md 3.1): the per-channel Python loop over
scipy/numpy/cv2 becomes ONE jitted device call per shot — all channels are
batched through the fused STFT + classical pipeline — while pickle IO and
HDF5 writes stay on the host.  Corrupt shots are quarantined (reference
behaviour, pipeline_data.py:118-122, minus its unimported-``traceback``
crash bug) and recorded in a resumable manifest.
"""

from __future__ import annotations

import glob
import os
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from specenh.config import Config
from specenh.io.shots import ShotReadError, read_ece_channels, shot_number_from_path
from specenh.io.store import CampaignManifest, SpectrogramStore, retire_stale_manifest
from specenh.ops.enhance import classical_pipeline
from specenh.ops.stft import spectrogram, spectrogram_freqs, spectrogram_times

__all__ = ["build_dataset", "build_dataset_streaming", "process_shot_fn"]


def process_shot_fn(cfg: Config):
    """Jitted (C, n_samples) traces -> (specs, labels), the device half of
    the campaign."""

    @jax.jit
    def fn(traces):
        specs = spectrogram(traces, cfg.spec)
        labels = classical_pipeline(specs, cfg.pipeline)
        return specs, labels

    return fn


def build_dataset(
    cfg: Config,
    shot_files: Optional[Sequence[str]] = None,
    channels: Optional[Sequence[int]] = None,
    store_path: Optional[str] = None,
    manifest_path: Optional[str] = None,
    verbose: bool = True,
) -> dict:
    """Run the campaign.  Returns summary counts.

    Resumable: shots present in the manifest are skipped — both completed
    ones and quarantined failures (delete a failure's line from the
    manifest JSONL to force a retry) — and HDF5 writes are idempotent, so
    a crashed run continues where it stopped.
    """
    shot_files = (
        sorted(glob.glob(os.path.join(cfg.paths.data_dir, "*.pkl")))
        if shot_files is None
        else list(shot_files)
    )
    channels = list(channels) if channels is not None else list(range(1, 21))
    store_path = store_path or cfg.paths.dataset_file
    manifest_path = manifest_path or store_path + ".manifest.jsonl"

    fn = process_shot_fn(cfg)
    f_axis = spectrogram_freqs(cfg.spec)
    t_axis = spectrogram_times(cfg.spec)
    done = skipped = failed = 0

    with SpectrogramStore(store_path) as store:
        retire_stale_manifest(store, manifest_path)
        manifest = CampaignManifest(manifest_path)
        for fname in shot_files:
            shot = shot_number_from_path(fname)
            # failed shots are quarantined once (same resume semantics as
            # the streaming driver and serve.py)
            if manifest.is_done(shot) or shot in manifest.failed_shots:
                skipped += 1
                continue
            try:
                traces = read_ece_channels(fname, channels, cfg.spec.n_samples)
            except ShotReadError as e:
                manifest.mark_failed(shot, str(e))
                failed += 1
                if verbose:
                    print(f"quarantined {shot}: {e}")
                continue
            specs, labels = fn(jnp.asarray(traces))
            specs = np.asarray(specs)
            labels = np.asarray(labels)
            for i, chn in enumerate(channels):
                store.write_channel(shot, chn, specs[i], f_axis, t_axis, labels[i])
            store.flush()
            manifest.mark_done(shot)
            done += 1
            if verbose:
                print(f"shot {shot}: {len(channels)} channels written")
    manifest.close()
    return {"done": done, "skipped": skipped, "failed": failed}


def build_dataset_streaming(
    cfg: Config,
    bin_files: Sequence[str],
    n_channels: int,
    store_path: Optional[str] = None,
    manifest_path: Optional[str] = None,
    n_threads: int = 4,
    writers: int = 1,
    verbose: bool = True,
) -> dict:
    """Campaign over SPEC binary shots with the NATIVE threaded prefetcher:
    disk IO + decode run in C++ worker threads, the device computes the
    current shot's STFT + pipeline, and WRITER threads sync + persist
    results — all three stages overlap (the streaming production path;
    falls back to synchronous Python reads without the native library).

    ``writers > 1`` shards the HDF5 persist over that many files (see
    :class:`specenh.io.store.StoreWriterPool`) — the persist stage is the
    measured host-side bottleneck once the device is fast, and HDF5
    serializes writers per file.  Readers see one union store."""
    import threading

    from specenh.io.native import NativePrefetcher
    from specenh.io.store import StoreWriterPool

    store_path = store_path or cfg.paths.dataset_file
    manifest_path = manifest_path or store_path + ".manifest.jsonl"
    fn = process_shot_fn(cfg)
    f_axis = spectrogram_freqs(cfg.spec)
    t_axis = spectrogram_times(cfg.spec)

    bin_files = list(bin_files)
    pool = StoreWriterPool(store_path, writers)
    retire_stale_manifest(pool, manifest_path)
    manifest = CampaignManifest(manifest_path)
    pending = [
        p for p in bin_files
        if not manifest.is_done(shot_number_from_path(p))
        and shot_number_from_path(p) not in manifest.failed_shots
    ]
    skipped = len(bin_files) - len(pending)
    counts = {"done": 0, "failed": 0}
    io_lock = threading.Lock()  # manifest + counts + prints

    def persist(own_store, item):
        shot, (specs, labels) = item
        try:
            # device -> host sync happens HERE, off the dispatch path
            specs = np.asarray(specs)
            labels = np.asarray(labels)
            for i in range(specs.shape[0]):
                own_store.write_channel(
                    shot, i + 1, specs[i], f_axis, t_axis, labels[i]
                )
            own_store.flush()
            with io_lock:
                manifest.mark_done(shot)
                counts["done"] += 1
                if verbose:
                    print(f"shot {shot}: {specs.shape[0]} channels written")
        except Exception as e:  # persist failure: quarantine, continue
            # a failure while RECORDING the failure escapes to the pool's
            # dead-writer drain (keeps the dispatch loop unblocked)
            with io_lock:
                manifest.mark_failed(shot, f"persist: {e}")
                counts["failed"] += 1
                if verbose:
                    print(f"persist failed for {shot}: {e}")

    pool.start(persist)
    with pool:
        try:
            with NativePrefetcher(
                pending, n_channels, cfg.spec.n_samples, n_threads=n_threads
            ) as pf:
                for idx, traces in pf:
                    if traces is None:
                        # the prefetcher reports the shot index even on
                        # failure — quarantine the file so resumes skip it
                        # instead of re-reading and re-failing forever
                        bad = shot_number_from_path(pending[idx])
                        with io_lock:
                            manifest.mark_failed(bad, "unreadable SPEC binary")
                            counts["failed"] += 1
                            if verbose:
                                print(f"shot {bad}: read failed, quarantined")
                        continue
                    shot = shot_number_from_path(pending[idx])
                    result = fn(jnp.asarray(traces))  # async dispatch
                    pool.submit(shot, (shot, result))
        finally:
            # writers must retire BEFORE the pool's h5py files close
            # (same shutdown contract as serve.serve_once)
            pool.join()
    manifest.close()
    pool.raise_if_failed()
    return {"done": counts["done"], "skipped": skipped, "failed": counts["failed"]}
