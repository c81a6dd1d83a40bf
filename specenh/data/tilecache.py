"""Pre-tiled on-disk tile cache for streamed campaigns.

The HDF5 store is the durable, reference-schema artifact (float32,
per-record datasets — PARITY.md #20).  Re-reading and re-tiling it costs
every RUN one full-disk pass (the within-run re-reads are already deleted
by train_stream's host-RAM chunk cache).  Workflows that revisit the same
dataset many times — sweeps, resumed campaigns, repeated recipes — can
persist the CANONICAL tile stream once:

* one flat binary file per split: a fixed little-endian header
  (magic/version/dtype/n/F/W) followed by the x tiles then the y tiles as
  two contiguous (n, F, W) arrays.  ``np.memmap``-able, so a chunk read
  is one contiguous slab — no per-record HDF5 slicing, no assembly
  copies;
* a JSON sidecar fingerprints the EXACT slice plan (store identity,
  (shot, chn, lo, hi) tuples, patch geometry, dtype).  A cache that does
  not match the requested plan is rebuilt, never silently reused; a
  build that died before the sidecar write is invisible and rebuilt;
* ``dtype='bf16'`` halves the bytes, and with ``--engine kernel`` is
  value-exact (the fused kernel casts tile operands to bfloat16 anyway —
  ops/ae_train_kernel.tiles_to_x16; pinned by
  test_bf16_rounded_inputs_identical_sums).

Reference referent: the reference has no analogue (it re-reads HDF5 and
re-patches per run, hyperparam_scan.py:130-141); this is framework-side
infrastructure for its largest recipes.
"""

from __future__ import annotations

import glob
import hashlib
import json
import os
import struct
from typing import List, Optional, Sequence, Tuple

import numpy as np

from specenh.config import PatchSpec

__all__ = [
    "plan_fingerprint",
    "store_identity",
    "build_tile_cache",
    "open_tile_cache",
    "open_or_build",
    "TileCacheReader",
]


def store_identity(store) -> str:
    """Identity string binding a cache to the backing store FILES, not just
    the path: ``path:size:mtime_ns`` for the base HDF5 file and every
    ``.shardK`` sidecar (the writer-pool layout ``io.store`` reads).  A
    store regenerated in place — same path, same shot names and shapes,
    different bytes (re-run build-data after a quarantine, a synth store
    rebuilt with another seed) — then changes the fingerprint and the
    cache rebuilds instead of silently serving stale tiles."""
    path = getattr(store, "path", None)
    if not path or not os.path.exists(path):
        return str(path)
    # glob.escape: a store path containing [, ], ? or * must not be
    # treated as a pattern, or shard sidecars silently drop out of the
    # identity (and a shard rewrite would not invalidate the cache)
    shards = sorted(
        (p for p in glob.glob(glob.escape(path) + ".shard*")
         if p[len(path) + 6:].isdigit()),
        key=lambda p: int(p[len(path) + 6:]),
    )
    parts = []
    for p in [path] + shards:
        st = os.stat(p)
        parts.append(f"{p}:{st.st_size}:{st.st_mtime_ns}")
    return ";".join(parts)

_MAGIC = b"SPTC0001"
_DTYPES = {"f32": np.float32}


def _np_dtype(name: str):
    if name == "bf16":
        import ml_dtypes

        return np.dtype(ml_dtypes.bfloat16)
    return np.dtype(_DTYPES[name])


def _paths(base: str, split: str) -> Tuple[str, str]:
    return f"{base}.{split}.tiles", f"{base}.{split}.json"


def plan_fingerprint(
    store_id: str, slices: Sequence, ps: PatchSpec, dtype: str
) -> str:
    """Digest of everything the cached bytes depend on."""
    doc = {
        "store": store_id,
        "slices": [(s.shot, int(s.chn), int(s.lo), int(s.hi)) for s in slices],
        "ps": [ps.tile_freq, ps.tile_time, ps.step],
        "dtype": dtype,
    }
    return hashlib.sha256(
        json.dumps(doc, sort_keys=True).encode()
    ).hexdigest()


class TileCacheReader:
    """Memmap view over one split's pre-tiled (x, y) tensors."""

    def __init__(self, bin_path: str):
        with open(bin_path, "rb") as fh:
            magic = fh.read(8)
            if magic != _MAGIC:
                raise ValueError(f"{bin_path}: not a tile cache (magic {magic!r})")
            dlen, n, f, w = struct.unpack("<BQII", fh.read(17))
            dname = fh.read(dlen).decode()
            self._off = fh.tell()
        self.dtype_name = dname
        self.n, self.f, self.w = int(n), int(f), int(w)
        dt = _np_dtype(dname)
        count = self.n * self.f * self.w
        self._x = np.memmap(bin_path, dtype=dt, mode="r", offset=self._off,
                            shape=(self.n, self.f, self.w))
        self._y = np.memmap(bin_path, dtype=dt, mode="r",
                            offset=self._off + count * dt.itemsize,
                            shape=(self.n, self.f, self.w))

    def read(self, lo: int, hi: int) -> Tuple[np.ndarray, np.ndarray]:
        """Tiles [lo, hi) as materialized (k, F, W, 1) arrays in the
        stored dtype (one contiguous copy each)."""
        return self.read_x(lo, hi), self.read_y(lo, hi)

    def read_x(self, lo: int, hi: int) -> np.ndarray:
        """Just the spec tiles (consumers that never touch the labels —
        the CLI bench loop — skip the label copy)."""
        return np.asarray(self._x[lo:hi])[..., None]

    def read_y(self, lo: int, hi: int) -> np.ndarray:
        return np.asarray(self._y[lo:hi])[..., None]


def build_tile_cache(
    store,
    slices: Sequence,
    base: str,
    split: str,
    ps: PatchSpec = PatchSpec(),
    dtype: str = "f32",
    store_id: Optional[str] = None,
    chunk_tiles: int = 4096,
    verbose: bool = False,
) -> str:
    """One pass over ``store``: write the canonical tile stream of
    ``slices`` to ``<base>.<split>.tiles`` (+ fingerprint sidecar).
    Returns the binary path.  Safe against interruption: the sidecar is
    written LAST, so a partial file is treated as absent."""
    from specenh.train_stream import _chunk_plans, _read_chunk

    bin_path, meta_path = _paths(base, split)
    os.makedirs(os.path.dirname(os.path.abspath(bin_path)), exist_ok=True)
    if os.path.exists(meta_path):
        os.remove(meta_path)  # invalidate any previous build first
    n = sum(s.n_tiles for s in slices)
    plans = _chunk_plans(list(slices), chunk_tiles)
    dt = _np_dtype(dtype)
    f = w = None
    pos = 0
    with open(bin_path, "wb") as fh:
        # header written after the first chunk reveals (F, W); reserve it
        first = _read_chunk(store, plans[0], ps) if plans else None
        f = first[0].shape[1] if first is not None else ps.tile_freq
        w = ps.tile_time
        fh.write(_MAGIC)
        dname = dtype.encode()
        fh.write(struct.pack("<BQII", len(dname), n, f, w))
        fh.write(dname)
        off = fh.tell()
    count = n * f * w
    mx = np.memmap(bin_path, dtype=dt, mode="r+", offset=off, shape=(n, f, w)) \
        if n else None
    my = np.memmap(bin_path, dtype=dt, mode="r+",
                   offset=off + count * dt.itemsize, shape=(n, f, w)) \
        if n else None
    for j, plan in enumerate(plans):
        x, y = first if (j == 0 and first is not None) \
            else _read_chunk(store, plan, ps)
        k = len(x)
        mx[pos:pos + k] = x[..., 0].astype(dt, copy=False)
        my[pos:pos + k] = y[..., 0].astype(dt, copy=False)
        pos += k
        if verbose:
            print(f"tile-cache {split}: {pos}/{n} tiles", flush=True)
    if mx is not None:
        mx.flush()
        my.flush()
    sid = store_id if store_id is not None else store_identity(store)
    with open(meta_path, "w") as fh:
        json.dump({"fingerprint": plan_fingerprint(sid, slices, ps, dtype),
                   "n": n, "f": f, "w": w, "dtype": dtype}, fh)
    return bin_path


def open_or_build(
    store,
    slices: Sequence,
    base: str,
    split: str,
    ps: PatchSpec = PatchSpec(),
    dtype: str = "f32",
    chunk_tiles: int = 4096,
    verbose: bool = False,
) -> "TileCacheReader":
    """Reader for ``slices``' canonical tile stream, building the cache
    first if absent/stale (the usual entry point: fit_streaming's
    train/tune/test readers and the CLI artifact stages)."""
    sid = store_identity(store)
    r = open_tile_cache(base, split, sid, slices, ps, dtype)
    if r is None:
        if verbose:
            print(f"building tile cache ({split}, {dtype}) at {base} ...")
        build_tile_cache(store, slices, base, split, ps, dtype,
                         store_id=sid, chunk_tiles=chunk_tiles)
        r = open_tile_cache(base, split, sid, slices, ps, dtype)
    return r


def open_tile_cache(
    base: str,
    split: str,
    store_id: str,
    slices: Sequence,
    ps: PatchSpec = PatchSpec(),
    dtype: str = "f32",
) -> Optional[TileCacheReader]:
    """The split's reader IF a complete cache with the matching
    fingerprint exists; None otherwise (caller builds)."""
    bin_path, meta_path = _paths(base, split)
    if not (os.path.exists(bin_path) and os.path.exists(meta_path)):
        return None
    try:
        with open(meta_path) as fh:
            meta = json.load(fh)
    except (OSError, json.JSONDecodeError):
        return None
    if meta.get("fingerprint") != plan_fingerprint(store_id, slices, ps, dtype):
        return None
    return TileCacheReader(bin_path)
