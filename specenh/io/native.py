"""ctypes bindings for the native shot runtime (native/specenh_native.cc).

Auto-builds ``libspecenh_native.so`` with the repo Makefile on first use
(g++ is part of the baked toolchain); every entry point has a pure-Python
fallback so the package works without a compiler.

    reader = NativePrefetcher(paths, n_channels=20, n_samples=1_000_000)
    for shot_idx, traces in reader:          # traces: (C, S) float32
        ...                                   # overlaps disk IO with compute
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Iterator, Optional, Sequence, Tuple

import numpy as np

__all__ = ["load_native", "native_available", "read_shot", "NativePrefetcher"]

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))), "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libspecenh_native.so")
_lib: Optional[ctypes.CDLL] = None
_build_failed = False


def load_native(build: bool = True) -> Optional[ctypes.CDLL]:
    """Load (building if necessary) the native library; None if unavailable."""
    global _lib, _build_failed
    if _lib is not None:
        return _lib
    if build and not _build_failed:
        # run make even when the .so exists: it is a cheap no-op when up to
        # date and rebuilds a stale library after source/ABI changes
        try:
            subprocess.run(
                ["make", "-s"], cwd=_NATIVE_DIR, check=True,
                capture_output=True, timeout=120,
            )
        except Exception:
            _build_failed = True
            if not os.path.exists(_LIB_PATH):
                return None
    if not os.path.exists(_LIB_PATH):
        return None
    lib = ctypes.CDLL(_LIB_PATH)
    # refuse a stale library built against a different C ABI — calling the
    # old 2-arg prefetcher_next through 3-arg argtypes would silently
    # misreport corrupt shots as successes
    try:
        lib.specenh_abi_version.restype = ctypes.c_int64
        abi = int(lib.specenh_abi_version())
    except AttributeError:
        abi = -1
    if abi != 2:
        _build_failed = True
        return None
    lib.specenh_read_shot.restype = ctypes.c_int
    lib.specenh_read_shot.argtypes = [
        ctypes.c_char_p, ctypes.c_uint32, ctypes.c_uint64,
        ctypes.POINTER(ctypes.c_float),
    ]
    lib.specenh_shot_info.restype = ctypes.c_int
    lib.specenh_shot_info.argtypes = [
        ctypes.c_char_p, ctypes.POINTER(ctypes.c_uint32),
        ctypes.POINTER(ctypes.c_uint64),
    ]
    lib.specenh_prefetcher_create.restype = ctypes.c_void_p
    lib.specenh_prefetcher_create.argtypes = [
        ctypes.POINTER(ctypes.c_char_p), ctypes.c_int, ctypes.c_uint32,
        ctypes.c_uint64, ctypes.c_int, ctypes.c_int,
    ]
    lib.specenh_prefetcher_next.restype = ctypes.c_int64
    lib.specenh_prefetcher_next.argtypes = [
        ctypes.c_void_p, ctypes.POINTER(ctypes.c_float),
        ctypes.POINTER(ctypes.c_int64),
    ]
    lib.specenh_prefetcher_destroy.restype = None
    lib.specenh_prefetcher_destroy.argtypes = [ctypes.c_void_p]
    _lib = lib
    return lib


def native_available() -> bool:
    return load_native() is not None


def read_shot(path: str, n_channels: int, n_samples: int) -> np.ndarray:
    """(n_channels, n_samples) float32 from a SPEC binary, native if possible."""
    lib = load_native()
    if lib is None:
        from specenh.io.binfmt import read_shot_bin

        data = read_shot_bin(path)
        out = np.zeros((n_channels, n_samples), np.float32)
        cc = min(n_channels, data.shape[0])
        cs = min(n_samples, data.shape[1])
        out[:cc, :cs] = data[:cc, :cs]
        return out
    out = np.empty((n_channels, n_samples), np.float32)
    rc = lib.specenh_read_shot(
        path.encode(), n_channels, n_samples,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
    )
    if rc != 0:
        raise IOError(f"native read failed for {path} (rc={rc})")
    return out


class NativePrefetcher:
    """Threaded shot prefetcher over SPEC binaries.

    Iterates (shot_index, traces) in COMPLETION order — key on the yielded
    index, not arrival position.  Corrupt files yield (shot_index, None)
    so callers can quarantine the FILE.  Falls back to a
    synchronous Python loop when the native library is unavailable.
    """

    def __init__(
        self,
        paths: Sequence[str],
        n_channels: int,
        n_samples: int,
        n_threads: int = 4,
        queue_depth: int = 4,
    ):
        self.paths = [os.fspath(p) for p in paths]
        self.n_channels = n_channels
        self.n_samples = n_samples
        self._lib = load_native()
        self._handle = None
        if self._lib is not None:
            arr = (ctypes.c_char_p * len(self.paths))(
                *[p.encode() for p in self.paths]
            )
            self._paths_keepalive = arr
            self._handle = self._lib.specenh_prefetcher_create(
                arr, len(self.paths), n_channels, n_samples, n_threads, queue_depth
            )

    def __iter__(self) -> Iterator[Tuple[int, Optional[np.ndarray]]]:
        if self._handle is None:  # pure-Python fallback
            for i, p in enumerate(self.paths):
                try:
                    yield i, read_shot(p, self.n_channels, self.n_samples)
                except Exception:
                    yield i, None
            return
        n = len(self.paths)
        for _ in range(n):
            out = np.empty((self.n_channels, self.n_samples), np.float32)
            status = ctypes.c_int64(0)
            idx = self._lib.specenh_prefetcher_next(
                self._handle,
                out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
                ctypes.byref(status),
            )
            if idx == -1:
                return
            if status.value != 0:
                yield int(idx), None
            else:
                yield int(idx), out

    def close(self):
        if self._handle is not None and self._lib is not None:
            self._lib.specenh_prefetcher_destroy(self._handle)
            self._handle = None

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass
