"""Observability: JSONL metrics logger, span timers, profiler traces.

The reference's tracing story is ``time.time()`` around ``.predict`` and
tqdm counters (SURVEY.md section 5).  This module provides the structured
equivalents the framework uses everywhere:

* ``MetricsLogger`` — append-only JSONL event stream (the ``metrics.jsonl``
  files written by train/sweep);
* ``span`` / ``SpanTimer`` — wall-clock spans with device sync, honest on
  tunnelled TPU backends (see specenh.bench.harness._sync);
* ``profile_trace`` — context manager around ``jax.profiler`` for
  TensorBoard-compatible device traces;
* ``nan_guard`` — context manager enabling jax_debug_nans (the framework's
  sanitizer toggle; JAX's functional purity makes data races structurally
  impossible, SURVEY.md section 5).
"""

from __future__ import annotations

import contextlib
import json
import time
from typing import Any, Dict, Iterator, Optional

__all__ = ["MetricsLogger", "SpanTimer", "span", "profile_trace", "nan_guard"]


class MetricsLogger:
    """Append-only JSONL metrics: one event per line, flushed immediately
    (crash-safe, greppable, pandas-loadable)."""

    def __init__(self, path: str):
        self.path = path
        self._fh = open(path, "a")

    def log(self, event: str, **fields: Any) -> None:
        rec: Dict[str, Any] = {"event": event, "time": time.time()}
        rec.update(fields)
        self._fh.write(json.dumps(rec) + "\n")
        self._fh.flush()

    def close(self) -> None:
        self._fh.close()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()


class SpanTimer:
    """Named wall-clock spans; ``report()`` returns {name: total_seconds}."""

    def __init__(self):
        self.totals: Dict[str, float] = {}
        self.counts: Dict[str, int] = {}

    @contextlib.contextmanager
    def __call__(self, name: str) -> Iterator[None]:
        t0 = time.perf_counter()
        try:
            yield
        finally:
            dt = time.perf_counter() - t0
            self.totals[name] = self.totals.get(name, 0.0) + dt
            self.counts[name] = self.counts.get(name, 0) + 1

    def report(self) -> Dict[str, Dict[str, float]]:
        return {
            n: {"total_s": self.totals[n], "count": self.counts[n],
                "mean_s": self.totals[n] / self.counts[n]}
            for n in self.totals
        }


class _SpanHandle:
    """Set ``.result`` to the spanned computation's output so the sync
    fence has something to wait on."""

    result = None


@contextlib.contextmanager
def span(name: str, logger: Optional[MetricsLogger] = None, sync: bool = False):
    """One-off timed span; logs a ``span`` event if a logger is given.

    ``sync=True`` fences on the spanned OUTPUT: assign it inside the block
    (``with span("x", sync=True) as sp: sp.result = f(...)``) and one
    element of its last leaf is pulled to host before the clock stops —
    the only reliable sync on tunnelled backends, where block_until_ready
    (and a data-independent dummy transfer) can return while the program
    is still running.  With no result assigned, sync falls back to
    jax.block_until_ready of a dummy — honest on regular backends only."""
    sp = _SpanHandle()
    t0 = time.perf_counter()
    yield sp
    if sync:
        import jax
        import numpy as np

        leaves = [
            x for x in jax.tree_util.tree_leaves(sp.result)
            if hasattr(x, "ravel")
        ]
        if leaves:
            np.asarray(leaves[-1].ravel()[:1])  # true data-dependent fence
        else:
            import jax.numpy as jnp

            jax.block_until_ready(jnp.zeros(1))
    dt = time.perf_counter() - t0
    if logger is not None:
        logger.log("span", name=name, seconds=dt)


@contextlib.contextmanager
def profile_trace(log_dir: str):
    """jax.profiler trace (view in TensorBoard / xprof)."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


@contextlib.contextmanager
def nan_guard(enable: bool = True):
    """Temporarily enable jax_debug_nans — every op output is checked and
    the first NaN raises with a traceback to the producing primitive."""
    import jax

    prev = jax.config.jax_debug_nans
    jax.config.update("jax_debug_nans", enable)
    try:
        yield
    finally:
        jax.config.update("jax_debug_nans", prev)
