"""Tracing / profiling / debug — the aux subsystems the reference lacks
(SURVEY.md §5: reference is print-only; we add jax.profiler traces, wall
timers synchronized with block_until_ready, and a NaN-check mode as the
functional analog of a sanitizer).
"""

from __future__ import annotations

import contextlib
import time
from typing import Iterator

import jax


@contextlib.contextmanager
def trace(log_dir: str) -> Iterator[None]:
    """Capture a device profile viewable in TensorBoard's profile plugin."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def value_sync(x) -> None:
    """True device sync: fetch one VALUE from the first array leaf.

    ``block_until_ready`` can return before execution completes on tunneled
    backends (observed on axon/v5e — it once produced a 300x-too-fast
    benchmark); a value fetch is a genuine device round-trip. The leaf is
    sliced on device first so only one element transfers.
    """
    leaf = jax.tree.leaves(x)[0]
    jax.device_get(leaf[(0,) * getattr(leaf, "ndim", 0)])


class Timer:
    """Wall timer that syncs the device before reading the clock, so timed
    regions measure device work, not async dispatch."""

    def __init__(self):
        self._t0: float | None = None
        self.elapsed: float = 0.0

    def __enter__(self) -> "Timer":
        self._t0 = time.perf_counter()
        return self

    def __exit__(self, *exc) -> None:
        self.elapsed = time.perf_counter() - self._t0

    @staticmethod
    def time_fn(fn, *args, iters: int = 10, warmup: int = 2) -> float:
        """Median seconds per call, with true value-fetch syncs."""
        for _ in range(warmup):
            out = fn(*args)
        value_sync(out)
        times = []
        for _ in range(iters):
            t0 = time.perf_counter()
            out = fn(*args)
            value_sync(out)
            times.append(time.perf_counter() - t0)
        times.sort()
        return times[len(times) // 2]


def enable_nan_debug() -> None:
    """Turn on jax_debug_nans — the functional-model analog of the race/
    memory sanitizers the reference never had (SURVEY.md §5)."""
    jax.config.update("jax_debug_nans", True)
