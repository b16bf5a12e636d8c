"""Tracing / profiling utilities (SURVEY.md §5.1 TPU equivalents).

The reference instruments its cached layer with wall-clock dicts
(cached_transformer.py:17-25, 332-351) and times whole sampling runs in the
benchmark CLIs.  The TPU-native equivalents:

* :func:`trace` — context manager around `jax.profiler` producing a
  TensorBoard-loadable trace of the region;
* :class:`WallClock` — named wall-clock sections with `block_until_ready`
  semantics (the honest way to time dispatched work);
* on-device counters live in the sampler's CacheState (recompute/hit/step
  statistics carried through the scan — see fdtpu.cache.e2crf).
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict
from typing import Any, Iterator, Optional

import jax


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/fdtpu_trace") -> Iterator[None]:
    """Capture a jax.profiler trace of the enclosed region."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class WallClock:
    """Accumulating named timers; blocks on the given value before stopping
    the clock so device work is fully attributed."""

    def __init__(self) -> None:
        self.totals: dict[str, float] = defaultdict(float)
        self.counts: dict[str, int] = defaultdict(int)

    @contextlib.contextmanager
    def section(self, name: str, result: Optional[Any] = None) -> Iterator[None]:
        t0 = time.time()
        try:
            yield
        finally:
            if result is not None:
                jax.block_until_ready(result)
            self.totals[name] += time.time() - t0
            self.counts[name] += 1

    def time_fn(self, name: str, fn, *args, **kwargs):
        t0 = time.time()
        out = fn(*args, **kwargs)
        jax.block_until_ready(out)
        self.totals[name] += time.time() - t0
        self.counts[name] += 1
        return out

    def summary(self) -> dict[str, dict[str, float]]:
        return {
            name: {
                "total_s": self.totals[name],
                "count": self.counts[name],
                "mean_ms": 1e3 * self.totals[name] / max(1, self.counts[name]),
            }
            for name in self.totals
        }

    def reset(self) -> None:
        self.totals.clear()
        self.counts.clear()
