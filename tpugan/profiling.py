"""Tracing / profiling utilities.

The reference has no tracing beyond wall-clock bookkeeping in the unused
ALAE LODDriver (model/stylegan1/lod_driver.py:57-60; SURVEY.md §5).
TPU-native replacements: jax.profiler trace capture around training
windows and a lightweight step timer with EMA smoothing.
"""

from __future__ import annotations

import contextlib
import time
from typing import Optional


class StepTimer:
    """Per-step wall-clock with EMA (LODDriver-style bookkeeping)."""

    def __init__(self, ema: float = 0.9):
        self.ema = ema
        self.avg: Optional[float] = None
        self._t0: Optional[float] = None
        self.total = 0.0
        self.steps = 0

    def __enter__(self):
        self._t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        dt = time.perf_counter() - self._t0
        self.total += dt
        self.steps += 1
        self.avg = dt if self.avg is None else self.ema * self.avg + (1 - self.ema) * dt
        return False

    @property
    def steps_per_sec(self) -> float:
        return 0.0 if not self.avg else 1.0 / self.avg


def timeit_ms(fn, *args, iters: int = 10, windows: int = 3) -> float:
    """Best-of-``windows`` mean step latency of a jitted callable, in ms.

    One warm-up call (compile), then ``windows`` timed windows of
    ``iters`` calls each with a ``block_until_ready`` fence — the
    measurement methodology shared by bench.py and the scripts/prof_*
    component profilers (best-of-N absorbs shared-TPU noise)."""
    import jax

    out = fn(*args)
    jax.block_until_ready(out)
    best = float("inf")
    for _ in range(windows):
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(*args)
        jax.block_until_ready(out)
        best = min(best, (time.perf_counter() - t0) / iters * 1e3)
    return best


@contextlib.contextmanager
def trace(logdir: str = "/tmp/tpugan_trace"):
    """Capture a jax.profiler trace (view with tensorboard/xprof)."""
    import jax

    jax.profiler.start_trace(logdir)
    try:
        yield logdir
    finally:
        jax.profiler.stop_trace()
