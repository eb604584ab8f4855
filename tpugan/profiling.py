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


def trace_roofline(fn, args, iters: int = 3, logdir: Optional[str] = None):
    """MEASURED roofline numbers for one jitted callable: run ``fn(*args)``
    ``iters`` times under a ``jax.profiler`` trace and parse the xprof
    ``op_profile`` for the dominant device program.

    Returns a dict with per-call measured HBM bytes / seconds / bandwidth
    and the hardware-counter MXU utilization — the *measured* counterpart
    of ``compiled.cost_analysis()``'s pre-fusion "bytes accessed" upper
    bound (which can exceed physical traffic because fused reuse is
    counted per consumer; BASELINE.md's hbm_frac caveat). Verified on a
    bf16 4096^2 matmul: bytes[0]/time/819GB/s reproduces the tool's own
    bandwidthUtils[0] to 3 digits.

    ``fn`` must NOT donate its inputs (it is re-called with the same
    arguments). Requires the ``xprof`` wheel; raises RuntimeError with a
    clear message when the trace contains no device program.
    """
    import glob
    import json as _json
    import tempfile

    import jax

    logdir = logdir or tempfile.mkdtemp(prefix="tpugan_roofline_")
    out = fn(*args)
    jax.block_until_ready(out)  # compile/warm OUTSIDE the trace window
    with jax.profiler.trace(logdir):
        for _ in range(iters):
            out = fn(*args)
        jax.block_until_ready(out)
    paths = sorted(glob.glob(logdir + "/**/*.xplane.pb", recursive=True))
    if not paths:
        raise RuntimeError(f"no xplane.pb under {logdir}")
    from xprof.convert import raw_to_tool_data as _r

    data, _ = _r.xspace_to_tool_data(paths, "op_profile", {})
    prof = _json.loads(data if isinstance(data, str) else data.decode())
    programs = prof.get("byProgram", {}).get("children") or []
    if not programs:
        raise RuntimeError("op_profile contains no device programs")
    best = max(programs, key=lambda c: c["metrics"].get("rawTime", 0))
    m = best["metrics"]
    secs = m["normalizedTimePs"] / 1e12
    hbm_bytes = float(m["rawBytesAccessedArray"][0])
    return {
        "program": best["name"],
        "iters": iters,
        "hbm_bytes_per_call": hbm_bytes / iters,
        "seconds_per_call": secs / iters,
        "measured_hbm_gbps": hbm_bytes / secs / 1e9 if secs else 0.0,
        "mxu_utilization": m.get("flops", 0.0),
        "flops_per_call": float(m.get("rawFlops", 0.0)) / iters,
        "logdir": logdir,
        "_program_node": best,
    }


def op_table(roofline_result, top: int = 25):
    """Flatten ``trace_roofline``'s dominant program into a per-op table.

    The xprof ``op_profile`` tree nests program -> category -> op; each
    row returned here is ``(name, category, time_frac, hbm_bytes_frac,
    mxu_util)`` sorted by time share — the view that locates the
    movement-dominated fusion tails (copy/pad/broadcast) VERDICT r4 asks
    to attack at SG2-1024 b8."""
    prog = roofline_result["_program_node"]
    total_ps = prog["metrics"].get("normalizedTimePs", 0) or 1
    total_bytes = float(prog["metrics"]["rawBytesAccessedArray"][0]) or 1.0
    rows = []
    for cat in prog.get("children") or []:
        cat_name = cat.get("name", "?")
        for op in cat.get("children") or [cat]:
            m = op.get("metrics", {})
            if not m.get("normalizedTimePs"):
                continue
            raw = m.get("rawBytesAccessedArray") or [0.0]
            rows.append((
                op.get("name", "?"),
                cat_name,
                m["normalizedTimePs"] / total_ps,
                float(raw[0]) / total_bytes,
                m.get("flops", 0.0),
            ))
    rows.sort(key=lambda r: -r[2])
    return rows[:top]
