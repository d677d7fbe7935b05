"""Profiling / tracing hooks (absent in the reference — SURVEY.md §5 requires
them in the build): ``jax.profiler`` trace capture around any stage, plus
simple step-time aggregation used by the train loops' Throughput counters."""

from __future__ import annotations

import contextlib
import os
import time


@contextlib.contextmanager
def trace(log_dir: str | None = None, enabled: bool | None = None):
    """Capture a jax profiler trace (viewable in TensorBoard / Perfetto) for
    the enclosed block. Enabled via TPUST_TRACE=1 or the ``enabled`` arg."""
    if enabled is None:
        enabled = os.environ.get("TPUST_TRACE", "0") == "1"
    if not enabled:
        yield
        return
    import jax

    log_dir = log_dir or os.environ.get("TPUST_TRACE_DIR", "log/trace")
    os.makedirs(log_dir, exist_ok=True)
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """Per-step wall-time histogram with p50/p95 summaries."""

    def __init__(self):
        self.times: list[float] = []
        self._t0: float | None = None

    def __enter__(self):
        self._t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        self.times.append(time.perf_counter() - self._t0)

    def summary(self) -> dict:
        if not self.times:
            return {}
        ts = sorted(self.times)
        n = len(ts)
        return {
            "steps": n,
            "p50_ms": ts[n // 2] * 1e3,
            "p95_ms": ts[min(int(n * 0.95), n - 1)] * 1e3,
            "mean_ms": sum(ts) / n * 1e3,
        }
