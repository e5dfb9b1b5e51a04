"""Tracing/profiling (SURVEY.md §5.1).

``trace()`` wraps jax.profiler for TensorBoard-viewable device traces;
``StepTimer`` feeds per-step wall times into the metrics JSONL.  The
roofline helper turns kernel byte/flop counts into speed-of-light fractions
(per-chip target, BASELINE north star).
"""

from __future__ import annotations

import contextlib
import time

import jax

# v5e per-chip peak numbers (public): 197 TFLOP/s bf16, ~394 fp8; HBM ~819 GB/s.
V5E_BF16_FLOPS = 197e12
V5E_F32_FLOPS = 49e12
V5E_HBM_BYTES = 819e9


@contextlib.contextmanager
def trace(logdir: str = "/tmp/asr_tpu_profile"):
    """Capture a device trace viewable in TensorBoard's profile plugin."""
    jax.profiler.start_trace(logdir)
    try:
        yield logdir
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """Wall-clock timer with jitter stats for the host step loop."""

    def __init__(self) -> None:
        self.times: list[float] = []
        self._t0: float | None = None

    def start(self) -> None:
        self._t0 = time.perf_counter()

    def stop(self) -> float:
        dt = time.perf_counter() - (self._t0 or time.perf_counter())
        self.times.append(dt)
        return dt

    def summary(self) -> dict:
        if not self.times:
            return {}
        ts = sorted(self.times)
        n = len(ts)
        return {
            "step_ms_p50": ts[n // 2] * 1e3,
            "step_ms_p90": ts[int(n * 0.9)] * 1e3,
            "step_ms_mean": sum(ts) / n * 1e3,
        }


def roofline(flops: float, bytes_accessed: float, seconds: float,
             dtype_peak: float = V5E_BF16_FLOPS) -> dict:
    """Fraction of per-chip speed-of-light achieved by a measured kernel."""
    compute_bound_s = flops / dtype_peak
    memory_bound_s = bytes_accessed / V5E_HBM_BYTES
    light = max(compute_bound_s, memory_bound_s)
    return {
        "achieved_flops": flops / max(seconds, 1e-12),
        "sol_seconds": light,
        "sol_fraction": light / max(seconds, 1e-12),
        "bound": "compute" if compute_bound_s >= memory_bound_s else "memory",
    }
