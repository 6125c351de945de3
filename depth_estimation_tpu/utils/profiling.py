"""Profiling: trace capture, stage timers, roofline accounting.

TPU counterpart of the reference's ad-hoc instrumentation (SURVEY.md §5:
printf stage timers inside the native lattices, `%timeit`/`%lprun`
notebook cells, `Timer`/`TrainingStats`):

- `trace(path)`: context manager around `jax.profiler` — produces a
  TensorBoard-loadable trace of device execution.
- `StageTimer`: named wall-clock spans with `block_until_ready` fencing
  (device-async-safe, unlike naive time.time around dispatches).
- `roofline`: bytes/flops → attained fraction of peak estimates for a
  measured runtime (the BASELINE north star is >80% of HBM roofline for
  the mean-field iteration).
"""
from __future__ import annotations

import contextlib
import time
from dataclasses import dataclass, field

import jax

__all__ = ["trace", "StageTimer", "roofline", "V5E_PEAK"]

# v5e single-chip peaks (public figures): ~197 bf16 TFLOP/s, ~819 GB/s HBM.
V5E_PEAK = {"flops_bf16": 197e12, "flops_f32": 49e12, "hbm_gbps": 819e9}


@contextlib.contextmanager
def trace(path: str):
    """Capture a device trace viewable in TensorBoard/XProf."""
    jax.profiler.start_trace(path)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


@dataclass
class StageTimer:
    """Accumulating named spans; `stop` fences device work."""

    spans: dict = field(default_factory=dict)

    @contextlib.contextmanager
    def span(self, name: str, result=None):
        t0 = time.perf_counter()
        yield
        if result is not None:
            jax.block_until_ready(result)
        self.spans[name] = self.spans.get(name, 0.0) + time.perf_counter() - t0

    def time_fn(self, name: str, fn, *args, reps: int = 10):
        out = fn(*args)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        for _ in range(reps):
            out = fn(*args)
        jax.block_until_ready(out)
        self.spans[name] = (time.perf_counter() - t0) / reps
        return out

    def report(self, print_fn=print):
        total = sum(self.spans.values())
        for name, s in sorted(self.spans.items(), key=lambda kv: -kv[1]):
            print_fn(f"{name:<28} {s * 1e3:9.3f} ms  ({100 * s / max(total, 1e-12):5.1f}%)")
        return self.spans


def roofline(seconds: float, bytes_moved: float, flops: float = 0.0,
             peaks: dict = V5E_PEAK) -> dict:
    """Attained bandwidth/compute and fraction-of-peak for a measured span."""
    bw = bytes_moved / max(seconds, 1e-12)
    fl = flops / max(seconds, 1e-12)
    return {
        "gbps": bw / 1e9,
        "hbm_fraction": bw / peaks["hbm_gbps"],
        "tflops": fl / 1e12,
        "flops_fraction_f32": fl / peaks["flops_f32"],
    }
