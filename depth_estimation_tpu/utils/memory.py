"""Device-memory accounting — the TPU analog of the reference's GC-walk
tensor census (`mem_report`, `crf/utils.py:117-169`).

`live_array_report()` enumerates every live jax.Array via
`jax.live_arrays()`, grouped by device and dtype, with totals; pairs with
`device_memory_stats()` which surfaces the backend allocator counters when
the platform provides them.
"""
from __future__ import annotations

from collections import defaultdict

import jax
import numpy as np

__all__ = ["live_array_report", "device_memory_stats", "format_bytes"]


def format_bytes(b: float) -> str:
    for unit in ("B", "KiB", "MiB", "GiB"):
        if abs(b) < 1024:
            return f"{b:.2f} {unit}"
        b /= 1024
    return f"{b:.2f} TiB"


def live_array_report(print_fn=print, top: int = 20) -> dict:
    """Summarize live device arrays. Returns {device: {'bytes', 'count'}}
    and prints the `top` largest arrays (shape, dtype, nbytes)."""
    arrays = jax.live_arrays()
    per_device = defaultdict(lambda: {"bytes": 0, "count": 0})
    entries = []
    for a in arrays:
        try:
            nbytes = a.size * a.dtype.itemsize
            dev = str(next(iter(a.devices())))
        except Exception:
            continue
        per_device[dev]["bytes"] += nbytes
        per_device[dev]["count"] += 1
        entries.append((nbytes, a.shape, str(a.dtype), dev))
    entries.sort(reverse=True)
    if print_fn:
        print_fn(f"{len(arrays)} live arrays")
        for nbytes, shape, dtype, dev in entries[:top]:
            print_fn(f"  {format_bytes(nbytes):>12}  {dtype:<10} {shape} @ {dev}")
        for dev, s in per_device.items():
            print_fn(f"TOTAL {dev}: {format_bytes(s['bytes'])} in {s['count']} arrays")
    return dict(per_device)


def device_memory_stats() -> dict:
    """Backend allocator stats per device (empty dict where unsupported)."""
    out = {}
    for d in jax.devices():
        try:
            stats = d.memory_stats()
        except Exception:
            stats = None
        if stats:
            out[str(d)] = stats
    return out
