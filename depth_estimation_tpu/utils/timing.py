"""Fetch-anchored device timing for unreliable async dispatch paths.

On this container's axon TPU relay, `jax.block_until_ready` returns
~70 µs after dispatch WITHOUT waiting for device completion (measured
round 4 — a 5-iteration flagship pipeline "completed" in 0.05 ms), so any
wall-clock loop anchored on it measures Python dispatch, not the TPU. The
only reliable synchronization point is a device→host FETCH of a value
that data-depends on the work.

`chain_timer` therefore times a CHAIN of dispatches — each step folds its
result into a device scalar accumulator, so step k+1 data-depends on step
k and the final 4-byte fetch forces the whole chain — and differences a
long chain against a short one:

    per_rep = (t(reps) − t(1)) / (reps − 1)

which cancels the fetch round trip and the one-time host→device transfer
of the accumulator seed, leaving per-dispatch overhead + device execution
time: the honest per-call serving cost. The chain runs on the host (one
dispatch per rep) rather than inside one jit: an in-jit fori_loop over
identical iterations invites XLA loop-invariant hoisting, which would
time ONE iteration no matter the count.

Works identically (and cheaply) on the CPU backend, so every bench CLI
uses it regardless of --device.
"""
from __future__ import annotations

import time
from typing import Callable

__all__ = ["chain_timer"]


def chain_timer(
    step: Callable,
    reps: int = 10,
    min_reps: int = 2,
) -> float:
    """Per-rep seconds of `step`, a function acc_scalar -> acc_scalar
    where the returned device scalar data-depends on the timed work.

    The first call compiles + executes once (untimed). Then times a
    1-chain and an N-chain, both ending in a host fetch, and returns
    (t_N − t_1)/(N − 1).
    """
    import jax.numpy as jnp

    reps = max(int(reps), min_reps)
    float(step(jnp.float32(0.0)))  # compile + warm up (untimed)

    def run(n: int) -> float:
        t0 = time.perf_counter()
        acc = jnp.float32(0.0)
        for _ in range(n):
            acc = step(acc)
        float(acc)  # the only true synchronization point
        return time.perf_counter() - t0

    t1 = run(1)
    tn = run(reps)
    return max(tn - t1, 1e-9) / (reps - 1)
