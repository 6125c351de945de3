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

__all__ = ["chain_timer", "loop_timer", "scalarize", "jitter"]


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
    if tn - t1 <= 0:
        # differencing failed (timing noise ≥ the measured work): surface
        # it as NaN — a clamped near-zero here turned into absurd
        # frames/s at call sites like StereoServer.throughput (round-4)
        return float("nan")
    return (tn - t1) / (reps - 1)


def scalarize(tree) -> "jax.Array":  # noqa: F821
    """Fold EVERY numeric leaf of a pytree into one f32 scalar.

    Use as the loop-carried value so no output of the timed computation
    is dead — XLA dead-code-eliminates anything the final fetch doesn't
    depend on, which would silently drop whole stages from a per-stage
    timing program (e.g. the neighbor join, if only the splat tables
    were consumed)."""
    import jax
    import jax.numpy as jnp

    acc = jnp.float32(0.0)
    for leaf in jax.tree_util.tree_leaves(tree):
        x = jnp.asarray(leaf)
        if jnp.issubdtype(x.dtype, jnp.bool_):
            x = x.astype(jnp.int32)
        acc = acc + jnp.sum(x, dtype=jnp.float32)
    return acc


def jitter(x, acc):
    """Perturb a float array by 1e-38·acc — numerically a no-op at f32
    (denormal vanishes in the add) but a REAL data dependency, so a
    fori_loop body that feeds `jitter(input, acc)` into the timed work
    cannot be hoisted out of the loop as loop-invariant."""
    import jax.numpy as jnp

    return x + (acc * 1e-38).astype(x.dtype)


def loop_timer(body: Callable, reps: int = 10, min_reps: int = 2) -> float:
    """Per-rep seconds of `body` (acc f32 scalar → acc f32 scalar), run
    as an IN-JIT `fori_loop` chain with a traced trip count.

    Unlike `chain_timer` (one dispatch per rep), the whole chain is a
    single dispatch, so the differenced result
        (t(reps) − t(1)) / (reps − 1)
    contains ZERO per-dispatch/relay overhead — pure device execution:
    the number kernel optimization should target. The body must thread
    `acc` through the work (`jitter` + `scalarize`) or XLA hoists the
    loop-invariant computation and every trip count times ONE iteration.
    """
    import jax
    import jax.numpy as jnp

    reps = max(int(reps), min_reps)
    fn = jax.jit(
        lambda n, a: jax.lax.fori_loop(0, n, lambda i, aa: body(aa), a)
    )

    def run(n: int) -> float:
        t0 = time.perf_counter()
        float(fn(jnp.int32(n), jnp.float32(0.0)))
        return time.perf_counter() - t0

    run(1)  # compile + warm up (one program: trip count is traced)
    t1 = run(1)
    tn = run(reps)
    if tn - t1 <= 0:
        return float("nan")  # see chain_timer: don't fake a tiny time
    return (tn - t1) / (reps - 1)
