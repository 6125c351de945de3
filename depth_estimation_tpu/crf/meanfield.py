"""Mean-field inference for fully-connected CRFs, scan-compiled.

The fixed-point loop of the reference (`crf/crf_module.py:41-53`
`mean_field_infer` and the image-space `CRFasRNN.forward` at `:93-104`),
expressed as a `lax.scan` over iterations so the whole inference — message
passing (lattice/guided/dense filter), label compatibility (L×L matmul),
softmax — is one fused XLA program. Differentiable end-to-end ("CRF-as-RNN").

The message operator and compatibility are passed as callables, so the same
loop serves every W in the framework:
  - `dense_gaussian_adjacency` (oracle),
  - the permutohedral `lattice_adjacency`,
  - the guided-filter adjacency.

Layout: label axis last — (..., L) with ... = pixels (flat n or h, w).
The filter operators take (..., L) and return (..., L).
"""
from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp

__all__ = ["mean_field_infer", "crf_as_rnn", "mean_field_logits"]


def mean_field_logits(
    E0: jax.Array,
    message_fn: Callable[[jax.Array], jax.Array],
    compat_fn: Callable[[jax.Array], jax.Array],
    niters: int = 5,
    unroll: bool | None = None,
) -> jax.Array:
    """Run mean-field iterations; return final logits (−E).

    Q ← softmax(−E0); repeat: E = E0 + message_fn(compat_fn(Q)); Q = softmax(−E).

    `message_fn` is the pairwise W (pixel mixing); `compat_fn` applies the
    label compatibility Mu. They commute (different axes), matching both
    reference orderings (W@Q@Mu and W(Mu(Q))).

    `unroll` (default: yes for niters ≤ 8): emit the iterations as straight-
    line XLA instead of a `lax.scan`. A scanned iteration pays a measured
    ~0.7 ms/iter scheduling gap on TPU over the identical unrolled update
    (round-4 decomposition: 1.78 ms benched in-scan vs 1.08 ms isolated) —
    the while-loop boundary blocks cross-iteration fusion and buffer reuse.
    Compile time grows with niters, so long refinement loops keep the scan.
    """
    if niters == 0:
        return -E0
    if unroll is None:
        unroll = niters <= 8
    Q = jax.nn.softmax(-E0, axis=-1)
    if unroll:
        logits = -E0
        for _ in range(niters):
            logits = -(E0 + message_fn(compat_fn(Q)))
            Q = jax.nn.softmax(logits, axis=-1)
        return logits

    def step(carry, _):
        Q, _ = carry
        E = E0 + message_fn(compat_fn(Q))
        return (jax.nn.softmax(-E, axis=-1), -E), None

    (_, logits), _ = jax.lax.scan(step, (Q, -E0), None, length=niters)
    return logits


def mean_field_infer(
    E0: jax.Array,
    message_fn: Callable[[jax.Array], jax.Array],
    Mu: jax.Array | Callable[[jax.Array], jax.Array],
    niters: int = 10,
    unroll: bool | None = None,
) -> jax.Array:
    """Reference-compatible API (`crf/crf_module.py:41-53`): returns label
    probabilities Q after `niters` iterations.

    `Mu` may be an L×L matrix or a callable Q ↦ Q·Mu.
    """
    if callable(Mu):
        compat_fn = Mu
    else:
        compat_fn = lambda Q: jnp.matmul(Q, Mu, preferred_element_type=Q.dtype)
    logits = mean_field_logits(E0, message_fn, compat_fn, niters, unroll)
    return jax.nn.softmax(logits, axis=-1)


def crf_as_rnn(
    logits: jax.Array,
    message_fn: Callable[[jax.Array], jax.Array],
    compat_fn: Callable[[jax.Array], jax.Array],
    niters: int = 5,
    confidence: jax.Array | None = None,
    unroll: bool | None = None,
) -> jax.Array:
    """Trainable CRF layer (`CRFasRNN.forward`, `crf/crf_module.py:93-104`).

    Args:
      logits: (..., L) unary logits (E0 = −logits·confidence).
      confidence: optional broadcastable per-pixel confidence in [0, 1]
        (e.g. exp(−s) from an uncertainty head, or a validity mask).

    Returns refined logits (..., L).
    """
    E0 = -logits if confidence is None else -logits * confidence
    return mean_field_logits(E0, message_fn, compat_fn, niters, unroll)
