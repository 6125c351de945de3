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
) -> jax.Array:
    """Run mean-field iterations; return final logits (−E).

    Q ← softmax(−E0); repeat: E = E0 + message_fn(compat_fn(Q)); Q = softmax(−E).

    `message_fn` is the pairwise W (pixel mixing); `compat_fn` applies the
    label compatibility Mu. They commute (different axes), matching both
    reference orderings (W@Q@Mu and W(Mu(Q))).
    """
    Q0 = jax.nn.softmax(-E0, axis=-1)

    def step(Q, _):
        E = E0 + message_fn(compat_fn(Q))
        return jax.nn.softmax(-E, axis=-1), -E

    if niters == 0:
        return -E0
    _, logits = jax.lax.scan(step, Q0, None, length=niters)
    return logits[-1]


def mean_field_infer(
    E0: jax.Array,
    message_fn: Callable[[jax.Array], jax.Array],
    Mu: jax.Array | Callable[[jax.Array], jax.Array],
    niters: int = 10,
) -> jax.Array:
    """Reference-compatible API (`crf/crf_module.py:41-53`): returns label
    probabilities Q after `niters` iterations.

    `Mu` may be an L×L matrix or a callable Q ↦ Q·Mu.
    """
    if callable(Mu):
        compat_fn = Mu
    else:
        compat_fn = lambda Q: jnp.matmul(Q, Mu, preferred_element_type=Q.dtype)
    logits = mean_field_logits(E0, message_fn, compat_fn, niters)
    return jax.nn.softmax(logits, axis=-1)


def crf_as_rnn(
    logits: jax.Array,
    message_fn: Callable[[jax.Array], jax.Array],
    compat_fn: Callable[[jax.Array], jax.Array],
    niters: int = 5,
    confidence: jax.Array | None = None,
) -> jax.Array:
    """Trainable CRF layer (`CRFasRNN.forward`, `crf/crf_module.py:93-104`).

    Args:
      logits: (..., L) unary logits (E0 = −logits·confidence).
      confidence: optional broadcastable per-pixel confidence in [0, 1]
        (e.g. exp(−s) from an uncertainty head, or a validity mask).

    Returns refined logits (..., L).
    """
    E0 = -logits if confidence is None else -logits * confidence
    return mean_field_logits(E0, message_fn, compat_fn, niters)
