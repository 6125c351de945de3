"""Label-compatibility functions μ(l, l') for the dense CRF.

Functional re-design of the reference's compatibility modules
(`crf/crf_module.py:32-79`): Potts and the trainable Charbonnier, as pure
functions of a params pytree. The L×L compatibility matrix Mu is applied to
the label axis with one small matmul (MXU) — equivalent to the reference's
1×1 conv.

Params convention: `charb_init(gamma)` → {'gamma': scalar, 'log_s': scalar}
with the energy scale exp(log_s) exactly like the reference's `self.s`.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = [
    "charbonnier",
    "charbonnier2",
    "compatibility_matrix",
    "potts_matrix",
    "charb_init",
    "charb_matrix",
    "charb_apply",
    "charb_energies_from_scalar",
]


def charbonnier(a, b, gamma=0.1):
    """sqrt(γ² + (a−b)²) − γ  (`crf/crf_module.py:32-33`)."""
    return jnp.sqrt(gamma**2 + (a - b) ** 2) - gamma


def charbonnier2(a, b, gamma=3.0):
    """sqrt(1 + ((a−b)/γ)²) − 1  (`crf/crf_module.py:35-36`)."""
    return jnp.sqrt(1.0 + ((a - b) / gamma) ** 2) - 1.0


def compatibility_matrix(compat, labels: jax.Array) -> jax.Array:
    """Mu[l, l'] = compat(label_l, label_l')  (`crf/crf_module.py:38-39`)."""
    return compat(labels[:, None], labels[None, :])


def potts_matrix(num_labels: int, dtype=jnp.float32) -> jax.Array:
    """Potts compatibility: 1 − I  (`crf/crf_module.py:55-64`)."""
    return jnp.ones((num_labels, num_labels), dtype) - jnp.eye(num_labels, dtype=dtype)


def charb_init(gamma: float = 0.05, dtype=jnp.float32) -> dict:
    """Trainable Charbonnier compatibility params (`crf/crf_module.py:66-70`)."""
    return {
        "gamma": jnp.asarray(gamma, dtype),
        "log_s": jnp.asarray(0.0, dtype),
    }


def charb_matrix(params: dict, labels: jax.Array) -> jax.Array:
    """L×L Charbonnier compatibility matrix scaled by exp(log_s)."""
    mu = charbonnier(labels[:, None], labels[None, :], params["gamma"])
    return mu * jnp.exp(params["log_s"])


def charb_apply(params: dict, Q: jax.Array, labels: jax.Array | None = None) -> jax.Array:
    """Apply the Charbonnier compatibility to the trailing label axis of Q.

    Matches `charb.forward` (`crf/crf_module.py:71-75`): default labels are
    0..L−1.
    """
    L = Q.shape[-1]
    if labels is None:
        labels = jnp.arange(L, dtype=Q.dtype)
    mu = charb_matrix(params, labels)
    return jnp.matmul(Q, mu, preferred_element_type=Q.dtype)


def charb_energies_from_scalar(params: dict, x: jax.Array, labels: jax.Array) -> jax.Array:
    """Unary energies from a scalar map (`crf/crf_module.py:76-79`):
    charbonnier(label, x, γ·max(label)) · exp(log_s), broadcasting labels
    against x's trailing singleton label axis."""
    gamma = params["gamma"] * labels.max()
    return charbonnier(labels, x, gamma) * jnp.exp(params["log_s"])
