"""Spectral clustering via the lattice RBF graph Laplacian.

Capability of the reference's `Experiments/Spectral_clustering.ipynb`:
build the normalized RBF affinity Laplacian over [rgb/σc, ij/σp] features,
solve for its smallest eigenpairs with a matrix-free iterative eigensolver
(the notebook wraps `RbfLaplacianC(ref,'right')` in a scipy LinearOperator
+ `eigsh(sigma=0)`), and k-means the spectral embedding into segments.

TPU-native version: the matvec is the permutohedral filter through a
prebuilt plan (`ops.permutohedral`), the eigensolver is LOBPCG (jax's
`lobpcg_standard`, applied to 2I − L so the smallest-λ eigenvectors of the
PSD Laplacian become the largest), and k-means is a fixed-iteration jnp
loop — everything one jit program.

Operators (parity with `crf/gaussian_matrix.py:305-338`):
  sym   : L = I − D^{-1/2} (W−I) D^{-1/2}-style symmetric normalization
  none  : L = D − W (unnormalized)
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from .permutohedral import PermutohedralPlan, apply_plan, build_plan

__all__ = [
    "laplacian_matvec",
    "spectral_embedding",
    "kmeans",
    "spectral_segment",
]


def _adjacency(plan: PermutohedralPlan, U: jax.Array) -> jax.Array:
    """(W_sym − I) @ U via the lattice (self-excluded affinity).

    The lattice blur applies its d+1 axis passes in a fixed order, so the
    raw filter is only symmetric up to that ordering; LOBPCG needs an
    exactly self-adjoint operator, so we average the forward and
    reverse-ordered (transposed) filters.
    """
    fwd = apply_plan(plan, U)
    rev = apply_plan(plan, U, reverse=True)
    return 0.5 * (fwd + rev) - U


def laplacian_matvec(plan: PermutohedralPlan, degree: jax.Array, U: jax.Array,
                     normalize: str = "sym") -> jax.Array:
    """Apply the graph Laplacian. `degree` = (W−I)@1 (precomputed).

    sym:  U − D^{-1/2} (W−I) (D^{-1/2} U)
    none: D·U − (W−I) U
    """
    if normalize == "sym":
        dinv = jax.lax.rsqrt(jnp.maximum(degree, 1e-12))
        return U - dinv * _adjacency(plan, dinv * U)
    if normalize == "none":
        return degree * U - _adjacency(plan, U)
    raise ValueError(normalize)


def spectral_embedding(ref: jax.Array, k: int, niters: int = 100,
                       guard: int = 2) -> jax.Array:
    """Smallest-k eigenvectors of the normalized lattice Laplacian.

    Args:
      ref: (n, d) features (pre-scaled by 1/σ).
      k: number of eigenvectors (includes the trivial ~constant one).
      guard: extra eigenpairs solved and discarded — LOBPCG's trailing
        block eigenpair converges an order of magnitude slower than the
        interior ones (round-5 Rayleigh-residual gate:
        tests/test_spectral.py), so the returned k stay sharp.

    Returns (n, k) eigenvector matrix.
    """
    from jax.experimental.sparse.linalg import lobpcg_standard

    n = ref.shape[0]
    plan = build_plan(ref)
    ones = jnp.ones((n, 1), ref.dtype)
    degree = jnp.maximum(_adjacency(plan, ones), 1e-3)

    def A(U):  # 2I − L : largest eigenpairs ↔ smallest of L (λ(L) ∈ [0, 2])
        return 2.0 * U - laplacian_matvec(plan, degree, U, "sym")

    key = jax.random.PRNGKey(0)
    kk = min(k + guard, max(n // 2 - 1, k))
    X0 = jax.random.normal(key, (n, kk), ref.dtype)
    theta, U, _ = lobpcg_standard(A, X0, m=niters)
    # lobpcg returns largest-θ first ⇒ smallest-λ of L first: keep k
    return U[:, :k]


def kmeans(X: jax.Array, k: int, niters: int = 20, seed: int = 0) -> jax.Array:
    """Fixed-iteration Lloyd's k-means; returns (n,) int32 labels."""
    n, f = X.shape
    key = jax.random.PRNGKey(seed)
    init_idx = jax.random.choice(key, n, (k,), replace=False)
    centers = X[init_idx]

    def step(centers, _):
        d2 = ((X[:, None, :] - centers[None, :, :]) ** 2).sum(-1)  # (n, k)
        labels = jnp.argmin(d2, axis=-1)
        onehot = jax.nn.one_hot(labels, k, dtype=X.dtype)  # (n, k)
        counts = onehot.sum(0)[:, None]
        new_centers = (onehot.T @ X) / jnp.maximum(counts, 1.0)
        centers = jnp.where(counts > 0, new_centers, centers)
        return centers, None

    centers, _ = jax.lax.scan(step, centers, None, length=niters)
    d2 = ((X[:, None, :] - centers[None, :, :]) ** 2).sum(-1)
    return jnp.argmin(d2, axis=-1).astype(jnp.int32)


@partial(jax.jit, static_argnames=("num_segments", "num_eigs"))
def spectral_segment(
    img: jax.Array,
    num_segments: int = 6,
    num_eigs: int = 8,
    sigma_color: float = 0.15,
    sigma_pos: float = 0.08,
) -> jax.Array:
    """Image → (h, w) int32 segment labels (the notebook's full pipeline:
    eigenvectors of the bilateral Laplacian → k-means over the embedding)."""
    from ..crf.guides import stack_guide

    h, w = img.shape[:2]
    ref = stack_guide(img, sigma_color, sigma_pos).reshape(h * w, -1)
    U = spectral_embedding(ref, num_eigs)
    # drop the trivial leading direction, normalize rows (standard NJW)
    emb = U[:, 1:]
    emb = emb / (jnp.linalg.norm(emb, axis=-1, keepdims=True) + 1e-9)
    labels = kmeans(emb, num_segments)
    return labels.reshape(h, w)
