"""Brute-force dense Gaussian affinity operators — the O(n²) oracle.

Exact counterparts of the reference's dense paths
(`crf/crf_module.py:8-30` `gaussian_weights`/`gaussian_weights_u`/`lazy_W`)
used three ways in this framework:

1. the CPU-runnable baseline config (Tsukuba, 16 labels — BASELINE.json
   config #1) where n is small enough for the exact n×n filter;
2. the property-test oracle every lattice kernel is verified against;
3. small-ROI exact filtering inside tests of the custom VJPs.

The filter semantics used throughout the framework:
    filter(src, ref)_i = Σ_j exp(-‖ref_i − ref_j‖²/2) · src_j
(including j = i, weight 1). The adjacency form subtracts the identity:
`W@U = filter(U) − U`.

Implemented with an MXU-friendly ‖a−b‖² = ‖a‖² + ‖b‖² − 2a·b expansion so
the O(n²·d) work is one matmul, and row-blocked (lax.map) so the n×n
matrix never materializes beyond a (block × n) tile — n ≈ 10⁵ fits easily.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

__all__ = [
    "dense_gaussian_filter",
    "dense_gaussian_adjacency",
    "dense_gaussian_matrix",
    "gaussian_weights_normalized",
]


def dense_gaussian_matrix(ref: jax.Array, variance: float = 1.0) -> jax.Array:
    """Full n×n matrix W_ij = exp(-‖ref_i − ref_j‖²/(2·variance)). Small n only."""
    sq = ((ref[None, :, :] - ref[:, None, :]) ** 2).sum(-1)
    return jnp.exp(-0.5 * sq / variance)


@partial(jax.jit, static_argnames=("block", "variance"))
def dense_gaussian_filter(
    src: jax.Array, ref: jax.Array, block: int = 1024, variance: float = 1.0
) -> jax.Array:
    """filter(src, ref)_i = Σ_j exp(-‖ref_i−ref_j‖²/(2·variance)) src_j.

    Args:
      src: (n, L) values to filter.
      ref: (n, d) feature/position vectors.
      block: row-block size; memory is O(block·n), compute is one
        (block×d)·(d×n) matmul + softmax-free exp per tile (MXU + VPU).
    """
    n, L = src.shape
    ref_sq = (ref**2).sum(-1)
    pad = (-n) % block
    ref_pad = jnp.pad(ref, ((0, pad), (0, 0)))
    refsq_pad = jnp.pad(ref_sq, (0, pad))

    def row_block(args):
        ref_blk, refsq_blk = args  # (block, d), (block,)
        # (block, n) pairwise squared distances via the matmul expansion.
        sq = refsq_blk[:, None] + ref_sq[None, :] - 2.0 * (
            jnp.dot(ref_blk, ref.T, preferred_element_type=ref.dtype)
        )
        w = jnp.exp(-0.5 * jnp.maximum(sq, 0.0) / variance)
        return jnp.dot(w, src, preferred_element_type=src.dtype)

    blocks = jax.lax.map(
        row_block,
        (
            ref_pad.reshape(-1, block, ref.shape[1]),
            refsq_pad.reshape(-1, block),
        ),
    )
    return blocks.reshape(-1, L)[:n]


def dense_gaussian_adjacency(src: jax.Array, ref: jax.Array, **kw) -> jax.Array:
    """(W − I) @ src: the self-excluded message-passing operator
    (reference `LatticeGaussian.forward`, `crf/gaussian_matrix.py:302-303`)."""
    return dense_gaussian_filter(src, ref, **kw) - src


def gaussian_weights_normalized(ref: jax.Array) -> jax.Array:
    """Symmetrically normalized self-excluded affinity
    (`crf/crf_module.py:8-15`): D^{-1/2} (W−I) D^{-1/2} − I with
    W_ij = exp(-‖ref_i−ref_j‖²). Small n only (materializes n×n)."""
    n = ref.shape[0]
    eye = jnp.eye(n, dtype=ref.dtype)
    W = jnp.exp(-((ref[None, :, :] - ref[:, None, :]) ** 2).sum(-1)) - eye
    D = W @ jnp.ones((n,), dtype=ref.dtype)
    dinv = 1.0 / jnp.sqrt(D)
    return dinv[:, None] * W * dinv[None, :] - eye


def affinity_row(ref: jax.Array, i, normalize: bool = True) -> jax.Array:
    """One row of the (optionally degree-normalized) affinity matrix —
    the interactive edge-weight-explorer primitive (`lazy_W`,
    `crf/crf_module.py:22-30`): W[i, :] = exp(-‖ref_i − ref_j‖²), divided
    by sqrt(degree_i) when `normalize`."""
    sq = ((ref - ref[i]) ** 2).sum(-1)
    a = jnp.exp(-sq)
    if normalize:
        a = a / jnp.sqrt(jnp.maximum(a.sum() - 1.0, 1e-12))
    return a
