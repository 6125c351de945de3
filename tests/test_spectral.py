"""Spectral clustering tests: Laplacian properties + recovering planted
clusters (the notebook's k-means-over-eigenvectors pipeline at test scale)."""
import jax
import jax.numpy as jnp
import numpy as np

from depth_estimation_tpu.ops.permutohedral import apply_plan, build_plan
from depth_estimation_tpu.ops.spectral import (
    kmeans,
    laplacian_matvec,
    spectral_embedding,
    spectral_segment,
)


def test_laplacian_annihilates_constants():
    # Unnormalized Laplacian: (D − W_sym)·1 = 0 exactly, with D computed by
    # the same symmetrized adjacency the Laplacian uses.
    from depth_estimation_tpu.ops.spectral import _adjacency

    rng = np.random.RandomState(7)
    ref = jnp.asarray(rng.randn(150, 2))
    plan = jax.jit(build_plan)(ref)
    ones = jnp.ones((150, 1))
    degree = _adjacency(plan, ones)
    out = np.asarray(
        jax.jit(lambda u: laplacian_matvec(plan, degree, u, "none"))(ones)
    )
    np.testing.assert_allclose(out, 0.0, atol=1e-8)


def test_kmeans_separated_clusters(rng):
    a = rng.randn(40, 2) * 0.05 + np.array([0, 0])
    b = rng.randn(40, 2) * 0.05 + np.array([5, 5])
    X = jnp.asarray(np.concatenate([a, b]))
    labels = np.asarray(kmeans(X, 2, niters=10))
    assert len(np.unique(labels[:40])) == 1
    assert len(np.unique(labels[40:])) == 1
    assert labels[0] != labels[40]


def test_spectral_segment_two_region_image():
    # Image with two flat color regions + noise → segmentation should
    # recover the halves (up to label permutation). Local seed: the exact
    # noise draw matters for clustering stability.
    rng = np.random.RandomState(0)
    h, w = 24, 32
    img = np.zeros((h, w, 3))
    img[:, : w // 2] = [0.9, 0.1, 0.1]
    img[:, w // 2 :] = [0.1, 0.1, 0.9]
    img += rng.randn(h, w, 3) * 0.02
    labels = np.asarray(
        spectral_segment(jnp.asarray(img, jnp.float32), num_segments=2, num_eigs=2,
                         sigma_color=0.3, sigma_pos=10.0)
    )
    left_mode = np.bincount(labels[:, : w // 2].ravel()).argmax()
    right_mode = np.bincount(labels[:, w // 2 :].ravel()).argmax()
    assert left_mode != right_mode
    acc = ((labels[:, : w // 2] == left_mode).mean() + (labels[:, w // 2 :] == right_mode).mean()) / 2
    assert acc > 0.9, acc


def test_spectral_embedding_orthonormal(rng):
    ref = jnp.asarray(rng.randn(120, 2).astype(np.float32))
    U = spectral_embedding(ref, 4, niters=50)
    G = np.asarray(U.T @ U)
    np.testing.assert_allclose(G, np.eye(4), atol=1e-3)
