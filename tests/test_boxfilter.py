"""Box/Gaussian filter unit tests (reference strategy: impulse/closed-form
checks + gradcheck, `Experiments/TestGaussianBlur.ipynb`)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from depth_estimation_tpu.ops.boxfilter import (
    box_filter,
    box_filter2d,
    gaussian_blur,
    gaussian_blur_box,
)


def naive_box(x, r, axis, normalize):
    x = np.asarray(x)
    out = np.zeros_like(x)
    n = x.shape[axis]
    xm = np.moveaxis(x, axis, 0)
    om = np.moveaxis(out, axis, 0)
    for i in range(n):
        lo, hi = max(0, i - r), min(n, i + r + 1)
        s = xm[lo:hi].sum(axis=0)
        om[i] = s / (hi - lo) if normalize else s
    return out


@pytest.mark.parametrize("axis", [0, 1, -1])
@pytest.mark.parametrize("normalize", [True, False])
def test_box_filter_matches_naive(rng, axis, normalize):
    x = rng.randn(13, 17, 3)
    for r in [0, 1, 3, 6]:
        got = np.asarray(box_filter(jnp.asarray(x), r, axis, normalize))
        want = naive_box(x, r, axis, normalize)
        np.testing.assert_allclose(got, want, rtol=1e-10, atol=1e-10)


def test_box_filter2d_window_sum(rng):
    x = rng.randn(10, 12)
    got = np.asarray(box_filter2d(jnp.asarray(x), 2))
    want = naive_box(naive_box(x, 2, 0, False), 2, 1, False)
    np.testing.assert_allclose(got, want, rtol=1e-10)


def test_gaussian_blur_impulse_response():
    # Blur of a delta recovers the (normalized, truncated) Gaussian kernel.
    n, sigma, radius = 41, 2.0, 10
    x = jnp.zeros((n,), jnp.float64).at[n // 2].set(1.0)
    out = np.asarray(gaussian_blur(x, sigma, axis=0, radius=radius))
    offs = np.arange(-radius, radius + 1)
    k = np.exp(-0.5 * (offs / sigma) ** 2)
    k /= k.sum()
    np.testing.assert_allclose(out[n // 2 - radius : n // 2 + radius + 1], k, rtol=1e-12)
    assert abs(out.sum() - 1.0) < 1e-12


def test_gaussian_blur_box_approximates_gaussian():
    n = 101
    x = jnp.zeros((n,), jnp.float64).at[n // 2].set(1.0)
    sigma = 4.0
    approx = np.asarray(gaussian_blur_box(x, sigma, axis=0, niters=3))
    exact = np.asarray(gaussian_blur(x, sigma, axis=0, radius=20))
    # Iterated box is only an approximation; interior mass should agree.
    assert np.abs(approx - exact).max() < 0.02
    assert abs(approx.sum() - 1.0) < 1e-10


def test_gaussian_blur_sigma_gradient():
    # σ-recovery property (`TestGaussianBlur.ipynb` cell 8): grad of a
    # matching loss wrt σ vanishes at the true σ and is signed correctly.
    n, true_sigma, radius = 61, 3.0, 15
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (n,), jnp.float64)
    target = gaussian_blur(x, true_sigma, axis=0, radius=radius)

    def loss(sigma):
        return jnp.sum((gaussian_blur(x, sigma, axis=0, radius=radius) - target) ** 2)

    g = jax.grad(loss)
    assert abs(g(jnp.float64(true_sigma))) < 1e-10
    assert g(jnp.float64(2.0)) < 0  # too sharp → increase σ
    assert g(jnp.float64(4.0)) > 0  # too smooth → decrease σ

    # Finite-difference gradcheck.
    s0 = 2.5
    eps = 1e-6
    fd = (loss(s0 + eps) - loss(s0 - eps)) / (2 * eps)
    np.testing.assert_allclose(g(jnp.float64(s0)), fd, rtol=1e-5)
