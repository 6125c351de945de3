"""Classical refinement baselines: smoothing must cut noise while
respecting edges; CG refinement must reduce masked error on synthetic data."""
import jax
import jax.numpy as jnp
import numpy as np

from depth_estimation_tpu.ops.classical import (
    cg_refine_bilateral,
    cg_refine_laplacian,
    iterated_guided_smooth,
    joint_bilateral_smooth,
    laplacian_apply,
)


def _two_plane_scene(rng, h=40, w=56, noise=0.6):
    img = np.zeros((h, w, 3))
    img[:, : w // 2] = [0.8, 0.2, 0.2]
    img[:, w // 2 :] = [0.2, 0.2, 0.8]
    img += rng.randn(h, w, 3) * 0.01
    disp = np.zeros((h, w))
    disp[:, : w // 2] = 4.0
    disp[:, w // 2 :] = 9.0
    noisy = disp + rng.randn(h, w) * noise
    return (
        jnp.asarray(img, jnp.float32),
        jnp.asarray(disp, jnp.float32),
        jnp.asarray(noisy, jnp.float32),
    )


def test_laplacian_apply_constant_zero():
    x = jnp.full((10, 12), 3.0)
    np.testing.assert_allclose(np.asarray(laplacian_apply(x)), 0.0, atol=1e-6)


def test_joint_bilateral_denoises_preserving_edge(rng):
    img, clean, noisy = _two_plane_scene(rng)
    out = np.asarray(jax.jit(joint_bilateral_smooth)(noisy, img))
    err_before = float(jnp.abs(noisy - clean).mean())
    err_after = np.abs(out - np.asarray(clean)).mean()
    assert err_after < 0.5 * err_before, (err_before, err_after)
    # edge preserved: the two plane means stay apart
    assert out[:, : 20].mean() < out[:, 36:].mean() - 3.0


def test_iterated_guided_smooth_denoises(rng):
    img, clean, noisy = _two_plane_scene(rng)
    out = np.asarray(jax.jit(iterated_guided_smooth)(noisy, img))
    err_before = float(jnp.abs(noisy - clean).mean())
    assert np.abs(out - np.asarray(clean)).mean() < 0.7 * err_before


def test_cg_laplacian_smooths(rng):
    img, clean, noisy = _two_plane_scene(rng, noise=0.4)
    out = np.asarray(cg_refine_laplacian(noisy, lam=2.0))
    err_before = float(jnp.abs(noisy - clean).mean())
    assert np.abs(out - np.asarray(clean)).mean() < err_before


def test_cg_bilateral_beats_plain_laplacian_at_edges(rng):
    # The plain Laplacian blurs across the depth discontinuity; the
    # bilateral one must not. Compare error in the edge band.
    img, clean, noisy = _two_plane_scene(rng, noise=0.5)
    plain = np.asarray(cg_refine_laplacian(noisy, lam=8.0))
    edge_aware = np.asarray(jax.jit(cg_refine_bilateral)(noisy, img, lam=8.0))
    band = slice(25, 32)  # columns straddling the w//2=28 edge
    err_plain = np.abs(plain[:, band] - np.asarray(clean)[:, band]).mean()
    err_edge = np.abs(edge_aware[:, band] - np.asarray(clean)[:, band]).mean()
    assert err_edge < err_plain, (err_edge, err_plain)
