"""Task-model tests: refiner, uncertainty head, upsampler, feature CNN."""
import jax
import jax.numpy as jnp
import numpy as np

from depth_estimation_tpu.models.features import FeatureCNN, random_features
from depth_estimation_tpu.models.refiner import (
    crf_rnn_apply,
    crf_rnn_init,
    refiner_apply,
    refiner_init,
    uncertainty_apply,
    uncertainty_init,
    upsampler_apply,
    upsampler_init,
)


def test_feature_cnn_shapes_and_grads():
    model = FeatureCNN(out_dim=16, widths=(8, 16))
    img = jnp.asarray(np.random.RandomState(0).rand(32, 40, 3), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), img)
    feats = model.apply(params, img)
    assert feats.shape == (32, 40, 16)
    g = jax.grad(lambda p: model.apply(p, img).sum())(params)
    flat = jax.tree_util.tree_leaves(g)
    assert all(np.isfinite(np.asarray(x)).all() for x in flat)


def test_random_features_deterministic():
    img = jnp.asarray(np.random.RandomState(1).rand(16, 20, 3), jnp.float32)
    a = np.asarray(random_features(img, out_dim=8, seed=3))
    b = np.asarray(random_features(img, out_dim=8, seed=3))
    np.testing.assert_array_equal(a, b)
    assert abs(a.mean()) < 0.1 and abs(a.std() - 1.0) < 0.1  # whitened


def test_refiner_apply_runs_and_differentiates(rng):
    h, w, L, d_in = 24, 32, 6, 16
    key = jax.random.PRNGKey(0)
    params = refiner_init(key, d_in=d_in, d_guide=8)
    logits = jnp.asarray(rng.randn(h, w, L), jnp.float32)
    img = jnp.asarray(rng.rand(h, w, 3), jnp.float32)
    feats = jnp.asarray(rng.randn(h, w, d_in), jnp.float32)
    depth = jax.jit(lambda p: refiner_apply(p, logits, img, feats, niters=1, r=3))(params)
    assert depth.shape == (h, w)
    g = jax.grad(lambda p: refiner_apply(p, logits, img, feats, niters=1, r=3).sum())(params)
    assert all(np.isfinite(np.asarray(x)).all() for x in jax.tree_util.tree_leaves(g))


def test_uncertainty_outputs_confidence(rng):
    h, w, L, d_in = 24, 32, 6, 16
    params = uncertainty_init(jax.random.PRNGKey(0), d_in=d_in, d_guide=8)
    logits = jnp.asarray(rng.randn(h, w, L), jnp.float32)
    img = jnp.asarray(rng.rand(h, w, 3), jnp.float32)
    feats = jnp.asarray(rng.randn(h, w, d_in), jnp.float32)
    depth, conf = jax.jit(
        lambda p: uncertainty_apply(p, logits, img, feats, niters=1, r=3)
    )(params)
    assert depth.shape == (h, w) and conf.shape == (h, w)
    assert float(conf.min()) > 0  # exp(-s) is positive


def test_upsampler_sharpens_bilinear(rng):
    # On a piecewise-constant disparity with aligned image edges, the CRF
    # upsampler should beat plain bilinear upsampling.
    h, w = 32, 48
    disp = np.full((h, w), 2.0, np.float32)  # both planes valid (disp > 0)
    disp[:, w // 2 :] = 8.0
    img = np.zeros((h, w, 3), np.float32)
    img[:, : w // 2] = [0.9, 0.1, 0.1]
    img[:, w // 2 :] = [0.1, 0.1, 0.9]
    low = jnp.asarray(disp[::4, ::4] / 1.0)
    params = upsampler_init()
    out = jax.jit(
        lambda p: upsampler_apply(p, low, jnp.asarray(img), niters=2, r=3)
    )(params)
    bilinear = jax.image.resize(low, (h, w), method="bilinear")
    err_crf = float(jnp.abs(out - disp).mean())
    err_bil = float(jnp.abs(bilinear - disp).mean())
    assert np.isfinite(err_crf)
    # untrained params: must stay in the bilinear ballpark (training is what
    # sharpens it beyond bilinear — see train/experiments.py); the planes
    # themselves must be recovered
    assert err_crf < 2.0 * err_bil + 0.05, (err_crf, err_bil)
    assert abs(float(out[:, :4].mean()) - 2.0) < 0.5
    assert abs(float(out[:, -4:].mean()) - 8.0) < 0.5


def test_crf_rnn_lattice_backend_grads(rng):
    h, w, L = 16, 20, 4
    params = crf_rnn_init(gamma=0.05, backend="lattice")
    guide = jnp.asarray(rng.rand(h, w, 3), jnp.float32)
    logits = jnp.asarray(rng.randn(h, w, L), jnp.float32)

    def loss(p):
        out = crf_rnn_apply(p, guide, logits, niters=2, backend="lattice")
        return (out**2).mean()

    g = jax.jit(jax.grad(loss))(params)
    leaves = jax.tree_util.tree_leaves(g)
    assert all(np.isfinite(np.asarray(x)).all() for x in leaves)
    # the trainable guide scales receive gradient through the lattice VJP
    assert float(jnp.abs(g["w"]["s_ij"])) > 0
