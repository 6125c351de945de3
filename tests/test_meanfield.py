"""Mean-field CRF tests against a direct numpy loop, plus the dense oracle."""
import jax.numpy as jnp
import numpy as np

from depth_estimation_tpu.crf.compat import (
    charb_apply,
    charb_init,
    charb_matrix,
    charbonnier,
    compatibility_matrix,
    potts_matrix,
)
from depth_estimation_tpu.crf.meanfield import crf_as_rnn, mean_field_infer
from depth_estimation_tpu.ops.dense_gaussian import (
    dense_gaussian_adjacency,
    dense_gaussian_filter,
    dense_gaussian_matrix,
)


def softmax(x, axis=-1):
    e = np.exp(x - x.max(axis=axis, keepdims=True))
    return e / e.sum(axis=axis, keepdims=True)


def test_dense_filter_matches_matrix(rng):
    n, d, L = 200, 3, 4
    ref = rng.randn(n, d)
    src = rng.randn(n, L)
    W = np.asarray(dense_gaussian_matrix(jnp.asarray(ref)))
    want = W @ src
    got = np.asarray(dense_gaussian_filter(jnp.asarray(src), jnp.asarray(ref), block=64))
    np.testing.assert_allclose(got, want, rtol=1e-8, atol=1e-10)


def test_mean_field_matches_numpy_loop(rng):
    n, d, L, niters = 120, 2, 5, 6
    ref = rng.randn(n, d)
    E0 = rng.randn(n, L)
    Mu = rng.rand(L, L)
    Mu = (Mu + Mu.T) / 2

    W = np.exp(-0.5 * ((ref[None] - ref[:, None]) ** 2).sum(-1)) - np.eye(n)
    Q = softmax(-E0)
    for _ in range(niters):
        E = E0 + W @ Q @ Mu
        Q = softmax(-E)

    msg = lambda x: dense_gaussian_adjacency(x, jnp.asarray(ref), block=64)
    got = np.asarray(mean_field_infer(jnp.asarray(E0), msg, jnp.asarray(Mu), niters))
    np.testing.assert_allclose(got, Q, rtol=1e-7, atol=1e-9)


def test_crf_as_rnn_confidence_and_identity(rng):
    n, L = 50, 4
    ref = rng.randn(n, 2)
    logits = rng.randn(n, L)
    msg = lambda x: dense_gaussian_adjacency(x, jnp.asarray(ref), block=64)
    compat = lambda Q: Q @ jnp.asarray(potts_matrix(L))
    # niters=0 → logits scaled by confidence only.
    out0 = np.asarray(crf_as_rnn(jnp.asarray(logits), msg, compat, niters=0))
    np.testing.assert_allclose(out0, logits, rtol=1e-12)
    conf = rng.rand(n, 1)
    outc = np.asarray(
        crf_as_rnn(jnp.asarray(logits), msg, compat, niters=0, confidence=jnp.asarray(conf))
    )
    np.testing.assert_allclose(outc, logits * conf, rtol=1e-12)


def test_charb_compat(rng):
    L = 6
    params = charb_init(gamma=0.1, dtype=jnp.float64)
    labels = jnp.arange(L, dtype=jnp.float64)
    Mu = np.asarray(charb_matrix(params, labels))
    want = np.sqrt(0.1**2 + (labels[:, None] - labels[None, :]) ** 2) - 0.1
    np.testing.assert_allclose(Mu, want, rtol=1e-7, atol=1e-12)
    Q = rng.rand(7, L)
    got = np.asarray(charb_apply(params, jnp.asarray(Q)))
    np.testing.assert_allclose(got, Q @ want, rtol=1e-7, atol=1e-12)


def test_compatibility_matrix_charbonnier():
    labels = jnp.arange(4.0)
    Mu = np.asarray(compatibility_matrix(lambda a, b: charbonnier(a, b, 2.0), labels))
    assert Mu.shape == (4, 4)
    assert np.allclose(np.diag(Mu), 0.0)
    assert Mu[0, 3] > Mu[0, 1] > 0


def test_calibrate_capacity_tiled_sets_and_guards():
    """calibrate_capacity(tiled=True) sizes tile_u from measured per-tile
    occupancy; odd shapes calibrate on the edge-padded guide (round-5:
    the pipeline pads to the block multiple and crops outputs)."""
    import numpy as np

    from depth_estimation_tpu.models.pipeline import (CRFStereoConfig,
                                                      calibrate_capacity,
                                                      crf_stereo_infer)

    rng = np.random.RandomState(0)
    img = rng.rand(64, 96, 3).astype(np.float32)
    cfg = calibrate_capacity(
        img, CRFStereoConfig(num_disp=8), tiled=True, tile_px=32
    )
    assert cfg.tile_px == 32 and cfg.tile_u % 128 == 0
    odd = calibrate_capacity(
        img[:50], CRFStereoConfig(num_disp=8), tiled=True, tile_px=32
    )
    assert odd.tile_px == 32  # 50 % 32 != 0 -> padded tiling, not skipped
    out = crf_stereo_infer(
        jnp.asarray(img[:50]), jnp.asarray(img[:50]), odd
    )
    assert out["disparity"].shape == (50, 96)  # outputs cropped back


def test_crf_stereo_infer_tiled_matches_untiled():
    """End-to-end pipeline equivalence: the tiled MXU splat/slice path
    (block pixel reorder + lean packed plan) reproduces the untiled
    flagship disparity (ADVICE r4: the block-reorder/unreorder path had
    no committed e2e gate)."""
    import numpy as np

    from depth_estimation_tpu.data.synthetic import make_stereo_pair
    from depth_estimation_tpu.models.pipeline import (CRFStereoConfig,
                                                      calibrate_capacity,
                                                      crf_stereo_infer)

    rng = np.random.RandomState(0)
    left, right, _ = make_stereo_pair(rng, 64, 96, num_layers=4, max_disp=7)
    left = jnp.asarray(left, jnp.float32)
    right = jnp.asarray(right, jnp.float32)
    cfg0 = CRFStereoConfig(num_disp=8, niters=3, backend="lattice")
    cfg_flat = calibrate_capacity(left, cfg0, tiled=False)
    cfg_tile = calibrate_capacity(left, cfg0, tiled=True, tile_px=32)
    assert cfg_tile.tile_px == 32
    d_flat = np.asarray(crf_stereo_infer(left, right, cfg_flat)["disparity"])
    d_tile = np.asarray(crf_stereo_infer(left, right, cfg_tile)["disparity"])
    # identical math up to f32/MXU reassociation in splat/slice
    assert np.abs(d_tile - d_flat).max() < 5e-3
    # and the bf16 incidence variant stays within quality-gate noise
    from dataclasses import replace

    cfg_bf16 = replace(cfg_tile, tile_bf16=True)
    d_bf16 = np.asarray(crf_stereo_infer(left, right, cfg_bf16)["disparity"])
    assert np.abs(d_bf16 - d_flat).max() < 0.1
