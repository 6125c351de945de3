"""Cost-volume tests: parity with a naive numpy re-implementation of the
reference sweep (`crf/depth.py:36-53`) and a synthetic-shift sanity check."""
import jax.numpy as jnp
import numpy as np

from depth_estimation_tpu.ops.costvolume import (
    absolute_difference,
    cost_volume,
    disparity_estimate,
    expected_disparity,
)


def naive_badness(img1, img2, ws, num_disp):
    """Direct numpy transcription of the reference algorithm semantics."""
    import scipy.ndimage

    h, w, c = img1.shape
    padded = np.pad(img2, ((0, 0), (num_disp, 0), (0, 0)))
    out = np.zeros((h, w, num_disp))
    for i in range(num_disp):
        shifted = padded[:, num_disp - i : w + num_disp - i]
        out[:, :, i] = np.abs(img1 - shifted).sum(2)
    box = np.ones((ws, ws, 1))
    return scipy.ndimage.convolve(out, box)


def test_cost_volume_matches_reference_semantics(rng):
    img1 = rng.rand(20, 30, 3)
    img2 = rng.rand(20, 30, 3)
    ws, D = 5, 7
    got = np.asarray(cost_volume(jnp.asarray(img1), jnp.asarray(img2), D, ws))
    want = naive_badness(img1, img2, ws, D)
    np.testing.assert_allclose(got, want, rtol=1e-8, atol=1e-10)


def test_recovers_known_disparity(rng):
    # Right image is the left shifted by a constant disparity → WTA
    # disparity should equal it away from borders.
    h, w, d_true = 24, 64, 5
    left = rng.rand(h, w, 3)
    right = np.zeros_like(left)
    right[:, : w - d_true] = left[:, d_true:]
    vol = cost_volume(jnp.asarray(left), jnp.asarray(right), 10, 3)
    disp = np.asarray(disparity_estimate(vol))
    interior = disp[4:-4, 12:-12]
    assert (interior == d_true).mean() > 0.95


def test_expected_disparity_decode():
    logits = jnp.asarray([[10.0, 0.0, 0.0], [0.0, 0.0, 10.0]])
    out = np.asarray(expected_disparity(logits))
    np.testing.assert_allclose(out, [0.0, 2.0], atol=1e-3)


def test_ncc_template_disparity_finds_patch(rng):
    from depth_estimation_tpu.ops.costvolume import ncc_template_disparity

    img = jnp.asarray(rng.rand(32, 64, 3))
    template = img[10:18, 5:13]
    j = int(ncc_template_disparity(img, template))
    assert 0 <= j <= 32


def test_count_vertices_and_capacity(rng):
    from depth_estimation_tpu.ops.permutohedral import count_vertices, suggest_capacity

    ref = jnp.asarray(rng.randn(200, 2))
    occ = int(count_vertices(ref))
    assert 1 <= occ <= 600
    cap = suggest_capacity(ref, headroom=2.0)
    assert cap >= 2 * occ * 0.99 and (cap & (cap - 1)) == 0  # pow2
