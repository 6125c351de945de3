"""End-to-end quality gate on the real Tsukuba pair (BASELINE config #1).

The reference's golden-image eyeball check (`DenseCrf.ipynb` cell 12)
turned into hard numeric gates: the CRF must improve the unary, and
absolute quality must stay within the measured round-1 envelope
(full-res: unary EPE 0.858/bad2 13.4% → CRF EPE 0.756/bad2 5.45%).
Runs at half resolution for CI speed; skipped when fixtures are absent.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from depth_estimation_tpu.models.pipeline import CRFStereoConfig, crf_stereo_infer
from depth_estimation_tpu.train.metrics import bad_pixel_ratio, epe


@pytest.mark.parametrize("backend", ["lattice", "dense"])
def test_crf_improves_unary_on_tsukuba(tsukuba, backend):
    left, right, gt = tsukuba
    # half resolution: GT halves too (gt is 16x disparity at full res)
    left = left[::2, ::2]
    right = right[::2, ::2]
    gt_half = gt[::2, ::2] / 16.0 / 2.0

    cfg = CRFStereoConfig(num_disp=8, niters=5, backend=backend)
    out = crf_stereo_infer(
        jnp.asarray(left, jnp.float32), jnp.asarray(right, jnp.float32), cfg
    )
    gt_j = jnp.asarray(gt_half, jnp.float32)
    mask = (gt_j > 0).astype(jnp.float32)

    bad_unary = float(bad_pixel_ratio(out["disparity_unary"], gt_j, 1.0, mask))
    bad_crf = float(bad_pixel_ratio(out["disparity"], gt_j, 1.0, mask))
    epe_unary = float(epe(out["disparity_unary"], gt_j, mask))
    epe_crf = float(epe(out["disparity"], gt_j, mask))

    assert np.isfinite([bad_unary, bad_crf, epe_unary, epe_crf]).all()
    assert bad_crf < bad_unary, (bad_crf, bad_unary)
    assert bad_crf < 0.15, bad_crf
    assert epe_crf < 1.0, epe_crf


@pytest.mark.slow
def test_fullres_64label_gate(tsukuba):
    """Full-resolution reference-canonical config (L = w//6 = 64,
    `DenseCrf.ipynb` cell 6): pins the measured round-3 envelope —
    unary EPE 2.50/bad2 26.7% → CRF EPE 0.864/bad2 10.2% — with margin.
    The CRF must cut bad2 by ≥ 2×."""
    left, right, gt = tsukuba
    gt_full = gt / 16.0
    from depth_estimation_tpu.models.pipeline import calibrate_capacity

    cfg = calibrate_capacity(
        np.asarray(left, np.float32),
        CRFStereoConfig(num_disp=64, niters=5, backend="lattice"),
    )
    out = crf_stereo_infer(
        jnp.asarray(left, jnp.float32), jnp.asarray(right, jnp.float32), cfg
    )
    gt_j = jnp.asarray(gt_full, jnp.float32)
    mask = (gt_j > 0).astype(jnp.float32)
    bad_unary = float(bad_pixel_ratio(out["disparity_unary"], gt_j, 2.0, mask))
    bad_crf = float(bad_pixel_ratio(out["disparity"], gt_j, 2.0, mask))
    epe_crf = float(epe(out["disparity"], gt_j, mask))
    assert bad_crf < bad_unary / 2.0, (bad_crf, bad_unary)
    assert bad_crf < 0.13, bad_crf
    assert epe_crf < 1.0, epe_crf


@pytest.mark.slow
def test_trained_crf_quality_gate(tsukuba):
    """Training the CRF on the real pair must IMPROVE quality, not just
    reduce loss: quarter-res 20-step Adam protocol, gated on the measured
    round-3 envelope (masked MSE 0.218 → 0.178) with margin."""
    from depth_estimation_tpu.train.experiments import train_tsukuba_crf

    left, right, gt = tsukuba
    l4, r4 = left[::4, ::4], right[::4, ::4]
    g4 = gt[::4, ::4] / 16.0 / 4.0
    _, hist = train_tsukuba_crf(
        l4, r4, g4, num_steps=20, num_disp=16, d_feat=16, niters=5
    )
    assert hist["mse_after"] < hist["mse_before"], hist
    assert hist["mse_after"] < 0.20, hist["mse_after"]
