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
