"""Instance-mask-guided depth: per-object disparity compositing.

The `Experiments/POC.ipynb` capability (SURVEY.md §3.4): given instance
masks (from any detector — the framework treats them as input, with
`ops.detection` providing the box/NMS/ROI machinery), estimate one
disparity per object by FFT phase correlation or NCC over the masked
region, and composite a segment-wise depth map. All FFT/reduction work is
jnp — FFTs map to XLA's TPU FFT, argmax reductions to the VPU.

Functions mirror `crf/depth.py:55-74` (`NCC_disp`, `get_poc_offset`) and
POC cell 8's mask compositing loop (vectorized over masks via vmap).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

__all__ = ["phase_correlation_offset", "masked_phase_disparity", "composite_mask_depth"]


def phase_correlation_offset(img1: jax.Array, img2: jax.Array) -> jax.Array:
    """Horizontal shift between two (h, w, c) images by phase correlation
    (`crf/depth.py:65-74`): argmax of the normalized cross-power spectrum,
    folded to min(j, w−j)."""
    I1 = jnp.fft.fft2(img1, axes=(0, 1))
    I2 = jnp.fft.fft2(img2, axes=(0, 1))
    cross = I1.conj() * I2
    norm = cross / (jnp.abs(cross) + 1e-4)
    corr = jnp.fft.ifft2(norm, axes=(0, 1)).real
    reduced = jnp.linalg.norm(corr, axis=2)
    flat = jnp.argmax(reduced)
    j = flat % img1.shape[1]
    # cyclic peak index; fold to the magnitude of the shift (the reference
    # folds after an fftshift, which offsets the result by w/2 — fixed here)
    return jnp.minimum(j, img2.shape[1] - j)


def masked_phase_disparity(left: jax.Array, right: jax.Array, mask: jax.Array) -> jax.Array:
    """Disparity of one object: phase correlation restricted to its mask
    (POC cell 8 masks the images before correlating)."""
    m = mask[..., None].astype(left.dtype)
    return phase_correlation_offset(left * m, right * m).astype(left.dtype)


@partial(jax.jit, static_argnames=())
def composite_mask_depth(
    left: jax.Array, right: jax.Array, masks: jax.Array, background: float = 0.0
) -> jax.Array:
    """Segment-wise disparity map from (K, h, w) instance masks.

    Later (higher-index) masks overwrite earlier ones where they overlap,
    matching the notebook's sequential compositing. Returns (h, w).
    """
    disps = jax.vmap(lambda m: masked_phase_disparity(left, right, m))(masks)

    def paint(canvas, inputs):
        mask, d = inputs
        return jnp.where(mask > 0, d, canvas), None

    canvas0 = jnp.full(left.shape[:2], background, left.dtype)
    canvas, _ = jax.lax.scan(paint, canvas0, (masks, disps))
    return canvas
