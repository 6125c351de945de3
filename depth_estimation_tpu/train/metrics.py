"""Disparity/depth metrics: EPE, bad-τ, masked L1/MSE.

The reference's de-facto metrics (SURVEY.md §5): masked MSE on valid GT
pixels (`trainableDenseCRF.ipynb` cell 14: (4·d − gt/4)²[gt≠0]), masked L1
(`Dupsampling.loss`, `crf/mb_stereo_crf.py:108-113`), plus the standard
stereo EPE / bad-pixel-% the baselines are quoted in (BASELINE.md).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["masked_l1", "masked_mse", "epe", "bad_pixel_ratio", "valid_mask"]


def valid_mask(gt: jax.Array, min_val: float = 0.0) -> jax.Array:
    """Validity mask: GT strictly above `min_val` (reference uses gt>0)."""
    return (gt > min_val).astype(gt.dtype)


def _masked_mean(err: jax.Array, mask: jax.Array) -> jax.Array:
    return (err * mask).sum() / jnp.maximum(mask.sum(), 1.0)


def masked_l1(pred: jax.Array, gt: jax.Array, mask: jax.Array | None = None) -> jax.Array:
    mask = valid_mask(gt) if mask is None else mask
    return _masked_mean(jnp.abs(pred - gt), mask)


def masked_mse(pred: jax.Array, gt: jax.Array, mask: jax.Array | None = None) -> jax.Array:
    mask = valid_mask(gt) if mask is None else mask
    return _masked_mean((pred - gt) ** 2, mask)


def epe(pred: jax.Array, gt: jax.Array, mask: jax.Array | None = None) -> jax.Array:
    """End-point error = masked mean absolute disparity error."""
    return masked_l1(pred, gt, mask)


def bad_pixel_ratio(
    pred: jax.Array, gt: jax.Array, tau: float = 2.0, mask: jax.Array | None = None
) -> jax.Array:
    """Fraction of valid pixels with |error| > τ (bad-2.0 when τ=2)."""
    mask = valid_mask(gt) if mask is None else mask
    bad = (jnp.abs(pred - gt) > tau).astype(gt.dtype)
    return _masked_mean(bad, mask)
