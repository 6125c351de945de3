"""Guided filter family — the O(n) edge-aware W path of the trainable CRF.

TPU-native re-design of the reference's guided-filter stack
(`crf/gaussian_matrix.py:161-287`): `GuidedFilter.get_coeffs` with the
diagonal covariance approximation (`:215-217` — per-channel variance instead
of a c_x×c_x solve), `FastGuidedFilter` subsampled coefficients (`:234-253`),
and `BatchedGuidedAdjacency`'s ·0.5(2r+1)² − I scaling (`:285-287`).

Everything is cumsum box filters + elementwise math — O(n), independent of
r, and trivially fused by XLA. Layout is channels-last (h, w, c); batch via
`jax.vmap`.

The trainable wrapper parametrizes eps through softplus (per source channel)
exactly like the reference's `omega` (`:166, 181-183`).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from .boxfilter import box_filter2d

__all__ = [
    "guided_filter_coeffs",
    "guided_filter",
    "fast_guided_filter",
    "guided_adjacency",
    "guided_adjacency_init",
    "guided_adjacency_apply",
]


def _box_mean(x: jax.Array, r: int, N: jax.Array) -> jax.Array:
    return box_filter2d(x, r, axes=(0, 1), normalize=False) / N


def guided_filter_coeffs(
    y: jax.Array, x: jax.Array, r: int, eps, exact: bool = True
) -> tuple[jax.Array, jax.Array]:
    """Per-pixel affine coefficients (A, b) with y ≈ A·x + b over windows.

    Args:
      y: (h, w, c_y) source; x: (h, w, c_x) guide.
      eps: scalar or (c_x,) regularizer.
      exact: True solves the full (c_x × c_x) regularized covariance system
        per pixel (batched small solves — MXU/VPU-cheap). False uses the
        reference's diagonal approximation (`crf/gaussian_matrix.py:
        215-217`), which overshoots edges up to ~2× when guide channels
        are correlated — kept for parity/experiments.

    Returns:
      mean_A: (h, w, c_y, c_x); mean_b: (h, w, c_y).
    """
    h, w, c_y = y.shape
    c_x = x.shape[-1]
    N = box_filter2d(jnp.ones((h, w, 1), x.dtype), r, axes=(0, 1), normalize=False)

    mean_x = _box_mean(x, r, N)
    mean_y = _box_mean(y, r, N)

    yx = y[..., :, None] * x[..., None, :]  # (h, w, c_y, c_x)
    cov_yx = (
        _box_mean(yx.reshape(h, w, c_y * c_x), r, N).reshape(h, w, c_y, c_x)
        - mean_y[..., :, None] * mean_x[..., None, :]
    )

    if exact:
        xx = x[..., :, None] * x[..., None, :]  # (h, w, c_x, c_x)
        cov_xx = (
            _box_mean(xx.reshape(h, w, c_x * c_x), r, N).reshape(h, w, c_x, c_x)
            - mean_x[..., :, None] * mean_x[..., None, :]
        )
        eye = jnp.eye(c_x, dtype=x.dtype)
        reg = cov_xx + eye * (jnp.asarray(eps, x.dtype) * jnp.ones((c_x,), x.dtype))
        # solve (cov_xx + εI) Aᵀ = cov_yxᵀ  per pixel
        A = jnp.linalg.solve(reg[..., None, :, :], cov_yx[..., :, :, None])[..., 0]
        # shapes: reg (h,w,1,cx,cx) vs rhs (h,w,cy,cx,1) → A (h,w,cy,cx)
    else:
        var_x = _box_mean(x * x, r, N) - mean_x**2  # (h, w, c_x) diagonal
        A = cov_yx / (var_x[..., None, :] + eps)

    b = mean_y - jnp.einsum("hwyx,hwx->hwy", A, mean_x)

    mean_A = _box_mean(A.reshape(h, w, c_y * c_x), r, N).reshape(h, w, c_y, c_x)
    mean_b = _box_mean(b, r, N)
    return mean_A, mean_b


def guided_filter(y: jax.Array, x: jax.Array, r: int, eps) -> jax.Array:
    """Edge-aware filtering of y guided by x (He et al.)."""
    mean_A, mean_b = guided_filter_coeffs(y, x, r, eps)
    return jnp.einsum("hwyx,hwx->hwy", mean_A, x) + mean_b


def _resize_nearest(img: jax.Array, hw: tuple[int, int]) -> jax.Array:
    return jax.image.resize(img, hw + img.shape[2:], method="nearest")


def fast_guided_filter(
    y: jax.Array, x: jax.Array, r: int, eps, subsample: int = 2
) -> jax.Array:
    """Subsampled-coefficient guided filter (`FastGuidedFilter`,
    `crf/gaussian_matrix.py:234-253`): coefficients are computed at 1/s
    resolution with radius r//s, then upsampled (nearest) and applied at
    full resolution."""
    h, w, c_y = y.shape
    c_x = x.shape[-1]
    s = subsample
    lo = (h // s, w // s)
    y_lo = _resize_nearest(y, lo)
    x_lo = _resize_nearest(x, lo)
    mean_A_lo, mean_b_lo = guided_filter_coeffs(y_lo, x_lo, max(r // s, 1), eps)
    mean_A = _resize_nearest(mean_A_lo.reshape(lo + (c_y * c_x,)), (h, w)).reshape(
        h, w, c_y, c_x
    )
    mean_b = _resize_nearest(mean_b_lo, (h, w))
    return jnp.einsum("hwyx,hwx->hwy", mean_A, x) + mean_b


def guided_adjacency(
    src: jax.Array, guide: jax.Array, r: int, eps, subsample: int = 2
) -> jax.Array:
    """W@src with the guided-filter adjacency (`BatchedGuidedAdjacency`,
    `crf/gaussian_matrix.py:285-287`): filter(src)·0.5(2r+1)² − src."""
    filtered = fast_guided_filter(src, guide, r, eps, subsample)
    return filtered * (0.5 * (2 * r + 1) ** 2) - src


def guided_adjacency_init(channels: int = 1, eps: float = 1e-5, dtype=jnp.float32) -> dict:
    """Trainable params: eps via inverse-softplus (reference `omega`,
    `crf/gaussian_matrix.py:166`)."""
    import numpy as np

    omega = float(np.log(np.expm1(eps)))
    return {"omega": jnp.full((channels,), omega, dtype)}


def guided_adjacency_apply(
    params: dict, src: jax.Array, guide: jax.Array, r: int, subsample: int = 2
) -> jax.Array:
    eps = jax.nn.softplus(params["omega"])
    return guided_adjacency(src, guide, r, eps, subsample)
