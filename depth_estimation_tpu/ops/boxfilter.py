"""Box and Gaussian filters, cumsum-based, differentiable.

TPU-first re-design of the reference's blur stack
(`crf/gaussian_matrix.py:86-156` — `box_filter` cumsum trick and the
iterated-box `GaussianBlur` autograd.Function):

- `box_filter`: O(n) sliding-window sum/mean along one axis via cumsum.
  XLA fuses the pad+cumsum+slice into a few elementwise passes; no conv.
- `box_filter2d`: separable 2-D window sum (the guided-filter workhorse).
- `gaussian_blur`: separable truncated-Gaussian depthwise blur with a
  *static* kernel radius but fully differentiable σ (the kernel weights are
  smooth in σ, so `jax.grad` flows through — no custom VJP needed, unlike
  the reference's 4-term filtered-stack backward at
  `crf/gaussian_matrix.py:137-153`).
- `gaussian_blur_box`: the reference's iterated-box approximation (3 box
  passes with radius floor(sqrt(12σ²/n+1))//2) for non-trainable σ; fastest
  when σ is large.

All functions operate along explicit axes of arbitrary-rank arrays and
preserve dtype.
"""
from __future__ import annotations

import math
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "box_filter",
    "box_filter2d",
    "gaussian_blur",
    "gaussian_blur_box",
    "window_counts",
]


def _axis_slice(ndim: int, axis: int, sl: slice):
    idx = [slice(None)] * ndim
    idx[axis] = sl
    return tuple(idx)


def window_counts(length: int, r: int, dtype=jnp.float32) -> jax.Array:
    """Number of in-bounds taps of a radius-r window at each position."""
    i = np.arange(length)
    counts = np.minimum(i, r) + np.minimum(length - i - 1, r) + 1
    return jnp.asarray(counts, dtype=dtype)


def box_filter(x: jax.Array, r: int, axis: int, normalize: bool = True) -> jax.Array:
    """Sliding-window sum (or mean) of width 2r+1 along `axis`.

    Zero padding at the borders; with `normalize=True` divides by the
    per-position in-bounds tap count (edge-corrected mean), matching the
    reference `box_filter` (`crf/gaussian_matrix.py:86-105`).
    """
    axis = axis % x.ndim
    if r == 0:
        return x
    pad = [(0, 0)] * x.ndim
    pad[axis] = (r + 1, r)
    padded = jnp.pad(x, pad)
    csum = jnp.cumsum(padded, axis=axis)
    upper = csum[_axis_slice(x.ndim, axis, slice(2 * r + 1, None))]
    lower = csum[_axis_slice(x.ndim, axis, slice(None, -(2 * r + 1)))]
    out = upper - lower
    if normalize:
        shape = [1] * x.ndim
        shape[axis] = x.shape[axis]
        out = out / window_counts(x.shape[axis], r, x.dtype).reshape(shape)
    return out


def box_filter2d(
    x: jax.Array, r: int, axes: tuple[int, int] = (-2, -1), normalize: bool = False
) -> jax.Array:
    """Separable 2-D window sum/mean over a (2r+1)² window."""
    return box_filter(box_filter(x, r, axes[0], normalize), r, axes[1], normalize)


def _gauss_kernel(sigma, radius: int, dtype):
    offsets = jnp.arange(-radius, radius + 1, dtype=dtype)
    w = jnp.exp(-0.5 * (offsets / sigma) ** 2)
    return w / jnp.sum(w)


def gaussian_blur(
    x: jax.Array, sigma, axis: int, radius: int | None = None
) -> jax.Array:
    """Normalized Gaussian blur along one axis, differentiable in σ.

    `radius` is the static kernel truncation half-width (defaults to
    ceil(3σ) when σ is a concrete Python number; must be given explicitly
    when σ is traced). Implemented as pad + weighted sum of shifted slices,
    which XLA fuses into one bandwidth-bound pass.
    """
    axis = axis % x.ndim
    if radius is None:
        radius = max(1, int(math.ceil(3 * float(sigma))))
    sigma = jnp.asarray(sigma, dtype=x.dtype)
    kernel = _gauss_kernel(sigma, radius, x.dtype)
    pad = [(0, 0)] * x.ndim
    pad[axis] = (radius, radius)
    padded = jnp.pad(x, pad)
    n = x.shape[axis]
    # Unrolled: radius is static and small; lets XLA fuse all taps.
    out = jnp.zeros_like(x)
    for k in range(2 * radius + 1):
        out = out + kernel[k] * jax.lax.slice_in_dim(padded, k, k + n, axis=axis)
    return out


def box_radius_for_sigma(sigma: float, niters: int = 3) -> int:
    """Box half-width so that `niters` box passes ≈ Gaussian of std σ.

    Same formula as the reference (`crf/gaussian_matrix.py:118`).
    """
    return int(math.floor(math.sqrt(12 * sigma**2 / niters + 1)) // 2)


def gaussian_blur_box(x: jax.Array, sigma: float, axis: int, niters: int = 3) -> jax.Array:
    """Approximate Gaussian blur by `niters` iterated box means.

    σ must be a concrete Python number (the box radius is static). Cheaper
    than `gaussian_blur` for large σ: cost is O(n·niters), independent of σ.
    """
    r = box_radius_for_sigma(float(sigma), niters)
    for _ in range(niters):
        x = box_filter(x, r, axis, normalize=True)
    return x
