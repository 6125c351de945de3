"""Classical depth-refinement baselines (no learning, no mean-field).

The `Experiments/CRF_real.ipynb` capability set (SURVEY.md §2.5): iterated
edge-aware smoothing of a noisy disparity map (joint-bilateral via the
permutohedral lattice, or guided filtering), and linear-system refinement —
conjugate-gradient solves of (I + λ·Lap) d = d₀ against a Laplacian
regularizer (the notebook's scipy `LinearOperator` + `cg` cells, backed by
`crf/depth.py:118-146` operator factories).

All matrix-free: operators are closures over jnp functions; CG is
`jax.scipy.sparse.linalg.cg` — everything one jit program on TPU.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ..crf.guides import stack_guide
from .guided_filter import guided_filter
from .permutohedral import apply_plan, build_plan

__all__ = [
    "joint_bilateral_smooth",
    "iterated_guided_smooth",
    "laplacian_apply",
    "cg_refine_laplacian",
    "cg_refine_bilateral",
]


def joint_bilateral_smooth(
    disp: jax.Array,
    img: jax.Array,
    sigma_color: float = 0.1,
    sigma_pos: float = 0.02,
    niters: int = 3,
) -> jax.Array:
    """Iterated joint-bilateral filtering of (h, w) disparity guided by the
    image (`cv2.ximgproc.jointBilateralFilter` loop of CRF_real cell 14),
    implemented as homogeneous-normalized lattice filtering."""
    h, w = disp.shape
    ref = stack_guide(img, sigma_color, sigma_pos).reshape(h * w, -1)
    plan = build_plan(ref)

    def smooth_once(d):
        stacked = jnp.stack([d.reshape(-1), jnp.ones(h * w, d.dtype)], axis=-1)
        out = apply_plan(plan, stacked)
        return (out[:, 0] / jnp.maximum(out[:, 1], 1e-20)).reshape(h, w)

    for _ in range(niters):
        disp = smooth_once(disp)
    return disp


def iterated_guided_smooth(
    disp: jax.Array, img: jax.Array, r: int = 8, eps: float = 1e-3, niters: int = 3
) -> jax.Array:
    """Iterated guided filtering (CRF_real cells 15-17)."""
    for _ in range(niters):
        disp = guided_filter(disp[..., None], img, r, eps)[..., 0]
    return disp


def laplacian_apply(x: jax.Array) -> jax.Array:
    """5-point graph Laplacian with zero-flux boundary (`crf/depth.py:113-128`
    `laplacian`/`laplacian_op` semantics, matrix-free)."""
    up = jnp.pad(x[:-1], ((1, 0), (0, 0)), mode="edge")
    down = jnp.pad(x[1:], ((0, 1), (0, 0)), mode="edge")
    left = jnp.pad(x[:, :-1], ((0, 0), (1, 0)), mode="edge")
    right = jnp.pad(x[:, 1:], ((0, 0), (0, 1)), mode="edge")
    return 4.0 * x - up - down - left - right


@partial(jax.jit, static_argnames=("maxiter",))
def cg_refine_laplacian(
    disp: jax.Array, lam: float = 1.0, maxiter: int = 50
) -> jax.Array:
    """Solve (I + λ·Lap) d = d₀ by CG — quadratic smoothing refinement
    (CRF_real cells 18-19)."""

    def A(x):
        return x + lam * laplacian_apply(x)

    out, _ = jax.scipy.sparse.linalg.cg(A, disp, x0=disp, maxiter=maxiter)
    return out


def cg_refine_bilateral(
    disp: jax.Array,
    img: jax.Array,
    lam: float = 1.0,
    sigma_color: float = 0.1,
    sigma_pos: float = 0.02,
    maxiter: int = 30,
) -> jax.Array:
    """Solve (I + λ·L_bilateral) d = d₀ with the symmetrized lattice RBF
    Laplacian — edge-aware quadratic refinement (the notebook's strongest
    classical baseline)."""
    h, w = disp.shape
    ref = stack_guide(img, sigma_color, sigma_pos).reshape(h * w, -1)
    plan = build_plan(ref)
    ones = jnp.ones((h * w, 1), disp.dtype)

    def Wsym(U):
        return 0.5 * (apply_plan(plan, U) + apply_plan(plan, U, reverse=True)) - U

    degree = jnp.maximum(Wsym(ones), 1e-6)
    dinv = jax.lax.rsqrt(degree)

    def A(x):
        u = x.reshape(h * w, 1)
        lap = u - dinv * Wsym(dinv * u)
        return (u + lam * lap).reshape(h, w)

    out, _ = jax.scipy.sparse.linalg.cg(A, disp, x0=disp, maxiter=maxiter)
    return out
