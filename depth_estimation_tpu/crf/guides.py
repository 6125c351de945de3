"""Guide (reference-feature) builders for the bilateral CRF.

Functional versions of the reference's guide modules
(`crf/crf_module.py:106-123` `ijrgbGuide`/`ijGuide` and the notebook
5-D [rgb/σc, ij/σp, feats/σf] reference construction in
`Experiments/DenseCrf.ipynb` cell 9). Scales are trainable params.

Layout: images are channels-last (h, w, c); guides returned channels-last
(h, w, d) ready to be flattened to the (n, d) lattice reference.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = [
    "pixel_coords",
    "ij_guide_init",
    "ij_guide",
    "ijrgb_guide_init",
    "ijrgb_guide",
    "stack_guide",
]


def pixel_coords(h: int, w: int, dtype=jnp.float32) -> jax.Array:
    """(h, w, 2) array of (i, j) positions normalized by the image diagonal
    (matching `np.mgrid[:h,:w]/sqrt(h²+w²)` at `crf/crf_module.py:113`)."""
    ii = jax.lax.broadcasted_iota(dtype, (h, w), 0)
    jj = jax.lax.broadcasted_iota(dtype, (h, w), 1)
    diag = jnp.asarray((h**2 + w**2) ** 0.5, dtype)
    return jnp.stack([ii, jj], axis=-1) / diag


def ij_guide_init(s_ij: float = 0.1, dtype=jnp.float32) -> dict:
    return {"s_ij": jnp.asarray(s_ij, dtype)}


def ij_guide(params: dict, img: jax.Array) -> jax.Array:
    """Position-only guide (h, w, 2) = ij/s_ij (`crf/crf_module.py:116-123`)."""
    h, w = img.shape[:2]
    return pixel_coords(h, w, img.dtype) / params["s_ij"]


def ijrgb_guide_init(s_ij: float = 0.1, s_rgb: float = 0.1, dtype=jnp.float32) -> dict:
    return {"s_ij": jnp.asarray(s_ij, dtype), "s_rgb": jnp.asarray(s_rgb, dtype)}


def ijrgb_guide(params: dict, img: jax.Array) -> jax.Array:
    """Bilateral guide (h, w, 2+c) = [ij/s_ij, rgb/s_rgb]
    (`crf/crf_module.py:106-114`)."""
    h, w = img.shape[:2]
    ij = pixel_coords(h, w, img.dtype) / params["s_ij"]
    return jnp.concatenate([ij, img / params["s_rgb"]], axis=-1)


def stack_guide(img: jax.Array, sigma_color: float, sigma_pos: float,
                feats: jax.Array | None = None, sigma_feat: float | None = None) -> jax.Array:
    """Notebook-style reference stack [rgb/σc, ij/σp (, feats/σf)]
    (`Experiments/DenseCrf.ipynb` cell 9)."""
    h, w = img.shape[:2]
    parts = [img / sigma_color, pixel_coords(h, w, img.dtype) / sigma_pos]
    if feats is not None:
        parts.append(feats / sigma_feat)
    return jnp.concatenate(parts, axis=-1)
