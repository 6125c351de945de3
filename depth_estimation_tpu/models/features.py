"""Guidance feature extractors (CNN features for CRF edge weights).

Capability replacement for the reference's VGG16 slice extractor
(`crf/features.py` — relu1_2/2_2/3_3/4_3 activations zoomed back to image
resolution and concatenated). A pretrained torchvision VGG is neither
available nor TPU-idiomatic here; instead:

- `FeatureCNN`: a compact multi-scale conv net (bf16-friendly, GroupNorm)
  whose stage activations are resized to input resolution and concatenated,
  then projected to `out_dim` — the same (h, w, 64) guidance-tensor contract
  the reference models consume (`CRFdepthRefiner(d_in=64, ...)`,
  `crf/mb_stereo_crf.py:68-79`).
- `random_features`: seeded random-projection + whitening of local patches
  (`get_random_features`, `crf/features.py:61-67`) — a training-free
  deterministic fallback used by tests.

Channels-last (h, w, c); batched via vmap or leading batch dim.
"""
from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

__all__ = [
    "FeatureCNN",
    "VGG16Features",
    "extract_features",
    "vgg16_features",
    "random_features",
]


class FeatureCNN(nn.Module):
    """Multi-scale guidance features: stages at 1×, 1/2×, 1/4×, 1/8× are
    resized to input resolution, concatenated and 1×1-projected."""

    out_dim: int = 64
    widths: tuple = (32, 64, 96, 128)

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:  # (h, w, 3) -> (h, w, out_dim)
        h, w = x.shape[:2]
        feats = []
        y = x[None]  # NHWC
        for i, width in enumerate(self.widths):
            y = nn.Conv(width, (3, 3), padding="SAME")(y)
            y = nn.GroupNorm(num_groups=8)(y)
            y = nn.relu(y)
            y = nn.Conv(width, (3, 3), padding="SAME")(y)
            y = nn.GroupNorm(num_groups=8)(y)
            y = nn.relu(y)
            feats.append(jax.image.resize(y, (1, h, w, width), method="bilinear"))
            if i < len(self.widths) - 1:
                y = nn.avg_pool(y, (2, 2), strides=(2, 2))
        cat = jnp.concatenate(feats, axis=-1)
        out = nn.Conv(self.out_dim, (1, 1))(cat)
        return out[0]


def extract_features(params, img: jax.Array, out_dim: int = 64) -> jax.Array:
    """Apply a FeatureCNN params pytree to an (h, w, 3) image."""
    return FeatureCNN(out_dim=out_dim).apply(params, img)


# torchvision VGG16 `features` conv indices for the slice boundaries the
# reference taps (`crf/features.py:12-22`: relu1_2=3, relu2_2=8, relu3_3=15,
# relu4_3=22 in module order; conv layers only, with maxpools between).
_VGG16_STAGES = ((64, 64), (128, 128), (256, 256, 256), (512, 512, 512))
VGG16_MEAN = (0.485, 0.456, 0.406)
VGG16_STD = (0.229, 0.224, 0.225)


class VGG16Features(nn.Module):
    """VGG16 guidance features — the reference's `Vgg16features`
    (`crf/features.py:12-59`): activations at relu1_2 / relu2_2 / relu3_3 /
    relu4_3, each resized back to input resolution and concatenated to an
    (h, w, 960) guidance tensor (`get_all_features` semantics; zoom ≙
    scipy.ndimage.zoom order-1).

    Weights: `utils.weights.torch_vgg16_params` maps a torchvision
    `vgg16().state_dict()` onto this module; untrained init works too
    (random multi-scale projections are still usable guidance).
    Input is normalized with the ImageNet mean/std the reference's
    `preprocess` applies (`crf/features.py:24-33`).
    """

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:  # (h, w, 3) → (h, w, 960)
        h, w = x.shape[:2]
        y = (x - jnp.asarray(VGG16_MEAN, x.dtype)) / jnp.asarray(VGG16_STD, x.dtype)
        y = y[None]
        taps = []
        for s, widths in enumerate(_VGG16_STAGES):
            for c, width in enumerate(widths):
                y = nn.Conv(width, (3, 3), padding="SAME", name=f"conv{s}_{c}")(y)
                y = nn.relu(y)
            taps.append(jax.image.resize(y, (1, h, w, y.shape[-1]), "bilinear"))
            y = nn.max_pool(y, (2, 2), strides=(2, 2))
        return jnp.concatenate(taps, axis=-1)[0]


def vgg16_features(params, img: jax.Array) -> jax.Array:
    """Apply a VGG16Features params pytree to an (h, w, 3) image."""
    return VGG16Features().apply(params, img)


def random_features(
    img: jax.Array, out_dim: int = 16, patch: int = 3, seed: int = 0
) -> jax.Array:
    """Seeded random projection of local patches, whitened per channel
    (`crf/features.py:61-67` semantics: projection + mean/std whitening).
    Deterministic, training-free guidance features for tests."""
    h, w, c = img.shape
    r = patch // 2
    padded = jnp.pad(img, ((r, r), (r, r), (0, 0)), mode="edge")
    cols = []
    for di in range(patch):
        for dj in range(patch):
            cols.append(jax.lax.slice(padded, (di, dj, 0), (di + h, dj + w, c)))
    patches = jnp.concatenate(cols, axis=-1)  # (h, w, patch²·c)
    key = jax.random.PRNGKey(seed)
    proj = jax.random.normal(key, (patches.shape[-1], out_dim), img.dtype)
    proj = proj / jnp.sqrt(jnp.asarray(patches.shape[-1], img.dtype))
    feats = patches @ proj
    mean = feats.mean(axis=(0, 1), keepdims=True)
    std = feats.std(axis=(0, 1), keepdims=True)
    return (feats - mean) / (std + 1e-6)
