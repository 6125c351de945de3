"""Task models: CRF depth refiner, uncertainty variant, depth upsampler.

Functional re-designs of the reference task models
(`crf/mb_stereo_crf.py:68-163`): each model is an `init(key, ...) → params`
plus `apply(params, inputs) → outputs` pair, jit/grad-ready. The CRF layer
comes in two interchangeable message-passing backends:

- 'guided': FastGuidedFilter adjacency (the reference's default W for
  `CRFasRNN`, `crf/crf_module.py:91`) — O(n), radius-controlled;
- 'lattice': permutohedral bilateral adjacency over a trainable
  [ij/s_ij, rgb/s_rgb (, feats)] guide — the full dense-CRF.

Layout: channels-last. `logits` are (h, w, L); guides (h, w, c).
"""
from __future__ import annotations

from functools import partial
from typing import Any

import jax
import jax.numpy as jnp

from ..crf.compat import charb_apply, charb_energies_from_scalar, charb_init
from ..crf.guides import ijrgb_guide, ijrgb_guide_init
from ..crf.meanfield import crf_as_rnn
from ..ops.costvolume import expected_disparity
from ..ops.guided_filter import guided_adjacency_apply, guided_adjacency_init
from ..ops.permutohedral import build_plan, lattice_filter_planned

__all__ = [
    "crf_rnn_init",
    "crf_rnn_apply",
    "refiner_init",
    "refiner_apply",
    "uncertainty_init",
    "uncertainty_apply",
    "upsampler_init",
    "upsampler_apply",
]


# ---------------------------------------------------------------------------
# CRF-as-RNN layer (params + apply), both W backends
# ---------------------------------------------------------------------------


def crf_rnn_init(
    gamma: float = 0.05,
    gchannels: int = 1,
    eps: float = 1e-2,
    backend: str = "guided",
    dtype=jnp.float32,
) -> dict:
    """Params for the trainable CRF layer (`CRFasRNN.__init__`,
    `crf/crf_module.py:81-91`)."""
    params = {"mu": charb_init(gamma, dtype)}
    if backend == "guided":
        params["w"] = guided_adjacency_init(gchannels, eps, dtype)
    elif backend == "lattice":
        params["w"] = ijrgb_guide_init(dtype=dtype)
    else:
        raise ValueError(backend)
    return params


def crf_rnn_apply(
    params: dict,
    guide: jax.Array,
    logits: jax.Array,
    niters: int = 2,
    r: int = 15,
    backend: str = "guided",
    confidence: jax.Array | None = None,
    labels: jax.Array | None = None,
    subsample: int = 2,
    max_vertices: int | None = None,
    tile_px: int | None = None,
    tile_u: int = 512,
    tile_bf16: bool = False,
    sort_mode: str = "auto",
) -> jax.Array:
    """Refined logits (h, w, L) ← mean-field with trainable Mu and W.

    guide: (h, w, c) reference features. For the 'lattice' backend the
    guide is rescaled by the trainable [s_ij, s_rgb] and positions are
    appended; the lattice plan is built once and reused over iterations
    AND across the fwd+bwd passes (it rides the custom-VJP residuals).

    tile_px/tile_u/tile_bf16/sort_mode: the round-4/5 tiled MXU
    splat/slice options (see `ops.permutohedral.build_plan`), reachable
    from training so fwd+bwd+∂ref reuse one calibrated tiled plan —
    pixels are block-reordered internally so the plan's consecutive-pixel
    tiles are square image patches. Calibrate `tile_u` with extra
    headroom when the guide scales are trainable: per-tile occupancy
    moves as the scales train, and tile overflow soft-drops filter mass.

    max_vertices: static lattice capacity. Default pow2 ≥ 2n — SAFE for
    arbitrary trainable guide scales but ~16× over a natural image's
    measured occupancy, and the blur working set scales with it (round-4:
    the flagship fwd+bwd train step dropped 891 → 205 ms with a measured
    cap — BENCH_SUITE.json trainable_step). Calibrate with
    `ops.permutohedral.suggest_capacity` on the scaled guide and leave
    growth headroom for the scales to train.
    """
    h, w, L = logits.shape
    compat_fn = lambda Q: charb_apply(params["mu"], Q, labels)

    if backend == "guided":
        message_fn = lambda Q: guided_adjacency_apply(params["w"], Q, guide, r, subsample)
    elif backend == "lattice":
        ref_img = ijrgb_guide(params["w"], guide)  # (h, w, dk)
        B = tile_px
        tiled = B is not None and h % B == 0 and w % B == 0

        def _blocked(x):  # (h, w, K) -> (h·w, K) in B×B image-block order
            K = x.shape[-1]
            return (
                x.reshape(h // B, B, w // B, B, K)
                .transpose(0, 2, 1, 3, 4)
                .reshape(h * w, K)
            )

        def _unblocked(flat):
            K = flat.shape[-1]
            return (
                flat.reshape(h // B, w // B, B, B, K)
                .transpose(0, 2, 1, 3, 4)
                .reshape(h, w, K)
            )

        ref = _blocked(ref_img) if tiled else ref_img.reshape(h * w, -1)
        cap = max_vertices or min(
            1 << (2 * h * w - 1).bit_length(), h * w * (ref.shape[1] + 1)
        )
        plan = build_plan(
            jax.lax.stop_gradient(ref), max_vertices=cap,
            tile=B * B if tiled else None, tile_u=tile_u,
            tile_bf16=tile_bf16, sort_mode=sort_mode,
        )
        # materialization fence — stops XLA rematerializing plan tables
        # into every iteration/backward consumer (models/pipeline.py r5)
        plan = jax.lax.optimization_barrier(plan)

        def message_fn(Q):
            flat = _blocked(Q) if tiled else Q.reshape(h * w, L)
            out = lattice_filter_planned(flat, ref, plan) - flat
            return _unblocked(out) if tiled else out.reshape(h, w, L)

    else:
        raise ValueError(backend)

    return crf_as_rnn(logits, message_fn, compat_fn, niters, confidence)


# ---------------------------------------------------------------------------
# CRFdepthRefiner (`crf/mb_stereo_crf.py:68-79`)
# ---------------------------------------------------------------------------


def refiner_init(
    key,
    d_in: int = 64,
    d_guide: int = 16,
    gamma: float = 0.05,
    eps: float = 1e-2,
    dtype=jnp.float32,
) -> dict:
    """1×1 projection of CNN features (d_in → d_guide−3, concatenated with
    rgb) + CRF layer."""
    wkey, _ = jax.random.split(key)
    scale = 1.0 / jnp.sqrt(jnp.asarray(d_in, dtype))
    return {
        "proj_w": jax.random.normal(wkey, (d_in, d_guide - 3), dtype) * scale,
        "proj_b": jnp.zeros((d_guide - 3,), dtype),
        "crf": crf_rnn_init(gamma, d_guide, eps, "guided", dtype),
    }


def refiner_apply(
    params: dict,
    logits: jax.Array,
    imgrgb: jax.Array,
    features: jax.Array,
    niters: int = 2,
    r: int = 15,
) -> jax.Array:
    """(h, w, L) unary logits + rgb + (h, w, d_in) features → (h, w) depth."""
    projected = features @ params["proj_w"] + params["proj_b"]
    guide = jnp.concatenate([imgrgb, projected], axis=-1)
    refined = crf_rnn_apply(params["crf"], guide, logits, niters, r, "guided")
    return expected_disparity(refined)


# ---------------------------------------------------------------------------
# CRFwUncertainty (`crf/mb_stereo_crf.py:81-102`)
# ---------------------------------------------------------------------------


def _conv_init(key, cin, cout, k, dtype):
    fan_in = cin * k * k
    w = jax.random.normal(key, (k, k, cin, cout), dtype) / jnp.sqrt(
        jnp.asarray(fan_in, dtype)
    )
    return {"w": w, "b": jnp.zeros((cout,), dtype)}


def _conv_apply(p, x):
    y = jax.lax.conv_general_dilated(
        x[None], p["w"], (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC")
    )[0]
    return y + p["b"]


def _coord_cat(x):
    """Append normalized (i, j) coordinate channels (the reference's
    `conv2d(..., coords=True)` from the oil library)."""
    h, w = x.shape[:2]
    ii = jax.lax.broadcasted_iota(x.dtype, (h, w), 0) / max(h - 1, 1)
    jj = jax.lax.broadcasted_iota(x.dtype, (h, w), 1) / max(w - 1, 1)
    return jnp.concatenate([x, ii[..., None], jj[..., None]], axis=-1)


def uncertainty_init(key, d_in: int = 64, d_guide: int = 16, gamma: float = 0.05,
                     eps: float = 1e-2, dtype=jnp.float32) -> dict:
    """Refiner + 3-layer coord-conv uncertainty head producing log σ."""
    keys = jax.random.split(key, 4)
    params = refiner_init(keys[0], d_in, d_guide, gamma, eps, dtype)
    params["unc"] = [
        _conv_init(keys[1], 3 + 2, 16, 3, dtype),
        _conv_init(keys[2], 16 + 2, 16, 3, dtype),
        _conv_init(keys[3], 16 + 2, 1, 3, dtype),
    ]
    return params


def _groupnorm(x, groups=4, eps=1e-5):
    h, w, c = x.shape
    g = x.reshape(h, w, groups, c // groups)
    mean = g.mean(axis=(0, 1, 3), keepdims=True)
    var = ((g - mean) ** 2).mean(axis=(0, 1, 3), keepdims=True)
    return ((g - mean) * jax.lax.rsqrt(var + eps)).reshape(h, w, c)


def uncertainty_apply(
    params: dict,
    logits: jax.Array,
    imgrgb: jax.Array,
    features: jax.Array,
    niters: int = 2,
    r: int = 15,
):
    """Returns (depth, confidence) with confidence = exp(−s) from the
    uncertainty net (`crf/mb_stereo_crf.py:94-102`)."""
    projected = features @ params["proj_w"] + params["proj_b"]
    guide = jnp.concatenate([imgrgb, projected], axis=-1)
    s = _conv_apply(params["unc"][0], _coord_cat(imgrgb))
    s = jax.nn.relu(_groupnorm(s))
    s = jax.nn.relu(_groupnorm(_conv_apply(params["unc"][1], _coord_cat(s))))
    s = _conv_apply(params["unc"][2], _coord_cat(s))
    confidence = jnp.exp(-s)  # (h, w, 1)
    refined = crf_rnn_apply(params["crf"], guide, logits, niters, r, "guided",
                            confidence=confidence)
    return expected_disparity(refined), confidence[..., 0]


# ---------------------------------------------------------------------------
# CRFdepthUpsampler (`crf/mb_stereo_crf.py:138-163`)
# ---------------------------------------------------------------------------


def upsampler_init(gamma: float = 0.05, eps: float = 1e-2, d_guide: int = 3,
                   dtype=jnp.float32) -> dict:
    return {"crf": crf_rnn_init(gamma, d_guide, eps, "guided", dtype)}


def upsampler_apply(
    params: dict,
    disp_lowres: jax.Array,
    img_highres: jax.Array,
    niters: int = 1,
    r: int = 5,
    num_labels: int = 18,
    unary_scale: float = 10.0,
) -> jax.Array:
    """Depth super-resolution: bilinear-upsample the low-res disparity,
    energize against `num_labels` linspace labels via the Charbonnier
    compatibility, refine with the image-guided CRF, decode by expectation.

    Matches `CRFdepthUpsampler.forward` (`crf/mb_stereo_crf.py:144-163`)
    including the (disp > 1e-2) validity confidence.
    """
    h, w = img_highres.shape[:2]
    up = jax.image.resize(disp_lowres, (h, w), method="bilinear")
    max_depth = up.max()
    labels = jnp.linspace(0.0, max_depth, num_labels).astype(up.dtype)
    energies = charb_energies_from_scalar(
        params["crf"]["mu"], up[..., None], labels[None, None, :]
    )
    logits = -unary_scale * energies  # (h, w, L)
    confidence = (up > 1e-2).astype(up.dtype)[..., None]
    refined = crf_rnn_apply(
        params["crf"], img_highres, logits, niters, r, "guided",
        confidence=confidence, labels=labels,
    )
    return expected_disparity(refined, labels)
