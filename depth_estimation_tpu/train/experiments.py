"""Canonical training experiments — the reference notebooks as functions.

- `train_tsukuba_crf`: the trainable dense CRF of
  `Experiments/trainableDenseCRF.ipynb` (cells 8-21): learn the guide
  scales, feature projection, and Charbonnier compatibility by Adam on the
  masked MSE against Tsukuba ground truth, differentiating end-to-end
  through the permutohedral lattice filter (BASELINE config #3).
- `train_upsampler`: the depth-upsampling run of
  `crf/mb_stereo_crf.py:165-181` on Middlebury 2005 (masked L1).

Each returns (final params, history dict) and is deliberately scale-
parameterized so tests can run a small crop while the full experiment
matches the reference protocol (300 steps, lr 3e-2, Adam).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..crf.compat import charb_apply, charb_init
from ..crf.meanfield import crf_as_rnn
from ..models.features import random_features
from ..ops.costvolume import cost_volume, expected_disparity
from ..ops.permutohedral import build_plan, lattice_filter_planned
from ..crf.guides import pixel_coords
from ..train.metrics import masked_mse

__all__ = ["trainable_crf_init", "trainable_crf_forward", "train_tsukuba_crf"]


def trainable_crf_init(
    key, d_feat: int = 16, d_proj: int = 3, gamma: float = 0.05, dtype=jnp.float32
) -> dict:
    """Params of the trainable dense CRF (`trainableDenseCRF.ipynb` cell 8):
    a linear projection of CNN features into extra guide dims, trainable
    position/color scales, and the Charbonnier compatibility."""
    scale = jnp.asarray(1.0 / np.sqrt(d_feat), dtype)
    return {
        "proj_w": jax.random.normal(key, (d_feat, d_proj), dtype) * scale,
        "proj_b": jnp.zeros((d_proj,), dtype),
        "log_s_ij": jnp.log(jnp.asarray(0.1, dtype)),
        "log_s_rgb": jnp.log(jnp.asarray(0.1, dtype)),
        "log_s_feat": jnp.log(jnp.asarray(10.0, dtype)),
        "mu": charb_init(gamma, dtype),
    }


def trainable_crf_forward(
    params: dict,
    logits: jax.Array,
    img: jax.Array,
    feats: jax.Array,
    niters: int = 5,
) -> jax.Array:
    """Refined logits; gradients flow to guide scales/projection through the
    lattice custom VJP (the 4-filter identity)."""
    h, w, L = logits.shape
    ij = pixel_coords(h, w, img.dtype)
    projected = feats @ params["proj_w"] + params["proj_b"]
    guide = jnp.concatenate(
        [
            ij / jnp.exp(params["log_s_ij"]),
            img / jnp.exp(params["log_s_rgb"]),
            projected / jnp.exp(params["log_s_feat"]),
        ],
        axis=-1,
    )
    ref = guide.reshape(h * w, -1)
    plan = build_plan(jax.lax.stop_gradient(ref))

    def message_fn(Q):
        flat = Q.reshape(h * w, L)
        out = lattice_filter_planned(flat, ref, plan) - flat
        return out.reshape(h, w, L)

    compat_fn = lambda Q: charb_apply(params["mu"], Q)
    return crf_as_rnn(logits, message_fn, compat_fn, niters)


def train_tsukuba_crf(
    left: np.ndarray,
    right: np.ndarray,
    gt: np.ndarray,
    num_steps: int = 300,
    lr: float = 3e-2,
    num_disp: int = 16,
    niters: int = 5,
    d_feat: int = 16,
    seed: int = 0,
):
    """Adam training of the CRF hyperparameters on one stereo pair
    (masked MSE on gt>0 pixels, `trainableDenseCRF.ipynb` cell 14).

    Returns (params, history) with history['loss'] per step and
    before/after masked MSE of the decoded disparity.
    """
    key = jax.random.PRNGKey(seed)
    left_j = jnp.asarray(left, jnp.float32)
    gt_j = jnp.asarray(gt, jnp.float32)
    mask = (gt_j > 0).astype(jnp.float32)

    E0 = cost_volume(left_j, jnp.asarray(right, jnp.float32), num_disp, 9)
    logits = -E0
    feats = random_features(left_j, out_dim=d_feat)

    params = trainable_crf_init(key, d_feat=d_feat)

    def loss_fn(p):
        refined = trainable_crf_forward(p, logits, left_j, feats, niters)
        disp = expected_disparity(refined)
        return masked_mse(disp, gt_j, mask)

    opt = optax.adam(lr)
    opt_state = opt.init(params)

    @jax.jit
    def step(params, opt_state):
        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = opt.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    mse_before = float(loss_fn(params))
    history = {"loss": []}
    for _ in range(num_steps):
        params, opt_state, loss = step(params, opt_state)
        history["loss"].append(float(loss))
    history["mse_before"] = mse_before
    history["mse_after"] = float(loss_fn(params))
    return params, history
