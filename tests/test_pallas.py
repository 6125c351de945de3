"""Pallas kernel tests — interpret mode on the CPU backend exercises the
exact arithmetic the TPU kernel executes."""
import jax
import jax.numpy as jnp
import numpy as np


def test_fused_energy_update_matches_reference(rng):
    from depth_estimation_tpu.ops.pallas.meanfield import (
        fused_energy_update, fused_energy_update_reference)

    n, L = 2048, 16
    E0 = jnp.asarray(rng.rand(n, L).astype(np.float32) * 10)
    S = jnp.asarray(rng.randn(n, L).astype(np.float32))
    C = jnp.asarray(rng.rand(n, L).astype(np.float32))
    Mu = jnp.asarray(rng.rand(L, L).astype(np.float32))
    E_ref, C_ref = fused_energy_update_reference(E0, S, C, Mu)
    E_k, C_k = fused_energy_update(E0, S, C, Mu, block=512, interpret=True)
    np.testing.assert_allclose(np.asarray(E_k), np.asarray(E_ref),
                               rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(np.asarray(C_k), np.asarray(C_ref),
                               rtol=1e-5, atol=1e-6)
    # non-divisible n falls back to the reference
    E_f, C_f = fused_energy_update(E0[:1000], S[:1000], C[:1000], Mu,
                                   block=512)
    np.testing.assert_allclose(np.asarray(E_f),
                               np.asarray(fused_energy_update_reference(
                                   E0[:1000], S[:1000], C[:1000], Mu)[0]))


def test_pipeline_fused_update_matches_default():
    """crf_stereo_infer(fused_update=True) reproduces the default
    mean-field fixed point end-to-end (interpreted kernel on CPU)."""
    from dataclasses import replace

    from depth_estimation_tpu.data.synthetic import make_stereo_pair
    from depth_estimation_tpu.models.pipeline import (CRFStereoConfig,
                                                      calibrate_capacity,
                                                      crf_stereo_infer)

    rng = np.random.RandomState(0)
    left, right, _ = make_stereo_pair(rng, 64, 96, num_layers=4, max_disp=7)
    left = jnp.asarray(left, jnp.float32)
    right = jnp.asarray(right, jnp.float32)
    cfg = calibrate_capacity(
        left, CRFStereoConfig(num_disp=8, niters=3, backend="lattice"),
        tiled=True, tile_px=32)
    d0 = np.asarray(crf_stereo_infer(left, right, cfg)["disparity"])
    d1 = np.asarray(crf_stereo_infer(
        left, right, replace(cfg, fused_update=True))["disparity"])
    np.testing.assert_allclose(d1, d0, atol=5e-3)
