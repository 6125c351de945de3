"""Serving path: batched pipeline matches per-frame results; DP sharding
produces identical outputs to unsharded."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from depth_estimation_tpu.data.synthetic import make_stereo_pair
from depth_estimation_tpu.models.pipeline import CRFStereoConfig, crf_stereo_infer
from depth_estimation_tpu.models.serving import StereoServer
from depth_estimation_tpu.parallel.mesh import make_mesh


@pytest.fixture(scope="module")
def batch():
    rng = np.random.RandomState(0)
    lefts, rights = [], []
    for i in range(8):
        l, r, _ = make_stereo_pair(np.random.RandomState(i), h=32, w=48, max_disp=6)
        lefts.append(l)
        rights.append(r)
    return np.stack(lefts).astype(np.float32), np.stack(rights).astype(np.float32)


def test_batched_matches_single(batch):
    lefts, rights = batch
    cfg = CRFStereoConfig(num_disp=8, niters=2)
    server = StereoServer(cfg)
    out = np.asarray(server(lefts, rights))
    assert out.shape == (8, 32, 48)
    # the server auto-calibrated capacity/pieces on the first frame;
    # compare against single-image inference under the SAME calibrated
    # config (the vmap-vs-single contract being tested)
    single = np.asarray(
        crf_stereo_infer(
            jnp.asarray(lefts[3]), jnp.asarray(rights[3]), server.cfg
        )["disparity"]
    )
    np.testing.assert_allclose(out[3], single, rtol=1e-4, atol=1e-5)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_data_parallel_serving_matches(batch):
    lefts, rights = batch
    cfg = CRFStereoConfig(num_disp=8, niters=2)
    mesh = make_mesh(data=8, tile=1)
    sharded = StereoServer(cfg, mesh=mesh)
    plain = StereoServer(cfg)
    a = np.asarray(sharded(lefts, rights))
    b = np.asarray(plain(lefts, rights))
    np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-5)
    stats = sharded.throughput(lefts, rights, reps=2)
    assert stats["frames_per_s"] > 0 and stats["devices"] == 8


def test_vmap_batch_mode_matches_loop(batch):
    """The one-program vmapped batch (the mesh-shardable form, round-5:
    pinned sort_mode makes it viable) reproduces the loop-mode results
    under the same calibrated config — including the lean tiled plan
    build mapped over the batch."""
    lefts, rights = batch
    cfg = CRFStereoConfig(num_disp=8, niters=2)
    s_loop = StereoServer(cfg)  # auto-calibrates on the first call
    out_loop = np.asarray(s_loop(lefts, rights))
    s_vmap = StereoServer(s_loop.cfg, batch_mode="vmap", auto_capacity=False)
    out_vmap = np.asarray(s_vmap(lefts, rights))
    np.testing.assert_allclose(out_vmap, out_loop, rtol=1e-4, atol=1e-5)
