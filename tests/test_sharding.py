"""Multi-device sharding tests on the 8-virtual-device CPU mesh.

Covers what the reference never tested (SURVEY.md §4.7 — multi-GPU paths
only ran on real GPUs): halo-exchange correctness against the single-
device result, tiled lattice filtering accuracy, and data-parallel
gradient equivalence.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P
from jax import shard_map

from depth_estimation_tpu.ops.boxfilter import box_filter2d
from depth_estimation_tpu.ops.permutohedral import apply_plan, build_plan
from depth_estimation_tpu.parallel.mesh import make_mesh
from depth_estimation_tpu.parallel.tiling import halo_exchange_rows, tiled_apply

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 virtual devices"
)


def test_halo_exchange_rows_matches_concatenation(rng):
    mesh = make_mesh(data=1, tile=8)
    x = jnp.asarray(rng.randn(64, 6))
    halo = 3

    def local(xl):
        return halo_exchange_rows(xl, halo, "tile")

    out = shard_map(
        local, mesh=mesh, in_specs=(P("tile"),), out_specs=P("tile"), check_vma=False
    )(x)
    out = np.asarray(out)  # (64 + 8·2·halo rows, stacked per device)
    xs = np.asarray(x).reshape(8, 8, 6)
    blocks = out.reshape(8, 8 + 2 * halo, 6)
    for i in range(8):
        want_above = xs[i - 1][-halo:] if i > 0 else np.zeros((halo, 6))
        want_below = xs[i + 1][:halo] if i < 7 else np.zeros((halo, 6))
        np.testing.assert_allclose(blocks[i][:halo], want_above, atol=1e-12)
        np.testing.assert_allclose(blocks[i][halo:-halo], xs[i], atol=1e-12)
        np.testing.assert_allclose(blocks[i][-halo:], want_below, atol=1e-12)


def test_tiled_box_filter_matches_global(rng):
    # A box filter with radius ≤ halo must be exactly reproduced by
    # overlap-and-discard tiling (away from the zero-pad convention which
    # both paths share).
    mesh = make_mesh(data=1, tile=8)
    x = jnp.asarray(rng.randn(80, 16))
    r = 2

    fn = lambda img: box_filter2d(img, r, axes=(0, 1), normalize=False)
    global_out = np.asarray(fn(x))
    tiled_out = np.asarray(tiled_apply(fn, x, halo=r, mesh=mesh))
    np.testing.assert_allclose(tiled_out, global_out, rtol=1e-10, atol=1e-12)


def test_tiled_lattice_close_to_global(rng):
    # Bilateral lattice with short-range position kernel: overlap-discard
    # tiling approximates the global filter; interior rows must agree to a
    # few percent.
    mesh = make_mesh(data=1, tile=8)
    h, w = 64, 12
    img = jnp.asarray(rng.rand(h, w, 3).astype(np.float32))
    src = jnp.asarray(rng.rand(h, w, 2).astype(np.float32))
    sigma_pos = 1.5  # pixels
    halo = 8

    def make_ref(image):
        hh, ww = image.shape[:2]
        ii = jax.lax.broadcasted_iota(jnp.float32, (hh, ww), 0)
        jj = jax.lax.broadcasted_iota(jnp.float32, (hh, ww), 1)
        return jnp.concatenate(
            [image * 4.0, (ii / sigma_pos)[..., None], (jj / sigma_pos)[..., None]],
            axis=-1,
        )

    def global_filter(s, image):
        hh, ww = image.shape[:2]
        ref = make_ref(image).reshape(hh * ww, -1)
        plan = build_plan(ref)
        return apply_plan(plan, s.reshape(hh * ww, -1)).reshape(hh, ww, -1)

    global_out = np.asarray(jax.jit(global_filter)(src, img))

    def local(s, image):
        sp = halo_exchange_rows(s, halo, "tile")
        gp = halo_exchange_rows(image, halo, "tile")
        # positions must be GLOBAL row indices: offset by this tile's start
        tile_idx = jax.lax.axis_index("tile")
        hh, ww = gp.shape[:2]
        ii = (jax.lax.broadcasted_iota(jnp.float32, (hh, ww), 0)
              + tile_idx * (h // 8) - halo)
        jj = jax.lax.broadcasted_iota(jnp.float32, (hh, ww), 1)
        ref = jnp.concatenate(
            [gp * 4.0, (ii / sigma_pos)[..., None], (jj / sigma_pos)[..., None]],
            axis=-1,
        ).reshape(hh * ww, -1)
        plan = build_plan(ref)
        out = apply_plan(plan, sp.reshape(hh * ww, -1)).reshape(hh, ww, -1)
        return out[halo:-halo]

    tiled_out = np.asarray(
        jax.jit(
            shard_map(local, mesh=mesh, in_specs=(P("tile"), P("tile")),
                      out_specs=P("tile"), check_vma=False)
        )(src, img)
    )
    # the zero-halo edges of the outermost tiles differ; compare interior
    rel = np.abs(tiled_out[halo:-halo] - global_out[halo:-halo]) / (
        np.abs(global_out[halo:-halo]).max() + 1e-9
    )
    assert rel.max() < 0.05, rel.max()


def test_data_parallel_grads_match_single_device(rng):
    mesh = make_mesh(data=8, tile=1)
    X = jnp.asarray(rng.randn(32, 4))
    y = jnp.asarray(rng.randn(32))
    w0 = jnp.zeros((4,))

    def loss(w, xb, yb):
        return jnp.mean((xb @ w - yb) ** 2)

    g_single = np.asarray(jax.grad(loss)(w0, X, y))

    def sharded_grad(w, xb, yb):
        g = jax.grad(loss)(w, xb, yb)
        return jax.lax.pmean(g, "data")

    g_dp = np.asarray(
        jax.jit(
            shard_map(sharded_grad, mesh=mesh, in_specs=(P(), P("data"), P("data")),
                      out_specs=P(), check_vma=False)
        )(w0, X, y)
    )
    np.testing.assert_allclose(g_dp, g_single, rtol=1e-10, atol=1e-12)


def test_tiled_stereo_pipeline_matches_untiled(rng):
    from depth_estimation_tpu.models.pipeline import CRFStereoConfig, crf_stereo_infer
    from depth_estimation_tpu.parallel.stereo_tiled import crf_stereo_infer_tiled
    from depth_estimation_tpu.data.synthetic import make_stereo_pair

    left, right, _ = make_stereo_pair(np.random.RandomState(5), h=64, w=48, max_disp=6)
    left = jnp.asarray(left, jnp.float32)
    right = jnp.asarray(right, jnp.float32)
    cfg = CRFStereoConfig(num_disp=8, niters=3, sigma_pos=0.05)
    mesh = make_mesh(data=1, tile=4)

    untiled = np.asarray(crf_stereo_infer(left, right, cfg)["disparity"])
    tiled = np.asarray(
        jax.jit(
            lambda l, r: crf_stereo_infer_tiled(l, r, cfg, mesh, halo=16)
        )(left, right)
    )
    assert tiled.shape == untiled.shape
    # interior agreement (outer image edges see different zero-padding)
    diff = np.abs(tiled[8:-8] - untiled[8:-8])
    assert diff.mean() < 0.1, diff.mean()
    assert np.median(diff) < 0.02


@pytest.mark.slow
def test_tiled_stereo_flagship_halo_gate():
    """Committed halo bound (BENCH_SUITE tiled_stereo_flagship_halo):
    halo ~ sigma_p*diag (48 px at Tsukuba scale) keeps the 4-stripe tiled
    pipeline within the untiled quality gates on the REAL pair."""
    from depth_estimation_tpu.data.datasets import TsukubaPair
    from depth_estimation_tpu.models.pipeline import (CRFStereoConfig,
                                                      calibrate_capacity,
                                                      crf_stereo_infer)
    from depth_estimation_tpu.parallel.stereo_tiled import crf_stereo_infer_tiled
    from depth_estimation_tpu.train.metrics import bad_pixel_ratio, epe

    tsu = TsukubaPair()
    if not tsu.available():
        pytest.skip("Tsukuba pair not on disk")
    item = tsu.load()
    left = jnp.asarray(item["left"], jnp.float32)
    right = jnp.asarray(item["right"], jnp.float32)
    gt = jnp.asarray(item["disparity"], jnp.float32)
    mask = (gt > 0).astype(jnp.float32)
    cfg = calibrate_capacity(
        left, CRFStereoConfig(num_disp=16, niters=5, backend="lattice"),
        headroom=3.0, tiled=False)
    un = crf_stereo_infer(left, right, cfg)["disparity"]
    mesh = make_mesh(data=1, tile=4)
    ti = jax.jit(
        lambda l, r: crf_stereo_infer_tiled(l, r, cfg, mesh, halo=48)
    )(left, right)
    bad2_delta = abs(float(bad_pixel_ratio(ti, gt, 2.0, mask))
                     - float(bad_pixel_ratio(un, gt, 2.0, mask)))
    assert bad2_delta < 0.006, bad2_delta
    assert float(jnp.abs(ti[8:-8] - un[8:-8]).mean()) < 0.26
    assert abs(float(epe(ti, gt, mask)) - float(epe(un, gt, mask))) < 0.05
