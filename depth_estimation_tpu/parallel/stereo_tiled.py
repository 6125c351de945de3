"""Spatially-tiled end-to-end stereo CRF (BASELINE config #4).

Full-resolution frames whose pixel count exceeds one chip's comfort zone
are row-striped over the mesh 'tile' axis; each device runs the complete
pipeline — cost volume, bilateral guide with GLOBAL pixel coordinates,
per-stripe lattice plan, mean-field iterations — on a halo-padded stripe,
then discards the halo. Boundary coupling is overlap-and-discard (the
bilateral position kernel is short-range: σp pixels; truncation error
decays as exp(-halo²/2σp²)) with one `ppermute` neighbor exchange per
input, zero communication inside the solve.

Matches `models.pipeline.crf_stereo_infer` on the interior to the halo
truncation tolerance (gated by tests on the virtual mesh).

Halo sizing (round-5 measurement, BENCH_SUITE.json
`tiled_stereo_flagship_halo`, real Tsukuba at flagship σp=0.1): the
bilateral position kernel couples ~σp·diag pixels (≈48 px at Tsukuba
scale), so halos well below that DO change the solution (mean |Δdisp|
0.37 at halo 8, 0.30 at 16) while quality-vs-GT stays within ~1.3 bad2
points of untiled; halo ≈ σp·diag recovers untiled quality (bad2 5.80%
vs 5.45% at halo 48, mean |Δdisp| 0.23). Pick halo ≥ σp·√(h²+w²) when
cross-stripe parity matters; the default 16 favors throughput.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P
from jax import shard_map

from ..crf.compat import charbonnier2, compatibility_matrix
from ..crf.meanfield import mean_field_infer
from ..models.pipeline import CRFStereoConfig, stereo_unary
from ..ops.costvolume import expected_disparity
from ..ops.permutohedral import apply_plan, build_plan
from .tiling import halo_exchange_rows

__all__ = ["crf_stereo_infer_tiled"]


def crf_stereo_infer_tiled(
    left: jax.Array,
    right: jax.Array,
    cfg: CRFStereoConfig,
    mesh,
    halo: int = 16,
    axis: str = "tile",
):
    """Row-striped pipeline; in/out sharded over `axis`. Returns (h, w)."""
    h, w, _ = left.shape
    num_tiles = mesh.shape[axis]
    assert h % num_tiles == 0, (h, num_tiles)
    local_h = h // num_tiles
    diag = (h**2 + w**2) ** 0.5

    labels = jnp.arange(cfg.num_disp, dtype=left.dtype)
    Mu = compatibility_matrix(lambda a, b: charbonnier2(a, b, cfg.gamma), labels)
    Mu = Mu * cfg.mu_scale

    def local(left_l, right_l):
        lp = halo_exchange_rows(left_l, halo, axis)
        rp = halo_exchange_rows(right_l, halo, axis)
        hh, ww = lp.shape[:2]

        E0 = stereo_unary(lp, rp, cfg)  # (hh, ww, L)

        # bilateral guide with GLOBAL positions (same normalization as the
        # untiled pipeline so lattice keys align across stripes)
        tile_idx = jax.lax.axis_index(axis)
        row0 = tile_idx * local_h - halo
        ii = jax.lax.broadcasted_iota(left.dtype, (hh, ww), 0) + row0
        jj = jax.lax.broadcasted_iota(left.dtype, (hh, ww), 1)
        pos = jnp.stack([ii, jj], -1) / diag
        guide = jnp.concatenate([lp / cfg.sigma_color, pos / cfg.sigma_pos], -1)

        ref = guide.reshape(hh * ww, -1)
        cap = cfg.max_vertices
        if cap is None:
            cap = min(1 << (2 * hh * ww - 1).bit_length(), hh * ww * (ref.shape[1] + 1))
        plan = build_plan(ref, max_vertices=cap)
        plan = jax.lax.optimization_barrier(plan)  # no per-iter remat (r5)
        message_fn = lambda Q: apply_plan(plan, Q) - Q

        Q = mean_field_infer(E0.reshape(hh * ww, -1), message_fn, Mu, cfg.niters)
        disp = expected_disparity(jnp.log(Q + 1e-20)).reshape(hh, ww)
        return disp[halo:-halo]

    spec = P(axis, None, None)
    out = shard_map(
        local, mesh=mesh, in_specs=(spec, spec), out_specs=P(axis, None),
        check_vma=False,
    )(left, right)
    return out
