"""Config-#4 (tiled multi-chip stereo) measurement — BASELINE's tile-
parallel flagship path, `parallel/stereo_tiled.py`.

Two studies (VERDICT r4 #5: this path had no committed measurement):

  halo  (CPU, 8 virtual devices): run the REAL Tsukuba pair at flagship
        scale/σp through `crf_stereo_infer_tiled` on a 4-stripe mesh for
        a sweep of halo sizes; report interior disparity deltas vs the
        untiled pipeline and the EPE-vs-GT delta. The bilateral position
        kernel couples ~σp·diag pixels, so this pins which halo bounds
        the overlap-and-discard truncation below the quality gates.

  time  (real TPU, 1 chip): middlebury64-scale frame (994×1482, L=64)
        through the tiled path on a degenerate 1-device 'tile' mesh vs
        the untiled pipeline — the per-chip overhead of the shard_map +
        halo-exchange wrapper (the cross-chip ICI term is unmeasurable
        in this 1-chip container; the sharding itself is validated on
        the virtual mesh by tests/test_sharding.py).

Usage: python tools/tiled_stereo_study.py --mode halo|time
Writes results into BENCH_SUITE.json under 'tiled_stereo_*' unless
--no-write.
"""
from __future__ import annotations

import argparse
import json
import os
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)


def run_halo(args) -> dict:
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np

    from depth_estimation_tpu.data.datasets import TsukubaPair
    from depth_estimation_tpu.models.pipeline import (CRFStereoConfig,
                                                      calibrate_capacity,
                                                      crf_stereo_infer)
    from depth_estimation_tpu.parallel.mesh import make_mesh
    from depth_estimation_tpu.parallel.stereo_tiled import crf_stereo_infer_tiled
    from depth_estimation_tpu.train.metrics import bad_pixel_ratio, epe

    item = TsukubaPair().load()
    left = jnp.asarray(item["left"], jnp.float32)
    right = jnp.asarray(item["right"], jnp.float32)
    gt = jnp.asarray(item["disparity"], jnp.float32)
    mask = (gt > 0).astype(jnp.float32)
    cfg = calibrate_capacity(
        left, CRFStereoConfig(num_disp=16, niters=5, backend="lattice"),
        headroom=3.0, tiled=False,
    )
    untiled = crf_stereo_infer(left, right, cfg)["disparity"]
    base_epe = float(epe(untiled, gt, mask))
    base_bad2 = float(bad_pixel_ratio(untiled, gt, 2.0, mask))
    mesh = make_mesh(data=1, tile=args.tiles)
    res = {"config": "tiled_stereo_flagship_halo", "tiles": args.tiles,
           "untiled_epe": round(base_epe, 4),
           "untiled_bad2": round(base_bad2, 4), "halos": {}}
    un = np.asarray(untiled)
    for halo in (8, 16, 32, 48):
        tiled = jax.jit(
            lambda l, r: crf_stereo_infer_tiled(l, r, cfg, mesh, halo=halo)
        )(left, right)
        t = np.asarray(tiled)
        interior = slice(8, -8)
        diff = np.abs(t[interior] - un[interior])
        res["halos"][halo] = {
            "max_abs_disp_delta": round(float(diff.max()), 4),
            "mean_abs_disp_delta": round(float(diff.mean()), 5),
            "epe": round(float(epe(jnp.asarray(t), gt, mask)), 4),
            "bad2": round(float(bad_pixel_ratio(jnp.asarray(t), gt, 2.0, mask)), 4),
        }
    return res


def run_time(args) -> dict:
    import jax

    for flag, val in (("jax_compilation_cache_dir", "/tmp/det_jax_ccache"),
                      ("jax_persistent_cache_min_compile_time_secs", 0.0),
                      ("jax_persistent_cache_min_entry_size_bytes", 0)):
        try:
            jax.config.update(flag, val)
        except Exception:
            pass
    import jax.numpy as jnp
    import numpy as np

    from depth_estimation_tpu.data.synthetic import make_stereo_pair
    from depth_estimation_tpu.models.pipeline import (CRFStereoConfig,
                                                      crf_stereo_infer)
    from depth_estimation_tpu.ops.permutohedral import suggest_capacity
    from depth_estimation_tpu.crf.guides import stack_guide
    from depth_estimation_tpu.parallel.mesh import make_mesh
    from depth_estimation_tpu.parallel.stereo_tiled import crf_stereo_infer_tiled
    from depth_estimation_tpu.utils.timing import jitter, loop_timer, scalarize

    h, w, L = (96, 128, 16) if args.small else (994, 1482, 64)
    left, right, _ = make_stereo_pair(
        np.random.RandomState(0), h, w, num_layers=6, max_disp=L - 2)
    left = jnp.asarray(left, jnp.float32)
    right = jnp.asarray(right, jnp.float32)
    cfg0 = CRFStereoConfig(num_disp=L, niters=5, backend="lattice")
    ref = stack_guide(left, cfg0.sigma_color, cfg0.sigma_pos).reshape(h * w, -1)
    from dataclasses import replace

    cfg = replace(cfg0, max_vertices=suggest_capacity(ref, headroom=3.0))
    mesh = make_mesh(data=1, tile=1)

    def t_untiled(a):
        out = crf_stereo_infer(jitter(left, a), right, cfg)["disparity"]
        return a + scalarize(out)

    def t_tiled(a):
        out = crf_stereo_infer_tiled(jitter(left, a), right, cfg, mesh,
                                     halo=args.halo)
        return a + scalarize(out)

    dt_u = loop_timer(t_untiled, reps=args.reps)
    dt_t = loop_timer(t_tiled, reps=args.reps)
    return {"config": "tiled_stereo_middlebury", "halo": args.halo,
            "untiled_ms": round(dt_u * 1e3, 2),
            "tiled_1chip_ms": round(dt_t * 1e3, 2),
            "overhead_pct": round(100.0 * (dt_t / dt_u - 1.0), 1),
            "unit": f"ms ({h}x{w}, L={L}, 1-device 'tile' mesh)",
            "device": str(jax.devices()[0])}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--mode", choices=("halo", "time"), required=True)
    ap.add_argument("--tiles", type=int, default=4)
    ap.add_argument("--halo", type=int, default=16)
    ap.add_argument("--reps", type=int, default=4)
    ap.add_argument("--small", action="store_true")
    ap.add_argument("--no-write", action="store_true")
    args = ap.parse_args()
    res = run_halo(args) if args.mode == "halo" else run_time(args)
    print(json.dumps(res))
    if not args.no_write:
        path = os.path.join(ROOT, "BENCH_SUITE.json")
        merged = {}
        try:
            with open(path) as f:
                merged = json.load(f)
        except (OSError, ValueError):
            pass
        merged[res["config"]] = res
        with open(path, "w") as f:
            json.dump(merged, f, indent=1)


if __name__ == "__main__":
    main()
