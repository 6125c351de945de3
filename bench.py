"""Benchmark CLI — one JSON line for the driver.

Headline metric: permutohedral-lattice mean-field CRF iterations per second
per chip on the Tsukuba-scale flagship config (384×288 px, 16 labels, 5-D
bilateral guide, 5 mean-field iterations) — the reference's canonical
pipeline (`Experiments/DenseCrf.ipynb`; `benchmarking.ipynb` times exactly
this fwd pass, unpublished — SURVEY.md §6).

`vs_baseline`: the reference publishes no numbers for the CRF pipeline
(BASELINE.json.published == {}), so we report speedup against this repo's
own dense O(n²) oracle executing the mathematically identical mean-field
update on the same device — the honest stand-in for the reference's
"brute-force vs lattice" trade (`crf/crf_module.py:8-20` vs lattice path).

Usage: python bench.py [--device cpu|tpu] [--labels L] [--iters N]
"""
from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

import numpy as np


def _supervised_main() -> int:
    """Run the benchmark in a worker subprocess with retries.

    The TPU backend in this container initializes through a remote relay
    that intermittently blocks forever (~50% of process starts). The
    parent re-execs itself as a worker with a timeout and retries, so a
    single `python bench.py` invocation is wedge-resistant.
    """
    env = dict(os.environ, DET_BENCH_WORKER="1")
    for attempt in range(4):
        try:
            proc = subprocess.run(
                [sys.executable, os.path.abspath(__file__), *sys.argv[1:]],
                env=env,
                timeout=720,
                capture_output=True,
                text=True,
            )
        except subprocess.TimeoutExpired:
            print(f"bench worker timed out (attempt {attempt + 1})", file=sys.stderr)
            continue
        line = next(
            (l for l in proc.stdout.splitlines() if l.startswith("{")), None
        )
        if proc.returncode == 0 and line:
            print(line)
            return 0
        print(
            f"bench worker failed rc={proc.returncode} (attempt {attempt + 1}):\n"
            + proc.stderr[-2000:],
            file=sys.stderr,
        )
    return 1


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--device", default=None, help="force jax platform")
    ap.add_argument("--labels", type=int, default=16)
    ap.add_argument("--niters", type=int, default=5)
    ap.add_argument("--h", type=int, default=288)
    ap.add_argument("--w", type=int, default=384)
    ap.add_argument("--reps", type=int, default=10)
    ap.add_argument("--dense-baseline", action="store_true", default=None,
                    help="also time the dense O(n²) oracle for vs_baseline "
                         "(default: on unless --device cpu)")
    ap.add_argument("--no-dense-baseline", dest="dense_baseline",
                    action="store_false")
    ap.add_argument("--no-supervise", action="store_true",
                    help="run in-process (no wedge-watchdog subprocess)")
    args = ap.parse_args()

    import jax

    if args.device:
        jax.config.update("jax_platforms", args.device)
    import jax.numpy as jnp

    from depth_estimation_tpu.models.pipeline import CRFStereoConfig, crf_stereo_infer
    from depth_estimation_tpu.data.datasets import TsukubaPair

    h, w = args.h, args.w
    cfg = CRFStereoConfig(num_disp=args.labels, niters=args.niters, backend="lattice")

    tsu = TsukubaPair()
    if tsu.available() and (h, w) == (288, 384):
        item = tsu.load()
        left = jnp.asarray(item["left"], jnp.float32)
        right = jnp.asarray(item["right"], jnp.float32)
    else:
        rng = np.random.RandomState(0)
        left = jnp.asarray(rng.rand(h, w, 3), jnp.float32)
        right = jnp.asarray(rng.rand(h, w, 3), jnp.float32)

    # Tight static lattice capacity: measure occupancy once (host-side) and
    # give 3x headroom — natural images occupy ~0.04n vertices, so this
    # shrinks the blur working set ~50x vs the safe default (the library
    # serving path does the same via StereoServer auto-calibration).
    from depth_estimation_tpu.models.pipeline import calibrate_capacity

    cfg = calibrate_capacity(left, cfg, headroom=3.0)

    fn = jax.jit(lambda l, r: crf_stereo_infer(l, r, cfg)["disparity"])
    out = fn(left, right)
    jax.block_until_ready(out)  # compile

    t0 = time.perf_counter()
    for _ in range(args.reps):
        out = fn(left, right)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / args.reps
    iters_per_s = args.niters / dt

    # Per-iteration cost + HBM roofline fraction: time the same pipeline at
    # 1 iteration; the difference isolates (niters-1) mean-field updates
    # from the shared plan-build/cost-volume/decode work.
    from dataclasses import replace as _replace

    from depth_estimation_tpu.utils.profiling import roofline

    iter_ms = None
    roofline_fraction = None
    if args.niters > 1:
        cfg1 = _replace(cfg, niters=1)
        fn1 = jax.jit(lambda l, r: crf_stereo_infer(l, r, cfg1)["disparity"])
        out1 = fn1(left, right)
        jax.block_until_ready(out1)
        t0 = time.perf_counter()
        for _ in range(args.reps):
            out1 = fn1(left, right)
        jax.block_until_ready(out1)
        dt1 = (time.perf_counter() - t0) / args.reps
        iter_s = max(dt - dt1, 1e-9) / (args.niters - 1)
        iter_ms = iter_s * 1e3
        # Essential per-iteration HBM traffic (logical bytes, f32): softmax
        # + Mu matmul + splat gather/reduce + d+1 blur gather-axpy passes +
        # slice gathers + energy update. Implementation padding/waste is
        # deliberately NOT counted — the fraction measures how close the
        # implementation gets to the algorithm's own traffic floor.
        n = h * w
        L = args.labels
        d = 5
        C = cfg.max_vertices or n * (d + 1)
        N = n * (d + 1)
        f = 4
        traffic = (
            2 * n * L * f          # softmax read+write
            + 2 * n * L * f        # Mu matmul
            + (N * L + N * 2 + C * L) * f      # splat: gather + entry meta + vertex write
            + (d + 1) * 4 * C * L * f          # blur: 2 gathers + read + write per axis
            + ((d + 1) * n * L + n * (d + 1) * 2 + n * L) * f  # slice
            + 3 * n * L * f        # adjacency subtract + E0 add + write
        )
        roofline_fraction = roofline(iter_s, traffic)["hbm_fraction"]

    vs_baseline = None
    if args.dense_baseline is None:
        args.dense_baseline = args.device != "cpu"
    if args.dense_baseline:
        dense_cfg = CRFStereoConfig(
            num_disp=args.labels, niters=args.niters, backend="dense"
        )
        fnd = jax.jit(lambda l, r: crf_stereo_infer(l, r, dense_cfg)["disparity"])
        outd = fnd(left, right)
        jax.block_until_ready(outd)
        t0 = time.perf_counter()
        outd = fnd(left, right)
        jax.block_until_ready(outd)
        dtd = time.perf_counter() - t0
        vs_baseline = dtd / dt  # lattice speedup over exact dense oracle

    print(
        json.dumps(
            {
                "metric": "crf_meanfield_iters_per_s",
                "value": round(iters_per_s, 3),
                "unit": f"iters/s/chip ({h}x{w}px, L={args.labels}, d=5 bilateral)",
                "vs_baseline": round(vs_baseline, 3) if vs_baseline else 1.0,
                "detail": {
                    "pipeline_ms": round(dt * 1e3, 3),
                    "iter_ms": round(iter_ms, 3) if iter_ms else None,
                    "roofline_fraction": (
                        round(roofline_fraction, 4) if roofline_fraction else None
                    ),
                    "device": str(jax.devices()[0]),
                    "niters": args.niters,
                },
            }
        )
    )


if __name__ == "__main__":
    if os.environ.get("DET_BENCH_WORKER") == "1" or "--no-supervise" in sys.argv:
        main()
    else:
        sys.exit(_supervised_main())
