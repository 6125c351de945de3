"""Benchmark CLI — one JSON line for the driver.

Headline metric: permutohedral-lattice mean-field CRF iterations per second
per chip on the Tsukuba-scale flagship config (384×288 px, 16 labels, 5-D
bilateral guide, 5 mean-field iterations) — the reference's canonical
pipeline (`Experiments/DenseCrf.ipynb`; `benchmarking.ipynb` times exactly
this fwd pass, unpublished — SURVEY.md §6).

`vs_baseline`: the reference publishes no numbers for the CRF pipeline
(BASELINE.json.published == {}), so we report speedup against this repo's
own dense O(n²) oracle executing the mathematically identical mean-field
update on the same device class. The oracle time comes from the committed
`BENCH_SUITE.json` (config `tsukuba_dense`, measured on the same TPU);
pass --dense-baseline to re-measure it live instead (adds one more TPU
compile to the run).

Reliability design (this container's axon TPU relay wedges ~50% of process
starts and remote compiles take minutes — CLAUDE.md):
  * the parent re-execs itself as a measurement worker under a deadline
    and retries, so one wedge doesn't kill the invocation;
  * capacity calibration (occupancy count + piece count) runs ONCE in a
    CPU-only subprocess and is cached in /tmp across attempts AND across
    driver retries — the measurement worker compiles exactly TWO TPU
    programs (5-iter and 1-iter pipeline), none of the calibration ones;
  * the persistent XLA compilation cache is enabled so a retried worker
    reuses executables compiled by a prior attempt when the backend
    supports serialization;
  * all timings are FETCH-anchored (utils/timing.py): this relay's
    `block_until_ready` returns without waiting for the device, so naive
    wall-clock loops measure Python dispatch (0.05 ms "pipelines").

Usage: python bench.py [--device cpu|tpu] [--labels L] [--niters N]
       A/B switches: --headroom F --pieces {0,1} --order-by-sum {0,1}
"""
from __future__ import annotations

import argparse
import hashlib
import json
import os
import subprocess
import sys
import time

import numpy as np

ROOT = os.path.dirname(os.path.abspath(__file__))
TOTAL_BUDGET_S = 660  # worst-case wall clock for the worker retry loop
# first attempt gets a cold-compile window; retries run against the warm
# persistent executable cache and only need init + execute
ATTEMPT_TIMEOUTS_S = (300, 180)


def _argparser():
    ap = argparse.ArgumentParser()
    ap.add_argument("--device", default=None, help="force jax platform")
    ap.add_argument("--labels", type=int, default=16)
    ap.add_argument("--niters", type=int, default=5)
    ap.add_argument("--h", type=int, default=288)
    ap.add_argument("--w", type=int, default=384)
    ap.add_argument("--reps", type=int, default=10)
    ap.add_argument("--headroom", type=float, default=3.0,
                    help="capacity headroom over measured lattice occupancy")
    ap.add_argument("--pieces", type=int, default=0, choices=(0, 1),
                    help="enable the piece-splat tables (default 0: "
                         "entry-wise splat — the round-2 validated config)")
    ap.add_argument("--order-by-sum", type=int, default=0, choices=(0, 1),
                    help="prepend the coord-sum radix column to plan sorts")
    ap.add_argument("--tiled", type=int, default=2, choices=(0, 1, 2),
                    help="tiled MXU splat/slice (32px image blocks, dense "
                         "per-tile incidence matmuls); 2 = bfloat16 blocks "
                         "(default — r4 A/B: 175.4 iters/s vs 167.1 entry)")
    ap.add_argument("--unroll", type=int, default=1, choices=(0, 1),
                    help="unroll mean-field iterations instead of lax.scan "
                         "(default 1 — the scanned loop measured ~0.7 "
                         "ms/iter of scheduling overhead, round-4/5)")
    ap.add_argument("--fused", type=int, default=1, choices=(0, 1),
                    help="Pallas fused per-iteration elementwise update "
                         "(default 1 — r5 A/B: 393.2 iters/s combined "
                         "with bf16 vs 373.2 without)")
    ap.add_argument("--dtype", default="bf16", choices=("f32", "bf16"),
                    help="mean-field state dtype (default bf16: halves "
                         "per-pass traffic; real-Tsukuba quality gate "
                         "EPE 0.7555/bad2 5.46 vs f32 0.7554/5.40)")
    ap.add_argument("--sort-mode", default=None,
                    help="override the calibrated plan sort strategy "
                         "(auto|packed1|packed2|lex)")
    ap.add_argument("--tile-px", type=int, default=32,
                    help="tiled MXU image-block edge in pixels")
    ap.add_argument("--dense-baseline", action="store_true",
                    help="measure the dense O(n²) oracle live for "
                         "vs_baseline (extra TPU compile); default reads "
                         "the committed BENCH_SUITE.json number")
    ap.add_argument("--no-supervise", action="store_true",
                    help="run in-process (no wedge-watchdog subprocess)")
    return ap


def _calib_key(args) -> str:
    raw = json.dumps([args.h, args.w, args.labels, args.headroom,
                      bool(args.pieces), bool(args.tiled), args.tile_px],
                     sort_keys=True)
    return hashlib.md5(raw.encode()).hexdigest()[:16]


def _calib_path(args) -> str:
    return f"/tmp/det_bench_calib_{_calib_key(args)}.json"


def _load_inputs(args):
    """(left, right) jnp arrays — real Tsukuba at flagship shape."""
    import jax.numpy as jnp

    from depth_estimation_tpu.data.datasets import TsukubaPair

    tsu = TsukubaPair()
    if tsu.available() and (args.h, args.w) == (288, 384):
        item = tsu.load()
        return (jnp.asarray(item["left"], jnp.float32),
                jnp.asarray(item["right"], jnp.float32))
    rng = np.random.RandomState(0)
    return (jnp.asarray(rng.rand(args.h, args.w, 3), jnp.float32),
            jnp.asarray(rng.rand(args.h, args.w, 3), jnp.float32))


def _calibrate(args) -> dict:
    """CPU-side capacity calibration (runs in the CPU-only subprocess)."""
    import jax

    jax.config.update("jax_platforms", "cpu")  # FIRST jax call: no relay
    from depth_estimation_tpu.models.pipeline import (CRFStereoConfig,
                                                      calibrate_capacity)

    left, _ = _load_inputs(args)
    cfg = CRFStereoConfig(num_disp=args.labels, niters=args.niters,
                          backend="lattice")
    cfg = calibrate_capacity(left, cfg, headroom=args.headroom,
                             pieces=bool(args.pieces), tiled=bool(args.tiled),
                             tile_px=args.tile_px)
    return {"max_vertices": cfg.max_vertices, "max_pieces": cfg.max_pieces,
            "tile_px": cfg.tile_px, "tile_u": cfg.tile_u,
            "sort_mode": cfg.sort_mode}


def _calib_main(args) -> int:
    print(json.dumps(_calibrate(args)))
    return 0


def _get_calibration(args) -> dict | None:
    """Supervisor-side: cached CPU calibration (one subprocess, reused
    across bench attempts and driver retries)."""
    path = _calib_path(args)
    try:
        with open(path) as f:
            return json.load(f)
    except (OSError, ValueError):
        pass
    env = dict(os.environ, DET_BENCH_CALIB="1")
    try:
        proc = subprocess.run(
            [sys.executable, os.path.abspath(__file__), *sys.argv[1:]],
            env=env, timeout=240, capture_output=True, text=True)
    except subprocess.TimeoutExpired:
        print("bench calibration timed out", file=sys.stderr)
        return None
    line = next((l for l in proc.stdout.splitlines() if l.startswith("{")),
                None)
    if proc.returncode != 0 or not line:
        print("bench calibration failed:\n" + proc.stderr[-2000:],
              file=sys.stderr)
        return None
    calib = json.loads(line)
    try:
        with open(path, "w") as f:
            json.dump(calib, f)
    except OSError:
        pass
    return calib


def _supervised_main(args) -> int:
    """Run the benchmark in a worker subprocess under a total deadline."""
    calib = _get_calibration(args)
    env = dict(os.environ, DET_BENCH_WORKER="1")
    if calib:
        env["DET_BENCH_CALIB_JSON"] = json.dumps(calib)
    deadline = time.monotonic() + TOTAL_BUDGET_S
    attempt = 0
    while True:
        attempt += 1
        remaining = deadline - time.monotonic()
        if remaining < 120:
            print(f"bench: budget exhausted after {attempt - 1} attempts",
                  file=sys.stderr)
            return 1
        att_timeout = ATTEMPT_TIMEOUTS_S[min(attempt - 1,
                                             len(ATTEMPT_TIMEOUTS_S) - 1)]
        try:
            proc = subprocess.run(
                [sys.executable, os.path.abspath(__file__), *sys.argv[1:]],
                env=env,
                timeout=min(att_timeout, remaining),
                capture_output=True,
                text=True,
            )
        except subprocess.TimeoutExpired:
            print(f"bench worker timed out (attempt {attempt})",
                  file=sys.stderr)
            continue
        line = next(
            (l for l in proc.stdout.splitlines() if l.startswith("{")), None
        )
        if proc.returncode == 0 and line:
            print(line)
            return 0
        print(
            f"bench worker failed rc={proc.returncode} (attempt {attempt}):\n"
            + proc.stderr[-2000:],
            file=sys.stderr,
        )


def _suite_dense_ms(device_str: str, args) -> float | None:
    """Committed dense-oracle pipeline time matching this device class AND
    this problem shape — a vs_baseline against a mismatched-shape oracle
    is meaningless, so shape mismatch returns None (vs_baseline omitted)."""
    try:
        with open(os.path.join(ROOT, "BENCH_SUITE.json")) as f:
            suite = json.load(f)
        entry = suite["tsukuba_dense"]
        same_class = ("TPU" in entry.get("device", "")) == ("TPU" in device_str)
        shape = (args.h, args.w, args.labels, args.niters)
        if "h" in entry:
            same_shape = shape == (entry["h"], entry["w"], entry["labels"],
                                   entry["niters"])
        else:  # legacy entry without shape fields: it was the default config
            same_shape = shape == (288, 384, 16, 5)
        if entry.get("metric") == "pipeline_ms" and same_class and same_shape:
            return float(entry["value"])
    except (OSError, ValueError, KeyError):
        pass
    return None


def main():
    args = _argparser().parse_args()

    import jax

    if args.device:
        jax.config.update("jax_platforms", args.device)
    if args.device != "cpu":
        # persistent executable cache for TPU worker retries. NOT on CPU:
        # XLA:CPU AOT entries bake in compile-machine vector features and
        # reload with a SIGILL warning on mismatch (observed here).
        for flag, val in (("jax_compilation_cache_dir", "/tmp/det_jax_ccache"),
                          ("jax_persistent_cache_min_compile_time_secs", 0.0),
                          ("jax_persistent_cache_min_entry_size_bytes", 0)):
            try:
                jax.config.update(flag, val)
            except Exception:
                pass  # older jax: cache flags absent — correctness unaffected
    import jax.numpy as jnp  # noqa: F401  (backend init happens lazily)

    from depth_estimation_tpu.models.pipeline import (CRFStereoConfig,
                                                      crf_stereo_infer)

    h, w = args.h, args.w
    cfg = CRFStereoConfig(num_disp=args.labels, niters=args.niters,
                          backend="lattice",
                          order_by_sum=bool(args.order_by_sum))
    left, right = _load_inputs(args)

    # Tight static lattice capacity: measured occupancy + headroom (done
    # once on the CPU backend by the supervisor — the library serving path
    # does the same via StereoServer auto-calibration). Natural images
    # occupy ~0.04n vertices, ~50x under the safe pow2 ≥ 2n default.
    calib_json = os.environ.get("DET_BENCH_CALIB_JSON")
    if calib_json:
        calib = json.loads(calib_json)
    else:
        from dataclasses import replace as _r

        calib = _calibrate(args) if args.device == "cpu" else None
        if calib is None:  # in-process TPU fallback (--no-supervise)
            from depth_estimation_tpu.models.pipeline import calibrate_capacity

            cfg = calibrate_capacity(left, cfg, headroom=args.headroom,
                                     pieces=bool(args.pieces),
                                     tiled=bool(args.tiled),
                                     tile_px=args.tile_px)
            calib = {"max_vertices": cfg.max_vertices,
                     "max_pieces": cfg.max_pieces,
                     "tile_px": cfg.tile_px, "tile_u": cfg.tile_u,
                     "sort_mode": cfg.sort_mode}
    from dataclasses import replace

    cfg = replace(cfg, max_vertices=calib["max_vertices"],
                  max_pieces=calib["max_pieces"] if args.pieces else None,
                  tile_px=calib.get("tile_px") if args.tiled else None,
                  tile_u=calib.get("tile_u") or 512,
                  tile_bf16=args.tiled == 2,
                  sort_mode=args.sort_mode or calib.get("sort_mode", "auto"),
                  unroll=bool(args.unroll), compute_dtype=args.dtype,
                  fused_update=bool(args.fused))

    # Fetch-anchored in-jit loop timing (utils/timing.py): on this relay
    # `block_until_ready` returns without waiting for the device, so the
    # reps run as ONE fori_loop chain whose final 4-byte fetch is the only
    # synchronization; differencing trip counts cancels fetch AND dispatch
    # overhead — pure device pipeline time.
    from depth_estimation_tpu.utils.timing import jitter, loop_timer

    def _pipe_body(c):
        def body(a):
            out = crf_stereo_infer(jitter(left, a), right, c)["disparity"]
            return a + jnp.sum(out, dtype=jnp.float32)

        return body

    dt = loop_timer(_pipe_body(cfg), reps=args.reps)
    iters_per_s = args.niters / dt

    # Per-iteration cost + HBM roofline fraction: difference the pipeline
    # at niters and niters+4 — BOTH programs overlap the plan-build/cost-
    # volume prologue with iterations identically, so the difference is
    # the steady-state marginal mean-field update (differencing against a
    # 1-iteration program attributed the prologue-overlap loss to the
    # iterations: round-5 measured 2.15 "iter_ms" vs 0.79 isolated).
    from depth_estimation_tpu.utils.profiling import roofline

    iter_ms = None
    roofline_fraction = None
    if args.niters > 1:
        extra = 4
        cfg1 = replace(cfg, niters=args.niters + extra)
        dtn = loop_timer(_pipe_body(cfg1), reps=args.reps)
        iter_s = max(dtn - dt, 1e-9) / extra
        iter_ms = iter_s * 1e3
        if iter_ms < 1e-3:  # timing noise swamped the difference
            iter_ms = None
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
        if iter_ms is not None:
            roofline_fraction = roofline(iter_s, traffic)["hbm_fraction"]

    device_str = str(jax.devices()[0])
    vs_baseline = None
    vs_source = None
    if args.dense_baseline:
        dense_cfg = CRFStereoConfig(
            num_disp=args.labels, niters=args.niters, backend="dense"
        )
        dtd = loop_timer(_pipe_body(dense_cfg), reps=3)
        vs_baseline = dtd / dt  # lattice speedup over exact dense oracle
        vs_source = "dense oracle measured live"
    else:
        dense_ms = _suite_dense_ms(device_str, args)
        if dense_ms is not None:
            vs_baseline = (dense_ms / 1e3) / dt
            vs_source = "dense oracle from committed BENCH_SUITE.json"

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
                    "device": device_str,
                    "niters": args.niters,
                    "max_vertices": cfg.max_vertices,
                    "max_pieces": cfg.max_pieces,
                    "order_by_sum": cfg.order_by_sum,
                    "tile_px": cfg.tile_px,
                    "tile_u": cfg.tile_u if cfg.tile_px else None,
                    "sort_mode": cfg.sort_mode,
                    "unroll": cfg.unroll,
                    "vs_baseline_source": vs_source,
                },
            }
        )
    )


if __name__ == "__main__":
    if os.environ.get("DET_BENCH_CALIB") == "1":
        sys.exit(_calib_main(_argparser().parse_args()))
    elif os.environ.get("DET_BENCH_WORKER") == "1" or "--no-supervise" in sys.argv:
        main()
    else:
        sys.exit(_supervised_main(_argparser().parse_args()))
