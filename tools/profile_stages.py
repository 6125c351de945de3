"""Per-stage TPU timing for the flagship CRF pipeline.

Times each lattice stage (embed, plan build, splat, blur, slice, apply,
full pipeline) as a separately jitted program so optimization work targets
the measured bottleneck, not the assumed one — the TPU counterpart of the
reference's embedded stage timers (`crf/lattice/lite/permutohedral.h:313-318`,
`cuda_lattice/permutohedral.cu:506-518`).

Usage:  python tools/profile_stages.py [--device tpu] [--reps 20]
Emits one JSON line with per-stage milliseconds.

Like bench.py, a supervisor re-execs this as a worker with a timeout: the
axon TPU relay in this container intermittently blocks process start.
"""
from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _supervised() -> int:
    env = dict(os.environ, DET_PROF_WORKER="1")
    for attempt in range(4):
        try:
            proc = subprocess.run(
                [sys.executable, os.path.abspath(__file__), *sys.argv[1:]],
                env=env, timeout=900, capture_output=True, text=True)
        except subprocess.TimeoutExpired:
            print(f"profile worker timed out (attempt {attempt + 1})",
                  file=sys.stderr)
            continue
        line = next((l for l in proc.stdout.splitlines() if l.startswith("{")),
                    None)
        if proc.returncode == 0 and line:
            print(line)
            return 0
        print(f"worker rc={proc.returncode} (attempt {attempt + 1}):\n"
              + proc.stderr[-2000:], file=sys.stderr)
    return 1


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--device", default=None)
    ap.add_argument("--labels", type=int, default=16)
    ap.add_argument("--reps", type=int, default=20)
    ap.add_argument("--h", type=int, default=288)
    ap.add_argument("--w", type=int, default=384)
    args = ap.parse_args()

    import jax

    if args.device:
        jax.config.update("jax_platforms", args.device)
    import jax.numpy as jnp
    import numpy as np

    from depth_estimation_tpu.crf.guides import stack_guide
    from depth_estimation_tpu.data.datasets import TsukubaPair
    from depth_estimation_tpu.models.pipeline import CRFStereoConfig, crf_stereo_infer
    from depth_estimation_tpu.ops import permutohedral as P
    from depth_estimation_tpu.ops.costvolume import cost_volume

    h, w, L = args.h, args.w, args.labels
    tsu = TsukubaPair()
    if tsu.available() and (h, w) == (288, 384):
        item = tsu.load()
        left = jnp.asarray(item["left"], jnp.float32)
        right = jnp.asarray(item["right"], jnp.float32)
    else:
        rng = np.random.RandomState(0)
        left = jnp.asarray(rng.rand(h, w, 3), jnp.float32)
        right = jnp.asarray(rng.rand(h, w, 3), jnp.float32)

    cfg0 = CRFStereoConfig(num_disp=L, niters=5, backend="lattice")
    ref = stack_guide(left, cfg0.sigma_color, cfg0.sigma_pos).reshape(h * w, -1)
    cap = P.suggest_capacity(ref, headroom=3.0)

    from dataclasses import replace
    cfg = replace(cfg0, max_vertices=cap)

    def timeit(fn, *xs, reps=args.reps):
        out = fn(*xs)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        for _ in range(reps):
            out = fn(*xs)
        jax.block_until_ready(out)
        return (time.perf_counter() - t0) / reps * 1e3

    results = {"device": str(jax.devices()[0]), "capacity": int(cap)}

    # stages
    embed = jax.jit(lambda r: P._simplex_embed_cols(r))
    results["embed_ms"] = timeit(embed, ref)

    build = jax.jit(lambda r: P.build_plan(r, max_vertices=cap))
    results["plan_build_ms"] = timeit(build, ref)

    plan = build(ref)
    jax.block_until_ready(plan)
    src = jnp.asarray(np.random.RandomState(1).rand(h * w, L), jnp.float32)

    splat = jax.jit(P._splat)
    results["splat_ms"] = timeit(splat, plan, src)

    vals = splat(plan, src)
    jax.block_until_ready(vals)
    blur = jax.jit(lambda p, v: P._blur(p, v, False))
    results["blur_ms"] = timeit(blur, plan, vals)

    blurred = blur(plan, vals)
    jax.block_until_ready(blurred)
    slc = jax.jit(P._slice)
    results["slice_ms"] = timeit(slc, plan, blurred)

    apply_fn = jax.jit(lambda p, s: P.apply_plan(p, s))
    results["apply_ms"] = timeit(apply_fn, plan, src)

    cv = jax.jit(lambda l, r: cost_volume(l, r, L, cfg.window_size))
    results["costvolume_ms"] = timeit(cv, left, right)

    pipe = jax.jit(lambda l, r: crf_stereo_infer(l, r, cfg)["disparity"])
    results["pipeline_ms"] = timeit(pipe, left, right)

    for k, v in results.items():
        if isinstance(v, float):
            results[k] = round(v, 3)
    print(json.dumps(results))


if __name__ == "__main__":
    if os.environ.get("DET_PROF_WORKER") == "1" or "--no-supervise" in sys.argv:
        main()
    else:
        sys.exit(_supervised())
