"""Per-stage TPU timing for the flagship CRF pipeline.

Times each lattice stage (embed, plan build, splat, blur, slice, apply,
full pipeline) so optimization work targets the measured bottleneck, not
the assumed one — the TPU counterpart of the reference's embedded stage
timers (`crf/lattice/lite/permutohedral.h:313-318`,
`cuda_lattice/permutohedral.cu:506-518`).

Each stage runs as an in-jit fori_loop chain (utils/timing.loop_timer):
this container's relay does not honor block_until_ready, and the loop
form also cancels per-dispatch overhead, so these are pure device stage
times (round 3 discovered standalone dispatches carry ~1.4 ms of relay
overhead each, which had silently inflated every stage number).

Usage:  python tools/profile_stages.py [--device tpu] [--reps 20]
        [--pieces {0,1}] [--order-by-sum {0,1}] [--max-vertices C]
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
    ap.add_argument("--max-vertices", type=int, default=None,
                    help="static capacity (default: 16384 at flagship "
                         "shape, else measured occupancy x3)")
    ap.add_argument("--pieces", type=int, default=0, choices=(0, 1))
    ap.add_argument("--order-by-sum", type=int, default=0, choices=(0, 1))
    ap.add_argument("--tiled", type=int, default=0, choices=(0, 1, 2),
                    help="tiled MXU splat/slice; 2 = bfloat16 blocks")
    ap.add_argument("--tile-px", type=int, default=32,
                    help="image-block edge for the tiled tables")
    ap.add_argument("--tile-u", type=int, default=None,
                    help="per-tile vertex capacity (default: 512 at 32px "
                         "flagship, else calibrated)")
    ap.add_argument("--sort-mode", default="auto",
                    help="plan sort strategy (auto|packed1|packed2|lex)")
    ap.add_argument("--stages", default=None,
                    help="comma list to restrict (embed,plan,splat,blur,"
                         "slice,apply,costvolume,pipeline)")
    args = ap.parse_args()

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
                pass
    import jax.numpy as jnp
    import numpy as np

    from depth_estimation_tpu.crf.guides import stack_guide
    from depth_estimation_tpu.data.datasets import TsukubaPair
    from depth_estimation_tpu.models.pipeline import CRFStereoConfig, crf_stereo_infer
    from depth_estimation_tpu.ops import permutohedral as P
    from depth_estimation_tpu.ops.costvolume import cost_volume
    from depth_estimation_tpu.utils.timing import jitter, loop_timer, scalarize

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

    B = args.tile_px
    tile_u = args.tile_u
    if tile_u is None:
        tile_u = {8: 256, 16: 384, 32: 512}.get(B, 512) \
            if (h, w) == (288, 384) else 512
    tile_kw = {}
    if args.tiled:
        tile_kw = dict(tile_px=B, tile_u=tile_u, tile_bf16=args.tiled == 2)
    cfg0 = CRFStereoConfig(num_disp=L, niters=5, backend="lattice",
                           order_by_sum=bool(args.order_by_sum),
                           sort_mode=args.sort_mode, **tile_kw)
    guide_img = stack_guide(left, cfg0.sigma_color, cfg0.sigma_pos)
    if args.tiled:
        ref = (guide_img.reshape(h // B, B, w // B, B, guide_img.shape[-1])
               .transpose(0, 2, 1, 3, 4).reshape(h * w, guide_img.shape[-1]))
    else:
        ref = guide_img.reshape(h * w, -1)
    if args.max_vertices:
        cap = args.max_vertices
    elif (h, w) == (288, 384):
        cap = 16384  # measured flagship occupancy ~4.7k, x3 headroom, pow2
    else:
        cap = P.suggest_capacity(ref, headroom=3.0)

    from dataclasses import replace
    pack = max(1, 128 // max(L, 1))
    max_pieces = None
    if args.pieces:
        max_pieces = P.suggest_pieces(ref, cap, pack=pack, headroom=1.5)
    cfg = replace(cfg0, max_vertices=cap, max_pieces=max_pieces)

    results = {"device": str(jax.devices()[0]), "capacity": int(cap),
               "max_pieces": max_pieces, "tiled": args.tiled,
               "tile_px": B if args.tiled else None,
               "tile_u": tile_u if args.tiled else None,
               "sort_mode": args.sort_mode,
               "order_by_sum": bool(args.order_by_sum)}

    def timeit(body):
        return loop_timer(body, reps=args.reps) * 1e3

    bp = lambda r: P.build_plan(r, max_vertices=cap, max_pieces=max_pieces,
                                pack=pack, order_by_sum=bool(args.order_by_sum),
                                tile=B * B if args.tiled else None,
                                tile_u=tile_u, tile_bf16=args.tiled == 2,
                                sort_mode=args.sort_mode)
    plan = jax.jit(bp)(ref)
    src = jnp.asarray(np.random.RandomState(1).rand(h * w, L), jnp.float32)
    vals = jax.jit(P._splat)(plan, src)
    blurred = jax.jit(lambda p, v: P._blur(p, v, False))(plan, vals)

    # one mean-field update in isolation (what iter_ms differencing
    # measures) and its elementwise-only skeleton (softmax + Mu matmul +
    # energy update with the filter replaced by identity) — their gap is
    # the true in-loop filter cost, their absolute values expose scan/
    # fusion overheads that per-stage timings miss.
    from depth_estimation_tpu.crf.compat import charbonnier2, compatibility_matrix

    labels_arr = jnp.arange(L, dtype=jnp.float32)
    Mu = compatibility_matrix(
        lambda a, b: charbonnier2(a, b, cfg.gamma), labels_arr)
    E0f = jnp.asarray(
        np.random.RandomState(2).rand(h * w, L), jnp.float32) * 10.0
    Q0 = jax.nn.softmax(-E0f, axis=-1)

    def _update(a, filt):
        Qj = jitter(Q0, a)
        msg = filt(Qj @ Mu)
        return a + scalarize(jax.nn.softmax(-(E0f + msg - Qj @ Mu), axis=-1))

    want = set(args.stages.split(",")) if args.stages else None
    stages = {
        "update": lambda a: _update(a, lambda x: P.apply_plan(plan, x)),
        "elemwise": lambda a: _update(a, lambda x: x),
        "embed": lambda a: a + scalarize(P._simplex_embed_cols(jitter(ref, a))),
        "plan": lambda a: a + scalarize(bp(jitter(ref, a))),
        "splat": lambda a: a + scalarize(P._splat(plan, jitter(src, a))),
        "blur": lambda a: a + scalarize(P._blur(plan, jitter(vals, a), False)),
        "slice": lambda a: a + scalarize(P._slice(plan, jitter(blurred, a))),
        "apply": lambda a: a + scalarize(P.apply_plan(plan, jitter(src, a))),
        "costvolume": lambda a: a + scalarize(
            cost_volume(jitter(left, a), right, L, cfg.window_size)),
        "pipeline": lambda a: a + scalarize(
            crf_stereo_infer(jitter(left, a), right, cfg)["disparity"]),
    }
    for name, body in stages.items():
        if want is not None and name not in want:
            continue
        results[f"{name}_ms"] = timeit(body)

    for k, v in results.items():
        if isinstance(v, float):
            results[k] = round(v, 3)
    print(json.dumps(results))


if __name__ == "__main__":
    if os.environ.get("DET_PROF_WORKER") == "1" or "--no-supervise" in sys.argv:
        main()
    else:
        sys.exit(_supervised())
