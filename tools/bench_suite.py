"""Benchmark suite — one measurement per BASELINE.json config.

`bench.py` is the driver's single headline line (flagship Tsukuba lattice
CRF). This suite covers the remaining BASELINE configs end-to-end:

  1. tsukuba_dense   — Tsukuba 384×288, 16 labels, dense O(n²) mean-field
                       CRF (`Experiments/DenseCrf.ipynb` semantics).
  2. middlebury64    — half-res Middlebury-scale pair (994×1482), 64
                       labels, permutohedral message passing. Uses the real
                       Middlebury 2014 pair when present on disk, else the
                       procedural natural-statistics stand-in
                       (`data/synthetic.py` — no downloads in this image).
  3. trainable_step  — trainable CRF fwd+bwd+Adam step on Tsukuba (learned
                       guide scales + Mu, gradients through the lattice
                       VJP — `trainableDenseCRF.ipynb` cell 14 semantics).
  4. fullres128      — ≥1920×1080 frame, 128 labels, single-chip lattice
                       CRF (the per-chip term of the tiled config; the
                       multi-chip halo-exchange path itself is validated on
                       the virtual mesh by tests/test_sharding.py — no
                       multi-chip hardware in this container).
  5. serving_batched — StereoServer frames/s, batch of 8 Tsukuba-scale
                       frames (loop batch mode: dispatch-pipelined
                       single-frame programs; 'vmap' for sharded batches).

Usage: python tools/bench_suite.py [--device cpu] [--configs 1,2,5]
Emits one JSON line per config (and writes BENCH_SUITE.json at the repo
root unless --no-write). Like bench.py, a supervisor re-execs each config
as a worker with a timeout: the axon TPU relay intermittently blocks
process start, and one wedged config must not kill the suite.
"""
from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

ALL_CONFIGS = ("tsukuba_dense", "middlebury64", "trainable_step",
               "fullres128", "serving_batched")


def _supervised(argv) -> int:
    results = {}
    names = _parse_configs(argv)
    for name in names:
        env = dict(os.environ, DET_SUITE_WORKER=name)
        line = None
        for attempt in range(3):
            try:
                proc = subprocess.run(
                    [sys.executable, os.path.abspath(__file__), *argv],
                    env=env, timeout=1500, capture_output=True, text=True)
            except subprocess.TimeoutExpired:
                print(f"[{name}] worker timed out (attempt {attempt + 1})",
                      file=sys.stderr)
                continue
            line = next((l for l in proc.stdout.splitlines()
                         if l.startswith("{")), None)
            if proc.returncode == 0 and line:
                break
            print(f"[{name}] worker rc={proc.returncode} "
                  f"(attempt {attempt + 1}):\n" + proc.stderr[-2000:],
                  file=sys.stderr)
            line = None
        if line:
            print(line)
            results[name] = json.loads(line)
        else:
            results[name] = {"error": "worker failed"}
    if "--no-write" not in argv:
        path = os.path.join(ROOT, "BENCH_SUITE.json")
        merged = {}
        try:
            with open(path) as f:
                merged = json.load(f)  # partial runs refresh, not clobber
        except (OSError, ValueError):
            pass
        merged.update(results)
        with open(path, "w") as f:
            json.dump(merged, f, indent=1)
    return 0 if all("error" not in r for r in results.values()) else 1


def _parse_configs(argv):
    ap = _argparser()
    args, _ = ap.parse_known_args(argv)
    if args.configs:
        picks = []
        for tok in args.configs.split(","):
            tok = tok.strip()
            picks.append(ALL_CONFIGS[int(tok) - 1] if tok.isdigit() else tok)
        return picks
    return list(ALL_CONFIGS)


def _argparser():
    ap = argparse.ArgumentParser()
    ap.add_argument("--device", default=None)
    ap.add_argument("--configs", default=None,
                    help="comma list, names or 1-based indices")
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--no-write", action="store_true")
    ap.add_argument("--small", action="store_true",
                    help="tiny shapes (CI sanity, numbers not comparable)")
    return ap


# ---------------------------------------------------------------------------
# workers
# ---------------------------------------------------------------------------


def _timeit(fn, *xs, reps: int):
    """Per-call seconds of jitted `fn(*xs)` — fetch-anchored in-jit loop
    (utils/timing.loop_timer semantics): block_until_ready does not wait
    on this container's TPU relay, so the reps run as one fori_loop chain
    where the first float input is jittered by the accumulator and all
    outputs fold into the fetched scalar.

    The operands are passed as REAL jit arguments, not closed over:
    captured arrays become XLA constant literals, and at fullres128 scale
    the compiler materialized dozens of 24 MB copies of the constant
    input (one per fused consumer) straight into an HBM OOM (round-5)."""
    import time

    import jax
    import jax.numpy as jnp

    from depth_estimation_tpu.utils.timing import jitter, scalarize

    ij = next(i for i, x in enumerate(xs)
              if jnp.issubdtype(jnp.asarray(x).dtype, jnp.floating))

    @jax.jit
    def chain(n, a, *ops):
        def body(i, aa):
            args = [jitter(x, aa) if k == ij else x
                    for k, x in enumerate(ops)]
            return aa + scalarize(fn(*args))

        return jax.lax.fori_loop(0, n, body, a)

    def run(n):
        t0 = time.perf_counter()
        float(chain(jnp.int32(n), jnp.float32(0.0), *xs))
        return time.perf_counter() - t0

    reps = max(int(reps), 2)
    run(1)  # compile + warm up (trip count is traced: one program)
    t1 = run(1)
    tn = run(reps)
    if tn - t1 <= 0:
        return float("nan")
    return (tn - t1) / (reps - 1)


def _tsukuba(args):
    import jax.numpy as jnp
    from depth_estimation_tpu.data.datasets import TsukubaPair

    tsu = TsukubaPair()
    if tsu.available() and not args.small:
        item = tsu.load()
        return (jnp.asarray(item["left"], jnp.float32),
                jnp.asarray(item["right"], jnp.float32))
    import numpy as np
    h, w = (64, 96) if args.small else (288, 384)
    rng = np.random.RandomState(0)
    return (jnp.asarray(rng.rand(h, w, 3), jnp.float32),
            jnp.asarray(rng.rand(h, w, 3), jnp.float32))


def _natural_pair(args, h, w, max_disp):
    """Real Middlebury pair if on disk, else the procedural stand-in."""
    import numpy as np
    import jax.numpy as jnp
    from depth_estimation_tpu.data.datasets import MiddleburyStereo2014
    from depth_estimation_tpu.data.synthetic import make_stereo_pair

    try:
        mb = MiddleburyStereo2014()
        if len(mb):
            item = mb[0]
            L = np.asarray(item["left"], np.float32)[:h, :w]
            R = np.asarray(item["right"], np.float32)[:h, :w]
            if L.shape[:2] == (h, w):
                return jnp.asarray(L), jnp.asarray(R), "middlebury2014"
    except Exception:
        pass
    left, right, _ = make_stereo_pair(
        np.random.RandomState(0), h, w, num_layers=6, max_disp=max_disp)
    return (jnp.asarray(left, jnp.float32), jnp.asarray(right, jnp.float32),
            "synthetic_layers")


def _lattice_cfg(cfg0, left):
    """Full host-side calibration, as bench.py does: tight measured
    capacity + tiled MXU splat/slice (odd shapes edge-pad into blocks)
    + pinned sort strategy. Incidence blocks run bf16 (r4 default), so
    the table budget is 2 GB real = 4 GB in the f32-denominated check."""
    from dataclasses import replace

    from depth_estimation_tpu.models.pipeline import calibrate_capacity

    cfg = calibrate_capacity(left, cfg0, headroom=3.0, tiled=True,
                             max_incidence_bytes=4 << 30)
    return replace(cfg, tile_bf16=cfg.tile_px is not None)


def run_config(name: str, args) -> dict:
    import jax

    if args.device:
        jax.config.update("jax_platforms", args.device)
    import jax.numpy as jnp
    from depth_estimation_tpu.models.pipeline import (CRFStereoConfig,
                                                      crf_stereo_infer)

    dev = lambda: str(jax.devices()[0])

    if name == "tsukuba_dense":
        left, right = _tsukuba(args)
        cfg = CRFStereoConfig(num_disp=16, niters=5, backend="dense")
        fn = jax.jit(lambda l, r: crf_stereo_infer(l, r, cfg)["disparity"])
        dt = _timeit(fn, left, right, reps=args.reps)
        return {"config": name, "metric": "pipeline_ms", "value": dt * 1e3,
                "unit": f"ms ({left.shape[0]}x{left.shape[1]}, L=16, dense O(n^2))",
                # shape fields: bench.py refuses to compute vs_baseline
                # against a mismatched-shape oracle (round-5)
                "h": int(left.shape[0]), "w": int(left.shape[1]),
                "labels": 16, "niters": 5, "device": dev()}

    if name == "middlebury64":
        h, w, L = ((96, 128, 16) if args.small else (994, 1482, 64))
        left, right, source = _natural_pair(args, h, w, max_disp=L - 2)
        cfg = _lattice_cfg(
            CRFStereoConfig(num_disp=L, niters=5, backend="lattice"), left)
        fn = jax.jit(lambda l, r: crf_stereo_infer(l, r, cfg)["disparity"])
        dt = _timeit(fn, left, right, reps=args.reps)
        return {"config": name, "metric": "crf_meanfield_iters_per_s",
                "value": cfg.niters / dt,
                "unit": f"iters/s/chip ({h}x{w}, L={L}, d=5 bilateral)",
                "pipeline_ms": dt * 1e3, "source": source,
                "max_vertices": cfg.max_vertices, "device": dev()}

    if name == "trainable_step":
        import optax
        from depth_estimation_tpu.models.refiner import (crf_rnn_init,
                                                         crf_rnn_apply)
        from depth_estimation_tpu.models.pipeline import stereo_unary

        left, right = _tsukuba(args)
        h, w, _ = left.shape
        L = 16
        cfg = CRFStereoConfig(num_disp=L, niters=5, backend="lattice")
        E0 = stereo_unary(left, right, cfg)
        params = crf_rnn_init(backend="lattice")
        gt = jnp.zeros((h, w))
        mask = jnp.ones((h, w))
        opt = optax.adam(3e-2)
        state = opt.init(params)

        # calibrated lattice capacity with generous (8x) headroom: the
        # trainable guide scales move occupancy during training, but the
        # pow2 >= 2n safe default is ~16x a natural image's occupancy and
        # the blur working set scales with it (r4: 891 ms/step at 262144).
        # Round-5: the tiled MXU splat/slice reaches training too — one
        # calibrated tiled plan is reused across fwd + bwd + the 4-filter
        # ∂ref pass, where the per-iteration win repays the plan cost
        # most. tile_u gets 2x headroom (occupancy moves as scales train).
        from depth_estimation_tpu.crf.guides import ijrgb_guide
        from depth_estimation_tpu.ops.permutohedral import (
            suggest_capacity, suggest_sort_mode, suggest_tile_u)

        g0 = ijrgb_guide(params["w"], left)  # (h, w, 5) at init scales
        ref0 = g0.reshape(-1, g0.shape[-1])
        cap = suggest_capacity(ref0, headroom=8.0)
        tile_kw = {}
        Bt = 32
        if not args.small and h % Bt == 0 and w % Bt == 0:
            refb = (g0.reshape(h // Bt, Bt, w // Bt, Bt, -1)
                    .transpose(0, 2, 1, 3, 4).reshape(h * w, -1))
            tu = suggest_tile_u(refb, Bt * Bt, cap, headroom=2.0)
            tile_kw = dict(tile_px=Bt, tile_u=tu, tile_bf16=True,
                           sort_mode=suggest_sort_mode(ref0))

        def loss_fn(p):
            logits = crf_rnn_apply(p, left, -E0, niters=cfg.niters,
                                   backend="lattice", max_vertices=cap,
                                   **tile_kw)
            disp = (jax.nn.softmax(logits, -1)
                    @ jnp.arange(L, dtype=jnp.float32)).reshape(h, w)
            return jnp.sum(mask * (disp - gt) ** 2) / jnp.sum(mask)

        # fetch-anchored in-jit chain: params/opt state evolve per step so
        # the fori body is never loop-invariant; the fetched loss sum
        # forces the whole chain (block_until_ready is a no-op here).
        @jax.jit
        def run_steps(n, p, s):
            def body(i, carry):
                p, s, acc = carry
                l, g = jax.value_and_grad(loss_fn)(p)
                up, s = opt.update(g, s)
                return optax.apply_updates(p, up), s, acc + l

            return jax.lax.fori_loop(0, n, body, (p, s, jnp.float32(0.0)))

        def run(n):
            t0 = time.perf_counter()
            float(run_steps(jnp.int32(n), params, state)[2])
            return time.perf_counter() - t0

        run(1)  # compile + warm up
        t1 = run(1)
        tn = run(max(args.reps, 2))
        dt = max(tn - t1, 1e-9) / (max(args.reps, 2) - 1)
        return {"config": name, "metric": "train_step_ms", "value": dt * 1e3,
                "unit": f"ms fwd+bwd+adam ({h}x{w}, L={L}, lattice VJP)",
                "device": dev()}

    if name == "fullres128":
        h, w, L = ((96, 128, 16) if args.small else (1088, 1920, 128))
        left, right, source = _natural_pair(args, h, w, max_disp=min(L - 2, 96))
        cfg = _lattice_cfg(
            CRFStereoConfig(num_disp=L, niters=5, backend="lattice"), left)
        fn = jax.jit(lambda l, r: crf_stereo_infer(l, r, cfg)["disparity"])
        dt = _timeit(fn, left, right, reps=max(args.reps // 2, 2))
        return {"config": name, "metric": "frames_per_s", "value": 1.0 / dt,
                "unit": f"frames/s/chip ({h}x{w}, L={L}); tiled multi-chip "
                        "path validated on virtual mesh (tests/test_sharding.py)",
                "pipeline_ms": dt * 1e3, "source": source,
                "max_vertices": cfg.max_vertices, "device": dev()}

    if name == "serving_batched":
        from depth_estimation_tpu.models.serving import StereoServer

        left, right = _tsukuba(args)
        B = 2 if args.small else 8
        lb = jnp.broadcast_to(left, (B,) + left.shape)
        rb = jnp.broadcast_to(right, (B,) + right.shape)
        cfg = _lattice_cfg(
            CRFStereoConfig(num_disp=16, niters=5, backend="lattice"), left)
        # A/B both batch modes: 'loop' dispatch-pipelines the single-frame
        # program; 'vmap' is one whole-batch XLA program — viable since
        # round-5's pinned sort_mode stopped vmap from paying for both
        # lax.cond branches of the plan sorts. Report the faster.
        stats = {}
        for mode in ("vmap", "loop"):
            server = StereoServer(cfg, batch_mode=mode, auto_capacity=False)
            s = server.throughput(lb, rb, reps=args.reps)
            stats[mode] = s["frames_per_s"]
        best = max(stats, key=lambda k: (stats[k] == stats[k]) and stats[k])
        return {"config": name, "metric": "frames_per_s",
                "value": stats[best],
                "unit": f"frames/s/chip (B={B}, {left.shape[0]}x{left.shape[1]}, "
                        f"L=16, {best} batch mode)",
                "loop_fps": stats.get("loop"), "vmap_fps": stats.get("vmap"),
                "device": dev()}

    raise SystemExit(f"unknown config {name!r}")


def main():
    args = _argparser().parse_args()
    name = os.environ["DET_SUITE_WORKER"]
    res = run_config(name, args)
    for k, v in res.items():
        if isinstance(v, float):
            res[k] = round(v, 3)
    print(json.dumps(res))


if __name__ == "__main__":
    if os.environ.get("DET_SUITE_WORKER"):
        main()
    else:
        sys.exit(_supervised(sys.argv[1:]))
