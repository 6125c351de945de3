"""End-to-end dense-CRF stereo pipelines — the canonical inference paths.

Re-creates the reference's flagship notebook pipeline
(`Experiments/DenseCrf.ipynb` cells 6-12, SURVEY.md §3.1) as single
jittable functions:

  stereo pair → cost volume (unary E0) → bilateral guide [rgb/σc, ij/σp]
  → mean-field CRF (message passing = dense oracle | permutohedral lattice)
  → softmax-expectation disparity decode.

Default hyperparameters follow the notebook: ws=9, Charbonnier γ=3 (the
`charbonneir2` form), σc=σp=0.1, 5 mean-field iterations, L = w//6 labels.
"""
from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp

from ..crf.compat import charbonnier2, compatibility_matrix
from ..crf.guides import stack_guide
from ..crf.meanfield import mean_field_infer
from ..ops.costvolume import cost_volume, expected_disparity
from ..ops.dense_gaussian import dense_gaussian_filter
from ..ops.permutohedral import build_plan, apply_plan

__all__ = [
    "CRFStereoConfig",
    "stereo_unary",
    "crf_stereo_infer",
    "calibrate_capacity",
]


@dataclass(frozen=True)
class CRFStereoConfig:
    """Static pipeline hyperparameters (`DenseCrf.ipynb` cell 6)."""

    num_disp: int = 16
    window_size: int = 9
    gamma: float = 3.0
    sigma_color: float = 0.1
    sigma_pos: float = 0.1
    niters: int = 5
    unary_scale: float = 1.0
    backend: str = "lattice"  # 'lattice' | 'dense'
    mu_scale: float = 1.0
    # lattice vertex capacity: None = auto (pow2 ≥ 2n — fast, ~3x headroom
    # over measured occupancy); pass n·(d+1) for the exact worst case.
    max_vertices: int | None = None
    # piece-splat capacity: None disables the full-lane piece splat; set
    # via `calibrate_capacity` (measured piece count + headroom).
    max_pieces: int | None = None
    # quality dial: average k rotation-averaged lattices (k× plan+apply
    # cost, lower anisotropic approximation error). 1 = reference parity.
    num_lattices: int = 1
    # vertex ordering: True prepends the coord-sum sort column so blur
    # neighbors stay within `plan.band` slots (enables banded kernels) at
    # the cost of one extra radix column in every plan sort. Default False
    # (plain lexicographic order): no in-tree kernel consumes the band and
    # the extra sorts measured ~4 ms of flagship plan build (ROADMAP r4).
    order_by_sum: bool = False
    # tiled MXU splat/slice: pixels grouped into tile_px × tile_px image
    # blocks whose ≤ tile_u local vertices get dense incidence blocks —
    # batched matmuls replace the transaction-bound gathers (ROADMAP r4).
    # None disables; requires h, w divisible by tile_px. Set via
    # `calibrate_capacity(tiled=True)` which sizes tile_u from measured
    # per-tile occupancy.
    tile_px: int | None = None
    tile_u: int = 512
    tile_bf16: bool = False
    # plan-sort strategy: 'auto' = traced fit test (safe everywhere);
    # 'packed1' (pinned by `calibrate_capacity` when the calibration
    # frame's packed key fits int32 with neighbor-delta margin) takes the
    # single-sort fast path unconditionally AND, with tile_px set, the
    # lean per-tile batched plan build — also what lets `vmap`-batched
    # serving stop paying for both `lax.cond` branches (round-5).
    sort_mode: str = "auto"
    # emit mean-field iterations as straight-line XLA instead of lax.scan
    # (None = auto: unroll when niters ≤ 8). The scanned loop measured
    # ~0.7 ms/iter of scheduling overhead on TPU v5e (round-4).
    unroll: bool | None = None
    # mean-field state dtype: 'f32' (default) or 'bf16' — bf16 halves
    # every (n, L) pass and the vertex table per iteration and doubles
    # the MXU rate of the tiled splat/slice; energies/softmax stay
    # well-conditioned (the fixed point self-corrects) and the decode
    # casts back to f32 before the log. Quality gates decide per config.
    compute_dtype: str = "f32"
    # fuse the per-iteration elementwise chain (energy update + softmax +
    # next compatibility matmul) into one Pallas VMEM pass
    # (`ops.pallas.meanfield`) — measured 0.236 vs 0.318 ms at flagship
    # on v5e. Lattice backend only; CPU runs the kernel interpreted.
    fused_update: bool = False


def stereo_unary(left: jax.Array, right: jax.Array, cfg: CRFStereoConfig) -> jax.Array:
    """Unary energies (h, w, L) from window-sweep matching.

    NOTE on scales: the reference feeds the RAW aggregated window sums
    (magnitude ~tens) straight into the CRF (`DenseCrf.ipynb` cell 7) —
    this balance against the unnormalized lattice message magnitudes is
    what makes the mean-field fixed point sharp. `unary_scale` defaults to
    1 (raw)."""
    vol = cost_volume(left, right, cfg.num_disp, cfg.window_size)
    return cfg.unary_scale * vol


def calibrate_capacity(
    left,
    cfg: CRFStereoConfig,
    headroom: float = 3.0,
    pieces: bool = False,
    tiled: bool = False,
    tile_px: int = 32,
    max_incidence_bytes: int = 1 << 30,
) -> CRFStereoConfig:
    """Host-side capacity calibration: measure the lattice occupancy of
    THIS image's guide once and return a config with a tight static
    `max_vertices` (pow2 ≥ headroom·occupancy).

    Natural images occupy ~0.04n vertices at the flagship σs while the
    safe auto default is pow2 ≥ 2n — ~50× oversized, which inflates the
    blur working set for every mean-field iteration. Serving and bench
    paths call this once per stream/config; shapes stay static so the
    jitted pipeline is compiled once per calibrated capacity.

    `pieces` defaults OFF: the full-lane piece splat measured SLOWER on
    real TPU v5e (round-4 A/B: 6.53 vs 4.76 ms/iter, 52 vs 37 ms
    pipeline at flagship) — the 2.4× row-count saving does not survive
    the 512 B-row gather cost plus the per-piece weight contraction.

    `tiled`: also size the tiled MXU splat/slice (tile_px × tile_px
    image blocks; per-tile vertex capacity from measured per-tile
    occupancy). Skipped when the image doesn't divide into blocks or the
    dense incidence tables would exceed `max_incidence_bytes`.
    """
    from dataclasses import replace

    from ..ops.permutohedral import (suggest_capacity, suggest_pieces,
                                     suggest_sort_mode, suggest_tile_u)

    if cfg.backend != "lattice":
        return cfg
    left = jnp.asarray(left, jnp.float32)
    h, w, _ = left.shape
    guide = stack_guide(left, cfg.sigma_color, cfg.sigma_pos)
    ref = guide.reshape(-1, guide.shape[-1])
    cap = suggest_capacity(ref, headroom=headroom)
    sort_mode = suggest_sort_mode(ref)
    pack = max(1, 128 // max(cfg.num_disp, 1))
    max_pieces = (
        suggest_pieces(ref, cap, pack=pack, headroom=1.5)
        if (pieces and pack > 1)
        else None
    )
    tile_kw = {}
    if tiled:
        B = tile_px
        # odd shapes: the pipeline edge-pads to the next block multiple
        # (and crops outputs back), so calibrate on the padded guide
        hp, wp = h + (-h % B), w + (-w % B)
        gp = guide
        if (hp, wp) != (h, w):
            gp = jnp.pad(guide, ((0, hp - h), (0, wp - w), (0, 0)),
                         mode="edge")
        ref_blocked = (
            gp.reshape(hp // B, B, wp // B, B, gp.shape[-1])
            .transpose(0, 2, 1, 3, 4)
            .reshape(hp * wp, gp.shape[-1])
        )
        tu = suggest_tile_u(ref_blocked, B * B, cap)
        if hp * wp * tu * 4 <= max_incidence_bytes:
            tile_kw = {"tile_px": B, "tile_u": tu}
    return replace(cfg, max_vertices=cap, max_pieces=max_pieces,
                   sort_mode=sort_mode, **tile_kw)


@partial(jax.jit, static_argnames=("cfg",))
def crf_stereo_infer(left: jax.Array, right: jax.Array, cfg: CRFStereoConfig):
    """Full pipeline; returns dict with unary/refined disparity + logits.

    The lattice plan is built once from the guide and reused across all
    mean-field iterations (filter is inference-only here; training goes
    through `models.refiner`).
    """
    h0, w0, _ = left.shape
    # tiled mode needs block-divisible dims; edge-pad odd shapes up to the
    # next multiple and crop every output back — the few extra edge rows
    # cost far less than losing the tiled MXU splat/slice (round-5:
    # middlebury 994×1482 was falling back to the entry-wise path).
    B = cfg.tile_px
    pad_h = (-h0 % B) if (cfg.backend == "lattice" and B) else 0
    pad_w = (-w0 % B) if (cfg.backend == "lattice" and B) else 0
    if pad_h or pad_w:
        left = jnp.pad(left, ((0, pad_h), (0, pad_w), (0, 0)), mode="edge")
        right = jnp.pad(right, ((0, pad_h), (0, pad_w), (0, 0)), mode="edge")
    h, w, _ = left.shape
    E0 = stereo_unary(left, right, cfg)

    labels = jnp.arange(cfg.num_disp, dtype=left.dtype)
    Mu = compatibility_matrix(lambda a, b: charbonnier2(a, b, cfg.gamma), labels)
    Mu = Mu * cfg.mu_scale

    guide = stack_guide(left, cfg.sigma_color, cfg.sigma_pos)

    # tiled mode flattens pixels in tile_px × tile_px BLOCK order so the
    # plan's consecutive-pixel tiles are square image patches (small
    # per-tile vertex sets). Elementwise/mean-field math is order-
    # agnostic; only the final reshape undoes the permutation.
    tiled = (
        cfg.backend == "lattice"
        and B is not None
        and h % B == 0
        and w % B == 0
    )

    def _blocked(x):  # (h, w, K) -> (h·w, K) in block order
        K = x.shape[-1]
        return (
            x.reshape(h // B, B, w // B, B, K)
            .transpose(0, 2, 1, 3, 4)
            .reshape(h * w, K)
        )

    def _unblocked(flat):  # inverse of _blocked, to (h, w, K)
        K = flat.shape[-1]
        return (
            flat.reshape(h // B, w // B, B, B, K)
            .transpose(0, 2, 1, 3, 4)
            .reshape(h, w, K)
        )

    if tiled:
        ref = _blocked(guide)
        E0_flat = _blocked(E0)
    else:
        ref = guide.reshape(h * w, -1)
        E0_flat = E0.reshape(h * w, cfg.num_disp)

    if cfg.backend == "lattice":
        cap = cfg.max_vertices
        if cap is None:
            cap = 1 << (2 * h * w - 1).bit_length()  # pow2 ≥ 2n
            cap = min(cap, ref.shape[0] * (ref.shape[1] + 1))
        from ..ops.permutohedral import rotation_matrices

        pack = max(1, 128 // max(cfg.num_disp, 1))
        plans = [
            build_plan(ref if m == 0 else ref @ jnp.asarray(R, ref.dtype),
                       max_vertices=cap, max_pieces=cfg.max_pieces, pack=pack,
                       order_by_sum=cfg.order_by_sum,
                       tile=B * B if tiled else None, tile_u=cfg.tile_u,
                       tile_bf16=cfg.tile_bf16, sort_mode=cfg.sort_mode)
            for m, R in enumerate(rotation_matrices(ref.shape[1], cfg.num_lattices))
        ]

        # materialization fence: without it XLA may rematerialize plan
        # tables (notably the (T, P, U) incidence build) into every
        # mean-field iteration that consumes them — measured as the
        # in-pipeline marginal iteration costing ~2.4 ms vs ~0.9 ms for
        # the identical isolated update (round-5).
        plans = jax.lax.optimization_barrier(plans)

        def message_fn(Q):
            out = sum(apply_plan(p, Q) for p in plans) / len(plans)
            return out - Q
    elif cfg.backend == "dense":
        message_fn = lambda Q: dense_gaussian_filter(Q, ref) - Q
    else:
        raise ValueError(cfg.backend)

    if cfg.compute_dtype == "bf16":
        E0_flat = E0_flat.astype(jnp.bfloat16)
        Mu = Mu.astype(jnp.bfloat16)
    if cfg.backend == "lattice" and cfg.fused_update and cfg.niters > 0:
        # Pallas fused loop: same fixed point as mean_field_infer — the
        # compat-transformed beliefs C = Q·Mu ARE the filter input, so
        # each iteration is one lattice apply + one fused VMEM pass.
        from ..ops.pallas.meanfield import fused_energy_update

        interpret = jax.default_backend() == "cpu"
        Q0 = jax.nn.softmax(-E0_flat, axis=-1)
        C = jnp.matmul(Q0, Mu, preferred_element_type=Q0.dtype)
        E = E0_flat
        for _ in range(cfg.niters):
            S = sum(apply_plan(p, C) for p in plans) / len(plans)
            E, C = fused_energy_update(E0_flat, S, C, Mu,
                                       interpret=interpret)
        Q = jax.nn.softmax(-E, axis=-1).astype(jnp.float32)
        logits = (-E).astype(jnp.float32)
    else:
        # auto-unroll: straight-line iterations beat lax.scan by ~0.7
        # ms/iter (round-4/5) but keep more (n, L) buffers live — at
        # fullres128 scale (2M px × 128 labels ≈ 1 GB per state) the
        # unrolled program OOMed 16 GB HBM, so big states keep the scan.
        unroll = cfg.unroll
        if unroll is None:
            unroll = cfg.niters <= 8 and h * w * cfg.num_disp <= (1 << 27)
        Q = mean_field_infer(E0_flat, message_fn, Mu, cfg.niters, unroll)
        Q = Q.astype(jnp.float32)
        logits = jnp.log(Q + 1e-20)
    if tiled:
        Qimg = _unblocked(Q)
        disp_crf = expected_disparity(_unblocked(logits))
    else:
        Qimg = Q.reshape(h, w, cfg.num_disp)
        disp_crf = expected_disparity(logits).reshape(h, w)
    disp_unary = expected_disparity(-E0)
    return {
        "disparity": disp_crf[:h0, :w0],
        "disparity_unary": disp_unary[:h0, :w0],
        "probabilities": Qimg[:h0, :w0],
        "unary": E0[:h0, :w0],
    }
