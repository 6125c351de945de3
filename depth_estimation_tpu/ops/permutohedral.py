"""Permutohedral-lattice high-dimensional Gaussian filtering, XLA-native.

The O(n) approximation to dense Gaussian filtering
    filter(src, ref)_i = Σ_j exp(-‖ref_i − ref_j‖²/2) · src_j
(Adams/Baek/Davis 2010), re-designed for TPU/XLA from the reference's
hash-table C++/CUDA implementations (`crf/lattice/lite/permutohedral.h`,
`crf/lattice/cuda_lattice/permutohedral.cu`). This is NOT a port: the
open-addressing hash tables, atomics and replay buffers are replaced by a
fixed-shape, race-free sort/scan formulation built ONLY from primitives
that map well onto the TPU (stable sorts, gathers, segment sums, fixed-
length scans — no data-dependent while loops, no duplicate-heavy scatters):

  plan   = f(ref):  embed → simplex → barycentric  (pure elementwise math,
           `permutohedral.h:376-461` semantics); vertex dedup by a stable
           column-radix lexicographic sort + segment heads (replacing the
           hash table of `permutohedral.h:29-169`); blur neighbors by a
           sort-merge join of the neighbor-key queries against the UNIQUE
           keys (stable co-sort + segmented id propagation, replacing
           `hashTable.lookup`, `permutohedral.h:516-520` — probe loops are
           element-at-a-time HBM gathers on TPU; sorts are near-bandwidth).
  apply  = splat (sorted-segment sum) → blur (d+1 gather-axpy passes of
           the unnormalized [1/2, 1, 1/2] kernel) → slice (gather +
           barycentric recombine, scaled by 1/(1+2^-d),
           `permutohedral.h:473-483`).

The init-once/apply-many split mirrors Krähenbühl's `init`/`compute`
(`crf/lattice/lite/krahenbuhl.cpp:138-320`): the plan depends only on `ref`
and is reused across label channels, mean-field iterations, and fwd+bwd.

`apply` is linear in `src`; its transpose is the same filter with the blur
axes traversed in reverse order (`reverse` flag semantics,
`krahenbuhl.cpp:474-592`). Gradients:
  - ∂/∂src: transpose filter (symmetric up to blur order) — exact.
  - ∂/∂ref: analytic 4-filter identity of the reference autograd
    (`crf/gaussian_matrix.py:447-463`), implemented as one extra filter call
    of width 2L(d+1) through the same plan, via `jax.custom_vjp`.

Normalization conventions (SURVEY.md §7 "hard parts"): the reference's CPU
`lite` path does NOT divide by the homogeneous weight; the CRF stack was
tuned on that convention (`filter(U) − U`). We default to the same
(`normalize='none'`) and offer `'homogeneous'` (CUDA `permutohedral.cu:
404-406` semantics) via an appended ones channel.
"""
from __future__ import annotations

import math
from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "PermutohedralPlan",
    "build_plan",
    "apply_plan",
    "lattice_filter",
    "lattice_filter_planned",
    "lattice_filter_batched",
    "batched_lattice_adjacency",
    "lattice_adjacency",
    "simplex_embed",
    "count_vertices",
    "suggest_capacity",
    "suggest_pieces",
    "suggest_sort_mode",
    "suggest_tile_u",
]


# ---------------------------------------------------------------------------
# Embedding math (static, per feature-dimension d)
# ---------------------------------------------------------------------------


def _embedding_matrix(d: int) -> np.ndarray:
    """(d+1, d) matrix E with elevated = E @ position.

    Reproduces the reference recurrence (`permutohedral.h:380-384`) with the
    scale factors (d+1)·sqrt(2/3)/sqrt((i+1)(i+2)) (`permutohedral.h:354-371`)
    folded in, by running it on basis vectors. Rows sum to zero.
    """
    E = np.zeros((d + 1, d))
    scale = (d + 1) * math.sqrt(2.0 / 3.0)
    sf = np.array([scale / math.sqrt((i + 1) * (i + 2)) for i in range(d)])
    for j in range(d):
        p = np.zeros(d)
        p[j] = sf[j]
        elevated = np.zeros(d + 1)
        elevated[d] = -d * p[d - 1]
        for i in range(d - 1, 0, -1):
            elevated[i] = elevated[i + 1] - i * p[i - 1] + (i + 2) * p[i]
        elevated[0] = elevated[1] + 2 * p[0]
        E[:, j] = elevated
    return E


def _canonical_simplex(d: int) -> np.ndarray:
    """(d+1, d+1) canonical simplex offsets (`permutohedral.h:346-351`):
    canonical[r, j] = r for j ≤ d−r else r − (d+1)."""
    c = np.zeros((d + 1, d + 1), dtype=np.int32)
    for r in range(d + 1):
        c[r, : d + 1 - r] = r
        c[r, d + 1 - r :] = r - (d + 1)
    return c


def _simplex_embed_cols(ref: jax.Array):
    """Column-major simplex embedding — the lane-efficient core.

    TPU layouts pad the minor dimension to 128 lanes, so any (n, d) or
    (n, d+1) intermediate wastes >95% of every vector register at d≈5.
    This variant keeps n (large) as the minor dim everywhere: measured
    10.6 ms → ~1 ms for the embed stage of the flagship plan build.

    Returns:
      key_cols: list of d arrays, each (d+1, n) int32 — lattice coordinate
        k of simplex remainder r for pixel i at [r, i].
      bary_t: (d+1, n) barycentric weights (sum to 1 over axis 0).
    """
    n, d = ref.shape
    E = jnp.asarray(_embedding_matrix(d), ref.dtype)
    canonical = jnp.asarray(_canonical_simplex(d))

    elevated = E @ ref.T  # (d+1, n)

    # Greedy nearest multiple-of-(d+1) point (`permutohedral.h:391-402`).
    v = elevated / (d + 1)
    up = jnp.ceil(v) * (d + 1)
    down = jnp.floor(v) * (d + 1)
    greedy = jnp.where(up - elevated < elevated - down, up, down)
    greedy = greedy.astype(jnp.int32)
    coord_sum = jnp.sum(greedy, axis=0) // (d + 1)  # (n,) int

    # Rank of the differential, descending, ties to lower index
    # (`permutohedral.h:405-411`). Direct pairwise-comparison count:
    # rank[r] = #{r' : diff[r'] > diff[r], or equal with r' < r} — the
    # (d+1)² compare terms fuse into ONE elementwise pass over the
    # (d+1, n) diff (never materialized as an O(d²) tensor), replacing
    # two `lax.sort`s along the short axis whose comparator networks
    # measured ~1 ms of the flagship plan build on TPU v5e (round-5).
    diff = elevated - greedy  # (d+1, n)
    rank_rows = []
    for r in range(d + 1):
        acc = None
        for r2 in range(d + 1):
            if r2 == r:
                continue
            gt = diff[r2] > diff[r]
            if r2 < r:
                gt = gt | (diff[r2] == diff[r])
            gt = gt.astype(jnp.int32)
            acc = gt if acc is None else acc + gt
        rank_rows.append(acc)
    rank = jnp.stack(rank_rows)  # (d+1, n)

    # Walk back onto the hyperplane (`permutohedral.h:413-433`).
    rank_s = rank + coord_sum[None, :]
    too_high = rank_s >= d + 1
    too_low = rank_s < 0
    greedy = jnp.where(too_high, greedy - (d + 1), jnp.where(too_low, greedy + (d + 1), greedy))
    rank = jnp.where(too_high, rank_s - (d + 1), jnp.where(too_low, rank_s + (d + 1), rank_s))

    # Barycentric coordinates (`permutohedral.h:436-441`): scatter the
    # sorted differentials into a (d+2)-vector via one-hot sums.
    t = (elevated - greedy) / (d + 1)  # (d+1, n)
    oh_lo = jax.nn.one_hot(d - rank, d + 2, dtype=t.dtype, axis=0)  # (d+2, d+1, n)
    oh_hi = jax.nn.one_hot(d + 1 - rank, d + 2, dtype=t.dtype, axis=0)
    bary_t = jnp.einsum("kn,bkn->bn", t, oh_lo - oh_hi)  # (d+2, n)
    bary_t = bary_t.at[0].add(1.0 + bary_t[d + 1])
    bary_t = bary_t[: d + 1]  # (d+1, n)

    # Vertex keys (`permutohedral.h:444-447`): key_r[i] = greedy[i] +
    # canonical[r, rank[i]], stored for the first d coordinates.
    key_cols = []
    for k in range(d):
        cc = canonical[:, rank[k]]  # (d+1, n) — tiny-table gather
        key_cols.append(greedy[k][None, :] + cc)
    return key_cols, bary_t


def simplex_embed(ref: jax.Array):
    """Embed features into the permutohedral hyperplane and locate the
    enclosing simplex.

    Args:
      ref: (n, d) feature vectors (the filter approximates a unit-variance
        Gaussian in this space).

    Returns:
      keys: (n, d+1, d) int32 lattice coordinates of the d+1 simplex
        vertices (first d coords; the last is determined by zero-sum).
      bary: (n, d+1) barycentric weights (sum to 1).

    (Row-major convenience wrapper; `build_plan` uses the column-major
    core directly to stay lane-efficient.)
    """
    key_cols, bary_t = _simplex_embed_cols(ref)
    keys = jnp.stack(key_cols, axis=0).transpose(2, 1, 0)  # (n, d+1, d)
    return keys, bary_t.T


# ---------------------------------------------------------------------------
# Plan construction: sort-based dedup + sort-merge neighbor join
# ---------------------------------------------------------------------------


class PermutohedralPlan(NamedTuple):
    """Static-shape lattice 'plan' — everything derived from `ref`.

    C is the static vertex capacity; `num_valid` (traced scalar) counts the
    occupied slots. Slot C is the zero sentinel for missing neighbors and
    capacity overflow. Entries (pixel, remainder) are additionally stored
    pre-sorted by slot so splatting is a sorted-segment reduction.
    """

    # Entry-wise tables. A lean tiled plan (`sort_mode='packed1'` + `tile`)
    # sets `slot`/`sorted_*`/`starts` to None — apply then runs exclusively
    # through the tiled MXU tables below and the entry CSR is never built
    # (round-5: the skipped global sorts are most of the tiled plan cost).
    slot: jax.Array | None  # (n, d+1) int32 — vertex slot per (pixel, rem)
    bary: jax.Array  # (n, d+1) barycentric weights
    neighbors: jax.Array  # (d+1, C, 2) int32 — blur neighbor slots (C = missing)
    num_valid: jax.Array  # () int32
    sorted_pixel: jax.Array | None  # (N,) int32 — pixel of k-th slot-sorted entry
    sorted_weight: jax.Array | None  # (N,) — barycentric weight of that entry
    sorted_seg: jax.Array | None  # (N,) int32 — its slot id (ascending)
    starts: jax.Array | None  # (C+1,) int32 — CSR boundaries into sorted entries
    band: jax.Array  # () int32 — max |neighbor − slot| over real neighbors.
    #                  Small by construction ONLY when the plan was built
    #                  with order_by_sum=True ((coord-sum, lex) slot order);
    #                  plain-lex plans record the realized (large) band.
    # Optional piece-splat tables (None unless built with max_pieces):
    # a PIECE is a maximal run of slot-sorted entries with the same slot
    # and consecutive pixels inside one G-pixel group, G = pack. Splatting
    # by pieces gathers ONE full-lane (G·L = 128) packed row per piece
    # instead of one 64 B row per entry — 2.4× fewer rows at flagship.
    piece_group: jax.Array | None = None  # (T_P,) int32 — packed src row id
    piece_weights: jax.Array | None = None  # (T_P, G) — weights by offset
    piece_starts: jax.Array | None = None  # (C+1,) int32 — CSR over slots
    num_pieces: jax.Array | None = None  # () int32 — realized piece count
    # Optional tiled incidence tables (None unless built with tile=P):
    # pixels are grouped into T = n/P tiles of P CONSECUTIVE flat pixels;
    # per tile, the ≤ tile_u distinct vertices its entries touch get
    # local ids, and the barycentric weights land in a DENSE (P, tile_u)
    # incidence block. Splat and slice then run as batched MXU matmuls
    # against ~55k gathered/scattered vertex rows instead of n·(d+1)
    # random 64 B row transactions — the round-4 answer to the measured
    # transaction-bound splat/slice (ROADMAP.md). Callers that want 2-D
    # locality pass block-reordered pixels (models/pipeline.py does).
    tile_A: jax.Array | None = None  # (T, P, U) — dense barycentric blocks
    tile_vid: jax.Array | None = None  # (T, U) int32 — global slot per local
    #                                     id (C = padding/absent)
    partial_order: jax.Array | None = None  # (T·U,) int32 — flat partial
    #                                     index in global-slot-sorted order
    partial_starts: jax.Array | None = None  # (C+1,) int32 — CSR into the
    #                                     slot-sorted partials
    tile_overflow: jax.Array | None = None  # () int32 — entries dropped
    #                                     because a tile exceeded tile_u

    @property
    def d(self) -> int:
        # static: derived from array shape, never a traced leaf
        return self.neighbors.shape[0] - 1

    @property
    def capacity(self) -> int:
        return self.neighbors.shape[1]


def _sort_rows(cols, extras=(), mode: str = "auto"):
    """Stable lexicographic row argsort of d parallel (N,) int32 columns,
    carrying `extras` payload arrays through the sorts.

    TPU cost model (measured on v5e, N=663k): extra payload operands in
    `lax.sort` cost ~0.35 ms each per pass, while a post-hoc random 1-D
    gather from an HBM-resident (N,) table costs ~13 ms — so everything
    needed in sorted order rides the sort as payload, and NOTHING is
    gathered afterwards.

    Fast path: pack the d columns into TWO int32 surrogate keys by
    dynamic-stride mixed-radix packing (per-column min subtracted, strides
    = column ranges) and run 2 stable sorts — exact whenever each half's
    range product fits in 31 bits, which holds for every practical
    bilateral/feature guide (lattice coords span tens of cells per axis).
    The fit test is data-dependent, so the exact d-sort fallback rides a
    `lax.cond`; under `vmap` the cond degrades to running both branches,
    which only costs the batched path the old price.

    `mode` pins the strategy STATICALLY — 'packed1' / 'packed2' / 'lex'
    skip the traced fit test (and the `lax.cond`) entirely, so a `vmap`-
    batched caller pays for exactly one branch. Calibrated serving paths
    pin the mode the calibration frame verified (pipeline.
    calibrate_capacity); pinning a packed mode the data does not fit
    silently corrupts the dedup, so only calibration should pin.

    Returns (order, row_changed, sorted_extras):
      order: (N,) int32 — entry id of the k-th row in lexicographic order
        (stable: ties keep ascending entry order).
      row_changed: (N-1,) bool — sorted row k differs from row k-1.
      sorted_extras: the payloads, permuted by `order`.
    """
    d = len(cols)
    N = cols[0].shape[0]
    iota = jnp.arange(N, dtype=jnp.int32)
    mins = [c.min() for c in cols]
    shifted = [c - m for c, m in zip(cols, mins)]

    def lex(_):
        # column radix of stable single-key sorts, least-significant
        # column first (multi-key lax.sort compiles to a slow comparator
        # loop on TPU; d single-key sorts are each near-bandwidth)
        arrays = list(shifted) + [iota] + list(extras)
        for k in range(d - 1, -1, -1):
            key = arrays[k]
            rest = arrays[:k] + arrays[k + 1 :]
            out = jax.lax.sort((key, *rest), num_keys=1, is_stable=True)
            arrays = list(out[1 : k + 1]) + [out[0]] + list(out[k + 1 :])
        scols = arrays[:d]
        rc = scols[0][1:] != scols[0][:-1]
        for c in scols[1:]:
            rc = rc | (c[1:] != c[:-1])
        return (arrays[d], rc, tuple(arrays[d + 1 :]))

    if d <= 2 or mode == "lex":
        return lex(None)

    m = (d + 1) // 2
    rng = [s.max() + 1 for s in shifted]  # traced int32 column ranges

    def pack(lo, hi):
        key = shifted[lo]
        for k in range(lo + 1, hi):
            key = key * rng[k] + shifted[k]
        return key

    def packed1(_):
        # every column fits ONE 31-bit surrogate key → a single stable
        # sort. Holds for the flagship bilateral guide (5 coordinate
        # ranges of ~2⁵ each ≈ 26 bits) — measured, this is the common
        # case; the 2-sort path only triggers for wide feature guides.
        out = jax.lax.sort((pack(0, d), iota, *extras), num_keys=1, is_stable=True)
        rc = out[0][1:] != out[0][:-1]
        return (out[1], rc, tuple(out[2:]))

    def packed2(_):
        # LSD radix: stable sort by the low key, then by the high key;
        # the other key and all payloads ride along (no gathers).
        k_hi, k_lo = pack(0, m), pack(m, d)
        out1 = jax.lax.sort((k_lo, k_hi, iota, *extras), num_keys=1, is_stable=True)
        out2 = jax.lax.sort(out1[1:2] + out1[:1] + out1[2:], num_keys=1, is_stable=True)
        k_hi2, k_lo2, order = out2[0], out2[1], out2[2]
        rc = (k_hi2[1:] != k_hi2[:-1]) | (k_lo2[1:] != k_lo2[:-1])
        return (order, rc, tuple(out2[3:]))

    if mode == "packed1":
        return packed1(None)
    if mode == "packed2":
        return packed2(None)

    logr = jnp.log2(jnp.stack(rng).astype(jnp.float32))
    fits2 = (jnp.sum(logr[:m]) < 30.9) & (jnp.sum(logr[m:]) < 30.9)
    fits1 = jnp.sum(logr) < 30.9
    return jax.lax.cond(
        fits1, packed1,
        lambda op: jax.lax.cond(fits2, packed2, lex, op), None)


def _seg_max(a, b):
    """Associative op for segmented forward-max propagation: (value, seghead)
    pairs; a fresh segment head resets the running max."""
    v1, f1 = a
    v2, f2 = b
    return jnp.where(f2, v2, jnp.maximum(v1, v2)), f1 | f2


def build_plan(
    ref: jax.Array,
    max_vertices: int | None = None,
    max_pieces: int | None = None,
    pack: int = 8,
    order_by_sum: bool = True,
    tile: int | None = None,
    tile_u: int = 512,
    tile_bf16: bool = False,
    sort_mode: str = "auto",
) -> PermutohedralPlan:
    """Build the lattice plan from (n, d) reference features. Pure int32.

    All shapes are static and every step is a sort, gather, cumsum, or
    fixed-length scan:

    1. **Dedup**: lexicographic sort of the n·(d+1) vertex keys (stable
       column radix), segment heads → compact slot ids; the inverse
       permutation comes from one more stable sort (no scatters).
    2. **CSR layout**: entries stay slot-sorted in the plan, so splatting
       is a sorted-segment reduction; segment boundaries come from a
       sorted-vs-iota merge (`searchsorted` in sort form).
    3. **Neighbors**: a sort-merge join of the 2(d+1)C neighbor-key
       queries against the ≤C unique keys (≙ `hashTable.lookup(key,
       false)`, `permutohedral.h:516-520`, without the hash table:
       stable co-sort + segmented id propagation + sort back).

    Args:
      max_vertices: static capacity C (default n·(d+1) = exact worst case;
        pass pow2 ≥ 2·expected-occupancy for speed — natural-image
        bilateral guides occupy ~0.04-0.7n). Overflow routes to the zero
        sentinel (soft degrade, visible as num_valid > capacity).
      max_pieces: static piece capacity T_P — enables the piece-splat
        tables (see PermutohedralPlan). Use `suggest_pieces` to size it;
        pieces beyond capacity are DROPPED (mass loss — visible as
        num_pieces > capacity), so give real headroom. None (default)
        skips construction and `apply` splats entry-wise.
      pack: pixels per packed row G for the piece tables (the splat uses
        them only when G·L ≤ 128, i.e. full-lane rows).
      tile: pixels per incidence tile P — enables the tiled MXU
        splat/slice tables (see PermutohedralPlan.tile_A). Requires
        n % P == 0; callers wanting 2-D locality pre-order pixels in
        image blocks. None (default) skips construction.
      tile_u: static per-tile vertex capacity U. Entries in tiles that
        touch more than U distinct vertices are DROPPED (mass loss,
        recorded in plan.tile_overflow) — size from measured per-tile
        occupancy (flagship 32×32 blocks: max 376, mean 139 → 512 safe).
      tile_bf16: store the incidence blocks in bfloat16 — halves the
        dominant A-read traffic per filter call and doubles the MXU rate,
        at ~3 significant digits on the barycentric weights (the
        mean-field fixed point is self-correcting; quality gates decide).
      sort_mode: 'auto' (traced fit test + lax.cond — safe everywhere) or
        a pinned strategy 'packed1'/'packed2'/'lex' (see `_sort_rows`).
        Pinning 'packed1' together with `tile` takes the LEAN tiled build:
        per-tile batched sorts over a single widened-range packed key, no
        entry CSR tables at all (round-5; ~2× faster tiled plan). Only
        calibration should pin (`pipeline.calibrate_capacity` verifies the
        packing fits on the calibration frame).

    Layout note: every intermediate is either 1-D of length N/C/T or a
    small list of such columns — never an (N, d) array — so the TPU's
    128-lane minor dim is always fully used (the row-major variant wasted
    >95% of every vector op at d≈5; measured 69 ms → ~25 ms flagship).
    """
    n, d = ref.shape
    if (
        tile is not None
        and sort_mode == "packed1"
        and max_pieces is None
        and not order_by_sum
    ):
        C_lean = n * (d + 1) if max_vertices is None else int(max_vertices)
        return _build_plan_tiled_lean(
            ref, C_lean, int(tile), int(tile_u), tile_bf16
        )
    key_cols, bary_t = _simplex_embed_cols(ref)  # d × (d+1, n); (d+1, n)
    N = n * (d + 1)
    C = N if max_vertices is None else int(max_vertices)
    # entry id convention: entry = r·n + i (remainder-major) — lets the
    # (d+1, n) columns flatten with no transpose.
    flat_cols = [kc.reshape(N) for kc in key_cols]
    # Band-friendly vertex ordering: prepend the stored-coordinate SUM as
    # the most-significant sort column. Blur neighbors change the sum by
    # exactly −1/+1 (axes j<d) or +d/−d (axis d) — see `delta_arr` below —
    # so in (sum, lex) order every neighbor lands within a few sum-slabs
    # of its vertex. `plan.band` records the realized max |neighbor−slot|
    # for banded/windowed kernels to consume.
    # Equality groups are unchanged (equal keys ⇒ equal sum), so dedup
    # semantics are identical to the plain lexicographic order.
    # (set order_by_sum=False to skip the extra sort column: plain lex
    # order, no band guarantee — cheaper plan build when no banded kernel
    # consumes plan.band)
    if order_by_sum:
        s_col = flat_cols[0]
        for c in flat_cols[1:]:
            s_col = s_col + c
        flat_cols = [s_col] + flat_cols

    # --- 1) lexicographic dedup -----------------------------------------
    # bary rides the sort as payload → sorted_weight with no gather
    order, row_changed, (sorted_weight,) = _sort_rows(
        flat_cols, (bary_t.reshape(N),), mode=sort_mode
    )
    is_head = jnp.concatenate([jnp.ones((1,), bool), row_changed])
    seg = (jnp.cumsum(is_head) - 1).astype(jnp.int32)  # (N,) ascending
    num_valid = seg[-1] + 1
    seg_capped = jnp.minimum(seg, C)
    iota_n = jnp.arange(N, dtype=jnp.int32)

    # inverse permutation by one more stable sort keyed on the entry id
    # (round-4 measurement: an (N,) ELEMENT scatter runs element-at-a-time
    # on TPU — the round-3 "scatter replaces a sort" change was a
    # regression; sorts are near-bandwidth)
    _, inv_seg = jax.lax.sort((order, seg_capped), num_keys=1, is_stable=True)
    slot = inv_seg.reshape(d + 1, n).T  # (n, d+1)

    # --- 2) CSR entry layout (already sorted by seg) ---------------------
    sorted_pixel = order % n

    # --- 3) unique keys + blur neighbors -----------------------------------
    iota_c1 = jnp.arange(C + 1, dtype=jnp.int32)
    # CSR boundaries: starts[c] = first sorted position of slot c. Sort-
    # compact the head positions (each occupied slot has exactly ONE head,
    # so the first C+1 sorted records cover every slot) then scatter the
    # SMALL (C+1,) result + a backward min-scan (restores searchsorted's
    # ascending contract at slots with no head: empty slots inherit the
    # NEXT occupied slot's start, so their segments are empty). An (N,)
    # element scatter-min here ran element-at-a-time on TPU (round-4).
    k_start = jnp.where(is_head, seg_capped, jnp.int32(C + 1))
    sk, spos = jax.lax.sort((k_start, iota_n), num_keys=1, is_stable=True)
    m_s = min(C + 1, N)
    starts_full = (
        jnp.full((C + 1,), N, jnp.int32)
        .at[sk[:m_s]]
        .min(spos[:m_s], mode="drop")
    )
    starts_full = jax.lax.associative_scan(jnp.minimum, starts_full, reverse=True)
    iota_c = iota_c1[:C]
    starts = starts_full[:C]
    valid_c = iota_c < num_valid
    # unique keys: entry id of each segment head (small 1-D gather), then
    # ONE row gather from the (N, d+1) row-layout copy of the (sum-
    # prefixed) keys — big-table gathers must be row-major on TPU (a (C,)
    # scalar gather from an HBM (N,) table runs element-at-a-time; rows
    # amortize it over lanes).
    dk = len(flat_cols)  # columns per key: [coord-sum?, d stored coords]
    flat_rows = jnp.stack(flat_cols, axis=-1)  # (N, dk)
    head_entry = order[jnp.minimum(starts, N - 1)]  # (C,)
    # Invalid slots get a sentinel key JUST above the occupied coordinate
    # range (not int32max: the packed 2-sort fast path needs small column
    # ranges, and sentinel±delta must not wrap). sentinel−(d+1) > max real
    # coord, so sentinel-derived neighbor queries can never equal a real
    # vertex key — unmatched queries resolve to the absent id C.
    sent = jnp.stack([c.max() for c in flat_cols]) + jnp.int32(d + 2)  # (d+1,)
    unique_keys = jnp.where(valid_c[:, None], flat_rows[head_entry], sent[None, :])
    vids = jnp.arange(C, dtype=jnp.int32)

    # Blur neighbors along each of the d+1 lattice axes
    # (`permutohedral.h:504-509`): axis j < d: +1 everywhere except coord j
    # gets −d (and the mirror); axis d: ±1 in all stored coords. Column 0
    # carries the coordinate-sum delta (−1 for axes < d, +d for axis d).
    eye = np.eye(d, dtype=np.int32)
    deltas = [np.ones(d, np.int32) - (d + 1) * eye[j] for j in range(d)]
    deltas.append(np.ones(d, dtype=np.int32))
    if order_by_sum:
        deltas = [np.concatenate([[dl.sum()], dl]) for dl in deltas]
    delta_arr = jnp.asarray(np.stack(deltas))  # (d+1, dk) static

    queries = jnp.concatenate(
        [
            (unique_keys[None, :, :] + delta_arr[:, None, :]).reshape(-1, dk),
            (unique_keys[None, :, :] - delta_arr[:, None, :]).reshape(-1, dk),
        ],
        axis=0,
    )  # (Q, d+1), Q = 2·(d+1)·C

    # Sort-merge join replaces the open-addressing hash table of the
    # reference (`permutohedral.h:29-169`) outright: on TPU the verified-
    # probe loop is 16 rounds of element-at-a-time HBM gathers (measured
    # 36 ms insert+lookup at flagship scale) while 3 more stable sort
    # passes over C+Q rows cost ~4 ms. Stable-sort [unique keys ∥ queries]
    # — the table row, having the smaller concatenation index, leads each
    # equal-key run — then a segmented forward max propagates its vertex
    # id through the run, and one sort by query id restores query order.
    # Keys are deduped so each run holds at most one table row: exact.
    Q = queries.shape[0]
    comb_cols = [
        jnp.concatenate([unique_keys[:, k], queries[:, k]]) for k in range(dk)
    ]
    marker = jnp.concatenate([vids, jnp.full((Q,), -1, jnp.int32)])
    qid = jnp.concatenate(
        [jnp.full((C,), Q, jnp.int32), jnp.arange(Q, dtype=jnp.int32)]
    )
    _, rc2, (m_s, qid_s) = _sort_rows(comb_cols, (marker, qid), mode=sort_mode)
    head2 = jnp.concatenate([jnp.ones((1,), bool), rc2])
    prop, _ = jax.lax.associative_scan(_seg_max, (m_s, head2))
    _, res_sorted = jax.lax.sort((qid_s, prop), num_keys=1, is_stable=True)
    found = res_sorted[:Q]  # query order; -1 where the key is absent
    found = jnp.where(found < 0, jnp.int32(C), found)  # (2·(d+1)·C,)
    plus = found[: (d + 1) * C].reshape(d + 1, C)
    minus = found[(d + 1) * C :].reshape(d + 1, C)
    neighbors = jnp.stack([plus, minus], axis=-1)  # (d+1, C, 2)

    # band from the (d+1, C) halves (the stacked (…, 2) array pads its
    # minor dim 2 → 128 lanes in HBM; don't re-read it for a reduction)
    band = jnp.int32(0)
    for half in (plus, minus):
        offs = jnp.abs(half - vids[None, :])
        band = jnp.maximum(band, jnp.max(jnp.where(half != C, offs, 0)))
    band = band.astype(jnp.int32)

    sorted_pixel = sorted_pixel.astype(jnp.int32)
    piece_group = piece_weights = piece_starts = num_pieces = None
    if max_pieces is not None and pack > 1:
        # --- 4) piece tables: maximal same-slot consecutive-pixel runs
        # within one G-pixel group. All scatters below have strictly
        # increasing unique destination indices (flat = pid·G + offset
        # increases along the sorted entries) — the cheap scatter form.
        T_P, G = int(max_pieces), int(pack)
        pbrk = (
            (seg_capped[1:] != seg_capped[:-1])
            | (sorted_pixel[1:] != sorted_pixel[:-1] + 1)
            | (sorted_pixel[1:] // G != sorted_pixel[:-1] // G)
        )
        pid = jnp.concatenate(
            [jnp.zeros((1,), jnp.int32), jnp.cumsum(pbrk).astype(jnp.int32)]
        )  # (N,) ascending piece ids
        num_pieces = pid[-1] + 1
        ok = pid < T_P
        flat = jnp.where(ok, pid * G + sorted_pixel % G, T_P * G)  # OOB→drop
        piece_weights = (
            jnp.zeros((T_P * G,), sorted_weight.dtype)
            .at[flat]
            .set(sorted_weight, mode="drop", unique_indices=True,
                 indices_are_sorted=True)
            .reshape(T_P, G)
        )
        head = jnp.concatenate([jnp.ones((1,), bool), pbrk])
        pid_head = jnp.where(head & ok, pid, T_P)
        piece_group = (
            jnp.zeros((T_P,), jnp.int32)
            .at[pid_head]
            .set(sorted_pixel // G, mode="drop", unique_indices=True,
                 indices_are_sorted=True)
        )
        pseg = (
            jnp.full((T_P,), C, jnp.int32)
            .at[pid_head]
            .set(seg_capped, mode="drop", unique_indices=True,
                 indices_are_sorted=True)
        )  # ascending; pad/overflow slots = C (excluded by starts[C])
        # piece CSR boundaries: scatter-min + backward min-scan (same
        # ascending-contract trick as starts_full above)
        piece_starts = (
            jnp.full((C + 1,), T_P, jnp.int32)
            .at[pseg]
            .min(jnp.arange(T_P, dtype=jnp.int32))
        )
        piece_starts = jax.lax.associative_scan(
            jnp.minimum, piece_starts, reverse=True
        )

    tile_A = tile_vid = partial_order = partial_starts = tile_overflow = None
    if tile is not None:
        # --- 5) tiled incidence tables: per-tile dense barycentric blocks
        # so splat/slice run as batched MXU matmuls (round-4 redesign of
        # the transaction-bound gathers — see PermutohedralPlan docs).
        P, U = int(tile), int(tile_u)
        if n % P != 0:
            raise ValueError(f"tile={P} must divide n={n}")
        T = n // P
        G_cap = T * U
        # group entries by (tile, slot) with one stable sort; group = one
        # distinct vertex within one tile
        slot_pm = slot.reshape(N)  # pixel-major entries: e = i·(d+1)+r
        t_pix = (jnp.arange(n, dtype=jnp.int32) // P)
        gkey = (
            jnp.repeat(t_pix, d + 1) * jnp.int32(C + 1) + slot_pm
        )  # (N,)
        sorted_gkey, sorted_eid = jax.lax.sort(
            (gkey, jnp.arange(N, dtype=jnp.int32)), num_keys=1, is_stable=True
        )
        ghead = jnp.concatenate(
            [jnp.ones((1,), bool), sorted_gkey[1:] != sorted_gkey[:-1]]
        )
        g = (jnp.cumsum(ghead) - 1).astype(jnp.int32)  # (N,) group index
        iota_g = jnp.arange(G_cap, dtype=jnp.int32)
        # group records via sort-compaction — no (N,) element scatter
        # (element-at-a-time on TPU): heads carry unique ascending group
        # ids, so after sorting on [g | G_cap-pad] position g holds group
        # g's key. Beyond-cap groups soft-drop.
        key_sentinel = jnp.int32((T + 1) * (C + 1))
        _, gkey_comp = jax.lax.sort(
            (jnp.where(ghead, g, N), sorted_gkey), num_keys=1, is_stable=True
        )
        if G_cap > N:
            gkey_comp = jnp.pad(gkey_comp, (0, G_cap - N))
        group_key = jnp.where(
            iota_g < jnp.minimum(g[-1] + 1, G_cap),
            gkey_comp[:G_cap],
            key_sentinel,
        )
        group_tile = group_key // (C + 1)
        group_slot = jnp.minimum(group_key % (C + 1), C)
        # first group index of each tile: group_tile is ascending, so
        # compact the tile-heads and scatter the SMALL (T+1,) result
        thead = jnp.concatenate(
            [jnp.ones((1,), bool), group_tile[1:] != group_tile[:-1]]
        )
        tk, tpos = jax.lax.sort(
            (jnp.where(thead, jnp.minimum(group_tile, T), T + 1), iota_g),
            num_keys=1,
            is_stable=True,
        )
        tile_start = (
            jnp.full((T + 1,), G_cap, jnp.int32)
            .at[tk[: T + 1]]
            .min(tpos[: T + 1], mode="drop")
        )
        tile_start = jax.lax.associative_scan(
            jnp.minimum, tile_start, reverse=True
        )
        # per-entry local id, back in pixel-major entry order. The g <
        # G_cap gate also counts entries of capacity-truncated groups as
        # dropped (their tile inherits tile_start = G_cap, which could
        # otherwise alias a small u_sorted in the extreme-overflow regime).
        tile_sorted = sorted_gkey // (C + 1)  # (N,) tile of sorted entry
        u_sorted = g - tile_start[jnp.minimum(tile_sorted, T)]
        ok_sorted = (
            (u_sorted >= 0) & (u_sorted < U) & (tile_sorted < T) & (g < G_cap)
        )
        tile_overflow = jnp.sum(~ok_sorted).astype(jnp.int32)
        # local ids back in pixel-major entry order: sorting by the entry
        # id (a permutation) inverts the (tile, slot) sort — one more
        # near-bandwidth stable sort instead of an element-at-a-time
        # (N,) scatter (measured: scatters of this shape dominated the
        # tiled plan build on TPU; U = overflow marker rides as payload)
        _, u_entry = jax.lax.sort(
            (sorted_eid, jnp.where(ok_sorted, u_sorted, U)),
            num_keys=1,
            is_stable=True,
        )
        u_pm = u_entry.reshape(n, d + 1)
        # dense incidence blocks, built as d+1 fused compare-FMA passes
        # over the (n, U) output — XLA fuses the sum into ONE data pass
        # (compare iota vs local id, multiply-add bary); no scatter at
        # all. Overflow entries (u == U) never match a column.
        bary_pm = bary_t.T  # (n, d+1)
        iota_u = jnp.arange(U, dtype=jnp.int32)
        a_dtype = jnp.bfloat16 if tile_bf16 else bary_pm.dtype
        A2 = jnp.zeros((n, U), a_dtype)
        for r in range(d + 1):
            hit = (u_pm[:, r, None] == iota_u[None, :]).astype(a_dtype)
            A2 = A2 + bary_pm[:, r, None].astype(a_dtype) * hit
        tile_A = A2.reshape(T, P, U)
        # (T, U) global slot per local id: tile t's groups occupy the
        # CONTIGUOUS range [tile_start[t], tile_start[t+1]) of the group
        # list, so one dynamic slice per tile reads its local table — a
        # blocked gather, not a (T·U,) element scatter
        group_slot_pad = jnp.concatenate(
            [group_slot, jnp.full((U,), C, jnp.int32)]
        )
        vid2 = jax.vmap(
            lambda s: jax.lax.dynamic_slice(group_slot_pad, (s,), (U,))
        )(tile_start[:T])
        ucount = (tile_start[1:] - tile_start[:-1])[:, None]  # (T, 1)
        tile_vid = jnp.where(
            jnp.arange(U, dtype=jnp.int32)[None, :] < ucount, vid2, C
        )
        vid_flat = tile_vid.reshape(T * U)
        # partials (flat index t·U+u) in global-slot-sorted order + CSR
        sorted_vid, partial_order = jax.lax.sort(
            (vid_flat, jnp.arange(T * U, dtype=jnp.int32)),
            num_keys=1,
            is_stable=True,
        )
        vhead = jnp.concatenate(
            [jnp.ones((1,), bool), sorted_vid[1:] != sorted_vid[:-1]]
        )
        # CSR via the same sort-compaction as `starts_full` (one head per
        # distinct vid → first C+1 sorted records cover every slot)
        vk, vpos = jax.lax.sort(
            (
                jnp.where(vhead, sorted_vid, jnp.int32(C + 1)),
                jnp.arange(T * U, dtype=jnp.int32),
            ),
            num_keys=1,
            is_stable=True,
        )
        m = min(C + 1, T * U)
        partial_starts = (
            jnp.full((C + 1,), T * U, jnp.int32)
            .at[vk[:m]]
            .min(vpos[:m], mode="drop")
        )
        partial_starts = jax.lax.associative_scan(
            jnp.minimum, partial_starts, reverse=True
        )

    return PermutohedralPlan(
        slot=slot,
        bary=bary_t.T,
        neighbors=neighbors,
        num_valid=num_valid,
        sorted_pixel=sorted_pixel,
        sorted_weight=sorted_weight,
        sorted_seg=seg_capped,
        starts=starts_full,
        band=band,
        piece_group=piece_group,
        piece_weights=piece_weights,
        piece_starts=piece_starts,
        num_pieces=num_pieces,
        tile_A=tile_A,
        tile_vid=tile_vid,
        partial_order=partial_order,
        partial_starts=partial_starts,
        tile_overflow=tile_overflow,
    )


def _build_plan_tiled_lean(
    ref: jax.Array, C: int, P: int, U: int, tile_bf16: bool
) -> PermutohedralPlan:
    """Tiled MXU plan via per-tile BATCHED sorts over one packed key.

    The round-5 redesign of the tiled plan build (`build_plan` general
    path): instead of global dedup over all N = n·(d+1) entries followed
    by a second global (tile, slot) grouping pass (≈6 full-N stable sorts
    with payloads), exploit that consecutive-pixel tiles make entries
    TILE-CONTIGUOUS after a reshape, so the (tile, key) grouping is T
    independent row sorts — one batched `lax.sort` over (T, P·(d+1)),
    each row 6144 elements at the flagship tile instead of 663k global.
    Three batched sorts (group, invert, compact) + small (T·U ≈ 55k)
    global sorts replace everything:

      1. pack the d key columns into ONE int32 with per-column ranges
         widened by ±(d+2), so every blur-neighbor delta is a fixed packed
         OFFSET — the neighbor join (`permutohedral.h:516-520` lookup)
         runs entirely in packed-key space, no column tables at all;
      2. per-tile sort by packed key → segment heads → local vertex ids u
         (prefix sum), inverted back to entry order by a second per-tile
         sort on the local entry id;
      3. heads compact (third per-tile sort) to the ≤U per-tile group
         keys; ONE small global sort over the (T, U) group keys dedups
         them into global vertex ids (first-appearance order = the same
         lexicographic order the general path produces);
      4. dense (P, U) barycentric incidence blocks from u + bary in entry
         order (d+1 fused compare-FMA passes, as the general path).

    Entry CSR tables (`slot`/`sorted_*`/`starts`) are NOT built — apply
    runs exclusively through the tiled MXU splat/slice. Requires the
    packed key to fit int32 (verified by the caller's calibration —
    `pipeline.calibrate_capacity` checks Σ log2(range+2(d+2)) plus the
    sentinel/delta headroom on the calibration frame); entries of tiles
    exceeding U distinct vertices soft-drop (counted in tile_overflow).
    """
    n, d = ref.shape
    if n % P != 0:
        raise ValueError(f"tile={P} must divide n={n}")
    T = n // P
    EPT = P * (d + 1)  # entries per tile
    if U > EPT:
        raise ValueError(f"tile_u={U} exceeds entries-per-tile {EPT}")
    key_cols, bary_t = _simplex_embed_cols(ref)  # d × (d+1, n); (d+1, n)

    # --- widened-range mixed-radix packed key ---------------------------
    marg = d + 2  # > max |coordinate delta| of any blur neighbor (d+1)
    mins = [c.min() for c in key_cols]
    rngs = [c.max() - mn + 1 + 2 * marg for c, mn in zip(key_cols, mins)]
    strides = [None] * d
    stride = jnp.int32(1)
    for k in range(d - 1, -1, -1):
        strides[k] = stride
        stride = stride * rngs[k]
    pk = (key_cols[0] - mins[0] + marg) * strides[0]
    for k in range(1, d):
        pk = pk + (key_cols[k] - mins[k] + marg) * strides[k]  # (d+1, n)

    # packed blur-neighbor deltas (`permutohedral.h:504-509`): axis j < d
    # is +1 everywhere except coord j gets −d; axis d is +1 in all stored
    # coords. Widened ranges make key±delta a VALID packing, so the packed
    # offset is exact and injective — no false matches.
    eye = np.eye(d, dtype=np.int32)
    deltas = [np.ones(d, np.int32) - (d + 1) * eye[j] for j in range(d)]
    deltas.append(np.ones(d, dtype=np.int32))
    pd_list = []
    max_pd = jnp.int32(0)
    for dl in deltas:
        v = jnp.int32(0)
        for k in range(d):
            v = v + jnp.int32(int(dl[k])) * strides[k]
        pd_list.append(v)
        max_pd = jnp.maximum(max_pd, jnp.abs(v))
    pd_arr = jnp.stack(pd_list)  # (d+1,)

    # --- per-tile grouping: ONE batched sort ----------------------------
    # tile-major layout: column le = r·P + p of row t is entry (remainder
    # r, pixel t·P+p) — a pure reshape/transpose of the (d+1, n) columns.
    pk_t = pk.reshape(d + 1, T, P).transpose(1, 0, 2).reshape(T, EPT)
    le = jnp.broadcast_to(
        jnp.arange(EPT, dtype=jnp.int32)[None, :], (T, EPT)
    )
    pk_s, le_s = jax.lax.sort(
        (pk_t, le), dimension=1, num_keys=1, is_stable=True
    )
    ghead = jnp.concatenate(
        [jnp.ones((T, 1), bool), pk_s[:, 1:] != pk_s[:, :-1]], axis=1
    )
    u = (jnp.cumsum(ghead, axis=1) - 1).astype(jnp.int32)  # local group id
    tile_overflow = jnp.sum(u >= U).astype(jnp.int32)
    u_ok = jnp.minimum(u, U)  # U = overflow/drop marker

    # invert to entry order: sorting each row by le restores (r, p) order
    _, u_e = jax.lax.sort((le_s, u_ok), dimension=1, num_keys=1, is_stable=True)
    u_pm = (
        u_e.reshape(T, d + 1, P).transpose(1, 0, 2).reshape(d + 1, n).T
    )  # (n, d+1) — local vertex id per (pixel, remainder)

    # --- dense incidence blocks (same fused compare-FMA as general path)
    bary_pm = bary_t.T  # (n, d+1)
    iota_u = jnp.arange(U, dtype=jnp.int32)
    a_dtype = jnp.bfloat16 if tile_bf16 else bary_pm.dtype
    A2 = jnp.zeros((n, U), a_dtype)
    for r in range(d + 1):
        hit = (u_pm[:, r, None] == iota_u[None, :]).astype(a_dtype)
        A2 = A2 + bary_pm[:, r, None].astype(a_dtype) * hit
    tile_A = A2.reshape(T, P, U)

    # --- per-tile group keys: compact heads by local id -----------------
    # heads carry unique ascending u per row, so after a row sort on
    # (u-if-head else EPT) column u holds group u's key; columns beyond a
    # tile's group count (or ≥ U) are sentinel.
    SENT = pk_s[:, -1].max() + max_pd + jnp.int32(1)
    _, pk_comp = jax.lax.sort(
        (jnp.where(ghead, u, EPT), pk_s), dimension=1, num_keys=1,
        is_stable=True,
    )
    cnt = u[:, -1] + 1  # realized groups per tile
    tile_pk = jnp.where(
        iota_u[None, :] < jnp.minimum(cnt, U)[:, None],
        pk_comp[:, :U],
        SENT,
    )  # (T, U)

    # --- global vertex ids: one SMALL dedup over the T·U group keys -----
    TU = T * U
    flat = tile_pk.reshape(TU)
    iota_tu = jnp.arange(TU, dtype=jnp.int32)
    fs, fi = jax.lax.sort((flat, iota_tu), num_keys=1, is_stable=True)
    fhead = jnp.concatenate([jnp.ones((1,), bool), fs[1:] != fs[:-1]])
    freal = fs < SENT
    vidseq = (jnp.cumsum(fhead) - 1).astype(jnp.int32)
    num_valid = jnp.sum(fhead & freal).astype(jnp.int32)
    vid_sorted = jnp.where(freal, jnp.minimum(vidseq, C), C)
    _, vid_flat = jax.lax.sort((fi, vid_sorted), num_keys=1, is_stable=True)
    tile_vid = vid_flat.reshape(T, U)

    # unique packed key per vertex slot (compact the dedup heads)
    uk_key = jnp.where(fhead & freal, jnp.minimum(vidseq, C), jnp.int32(C + 1))
    _, uk = jax.lax.sort((uk_key, fs), num_keys=1, is_stable=True)
    if TU < C:
        uk = jnp.concatenate([uk, jnp.full((C - TU,), SENT, jnp.int32)])
    iota_c = jnp.arange(C, dtype=jnp.int32)
    unique_pk = jnp.where(iota_c < num_valid, uk[:C], SENT)

    # --- blur neighbors: sort-merge join in packed-key space ------------
    vids = iota_c
    queries = jnp.concatenate(
        [
            (unique_pk[None, :] + pd_arr[:, None]).reshape(-1),
            (unique_pk[None, :] - pd_arr[:, None]).reshape(-1),
        ]
    )  # (2·(d+1)·C,)
    Q = queries.shape[0]
    comb = jnp.concatenate([unique_pk, queries])
    marker = jnp.concatenate([vids, jnp.full((Q,), -1, jnp.int32)])
    qid = jnp.concatenate(
        [jnp.full((C,), Q, jnp.int32), jnp.arange(Q, dtype=jnp.int32)]
    )
    ck, m_srt, qid_srt = jax.lax.sort(
        (comb, marker, qid), num_keys=1, is_stable=True
    )
    head2 = jnp.concatenate([jnp.ones((1,), bool), ck[1:] != ck[:-1]])
    prop, _ = jax.lax.associative_scan(_seg_max, (m_srt, head2))
    _, res_sorted = jax.lax.sort((qid_srt, prop), num_keys=1, is_stable=True)
    found = res_sorted[:Q]
    found = jnp.where(found < 0, jnp.int32(C), found)
    plus = found[: (d + 1) * C].reshape(d + 1, C)
    minus = found[(d + 1) * C :].reshape(d + 1, C)
    neighbors = jnp.stack([plus, minus], axis=-1)

    band = jnp.int32(0)
    for half in (plus, minus):
        offs = jnp.abs(half - vids[None, :])
        band = jnp.maximum(band, jnp.max(jnp.where(half != C, offs, 0)))

    # --- slot-sorted partial CSR (same trick as the general path) -------
    sorted_vid, partial_order = jax.lax.sort(
        (vid_flat, iota_tu), num_keys=1, is_stable=True
    )
    vhead = jnp.concatenate(
        [jnp.ones((1,), bool), sorted_vid[1:] != sorted_vid[:-1]]
    )
    vk, vpos = jax.lax.sort(
        (jnp.where(vhead, sorted_vid, jnp.int32(C + 1)), iota_tu),
        num_keys=1,
        is_stable=True,
    )
    mm = min(C + 1, TU)
    partial_starts = (
        jnp.full((C + 1,), TU, jnp.int32).at[vk[:mm]].min(vpos[:mm], mode="drop")
    )
    partial_starts = jax.lax.associative_scan(
        jnp.minimum, partial_starts, reverse=True
    )

    return PermutohedralPlan(
        slot=None,
        bary=bary_pm,
        neighbors=neighbors,
        num_valid=num_valid,
        sorted_pixel=None,
        sorted_weight=None,
        sorted_seg=None,
        starts=None,
        band=band.astype(jnp.int32),
        tile_A=tile_A,
        tile_vid=tile_vid,
        partial_order=partial_order,
        partial_starts=partial_starts,
        tile_overflow=tile_overflow,
    )


def rotation_matrices(d: int, k: int, seed: int = 7) -> list[np.ndarray]:
    """k fixed orthogonal rotations of feature space (identity first).

    The Gaussian kernel is rotation-invariant, so filtering through a
    rotated reference computes the SAME operator — but on a differently
    oriented lattice discretization. Averaging k such lattices averages
    out the anisotropic part of the permutohedral approximation error
    (the radial part is already handled by the blur-compensated embedding
    scale). Host-side QR of fixed-seed Gaussians: deterministic, static.
    """
    rs = np.random.RandomState(seed)
    mats = [np.eye(d)]
    for _ in range(1, k):
        q, r = np.linalg.qr(rs.randn(d, d))
        mats.append(q * np.sign(np.diag(r)))
    return mats


@jax.jit
def count_vertices(ref: jax.Array) -> jax.Array:
    """Number of occupied lattice vertices for `ref` (dedup only — no
    neighbor resolution). Use to pick a tight static `max_vertices`:
    occupancy is strongly data-dependent (~0.04n on smooth natural images
    at the flagship σs, ~0.7n on noise)."""
    n, d = ref.shape
    key_cols, _ = _simplex_embed_cols(ref)
    flat_cols = [kc.reshape(n * (d + 1)) for kc in key_cols]
    _, row_changed, _ = _sort_rows(flat_cols)
    return 1 + jnp.sum(row_changed)


def suggest_capacity(ref, headroom: float = 2.0) -> int:
    """Concrete (host-side) capacity suggestion: pow2 ≥ headroom·occupancy."""
    occ = int(count_vertices(jnp.asarray(ref)))
    want = max(int(occ * headroom), 64)
    return 1 << (want - 1).bit_length()


def suggest_sort_mode(ref) -> str:
    """Host-side sort-strategy pin for calibrated serving/bench paths.

    Returns 'packed1' when THIS guide's lattice coordinate ranges, widened
    by the ±(d+2) blur-neighbor margin, pack into one int32 key AND the
    lean build's sentinel/query arithmetic (pk_max + 2·max|packed delta|)
    stays in int32 with one spare bit of drift headroom — the common case
    for bilateral/feature guides. 'auto' (traced fit test) otherwise.
    Only pin a mode measured on a representative frame: a pinned
    'packed1' that does not fit silently corrupts the dedup. The check is
    exact Python-int arithmetic over this frame's measured ranges.
    """
    ref = jnp.asarray(ref)
    d = ref.shape[1]
    key_cols, _ = jax.jit(_simplex_embed_cols)(ref)
    marg = d + 2
    rngs = [
        int(jnp.max(c)) - int(jnp.min(c)) + 1 + 2 * marg for c in key_cols
    ]
    strides = [1] * d
    for k in range(d - 2, -1, -1):
        strides[k] = strides[k + 1] * rngs[k + 1]
    pk_max = strides[0] * rngs[0] - 1
    max_pd = 0
    for j in range(d + 1):
        dl = [1] * d
        if j < d:
            dl[j] -= d + 1
        max_pd = max(max_pd, abs(sum(dl[k] * strides[k] for k in range(d))))
    return "packed1" if pk_max + 2 * max_pd + 2 < 2 ** 30 else "auto"


def suggest_tile_u(ref, tile: int, max_vertices: int,
                   headroom: float = 1.33) -> int:
    """Host-side per-tile vertex capacity suggestion for the tiled MXU
    splat/slice: headroom·(max distinct vertices in any tile of `tile`
    consecutive pixels), rounded up to a multiple of 128 (full MXU/lane
    blocks), capped at the tile·(d+1) worst case. Builds one throwaway
    plan (calibration-time only; callers cache)."""
    ref = jnp.asarray(ref)
    n, d = ref.shape
    plan = jax.jit(partial(build_plan, max_vertices=max_vertices))(ref)
    slot = np.asarray(plan.slot)  # (n, d+1)
    T = n // tile
    umax = max(
        len(np.unique(slot[t * tile : (t + 1) * tile])) for t in range(T)
    )
    want = min(int(np.ceil(umax * headroom)), tile * (d + 1))
    return -(-want // 128) * 128


def suggest_pieces(ref, max_vertices: int, pack: int = 8,
                   headroom: float = 1.1) -> int:
    """Host-side piece-capacity suggestion: headroom·pieces rounded up to
    a 4096 multiple. Deliberately TIGHT (not pow2): every padding row
    costs a full gather + reduce row per filter call, so a 2× pow2 bound
    would erase the piece path's row savings.

    Builds a throwaway plan to count the realized pieces for THIS guide
    at the given capacity/pack (calibration-time only — serving/bench do
    this once per stream)."""
    plan = jax.jit(
        partial(build_plan, max_vertices=max_vertices, max_pieces=8, pack=pack)
    )(jnp.asarray(ref))
    want = max(int(int(plan.num_pieces) * headroom), 4096)
    return -(-want // 4096) * 4096


# ---------------------------------------------------------------------------
# Apply: splat → blur → slice (linear in src)
# ---------------------------------------------------------------------------

_LANES = 128


def _row_gather(
    table: jax.Array, idx: jax.Array, packed: bool | None = None
) -> jax.Array:
    """Gather rows of a (R, L) table at integer indices of any shape.

    TPU layouts pad the minor dimension to 128 lanes; re-packing `pack` =
    128//L rows per lane-row lets the gather read at full utilization, at
    the price of an 8×-wider gathered intermediate before the row select.
    Measured on v5e: a WIN for the blur (table-to-table gathers, 3.6→3.0ms
    per 6 passes) but a LOSS for pixel-side gathers whose outputs dominate
    (slice 6.2→15.3ms) — so only the blur uses this. Exactly equivalent to
    `table[idx]`.

    TPU-only by default: on the CPU backend the packing buys nothing AND
    the pad→reshape→gather→one-hot-einsum chain, fused into the
    surrounding blur graph, triggers an XLA:CPU codegen heap overflow
    (glibc aborts `corrupted size vs. prev_size` / garbage outputs, ~25%
    of runs on jaxlib 0.9.0; minimal repro: plan+splat+packed-blur at
    (121, 4) f64). `packed=None` sniffs the backend at trace time: tests
    and the virtual mesh take the plain-gather path, real TPU keeps the
    packed layout. Pass `packed=True/False` to override — CI property-
    tests the packed form STANDALONE on CPU (the heap bug needs the fused
    blur graph around it), so the exact arithmetic TPU executes stays
    covered by the CPU suite.
    """
    R, L = table.shape
    pack = max(1, _LANES // max(L, 1))
    if packed is None:
        import os

        env = os.environ.get("DET_ROW_GATHER_PACKED")
        if env in ("0", "1"):  # A/B override
            packed = env == "1"
        else:
            # packing pays only for LARGE tables (the r1 win was measured
            # at safe-default capacities); at calibrated flagship size
            # (16k rows) the plain gather measured faster on TPU v5e
            # (blur 0.434 → 0.280 ms, round 4) — the pad/reshape/one-hot
            # select overhead outweighs the lane utilization gain.
            packed = jax.default_backend() != "cpu" and R >= 65536
    if pack == 1 or not packed:
        return table[idx]
    G = -(-R // pack)
    padded = jnp.pad(table, ((0, G * pack - R), (0, 0)))
    packed = padded.reshape(G, pack * L)
    g = idx // pack
    k = idx % pack
    rows = packed[g]  # (..., pack·L) — full-lane gather
    segs = rows.reshape(idx.shape + (pack, L))
    onehot = (k[..., None] == jnp.arange(pack)).astype(table.dtype)
    return jnp.einsum("...p,...pl->...l", onehot, segs)


def _cumsum_rows(x: jax.Array, base: int = 2048) -> jax.Array:
    """Inclusive prefix sum along axis 0 of (M, L) via MXU block scans.

    `jnp.cumsum` over the major axis of an (M, L) array runs ~log2(M)
    full-array passes, each wasting the padded 128−L lanes when L < 128 —
    measured 5.9 ms for the flagship splat's (663k, 16) scan, ~13× over
    roofline (and a sublane-axis mini-cumsum variant measured no better:
    a (R, G, L) layout still pads L to 128 lanes). The fix is to feed the
    scan to the MXU instead of the VPU:

      pack G = 128//L CONSECUTIVE rows into one full 128-lane row (a free
      contiguous reshape), then the intra-group inclusive scan over the G
      sub-rows of every lane-row is ONE (M/G, 128) @ (128, 128) matmul
      with a block-lower-triangular ones matrix T[aL+l, bL+l] = [a ≤ b];
      recurse on the G-fold-smaller per-group totals and broadcast-add.

    ~2 data passes + 2.7 GFLOP at the flagship size (vs ~20 padded passes
    for jnp.cumsum); L ≥ 128 skips packing and scans S=128-row blocks with
    a plain tril matmul (full-width N). Exact up to f32 reassociation."""
    M, L = x.shape
    if M <= base:
        return jnp.cumsum(x, axis=0)
    acc = jnp.promote_types(x.dtype, jnp.float32)
    G = _LANES // max(L, 1)
    if G >= 2:
        # lane-packed: (R, G·L) with G consecutive rows per lane-row
        R = -(-M // G)
        xp = jnp.pad(x, ((0, R * G - M), (0, 0))).reshape(R, G * L)
        a = np.arange(G * L) // L
        same_l = (np.arange(G * L)[:, None] % L) == (np.arange(G * L)[None, :] % L)
        T = jnp.asarray(((a[:, None] <= a[None, :]) & same_l).astype(np.dtype(acc)))
        intra = jnp.matmul(xp, T, preferred_element_type=acc)  # (R, G·L)
        totals = intra[:, (G - 1) * L :]  # (R, L) per-group sums
        gpref = _cumsum_rows(totals, base)
        shift = jnp.concatenate([jnp.zeros((1, L), gpref.dtype), gpref[:-1]], axis=0)
        out = intra + jnp.tile(shift, (1, G))
        return out.reshape(R * G, L)[:M].astype(x.dtype)
    # wide rows: scan S-row blocks with a plain triangular matmul (N = L full)
    S = 128
    R = -(-M // S)
    xp = jnp.pad(x, ((0, R * S - M), (0, 0))).reshape(R, S, L)
    T = jnp.asarray(np.tril(np.ones((S, S), np.dtype(acc))))
    intra = jnp.einsum("st,rtl->rsl", T, xp, preferred_element_type=acc)
    gpref = _cumsum_rows(intra[:, -1], base)  # (R, L)
    shift = jnp.concatenate([jnp.zeros((1, L), gpref.dtype), gpref[:-1]], axis=0)
    return (intra + shift[:, None, :]).reshape(R * S, L)[:M].astype(x.dtype)


def _boundary_reduce(contrib: jax.Array, starts: jax.Array, out_dtype) -> jax.Array:
    """Sum slot-sorted (M, L) contribution rows into (C+1, L) vertex rows
    given CSR boundaries `starts` (C+1 ascending positions in [0, M]);
    row C of the output is the zero sentinel.

    Only the boundary values of the M-row prefix sum are ever read, so
    the full cumsum is never materialized (a 42 MB write at flagship
    scale; measured 5.9 ms as a padded-lane scan, 2.8 ms as an MXU block
    scan, ~0.4 ms in this boundary-only form):

      1. per-block totals of G = 128/L consecutive rows (one data pass),
      2. exclusive prefix over the M/G block totals (recursive MXU scan
         on a G-fold smaller array),
      3. cs[p] for each boundary p: one full-lane row gather of p's block
         + a masked partial sum of its first p mod G rows.
    """
    M, L = contrib.shape
    acc = contrib.dtype
    G = max(_LANES // max(L, 1), 1)
    R = -(-M // G)
    xp = jnp.pad(contrib, ((0, R * G - M), (0, 0))).reshape(R, G, L)
    totals = xp.sum(axis=1)  # (R, L)
    gpref = _cumsum_rows(totals)  # inclusive (R, L)
    gpref_ex = jnp.concatenate([jnp.zeros((1, L), gpref.dtype), gpref], axis=0)

    b = starts // G
    o = starts % G
    rows = xp.reshape(R, G * L)[jnp.minimum(b, R - 1)]  # (C+1, G·L) full-lane
    mask = (jnp.arange(G)[None, :] < o[:, None]).astype(acc)  # (C+1, G)
    partial = jnp.einsum("cg,cgl->cl", mask, rows.reshape(-1, G, L))
    cs_at = gpref_ex[b] + partial  # (C+1, L) == cumsum at the boundaries
    vals = (cs_at[1:] - cs_at[:-1]).astype(out_dtype)  # (C, L)
    return jnp.concatenate([vals, jnp.zeros((1, L), out_dtype)], axis=0)


def _splat(plan: PermutohedralPlan, src: jax.Array) -> jax.Array:
    """(n, L) → (C+1, L) vertex values; row C is the zero sentinel.

    Entries are pre-sorted by slot, so splatting is a CSR reduction at
    the segment boundaries (`_boundary_reduce`) — no duplicate-heavy
    scatter (TPU segment reductions serialize under ~10²-dup
    distributions).

    Two gather strategies feed the reduction:
      - entry-wise (always available): one (L-lane) row gather per
        entry — N = n·(d+1) random 64 B rows at L=16, the measured
        per-iteration bottleneck (row-transaction-bound).
      - piece-wise (when the plan carries piece tables and G·L ≤ 128):
        one FULL-LANE packed row gather per piece + a per-piece (G,)
        weight contraction — ~2.4× fewer rows at flagship, each fully
        utilized.
    """
    n, L = src.shape
    acc = jnp.promote_types(src.dtype, jnp.float32)
    if plan.tile_A is not None:
        # tiled MXU form: per-tile dense incidence matmul → ≤ T·U partial
        # vertex rows → slot-sorted CSR reduce. Replaces the n·(d+1)
        # random 64 B-row src gather with sequential reads + matmuls.
        T, P, U = plan.tile_A.shape
        s3 = src.reshape(T, P, L).astype(plan.tile_A.dtype)
        partials = jnp.einsum(
            "tpu,tpl->tul",
            plan.tile_A,
            s3,
            preferred_element_type=acc,
        ).astype(acc).reshape(T * U, L)
        contrib = partials[plan.partial_order].astype(acc)
        return _boundary_reduce(contrib, plan.partial_starts, src.dtype)
    pw = plan.piece_weights
    if pw is not None and pw.shape[1] * L <= _LANES:
        T_P, G = pw.shape
        R = -(-n // G)
        packed = jnp.pad(src, ((0, R * G - n), (0, 0))).reshape(R, G * L)
        rows = packed[plan.piece_group]  # (T_P, G·L) full-lane gather
        contrib = jnp.einsum(
            "tg,tgl->tl",
            pw.astype(acc),
            rows.reshape(T_P, G, L).astype(acc),
        )
        return _boundary_reduce(contrib, plan.piece_starts, src.dtype)
    contrib = (plan.sorted_weight[:, None] * src[plan.sorted_pixel]).astype(acc)
    return _boundary_reduce(contrib, plan.starts, src.dtype)


def _blur_pass(vals: jax.Array, nbr: jax.Array) -> jax.Array:
    """One axis of the unnormalized [1/2, 1, 1/2] lattice blur
    (`permutohedral.h:524-526`, incl. Krähenbühl's factor 2)."""
    M = vals.shape[0] - 1
    v1 = _row_gather(vals, nbr[:, 0])
    v2 = _row_gather(vals, nbr[:, 1])
    new = vals[:M] + 0.5 * (v1 + v2)
    return vals.at[:M].set(new)


def _blur(plan: PermutohedralPlan, vals: jax.Array, reverse: bool) -> jax.Array:
    d = plan.d
    axes = range(d, -1, -1) if reverse else range(d + 1)
    for j in axes:
        vals = _blur_pass(vals, plan.neighbors[j])
    return vals


def _slice(plan: PermutohedralPlan, vals: jax.Array) -> jax.Array:
    """Gather vertex values back to pixels with barycentric weights, scaled
    by the 1/(1+2^-d) constant (`permutohedral.h:480`)."""
    d = plan.d
    if plan.tile_A is not None:
        # tiled MXU form (exact transpose structure of the tiled splat):
        # one U-row gather per tile + a dense (P, U) @ (U, L) matmul.
        T, P, U = plan.tile_A.shape
        L = vals.shape[1]
        V = vals[plan.tile_vid]  # (T, U, L); padding rows hit the zero row
        out = jnp.einsum(
            "tpu,tul->tpl", plan.tile_A, V.astype(plan.tile_A.dtype),
            preferred_element_type=jnp.promote_types(vals.dtype, jnp.float32),
        )
        return out.reshape(T * P, L).astype(vals.dtype) / (1.0 + 2.0 ** (-d))
    # accumulate corner-by-corner: 6 fused gather+axpy passes instead of
    # materializing the (n, d+1, L) gathered tensor
    out = plan.bary[:, 0, None] * vals[plan.slot[:, 0]]
    for r in range(1, d + 1):
        out = out + plan.bary[:, r, None] * vals[plan.slot[:, r]]
    return out / (1.0 + 2.0 ** (-d))


def apply_plan(
    plan: PermutohedralPlan,
    src: jax.Array,
    reverse: bool = False,
) -> jax.Array:
    """Filter (n, L) values through a prebuilt plan. Linear in `src`.

    `reverse=True` applies the transposed filter (blur axes in reverse
    order), used for the ∂src VJP — the splat/slice pair is already
    symmetric (same slots and weights).
    """
    vals = _splat(plan, src)
    blurred = _blur(plan, vals, reverse)
    return _slice(plan, blurred)


# ---------------------------------------------------------------------------
# Differentiable filter (custom VJP)
# ---------------------------------------------------------------------------
#
# The plan is an explicit (pytree) argument of the custom-VJP primitive so
# it is built ONCE per reference image and reused across label channels,
# all mean-field iterations, and the forward+backward passes — the
# Krähenbühl init/compute split (`krahenbuhl.cpp:138-320`), now with exact
# gradient plumbing. Cotangents for the integer plan arrays are float0
# zeros; `bary`'s true ref-dependence is accounted for analytically by the
# 4-filter identity, so its direct cotangent is zero as well.


@jax.custom_vjp
def _planned_filter(src, ref, plan: PermutohedralPlan):
    return apply_plan(plan, src)


def _planned_fwd(src, ref, plan):
    return apply_plan(plan, src), (src, ref, plan)


def _planned_bwd(res, g):
    src, ref, plan = res
    n, L = src.shape
    d = ref.shape[1]
    # ∂src: transposed filter through the same plan (exact — the forward is
    # linear in src). `crf/gaussian_matrix.py:445-446` uses symmetry; we
    # additionally reverse the blur axis order for exact transposition.
    grad_src = apply_plan(plan, g, reverse=True)

    # ∂ref: 4-filter identity (`crf/gaussian_matrix.py:450-463`) for
    # W_ij = exp(-‖r_i−r_j‖²/2):
    #   dL/dr_i = -[ s_i r_i (Wg)_i − s_i (W(g⊗r))_i
    #              + g_i r_i (Ws)_i − g_i (W(s⊗r))_i ]
    # One filter call of width 2L(d+1) through the same plan.
    gf = g[..., None] * ref[:, None, :]  # (n, L, d)
    sf = src[..., None] * ref[:, None, :]
    stacked = jnp.concatenate(
        [g, gf.reshape(n, L * d), src, sf.reshape(n, L * d)], axis=-1
    )
    filtered = apply_plan(plan, stacked)
    wg = filtered[:, :L]
    wgf = filtered[:, L : L + L * d].reshape(n, L, d)
    ws = filtered[:, L + L * d : 2 * L + L * d]
    wsf = filtered[:, 2 * L + L * d :].reshape(n, L, d)
    grad_ref = -(
        sf * wg[..., None] - src[..., None] * wgf + gf * ws[..., None] - g[..., None] * wsf
    ).sum(-2)

    f0 = jax.dtypes.float0

    def z_int(x):  # integer leaves: float0 cotangent (or absent)
        return None if x is None else np.zeros(x.shape, f0)

    def z_flt(x):  # float leaves: explicit zeros (or absent)
        return None if x is None else jnp.zeros_like(x)

    plan_cot = PermutohedralPlan(
        slot=z_int(plan.slot),
        bary=z_flt(plan.bary),
        neighbors=z_int(plan.neighbors),
        num_valid=z_int(plan.num_valid),
        sorted_pixel=z_int(plan.sorted_pixel),
        sorted_weight=z_flt(plan.sorted_weight),
        sorted_seg=z_int(plan.sorted_seg),
        starts=z_int(plan.starts),
        band=z_int(plan.band),
        piece_group=z_int(plan.piece_group),
        piece_weights=z_flt(plan.piece_weights),
        piece_starts=z_int(plan.piece_starts),
        num_pieces=z_int(plan.num_pieces),
        tile_A=z_flt(plan.tile_A),
        tile_vid=z_int(plan.tile_vid),
        partial_order=z_int(plan.partial_order),
        partial_starts=z_int(plan.partial_starts),
        tile_overflow=z_int(plan.tile_overflow),
    )
    return grad_src, grad_ref, plan_cot


_planned_filter.defvjp(_planned_fwd, _planned_bwd)


def lattice_filter_planned(src: jax.Array, ref: jax.Array, plan: PermutohedralPlan) -> jax.Array:
    """Filter through a prebuilt plan, differentiable in src AND ref.

    The caller guarantees `plan == build_plan(ref)` (up to the gradient
    approximation this is what makes ∂ref correct). Use inside mean-field
    loops: one `build_plan` per image, many cheap filter calls.
    """
    return _planned_filter(src, ref, plan)


def lattice_filter(
    src: jax.Array,
    ref: jax.Array,
    normalize: str = "none",
    num_lattices: int = 1,
    max_vertices: int | None = None,
) -> jax.Array:
    """Approximate Gaussian filter: Σ_j exp(-‖ref_i−ref_j‖²/2)·src_j.

    Args:
      src: (n, L) values; ref: (n, d) features (pre-scaled by 1/σ).
      normalize: 'none' (reference lite CPU semantics — unnormalized,
        what the CRF stack is tuned on) or 'homogeneous' (divide by the
        filtered ones channel — CUDA `permutohedral.cu:404-406` semantics;
        gradients flow through the quotient automatically).
      num_lattices: quality dial — average k lattices at fixed orthogonal
        rotations of feature space (`rotation_matrices`). The kernel is
        rotation-invariant so each lattice approximates the SAME operator;
        averaging cancels the anisotropic discretization error (measured
        d=5: normalized rel-err 0.91% → 0.67% at k=4). Cost is k× plan+
        apply. k=1 (default) is the reference-parity single lattice.

    Differentiable in both args: ∂src via the transpose filter, ∂ref via the
    analytic 4-filter identity (see module docstring).
    """
    if normalize not in ("none", "homogeneous"):
        raise ValueError(f"unknown normalize mode {normalize!r}")
    x = src
    if normalize == "homogeneous":
        ones = jnp.ones(src.shape[:1] + (1,), src.dtype)
        x = jnp.concatenate([src, ones], -1)
    d = ref.shape[1]
    acc = None
    for m, R in enumerate(rotation_matrices(d, num_lattices)):
        ref_m = ref if m == 0 else ref @ jnp.asarray(R, ref.dtype)
        plan = build_plan(jax.lax.stop_gradient(ref_m), max_vertices=max_vertices)
        out_m = lattice_filter_planned(x, ref_m, plan)
        acc = out_m if acc is None else acc + out_m
    out = acc / num_lattices if num_lattices > 1 else acc
    if normalize == "homogeneous":
        return out[:, :-1] / jnp.maximum(out[:, -1:], 1e-20)
    return out


def lattice_adjacency(src: jax.Array, ref: jax.Array) -> jax.Array:
    """(W − I) @ src message-passing operator (`LatticeGaussian`,
    `crf/gaussian_matrix.py:292-303`)."""
    return lattice_filter(src, ref) - src


def lattice_filter_batched(srcs: jax.Array, refs: jax.Array, normalize: str = "none"):
    """Batched filter over leading dim: (B, n, L), (B, n, d) → (B, n, L).

    The reference fans a CPU process pool over the batch
    (`BatchedLatticeFilter` + `batched_filter`,
    `crf/gaussian_matrix.py:370-421`); here one `vmap` batches the whole
    plan build + apply into a single XLA program.
    """
    return jax.vmap(lambda s, r: lattice_filter(s, r, normalize))(srcs, refs)


def batched_lattice_adjacency(src_imgs: jax.Array, guide_imgs: jax.Array) -> jax.Array:
    """(B, h, w, L), (B, h, w, d) image-space batched (W − I)@src
    (`BatchedAdjacency.forward`, `crf/gaussian_matrix.py:341-352`)."""
    B, h, w, L = src_imgs.shape
    d = guide_imgs.shape[-1]
    flat_src = src_imgs.reshape(B, h * w, L)
    flat_ref = guide_imgs.reshape(B, h * w, d)
    out = lattice_filter_batched(flat_src, flat_ref)
    return out.reshape(B, h, w, L) - src_imgs
