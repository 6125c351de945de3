"""Permutohedral-lattice high-dimensional Gaussian filtering, XLA-native.

The O(n) approximation to dense Gaussian filtering
    filter(src, ref)_i = Σ_j exp(-‖ref_i − ref_j‖²/2) · src_j
(Adams/Baek/Davis 2010), re-designed for TPU/XLA from the reference's
hash-table C++/CUDA implementations (`crf/lattice/lite/permutohedral.h`,
`crf/lattice/cuda_lattice/permutohedral.cu`). This is NOT a port: the
open-addressing hash tables, atomics and replay buffers are replaced by a
fixed-shape, race-free sort/segment-sum formulation that XLA compiles to
fused sort + gather/scatter passes:

  plan   = f(ref):  embed → simplex → barycentric  (pure elementwise math,
           `permutohedral.h:376-461` semantics), then vertex dedup + slot
           assignment by a race-free lock-step parallel hash build and
           neighbor resolution by verified hash probes (replacing the
           sequential open-addressing table of `permutohedral.h:29-169`
           and `hashTable.lookup` in the blur, `permutohedral.h:486-548`
           — see `build_plan` for the exact scheme).
  apply  = splat (segment_sum) → blur (d+1 gather-axpy passes of the
           unnormalized [1/2, 1, 1/2] kernel) → slice (gather + barycentric
           recombine, scaled by 1/(1+2^-d), `permutohedral.h:473-483`).

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
    "lattice_adjacency",
    "simplex_embed",
    "count_vertices",
    "suggest_capacity",
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
    """
    n, d = ref.shape
    E = jnp.asarray(_embedding_matrix(d), ref.dtype)
    canonical = jnp.asarray(_canonical_simplex(d))

    elevated = ref @ E.T  # (n, d+1)

    # Greedy nearest multiple-of-(d+1) point (`permutohedral.h:391-402`).
    v = elevated / (d + 1)
    up = jnp.ceil(v) * (d + 1)
    down = jnp.floor(v) * (d + 1)
    greedy = jnp.where(up - elevated < elevated - down, up, down)
    greedy = greedy.astype(jnp.int32)
    coord_sum = jnp.sum(greedy, axis=1) // (d + 1)  # (n,) int

    # Rank of the differential, descending, ties to lower index
    # (`permutohedral.h:405-411`). O(d²) pairwise comparison — d is small.
    diff = elevated - greedy  # (n, d+1)
    gt = diff[:, :, None] < diff[:, None, :]  # [i, j] : diff_i < diff_j
    idx = jnp.arange(d + 1)
    tie = (diff[:, :, None] == diff[:, None, :]) & (idx[None, :, None] > idx[None, None, :])
    rank = (gt | tie).sum(-1).astype(jnp.int32)  # (n, d+1) in 0..d

    # Walk back onto the hyperplane (`permutohedral.h:413-433`).
    s = coord_sum[:, None]
    rank_s = rank + s
    too_high = rank_s >= d + 1
    too_low = rank_s < 0
    greedy = jnp.where(too_high, greedy - (d + 1), jnp.where(too_low, greedy + (d + 1), greedy))
    rank = jnp.where(too_high, rank_s - (d + 1), jnp.where(too_low, rank_s + (d + 1), rank_s))

    # Barycentric coordinates (`permutohedral.h:436-441`): scatter the
    # sorted differentials into a (d+2)-vector via one-hot sums.
    t = (elevated - greedy) / (d + 1)  # (n, d+1)
    oh_lo = jax.nn.one_hot(d - rank, d + 2, dtype=t.dtype)  # bary[d-rank] += t
    oh_hi = jax.nn.one_hot(d + 1 - rank, d + 2, dtype=t.dtype)  # bary[d+1-rank] -= t
    bary = jnp.einsum("nk,nkb->nb", t, oh_lo - oh_hi)
    bary = bary.at[:, 0].add(1.0 + bary[:, d + 1])
    bary = bary[:, : d + 1]  # (n, d+1)

    # Vertex keys (`permutohedral.h:444-447`): key_r[i] = greedy[i] +
    # canonical[r, rank[i]], stored for the first d coordinates.
    can = canonical[:, rank]  # (d+1, n, d+1) — canonical[r, rank[n, i]]
    keys = greedy[None, :, :d] + jnp.transpose(can, (0, 1, 2))[:, :, :d]
    keys = jnp.transpose(keys, (1, 0, 2))  # (n, d+1, d)
    return keys, bary


# ---------------------------------------------------------------------------
# Plan construction: dedup + neighbor resolution
# ---------------------------------------------------------------------------


class PermutohedralPlan(NamedTuple):
    """Static-shape lattice 'plan' — everything derived from `ref`.

    M = n·(d+1) is the vertex capacity; `num_valid` (traced scalar) counts
    the actually-occupied slots. Slot M is the zero sentinel for missing
    neighbors.
    """

    slot: jax.Array  # (n, d+1) int32 — vertex slot per (pixel, remainder)
    bary: jax.Array  # (n, d+1) barycentric weights
    neighbors: jax.Array  # (d+1, M, 2) int32 — blur neighbor slots (M = missing)
    num_valid: jax.Array  # () int32

    @property
    def d(self) -> int:
        # static: derived from array shape, never a traced leaf
        return self.neighbors.shape[0] - 1

    @property
    def capacity(self) -> int:
        return self.neighbors.shape[1]


_HASH_MULT = jnp.int32(-1900272385)  # 0x8da6b343 — odd multiplicative mixer


def _hash_keys(keys: jax.Array) -> jax.Array:
    """Multiplicative fold of (…, d) int32 coords → int32 hash.

    Same shape of scheme as the reference's short-key fold
    (`permutohedral.h:109-116`), 32-bit; quality only affects probe count —
    every probe verifies the full key by gather+compare.
    """
    d = keys.shape[-1]
    h = jnp.zeros(keys.shape[:-1], jnp.int32)
    for k in range(d):
        h = (h + keys[..., k]) * _HASH_MULT
        h = h ^ (h >> 13)
    return h


_MAX_PROBES = 64  # linear-probe bound; load factor ≤ 0.5 keeps actual ~2


def build_plan(ref: jax.Array, max_vertices: int | None = None) -> PermutohedralPlan:
    """Build the lattice plan from (n, d) reference features. Pure int32.

    All shapes are static and everything is sort-free: the reference's
    open-addressing hash table (`permutohedral.h:29-169`) is replaced by a
    race-free parallel hash build (profiling showed a lexicographic
    multi-key sort to be ~100× slower than needed on TPU):

    1. **Dedup + slot assignment**: all n·(d+1) simplex-vertex keys probe a
       power-of-two table in lock-step rounds. Each round, every still-
       unplaced entry scatter-mins its id into ONE candidate slot; the
       round's winners are merged only into EMPTY slots (claimed slots are
       immutable, so homes never move — the sequential linear-probing
       invariant holds without atomics). Duplicate keys share a probe
       schedule, so they all resolve to the same slot. Expected rounds ≈ 2
       at load ≤ 0.5.
    2. **Compaction**: occupied table positions are renumbered by a prefix
       sum so the value arrays are dense (static capacity `max_vertices`,
       default n·(d+1) = exact; pass pow2 ≥ 2n for speed — measured
       bilateral occupancy on natural images is ~0.7n; overflow routes to
       the zero sentinel and shows as num_valid ≥ capacity).
    3. **Neighbor resolution**: verified gather probes of the same table
       per blur neighbor (≙ `hashTable.lookup(key, false)` at
       `permutohedral.h:516-520`).
    """
    n, d = ref.shape
    keys, bary = simplex_embed(ref)
    N = n * (d + 1)
    # Default capacity N is EXACT (worst case every pixel-vertex unique).
    # Pass a tighter static capacity (e.g. pow2 ≥ 2n — bilateral guides on
    # natural images occupy ~0.7n) to shrink the blur working set ~3-8×;
    # overflow beyond capacity routes to the zero sentinel (soft degrade,
    # visible as num_valid ≥ capacity).
    C = N if max_vertices is None else int(max_vertices)
    flat_keys = keys.reshape(N, d)

    T = 1 << max(1, (2 * N - 1).bit_length())  # pow2 ≥ 2N → load ≤ 0.5
    mask = jnp.int32(T - 1)
    h0 = _hash_keys(flat_keys)  # (N,)
    entry_ids = jnp.arange(N, dtype=jnp.int32)
    EMPTY = jnp.int32(N)

    # --- 1) lock-step insertion: claimed slots are immutable -----------
    def insert_round(state):
        table, slot_pos, placed, r = state
        idx = (h0 + r) & mask
        active = ~placed
        # This round's winner per contested slot (scatter-min into a fresh
        # buffer), merged into EMPTY table slots only — a claimed slot is
        # never overwritten, so vertex homes are final.
        cand = jnp.full((T,), EMPTY, jnp.int32).at[
            jnp.where(active, idx, T)
        ].min(entry_ids, mode="drop")
        table = jnp.where(table == EMPTY, cand, table)
        owner = table[idx]
        owner_keys = flat_keys[jnp.minimum(owner, N - 1)]
        match = (owner != EMPTY) & jnp.all(owner_keys == flat_keys, axis=-1)
        slot_pos = jnp.where(active & match, idx, slot_pos)
        return table, slot_pos, placed | match, r + 1

    def insert_cond(state):
        _, _, placed, r = state
        return (r < _MAX_PROBES) & ~jnp.all(placed)

    state0 = (
        jnp.full((T,), EMPTY, jnp.int32),
        jnp.zeros((N,), jnp.int32),
        jnp.zeros((N,), bool),
        jnp.int32(0),
    )
    table, slot_pos, placed, _ = jax.lax.while_loop(
        insert_cond, insert_round, state0
    )

    # --- 2) compaction: table position → dense vertex id ----------------
    occupied = table != EMPTY
    compact = (jnp.cumsum(occupied) - 1).astype(jnp.int32)  # (T,)
    num_valid = compact[-1] + 1
    entry_cid = compact[slot_pos]  # (N,) dense id of each entry's vertex
    entry_slot = jnp.where(placed & (entry_cid < C), entry_cid, C)
    slot = entry_slot.reshape(n, d + 1)

    # Dense unique-key rows (sentinel-filled beyond occupancy/capacity).
    sentinel = jnp.iinfo(jnp.int32).max
    winner = placed & (table[slot_pos] == entry_ids)
    rows = jnp.where(winner & (entry_cid < C), entry_cid, C)
    unique_keys = jnp.full((C, d), sentinel, jnp.int32).at[
        rows[:, None], jnp.arange(d)[None, :]
    ].set(flat_keys, mode="drop")

    # --- 3) blur neighbors along each of the d+1 lattice axes -----------
    # (`permutohedral.h:504-509`): axis j < d: +1 everywhere except coord j
    # gets −d (and the mirror); axis d: ±1 in all stored coords.
    def lookup(query_keys):
        """(Q, d) int32 → dense vertex id in [0, C) or C if absent."""
        qh = _hash_keys(query_keys)
        Q = query_keys.shape[0]

        def probe_round(state):
            result, done, r = state
            idx = (qh + r) & mask
            owner = table[idx]
            empty = owner == EMPTY
            owner_keys = flat_keys[jnp.minimum(owner, N - 1)]
            match = (~empty) & jnp.all(owner_keys == query_keys, axis=-1)
            cid = compact[idx]
            hit = match & (cid < C)
            result = jnp.where(~done & hit, cid, result)
            done = done | match | empty
            return result, done, r + 1

        def probe_cond(state):
            _, done, r = state
            return (r < _MAX_PROBES) & ~jnp.all(done)

        result0 = jnp.full((Q,), C, jnp.int32)
        result, _, _ = jax.lax.while_loop(
            probe_cond, probe_round, (result0, jnp.zeros((Q,), bool), jnp.int32(0))
        )
        return result

    deltas = []
    eye = np.eye(d, dtype=np.int32)
    for j in range(d + 1):
        if j < d:
            deltas.append(np.ones(d, dtype=np.int32) - (d + 1) * eye[j])
        else:
            deltas.append(np.ones(d, dtype=np.int32))
    delta_arr = jnp.asarray(np.stack(deltas))  # (d+1, d)

    # One batched lookup for all axes & signs: (2·(d+1)·C, d) queries.
    queries = jnp.concatenate(
        [
            (unique_keys[None, :, :] + delta_arr[:, None, :]).reshape(-1, d),
            (unique_keys[None, :, :] - delta_arr[:, None, :]).reshape(-1, d),
        ],
        axis=0,
    )
    found = lookup(queries)  # (2·(d+1)·C,)
    plus = found[: (d + 1) * C].reshape(d + 1, C)
    minus = found[(d + 1) * C :].reshape(d + 1, C)
    neighbors = jnp.stack([plus, minus], axis=-1)  # (d+1, C, 2)

    return PermutohedralPlan(
        slot=slot, bary=bary, neighbors=neighbors, num_valid=num_valid
    )


@jax.jit
def count_vertices(ref: jax.Array) -> jax.Array:
    """Number of occupied lattice vertices for `ref` (hash dedup only — no
    neighbor resolution). Use to pick a tight static `max_vertices`:
    occupancy is strongly data-dependent (~0.04n on smooth natural images
    at the flagship σs, ~0.7n on noise)."""
    n, d = ref.shape
    keys, _ = simplex_embed(ref)
    N = n * (d + 1)
    flat_keys = keys.reshape(N, d)
    T = 1 << max(1, (2 * N - 1).bit_length())
    mask = jnp.int32(T - 1)
    h0 = _hash_keys(flat_keys)
    entry_ids = jnp.arange(N, dtype=jnp.int32)
    EMPTY = jnp.int32(N)

    def round_fn(state):
        table, placed, r = state
        idx = (h0 + r) & mask
        active = ~placed
        cand = jnp.full((T,), EMPTY, jnp.int32).at[
            jnp.where(active, idx, T)
        ].min(entry_ids, mode="drop")
        table = jnp.where(table == EMPTY, cand, table)
        owner = table[idx]
        match = (owner != EMPTY) & jnp.all(
            flat_keys[jnp.minimum(owner, N - 1)] == flat_keys, axis=-1
        )
        return table, placed | match, r + 1

    def cond_fn(state):
        _, placed, r = state
        return (r < _MAX_PROBES) & ~jnp.all(placed)

    table, _, _ = jax.lax.while_loop(
        cond_fn, round_fn, (jnp.full((T,), EMPTY, jnp.int32), jnp.zeros((N,), bool), jnp.int32(0))
    )
    return jnp.sum(table != EMPTY)


def suggest_capacity(ref, headroom: float = 2.0) -> int:
    """Concrete (host-side) capacity suggestion: pow2 ≥ headroom·occupancy."""
    occ = int(count_vertices(jnp.asarray(ref)))
    want = max(int(occ * headroom), 64)
    return 1 << (want - 1).bit_length()


# ---------------------------------------------------------------------------
# Apply: splat → blur → slice (linear in src)
# ---------------------------------------------------------------------------


def _splat(plan: PermutohedralPlan, src: jax.Array) -> jax.Array:
    """(n, L) → (M+1, L) vertex values; row M is the zero sentinel."""
    n, L = src.shape
    d = plan.d
    M = plan.capacity
    weighted = plan.bary[:, :, None] * src[:, None, :]  # (n, d+1, L)
    vals = jax.ops.segment_sum(
        weighted.reshape(n * (d + 1), L),
        plan.slot.reshape(-1),
        num_segments=M + 1,
    )
    return vals.at[M].set(0.0)


def _blur_pass(vals: jax.Array, nbr: jax.Array) -> jax.Array:
    """One axis of the unnormalized [1/2, 1, 1/2] lattice blur
    (`permutohedral.h:524-526`, incl. Krähenbühl's factor 2)."""
    M = vals.shape[0] - 1
    v1 = vals[nbr[:, 0]]
    v2 = vals[nbr[:, 1]]
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
    gathered = vals[plan.slot]  # (n, d+1, L)
    out = jnp.einsum("nk,nkl->nl", plan.bary, gathered)
    return out / (1.0 + 2.0 ** (-d))


def apply_plan(plan: PermutohedralPlan, src: jax.Array, reverse: bool = False) -> jax.Array:
    """Filter (n, L) values through a prebuilt plan. Linear in `src`.

    `reverse=True` applies the transposed filter (blur axes in reverse
    order), used for the ∂src VJP — the splat/slice pair is already
    symmetric (same slots and weights).
    """
    vals = _splat(plan, src)
    vals = _blur(plan, vals, reverse)
    return _slice(plan, vals)


# ---------------------------------------------------------------------------
# Differentiable filter (custom VJP)
# ---------------------------------------------------------------------------
#
# The plan (slot/bary/neighbors) is an explicit argument of the custom-VJP
# primitive so it is built ONCE per reference image and reused across label
# channels, all mean-field iterations, and the forward+backward passes —
# the Krähenbühl init/compute split (`krahenbuhl.cpp:138-320`), now with
# exact gradient plumbing. Cotangents for the integer plan arrays are
# float0 zeros; `bary`'s true ref-dependence is accounted for analytically
# by the 4-filter identity, so its direct cotangent is zero as well.


@jax.custom_vjp
def _planned_filter(src, ref, slot, bary, neighbors):
    plan = PermutohedralPlan(slot=slot, bary=bary, neighbors=neighbors,
                             num_valid=jnp.int32(0))
    return apply_plan(plan, src)


def _planned_fwd(src, ref, slot, bary, neighbors):
    out = _planned_filter(src, ref, slot, bary, neighbors)
    return out, (src, ref, slot, bary, neighbors)


def _planned_bwd(res, g):
    src, ref, slot, bary, neighbors = res
    plan = PermutohedralPlan(slot=slot, bary=bary, neighbors=neighbors,
                             num_valid=jnp.int32(0))
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
    return (
        grad_src,
        grad_ref,
        np.zeros(slot.shape, f0),
        jnp.zeros_like(bary),
        np.zeros(neighbors.shape, f0),
    )


_planned_filter.defvjp(_planned_fwd, _planned_bwd)


def lattice_filter_planned(src: jax.Array, ref: jax.Array, plan: PermutohedralPlan) -> jax.Array:
    """Filter through a prebuilt plan, differentiable in src AND ref.

    The caller guarantees `plan == build_plan(ref)` (up to the gradient
    approximation this is what makes ∂ref correct). Use inside mean-field
    loops: one `build_plan` per image, many cheap filter calls.
    """
    return _planned_filter(src, ref, plan.slot, plan.bary, plan.neighbors)


def lattice_filter(src: jax.Array, ref: jax.Array, normalize: str = "none") -> jax.Array:
    """Approximate Gaussian filter: Σ_j exp(-‖ref_i−ref_j‖²/2)·src_j.

    Args:
      src: (n, L) values; ref: (n, d) features (pre-scaled by 1/σ).
      normalize: 'none' (reference lite CPU semantics — unnormalized,
        what the CRF stack is tuned on) or 'homogeneous' (divide by the
        filtered ones channel — CUDA `permutohedral.cu:404-406` semantics;
        gradients flow through the quotient automatically).

    Differentiable in both args: ∂src via the transpose filter, ∂ref via the
    analytic 4-filter identity (see module docstring).
    """
    plan = build_plan(jax.lax.stop_gradient(ref))
    if normalize == "homogeneous":
        ones = jnp.ones(src.shape[:1] + (1,), src.dtype)
        out = lattice_filter_planned(jnp.concatenate([src, ones], -1), ref, plan)
        return out[:, :-1] / jnp.maximum(out[:, -1:], 1e-20)
    if normalize != "none":
        raise ValueError(f"unknown normalize mode {normalize!r}")
    return lattice_filter_planned(src, ref, plan)


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
