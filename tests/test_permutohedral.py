"""Permutohedral lattice tests.

Strategy (SURVEY.md §4): property-test against the dense O(n²) Gaussian
oracle (replaces the reference's eyeball/ad-hoc checks), plus gradient
checks mirroring the reference gradcheck (`crf/gaussian_matrix.py:490-518`)
— done in double precision on CPU, exactly as the reference flags
(`:518` notes single precision as the accuracy limiter).
"""
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from depth_estimation_tpu.ops.dense_gaussian import dense_gaussian_filter
from depth_estimation_tpu.ops.permutohedral import (
    apply_plan,
    build_plan,
    lattice_filter,
    lattice_filter_planned,
    simplex_embed,
)

jit_filter = jax.jit(lattice_filter)
jit_filter_homog = jax.jit(partial(lattice_filter, normalize="homogeneous"))


def test_simplex_embed_barycentric_partition_of_unity(rng):
    for d in [1, 2, 5]:
        ref = jnp.asarray(rng.randn(50, d) * 2.0)
        keys, bary = jax.jit(simplex_embed)(ref)
        np.testing.assert_allclose(np.asarray(bary).sum(-1), 1.0, atol=1e-10)
        assert np.asarray(bary).min() > -1e-9  # convex weights
        # keys of the d+1 simplex corners of one point differ
        k = np.asarray(keys)
        assert k.dtype == np.int32


def test_plan_slots_consistent(rng):
    ref = jnp.asarray(rng.randn(200, 3))
    plan = jax.jit(build_plan)(ref)
    slot = np.asarray(plan.slot)
    assert slot.min() >= 0
    assert slot.max() < int(plan.num_valid)
    # all occupied slots are hit
    assert len(np.unique(slot)) == int(plan.num_valid)


def test_filter_mass_conservation_identical_points():
    # All points at the same position share one simplex: the homogeneous-
    # normalized filter returns exactly the mean over points (the blur gain
    # cancels between numerator and the ones channel).
    n, d = 40, 2
    ref = jnp.zeros((n, d), jnp.float64)
    src = jnp.asarray(np.random.RandomState(1).rand(n, 3))
    out = np.asarray(jit_filter_homog(src, ref))
    np.testing.assert_allclose(out, np.broadcast_to(src.mean(0), out.shape), rtol=1e-6)


@pytest.mark.parametrize("d", [1, 2, 3])
def test_filter_matches_dense_oracle(rng, d):
    n = 300
    ref = jnp.asarray(rng.randn(n, d) * 1.5)
    src = jnp.asarray(rng.rand(n, 2))
    out_l = np.asarray(jit_filter(src, ref))
    out_d = np.asarray(dense_gaussian_filter(src, ref, block=64))
    corr = np.corrcoef(out_l.ravel(), out_d.ravel())[0, 1]
    assert corr > 0.998, f"d={d}: lattice/dense corr {corr}"
    # homogeneous-normalized comparison is scale-free
    out_ln = np.asarray(jit_filter_homog(src, ref))
    deg = np.asarray(dense_gaussian_filter(jnp.ones((n, 1), src.dtype), ref, block=64))
    rel = np.abs(out_ln - out_d / deg) / (np.abs(out_d / deg) + 1e-9)
    assert rel.mean() < 0.02, f"d={d}: mean rel err {rel.mean()}"


def test_filter_high_dim_loose(rng):
    n, d = 300, 5
    ref = jnp.asarray(rng.randn(n, d) * 1.5)
    src = jnp.asarray(rng.rand(n, 2))
    out_l = np.asarray(jit_filter(src, ref))
    out_d = np.asarray(dense_gaussian_filter(src, ref, block=64))
    corr = np.corrcoef(out_l.ravel(), out_d.ravel())[0, 1]
    assert corr > 0.93, f"d=5 corr {corr}"


def test_multi_lattice_improves_high_dim_accuracy(rng):
    # Rotation-averaged lattices approximate the SAME (rotation-invariant)
    # Gaussian operator; averaging cancels anisotropic discretization error,
    # so accuracy vs the dense oracle must improve monotonically enough to
    # gate. Checked on the scale-free homogeneous-normalized filter.
    n, d = 300, 5
    ref = jnp.asarray(rng.randn(n, d) * 1.5)
    src = jnp.asarray(rng.rand(n, 2))
    out_d = np.asarray(dense_gaussian_filter(src, ref, block=64))
    deg = np.asarray(dense_gaussian_filter(jnp.ones((n, 1), src.dtype), ref, block=64))
    target = out_d / deg

    def rel_err(k):
        out = np.asarray(
            jax.jit(partial(lattice_filter, normalize="homogeneous", num_lattices=k))(
                src, ref
            )
        )
        return np.linalg.norm(out - target) / np.linalg.norm(target)

    e1, e4 = rel_err(1), rel_err(4)
    # deterministic seed: measured 0.102 → 0.092 on this data (larger gains
    # on smoother/low-σ references); gate the direction with margin
    assert e4 < 0.95 * e1, f"multi-lattice err {e4} vs single {e1}"


def test_multi_lattice_grad_flows(rng):
    n, d, L = 80, 3, 2
    ref = jnp.asarray(rng.randn(n, d))
    src = jnp.asarray(rng.rand(n, L))
    loss = lambda s, r: jnp.sum(lattice_filter(s, r, num_lattices=2) ** 2)
    gs, gr = jax.jit(jax.grad(loss, argnums=(0, 1)))(src, ref)
    assert np.isfinite(np.asarray(gs)).all() and np.isfinite(np.asarray(gr)).all()
    assert float(jnp.abs(gr).sum()) > 0


def test_apply_plan_linear_and_transpose(rng):
    # <g, A s> == <A^T g, s> exactly (the reverse-blur transpose identity).
    n, d, L = 150, 2, 3
    ref = jnp.asarray(rng.randn(n, d))
    plan = jax.jit(build_plan)(ref)
    s = jnp.asarray(rng.randn(n, L))
    g = jnp.asarray(rng.randn(n, L))
    fwd = jax.jit(lambda x: apply_plan(plan, x))
    rev = jax.jit(lambda x: apply_plan(plan, x, reverse=True))
    lhs = float(jnp.vdot(g, fwd(s)))
    rhs = float(jnp.vdot(rev(g), s))
    np.testing.assert_allclose(lhs, rhs, rtol=1e-10)


def test_grad_src_exact(rng):
    # Forward is linear in src → VJP wrt src must match finite differences
    # to machine-ish precision.
    n, d, L = 80, 2, 2
    ref = jnp.asarray(rng.randn(n, d))
    src = jnp.asarray(rng.rand(n, L))
    g = jnp.asarray(rng.randn(n, L))

    f = jax.jit(lambda s: jnp.vdot(g, lattice_filter(s, ref)))
    grad = jax.jit(jax.grad(f))(src)
    eps = 1e-6
    v = jnp.asarray(rng.randn(n, L))
    fd = (f(src + eps * v) - f(src - eps * v)) / (2 * eps)
    np.testing.assert_allclose(float(jnp.vdot(grad, v)), float(fd), rtol=1e-6)


def test_grad_ref_identity_against_dense():
    # The 4-filter identity is exact math for the *dense* Gaussian filter;
    # check our lattice-VJP formula against autodiff through the dense
    # oracle. The lattice is an approximation of the dense filter, so
    # tolerances are loose but directional agreement must be strong.
    rng = np.random.RandomState(3)
    n, d, L = 120, 2, 2
    ref = jnp.asarray(rng.randn(n, d) * 1.2)
    src = jnp.asarray(rng.rand(n, L))
    g = jnp.asarray(rng.randn(n, L))

    def dense_loss(r):
        return jnp.vdot(g, dense_gaussian_filter(src, r, block=64))

    def lattice_loss(r):
        return jnp.vdot(g, lattice_filter(src, r))

    grad_dense = np.asarray(jax.jit(jax.grad(dense_loss))(ref))
    grad_lat = np.asarray(jax.jit(jax.grad(lattice_loss))(ref))
    corr = np.corrcoef(grad_dense.ravel(), grad_lat.ravel())[0, 1]
    assert corr > 0.97, f"grad_ref corr vs dense autodiff: {corr}"
    scale = (grad_lat * grad_dense).sum() / (grad_dense**2).sum()
    assert 0.5 < scale < 1.5, f"grad_ref scale {scale}"


def test_planned_filter_matches_unplanned(rng):
    n, d, L = 100, 3, 2
    ref = jnp.asarray(rng.randn(n, d))
    src = jnp.asarray(rng.rand(n, L))

    def planned(s, r):
        plan = build_plan(jax.lax.stop_gradient(r))
        return lattice_filter_planned(s, r, plan)

    out_a = np.asarray(jax.jit(planned)(src, ref))
    out_b = np.asarray(jit_filter(src, ref))
    np.testing.assert_allclose(out_a, out_b, rtol=1e-12)


def test_capacity_overflow_soft(rng):
    # With max_vertices below occupancy the filter degrades but must not
    # crash or produce NaN (overflow slots route to the zero sentinel).
    n, d = 100, 2
    ref = jnp.asarray(rng.randn(n, d) * 3.0)
    src = jnp.asarray(rng.rand(n, 2))
    plan = jax.jit(partial(build_plan, max_vertices=32))(ref)
    out = np.asarray(jax.jit(lambda s: apply_plan(plan, s))(src))
    assert np.isfinite(out).all()


def test_batched_filter_matches_loop(rng):
    from depth_estimation_tpu.ops.permutohedral import lattice_filter_batched

    B, n, d, L = 3, 60, 2, 2
    refs = jnp.asarray(rng.randn(B, n, d))
    srcs = jnp.asarray(rng.rand(B, n, L))
    out = np.asarray(jax.jit(lattice_filter_batched)(srcs, refs))
    for b in range(B):
        want = np.asarray(jit_filter(srcs[b], refs[b]))
        np.testing.assert_allclose(out[b], want, rtol=1e-10)


def test_packed_sort_rows_matches_numpy_lexsort(rng):
    """The 2-sort packed row argsort (and its payload/row_changed outputs)
    must equal a stable numpy lexsort bit-for-bit, on both small-range
    keys (packed path) and huge-range keys (forces the cond fallback)."""
    from depth_estimation_tpu.ops.permutohedral import _sort_rows

    N, d = 2000, 5
    payload = rng.rand(N).astype(np.float32)
    for scale in (7, 1 << 20):  # packed path / fallback path
        keys = rng.randint(-scale, scale, size=(N, d)).astype(np.int32)
        cols = [jnp.asarray(keys[:, k]) for k in range(d)]
        order, rc, (pay,) = jax.jit(
            lambda p, *c: _sort_rows(c, (p,))
        )(jnp.asarray(payload), *cols)
        # np.lexsort: last key is primary; stable
        want_order = np.lexsort(tuple(keys[:, k] for k in range(d - 1, -1, -1)))
        np.testing.assert_array_equal(np.asarray(order), want_order)
        skeys = keys[want_order]
        np.testing.assert_array_equal(
            np.asarray(rc), np.any(skeys[1:] != skeys[:-1], axis=1)
        )
        np.testing.assert_array_equal(np.asarray(pay), payload[want_order])


@pytest.mark.parametrize("dtype", [jnp.float32, jnp.float64])
@pytest.mark.parametrize("d", [1, 2, 5])
def test_degenerate_constant_ref(d, dtype):
    """All points in one simplex (constant reference) — the exact case that
    exposed the XLA:CPU lane-packed-gather heap overflow (round-3 fix in
    ops/permutohedral.py:_row_gather). Homogeneous normalization must return
    the per-channel mean for any d, in both precisions."""
    n = 40
    ref = jnp.full((n, d), 0.37, dtype)
    src = jnp.asarray(np.random.RandomState(3).rand(n, 3), dtype)
    out = np.asarray(
        jax.jit(partial(lattice_filter, normalize="homogeneous"))(src, ref)
    )
    tol = 1e-5 if dtype == jnp.float32 else 1e-9
    np.testing.assert_allclose(
        out, np.broadcast_to(np.asarray(src).mean(0), out.shape), rtol=tol
    )


def test_degenerate_single_distinct_column(rng):
    """Only one feature column varies; the rest are constant (zero-range
    columns stress the packed-key fast path of _sort_rows)."""
    n, d = 120, 4
    ref = np.zeros((n, d))
    ref[:, 2] = rng.randn(n) * 2.0
    ref = jnp.asarray(ref)
    src = jnp.asarray(rng.rand(n, 2))
    out = np.asarray(jit_filter_homog(src, ref))
    # the d=4 lattice on (const, const, x, const) is not the d=1 lattice on
    # x — the embedding mixes axes — so gate on the dense oracle instead
    dn = np.asarray(dense_gaussian_filter(src, ref, block=64))
    ones = np.asarray(dense_gaussian_filter(jnp.ones((n, 1)), ref, block=64))
    corr = np.corrcoef(out.ravel(), (dn / ones).ravel())[0, 1]
    assert np.isfinite(out).all()
    assert corr > 0.95, corr  # garbage → ~0


@pytest.mark.parametrize("n", [32, 40, 64, 63])
def test_splat_group_boundary_sizes(rng, n):
    """N = n·(d+1) at and around multiples of the splat's lane-pack group
    G = 128/L — exercises the boundary-only prefix-sum gather (b == R edge,
    o == 0 edge) against the dense oracle."""
    d, L = 3, 32  # G = 4, N = 4n → n=32: N=128 ≡ 0 (mod G)
    ref = jnp.asarray(rng.randn(n, d))
    src = jnp.asarray(rng.rand(n, L))
    out = np.asarray(jit_filter_homog(src, ref))
    dn = np.asarray(dense_gaussian_filter(src, ref, block=64))
    ones = np.asarray(dense_gaussian_filter(jnp.ones((n, 1)), ref, block=64))
    corr = np.corrcoef(out.ravel(), (dn / ones).ravel())[0, 1]
    assert np.isfinite(out).all()
    assert corr > 0.95, corr  # approximation-quality floor; garbage → ~0


def test_piece_splat_matches_entry_splat(rng):
    """The full-lane piece splat (packed-row gather + per-piece weight
    contraction) must reproduce the entry-wise splat and the full filter
    bit-near-exactly, and the custom VJP must flow through piece plans."""
    from depth_estimation_tpu.ops.permutohedral import (
        apply_plan, build_plan, lattice_filter_planned, suggest_capacity,
        suggest_pieces, _splat,
    )

    n, d, L = 777, 4, 16
    ref = jnp.asarray(rng.randn(n, d).astype(np.float32))
    src = jnp.asarray(rng.rand(n, L).astype(np.float32))
    cap = suggest_capacity(ref)
    pieces = suggest_pieces(ref, cap, pack=8)
    plain = jax.jit(partial(build_plan, max_vertices=cap))(ref)
    pz = jax.jit(
        partial(build_plan, max_vertices=cap, max_pieces=pieces, pack=8)
    )(ref)
    assert int(pz.num_pieces) <= pieces
    # piece vs entry summation order differs -> f32 reassociation only
    np.testing.assert_allclose(
        np.asarray(_splat(pz, src)), np.asarray(_splat(plain, src)),
        rtol=1e-3, atol=2e-4,
    )
    np.testing.assert_allclose(
        np.asarray(apply_plan(pz, src)), np.asarray(apply_plan(plain, src)),
        rtol=1e-3, atol=2e-4,
    )

    def loss(s, r, plan):
        return (lattice_filter_planned(s, r, plan) ** 2).sum()

    g_pz = jax.jit(jax.grad(loss, argnums=(0, 1)))(src, ref, pz)
    g_pl = jax.jit(jax.grad(loss, argnums=(0, 1)))(src, ref, plain)
    for a, b in zip(g_pz, g_pl):
        b = np.asarray(b)
        # grads span ~1e5; absolute tolerance scales with magnitude
        np.testing.assert_allclose(
            np.asarray(a), b, rtol=5e-3, atol=1e-6 * max(np.abs(b).max(), 1.0)
        )


def test_piece_overflow_soft_degrade(rng):
    """Pieces beyond capacity are dropped (mass loss), visible as
    num_pieces > capacity — the documented soft-degrade contract."""
    from depth_estimation_tpu.ops.permutohedral import _splat, build_plan

    n, d, L = 400, 3, 16
    ref = jnp.asarray(rng.randn(n, d).astype(np.float32))
    src = jnp.asarray(rng.rand(n, L).astype(np.float32))
    tiny = jax.jit(
        partial(build_plan, max_vertices=2048, max_pieces=64, pack=8)
    )(ref)
    assert int(tiny.num_pieces) > 64  # overflowed
    out = np.asarray(_splat(tiny, src))
    full = np.asarray(
        _splat(jax.jit(partial(build_plan, max_vertices=2048))(ref), src)
    )
    assert np.isfinite(out).all()
    assert out.sum() < full.sum()  # mass lost, not corrupted


@pytest.mark.parametrize("R,L", [(7, 4), (121, 4), (64, 16), (200, 16), (33, 128)])
def test_row_gather_packed_matches_plain(rng, R, L):
    """The lane-packed gather (the exact arithmetic real TPUs execute in
    the blur) must equal a plain row gather. Standalone on CPU: the
    XLA:CPU heap-corruption repro needed the fused blur graph around it,
    so isolation is what makes this safely testable here (VERDICT r3 #3)."""
    from depth_estimation_tpu.ops.permutohedral import _row_gather

    table = jnp.asarray(rng.randn(R, L).astype(np.float32))
    idx = jnp.asarray(rng.randint(0, R, size=(3, 50)).astype(np.int32))
    plain = jax.jit(partial(_row_gather, packed=False))(table, idx)
    packed = jax.jit(partial(_row_gather, packed=True))(table, idx)
    np.testing.assert_allclose(np.asarray(packed), np.asarray(plain), rtol=0, atol=0)


@pytest.mark.parametrize("max_pieces", [None, 4096])
def test_order_by_sum_off_matches_default(rng, max_pieces):
    """order_by_sum=False (plain lex slot order) must produce the same
    num_valid and the same filter output as the default (sum, lex) order
    — slot RELABELING only (ADVICE r3)."""
    n, d, L = 500, 4, 8
    ref = jnp.asarray(rng.randn(n, d).astype(np.float32))
    src = jnp.asarray(rng.rand(n, L).astype(np.float32))
    kw = dict(max_vertices=1024, max_pieces=max_pieces, pack=8)
    p_sum = jax.jit(partial(build_plan, order_by_sum=True, **kw))(ref)
    p_lex = jax.jit(partial(build_plan, order_by_sum=False, **kw))(ref)
    assert int(p_sum.num_valid) == int(p_lex.num_valid)
    out_sum = np.asarray(jax.jit(apply_plan)(p_sum, src))
    out_lex = np.asarray(jax.jit(apply_plan)(p_lex, src))
    np.testing.assert_allclose(out_lex, out_sum, rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize("n,P,U", [(512, 64, 320), (384, 128, 640)])
def test_tiled_incidence_matches_entry_splat(rng, n, P, U):
    """The tiled MXU splat/slice (dense per-tile incidence matmuls) must
    reproduce the entry-wise path exactly (same math, reassociated)."""
    from depth_estimation_tpu.ops.permutohedral import _slice, _splat

    d, L = 4, 8
    ref = jnp.asarray(rng.randn(n, d).astype(np.float32))
    src = jnp.asarray(rng.rand(n, L).astype(np.float32))
    plain = jax.jit(partial(build_plan, max_vertices=1024))(ref)
    tiled = jax.jit(
        partial(build_plan, max_vertices=1024, tile=P, tile_u=U)
    )(ref)
    assert int(tiled.tile_overflow) == 0
    # splat equivalence
    # f32 reassociation through the MXU matmuls: tolerance 5e-4 relative
    v_plain = np.asarray(jax.jit(_splat)(plain, src))
    v_tiled = np.asarray(jax.jit(_splat)(tiled, src))
    np.testing.assert_allclose(v_tiled, v_plain, rtol=5e-4, atol=5e-5)
    # slice equivalence
    vals = jnp.asarray(rng.randn(1025, L).astype(np.float32))
    vals = vals.at[-1].set(0.0)
    s_plain = np.asarray(jax.jit(_slice)(plain, vals))
    s_tiled = np.asarray(jax.jit(_slice)(tiled, vals))
    np.testing.assert_allclose(s_tiled, s_plain, rtol=5e-4, atol=5e-5)
    # full filter + transpose
    o_plain = np.asarray(jax.jit(apply_plan)(plain, src))
    o_tiled = np.asarray(jax.jit(apply_plan)(tiled, src))
    np.testing.assert_allclose(o_tiled, o_plain, rtol=5e-4, atol=5e-5)
    t_plain = np.asarray(jax.jit(partial(apply_plan, reverse=True))(plain, src))
    t_tiled = np.asarray(jax.jit(partial(apply_plan, reverse=True))(tiled, src))
    np.testing.assert_allclose(t_tiled, t_plain, rtol=5e-4, atol=5e-5)


def test_tiled_overflow_soft_degrade(rng):
    """Tiles over their vertex capacity drop entries (mass loss), visible
    via plan.tile_overflow — never corruption."""
    from depth_estimation_tpu.ops.permutohedral import _splat

    n, d, L = 256, 4, 8
    ref = jnp.asarray(rng.randn(n, d).astype(np.float32))  # noise: dense
    src = jnp.asarray(rng.rand(n, L).astype(np.float32))
    tiny = jax.jit(
        partial(build_plan, max_vertices=2048, tile=64, tile_u=16)
    )(ref)
    assert int(tiny.tile_overflow) > 0
    out = np.asarray(_splat(tiny, src))
    full = np.asarray(
        _splat(jax.jit(partial(build_plan, max_vertices=2048))(ref), src)
    )
    assert np.isfinite(out).all()
    assert out.sum() < full.sum()


def test_tiled_grads_match_entry(rng):
    """src/ref gradients through the tiled plan equal the entry-path
    gradients (the custom VJP reuses the same apply for both)."""
    from depth_estimation_tpu.ops.permutohedral import lattice_filter_planned

    n, d, L = 256, 3, 4
    ref = jnp.asarray(rng.randn(n, d).astype(np.float32))
    src = jnp.asarray(rng.rand(n, L).astype(np.float32))
    plain = jax.jit(partial(build_plan, max_vertices=1024))(ref)
    tiled = jax.jit(
        partial(build_plan, max_vertices=1024, tile=64, tile_u=128)
    )(ref)

    def loss(s, r, plan):
        return (lattice_filter_planned(s, r, plan) ** 2).sum()

    g_p = jax.jit(jax.grad(loss, argnums=(0, 1)))(src, ref, plain)
    g_t = jax.jit(jax.grad(loss, argnums=(0, 1)))(src, ref, tiled)
    for a, b in zip(g_t, g_p):
        b = np.asarray(b)
        np.testing.assert_allclose(
            np.asarray(a), b, rtol=5e-3, atol=1e-5 * max(np.abs(b).max(), 1.0)
        )


def test_suggest_tile_u_covers_worst_tile(rng):
    from depth_estimation_tpu.ops.permutohedral import suggest_tile_u

    n, d = 512, 3
    ref = jnp.asarray(rng.randn(n, d).astype(np.float32))
    tu = suggest_tile_u(ref, tile=64, max_vertices=1024)
    assert tu % 128 == 0
    plan = jax.jit(
        partial(build_plan, max_vertices=1024, tile=64, tile_u=tu)
    )(ref)
    assert int(plan.tile_overflow) == 0  # headroom covers the worst tile


# ---------------------------------------------------------------------------
# Round-5 lean tiled build (sort_mode='packed1' + tile): per-tile batched
# sorts over one widened-range packed key, packed-space neighbor join, no
# entry CSR tables. Must be bit-identical to the general tiled path in the
# no-overflow regime (same first-appearance vertex order).
# ---------------------------------------------------------------------------


def _smooth_ref(rng, h, w, d, scale=6.0, smooth=2):
    g = rng.rand(h, w, d).astype(np.float32)
    for _ in range(smooth):
        g = 0.25 * (np.roll(g, 1, 0) + np.roll(g, -1, 0)
                    + np.roll(g, 1, 1) + np.roll(g, -1, 1))
    return jnp.asarray((g * scale).reshape(h * w, d))


@pytest.mark.parametrize("d,P,U", [(5, 64, 384), (3, 32, 128), (2, 64, 192)])
def test_lean_tiled_plan_matches_general(rng, d, P, U):
    h, w, L = 24, 32, 8
    ref = _smooth_ref(rng, h, w, d)
    src = jnp.asarray(rng.randn(h * w, L).astype(np.float32))
    C = 1024
    kw = dict(max_vertices=C, tile=P, tile_u=U, order_by_sum=False)
    gen = jax.jit(partial(build_plan, **kw))(ref)
    lean = jax.jit(partial(build_plan, sort_mode="packed1", **kw))(ref)
    assert lean.slot is None and lean.starts is None  # no entry CSR built
    assert int(gen.tile_overflow) == 0 and int(lean.tile_overflow) == 0
    assert int(gen.num_valid) == int(lean.num_valid)
    np.testing.assert_array_equal(np.asarray(gen.tile_vid),
                                  np.asarray(lean.tile_vid))
    np.testing.assert_array_equal(np.asarray(gen.neighbors),
                                  np.asarray(lean.neighbors))
    np.testing.assert_array_equal(np.asarray(gen.partial_order),
                                  np.asarray(lean.partial_order))
    np.testing.assert_array_equal(np.asarray(gen.partial_starts),
                                  np.asarray(lean.partial_starts))
    np.testing.assert_allclose(np.asarray(gen.tile_A), np.asarray(lean.tile_A),
                               atol=0)
    o_gen = np.asarray(jax.jit(apply_plan)(gen, src))
    o_lean = np.asarray(jax.jit(apply_plan)(lean, src))
    np.testing.assert_allclose(o_lean, o_gen, rtol=1e-6, atol=1e-6)
    r_gen = np.asarray(jax.jit(partial(apply_plan, reverse=True))(gen, src))
    r_lean = np.asarray(jax.jit(partial(apply_plan, reverse=True))(lean, src))
    np.testing.assert_allclose(r_lean, r_gen, rtol=1e-6, atol=1e-6)


def test_lean_tiled_grads_match_general(rng):
    h, w, d, L = 16, 16, 5, 4
    ref = _smooth_ref(rng, h, w, d, scale=5.0, smooth=3)
    src = jnp.asarray(rng.rand(h * w, L).astype(np.float32))
    kw = dict(max_vertices=512, tile=64, tile_u=384, order_by_sum=False)

    def loss(s, r, mode):
        plan = build_plan(jax.lax.stop_gradient(r), sort_mode=mode, **kw)
        return (lattice_filter_planned(s, r, plan) ** 2).sum()

    g_gen = jax.jit(jax.grad(partial(loss, mode="auto"), argnums=(0, 1)))(src, ref)
    g_lean = jax.jit(jax.grad(partial(loss, mode="packed1"), argnums=(0, 1)))(src, ref)
    for a, b in zip(g_lean, g_gen):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-6, atol=1e-6)


def test_lean_tiled_overflow_soft_degrade(rng):
    """Lean path: tiles over capacity drop entries (counted), never corrupt."""
    from depth_estimation_tpu.ops.permutohedral import _splat

    n, d, L = 256, 4, 8
    ref = jnp.asarray(rng.randn(n, d).astype(np.float32))  # noise: dense
    src = jnp.asarray(rng.rand(n, L).astype(np.float32))
    tiny = jax.jit(partial(
        build_plan, max_vertices=2048, tile=64, tile_u=16,
        order_by_sum=False, sort_mode="packed1",
    ))(ref)
    assert int(tiny.tile_overflow) > 0
    out = np.asarray(_splat(tiny, src))
    assert np.isfinite(out).all()


def test_sort_mode_pinned_matches_auto(rng):
    """Pinned sort strategies produce the identical plan when they fit.

    order_by_sum=False matches what `suggest_sort_mode` certifies: the
    sum-prefix column (~the sum of all ranges) can push a guide that fits
    'packed1' without it over the 31-bit budget — pinning is only valid
    for the exact column set the calibration measured.
    """
    n, d = 400, 5
    ref = jnp.asarray((rng.rand(n, d) * 8).astype(np.float32))
    kw = dict(max_vertices=512, order_by_sum=False)
    base = jax.jit(partial(build_plan, **kw))(ref)
    for mode in ("packed1", "packed2", "lex"):
        p = jax.jit(partial(build_plan, sort_mode=mode, **kw))(ref)
        np.testing.assert_array_equal(np.asarray(p.slot), np.asarray(base.slot))
        np.testing.assert_array_equal(np.asarray(p.neighbors),
                                      np.asarray(base.neighbors))


def test_suggest_sort_mode(rng):
    from depth_estimation_tpu.ops.permutohedral import suggest_sort_mode

    ref = jnp.asarray((rng.rand(200, 5) * 4).astype(np.float32))
    assert suggest_sort_mode(ref) == "packed1"
    wide = jnp.asarray((rng.rand(200, 5) * 3000).astype(np.float32))
    assert suggest_sort_mode(wide) == "auto"
