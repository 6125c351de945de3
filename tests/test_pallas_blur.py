"""Pallas fused blur vs the XLA reference implementation (interpret mode
on CPU; the compiled TPU path is exercised by bench/TPU runs)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from depth_estimation_tpu.ops.pallas.lattice_blur import PALLAS_OK, blur_fused
from depth_estimation_tpu.ops.permutohedral import _blur, build_plan

pytestmark = pytest.mark.skipif(not PALLAS_OK, reason="pallas unavailable")


@pytest.mark.parametrize("reverse", [False, True])
def test_fused_blur_matches_xla(rng, reverse):
    n, d, L = 200, 3, 4
    ref = jnp.asarray(rng.randn(n, d).astype(np.float32))
    plan = jax.jit(build_plan)(ref)
    vals = jnp.asarray(rng.rand(plan.capacity + 1, L).astype(np.float32))
    vals = vals.at[plan.capacity].set(0.0)

    want = np.asarray(_blur(plan, vals, reverse))
    got = blur_fused(plan, vals, reverse=reverse, interpret=True)
    assert got is not None
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-5, atol=1e-5)


def test_fused_blur_declines_oversized(rng):
    # beyond the VMEM budget → graceful None (caller falls back to XLA)
    from depth_estimation_tpu.ops.pallas import lattice_blur

    n, d = 120, 2
    ref = jnp.asarray(rng.randn(n, d).astype(np.float32))
    plan = jax.jit(build_plan)(ref)
    vals = jnp.zeros((plan.capacity + 1, 4), jnp.float32)
    old = lattice_blur.VMEM_BUDGET_BYTES
    try:
        lattice_blur.VMEM_BUDGET_BYTES = 1024
        assert lattice_blur.blur_fused(plan, vals, interpret=True) is None
    finally:
        lattice_blur.VMEM_BUDGET_BYTES = old
