"""Native C++ lattice engine vs the JAX implementation.

Two independent implementations of the same conventions must agree to
float32 tolerance — a much stronger check than either against the dense
oracle alone (reference analog: lite/test.py smoke runs, SURVEY.md §4.4).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from depth_estimation_tpu.ops.permutohedral import lattice_filter

try:
    from depth_estimation_tpu.utils.native import LatticePlanCPU, lattice_filter_cpu

    NATIVE_OK = True
    NATIVE_ERR = ""
except Exception as e:  # pragma: no cover - build environment dependent
    NATIVE_OK = False
    NATIVE_ERR = str(e)

pytestmark = pytest.mark.skipif(not NATIVE_OK, reason=f"native build failed: {NATIVE_ERR}")


@pytest.mark.parametrize("d", [1, 2, 5])
def test_native_matches_jax(rng, d):
    n, L = 200, 3
    ref = rng.randn(n, d).astype(np.float32) * 1.5
    src = rng.rand(n, L).astype(np.float32)
    got = lattice_filter_cpu(src, ref)
    want = np.asarray(jax.jit(lattice_filter)(jnp.asarray(src), jnp.asarray(ref)))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


def test_native_homogeneous_matches_jax(rng):
    n, L, d = 150, 2, 3
    ref = rng.randn(n, d).astype(np.float32)
    src = rng.rand(n, L).astype(np.float32)
    got = lattice_filter_cpu(src, ref, normalize="homogeneous")
    from functools import partial

    want = np.asarray(
        jax.jit(partial(lattice_filter, normalize="homogeneous"))(
            jnp.asarray(src), jnp.asarray(ref)
        )
    )
    np.testing.assert_allclose(got, want, rtol=5e-4, atol=5e-4)


def test_native_plan_reuse(rng):
    n, d = 100, 2
    ref = rng.randn(n, d).astype(np.float32)
    plan = LatticePlanCPU(ref)
    assert plan.num_vertices > 0
    a = plan.apply(rng.rand(n, 2).astype(np.float32))
    b = plan.apply(rng.rand(n, 4).astype(np.float32))
    assert a.shape == (n, 2) and b.shape == (n, 4)
    one_shot = lattice_filter_cpu(np.ones((n, 1), np.float32), ref)
    via_plan = plan.apply(np.ones((n, 1), np.float32))
    np.testing.assert_allclose(via_plan, one_shot, rtol=1e-6)
