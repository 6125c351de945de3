"""Test configuration: CPU backend with 8 virtual devices.

Multi-chip sharding code paths (mesh/halo-exchange/psum) are exercised on a
simulated 8-device CPU mesh, per the reference's gap of having no
multi-device testing story (SURVEY.md §4.7). Must run before jax imports.
"""
import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# The container's sitecustomize force-registers the axon TPU plugin and
# rewrites jax_platforms to "axon,cpu"; every backend init then dials the
# TPU relay, which is both slow and flaky for pure-CPU unit tests. Forcing
# the config back BEFORE any backend is initialized keeps tests hermetic.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np  # noqa: E402
import pytest  # noqa: E402

REFERENCE_DIR = "/root/reference/Experiments"


@pytest.fixture(scope="session")
def rng():
    return np.random.RandomState(0)


@pytest.fixture(scope="session")
def tsukuba():
    """The bundled Tsukuba stereo pair + ground truth, if available."""
    import os.path as osp

    from depth_estimation_tpu.utils.io import read_image, read_pgm

    paths = [osp.join(REFERENCE_DIR, f) for f in ("imL.png", "imR.png", "truedisp.row3.col3.pgm")]
    if not all(osp.exists(p) for p in paths):
        pytest.skip("Tsukuba fixtures not available")
    left = read_image(paths[0])
    right = read_image(paths[1])
    gt = read_pgm(paths[2]).astype(np.float64)
    return left, right, gt
