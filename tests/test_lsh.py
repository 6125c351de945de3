"""LSH filter vs dense oracle (reference self-benchmark analog,
`crf/lsh.py:159-189`): clustered data where LSH recall is high."""
import jax.numpy as jnp
import numpy as np

from depth_estimation_tpu.ops.dense_gaussian import dense_gaussian_filter
from depth_estimation_tpu.ops.lsh import lsh_gaussian_filter


def test_lsh_matches_dense_on_clusters():
    rng = np.random.RandomState(0)
    # tight clusters far apart: every relevant neighbor co-buckets
    centers = rng.randn(6, 3) * 20
    pts = np.concatenate([c + rng.randn(30, 3) * 0.3 for c in centers])
    src = rng.rand(len(pts), 2)
    out_lsh = np.asarray(
        lsh_gaussian_filter(jnp.asarray(src), jnp.asarray(pts), bucket_width=4.0,
                            num_tables=6, window=64)
    )
    out_dense = np.asarray(dense_gaussian_filter(jnp.asarray(src), jnp.asarray(pts), block=64))
    rel = np.abs(out_lsh - out_dense) / (np.abs(out_dense) + 1e-9)
    assert rel.mean() < 0.05, rel.mean()


def test_lsh_self_term_exact():
    rng = np.random.RandomState(1)
    pts = rng.randn(50, 4) * 100  # far apart: only self terms survive
    src = rng.rand(50, 3)
    out = np.asarray(
        lsh_gaussian_filter(jnp.asarray(src), jnp.asarray(pts), num_tables=2, window=8)
    )
    np.testing.assert_allclose(out, src, rtol=1e-5, atol=1e-6)
