"""KNN scale-init: Morton-window approximation vs exact brute force."""
import numpy as np
import jax.numpy as jnp

from gi_gs_tpu.ops.knn import mean_knn_dist2_exact, mean_knn_dist2_morton


def test_morton_close_to_exact():
    rng = np.random.RandomState(0)
    pts = jnp.asarray(rng.rand(5000, 3).astype(np.float32))
    exact = np.asarray(mean_knn_dist2_exact(pts))
    approx = np.asarray(mean_knn_dist2_morton(pts))
    # Morton-window kNN can only overestimate (misses some true NN);
    # the majority must be near-exact (it is only used beyond 256k points
    # for the initial log-scale estimate).
    assert (approx >= exact - 1e-5).all()
    rel = (approx - exact) / np.maximum(exact, 1e-9)
    assert np.median(rel) < 1e-3
    assert np.mean(rel < 0.25) > 0.75, float(np.mean(rel < 0.25))


def test_exact_small():
    pts = jnp.asarray(np.array(
        [[0, 0, 0], [1, 0, 0], [0, 1, 0], [0, 0, 1], [10, 10, 10]],
        np.float32))
    d = np.asarray(mean_knn_dist2_exact(pts))
    np.testing.assert_allclose(d[0], 1.0, atol=1e-5)  # three unit neighbours
