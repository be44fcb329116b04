"""k-NN op tests vs brute-force NumPy/sklearn oracles."""

import jax
import jax.numpy as jnp
import numpy as np

from avoid_mpc_tpu.ops.knn import FAR_SENTINEL, knn, knn_chunked, nearest_distance
from tests import oracles


def test_knn_matches_oracle():
    rng = np.random.default_rng(0)
    queries = rng.standard_normal((30, 3)) * 5
    points = rng.standard_normal((1000, 3)) * 5
    dists, pts = knn(jnp.asarray(queries), jnp.asarray(points), jnp.ones(1000, bool), k=3)
    idx, od = oracles.knn_oracle(queries, points, 3)
    np.testing.assert_allclose(np.asarray(dists), od, rtol=1e-10, atol=1e-10)
    np.testing.assert_allclose(np.asarray(pts), points[idx], rtol=1e-12)


def test_knn_respects_mask():
    rng = np.random.default_rng(1)
    queries = rng.standard_normal((5, 3))
    points = rng.standard_normal((100, 3))
    mask = np.zeros(100, bool)
    mask[40:] = True
    dists, pts = knn(jnp.asarray(queries), jnp.asarray(points), jnp.asarray(mask), k=3)
    idx, od = oracles.knn_oracle(queries, points[40:], 3)
    np.testing.assert_allclose(np.asarray(dists), od, rtol=1e-10, atol=1e-10)
    np.testing.assert_allclose(np.asarray(pts), points[40:][idx], rtol=1e-12)


def test_knn_fewer_points_than_k_pads_sentinel():
    points = np.zeros((10, 3))
    mask = np.zeros(10, bool)
    mask[0] = True
    points[0] = [1.0, 2.0, 3.0]
    q = jnp.zeros((2, 3))
    dists, pts = knn(q, jnp.asarray(points), jnp.asarray(mask), k=3)
    d = np.asarray(dists)
    assert np.isfinite(d[:, 0]).all() and np.isinf(d[:, 1:]).all()
    np.testing.assert_allclose(np.asarray(pts)[:, 0], [[1.0, 2.0, 3.0]] * 2)
    np.testing.assert_allclose(np.asarray(pts)[:, 1:], FAR_SENTINEL)


def test_knn_empty_map():
    dists, pts = knn(jnp.zeros((4, 3)), jnp.zeros((16, 3)), jnp.zeros(16, bool), k=3)
    assert np.isinf(np.asarray(dists)).all()
    np.testing.assert_allclose(np.asarray(pts), FAR_SENTINEL)


def test_knn_chunked_matches_dense():
    rng = np.random.default_rng(2)
    queries = rng.standard_normal((30, 3)) * 3
    points = rng.standard_normal((8192, 3)) * 3
    mask = rng.random(8192) > 0.3
    qd, qp = knn(jnp.asarray(queries), jnp.asarray(points), jnp.asarray(mask), k=3)
    cd, cp = knn_chunked(jnp.asarray(queries), jnp.asarray(points), jnp.asarray(mask), k=3, chunk=1024)
    np.testing.assert_allclose(np.asarray(cd), np.asarray(qd), rtol=1e-10, atol=1e-10)
    np.testing.assert_allclose(np.asarray(cp), np.asarray(qp), rtol=1e-12)


def test_nearest_distance():
    rng = np.random.default_rng(3)
    points = rng.standard_normal((500, 3))
    mask = rng.random(500) > 0.5
    q = np.array([0.3, -0.2, 0.1])
    got = float(nearest_distance(jnp.asarray(q), jnp.asarray(points), jnp.asarray(mask)))
    want = np.sqrt(((points[mask] - q) ** 2).sum(-1).min())
    np.testing.assert_allclose(got, want, rtol=1e-12)
    # empty map -> +inf (reference returns double max, FrameKDMap.cpp:401-404)
    assert np.isinf(float(nearest_distance(jnp.asarray(q), jnp.asarray(points), jnp.zeros(500, bool))))


def test_knn_batched_per_scenario_clouds():
    """vmap: each scenario queries its own cloud."""
    rng = np.random.default_rng(4)
    B = 4
    queries = rng.standard_normal((B, 6, 3))
    points = rng.standard_normal((B, 256, 3))
    masks = rng.random((B, 256)) > 0.2
    dists, pts = jax.vmap(lambda q, p, m: knn(q, p, m, 3))(
        jnp.asarray(queries), jnp.asarray(points), jnp.asarray(masks)
    )
    for b in range(B):
        idx, od = oracles.knn_oracle(queries[b], points[b][masks[b]], 3)
        np.testing.assert_allclose(np.asarray(dists[b]), od, rtol=1e-10, atol=1e-10)


def test_knn_reference_scale_auto_chunks():
    """Reference-scale map query: (100+1 keyframes)*3072 ~ 310k points
    (mpc_parameters.yaml max_frame_count=100, FrameKDMap.cpp:34-52 scale).
    `knn` must route through the chunked scan above _DENSE_P_MAX (never
    materializing the dense (Q,P) matrix) and still match the oracle,
    including a masked tail that is not a chunk multiple."""
    rng = np.random.default_rng(7)
    P = 101 * 3072  # 310,272 — not a multiple of the 2048 chunk
    queries = rng.standard_normal((31, 3)) * 10
    points = rng.standard_normal((P, 3)) * 10
    mask = np.ones(P, bool)
    mask[::97] = False  # ragged invalid slots
    dists, pts = jax.jit(lambda q, p, m: knn(q, p, m, k=3))(
        jnp.asarray(queries), jnp.asarray(points), jnp.asarray(mask)
    )
    idx, od = oracles.knn_oracle(queries, points[mask], 3)
    np.testing.assert_allclose(np.asarray(dists), od, rtol=1e-10, atol=1e-10)
    np.testing.assert_allclose(np.asarray(pts), points[mask][idx], rtol=1e-12)
