"""k-NN op tests vs brute-force NumPy/sklearn oracles."""

import jax
import jax.numpy as jnp
import numpy as np

from avoid_mpc_tpu.ops.knn import (
    FAR_SENTINEL,
    cull_by_bbox,
    knn,
    knn_chunked,
    knn_culled,
    nearest_distance,
)
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


_ULP = dict(rtol=2e-6, atol=2e-6)  # XLA reassociates the f32 distance sum
# per compilation context (fma under jit), so cross-context comparisons are
# exact only to ~1 ulp; a 1-ulp distance tie can also swap two near-equal
# neighbors, so coordinates are checked by recomputed distance, not identity.


def _check_coords_consistent(queries, cd, cp):
    """Each returned coordinate must reproduce its reported distance."""
    q = np.asarray(queries, np.float64)
    d = np.asarray(cd, np.float64)
    p = np.asarray(cp, np.float64)
    found = np.isfinite(d)
    re_d = np.sqrt(((p - q[:, None, :]) ** 2).sum(-1))
    np.testing.assert_allclose(re_d[found], d[found], **_ULP)


def _path_queries(rng, n, jitter=0.4):
    """Queries along a random path segment — the engine's horizon-stage
    geometry, the workload the bbox cull is designed for (a scattered query
    set would make the bbox cover the whole cloud and overflow by design)."""
    a = rng.standard_normal(3) * 5
    b = a + rng.standard_normal(3) * 10
    t = np.linspace(0.0, 1.0, n)[:, None]
    return a[None] * (1 - t) + b[None] * t + rng.standard_normal((n, 3)) * jitter


def _culled_vs_brute(rng, q_shape, p_count, r_cut, m_max, k=3, spread=10.0):
    """Shared harness: knn_culled must match knn (to the ulp) on every slot
    whose brute-force distance is within r_cut, and report inf/sentinel
    beyond (the documented radius-bounded semantics)."""
    queries = jnp.asarray(_path_queries(rng, q_shape[0]), jnp.float32)
    points = jnp.asarray(rng.standard_normal((p_count, 3)) * spread, jnp.float32)
    mask = jnp.asarray(rng.random(p_count) > 0.2)
    bd, bp = knn(queries, points, mask, k)
    cd, cp, ovf = jax.jit(
        lambda q, p, m: knn_culled(q, p, m, k, r_cut, m_max)
    )(queries, points, mask)
    assert not bool(ovf), "test geometry should not overflow the candidate set"
    _check_coords_consistent(queries, cd, cp)
    bd, cd = np.asarray(bd), np.asarray(cd)
    within = bd <= r_cut - 1e-4  # margin keeps boundary slots unambiguous
    np.testing.assert_allclose(cd[within], bd[within], **_ULP)
    if p_count > 2 * m_max:
        # cull active: beyond the radius a slot is either "not found"
        # (inf + sentinel) or a genuine-but-possibly-suboptimal neighbor —
        # never closer than the brute-force answer
        far = bd > r_cut + 1e-4
        assert (np.isinf(cd[far]) | (cd[far] >= bd[far] - 1e-5)).all()
    else:  # brute fallback: identical everywhere
        np.testing.assert_allclose(cd, bd, **_ULP)


def test_knn_culled_exact_within_radius():
    _culled_vs_brute(np.random.default_rng(10), (30,), 20000, r_cut=4.0,
                     m_max=4096)


def test_knn_culled_small_cloud_falls_back_to_brute():
    _culled_vs_brute(np.random.default_rng(11), (12,), 1500, r_cut=2.0,
                     m_max=1024)


def test_knn_culled_tight_radius_and_odd_shapes():
    rng = np.random.default_rng(12)
    for q, p in [((7,), 9000), ((31,), 12345), ((1,), 30001)]:
        _culled_vs_brute(rng, q, p, r_cut=1.5, m_max=2048)


def test_knn_culled_overflow_rescued_exact():
    """More in-box points than m_max -> the overflow flag reports that the
    exact brute-force rescue ran, and the result EQUALS brute force (the
    cull has no behavioral failure mode)."""
    rng = np.random.default_rng(13)
    queries = jnp.zeros((4, 3), jnp.float32)
    # dense cluster near the origin (~3000 in-box) + a far shell
    near = rng.standard_normal((3000, 3)) * 0.5
    far = rng.standard_normal((7000, 3)) * 0.5 + 100.0
    points = jnp.asarray(np.concatenate([near, far]), jnp.float32)
    mask = jnp.ones(10000, bool)
    bd, bp = knn(queries, points, mask, 3)
    d, p, ovf = jax.jit(
        lambda q, pp, m: knn_culled(q, pp, m, 3, r_cut=3.0, m_max=256)
    )(queries, points, mask)
    assert bool(ovf)
    np.testing.assert_allclose(np.asarray(d), np.asarray(bd), **_ULP)
    _check_coords_consistent(queries, d, p)
    # a generous m_max holds every in-box point: no overflow, matches brute
    d2, p2, ovf2 = knn_culled(queries, points, mask, 3, r_cut=3.0, m_max=4096)
    assert not bool(ovf2)
    np.testing.assert_allclose(np.asarray(d2), np.asarray(bd), **_ULP)


def test_cull_by_bbox_completeness():
    """Every point within L2 r_cut of any query must survive the cull."""
    rng = np.random.default_rng(14)
    queries = jnp.asarray(rng.standard_normal((9, 3)) * 8, jnp.float32)
    points = jnp.asarray(rng.standard_normal((5000, 3)) * 8, jnp.float32)
    mask = jnp.ones(5000, bool)
    r = 2.5
    cand, cmask, ovf = cull_by_bbox(queries, points, mask, r, 4096)
    assert not bool(ovf)
    cand = np.asarray(cand)[np.asarray(cmask)]
    pn, qn = np.asarray(points), np.asarray(queries)
    d_min = np.sqrt(((pn[:, None] - qn[None]) ** 2).sum(-1)).min(1)
    needed = pn[d_min <= r]
    cand_set = {tuple(row) for row in cand}
    for row in needed:
        assert tuple(row) in cand_set


def test_knn_culled_batched_per_scenario():
    """vmap over scenarios: each lane culls its own cloud."""
    rng = np.random.default_rng(15)
    B = 3
    queries = jnp.asarray(
        np.stack([_path_queries(rng, 8) for _ in range(B)]), jnp.float32
    )
    points = jnp.asarray(rng.standard_normal((B, 9000, 3)) * 6, jnp.float32)
    masks = jnp.asarray(rng.random((B, 9000)) > 0.3)
    cd, cp, ovf = jax.vmap(
        lambda q, p, m: knn_culled(q, p, m, 3, 2.0, 2048)
    )(queries, points, masks)
    assert not np.asarray(ovf).any()
    for b in range(B):
        bd, bp = knn(queries[b], points[b], masks[b], 3)
        within = np.asarray(bd) <= 2.0 - 1e-4
        np.testing.assert_allclose(
            np.asarray(cd[b])[within], np.asarray(bd)[within], **_ULP
        )
        _check_coords_consistent(queries[b], cd[b], cp[b])


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
