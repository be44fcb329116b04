"""Rolling-map semantics tests: insert / prune / dedupe / query masking.

Mirrors the reference FrameKDMap keyframe lifecycle (FrameKDMap.cpp:437-488).
"""

import jax
import jax.numpy as jnp
import numpy as np

from avoid_mpc_tpu.config import PerceptionConfig
from avoid_mpc_tpu.mapping import (
    MapShape,
    map_add_frame,
    map_init,
    map_keyframe_update,
    map_nearest_distance,
    map_query,
)

P = 16  # tiny frames for tests
SHAPE = MapShape(n_frames=4, points_per_frame=P)
PCFG = PerceptionConfig()
TBC = jnp.asarray(PCFG.Tbc)
DMIN = jnp.asarray(PCFG.depth_min)
DD = jnp.asarray(PCFG.keyframe_dist_threshold)
DC = jnp.asarray(PCFG.keyframe_count_threshold)


def frame_at(x_center, n_valid=P, spread=2.0, seed=0):
    """A synthetic frame: points on a wall near x=x_center."""
    rng = np.random.default_rng(seed)
    pts = np.zeros((P, 3))
    pts[:, 0] = x_center
    pts[:, 1] = rng.uniform(-spread, spread, P)
    pts[:, 2] = rng.uniform(0.5, 2.5, P)
    mask = np.arange(P) < n_valid
    return jnp.asarray(pts), jnp.asarray(mask)


def pose_at(x):
    """Drone at (x,0,1.5) looking along +x; Twc = Twb @ Tbc."""
    Twb = jnp.eye(4).at[0, 3].set(x).at[2, 3].set(1.5)
    return Twb @ TBC


def add(m, x_wall, x_drone, seed=0, n_valid=P):
    pts, mask = frame_at(x_wall, seed=seed, n_valid=n_valid)
    return map_add_frame(m, pts, mask, pts, mask, pose_at(x_drone))


def tick(m):
    return map_keyframe_update(m, TBC, DMIN, DD, DC)


def test_empty_map_queries():
    m = map_init(SHAPE, dtype=jnp.float64)
    assert np.isinf(float(map_nearest_distance(m, jnp.zeros(3))))
    d, p = map_query(m, jnp.zeros((2, 3)), k=3)
    assert np.isinf(np.asarray(d)).all()


def test_seed_and_query_current_frame():
    m = map_init(SHAPE, dtype=jnp.float64)
    m = add(m, x_wall=5.0, x_drone=0.0)
    # before any maintenance tick the current frame is queryable
    d = float(map_nearest_distance(m, jnp.asarray([5.0, 0.0, 1.5])))
    assert d < 2.0
    m = tick(m)
    assert int(m.count) == 1


def test_pending_flag_consumed():
    m = map_init(SHAPE, dtype=jnp.float64)
    m = add(m, 5.0, 0.0)
    m = tick(m)
    c1 = int(m.count)
    m = tick(m)  # no new frame -> no-op
    assert int(m.count) == c1


def test_dedupe_blocks_duplicate_keyframe():
    """Re-observing the same wall must NOT grow the map (fewer than
    keyframe_th_count novel points)."""
    m = map_init(SHAPE, dtype=jnp.float64)
    m = add(m, 5.0, 0.0, seed=0)
    m = tick(m)
    m = add(m, 5.0, 0.1, seed=0)  # identical points
    m = tick(m)
    assert int(m.count) == 1


def test_novel_frame_inserts_and_dedupes_last():
    """A new wall far from the old one inserts a keyframe; the old keyframe
    keeps only points >0.1 m from current ones (all of them here)."""
    m = map_init(SHAPE, dtype=jnp.float64)
    m = add(m, 5.0, 0.0, seed=0)
    m = tick(m)
    m = add(m, 9.0, 1.0, seed=1)
    m = tick(m)
    assert int(m.count) == 2
    # both walls queryable: nearest to each wall is close
    assert float(map_nearest_distance(m, jnp.asarray([5.0, 0.0, 1.5]))) < 2.0
    assert float(map_nearest_distance(m, jnp.asarray([9.0, 0.0, 1.5]))) < 2.0


def test_prune_when_drone_passes_points():
    """Flying past a wall prunes its keyframe (DroneBehindPts fails)."""
    m = map_init(SHAPE, dtype=jnp.float64)
    m = add(m, 5.0, 0.0, seed=0)
    m = tick(m)
    m = add(m, 9.0, 1.0, seed=1)
    m = tick(m)
    assert int(m.count) == 2
    # drone now at x=7: wall at 5 is behind it
    m = add(m, 12.0, 7.0, seed=2)
    m = tick(m)
    # wall-5 keyframe pruned; wall-9 kept; wall-12 inserted
    assert int(m.count) == 2
    d5 = float(map_nearest_distance(m, jnp.asarray([5.0, 0.0, 1.5])))
    assert d5 > 2.0  # old wall gone (nearest is now wall 9)


def test_ring_overwrites_oldest_when_full():
    m = map_init(SHAPE, dtype=jnp.float64)
    # drone hovers at 0 (never passes walls); distinct walls ahead
    for i, xw in enumerate([5.0, 9.0, 13.0, 17.0, 21.0, 25.0]):
        m = add(m, xw, 0.0, seed=i)
        m = tick(m)
    assert int(m.count) == SHAPE.n_frames
    assert bool(jnp.sum(m.kf_valid) == SHAPE.n_frames)


def test_newest_keyframe_excluded_from_queries():
    """Reference UpdateQueryVector keeps keyframes[0..n-2] + current frame;
    the newest keyframe (a copy of current) must not double-count."""
    m = map_init(SHAPE, dtype=jnp.float64)
    m = add(m, 5.0, 0.0, seed=0)
    m = tick(m)
    q = jnp.asarray([[5.0, 0.0, 1.5]])
    d, pts = map_query(m, q, k=3)
    pts = np.asarray(pts[0])
    # all three neighbors distinct (no duplicated point from cur+kf copies)
    assert len({tuple(np.round(p, 9)) for p in pts}) == 3


def test_query_edge_cloud_separate():
    m = map_init(SHAPE, dtype=jnp.float64)
    pts, mask = frame_at(5.0)
    epts = pts + jnp.asarray([0.0, 10.0, 0.0])  # edges displaced
    m = map_add_frame(m, pts, mask, epts, mask, pose_at(0.0))
    d_obs, _ = map_query(m, jnp.asarray([[5.0, 0.0, 1.5]]), k=1, edge=False)
    d_edge, _ = map_query(m, jnp.asarray([[5.0, 10.0, 1.5]]), k=1, edge=True)
    assert float(d_obs[0, 0]) < 2.0 and float(d_edge[0, 0]) < 2.0


def test_jit_and_batch():
    """The full lifecycle jits, and vmaps over independent scenario maps."""

    @jax.jit
    def lifecycle(x_walls):
        m = map_init(SHAPE, dtype=jnp.float64)

        def body(m, xw):
            pts = jnp.zeros((P, 3)).at[:, 0].set(xw).at[:, 2].set(1.5)
            pts = pts.at[:, 1].set(jnp.linspace(-2, 2, P))
            mask = jnp.ones(P, bool)
            m = map_add_frame(m, pts, mask, pts, mask, pose_at(0.0))
            return map_keyframe_update(m, TBC, DMIN, DD, DC), None

        m, _ = jax.lax.scan(body, m, x_walls)
        return m.count

    counts = jax.vmap(lifecycle)(jnp.asarray([[5.0, 9.0, 13.0], [4.0, 4.0, 4.0]]))
    assert int(counts[0]) == 3  # distinct walls all kept
    assert int(counts[1]) == 1  # duplicates deduped away
