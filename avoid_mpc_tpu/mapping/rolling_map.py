"""Device-resident rolling keyframe map — FrameKDMap without the pointers.

The reference keeps a deque of per-frame KD-trees guarded by a mutex, with a
detached 30 ms maintenance thread that prunes stale keyframes, dedupes the
newest keyframe against the current frame, and re-indexes
(``FrameKDMap.cpp:34-52, 437-488``).  None of that survives contact with XLA:
the TPU-native map is a **fixed-shape masked ring buffer** living in HBM —

- ``(F, P, 3)`` keyframe point slabs + ``(F, P)`` validity masks (obstacle and
  edge clouds), ``(F, 4, 4)`` camera poses, ring head/count scalars,
- the current frame in its own slab (the reference's ``mCurFrame``),
- insert = write one slot + advance head; prune = drop from the logical tail;
  dedupe = AND a mask — all O(1)-shaped, jit-stable updates,
- queries are masked brute-force k-NN over the flattened slabs
  (:mod:`avoid_mpc_tpu.ops.knn`) — batched over scenarios by vmap, the MXU
  does the distance work that nanoflann tree descent did on CPU threads.

Semantics mirrored from the reference (each noted at its function):
keyframe prune condition ``DroneBehindPts``, dedupe threshold/count, the
newest keyframe being excluded from queries (``UpdateQueryVector``,
FrameKDMap.cpp:64-74, keeps keyframes[0..n-2] + current frame only), and the
empty-map re-seed happening on the *next* maintenance tick.

Divergences (both conservative):
- queries always fan over the whole map; the reference's current-frame-only
  fast path (``FrameKDMap.cpp:329-345``) can return worse neighbors and is a
  CPU-latency optimization with no TPU benefit,
- a full ring overwrites the oldest slot on insert instead of transiently
  holding max+1 frames until the next maintenance tick.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from avoid_mpc_tpu.config import PerceptionConfig
from avoid_mpc_tpu.ops.knn import knn, knn_culled, nearest_distance

# DroneBehindPts inspects at most this many nearest points (FrameKDMap.cpp:239-240).
_BEHIND_K = 10


class MapShape(NamedTuple):
    """Static shape parameters of the map."""

    n_frames: int  # F — max_frame_count (yaml max_frame_count: 100)
    points_per_frame: int  # P — grid_h * grid_w after downsample

    @staticmethod
    def from_config(p: PerceptionConfig) -> "MapShape":
        return MapShape(n_frames=p.max_frame_count, points_per_frame=p.points_per_frame)


class RollingMap(NamedTuple):
    # keyframe ring
    kf_points: jax.Array  # (F, P, 3)
    kf_mask: jax.Array  # (F, P) bool
    kf_edge_points: jax.Array  # (F, P, 3)
    kf_edge_mask: jax.Array  # (F, P) bool
    kf_Twc: jax.Array  # (F, 4, 4)
    kf_valid: jax.Array  # (F,) bool — slot holds a live keyframe
    head: jax.Array  # int32 — slot of the newest keyframe
    count: jax.Array  # int32 — number of live keyframes
    # current frame
    cur_points: jax.Array  # (P, 3)
    cur_mask: jax.Array  # (P,)
    cur_edge_points: jax.Array  # (P, 3)
    cur_edge_mask: jax.Array  # (P,)
    cur_Twc: jax.Array  # (4, 4)
    cur_valid: jax.Array  # bool scalar
    pending: jax.Array  # bool — new frame awaiting keyframe maintenance
    # (the mbNeedProcessPtCloud flag, FrameKDMap.cpp:51)


def map_init(shape: MapShape, dtype=jnp.float32) -> RollingMap:
    f, p = shape.n_frames, shape.points_per_frame
    return RollingMap(
        kf_points=jnp.zeros((f, p, 3), dtype=dtype),
        kf_mask=jnp.zeros((f, p), dtype=bool),
        kf_edge_points=jnp.zeros((f, p, 3), dtype=dtype),
        kf_edge_mask=jnp.zeros((f, p), dtype=bool),
        kf_Twc=jnp.tile(jnp.eye(4, dtype=dtype)[None], (f, 1, 1)),
        kf_valid=jnp.zeros((f,), dtype=bool),
        head=jnp.asarray(0, dtype=jnp.int32),
        count=jnp.asarray(0, dtype=jnp.int32),
        cur_points=jnp.zeros((p, 3), dtype=dtype),
        cur_mask=jnp.zeros((p,), dtype=bool),
        cur_edge_points=jnp.zeros((p, 3), dtype=dtype),
        cur_edge_mask=jnp.zeros((p,), dtype=bool),
        cur_Twc=jnp.eye(4, dtype=dtype),
        cur_valid=jnp.asarray(False),
        pending=jnp.asarray(False),
    )


def map_add_frame(
    m: RollingMap,
    points: jax.Array,
    mask: jax.Array,
    edge_points: jax.Array,
    edge_mask: jax.Array,
    Twc: jax.Array,
) -> RollingMap:
    """Install a freshly processed depth frame as the current frame
    (reference ``AddVertex``/``SetCurPtCloud``, FrameKDMap.cpp:34-58).
    A frame with no valid points is ignored (reference :41-43)."""
    has_pts = jnp.any(mask)
    return m._replace(
        cur_points=jnp.where(has_pts, points, m.cur_points),
        cur_mask=jnp.where(has_pts, mask, m.cur_mask),
        cur_edge_points=jnp.where(has_pts, edge_points, m.cur_edge_points),
        cur_edge_mask=jnp.where(has_pts, edge_mask, m.cur_edge_mask),
        cur_Twc=jnp.where(has_pts, Twc, m.cur_Twc),
        cur_valid=m.cur_valid | has_pts,
        pending=m.pending | has_pts,
    )


def _age_order_slots(m: RollingMap):
    """Slot indices oldest-first: slot_i = (head - count + 1 + i) mod F."""
    f = m.kf_valid.shape[0]
    i = jnp.arange(f, dtype=jnp.int32)
    return jnp.mod(m.head - m.count + 1 + i, f)


def _drone_behind_pts(m: RollingMap, Tbc: jax.Array, depth_min: jax.Array) -> jax.Array:
    """Per-slot keep condition (reference ``DroneBehindPts``,
    FrameKDMap.cpp:233-252): the frame stays while ALL of the ~10 points of
    that frame nearest to the drone are still ahead of the drone's camera
    body frame (body x > depth_min). Vectorized over all F slots."""
    from avoid_mpc_tpu.utils.quaternion import compose_tf, rigid_inverse

    # exact f32 pose math (CLAUDE.md rule 1): rigid inverse + FMA compose,
    # no bf16 MXU pass on a world-scale translation column
    Twb = compose_tf(m.cur_Twc, rigid_inverse(Tbc))
    twb = Twb[:3, 3]
    Rbw = Twb[:3, :3].T

    def per_frame(pts, mask):
        dists, npts = knn(twb[None, :], pts, mask, k=_BEHIND_K)
        # difference form: camera-relative offsets, exact elementwise dot
        ptb_x = jnp.sum((npts[0] - twb) * Rbw[0], axis=-1)
        valid = jnp.isfinite(dists[0])
        # a frame with no points at all: treat as "not behind" -> prune
        return jnp.all(jnp.where(valid, ptb_x > depth_min, True)) & jnp.any(mask)

    return jax.vmap(per_frame)(m.kf_points, m.kf_mask)


def _insert_keyframe(m: RollingMap) -> RollingMap:
    """Push the current frame into the ring (reference ``InsertKeyFrame``,
    FrameKDMap.cpp:428-432). A full ring overwrites the oldest slot."""
    f = m.kf_valid.shape[0]
    new_head = jnp.mod(m.head + 1, f)
    return m._replace(
        kf_points=m.kf_points.at[new_head].set(m.cur_points),
        kf_mask=m.kf_mask.at[new_head].set(m.cur_mask),
        kf_edge_points=m.kf_edge_points.at[new_head].set(m.cur_edge_points),
        kf_edge_mask=m.kf_edge_mask.at[new_head].set(m.cur_edge_mask),
        kf_Twc=m.kf_Twc.at[new_head].set(m.cur_Twc),
        kf_valid=m.kf_valid.at[new_head].set(True),
        head=new_head,
        count=jnp.minimum(m.count + 1, f),
    )


def map_keyframe_update(
    m: RollingMap,
    Tbc: jax.Array,
    depth_min: jax.Array,
    dedupe_dist: jax.Array,
    dedupe_count: jax.Array,
) -> RollingMap:
    """One maintenance tick (the 30 ms ``KeyframeThreadWorker`` body,
    FrameKDMap.cpp:437-488), as a pure masked update:

    1. no pending frame -> no-op,
    2. empty map -> seed with the current frame,
    3. prune the oldest-first prefix of keyframes the drone has flown past,
    4. dedupe the newest keyframe against the current frame (keep only points
       farther than ``dedupe_dist`` from any current point); if at least
       ``dedupe_count`` survive, commit the dedupe and insert the current
       frame as the new keyframe — otherwise leave the map unchanged.
    """
    f = m.kf_valid.shape[0]

    def no_op(m):
        return m

    def seed(m):
        return _insert_keyframe(m)

    def maintain(m):
        # --- prune: drop the contiguous oldest-first prefix of frames that
        # the drone is no longer behind (reference while-loop :449-458) ---
        behind = _drone_behind_pts(m, Tbc, depth_min)  # (F,) by slot
        slots = _age_order_slots(m)  # (F,) oldest-first
        in_ring = jnp.arange(f) < m.count
        keep_age = behind[slots] & in_ring  # oldest-first keep flags
        # first age index that is kept; everything before it is dropped
        first_keep = jnp.argmax(keep_age)  # 0 if none kept -> handled below
        any_keep = jnp.any(keep_age)
        n_drop = jnp.where(any_keep, first_keep, m.count)
        # invalidate dropped slots
        age_idx = jnp.arange(f)
        drop_age = (age_idx < n_drop) & in_ring
        kf_valid = m.kf_valid.at[slots].set(jnp.where(drop_age, False, m.kf_valid[slots]))
        m = m._replace(kf_valid=kf_valid, count=m.count - n_drop.astype(jnp.int32))

        def after_prune(m):
            # --- dedupe newest keyframe vs current frame (:462-486) ---
            last = m.head
            last_pts = m.kf_points[last]
            last_mask = m.kf_mask[last]
            d, _ = knn(last_pts, m.cur_points, m.cur_mask, k=1)
            outlier = (d[:, 0] > dedupe_dist) & last_mask
            n_out = jnp.sum(outlier)

            def commit(m):
                m = m._replace(kf_mask=m.kf_mask.at[last].set(outlier))
                return _insert_keyframe(m)

            return jax.lax.cond(n_out >= dedupe_count, commit, no_op, m)

        # empty after prune -> stop (reference :459-461 re-seeds next tick)
        return jax.lax.cond(m.count > 0, after_prune, no_op, m)

    m = jax.lax.cond(
        m.pending & m.cur_valid,
        lambda m: jax.lax.cond(m.count == 0, seed, maintain, m),
        no_op,
        m,
    )
    return m._replace(pending=jnp.asarray(False))


def _query_mask(m: RollingMap, edge: bool):
    """Flattened (F+1)*P mask: current frame + keyframes excluding the newest
    (reference ``UpdateQueryVector`` keeps keyframes[0..n-2] + current)."""
    kf_mask = m.kf_edge_mask if edge else m.kf_mask
    cur_mask = m.cur_edge_mask if edge else m.cur_mask
    f = m.kf_valid.shape[0]
    slot_ok = m.kf_valid & ~((jnp.arange(f) == m.head) & (m.count > 0))
    kf = kf_mask & slot_ok[:, None]
    cur = cur_mask & m.cur_valid
    return jnp.concatenate([cur[None], kf], axis=0).reshape(-1)


def _query_points(m: RollingMap, edge: bool):
    kf_pts = m.kf_edge_points if edge else m.kf_points
    cur_pts = m.cur_edge_points if edge else m.cur_points
    return jnp.concatenate([cur_pts[None], kf_pts], axis=0).reshape(-1, 3)


def map_query(m: RollingMap, queries: jax.Array, k: int, edge: bool = False):
    """k-NN over the whole map (reference ``QueryNearest``,
    FrameKDMap.cpp:322-376, minus the CPU fast path).
    queries: (Q,3) -> (dists (Q,k), points (Q,k,3))."""
    return knn(queries, _query_points(m, edge), _query_mask(m, edge), k)


def map_query_culled(
    m: RollingMap,
    queries: jax.Array,
    k: int,
    r_cut: float,
    m_max: int,
    edge: bool = False,
):
    """k-NN over the map through the bbox cull (:func:`ops.knn.knn_culled`) —
    the sub-linear path for large maps.  Exact (== :func:`map_query`) for
    every neighbor within ``r_cut`` of its query; farther slots fall to the
    inf/FAR_SENTINEL "not found" semantics.  Returns
    ``(dists, pts, overflow)``."""
    return knn_culled(
        queries, _query_points(m, edge), _query_mask(m, edge), k, r_cut, m_max
    )


def map_nonempty(m: RollingMap, edge: bool = False) -> jax.Array:
    """True when at least one point is queryable — distinguishes the
    radius-bounded "nothing within r_cut" from the reference's "map empty"
    (which forces a replan, AvoidanceStateMachine.cpp:228-231)."""
    return jnp.any(_query_mask(m, edge))


def map_nearest_distance(m: RollingMap, point: jax.Array) -> jax.Array:
    """1-NN distance over the obstacle clouds (reference
    ``GetNearestDistance``, FrameKDMap.cpp:400-427)."""
    return nearest_distance(point, _query_points(m, False), _query_mask(m, False))


def map_point_cloud(m: RollingMap):
    """Dump the queryable cloud with per-frame ids for visualization — the
    ``GetPtCloud`` colorized rviz dump (FrameKDMap.cpp:490-515).

    Returns (points ((F+1)*P, 3), frame_id ((F+1)*P,) int32 with 0 = current
    frame, mask ((F+1)*P,)). Feed to utils.viz or export."""
    pts = _query_points(m, edge=False)
    mask = _query_mask(m, edge=False)
    f = m.kf_valid.shape[0]
    p = m.cur_points.shape[0]
    frame_id = jnp.repeat(jnp.arange(f + 1, dtype=jnp.int32), p)
    return pts, frame_id, mask
