"""End-to-end host sensor-ingestion chain (round-3 VERDICT item 7).

The deployment story, exercised as ONE chain instead of piecewise:

  MAVLink UDP loopback (runtime/mavlink_conn.cpp) -> MavVehicleInput
  odometry snapshot (NED -> z-up world) -> depth frame through the native
  seqlock FrameRing (runtime/frame_ring.cpp) -> process_depth_frame
  back-projection -> rolling-map ingest + keyframe maintenance ->
  receding_step obstacle association + solve.

Reference analogue: the depth callback path AvoidanceStateMachine.cpp:154-165
(odometry extrapolation + FrameKDMap::AddVertex) feeding the TASK-state
solve (:322-355), with transport via ROS topics + MavLinkCom instead.
"""

import socket
import time

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from avoid_mpc_tpu.runtime.native import MavConnection, native_available

pytestmark = pytest.mark.skipif(
    not native_available(), reason="native runtime unavailable"
)


def _free_ports(n):
    socks = [socket.socket() for _ in range(n)]
    for s in socks:
        s.bind(("127.0.0.1", 0))
    ports = [s.getsockname()[1] for s in socks]
    for s in socks:
        s.close()
    return ports


def _wait(pred, timeout=3.0):
    deadline = time.monotonic() + timeout
    while time.monotonic() < deadline:
        if pred():
            return True
        time.sleep(0.01)
    return False


def test_host_sensor_ingestion_chain():
    import dataclasses

    from avoid_mpc_tpu.config import EngineConfig, MPCConfig, TaskConfig
    from avoid_mpc_tpu.engine import engine_init, receding_step
    from avoid_mpc_tpu.mapping import (
        map_add_frame, map_init, map_keyframe_update, map_nearest_distance,
    )
    from avoid_mpc_tpu.ops.depth import process_depth_frame
    from avoid_mpc_tpu.runtime import FrameRing
    from avoid_mpc_tpu.runtime.mav_input import MavVehicleInput
    from avoid_mpc_tpu.sim.world import build_world
    from avoid_mpc_tpu.utils.quaternion import quat_to_rotmat

    cfg = EngineConfig(
        mpc=dataclasses.replace(
            MPCConfig(), mpc_T=0.5, sqp_iters=4, sqp_iters_fast=3,
            mpc_max_iter=2, speed=4.0,
        ),
        task=TaskConfig(height=1.5),
    )
    params, hyper = build_world(cfg, render_scale=8, grid_scale=4, map_frames=4)
    h, w = hyper.render_h, hyper.render_w
    dtype = jnp.float64

    # --- 1. vehicle odometry over a real UDP loopback ---------------------
    pa, pb = _free_ports(2)
    ctrl = MavConnection(pa, "127.0.0.1", pb, sysid=255, compid=0)
    veh = MavConnection(pb, "127.0.0.1", pa, sysid=1, compid=1)
    try:
        veh.send_heartbeat()
        assert _wait(lambda: ctrl.link_ok(2.0))
        # world pose (0, 0, 1.5) z-up, v = (1, 0, 0), level attitude:
        # NED position (0, 0, -1.5), NED velocity (1, 0, 0)
        veh.send_local_position(0.0, (0.0, 0.0, -1.5), (1.0, 0.0, 0.0))
        veh.send_attitude(0.0, (0.0, 0.0, 0.0))
        inp = MavVehicleInput(ctrl)
        assert _wait(lambda: np.isfinite(inp.snapshot().odom_age))
        assert _wait(lambda: np.isfinite(inp.snapshot().att_age))
        snap = inp.snapshot()
    finally:
        ctrl.close()
        veh.close()
    np.testing.assert_allclose(snap.odom_p, (0.0, 0.0, 1.5), atol=1e-6)
    np.testing.assert_allclose(snap.odom_v, (1.0, 0.0, 0.0), atol=1e-6)
    np.testing.assert_allclose(snap.odom_q, (1.0, 0.0, 0.0, 0.0), atol=1e-6)

    # --- 2. depth frame through the native seqlock ring -------------------
    wall_x = 3.0
    depth = np.full((h, w), wall_x, np.float32)
    ring = FrameRing(slot_bytes=depth.nbytes, capacity=4)
    assert ring.push(depth, stamp=0.033)
    popped = ring.pop_latest()
    assert popped is not None
    frame_bytes, stamp = popped
    depth_rx = np.frombuffer(bytes(frame_bytes), np.float32).reshape(h, w)
    np.testing.assert_array_equal(depth_rx, depth)
    assert stamp == pytest.approx(0.033)

    # --- 3+4. back-project through the mav pose, ingest into the map ------
    Twb = (
        jnp.eye(4, dtype=dtype)
        .at[:3, :3].set(quat_to_rotmat(jnp.asarray(snap.odom_q, dtype)))
        .at[:3, 3].set(jnp.asarray(snap.odom_p, dtype))
    )
    cast = lambda a: (
        a.astype(dtype)
        if hasattr(a, "dtype") and jnp.issubdtype(a.dtype, jnp.floating)
        else a
    )
    pts, mask, epts, emask = process_depth_frame(
        jnp.asarray(depth_rx, dtype), Twb, jax.tree.map(cast, params.cam)
    )
    m = map_init(hyper.map_shape, dtype=dtype)
    Tbc = jnp.asarray(params.Tbc, dtype)
    m = map_add_frame(m, pts, mask, epts, emask, Twb @ Tbc)
    m = map_keyframe_update(
        m, Tbc, jnp.asarray(float(params.depth_min), dtype),
        jnp.asarray(float(params.dedupe_dist), dtype), params.dedupe_count,
    )
    assert int(np.asarray(mask).sum()) > 0
    # nearest ingested point sits on the wall plane ~3 m ahead of the camera
    d_near = float(map_nearest_distance(m, jnp.asarray(snap.odom_p, dtype)))
    assert 2.0 < d_near < 3.6, d_near

    # --- 5. the receding-horizon engine consumes the ingested map ---------
    quad_state = jnp.concatenate(
        [
            jnp.asarray(snap.odom_p, dtype),
            jnp.zeros(1, dtype),
            jnp.asarray(snap.odom_v, dtype),
            jnp.zeros(3, dtype),
        ]
    )
    params_e = jax.tree.map(cast, params.engine)
    es = engine_init(cfg, dtype=dtype)
    # params closed over (not a jit argument): use_drag etc. stay static
    step = jax.jit(
        lambda es, q, mm: receding_step(es, q, mm, params_e, hyper.engine)
    )
    es2, out = step(es, quad_state, m)
    assert np.isfinite(np.asarray(out.u_cmd)).all()
    assert np.isfinite(float(out.cost))
    # association found the ingested wall: some associated obstacle lies on
    # the wall plane (x ~ 3 m in front), not at the far-away pad sentinel
    obs = np.asarray(out.obstacles).reshape(-1, 3)
    real = obs[obs[:, 0] < 100.0]
    assert real.size > 0
    assert np.min(np.abs(real[:, 0] - wall_x)) < 0.75, real[:5]
