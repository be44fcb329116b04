"""Receding-horizon engine tests: closed-loop behavior with the lag plant.

The plant is the MPC's own first-order-lag model (the minimum fidelity loop;
the 6-DoF plant lives in avoid_mpc_tpu.sim) — exactly the setup SURVEY.md §7
step 3 prescribes for the minimum end-to-end slice.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from avoid_mpc_tpu.config import EngineConfig, MPCConfig, PerceptionConfig, TaskConfig
from avoid_mpc_tpu.engine import (
    EngineHyper,
    EngineParams,
    EngineState,
    engine_init,
    receding_step,
)
from avoid_mpc_tpu.mapping import MapShape, map_add_frame, map_init
from avoid_mpc_tpu.models.quadrotor import DynamicsParams, rk4_step

CFG = EngineConfig(
    mpc=dataclasses.replace(MPCConfig(), sqp_iters=8, sqp_iters_fast=5, speed=5.0),
    task=TaskConfig(height=1.5, goal_x=500.0),
)
DTYPE = jnp.float64
P = EngineParams.from_config(CFG, dtype=DTYPE)
H = EngineHyper.from_config(CFG)
N = CFG.mpc.horizon_steps
SHAPE = MapShape(n_frames=2, points_per_frame=64)
DP = DynamicsParams.from_config(CFG.mpc, dtype=DTYPE)


def hover_state(x=0.0, z=1.5):
    return jnp.zeros(10, dtype=DTYPE).at[0].set(x).at[2].set(z)


def empty_map():
    return map_init(SHAPE, dtype=DTYPE)


def map_with_points(pts_np, edge_pts_np=None):
    m = map_init(SHAPE, dtype=DTYPE)
    p = SHAPE.points_per_frame
    pts = np.full((p, 3), 0.0)
    mask = np.zeros(p, bool)
    k = min(len(pts_np), p)
    pts[:k] = pts_np[:k]
    mask[:k] = True
    if edge_pts_np is None:
        epts, emask = pts, np.zeros(p, bool)
    else:
        epts = np.full((p, 3), 0.0)
        emask = np.zeros(p, bool)
        ke = min(len(edge_pts_np), p)
        epts[:ke] = edge_pts_np[:ke]
        emask[:ke] = True
    return map_add_frame(
        m,
        jnp.asarray(pts, DTYPE), jnp.asarray(mask),
        jnp.asarray(epts, DTYPE), jnp.asarray(emask),
        jnp.eye(4, dtype=DTYPE),
    )


@jax.jit
def tick(state, quad, m):
    return receding_step(state, quad, m, P, H)


def run_closed_loop(n_ticks, m, x0=None):
    state = engine_init(CFG, dtype=DTYPE)
    quad = hover_state() if x0 is None else x0
    traj = [quad]
    outs = []
    for _ in range(n_ticks):
        state, out = tick(state, quad, m)
        quad = rk4_step(quad, out.u_cmd, CFG.mpc.con_dt, DP)
        traj.append(quad)
        outs.append(out)
    return state, jnp.stack(traj), outs


@pytest.fixture(scope="module")
def forward_flight():
    return run_closed_loop(90, empty_map())


def test_forward_task_reaches_speed(forward_flight):
    _, traj, outs = forward_flight
    traj = np.asarray(traj)
    assert np.all(np.isfinite(traj))
    # after 3 s the drone should fly near the commanded speed...
    assert traj[-1, 4] > 0.8 * CFG.mpc.speed
    # ... level at the task height ...
    np.testing.assert_allclose(traj[-1, 2], CFG.task.height, atol=0.15)
    # ... straight ahead
    assert abs(traj[-1, 1]) < 0.2
    assert all(bool(o.is_safety) for o in outs)


def test_monotone_progress(forward_flight):
    _, traj, _ = forward_flight
    x = np.asarray(traj)[:, 0]
    assert np.all(np.diff(x[30:]) > 0)


def test_early_exit_when_safe():
    """With a far-away populated map: iter 0 runs, iter 1 exits."""
    m = map_with_points(np.array([[50.0, 20.0, 1.5]]))
    state = engine_init(CFG, dtype=DTYPE)
    state, out = tick(state, hover_state(), m)
    assert int(out.outer_iters) == 1
    assert not bool(out.need_replan)


def test_empty_map_keeps_replanning_flag(forward_flight):
    """Empty map -> 'not enough points' path: need_replan stays True but the
    MPC command is still used (reference warns and pads, :224-231)."""
    _, _, outs = forward_flight
    assert all(bool(o.need_replan) for o in outs)
    assert all(int(o.outer_iters) == H.max_outer_iters for o in outs)


def test_slow_down_fallback_without_edges():
    """First waypoint inside the safety margin and NO edge cloud ->
    is_safety False and the PD slow-down command (:345-350, 379-397)."""
    state = engine_init(CFG, dtype=DTYPE)
    quad = hover_state().at[4].set(3.0)  # moving forward
    # obstacle exactly at the first shifted ref waypoint region
    p1 = np.asarray(state.ref_path[1, 0:3])
    m = map_with_points(p1[None, :] + 1e-4)
    state2, out = tick(state, quad, m)
    assert not bool(out.is_safety)
    kp, kd = CFG.mpc.slow_down_kp, CFG.mpc.slow_down_kd
    v = np.asarray(quad[4:7])
    a = np.asarray(quad[7:10])
    want = -v * kp - a * kd + np.array([0, 0, 9.8])
    np.testing.assert_allclose(np.asarray(out.u_cmd[:3]), want, atol=1e-9)


def test_edge_warm_start_replaces_waypoint():
    """First waypoint unsafe + edge points present -> waypoint snaps to the
    nearest edge point and the tick stays safe (:259-281)."""
    state = engine_init(CFG, dtype=DTYPE)
    p1 = np.asarray(state.ref_path[1, 0:3])
    edge = np.array([[p1[0], p1[1] + 1.0, p1[2]]])  # escape point 1m left
    m = map_with_points(p1[None, :] + 1e-4, edge_pts_np=edge)
    state2, out = tick(state, hover_state(), m)
    assert bool(out.is_safety)


def test_horizon_shift_semantics():
    state = engine_init(CFG, dtype=DTYPE)
    quad = hover_state(x=2.0)
    state2, _ = tick(state, quad, empty_map())
    # terminal ref row was rebuilt: x = min(pos_x + speed*T, goal_x), vx=speed
    # (then the row was replaced by predicted nodes; check the shift via
    # running the pure shift helper instead)
    from avoid_mpc_tpu.engine.receding import _shift_horizon

    shifted = _shift_horizon(state, quad[0:3], P, H)
    np.testing.assert_allclose(
        float(shifted.ref_path[-1, 0]), min(2.0 + CFG.mpc.speed * CFG.mpc.mpc_T, 500.0)
    )
    np.testing.assert_allclose(float(shifted.ref_path[-1, 4]), CFG.mpc.speed)
    np.testing.assert_allclose(
        np.asarray(shifted.ref_path[:-1, 0]), np.asarray(state.ref_path[1:, 0])
    )
    np.testing.assert_allclose(np.asarray(shifted.ref_path[:, 2]), CFG.task.height)


def test_avoidance_around_wall():
    """A dense wall patch on the straight path (what a depth frame actually
    produces): the closed loop must deviate and keep clearance above the
    replan safety margin, then make progress past the wall.

    The wall is offset +0.1 m in y (like the reference benchmark's goal
    y=0.1, tools/mpc_obstacle_casadi.py:458) — a perfectly symmetric wall is
    a zero-gradient saddle no descent method can break.
    """
    ys = np.linspace(-0.9, 1.1, 8)
    zs = np.linspace(0.1, 3.0, 8)
    yy, zz = np.meshgrid(ys, zs)
    wall = np.stack([np.full(64, 4.0), yy.ravel(), zz.ravel()], axis=1)
    # edge points: the wall's lateral borders (what Canny would find)
    border = (np.abs(yy.ravel() - ys[0]) < 1e-9) | (np.abs(yy.ravel() - ys[-1]) < 1e-9)
    edges = wall[border]
    m = map_with_points(wall, edge_pts_np=edges)
    _, traj, outs = run_closed_loop(140, m)
    traj = np.asarray(traj)
    assert np.all(np.isfinite(traj))
    # clearance above the replan safety margin (soft cost, not hard constraint)
    d = np.sqrt(((traj[:, None, 0:3] - wall[None]) ** 2).sum(-1)).min()
    assert d > CFG.mpc.safety_distance, d
    # the drone deviates (laterally or vertically) to get around
    dev = max(np.abs(traj[:, 1]).max(), np.abs(traj[:, 2] - 1.5).max())
    assert dev > 0.3, dev
    # and still makes forward progress past the wall
    assert traj[-1, 0] > 4.5, traj[-1, 0]


def test_batched_engine_vmaps():
    state = engine_init(CFG, dtype=DTYPE)
    quads = jnp.stack([hover_state(0.0), hover_state(1.0)])
    states = jax.tree.map(lambda a: jnp.stack([a, a]), state)
    maps = jax.tree.map(lambda a: jnp.stack([a, a]), empty_map())
    bstep = jax.jit(jax.vmap(lambda s, q, m: receding_step(s, q, m, P, H)))
    (new_states, outs) = bstep(states, quads, maps)
    s0, o0 = tick(state, quads[0], empty_map())
    np.testing.assert_allclose(
        np.asarray(outs.u_cmd[0]), np.asarray(o0.u_cmd), atol=1e-8
    )
    assert outs.u_cmd.shape == (2, 4)


def test_ttc_trigger_forces_slow_down():
    """ttc_threshold > 0: closing fast on a tangential/near obstacle forces
    the PD slow-down command even when the solver returns a 'safe' plan
    (round-2 extension; reference triggers on distance only,
    AvoidanceStateMachine.cpp:345-350)."""
    # obstacle 2 m ahead, drone closing at 5 m/s -> TTC ~ (2-0.5)/5 = 0.3 s
    m = map_with_points(np.asarray([[2.0, 0.0, 1.5]]))
    x = hover_state().at[4].set(5.0)
    es = engine_init(CFG, dtype=DTYPE)

    p_on = P._replace(ttc_threshold=jnp.asarray(0.5, DTYPE))
    h_on = H._replace(use_ttc=True)  # trace-time gate (ADVICE r2)
    _, out_on = receding_step(es, x, m, p_on, h_on)
    assert not bool(out_on.is_safety)
    # the command is the PD slow-down formula, not the MPC control
    from avoid_mpc_tpu.engine.receding import _slow_down_cmd

    np.testing.assert_allclose(
        np.asarray(out_on.u_cmd), np.asarray(_slow_down_cmd(x, p_on)), atol=1e-9
    )

    # receding obstacle (moving away) never triggers regardless of threshold
    x_away = hover_state().at[4].set(-5.0)
    _, out_away = receding_step(es, x_away, m, p_on, h_on)
    assert bool(out_away.is_safety)

    # disabled threshold (0) with the query compiled in -> stays nominal
    _, out_off = receding_step(es, x, m, P, h_on)
    assert bool(out_off.is_safety)
    # shipped default: gate off entirely -> also nominal, no query emitted
    _, out_gate = receding_step(es, x, m, P, H)
    assert bool(out_gate.is_safety)


def test_global_goal_task_steps_toward_goal():
    """TASK_GLOBAL_GOAL horizon shift walks the far end toward the clicked
    goal at speed*dt per tick (AvoidanceStateMachine.cpp:38-45), including
    the lateral component."""
    cfg = dataclasses.replace(CFG, task=dataclasses.replace(CFG.task, task="global_goal"))
    h_gg = EngineHyper.from_config(cfg)
    from avoid_mpc_tpu.engine.receding import TASK_GLOBAL_GOAL, _shift_horizon

    assert h_gg.task_mode == TASK_GLOBAL_GOAL
    es = engine_init(cfg, dtype=DTYPE)
    goal = jnp.asarray([8.0, 3.0, 1.5] + [0.0] * 7, dtype=DTYPE)
    es = es._replace(goal=goal)
    pos = jnp.zeros(3, dtype=DTYPE)

    last0 = es.ref_path[-1, 0:3]
    d0 = float(jnp.linalg.norm(goal[0:3] - last0))
    es1 = _shift_horizon(es, pos, P, h_gg)
    last1 = es1.ref_path[-1, 0:3]
    d1 = float(jnp.linalg.norm(goal[0:3] - last1))
    step = float(P.speed * P.sp.dt)
    np.testing.assert_allclose(d0 - d1, min(step, d0), rtol=1e-6)
    # the step moves along the straight line to the goal
    dir_goal = (goal[0:3] - last0) / d0
    np.testing.assert_allclose(
        np.asarray((last1 - last0) / jnp.linalg.norm(last1 - last0)),
        np.asarray(dir_goal), rtol=1e-6,
    )

    # closed loop: repeated shifts converge the path end onto the goal
    es_k = es
    for _ in range(60):
        es_k = _shift_horizon(es_k, pos, P, h_gg)
    np.testing.assert_allclose(
        np.asarray(es_k.ref_path[-1, 0:3]), np.asarray(goal[0:3]), atol=1e-6
    )

    # and a full receding_step in global-goal mode flies without error
    _, out = receding_step(es, hover_state(), empty_map(), P, h_gg)
    assert bool(jnp.all(jnp.isfinite(out.u_cmd)))


def test_culled_association_matches_brute_on_big_map():
    """The sub-linear bbox-culled association (assoc_radius > 0, map big
    enough to engage the cull) must reproduce the brute-force engine tick:
    same command, same safety/replan verdicts, same predicted path.  The
    collision softplus underflows beyond ~1.6 m, so the 2.5 m radius
    preserves the solve to solver precision (MPCConfig.assoc_radius)."""
    big_shape = MapShape(n_frames=2, points_per_frame=4096)
    rng = np.random.default_rng(21)
    # dense wall on the path + scatter filling the rest of the field
    ys = np.linspace(-0.9, 1.1, 16)
    zs = np.linspace(0.1, 3.0, 16)
    yy, zz = np.meshgrid(ys, zs)
    wall = np.stack([np.full(256, 4.0), yy.ravel(), zz.ravel()], axis=1)
    scatter = rng.uniform([-5, -20, 0], [60, 20, 8], (4096 * 2 - 256, 3))
    pts = np.concatenate([wall, scatter]).reshape(2, 4096, 3)
    m = map_init(big_shape, dtype=DTYPE)
    m = m._replace(
        kf_points=jnp.asarray(pts, DTYPE),
        kf_mask=jnp.ones((2, 4096), bool),
        kf_edge_points=jnp.asarray(pts + 0.05, DTYPE),
        kf_edge_mask=jnp.ones((2, 4096), bool),
        kf_valid=jnp.ones(2, bool),
        head=jnp.asarray(1, jnp.int32), count=jnp.asarray(2, jnp.int32),
        cur_points=jnp.asarray(pts[0], DTYPE), cur_mask=jnp.ones(4096, bool),
        cur_edge_points=jnp.asarray(pts[0] + 0.05, DTYPE),
        cur_edge_mask=jnp.ones(4096, bool),
        cur_valid=jnp.asarray(True),
    )
    # queryable set = cur + keyframes-minus-newest = 8192 points > 2*m_max
    h_cull = H._replace(assoc_radius=2.5, assoc_m_max=2048)
    h_brute = H._replace(assoc_radius=0.0)
    es = engine_init(CFG, dtype=DTYPE)
    quad = hover_state(x=1.0)
    for _ in range(3):
        es_c, out_c = receding_step(es, quad, m, P, h_cull)
        es_b, out_b = receding_step(es, quad, m, P, h_brute)
        np.testing.assert_allclose(
            np.asarray(out_c.u_cmd), np.asarray(out_b.u_cmd), atol=1e-9
        )
        assert bool(out_c.is_safety) == bool(out_b.is_safety)
        assert bool(out_c.need_replan) == bool(out_b.need_replan)
        np.testing.assert_allclose(
            np.asarray(out_c.predicted), np.asarray(out_b.predicted), atol=1e-7
        )
        es = es_c._replace(ref_path=es_b.ref_path)  # advance (identical anyway)
        np.testing.assert_allclose(
            np.asarray(es_c.ref_path), np.asarray(es_b.ref_path), atol=1e-7
        )
        quad = jnp.asarray(out_b.predicted[1], DTYPE)
