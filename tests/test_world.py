"""Full-stack closed-loop tests: render -> map -> engine -> bfctrl -> 6-DoF."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from avoid_mpc_tpu.config import EngineConfig, MPCConfig, TaskConfig
from avoid_mpc_tpu.sim import (
    MISSION_TASK,
    ObstacleField,
    ScenarioConfig,
    build_world,
    random_forest,
    rollout_world,
    world_init,
)

DTYPE = jnp.float64

CFG = EngineConfig(
    mpc=dataclasses.replace(
        MPCConfig(),
        mpc_T=0.5,  # N=15 keeps CPU test time in budget
        sqp_iters=5,
        sqp_iters_fast=3,
        mpc_max_iter=2,
        speed=4.0,
    ),
    task=TaskConfig(height=1.5),
)


@pytest.fixture(scope="module")
def world():
    params, hyper = build_world(
        CFG, render_scale=8, grid_scale=4, map_frames=4, dtype=DTYPE
    )
    return params, hyper


def run(world, field, ticks, start=(0.0, 0.0)):
    params, hyper = world
    ws = world_init(
        CFG, params, hyper, jnp.asarray(start, dtype=DTYPE), jax.random.PRNGKey(0),
        dtype=DTYPE,
    )
    fn = jax.jit(lambda ws: rollout_world(ws, field, params, hyper, ticks))
    return fn(ws)


def test_empty_world_takeoff_and_cruise(world):
    field = ObstacleField.empty(dtype=DTYPE)
    ws, diag = run(world, field, 180)
    p = np.asarray(diag.p)
    assert np.all(np.isfinite(p))
    # mission reached TASK and the drone took off to ~height
    assert int(diag.mission[-1]) == MISSION_TASK
    assert abs(p[-1, 2] - CFG.task.height) < 0.5
    # forward progress at cruise
    assert p[-1, 0] > 3.0, p[-1, 0]
    assert float(np.asarray(diag.v)[:, 0].max()) > 2.0


def test_forest_flight_no_collision(world):
    """Fly through a random forest with rendered-depth perception; ground
    truth clearance must stay positive (no collision)."""
    scfg = ScenarioConfig(
        n_cylinders=16, x_range=(4.0, 25.0), y_range=(-5.0, 5.0),
        radius_range=(0.2, 0.4),
    )
    field = random_forest(jax.random.PRNGKey(3), scfg, dtype=DTYPE)
    ws, diag = run(world, field, 220)
    p = np.asarray(diag.p)
    clear = np.asarray(diag.clearance)
    assert np.all(np.isfinite(p))
    # airborne clearance stays positive: no collision with any tree
    airborne = p[:, 2] > 0.3
    assert clear[airborne].min() > 0.0, clear[airborne].min()
    # and the drone made real forward progress into the forest
    assert p[-1, 0] > 4.0, p[-1, 0]
    # perception actually populated the map
    assert int(ws.map.count) >= 1


def test_batched_worlds_vmap(world):
    params, hyper = world
    B = 2
    keys = jax.random.split(jax.random.PRNGKey(7), B)
    fields = jax.vmap(
        lambda k: random_forest(k, ScenarioConfig(n_cylinders=8), dtype=DTYPE)
    )(keys)
    starts = jnp.asarray([[0.0, 0.0], [0.2, -0.1]], dtype=DTYPE)
    ws0 = jax.vmap(
        lambda s, k: world_init(CFG, params, hyper, s, k, dtype=DTYPE)
    )(starts, keys)
    fn = jax.jit(
        jax.vmap(lambda ws, f: rollout_world(ws, f, params, hyper, 10))
    )
    ws, diag = fn(ws0, fields)
    assert diag.p.shape == (B, 10, 3)
    assert bool(jnp.all(jnp.isfinite(diag.p)))


def test_imu_estimation_path(world):
    """With IMU-derived accel estimation (use_odom_est parity) the closed
    loop still flies and holds altitude."""
    params, hyper = world
    hyper_imu = hyper._replace(use_imu_estimation=True)
    field = ObstacleField.empty(dtype=DTYPE)
    ws = world_init(CFG, params, hyper_imu, jnp.zeros(2, dtype=DTYPE),
                    jax.random.PRNGKey(2), dtype=DTYPE)
    fn = jax.jit(lambda ws: rollout_world(ws, field, params, hyper_imu, 150))
    ws, diag = fn(ws)
    p = np.asarray(diag.p)
    assert np.isfinite(p).all()
    assert p[-1, 0] > 2.0
    assert abs(p[-1, 2] - CFG.task.height) < 0.5


def test_mission_lands_at_goal():
    """Forward task reaching the goal cap -> LAND -> bfctrl descends."""
    import dataclasses as dc

    cfg = dc.replace(CFG, task=dc.replace(CFG.task, goal_x=6.0))
    params, hyper = build_world(cfg, render_scale=8, grid_scale=4, map_frames=4, dtype=DTYPE)
    from avoid_mpc_tpu.sim import world_init as winit, rollout_world as roll

    ws = winit(cfg, params, hyper, jnp.zeros(2, dtype=DTYPE), jax.random.PRNGKey(1), dtype=DTYPE)
    fn = jax.jit(lambda ws: roll(ws, ObstacleField.empty(dtype=DTYPE), params, hyper, 400))
    ws, diag = fn(ws)
    from avoid_mpc_tpu.sim.world import MISSION_LAND

    m = np.asarray(diag.mission)
    p = np.asarray(diag.p)
    assert (m == MISSION_LAND).any()
    # after entering LAND, altitude comes down substantially
    first_land = int(np.argmax(m == MISSION_LAND))
    assert p[-1, 2] < p[first_land, 2] - 0.5, (p[first_land, 2], p[-1, 2])


def test_map_point_cloud_dump():
    from avoid_mpc_tpu.mapping import map_add_frame, map_init, MapShape
    from avoid_mpc_tpu.mapping.rolling_map import map_point_cloud

    m = map_init(MapShape(n_frames=2, points_per_frame=8), dtype=DTYPE)
    pts = jnp.ones((8, 3), dtype=DTYPE)
    m = map_add_frame(m, pts, jnp.ones(8, bool), pts, jnp.ones(8, bool), jnp.eye(4, dtype=DTYPE))
    cloud, frame_id, mask = map_point_cloud(m)
    assert cloud.shape == (24, 3) and frame_id.shape == (24,)
    assert bool(mask[:8].all())  # current frame queryable


def test_only_trust_vel_mode():
    """only_trust_vel (reference real-vehicle mode): keyframe map disabled —
    only the current frame is queryable (FrameKDMap.cpp:29) — position
    dead-reckoned from velocity in a drone-local frame
    (AvoidanceStateMachine.cpp:118-131), attitude from the IMU (:147-150).
    The closed loop must still cruise and avoid obstacles on current-frame
    perception alone."""
    cfg = dataclasses.replace(
        CFG, task=dataclasses.replace(CFG.task, only_trust_vel=True)
    )
    params, hyper = build_world(cfg, render_scale=8, grid_scale=4, map_frames=4, dtype=DTYPE)
    assert hyper.only_trust_vel
    from avoid_mpc_tpu.sim import world_init as winit, rollout_world as roll

    scfg = ScenarioConfig(
        n_cylinders=10, x_range=(4.0, 20.0), y_range=(-4.0, 4.0),
        radius_range=(0.25, 0.4),
    )
    field = random_forest(jax.random.PRNGKey(5), scfg, dtype=DTYPE)
    ws = winit(cfg, params, hyper, jnp.zeros(2, dtype=DTYPE), jax.random.PRNGKey(0), dtype=DTYPE)
    fn = jax.jit(lambda ws: roll(ws, field, params, hyper, 200))
    ws, diag = fn(ws)
    p = np.asarray(diag.p)
    clear = np.asarray(diag.clearance)
    assert np.isfinite(p).all()
    # keyframe ring never populated: current-frame-only perception
    assert int(ws.map.count) == 0
    # still flies forward and stays clear of the trees once airborne
    airborne = p[:, 2] > 0.3
    assert clear[airborne].min() > 0.0, clear[airborne].min()
    assert p[-1, 0] > 3.0, p[-1, 0]


def test_reference_scale_keyframe_map():
    """map_frames=None defaults to the config's max_frame_count (reference
    mpc_parameters.yaml: 100 keyframes) and the F=100 world still flies: the
    map ring holds 100 slots, map_query routes through the chunked k-NN path
    (ops.knn._DENSE_QP_MAX), and a cruise past obstacles stays collision-free.
    Small render grid keeps CPU time in budget while exercising the full
    F=100 ring/prune/dedupe plumbing in jit."""
    params, hyper = build_world(CFG, render_scale=8, grid_scale=4, dtype=DTYPE)
    assert hyper.map_shape.n_frames == 100  # PerceptionConfig.max_frame_count
    from avoid_mpc_tpu.sim import world_init as winit, rollout_world as roll

    scfg = ScenarioConfig(
        n_cylinders=8, x_range=(5.0, 18.0), y_range=(-3.0, 3.0),
        radius_range=(0.3, 0.45),
    )
    field = random_forest(jax.random.PRNGKey(3), scfg, dtype=DTYPE)
    ws = winit(CFG, params, hyper, jnp.zeros(2, dtype=DTYPE), jax.random.PRNGKey(0), dtype=DTYPE)
    fn = jax.jit(lambda ws: roll(ws, field, params, hyper, 220))
    ws, diag = fn(ws)
    p = np.asarray(diag.p)
    assert np.isfinite(p).all()
    assert int(np.asarray(ws.map.count)) > 1  # multiple keyframes committed
    assert float(np.asarray(diag.clearance).min()) > 0.0  # no collision
    assert p[-1, 0] > 3.0  # made forward progress


def test_thrust_rls_recovers_mass_mismatch(world):
    """Closed loop with the plant's thrust curve 20% off the controller's
    prior (plant hovers at 0.36 throttle, controller initialized for 0.30 —
    the battery-sag / mass-error scenario the online RLS exists for,
    BfCtrlFSM.cpp:163-167 + controller.cpp:180-201).  Without the per-tick
    update the vehicle tracks altitude with a persistent sag; with it the
    thrust model converges to the true curve and tracking recovers."""
    params, hyper = world
    field = ObstacleField.empty(dtype=DTYPE)
    true_hover = 0.36
    params_mm = params._replace(
        plant=params.plant._replace(
            hover_percentage=jnp.asarray(true_hover, DTYPE)
        )
    )

    def fly(params_v):
        ws = world_init(
            CFG, params_v, hyper, jnp.zeros(2, dtype=DTYPE),
            jax.random.PRNGKey(0), dtype=DTYPE,
        )
        fn = jax.jit(lambda ws: rollout_world(ws, field, params_v, hyper, 200))
        return fn(ws)

    # RLS off (reference yaml default): persistent altitude sag
    ws_off, diag_off = fly(params_mm)
    z_err_off = np.abs(np.asarray(diag_off.p)[-40:, 2] - float(params.height))
    assert z_err_off.min() > 0.12, z_err_off.min()

    # RLS on: thrust model converges, tracking recovers
    params_on = params_mm._replace(
        bfctrl=params_mm.bfctrl._replace(thrust_update=jnp.asarray(True))
    )
    ws_on, diag_on = fly(params_on)
    z_err_on = np.abs(np.asarray(diag_on.p)[-40:, 2] - float(params.height))
    assert z_err_on.max() < 0.08, z_err_on.max()
    # the live hover-percentage telemetry found the true hover point
    np.testing.assert_allclose(
        float(np.asarray(diag_on.hover_pct)[-1]), true_hover, rtol=0.05
    )


def test_decay_feedback_traced(world):
    """Latency-compensation decay is a per-dispatch TRACED value, not a
    constant baked into the jitted closure (AvoidanceStateMachine.cpp:329-343:
    the reference feeds each solve's measured wall time back as the next
    prediction lookahead).  Changing decay must shift the latency-compensated
    state x_pred by v*d + a*d^2/2 WITHOUT recompiling, and the LatencyTracker
    host feed must converge to an injected latency."""
    from avoid_mpc_tpu.sim.world import world_step_full
    from avoid_mpc_tpu.utils.profiling import LatencyTracker

    params, hyper = world
    field = ObstacleField.empty(dtype=DTYPE)
    ws = world_init(
        CFG, params, hyper, jnp.zeros(2, dtype=DTYPE), jax.random.PRNGKey(0),
        dtype=DTYPE,
    )
    v = jnp.asarray([3.0, 0.5, 0.0], DTYPE)
    a = jnp.asarray([0.5, -0.2, 0.0], DTYPE)
    ws = ws._replace(plant=ws.plant._replace(v=v, a_lin=a))

    step = jax.jit(
        lambda ws, d: world_step_full(
            ws, field, params._replace(decay=d), hyper
        )[4]
    )
    x0_pred = step(ws, jnp.asarray(0.0, DTYPE))
    x1_pred = step(ws, jnp.asarray(0.1, DTYPE))
    d = 0.1
    np.testing.assert_allclose(
        np.asarray(x1_pred[0:3] - x0_pred[0:3]),
        np.asarray(v * d + 0.5 * a * d * d), rtol=1e-6, atol=1e-9,
    )
    np.testing.assert_allclose(
        np.asarray(x1_pred[4:7] - x0_pred[4:7]), np.asarray(a * d),
        rtol=1e-6, atol=1e-9,
    )
    assert step._cache_size() == 1  # traced arg: one executable, no rebake

    # host feed: the tracker's decay converges to the injected latency
    tracker = LatencyTracker(init=0.015)
    for _ in range(60):
        tracker.update(0.031)
    np.testing.assert_allclose(tracker.decay, 0.031, rtol=1e-3)
