"""Full-stack closed loop: sensors -> map -> MPC engine -> bfctrl -> 6-DoF.

The whole reference system graph in one jitted, batched step function —
what the four processes (AirSim+Unreal, airsim_node, bfctrl,
mpc_obstacle_avoidance_node) and their ROS topics do across
``launch/mpc_obstacle_avoidance_sim.launch``, collapsed to a pure function:

per control tick (con_dt = 0.033 s):
1. render a planar-depth frame from the true camera pose (+ sensor noise) —
   the 30 Hz image loop (``airsim_ros_wrapper.cpp:1129-1285``),
2. depth -> obstacle/edge clouds -> rolling-map ingest + keyframe
   maintenance (``FrameKDMap`` lifecycle),
3. mission FSM INIT/WAIT/TAKEOFF/TASK/LAND
   (``AvoidanceStateMachine.cpp:283-368``) with latency-compensated state
   prediction (``GetCurStateQuad`` :183-203),
4. in TASK: the receding-horizon engine step -> acceleration command,
5. bfctrl FSM + geometric controller -> attitude+thrust,
6. 6-DoF plant with attitude cascade -> next true state.

Everything is a pure function of (WorldState, ObstacleField, params, key):
vmap for the Monte-Carlo fleet, ``lax.scan`` for trajectories.
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple

import jax
import jax.numpy as jnp

from avoid_mpc_tpu.config import EngineConfig, PerceptionConfig
from avoid_mpc_tpu.control.bfctrl import (
    FSM_AUTO_HOVER,
    FSM_CMD_CTRL,
    BfctrlParams,
    BfctrlState,
    CommandInput,
    VfrHudInput,
    bfctrl_init,
    bfctrl_step,
)
from avoid_mpc_tpu.control.geometric import CMD_ACCELERATION
from avoid_mpc_tpu.engine import (
    EngineHyper,
    EngineParams,
    EngineState,
    engine_init,
    receding_step,
)
from avoid_mpc_tpu.mapping import (
    MapShape,
    RollingMap,
    map_add_frame,
    map_init,
    map_keyframe_update,
)
from avoid_mpc_tpu.ops.depth import CameraModel, process_depth_frame
from avoid_mpc_tpu.sim.plant import (
    SixDofParams,
    SixDofState,
    sixdof_init,
    sixdof_step,
    sixdof_to_mpc_state,
)
from avoid_mpc_tpu.sim.sensors import (
    CameraRig,
    ObstacleField,
    render_depth,
    render_rig,
)

# Mission FSM (AvoidanceStateMachine.h:19-25)
MISSION_INIT = 0
MISSION_WAIT = 1
MISSION_TAKEOFF = 2
MISSION_TASK = 3
MISSION_LAND = 4


class WorldParams(NamedTuple):
    engine: EngineParams
    bfctrl: BfctrlParams
    plant: SixDofParams
    cam: CameraModel
    Tbc: jax.Array
    con_dt: jax.Array
    decay: jax.Array
    height: jax.Array
    depth_min: jax.Array
    dedupe_dist: jax.Array
    dedupe_count: jax.Array
    # stereo + bottom camera extrinsics (airsim_ros_wrapper.cpp:1170-1231);
    # rendered only when WorldHyper.capture_stereo_bottom is set
    rig: CameraRig


class WorldHyper(NamedTuple):
    engine: EngineHyper
    map_shape: MapShape
    render_h: int
    render_w: int
    pcfg: PerceptionConfig  # static python config for the renderer
    use_depth_noise: bool = True
    # feed the engine an IMU-derived state estimate (COG-filtered accel,
    # gravity-subtracted — the use_odom_est path of the reference,
    # AvoidanceStateMachine.cpp:136-153) instead of plant ground truth
    use_imu_estimation: bool = False
    # only_trust_vel (reference real-vehicle mode): odom position/attitude
    # are NOT trusted — position is zeroed at every odom message and
    # dead-reckoned from velocity between messages
    # (AvoidanceStateMachine.cpp:118-131), attitude comes from the IMU
    # (:147-150), and the keyframe map is disabled entirely so only the
    # current depth frame is queryable (FrameKDMap.cpp:29).  The engine then
    # plans in a drone-local frame.
    only_trust_vel: bool = False
    # Also render the stereo pair + bottom camera each tick and return them
    # on the capture surface (the bridge's remaining declared image streams,
    # airsim_ros_wrapper.cpp:1170-1231).  Off by default: the avoidance
    # pipeline consumes only front depth, so the flagship loop pays nothing.
    capture_stereo_bottom: bool = False


def build_world(
    cfg: EngineConfig,
    render_scale: int = 1,
    grid_scale: int | None = None,
    map_frames: int | None = None,
    dtype=jnp.float32,
) -> tuple[WorldParams, WorldHyper]:
    """Assemble params for a world whose camera renders at
    (height/render_scale, width/render_scale), with the perception grid a
    further ``grid_scale`` coarser (the reference's resize_scale role).

    Defaults reproduce the reference geometry exactly: 640x480 render,
    /10 grid -> 64x48 = 3072 points per frame, and ``map_frames=None`` takes
    the config's ``max_frame_count`` (reference mpc_parameters.yaml: 100
    keyframes -> (100+1)*3072 ~ 310k queryable points; ops.knn chunks big
    clouds automatically).  Reduced-fidelity sweeps pick render_scale>1 and
    a grid_scale/map_frames that keep the map a sane size
    (points/frame = render_w/grid_scale * render_h/grid_scale).
    """
    p = cfg.perception
    if map_frames is None:
        map_frames = p.max_frame_count
    if grid_scale is None:
        grid_scale = max(p.resize_scale // render_scale, 1)
    render_h, render_w = p.height // render_scale, p.width // render_scale
    sim_pcfg = dataclasses.replace(
        p,
        width=render_w,
        height=render_h,
        fx=p.fx / render_scale,
        fy=p.fy / render_scale,
        cx=p.cx / render_scale,
        cy=p.cy / render_scale,
        resize_scale=grid_scale,
        max_frame_count=map_frames,
    )
    cam = CameraModel.from_config(sim_pcfg, dtype=dtype)
    params = WorldParams(
        engine=EngineParams.from_config(cfg, dtype=dtype),
        bfctrl=BfctrlParams.default(dtype=dtype)._replace(
            takeoff_height=jnp.asarray(cfg.task.height, dtype=dtype)
        ),
        plant=SixDofParams.default(dtype=dtype),
        cam=cam,
        Tbc=jnp.asarray(p.Tbc, dtype=dtype),
        con_dt=jnp.asarray(cfg.mpc.con_dt, dtype=dtype),
        decay=jnp.asarray(cfg.mpc.decay, dtype=dtype),
        height=jnp.asarray(cfg.task.height, dtype=dtype),
        depth_min=jnp.asarray(p.depth_min, dtype=dtype),
        dedupe_dist=jnp.asarray(p.keyframe_dist_threshold, dtype=dtype),
        dedupe_count=jnp.asarray(p.keyframe_count_threshold, jnp.int32),
        rig=CameraRig.default(p.Tbc, dtype=dtype),
    )
    hyper = WorldHyper(
        engine=EngineHyper.from_config(cfg),
        map_shape=MapShape.from_config(sim_pcfg),
        render_h=render_h,
        render_w=render_w,
        pcfg=sim_pcfg,
        only_trust_vel=cfg.task.only_trust_vel,
    )
    return params, hyper


class WorldState(NamedTuple):
    plant: SixDofState
    ctrl: BfctrlState
    engine: EngineState
    map: RollingMap
    mission: jax.Array  # int32
    t: jax.Array
    key: jax.Array
    # IMU-estimation path state (active when hyper.use_imu_estimation)
    cog: "COGFilterState"
    imu_bias: jax.Array  # (6,)
    # previous tick's applied thrust signal — the VFR_HUD ``cur_thrust_``
    # feed for the thrust-model RLS (input.cpp:236-244: the FC reports the
    # currently-applied throttle back to bfctrl)
    prev_thrust: jax.Array


class WorldDiag(NamedTuple):
    """Per-tick diagnostics (the rosbag topics of the reference)."""

    p: jax.Array  # (3,) true position
    v: jax.Array  # (3,)
    mission: jax.Array
    bf_status: jax.Array
    is_safety: jax.Array
    clearance: jax.Array  # analytic distance to the obstacle field
    u_cmd: jax.Array  # (4,) engine acceleration command
    hover_pct: jax.Array  # live gra/thr2acc estimate (BfCtrlFSM.cpp:400-407)


def world_init(
    cfg: EngineConfig, params: WorldParams, hyper: WorldHyper,
    start_xy: jax.Array, key: jax.Array, dtype=jnp.float32,
) -> WorldState:
    from avoid_mpc_tpu.utils.filters import cog_filter_init

    p0 = jnp.concatenate([start_xy, jnp.zeros(1, dtype=dtype)])
    return WorldState(
        plant=sixdof_init(p0, dtype=dtype),
        ctrl=bfctrl_init(params.bfctrl),
        engine=engine_init(cfg, dtype=dtype),
        map=map_init(hyper.map_shape, dtype=dtype),
        mission=jnp.asarray(MISSION_INIT, jnp.int32),
        t=jnp.asarray(0.0, dtype=dtype),
        key=key,
        cog=cog_filter_init(window=10, dim=3, dtype=dtype),
        imu_bias=jnp.zeros(6, dtype=dtype),
        prev_thrust=jnp.asarray(0.0, dtype=dtype),
    )


def field_clearance(p: jax.Array, field: ObstacleField) -> jax.Array:
    """Analytic signed clearance to the obstacle field (ground truth for
    collision metrics — the reference reads AirSim's collision flag,
    airsim_ros_wrapper.cpp:972-981)."""
    d_cyl = jnp.linalg.norm(p[0:2][None, :] - field.cyl_xy, axis=-1) - field.cyl_r
    d_cyl = jnp.where(field.cyl_mask, d_cyl, jnp.inf)
    d_sph = jnp.linalg.norm(p[None, :] - field.sph_c, axis=-1) - field.sph_r
    d_sph = jnp.where(field.sph_mask, d_sph, jnp.inf)
    return jnp.minimum(d_cyl.min(), d_sph.min())


def world_step(
    ws: WorldState, field: ObstacleField, params: WorldParams, hyper: WorldHyper
) -> tuple[WorldState, WorldDiag]:
    ws, diag, *_ = world_step_full(ws, field, params, hyper)
    return ws, diag


def world_step_full(
    ws: WorldState, field: ObstacleField, params: WorldParams, hyper: WorldHyper
):
    """world_step that also returns the sensor products of the tick
    (depth frame, body pose, latency-compensated state) — the capture surface
    for flight logging/replay (the rosbag topics in the reference)."""
    dtype = ws.t.dtype
    key, k_noise, k_imu = jax.random.split(ws.key, 3)
    t = ws.t + params.con_dt

    # --- 1+2: perception into the rolling map ---
    x_true = sixdof_to_mpc_state(ws.plant)
    cog, imu_bias = ws.cog, ws.imu_bias
    if hyper.use_imu_estimation:
        # IMU-derived acceleration estimate: body specific force -> COG
        # filter -> rotate to world -> gravity-subtract (the reference
        # IMUCallback path, AvoidanceStateMachine.cpp:136-153)
        from avoid_mpc_tpu.sim.sensors import ImuParams, imu_measure
        from avoid_mpc_tpu.utils.filters import cog_filter_update
        from avoid_mpc_tpu.utils.quaternion import quat_rotate

        accel_b, _gyro, imu_bias = imu_measure(
            ws.plant.q, ws.plant.a_lin, ws.plant.w, ws.imu_bias,
            params.con_dt, ImuParams.default(dtype=dtype), k_imu,
        )
        cog, acc_filt_b = cog_filter_update(ws.cog, accel_b)
        acc_est = quat_rotate(ws.plant.q, acc_filt_b) - jnp.asarray(
            [0.0, 0.0, 9.81], dtype=dtype
        )
        x_true = x_true.at[7:10].set(acc_est)
    from avoid_mpc_tpu.utils.quaternion import compose_tf, quat_to_rotmat

    R_wb = quat_to_rotmat(ws.plant.q)
    Twb = jnp.eye(4, dtype=dtype).at[:3, :3].set(R_wb).at[:3, 3].set(ws.plant.p)
    Twc = compose_tf(Twb, params.Tbc)  # exact f32 pose compose (rule 1)
    depth = render_depth(
        Twc, field, hyper.pcfg, hyper.render_h, hyper.render_w,
        key=k_noise if hyper.use_depth_noise else None,
    )
    # stereo + bottom streams (static gate; key folded so the front-stream
    # noise sequence is identical with the gate on or off)
    aux = None
    if hyper.capture_stereo_bottom:
        aux = render_rig(
            Twb, params.rig, field, hyper.pcfg, hyper.render_h, hyper.render_w,
            key=jax.random.fold_in(k_noise, 1) if hyper.use_depth_noise else None,
        )
    if hyper.only_trust_vel:
        # Drone-local planning frame: odom position is zeroed every message
        # and integrated from velocity until the next one — one tick's worth
        # here (AvoidanceStateMachine.cpp:128-131,143-146).  Attitude from the
        # IMU (= plant attitude in sim).  Depth is still RENDERED from the
        # true camera pose (sensor physics), but BACK-PROJECTED through the
        # estimated body pose so map points live in the planning frame.
        p_est = x_true[4:7] * params.con_dt + 0.5 * x_true[7:10] * params.con_dt**2
        x_true = x_true.at[0:3].set(p_est)
        Twb_est = jnp.eye(4, dtype=dtype).at[:3, :3].set(
            quat_to_rotmat(ws.plant.q)
        ).at[:3, 3].set(p_est)
        pts, mask, epts, emask = process_depth_frame(depth, Twb_est, params.cam)
        # keyframe map disabled (FrameKDMap.cpp:29): current frame only —
        # the local frame is not inertial, so keyframes would be inconsistent
        m = map_add_frame(ws.map, pts, mask, epts, emask,
                          compose_tf(Twb_est, params.Tbc))
    else:
        pts, mask, epts, emask = process_depth_frame(depth, Twb, params.cam)
        m = map_add_frame(ws.map, pts, mask, epts, emask, Twc)
        m = map_keyframe_update(
            m, params.Tbc, params.depth_min, params.dedupe_dist, params.dedupe_count
        )

    # --- 3: mission FSM ---
    bf_waiting = (ws.ctrl.fsm == FSM_AUTO_HOVER) | (ws.ctrl.fsm == FSM_CMD_CTRL)
    mission = ws.mission
    mission = jnp.where((mission == MISSION_INIT), MISSION_WAIT, mission)
    mission = jnp.where((mission == MISSION_WAIT) & bf_waiting, MISSION_TAKEOFF, mission)
    reached = ws.plant.p[2] >= 0.6 * params.height
    mission = jnp.where((mission == MISSION_TAKEOFF) & reached, MISSION_TASK, mission)
    # goal reached (forward task cap, TaskParam farestPoint) -> LAND.
    # (The reference declares the LAND state but never transitions into it in
    # the shipped code — AvoidanceStateMachine.cpp:356-362 is reachable only
    # externally; completing the mission this way is our extension.)
    at_goal = ws.plant.p[0] >= params.engine.farthest_x - 0.5
    mission = jnp.where((mission == MISSION_TASK) & at_goal, MISSION_LAND, mission)

    # latency-compensated state prediction (GetCurStateQuad with decay)
    d = params.decay
    x_pred = x_true.at[0:3].add(x_true[4:7] * d + 0.5 * x_true[7:10] * d * d).at[4:7].add(
        x_true[7:10] * d
    )

    # --- 4: engine (always traced; output gated by mission) ---
    engine_new, out = receding_step(ws.engine, x_pred, m, params.engine, hyper.engine)
    in_task = mission == MISSION_TASK
    engine_state = jax.tree.map(
        lambda a, b: jnp.where(in_task, a, b), engine_new, ws.engine
    )

    cmd = CommandInput(
        mode=jnp.asarray(CMD_ACCELERATION, jnp.int32),
        p=jnp.zeros(3, dtype=dtype),
        v=jnp.zeros(3, dtype=dtype),
        a=out.u_cmd[0:3],
        w=jnp.zeros(3, dtype=dtype),
        q=jnp.asarray([1.0, 0, 0, 0], dtype=dtype),
        yaw=jnp.asarray(0.0, dtype=dtype),  # PubCmd sends yaw=0 (:376)
        yaw_rate=out.u_cmd[3],
        thrust=jnp.asarray(0.0, dtype=dtype),
        age=jnp.where(in_task, 0.0, jnp.inf).astype(dtype),
    )

    # --- 5: bfctrl ---
    # thrust-RLS feeds (BfCtrlFSM.cpp:163-167): IMU body specific force +
    # the FC's reported current throttle (= last tick's applied signal).
    # R^T f as elementwise dots — no einsum (CLAUDE.md rule 1: f32 matmuls
    # take bf16 MXU passes; this value drives the thrust estimate).
    spec_f = ws.plant.a_lin + jnp.asarray([0.0, 0.0, 9.81], dtype=dtype)
    accel_body = jnp.stack([jnp.sum(R_wb[:, i] * spec_f) for i in range(3)])
    ctrl_new, u, des, status, hover_pct = bfctrl_step(
        ws.ctrl, t, ws.plant.p, ws.plant.v, ws.plant.q, cmd,
        jnp.where(mission == MISSION_LAND, 2, 0).astype(jnp.int32),  # LAND_CMD
        jnp.asarray(0.0, dtype=dtype),
        jnp.asarray(jnp.inf, dtype=dtype), jnp.zeros(2, dtype=dtype),
        params.bfctrl,
        imu_a=accel_body,
        vfr=VfrHudInput(throttle=ws.prev_thrust, age=jnp.asarray(0.0, dtype=dtype)),
    )

    # --- 6: plant ---
    plant_new = sixdof_step(ws.plant, u.q, u.thrust, params.con_dt, params.plant)

    diag = WorldDiag(
        p=ws.plant.p,
        v=ws.plant.v,
        mission=mission,
        bf_status=status,
        is_safety=out.is_safety | ~in_task,
        clearance=field_clearance(ws.plant.p, field),
        u_cmd=out.u_cmd,
        hover_pct=hover_pct,
    )
    return (
        WorldState(
            plant=plant_new, ctrl=ctrl_new, engine=engine_state, map=m,
            mission=mission, t=t, key=key, cog=cog, imu_bias=imu_bias,
            prev_thrust=u.thrust,
        ),
        diag,
        depth,
        Twb,
        x_pred,
        aux,
    )


def rollout_world(
    ws: WorldState, field: ObstacleField, params: WorldParams, hyper: WorldHyper,
    n_ticks: int,
):
    """Scan the closed loop for n_ticks. vmap over (ws, field) for the
    Monte-Carlo fleet."""

    def step(ws, _):
        return world_step(ws, field, params, hyper)

    return jax.lax.scan(step, ws, None, length=n_ticks)
