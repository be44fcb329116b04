"""Low-level flight-control FSM — the betaflight_ctrl node, batched.

Re-design of ``BfCtrlFSM`` (``betaflight_ctrl/src/BfCtrlFSM.cpp:17-183``) as a
pure step function over an explicit state pytree.  The seven FSM states
(``BfCtrlFSM.h:55-66``) become an integer dispatched through ``lax.switch``;
message-recency gates ("cmd_is_received" etc., :294-316) become age inputs
the caller maintains; all ROS publishing becomes returned values.

Per tick (the 50 Hz process timer, bfctrl_node.cpp:84-86):
1. FSM transition + desired-state selection (takeoff/land ramps :222-256,
   hover latch :257-262, slow-down deceleration :264-286),
2. optional thrust-model RLS update (:163-167),
3. geometric controller (:169-175),
4. status enum out (:400-426) — consumed by the avoidance engine's mission
   FSM (``AvoidanceStateMachine.cpp:293-302``).

Batched over vehicles/scenarios with vmap.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from avoid_mpc_tpu.control.geometric import (
    CMD_POSITION,
    ControllerOutput,
    ControllerParams,
    ThrustModelState,
    estimate_thrust_model,
    geometric_controller,
    thrust_model_init,
)
from avoid_mpc_tpu.utils.quaternion import yaw_from_quat

# FSM states (BfCtrlFSM.h:55-66)
FSM_INIT = 0
FSM_AUTO_TAKEOFF = 1
FSM_AUTO_HOVER = 2
FSM_CMD_CTRL = 3
FSM_CMD_TAKEOFF = 4
FSM_AUTO_LAND = 5
FSM_SLOW_DOWN = 6

# BfctrlStatue status enum (quadrotor_msgs/BfctrlStatue.msg)
STATUS_INIT = 0
STATUS_MANUAL = 1
STATUS_HOVER = 3
STATUS_CMD = 4
STATUS_TAKEOFF = 5
STATUS_LAND = 6
STATUS_WAITINGCMD = 7
STATUS_NOODOM = 255

# TakeoffLand.msg commands
TAKEOFF_CMD = 1
LAND_CMD = 2


class BfctrlParams(NamedTuple):
    ctrl: ControllerParams
    takeoff_height: jax.Array  # auto takeoff height (yaml 1.5)
    takeoff_speed: jax.Array  # takeoff/land ramp speed (yaml 1.0)
    cmd_timeout: jax.Array  # msg_timeout.cmd (yaml 0.5 s)
    slow_down_timeout: jax.Array
    ctrl_dt: jax.Array  # 1/ctrl_freq_max for the slow-down integrator
    # thrust_model/update (ctrl_param_fpv_real.yaml:33): run the per-tick
    # thrust-RLS update off the measured throttle + IMU z accel
    thrust_update: jax.Array  # bool
    low_voltage: jax.Array  # declared alarm threshold (BfCtrlParam.cpp:33)

    @staticmethod
    def default(dtype=jnp.float32) -> "BfctrlParams":
        return BfctrlParams(
            ctrl=ControllerParams.default(dtype=dtype),
            takeoff_height=jnp.asarray(1.5, dtype=dtype),
            takeoff_speed=jnp.asarray(1.0, dtype=dtype),
            cmd_timeout=jnp.asarray(0.5, dtype=dtype),
            slow_down_timeout=jnp.asarray(0.5, dtype=dtype),
            ctrl_dt=jnp.asarray(1.0 / 30.0, dtype=dtype),
            thrust_update=jnp.asarray(False),
            low_voltage=jnp.asarray(13.2, dtype=dtype),
        )


class CommandInput(NamedTuple):
    """quadrotor_msgs/Command + freshness (age since last receive)."""

    mode: jax.Array  # int32
    p: jax.Array  # (3,)
    v: jax.Array
    a: jax.Array
    w: jax.Array
    q: jax.Array  # (4,)
    yaw: jax.Array
    yaw_rate: jax.Array
    thrust: jax.Array
    age: jax.Array  # seconds since last message (inf = never)

    @staticmethod
    def none(dtype=jnp.float32) -> "CommandInput":
        z3 = jnp.zeros(3, dtype=dtype)
        return CommandInput(
            mode=jnp.asarray(CMD_POSITION, dtype=jnp.int32),
            p=z3, v=z3, a=z3, w=z3,
            q=jnp.asarray([1.0, 0, 0, 0], dtype=dtype),
            yaw=jnp.asarray(0.0, dtype=dtype),
            yaw_rate=jnp.asarray(0.0, dtype=dtype),
            thrust=jnp.asarray(0.0, dtype=dtype),
            age=jnp.asarray(jnp.inf, dtype=dtype),
        )


class VfrHudInput(NamedTuple):
    """mavros VFR_HUD + freshness — the actual-throttle telemetry feed
    (``input.h:126-133``, ``input.cpp:236-244``).  ``throttle`` is the flight
    controller's currently-applied normalized thrust (``cur_thrust_``), the
    regressor of the thrust-model RLS (``BfCtrlFSM.cpp:163-167``)."""

    throttle: jax.Array
    age: jax.Array  # seconds since last message (inf = never)

    @staticmethod
    def none(dtype=jnp.float32) -> "VfrHudInput":
        return VfrHudInput(
            throttle=jnp.asarray(0.0, dtype=dtype),
            age=jnp.asarray(jnp.inf, dtype=dtype),
        )


class BatteryInput(NamedTuple):
    """sensor_msgs/BatteryState + freshness (``input.h:100-111``,
    ``input.cpp:191-205``).  The reference feeds this and declares a
    ``low_voltage`` param (``BfCtrlParam.cpp:33``) but ships no consumer —
    mirrored here: carried for telemetry/ops surface only."""

    volt: jax.Array
    percentage: jax.Array
    age: jax.Array

    @staticmethod
    def none(dtype=jnp.float32) -> "BatteryInput":
        return BatteryInput(
            volt=jnp.asarray(0.0, dtype=dtype),
            percentage=jnp.asarray(0.0, dtype=dtype),
            age=jnp.asarray(jnp.inf, dtype=dtype),
        )


class BfctrlState(NamedTuple):
    fsm: jax.Array  # int32 FSM state
    hover_pose: jax.Array  # (4,) latched hover x,y,z,yaw
    start_pose: jax.Array  # (4,) takeoff/land start pose
    toggle_time: jax.Array  # takeoff/land ramp start time
    slow_latch: jax.Array  # (4,) latched slow-down [x_acc, y_acc, height, yaw]
    takeoff_target_z: jax.Array  # commanded takeoff height (CMD_TAKEOFF)
    thrust_model: ThrustModelState


def bfctrl_init(p: BfctrlParams) -> BfctrlState:
    dtype = p.takeoff_height.dtype
    return BfctrlState(
        fsm=jnp.asarray(FSM_INIT, dtype=jnp.int32),
        hover_pose=jnp.zeros(4, dtype=dtype),
        start_pose=jnp.zeros(4, dtype=dtype),
        toggle_time=jnp.asarray(0.0, dtype=dtype),
        slow_latch=jnp.zeros(4, dtype=dtype),
        takeoff_target_z=p.takeoff_height,
        thrust_model=thrust_model_init(p.ctrl),
    )


class Desired(NamedTuple):
    p: jax.Array
    v: jax.Array
    a: jax.Array
    w: jax.Array
    q: jax.Array
    yaw: jax.Array
    thrust: jax.Array
    mode: jax.Array


def _hover_des(s: BfctrlState, dtype) -> Desired:
    return Desired(
        p=s.hover_pose[:3], v=jnp.zeros(3, dtype=dtype), a=jnp.zeros(3, dtype=dtype),
        w=jnp.zeros(3, dtype=dtype), q=jnp.asarray([1.0, 0, 0, 0], dtype=dtype),
        yaw=s.hover_pose[3], thrust=jnp.asarray(0.0, dtype=dtype),
        mode=jnp.asarray(CMD_POSITION, jnp.int32),
    )


def _ramp_des(s: BfctrlState, t, speed, dtype) -> Desired:
    """Takeoff/land constant-speed ramp (``get_takeoff_land_des`` :222-237)."""
    dt = t - s.toggle_time
    p = s.start_pose[:3] + jnp.asarray([0.0, 0.0, 1.0], dtype=dtype) * speed * dt
    return Desired(
        p=p, v=jnp.asarray([0.0, 0.0, 1.0], dtype=dtype) * speed,
        a=jnp.zeros(3, dtype=dtype), w=jnp.zeros(3, dtype=dtype),
        q=jnp.asarray([1.0, 0, 0, 0], dtype=dtype), yaw=s.start_pose[3],
        thrust=jnp.asarray(0.0, dtype=dtype), mode=jnp.asarray(CMD_POSITION, jnp.int32),
    )


def _cmd_des(cmd: CommandInput) -> Desired:
    return Desired(
        p=cmd.p, v=cmd.v, a=cmd.a, w=cmd.w, q=cmd.q, yaw=cmd.yaw,
        thrust=cmd.thrust, mode=cmd.mode,
    )


def _slow_down_des(s: BfctrlState, odom_p, odom_v, p: BfctrlParams, dtype) -> Desired:
    """``get_slow_down_des`` (:264-286): decelerate toward zero xy velocity at
    the latched accelerations, hold latched height/yaw; des velocity zeroed
    before handoff (the reference zeroes v after computing p)."""
    dt = p.ctrl_dt
    ax = jnp.abs(s.slow_latch[0]) * jnp.sign(odom_v[0])
    ay = jnp.abs(s.slow_latch[1]) * jnp.sign(odom_v[1])
    # (sign() instead of the reference's fabs(a*v)/v, which NaNs at v=0)
    dv = jnp.stack([-ax * dt, -ay * dt, jnp.zeros_like(ax)])
    dvx = jnp.where(-dv[0] > odom_v[0], -odom_v[0], dv[0])
    dvy = jnp.where(-dv[1] > odom_v[1], -odom_v[1], dv[1])
    v_new = odom_v + jnp.stack([dvx, dvy, jnp.zeros_like(dvx)])
    pos = odom_p + v_new * dt + 0.5 * jnp.stack([dvx, dvy, jnp.zeros_like(dvx)]) * dt
    pos = pos.at[2].set(s.slow_latch[2])
    return Desired(
        p=pos, v=jnp.zeros(3, dtype=dtype), a=jnp.zeros(3, dtype=dtype),
        w=jnp.zeros(3, dtype=dtype), q=jnp.asarray([1.0, 0, 0, 0], dtype=dtype),
        yaw=s.slow_latch[3], thrust=jnp.asarray(0.0, dtype=dtype),
        mode=jnp.asarray(CMD_POSITION, jnp.int32),
    )


def bfctrl_step(
    s: BfctrlState,
    t: jax.Array,
    odom_p: jax.Array,
    odom_v: jax.Array,
    odom_q: jax.Array,
    cmd: CommandInput,
    takeoff_land_cmd: jax.Array,  # 0=none, 1=takeoff, 2=land
    takeoff_height_cmd: jax.Array,
    slow_down_age: jax.Array,
    slow_down_acc: jax.Array,  # (2,) commanded decel x,y
    p: BfctrlParams,
    imu_a: jax.Array | None = None,  # (3,) body specific force (imu_data.a)
    vfr: VfrHudInput | None = None,
    battery: BatteryInput | None = None,
):
    """One 50 Hz control tick. Returns (new_state, ControllerOutput, Desired,
    status int, hover_percentage) — the FSM transition table of ``process``
    (:17-183).  ``hover_percentage`` is the live ``gra / thr2acc`` estimate
    published on ``/bfctrl/statue`` (``BfCtrlFSM.cpp:167,400-407``)."""
    dtype = odom_p.dtype
    yaw_now = yaw_from_quat(odom_q)
    cmd_fresh = cmd.age < p.cmd_timeout
    slow_fresh = slow_down_age < p.slow_down_timeout
    want_takeoff = takeoff_land_cmd == TAKEOFF_CMD
    want_land = takeoff_land_cmd == LAND_CMD

    latch_here = jnp.stack([odom_p[0], odom_p[1], odom_p[2], yaw_now])
    latch_slow = jnp.stack([slow_down_acc[0], slow_down_acc[1], odom_p[2], yaw_now])

    def from_init(s):
        # INIT -> AUTO_TAKEOFF: hover target = here + takeoff_height (:30-37)
        s = s._replace(
            fsm=jnp.asarray(FSM_AUTO_TAKEOFF, jnp.int32),
            hover_pose=latch_here.at[2].add(p.takeoff_height),
            start_pose=latch_here,
            toggle_time=t,
        )
        return s, _ramp_des(s, t, p.takeoff_speed, dtype)

    def from_auto_takeoff(s):
        reached = jnp.abs(s.hover_pose[2] - odom_p[2]) < 0.1
        odom_sane = jnp.linalg.norm(odom_v) <= 3.0  # reject bad odom (:45-51)
        go_hover = reached & odom_sane
        go_cmd = (~go_hover) & cmd_fresh
        fsm = jnp.where(
            go_hover, FSM_AUTO_HOVER, jnp.where(go_cmd, FSM_CMD_CTRL, FSM_AUTO_TAKEOFF)
        ).astype(jnp.int32)
        s = s._replace(fsm=fsm, hover_pose=jnp.where(go_hover, latch_here, s.hover_pose))
        des_ramp = _ramp_des(s, t, p.takeoff_speed, dtype)
        des = jax.tree.map(
            lambda a, b: jnp.where(go_cmd, a, b), _cmd_des(cmd), des_ramp
        )
        des = jax.tree.map(
            lambda a, b: jnp.where(go_hover, a, b), _hover_des(s, dtype), des
        )
        return s, des

    def from_auto_hover(s):
        go_cmd = cmd_fresh
        go_takeoff = (~go_cmd) & want_takeoff
        go_land = (~go_cmd) & (~go_takeoff) & want_land
        go_slow = (~go_cmd) & (~go_takeoff) & (~go_land) & slow_fresh
        fsm = jnp.where(
            go_cmd, FSM_CMD_CTRL,
            jnp.where(go_takeoff, FSM_CMD_TAKEOFF,
                      jnp.where(go_land, FSM_AUTO_LAND,
                                jnp.where(go_slow, FSM_SLOW_DOWN, FSM_AUTO_HOVER))),
        ).astype(jnp.int32)
        s = s._replace(
            fsm=fsm,
            start_pose=jnp.where(go_takeoff | go_land, latch_here, s.start_pose),
            toggle_time=jnp.where(go_takeoff | go_land, t, s.toggle_time),
            slow_latch=jnp.where(go_slow, latch_slow, s.slow_latch),
            takeoff_target_z=jnp.where(go_takeoff, takeoff_height_cmd + odom_p[2], s.takeoff_target_z),
        )
        des = jax.tree.map(
            lambda a, b: jnp.where(go_cmd, a, b), _cmd_des(cmd), _hover_des(s, dtype)
        )
        return s, des

    def from_cmd_ctrl(s):
        drop = (~cmd_fresh) | want_land
        go_slow = (~drop) & slow_fresh
        fsm = jnp.where(
            drop, FSM_AUTO_HOVER, jnp.where(go_slow, FSM_SLOW_DOWN, FSM_CMD_CTRL)
        ).astype(jnp.int32)
        s = s._replace(
            fsm=fsm,
            hover_pose=jnp.where(drop | go_slow, latch_here, s.hover_pose),
            slow_latch=jnp.where(go_slow, latch_slow, s.slow_latch),
        )
        des = jax.tree.map(
            lambda a, b: jnp.where(drop | go_slow, a, b),
            _hover_des(s, dtype), _cmd_des(cmd),
        )
        return s, des

    def from_cmd_takeoff(s):
        reached = odom_p[2] >= s.takeoff_target_z
        s = s._replace(
            fsm=jnp.where(reached, FSM_AUTO_HOVER, FSM_CMD_TAKEOFF).astype(jnp.int32),
            hover_pose=jnp.where(reached, latch_here, s.hover_pose),
        )
        des = jax.tree.map(
            lambda a, b: jnp.where(reached, a, b),
            _hover_des(s, dtype), _ramp_des(s, t, p.takeoff_speed, dtype),
        )
        return s, des

    def from_auto_land(s):
        landed = odom_p[2] <= 0.1
        s = s._replace(
            fsm=jnp.where(landed, FSM_AUTO_HOVER, FSM_AUTO_LAND).astype(jnp.int32),
            hover_pose=jnp.where(landed, latch_here, s.hover_pose),
        )
        des = jax.tree.map(
            lambda a, b: jnp.where(landed, a, b),
            _hover_des(s, dtype), _ramp_des(s, t, -p.takeoff_speed, dtype),
        )
        return s, des

    def from_slow_down(s):
        stopped = (jnp.abs(odom_v[0]) < 0.5) & (jnp.abs(odom_v[1]) < 0.5)
        s = s._replace(
            fsm=jnp.where(stopped, FSM_AUTO_HOVER, FSM_SLOW_DOWN).astype(jnp.int32),
            hover_pose=jnp.where(stopped, latch_here, s.hover_pose),
        )
        des = jax.tree.map(
            lambda a, b: jnp.where(stopped, a, b),
            _hover_des(s, dtype), _slow_down_des(s, odom_p, odom_v, p, dtype),
        )
        return s, des

    s, des = jax.lax.switch(
        s.fsm,
        [from_init, from_auto_takeoff, from_auto_hover, from_cmd_ctrl,
         from_cmd_takeoff, from_auto_land, from_slow_down],
        s,
    )

    # STEP2 (:163-167): thrust-model RLS off the measured throttle + IMU z
    # accel, gated by the enable flag and the on-ground check (:185-193:
    # throttle below half hover AND nearly stationary)
    if vfr is None:
        vfr = VfrHudInput.none(dtype=dtype)
    if imu_a is None:
        imu_a = jnp.zeros(3, dtype=dtype)
    on_ground = (vfr.throttle < p.ctrl.hover_percentage * 0.5) & (
        jnp.linalg.norm(odom_v) < 0.1
    )
    tm_upd = estimate_thrust_model(s.thrust_model, imu_a[2], vfr.throttle)
    do_rls = p.thrust_update & jnp.logical_not(on_ground)
    s = s._replace(
        thrust_model=jax.tree.map(
            lambda a, b: jnp.where(do_rls, a, b), tm_upd, s.thrust_model
        )
    )
    hover_percentage = p.ctrl.gravity / s.thrust_model.thr2acc

    # controller: the command mode only applies in CMD_CTRL (:170-175)
    mode = jnp.where(s.fsm == FSM_CMD_CTRL, des.mode, CMD_POSITION).astype(jnp.int32)
    u = geometric_controller(
        mode, des.p, des.v, des.a, des.yaw, des.q, des.w, des.thrust,
        odom_p, odom_v, odom_q, p.ctrl, s.thrust_model,
    )

    status = jnp.asarray(
        [STATUS_INIT, STATUS_MANUAL, STATUS_WAITINGCMD, STATUS_CMD,
         STATUS_TAKEOFF, STATUS_LAND, STATUS_NOODOM]
    )[s.fsm]
    return s, u, des, status, hover_percentage
