"""Geometric controller + bfctrl FSM tests."""

import jax
import jax.numpy as jnp
import numpy as np

from avoid_mpc_tpu.control import (
    CMD_ACCELERATION,
    ControllerParams,
    acc2quaternion,
    estimate_thrust_model,
    geometric_controller,
    thrust_model_init,
)
from avoid_mpc_tpu.control.bfctrl import (
    FSM_AUTO_HOVER,
    FSM_AUTO_TAKEOFF,
    FSM_CMD_CTRL,
    FSM_SLOW_DOWN,
    STATUS_CMD,
    STATUS_WAITINGCMD,
    BfctrlParams,
    CommandInput,
    bfctrl_init,
    bfctrl_step,
)
from avoid_mpc_tpu.utils.quaternion import quat_rotate, quat_to_rotmat, yaw_from_quat

DT = jnp.float64
CP = ControllerParams.default(dtype=DT)


def test_acc2quaternion_alignment():
    """Body z must align with the commanded acceleration; yaw preserved."""
    acc = jnp.asarray([1.0, 2.0, 9.81], dtype=DT)
    yaw = jnp.asarray(0.6, dtype=DT)
    q = acc2quaternion(acc, yaw)
    R = quat_to_rotmat(q)
    zb, xb = R[:, 2], R[:, 0]
    np.testing.assert_allclose(
        np.asarray(zb), np.asarray(acc) / np.linalg.norm(np.asarray(acc)), atol=1e-9
    )
    # heading invariant of the construction: body-y is perpendicular to the
    # heading direction [cos yaw, sin yaw, 0] (yb = zb x proj / |.|) — with
    # tilt, the ZYX yaw angle itself legitimately differs from the heading
    # parameter (same for the reference construction).
    yb = R[:, 1]
    heading = np.array([np.cos(0.6), np.sin(0.6), 0.0])
    np.testing.assert_allclose(float(np.asarray(yb) @ heading), 0.0, atol=1e-9)
    # level flight: yaw extracts exactly
    q_level = acc2quaternion(jnp.asarray([0.0, 0.0, 9.81], dtype=DT), jnp.asarray(0.6, dtype=DT))
    np.testing.assert_allclose(float(yaw_from_quat(q_level)), 0.6, atol=1e-9)


def test_hover_thrust():
    """ACCELERATION mode with a = g*e_z from level attitude -> thrust ==
    hover_percentage."""
    tm = thrust_model_init(CP)
    z3 = jnp.zeros(3, dtype=DT)
    qI = jnp.asarray([1.0, 0, 0, 0], dtype=DT)
    u = geometric_controller(
        jnp.asarray(CMD_ACCELERATION), z3, z3, jnp.asarray([0.0, 0.0, 9.81], dtype=DT),
        jnp.asarray(0.0, dtype=DT), qI, z3, jnp.asarray(0.0, dtype=DT),
        z3, z3, qI, CP, tm,
    )
    np.testing.assert_allclose(float(u.thrust), 0.30, atol=1e-9)
    np.testing.assert_allclose(np.asarray(u.q), [1, 0, 0, 0], atol=1e-9)
    np.testing.assert_allclose(np.asarray(u.bodyrates), 0.0, atol=1e-9)


def test_thrust_model_rls_converges():
    """Feeding consistent (accel, thrust) pairs must converge thr2acc."""
    tm = thrust_model_init(CP)  # initial thr2acc = 32.7
    true_thr2acc = 25.0
    for _ in range(200):
        thr = 0.4
        tm = estimate_thrust_model(tm, jnp.asarray(true_thr2acc * thr, dtype=DT), jnp.asarray(thr, dtype=DT))
    np.testing.assert_allclose(float(tm.thr2acc), true_thr2acc, rtol=1e-6)


def _step_args(t, p, v, q):
    return dict(
        t=jnp.asarray(t, dtype=DT),
        odom_p=jnp.asarray(p, dtype=DT),
        odom_v=jnp.asarray(v, dtype=DT),
        odom_q=jnp.asarray(q, dtype=DT),
    )


def test_bfctrl_takeoff_to_hover_to_cmd():
    p = BfctrlParams.default(dtype=DT)
    s = bfctrl_init(p)
    no_cmd = CommandInput.none(dtype=DT)
    none_tl = jnp.asarray(0, jnp.int32)

    # INIT -> AUTO_TAKEOFF
    s, u, des, status, _ = bfctrl_step(
        s, **_step_args(0.0, [0, 0, 0], [0, 0, 0], [1, 0, 0, 0]),
        cmd=no_cmd, takeoff_land_cmd=none_tl, takeoff_height_cmd=jnp.asarray(0.0, DT),
        slow_down_age=jnp.asarray(jnp.inf, DT), slow_down_acc=jnp.zeros(2, DT), p=p,
    )
    assert int(s.fsm) == FSM_AUTO_TAKEOFF
    # ramp: desired z grows with time
    s2, u, des, *_ = bfctrl_step(
        s, **_step_args(1.0, [0, 0, 1.0], [0, 0, 1.0], [1, 0, 0, 0]),
        cmd=no_cmd, takeoff_land_cmd=none_tl, takeoff_height_cmd=jnp.asarray(0.0, DT),
        slow_down_age=jnp.asarray(jnp.inf, DT), slow_down_acc=jnp.zeros(2, DT), p=p,
    )
    assert float(des.p[2]) > 0.5
    # near target height -> AUTO_HOVER, hover latched at current pose
    s3, u, des, status, _ = bfctrl_step(
        s2, **_step_args(1.5, [0, 0, 1.45], [0, 0, 0.5], [1, 0, 0, 0]),
        cmd=no_cmd, takeoff_land_cmd=none_tl, takeoff_height_cmd=jnp.asarray(0.0, DT),
        slow_down_age=jnp.asarray(jnp.inf, DT), slow_down_acc=jnp.zeros(2, DT), p=p,
    )
    assert int(s3.fsm) == FSM_AUTO_HOVER
    assert int(status) == STATUS_WAITINGCMD
    # fresh MPC command -> CMD_CTRL, acceleration passthrough
    cmd = CommandInput.none(dtype=DT)._replace(
        mode=jnp.asarray(CMD_ACCELERATION, jnp.int32),
        a=jnp.asarray([1.0, 0.0, 9.81], dtype=DT),
        age=jnp.asarray(0.0, dtype=DT),
    )
    s4, u, des, status, _ = bfctrl_step(
        s3, **_step_args(1.6, [0, 0, 1.45], [0, 0, 0], [1, 0, 0, 0]),
        cmd=cmd, takeoff_land_cmd=none_tl, takeoff_height_cmd=jnp.asarray(0.0, DT),
        slow_down_age=jnp.asarray(jnp.inf, DT), slow_down_acc=jnp.zeros(2, DT), p=p,
    )
    assert int(s4.fsm) == FSM_CMD_CTRL
    assert int(status) == STATUS_CMD
    # the controller tilted toward +x (ax=1 command)
    zb = np.asarray(quat_to_rotmat(u.q))[:, 2]
    assert zb[0] > 0.05


def test_bfctrl_cmd_timeout_falls_back_to_hover():
    p = BfctrlParams.default(dtype=DT)
    s = bfctrl_init(p)._replace(fsm=jnp.asarray(FSM_CMD_CTRL, jnp.int32))
    stale = CommandInput.none(dtype=DT)._replace(age=jnp.asarray(1.0, dtype=DT))
    s2, u, des, *_ = bfctrl_step(
        s, **_step_args(5.0, [2, 1, 1.5], [0, 0, 0], [1, 0, 0, 0]),
        cmd=stale, takeoff_land_cmd=jnp.asarray(0, jnp.int32),
        takeoff_height_cmd=jnp.asarray(0.0, DT),
        slow_down_age=jnp.asarray(jnp.inf, DT), slow_down_acc=jnp.zeros(2, DT), p=p,
    )
    assert int(s2.fsm) == FSM_AUTO_HOVER
    np.testing.assert_allclose(np.asarray(s2.hover_pose[:3]), [2, 1, 1.5])
    np.testing.assert_allclose(np.asarray(des.p), [2, 1, 1.5])


def test_bfctrl_slow_down_entry_and_exit():
    p = BfctrlParams.default(dtype=DT)
    s = bfctrl_init(p)._replace(fsm=jnp.asarray(FSM_CMD_CTRL, jnp.int32))
    cmd = CommandInput.none(dtype=DT)._replace(age=jnp.asarray(0.0, dtype=DT))
    s2, *_ = bfctrl_step(
        s, **_step_args(0.0, [0, 0, 1.5], [4.0, 0, 0], [1, 0, 0, 0]),
        cmd=cmd, takeoff_land_cmd=jnp.asarray(0, jnp.int32),
        takeoff_height_cmd=jnp.asarray(0.0, DT),
        slow_down_age=jnp.asarray(0.0, DT), slow_down_acc=jnp.asarray([2.0, 2.0], DT), p=p,
    )
    assert int(s2.fsm) == FSM_SLOW_DOWN
    # once slow -> AUTO_HOVER
    s3, *_ = bfctrl_step(
        s2, **_step_args(0.1, [1, 0, 1.5], [0.3, 0, 0], [1, 0, 0, 0]),
        cmd=CommandInput.none(dtype=DT), takeoff_land_cmd=jnp.asarray(0, jnp.int32),
        takeoff_height_cmd=jnp.asarray(0.0, DT),
        slow_down_age=jnp.asarray(jnp.inf, DT), slow_down_acc=jnp.zeros(2, DT), p=p,
    )
    assert int(s3.fsm) == FSM_AUTO_HOVER


def test_bfctrl_jit_and_vmap():
    p = BfctrlParams.default(dtype=DT)
    s = bfctrl_init(p)
    batch = jax.tree.map(lambda a: jnp.stack([a, a]), s)
    cmd = jax.tree.map(lambda a: jnp.stack([a, a]), CommandInput.none(dtype=DT))

    def step1(s, cmd):
        return bfctrl_step(
            s, jnp.asarray(0.0, DT), jnp.zeros(3, DT), jnp.zeros(3, DT),
            jnp.asarray([1.0, 0, 0, 0], DT), cmd, jnp.asarray(0, jnp.int32),
            jnp.asarray(0.0, DT), jnp.asarray(jnp.inf, DT), jnp.zeros(2, DT), p,
        )

    out = jax.jit(jax.vmap(step1))(batch, cmd)
    assert int(out[0].fsm[0]) == FSM_AUTO_TAKEOFF


def test_home_frame_latch():
    """Home-frame latch (input.cpp:15-104): first fix latches position +
    yaw-only attitude; subsequent odometry is re-expressed relative to home;
    the latch point itself maps to the origin with zero yaw."""
    import numpy as np
    from scipy.spatial.transform import Rotation

    from avoid_mpc_tpu.control.home_frame import HomeFrame, feed_odom
    from avoid_mpc_tpu.utils.quaternion import yaw_from_quat

    dtype = jnp.float64
    # first fix: offset position, attitude with yaw=0.7 + some tilt
    rot0 = Rotation.from_euler("ZYX", [0.7, 0.1, -0.05])
    q0 = jnp.asarray(np.roll(rot0.as_quat(), 1), dtype)  # xyzw -> wxyz
    p0 = jnp.asarray([10.0, -4.0, 2.0], dtype)
    v0 = jnp.asarray([1.0, 0.0, 0.0], dtype)
    w0 = jnp.asarray([0.0, 0.0, 0.3], dtype)

    home = HomeFrame.unset(dtype)
    home, p_l, q_l, v_l, w_l = feed_odom(home, p0, q0, v0, w0)
    assert bool(home.latched)
    # the latch point maps to origin, zero yaw (tilt survives: yaw-only home)
    np.testing.assert_allclose(np.asarray(p_l), 0.0, atol=1e-12)
    np.testing.assert_allclose(float(yaw_from_quat(q_l)), 0.0, atol=1e-12)
    # velocity rotated into the home frame by -yaw
    np.testing.assert_allclose(
        np.asarray(v_l),
        Rotation.from_euler("z", -0.7).apply(np.array(v0)), atol=1e-12,
    )

    # a second fix 1 m "forward" along home-yaw maps to +x in local frame
    fwd = Rotation.from_euler("z", 0.7).apply([1.0, 0.0, 0.0])
    home2, p_l2, *_ = feed_odom(home, p0 + jnp.asarray(fwd, dtype), q0, v0, w0)
    np.testing.assert_allclose(np.asarray(home2.p_home), np.asarray(p0))  # no relatch
    np.testing.assert_allclose(np.asarray(p_l2), [1.0, 0.0, 0.0], atol=1e-12)

    # use_global_odom passes odometry through untouched
    _, p_g, q_g, v_g, _ = feed_odom(home, p0, q0, v0, w0, use_global_odom=True)
    np.testing.assert_allclose(np.asarray(p_g), np.asarray(p0))
    np.testing.assert_allclose(np.asarray(q_g), np.asarray(q0))


def test_thrust_rls_gating_and_convergence():
    """Per-tick thrust-RLS wiring (BfCtrlFSM.cpp:163-167): disabled or
    on-ground ticks leave the model untouched; enabled airborne ticks driven
    by consistent (throttle, IMU-az) telemetry converge thr2acc to the true
    plant value and the returned hover_percentage to the true hover point."""
    from avoid_mpc_tpu.control.bfctrl import VfrHudInput

    p = BfctrlParams.default(dtype=DT)
    s0 = bfctrl_init(p)._replace(fsm=jnp.asarray(FSM_CMD_CTRL, jnp.int32))
    cmd = CommandInput.none(dtype=DT)._replace(age=jnp.asarray(0.0, dtype=DT))
    args = dict(
        cmd=cmd, takeoff_land_cmd=jnp.asarray(0, jnp.int32),
        takeoff_height_cmd=jnp.asarray(0.0, DT),
        slow_down_age=jnp.asarray(jnp.inf, DT), slow_down_acc=jnp.zeros(2, DT),
    )
    # true plant: hover at 0.36 throttle -> az = g * thr / 0.36
    true_hover = 0.36
    thr = jnp.asarray(0.4, DT)
    az = jnp.asarray(9.81 * 0.4 / true_hover, DT)
    imu = jnp.stack([jnp.zeros((), DT), jnp.zeros((), DT), az])
    vfr = VfrHudInput(throttle=thr, age=jnp.asarray(0.0, DT))

    # update disabled (reference yaml default): model untouched
    s1, *_ = bfctrl_step(
        s0, **_step_args(0.0, [0, 0, 1.5], [1.0, 0, 0], [1, 0, 0, 0]),
        **args, p=p, imu_a=imu, vfr=vfr,
    )
    assert float(s1.thrust_model.thr2acc) == float(s0.thrust_model.thr2acc)

    p_on = p._replace(thrust_update=jnp.asarray(True))
    # enabled but ON GROUND (throttle < hover/2, nearly stationary): no update
    s2, *_ = bfctrl_step(
        s0, **_step_args(0.0, [0, 0, 0.0], [0, 0, 0], [1, 0, 0, 0]),
        **args, p=p_on,
        imu_a=imu, vfr=VfrHudInput(throttle=jnp.asarray(0.05, DT), age=jnp.asarray(0.0, DT)),
    )
    assert float(s2.thrust_model.thr2acc) == float(s0.thrust_model.thr2acc)

    # enabled + airborne: RLS converges to the true thrust curve
    s = s0
    for _ in range(60):
        s, u, des, status, hover_pct = bfctrl_step(
            s, **_step_args(0.0, [0, 0, 1.5], [1.0, 0, 0], [1, 0, 0, 0]),
            **args, p=p_on, imu_a=imu, vfr=vfr,
        )
    np.testing.assert_allclose(
        float(s.thrust_model.thr2acc), 9.81 / true_hover, rtol=1e-3
    )
    np.testing.assert_allclose(float(hover_pct), true_hover, rtol=1e-3)
