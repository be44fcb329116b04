"""6-DoF quadrotor plant with an attitude cascade — the simulator core.

JAX re-design of the vendored AirSim stack's closed-loop plant:

- **rigid body**: wrench -> Verlet integration with trapezoidal velocity and
  exponential-map attitude update, quadratic drag, ground lock — the
  ``FastPhysicsEngine`` semantics (``AirLib/include/physics/
  FastPhysicsEngine.hpp:325-440``), Euler's rotation equation included,
- **attitude cascade**: angle-level PID -> body-rate PID -> torques — the
  simple_flight ``CascadeController``/``PidController`` structure
  (``firmwares/simple_flight/firmware/CascadeController.hpp:46-110``) with
  the gains the sim pushes at init (``mpc_obstacle_avoidance_sim.launch``:
  angle kp 7.0 / ki 10.0 / kd 8e-5, rate kp 0.02 / ki 0.01 / kd 5.5e-4),
- **thrust mapping**: normalized thrust signal -> force, hover at the
  configured hover percentage (``ctrl_param_fpv_real.yaml`` hover 0.30,
  mass 1.5 kg).

The plant consumes exactly what the bridge forwards to the sim
(``airsim_ros_wrapper.cpp:612-647``): a desired attitude quaternion + a
normalized collective thrust (or body rates + thrust).  One `sixdof_step` is
a control-period step with static physics substeps; everything batches over
scenarios with vmap.

World frame: z-up local frame (the bridge's NED->local conversion already
applied, ``airsim_ros_wrapper.cpp:984-1012``).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from avoid_mpc_tpu.utils.quaternion import (
    quat_conjugate,
    quat_integrate,
    quat_multiply,
    quat_normalize,
    quat_to_rotmat,
    rotmat_to_ypr,
)

GRAVITY = 9.81


class SixDofParams(NamedTuple):
    mass: jax.Array  # kg (yaml 1.5)
    inertia: jax.Array  # (3,) diagonal body inertia
    hover_percentage: jax.Array  # thrust signal at hover (yaml 0.30)
    angle_kp: jax.Array
    angle_ki: jax.Array
    angle_kd: jax.Array
    rate_kp: jax.Array
    rate_ki: jax.Array
    rate_kd: jax.Array
    torque_scale: jax.Array  # rate-PID output (normalized) -> torque [N m]
    drag_c: jax.Array  # quadratic drag coefficient  F = -c |v| v
    max_rate: jax.Array  # body-rate saturation [rad/s]
    substeps: int = 4  # static physics refinement per control step

    @staticmethod
    def default(dtype=jnp.float32) -> "SixDofParams":
        return SixDofParams(
            mass=jnp.asarray(1.5, dtype=dtype),
            inertia=jnp.asarray([0.02, 0.02, 0.035], dtype=dtype),
            hover_percentage=jnp.asarray(0.30, dtype=dtype),
            angle_kp=jnp.asarray(7.0, dtype=dtype),
            angle_ki=jnp.asarray(10.0, dtype=dtype),
            angle_kd=jnp.asarray(8e-5, dtype=dtype),
            rate_kp=jnp.asarray(0.02, dtype=dtype),
            rate_ki=jnp.asarray(0.01, dtype=dtype),
            rate_kd=jnp.asarray(5.5e-4, dtype=dtype),
            torque_scale=jnp.asarray(40.0, dtype=dtype),
            drag_c=jnp.asarray(0.0, dtype=dtype),
            max_rate=jnp.asarray(12.0, dtype=dtype),
        )

    @property
    def max_thrust(self) -> jax.Array:
        """Collective force at thrust signal 1.0: hover_percentage maps to
        m*g (the approximate thrust model, ctrl_param_fpv_real.yaml)."""
        return self.mass * GRAVITY / self.hover_percentage


class SixDofState(NamedTuple):
    p: jax.Array  # (3,) world position
    q: jax.Array  # (4,) wxyz body->world
    v: jax.Array  # (3,) world velocity
    w: jax.Array  # (3,) body angular velocity
    a_lin: jax.Array  # (3,) last linear acceleration (Verlet carry)
    a_ang: jax.Array  # (3,) last angular acceleration
    angle_int: jax.Array  # (3,) angle-loop integrator
    rate_int: jax.Array  # (3,) rate-loop integrator
    grounded: jax.Array  # bool — ground lock (FastPhysicsEngine.hpp:330-345)


def sixdof_init(p0: jax.Array, yaw0: jax.Array = None, dtype=jnp.float32) -> SixDofState:
    q0 = jnp.asarray([1.0, 0.0, 0.0, 0.0], dtype=dtype)
    if yaw0 is not None:
        half = yaw0 / 2
        q0 = jnp.stack(
            [jnp.cos(half), jnp.zeros_like(half), jnp.zeros_like(half), jnp.sin(half)]
        ).astype(dtype)
    z3 = jnp.zeros(3, dtype=dtype)
    return SixDofState(
        p=jnp.asarray(p0, dtype=dtype), q=q0, v=z3, w=z3,
        a_lin=z3, a_ang=z3, angle_int=z3, rate_int=z3,
        grounded=jnp.asarray(True),
    )


def _attitude_error_rpy(q_des: jax.Array, q: jax.Array) -> jax.Array:
    """Roll/pitch/yaw error angles of q_des relative to q (the per-axis error
    the simple_flight AngleLevel PIDs act on)."""
    qe = quat_multiply(quat_conjugate(quat_normalize(q)), quat_normalize(q_des))
    R = quat_to_rotmat(qe)
    yaw, pitch, roll = rotmat_to_ypr(R)
    return jnp.stack([roll, pitch, yaw])


def _cascade_u(
    s: SixDofState, q_des: jax.Array, dt, p: SixDofParams
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Angle PID -> rate command -> rate PID.  Returns the *normalized*
    per-axis output ``u`` (what simple_flight hands the mixer) plus the new
    integrator states."""
    ang_err = _attitude_error_rpy(q_des, s.q)
    angle_int = jnp.clip(s.angle_int + ang_err * dt, -0.5, 0.5)
    rate_cmd = p.angle_kp * ang_err + p.angle_ki * angle_int
    rate_cmd = jnp.clip(rate_cmd, -p.max_rate, p.max_rate)

    rate_err = rate_cmd - s.w
    rate_int = jnp.clip(s.rate_int + rate_err * dt, -1.0, 1.0)
    u = p.rate_kp * rate_err + p.rate_ki * rate_int - p.rate_kd * s.a_ang
    return u, angle_int, rate_int


def _cascade(
    s: SixDofState, q_des: jax.Array, dt, p: SixDofParams
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Angle PID -> rate command -> rate PID -> torque.
    Returns (torque, new angle_int, new rate_int)."""
    u, angle_int, rate_int = _cascade_u(s, q_des, dt, p)
    torque = u * p.torque_scale * p.inertia / jnp.max(p.inertia)
    return torque, angle_int, rate_int


def sixdof_step(
    s: SixDofState,
    q_des: jax.Array,
    thrust_signal: jax.Array,
    dt: float,
    p: SixDofParams,
) -> SixDofState:
    """Advance one control period (static ``substeps`` physics updates).

    Mirrors ``getNextKinematicsNoCollision`` (FastPhysicsEngine.hpp:325-420):
    trapezoidal (Verlet) velocity update, position from the midpoint
    velocity, Euler's rotation equation for angular acceleration, ground
    lock released when net upward force exceeds weight.
    """
    h = dt / p.substeps
    thrust_signal = jnp.clip(thrust_signal, 0.0, 1.0)

    def sub(s, _):
        torque, angle_int, rate_int = _cascade(s, q_des, h, p)

        R = quat_to_rotmat(s.q)
        thrust_force = R[:, 2] * thrust_signal * p.max_thrust
        drag = -p.drag_c * jnp.linalg.norm(s.v) * s.v
        gravity = jnp.asarray([0.0, 0.0, -GRAVITY], dtype=s.p.dtype)

        # ground lock: stick until net force beats weight (hpp:330-345)
        lift_off = thrust_signal * p.max_thrust >= p.mass * GRAVITY
        grounded = s.grounded & ~lift_off

        a_new = jnp.where(
            grounded, jnp.zeros(3, dtype=s.p.dtype),
            (thrust_force + drag) / p.mass + gravity,
        )
        # Euler's rotation equation (hpp:385-393)
        avg_w = s.w + s.a_ang * (0.5 * h)
        L = p.inertia * avg_w
        a_ang_new = jnp.where(
            grounded, jnp.zeros(3, dtype=s.p.dtype),
            (torque - jnp.cross(avg_w, L)) / p.inertia,
        )

        # Verlet / trapezoidal updates (hpp:396-417)
        avg_lin = s.v + s.a_lin * (0.5 * h)
        v_new = jnp.where(grounded, jnp.zeros(3, dtype=s.p.dtype), s.v + (s.a_lin + a_new) * (0.5 * h))
        w_new = jnp.where(grounded, jnp.zeros(3, dtype=s.p.dtype), s.w + (s.a_ang + a_ang_new) * (0.5 * h))
        p_new = s.p + avg_lin * h
        q_new = quat_integrate(s.q, avg_w * jnp.where(grounded, 0.0, 1.0), h)

        # hard ground plane: never sink below z=0
        below = p_new[2] < 0.0
        p_new = p_new.at[2].set(jnp.maximum(p_new[2], 0.0))
        v_new = jnp.where(below, v_new.at[2].set(jnp.maximum(v_new[2], 0.0)), v_new)

        return SixDofState(
            p=p_new, q=q_new, v=v_new, w=w_new,
            a_lin=a_new, a_ang=a_ang_new,
            angle_int=angle_int, rate_int=rate_int,
            grounded=grounded,
        ), None

    s, _ = jax.lax.scan(sub, s, None, length=p.substeps)
    return s


class SixDofRotorState(NamedTuple):
    """Plant state at per-rotor fidelity: rigid body + actuator filters."""

    body: SixDofState
    rotors: "RotorState"  # noqa: F821 — imported lazily below


def sixdof_rotor_init(p0: jax.Array, yaw0=None, dtype=jnp.float32) -> SixDofRotorState:
    from avoid_mpc_tpu.sim.rotor import rotor_init

    return SixDofRotorState(
        body=sixdof_init(p0, yaw0, dtype=dtype), rotors=rotor_init(dtype=dtype)
    )


def sixdof_step_rotor(
    s: SixDofRotorState,
    q_des: jax.Array,
    thrust_signal: jax.Array,
    dt: float,
    p: SixDofParams,
    rp=None,
) -> SixDofRotorState:
    """Advance one control period at per-rotor fidelity.

    Same rigid-body math as :func:`sixdof_step`, but the wrench comes from
    the full actuation chain the reference runs: cascade output -> QuadX
    mixer (``Mixer.hpp:19-48``) -> per-rotor first-order filters ->
    thrust/drag-torque vertex wrenches summed over the 4 rotors
    (``RotorActuator.hpp:108-129``, ``MultiRotorParams.hpp:101-141``) — so
    attitude torque saturates with motor limits and yaw authority comes from
    rotor drag, not the collective ``torque_scale`` abstraction.
    """
    from avoid_mpc_tpu.sim.rotor import RotorParams, RotorState, mix_quadx, rotor_step

    if rp is None:
        rp = RotorParams.default(dtype=s.body.p.dtype)
    h = dt / p.substeps
    thrust_signal = jnp.clip(thrust_signal, 0.0, 1.0)

    def sub(carry, _):
        b, rs = carry
        u, angle_int, rate_int = _cascade_u(b, q_des, h, p)
        motors = mix_quadx(thrust_signal, u[0], u[1], u[2], rp)
        rs, force_b, torque = rotor_step(rs, motors, h, rp)

        R = quat_to_rotmat(b.q)
        # exact body->world force: per-column FMA chain, no bf16 MXU pass
        thrust_force = (
            R[:, 0] * force_b[0] + R[:, 1] * force_b[1] + R[:, 2] * force_b[2]
        )
        drag = -p.drag_c * jnp.linalg.norm(b.v) * b.v
        gravity = jnp.asarray([0.0, 0.0, -GRAVITY], dtype=b.p.dtype)

        # ground lock on the *delivered* (filtered) collective force
        lift_off = force_b[2] >= p.mass * GRAVITY
        grounded = b.grounded & ~lift_off

        a_new = jnp.where(
            grounded, jnp.zeros(3, dtype=b.p.dtype),
            (thrust_force + drag) / p.mass + gravity,
        )
        avg_w = b.w + b.a_ang * (0.5 * h)
        L = p.inertia * avg_w
        a_ang_new = jnp.where(
            grounded, jnp.zeros(3, dtype=b.p.dtype),
            (torque - jnp.cross(avg_w, L)) / p.inertia,
        )

        avg_lin = b.v + b.a_lin * (0.5 * h)
        v_new = jnp.where(grounded, jnp.zeros(3, dtype=b.p.dtype), b.v + (b.a_lin + a_new) * (0.5 * h))
        w_new = jnp.where(grounded, jnp.zeros(3, dtype=b.p.dtype), b.w + (b.a_ang + a_ang_new) * (0.5 * h))
        p_new = b.p + avg_lin * h
        q_new = quat_integrate(b.q, avg_w * jnp.where(grounded, 0.0, 1.0), h)

        below = p_new[2] < 0.0
        p_new = p_new.at[2].set(jnp.maximum(p_new[2], 0.0))
        v_new = jnp.where(below, v_new.at[2].set(jnp.maximum(v_new[2], 0.0)), v_new)

        return (
            SixDofState(
                p=p_new, q=q_new, v=v_new, w=w_new,
                a_lin=a_new, a_ang=a_ang_new,
                angle_int=angle_int, rate_int=rate_int,
                grounded=grounded,
            ),
            rs,
        ), None

    (b, rs), _ = jax.lax.scan(sub, (s.body, s.rotors), None, length=p.substeps)
    return SixDofRotorState(body=b, rotors=rs)


def sixdof_to_mpc_state(s: SixDofState) -> jax.Array:
    """Project the 6-DoF plant state onto the MPC's 10-dim state
    [p, yaw, v, a] (gravity-compensated accel, matching the IMU-derived
    accel the avoidance node estimates, AvoidanceStateMachine.cpp:151-152)."""
    from avoid_mpc_tpu.utils.quaternion import yaw_from_quat

    return jnp.concatenate(
        [s.p, yaw_from_quat(s.q)[None], s.v, s.a_lin]
    )
