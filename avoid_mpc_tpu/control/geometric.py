"""Geometric flight controller — the betaflight_ctrl low-level control law.

Re-design of ``betaflight_ctrl/src/controller.cpp`` as pure batched JAX:

- control modes ACCELERATION (the MPC path, :31-32), POSITION (Faessler-2017
  PD + feedforward + rotor-drag compensation, :60-90), ANGULAR, QUAT (:36-53),
- ``acc2quaternion`` tilt-from-acceleration attitude (:92-110),
- two attitude-error rate laws: Lee-2010 geometric (:125-144) and
  Brescianini quaternion (:145-166),
- online thrust model ``thrust = a_bz / thr2acc`` with recursive least
  squares (forgetting rho^2 = 0.998) estimation of ``thr2acc``
  (:180-201) — the RLS state is an explicit carry, not a member variable.

All functions broadcast over leading batch axes; controller gains live in a
``ControllerParams`` pytree built from the reference config
(``ctrl_param_fpv_real.yaml`` / ``bfctrl_config.yaml``).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from avoid_mpc_tpu.utils.quaternion import (
    quat_conjugate,
    quat_multiply,
    quat_normalize,
    quat_to_rotmat,
    rotmat_to_quat,
    vee,
)

GRAVITY = 9.81

# quadrotor_msgs::Command modes
CMD_POSITION = 0
CMD_ACCELERATION = 1
CMD_ANGULAR = 2
CMD_QUAT = 3

# RLS forgetting factor (controller.h rho2 = 0.998)
_RLS_RHO2 = 0.998


class ControllerParams(NamedTuple):
    kpos: jax.Array  # (3,) position gains (yaml Kpos_*: 6, 6, 8.5)
    kvel: jax.Array  # (3,) velocity gains (yaml Kvel_*: 3.5, 3.5, 5.5)
    drag_d: jax.Array  # (3,) rotor-drag compensation (yaml drag_d*: 0)
    attctrl_tau: jax.Array  # attitude-loop time constant (yaml 0.5)
    max_fb_acc: jax.Array  # feedback-acceleration clip (yaml 20.0)
    hover_percentage: jax.Array  # thrust fraction at hover (yaml 0.30)
    gravity: jax.Array

    @staticmethod
    def default(dtype=jnp.float32) -> "ControllerParams":
        return ControllerParams(
            kpos=jnp.asarray([6.0, 6.0, 8.5], dtype=dtype),
            kvel=jnp.asarray([3.5, 3.5, 5.5], dtype=dtype),
            drag_d=jnp.zeros(3, dtype=dtype),
            attctrl_tau=jnp.asarray(0.5, dtype=dtype),
            max_fb_acc=jnp.asarray(20.0, dtype=dtype),
            hover_percentage=jnp.asarray(0.30, dtype=dtype),
            gravity=jnp.asarray(GRAVITY, dtype=dtype),
        )


class ThrustModelState(NamedTuple):
    """RLS carry for the thrust mapping (controller.cpp:180-201)."""

    thr2acc: jax.Array  # accel per unit thrust signal
    P: jax.Array  # RLS covariance


def thrust_model_init(p: ControllerParams) -> ThrustModelState:
    """``resetThrustMapping``: thr2acc = g / hover_percentage, P = 1e6."""
    return ThrustModelState(
        thr2acc=p.gravity / p.hover_percentage,
        P=jnp.asarray(1e6, dtype=p.gravity.dtype),
    )


def estimate_thrust_model(
    tm: ThrustModelState, est_az: jax.Array, thr: jax.Array
) -> ThrustModelState:
    """One RLS step with vanishing memory: model est_az = thr2acc * thr."""
    gamma = 1.0 / (_RLS_RHO2 + thr * tm.P * thr)
    K = gamma * tm.P * thr
    thr2acc = tm.thr2acc + K * (est_az - thr * tm.thr2acc)
    P = (1.0 - K * thr) * tm.P / _RLS_RHO2
    return ThrustModelState(thr2acc=thr2acc, P=P)


class ControllerOutput(NamedTuple):
    q: jax.Array  # (4,) desired attitude (wxyz)
    thrust: jax.Array  # scalar normalized thrust signal
    bodyrates: jax.Array  # (3,) rate command (geometric att controller)


def acc2quaternion(acc: jax.Array, yaw: jax.Array) -> jax.Array:
    """Tilt attitude whose body-z aligns with ``acc``, heading ``yaw``
    (controller.cpp:92-110; same construction as the NLP's acc2rotmat)."""
    proj_xb = jnp.stack([jnp.cos(yaw), jnp.sin(yaw), jnp.zeros_like(yaw)], axis=-1)
    zb = acc / jnp.maximum(jnp.linalg.norm(acc, axis=-1, keepdims=True), 1e-9)
    yb = jnp.cross(zb, proj_xb)
    yb = yb / jnp.maximum(jnp.linalg.norm(yb, axis=-1, keepdims=True), 1e-9)
    xb = jnp.cross(yb, zb)
    R = jnp.stack([xb, yb, zb], axis=-1)
    return rotmat_to_quat(R)


def _pos_feedback(pos_err, vel_err, p: ControllerParams):
    """PD feedback with norm clip (controller.cpp:112-124)."""
    a_fb = p.kpos * pos_err + p.kvel * vel_err
    n = jnp.linalg.norm(a_fb, axis=-1, keepdims=True)
    scale = jnp.minimum(1.0, p.max_fb_acc / jnp.maximum(n, 1e-9))
    return a_fb * scale


def lee_attitude_rates(q_ref: jax.Array, q_cur: jax.Array, p: ControllerParams):
    """Lee-2010 geometric attitude-error rate law (controller.cpp:125-144)."""
    R = quat_to_rotmat(q_cur)
    Rd = quat_to_rotmat(q_ref)
    e = 0.5 * vee(
        jnp.swapaxes(Rd, -1, -2) @ R - jnp.swapaxes(R, -1, -2) @ Rd
    )
    return (2.0 / p.attctrl_tau) * e


def brescianini_attitude_rates(q_ref: jax.Array, q_cur: jax.Array, p: ControllerParams):
    """Brescianini quaternion attitude-error rate law (controller.cpp:145-166)."""
    qe = quat_multiply(quat_conjugate(quat_normalize(q_cur)), q_ref)
    sign = jnp.sign(qe[..., 0:1]) + (qe[..., 0:1] == 0)
    return (2.0 / p.attctrl_tau) * sign * qe[..., 1:4]


def geometric_controller(
    mode: jax.Array,
    des_p: jax.Array,
    des_v: jax.Array,
    des_a: jax.Array,
    des_yaw: jax.Array,
    des_q: jax.Array,
    des_w: jax.Array,
    des_thrust: jax.Array,
    odom_p: jax.Array,
    odom_v: jax.Array,
    odom_q: jax.Array,
    p: ControllerParams,
    tm: ThrustModelState,
) -> ControllerOutput:
    """Dispatch on command mode (controller.cpp:26-55). ``mode`` is a traced
    int so one compiled controller serves mixed-mode batches.

    ACCELERATION (the MPC path): desired_acc = des_a directly; attitude from
    acc2quaternion; thrust = desired_acc . z_body / thr2acc (:40-44).
    POSITION: Faessler PD+ff+drag-comp produces desired_acc (:60-90).
    QUAT / ANGULAR: passthrough attitude / rates with mapped thrust.
    """
    # POSITION-mode desired acceleration (gravity included, :86-87)
    q_ref = acc2quaternion(
        des_a + jnp.stack([jnp.zeros_like(des_yaw), jnp.zeros_like(des_yaw), jnp.full_like(des_yaw, p.gravity)], axis=-1),
        des_yaw,
    )
    R_ref = quat_to_rotmat(q_ref)
    a_rd = jnp.einsum(
        "...ij,...j->...i",
        R_ref * p.drag_d,
        jnp.einsum("...ji,...j->...i", R_ref, des_v),
    )
    a_pos = (
        _pos_feedback(des_p - odom_p, des_v - odom_v, p)
        + des_a
        - a_rd
        + jnp.stack(
            [jnp.zeros_like(des_yaw), jnp.zeros_like(des_yaw), jnp.full_like(des_yaw, p.gravity)],
            axis=-1,
        )
    )

    # Per-scenario scalar mode; batching is vmap's job, so plain scalar-cond
    # where() broadcasts over the vector operands.
    is_accel = mode == CMD_ACCELERATION
    is_quat = mode == CMD_QUAT
    is_angular = mode == CMD_ANGULAR

    desired_acc = jnp.where(is_accel, des_a, a_pos)
    q_out = acc2quaternion(desired_acc, des_yaw)
    zb = quat_to_rotmat(odom_q)[..., :, 2]
    thrust = jnp.sum(desired_acc * zb, axis=-1) / tm.thr2acc

    q_out = jnp.where(is_quat, des_q, q_out)
    thrust = jnp.where(is_quat | is_angular, des_thrust / tm.thr2acc, thrust)

    rates = lee_attitude_rates(q_out, odom_q, p)
    rates = jnp.where(is_angular, des_w, rates)
    return ControllerOutput(q=q_out, thrust=thrust, bodyrates=rates)
