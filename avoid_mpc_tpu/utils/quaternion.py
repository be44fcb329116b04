"""Quaternion / rotation helpers (wxyz convention), batched and jittable.

The counterparts of the reference's Eigen usage and the header-only helpers
in ``betaflight_ctrl/uav_utils/include`` (rotation round-trips are covered by
the reference's only gtest suite, ``uav_utils_test.cpp`` — mirrored in
``tests/test_quaternion.py``).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def quat_multiply(q1: jax.Array, q2: jax.Array) -> jax.Array:
    """Hamilton product, (...,4) wxyz."""
    w1, x1, y1, z1 = jnp.moveaxis(q1, -1, 0)
    w2, x2, y2, z2 = jnp.moveaxis(q2, -1, 0)
    return jnp.stack(
        [
            w1 * w2 - x1 * x2 - y1 * y2 - z1 * z2,
            w1 * x2 + x1 * w2 + y1 * z2 - z1 * y2,
            w1 * y2 - x1 * z2 + y1 * w2 + z1 * x2,
            w1 * z2 + x1 * y2 - y1 * x2 + z1 * w2,
        ],
        axis=-1,
    )


def quat_conjugate(q: jax.Array) -> jax.Array:
    return q * jnp.asarray([1.0, -1.0, -1.0, -1.0], dtype=q.dtype)


def quat_normalize(q: jax.Array) -> jax.Array:
    return q / jnp.linalg.norm(q, axis=-1, keepdims=True)


def quat_to_rotmat(q: jax.Array) -> jax.Array:
    """(...,4) wxyz -> (...,3,3)."""
    w, x, y, z = jnp.moveaxis(quat_normalize(q), -1, 0)
    r = jnp.stack(
        [
            1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y),
            2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x),
            2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y),
        ],
        axis=-1,
    )
    return r.reshape(r.shape[:-1] + (3, 3))


def rotmat_to_quat(R: jax.Array) -> jax.Array:
    """(...,3,3) -> (...,4) wxyz. Branch-free Shepperd method via where."""
    m00, m01, m02 = R[..., 0, 0], R[..., 0, 1], R[..., 0, 2]
    m10, m11, m12 = R[..., 1, 0], R[..., 1, 1], R[..., 1, 2]
    m20, m21, m22 = R[..., 2, 0], R[..., 2, 1], R[..., 2, 2]
    tr = m00 + m11 + m22

    def safe_sqrt(v):
        return jnp.sqrt(jnp.maximum(v, 1e-12))

    # four candidate constructions, pick the numerically largest pivot
    q0 = jnp.stack(
        [safe_sqrt(1 + tr) / 2,
         (m21 - m12) / (2 * safe_sqrt(1 + tr)),
         (m02 - m20) / (2 * safe_sqrt(1 + tr)),
         (m10 - m01) / (2 * safe_sqrt(1 + tr))], axis=-1)
    q1 = jnp.stack(
        [(m21 - m12) / (2 * safe_sqrt(1 + m00 - m11 - m22)),
         safe_sqrt(1 + m00 - m11 - m22) / 2,
         (m01 + m10) / (2 * safe_sqrt(1 + m00 - m11 - m22)),
         (m02 + m20) / (2 * safe_sqrt(1 + m00 - m11 - m22))], axis=-1)
    q2 = jnp.stack(
        [(m02 - m20) / (2 * safe_sqrt(1 - m00 + m11 - m22)),
         (m01 + m10) / (2 * safe_sqrt(1 - m00 + m11 - m22)),
         safe_sqrt(1 - m00 + m11 - m22) / 2,
         (m12 + m21) / (2 * safe_sqrt(1 - m00 + m11 - m22))], axis=-1)
    q3 = jnp.stack(
        [(m10 - m01) / (2 * safe_sqrt(1 - m00 - m11 + m22)),
         (m02 + m20) / (2 * safe_sqrt(1 - m00 - m11 + m22)),
         (m12 + m21) / (2 * safe_sqrt(1 - m00 - m11 + m22)),
         safe_sqrt(1 - m00 - m11 + m22) / 2], axis=-1)

    pivots = jnp.stack([tr, m00 - m11 - m22, -m00 + m11 - m22, -m00 - m11 + m22], axis=-1)
    best = jnp.argmax(pivots, axis=-1)
    q = jnp.choose(best, [q0, q1, q2, q3], mode="clip") if q0.ndim == 1 else jnp.take_along_axis(
        jnp.stack([q0, q1, q2, q3], axis=-2), best[..., None, None], axis=-2
    )[..., 0, :]
    return quat_normalize(q)


def quat_rotate(q: jax.Array, v: jax.Array) -> jax.Array:
    """Rotate vector(s) v by quaternion q."""
    R = quat_to_rotmat(q)
    return jnp.einsum("...ij,...j->...i", R, v)


def yaw_from_quat(q: jax.Array) -> jax.Array:
    """Z-Y-X yaw (reference ``GetYawFromPuat``, AvoidanceStateMachine.cpp:112-117)."""
    w, x, y, z = jnp.moveaxis(q, -1, 0)
    return jnp.arctan2(2 * (w * z + x * y), 1 - 2 * (y * y + z * z))


def quat_from_axis_angle(axis: jax.Array, angle: jax.Array) -> jax.Array:
    axis = axis / jnp.maximum(jnp.linalg.norm(axis, axis=-1, keepdims=True), 1e-12)
    half = angle / 2
    return jnp.concatenate(
        [jnp.cos(half)[..., None], axis * jnp.sin(half)[..., None]], axis=-1
    )


def quat_integrate(q: jax.Array, omega_body: jax.Array, dt) -> jax.Array:
    """Integrate body angular velocity over dt (exact exponential map —
    the reference's ``computeNextPose`` axis-angle step,
    FastPhysicsEngine.hpp:420-440)."""
    angle = jnp.linalg.norm(omega_body, axis=-1) * dt
    axis = omega_body / jnp.maximum(jnp.linalg.norm(omega_body, axis=-1, keepdims=True), 1e-12)
    dq = quat_from_axis_angle(axis, angle)
    return quat_normalize(quat_multiply(q, dq))


def compose_tf(Ta: jax.Array, Tb: jax.Array) -> jax.Array:
    """Rigid-transform compose ``Ta @ Tb`` written as per-element FMA chains.

    World-coordinate pose math must stay exact f32 (CLAUDE.md rule 1): the
    default ``@`` takes a bf16 MXU pass that quantizes the translation column
    (~0.25 m ulp at x=130 m), and a HIGHEST-precision dot costs a
    disproportionate slice of the composed world-step program (measured
    round 5).  Elementwise products on the VPU are exact and free."""
    Ra, ta = Ta[..., :3, :3], Ta[..., :3, 3]
    Rb, tb = Tb[..., :3, :3], Tb[..., :3, 3]
    R = jnp.stack(
        [
            jnp.stack(
                [
                    Ra[..., i, 0] * Rb[..., 0, j]
                    + Ra[..., i, 1] * Rb[..., 1, j]
                    + Ra[..., i, 2] * Rb[..., 2, j]
                    for j in range(3)
                ],
                axis=-1,
            )
            for i in range(3)
        ],
        axis=-2,
    )
    t = jnp.stack(
        [
            Ra[..., i, 0] * tb[..., 0]
            + Ra[..., i, 1] * tb[..., 1]
            + Ra[..., i, 2] * tb[..., 2]
            + ta[..., i]
            for i in range(3)
        ],
        axis=-1,
    )
    T = jnp.zeros_like(Ta)
    T = T.at[..., :3, :3].set(R).at[..., :3, 3].set(t)
    return T.at[..., 3, 3].set(1.0)


def rigid_inverse(T: jax.Array) -> jax.Array:
    """Inverse of a rigid (4,4) transform: [R.T, -R.T t] — exact, no LU."""
    R, t = T[..., :3, :3], T[..., :3, 3]
    Rt = jnp.swapaxes(R, -1, -2)
    ti = jnp.stack(
        [
            -(Rt[..., i, 0] * t[..., 0]
              + Rt[..., i, 1] * t[..., 1]
              + Rt[..., i, 2] * t[..., 2])
            for i in range(3)
        ],
        axis=-1,
    )
    Ti = jnp.zeros_like(T)
    Ti = Ti.at[..., :3, :3].set(Rt).at[..., :3, 3].set(ti)
    return Ti.at[..., 3, 3].set(1.0)


def skew(v: jax.Array) -> jax.Array:
    x, y, z = jnp.moveaxis(v, -1, 0)
    zero = jnp.zeros_like(x)
    r = jnp.stack([zero, -z, y, z, zero, -x, -y, x, zero], axis=-1)
    return r.reshape(r.shape[:-1] + (3, 3))


def vee(M: jax.Array) -> jax.Array:
    """Inverse of skew (``matrix_hat_inv`` in the reference controller)."""
    return jnp.stack([M[..., 2, 1], M[..., 0, 2], M[..., 1, 0]], axis=-1)


def ypr_to_rotmat(yaw, pitch, roll):
    """Z-Y-X Euler to rotation matrix (uav_utils ``ypr_to_R``)."""
    cy, sy = jnp.cos(yaw), jnp.sin(yaw)
    cp, sp = jnp.cos(pitch), jnp.sin(pitch)
    cr, sr = jnp.cos(roll), jnp.sin(roll)
    r = jnp.stack(
        [
            cy * cp, cy * sp * sr - sy * cr, cy * sp * cr + sy * sr,
            sy * cp, sy * sp * sr + cy * cr, sy * sp * cr - cy * sr,
            -sp, cp * sr, cp * cr,
        ],
        axis=-1,
    )
    return r.reshape(r.shape[:-1] + (3, 3))


def rotmat_to_ypr(R: jax.Array):
    yaw = jnp.arctan2(R[..., 1, 0], R[..., 0, 0])
    pitch = jnp.arcsin(jnp.clip(-R[..., 2, 0], -1.0, 1.0))
    roll = jnp.arctan2(R[..., 2, 1], R[..., 2, 2])
    return yaw, pitch, roll
