"""Odometry frame conversion — the ``tf_assist.py`` OdometryConverter role.

The reference ships a ROS node (``betaflight_ctrl/uav_utils/scripts/
tf_assist.py``: OdometryConverter) that re-expresses incoming odometry in a
different world frame given a static frame_in -> frame_out transform and
re-broadcasts the body TF.  Here the same math is a pure jittable function
over the odometry arrays (position, velocity, attitude quaternion) — vmap
for batches, no middleware.

Frames: ``T_out_in = (R, t)`` maps points of the input world frame into the
output world frame.  Velocities are free vectors (rotate only).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from avoid_mpc_tpu.utils.quaternion import (
    quat_multiply,
    quat_rotate,
    rotmat_to_quat,
)


class Odom(NamedTuple):
    """Minimal odometry tuple (nav_msgs/Odometry payload the converter
    touches): world position, world velocity, body->world attitude."""

    p: jax.Array  # (3,)
    v: jax.Array  # (3,)
    q: jax.Array  # (4,) wxyz


def convert_odom(odom: Odom, R_out_in: jax.Array, t_out_in: jax.Array) -> Odom:
    """Re-express odometry given the static input->output world transform
    (the OdometryConverter odom_callback math)."""
    q_oi = rotmat_to_quat(R_out_in)
    return Odom(
        p=quat_rotate(q_oi, odom.p) + t_out_in,
        v=quat_rotate(q_oi, odom.v),
        q=quat_multiply(q_oi, odom.q),
    )


def body_tf(odom: Odom):
    """(R_wb, t_wb): the body TF the converter broadcasts."""
    from avoid_mpc_tpu.utils.quaternion import quat_to_rotmat

    return quat_to_rotmat(odom.q), odom.p


def odom_to_euler_deg(q_wxyz: jax.Array) -> jax.Array:
    """Attitude quaternion -> (roll, pitch, yaw) in DEGREES, packed
    x=roll, y=pitch, z=yaw — the plotting vector published by
    ``uav_utils/scripts/odom_to_euler.py`` (euler_from_quaternion 'rzyx'
    scaled by 180/pi, vector.z=yaw / y=pitch / x=roll)."""
    from avoid_mpc_tpu.utils.quaternion import quat_to_rotmat, rotmat_to_ypr

    yaw, pitch, roll = rotmat_to_ypr(quat_to_rotmat(q_wxyz))
    return jnp.rad2deg(jnp.stack([roll, pitch, yaw], axis=-1))


def constant_odom_stream(n: int, rate_hz: float = 1.0,
                         stamp_offset_s: float = 0.2):
    """Synthetic identity-pose odometry stream — the
    ``uav_utils/scripts/send_odom.py`` debug role: n samples of a fixed
    world-origin Odom whose stamps lag wall time by ``stamp_offset_s``
    (the script's ``rospy.Time.now() - Duration(0.2)``), published at
    ``rate_hz``.  Feed these (odom, stamp) pairs to bfctrl to exercise the
    odometry age gate deterministically."""
    q_id = jnp.asarray([1.0, 0.0, 0.0, 0.0])
    odom = Odom(jnp.zeros(3), jnp.zeros(3), q_id)
    stamps = [k / rate_hz - stamp_offset_s for k in range(n)]
    return [(odom, s) for s in stamps]
