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
