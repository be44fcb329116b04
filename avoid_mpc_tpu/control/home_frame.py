"""Home-frame latch — local-odometry republishing for real-vehicle odometry.

Re-design of the reference ``Odom_Data_t::feed`` home-frame logic
(``betaflight_ctrl/src/input.cpp:15-104``): the FIRST odometry fix latches a
"home" frame — the fix's position and the *yaw-only* part of its attitude —
and, unless ``use_global_odom`` is set, every subsequent odometry sample is
re-expressed relative to home (``Global2Local``, input.cpp:104-109):

    p' = R_home^-1 (p - p_home)      q' = q_home^-1 * q
    v' = R_home^-1 v                 w' = R_home^-1 w

so the flight stack always sees a world frame that starts at the arming
point with zero yaw, regardless of where the GPS/VIO origin is.  Sim worlds
share an origin and skip this; the real-vehicle bridge
(``runtime/mavlink.cpp`` consumers) applies it to incoming odometry.

Pure-functional: the latch is a tiny NamedTuple carried by the host loop
(jittable; ``latched`` gates via ``where``, no Python branching).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from avoid_mpc_tpu.utils.quaternion import (
    quat_conjugate,
    quat_multiply,
    quat_rotate,
    yaw_from_quat,
)


class HomeFrame(NamedTuple):
    """Latched home pose (yaw-only attitude, input.cpp:25-32)."""

    p_home: jax.Array  # (3,)
    q_home: jax.Array  # (4,) wxyz, pure-yaw rotation
    latched: jax.Array  # bool scalar

    @staticmethod
    def unset(dtype=jnp.float32) -> "HomeFrame":
        return HomeFrame(
            p_home=jnp.zeros(3, dtype=dtype),
            q_home=jnp.asarray([1.0, 0.0, 0.0, 0.0], dtype=dtype),
            latched=jnp.asarray(False),
        )


def _yaw_only(q: jax.Array) -> jax.Array:
    """The pure-yaw quaternion [cos(yaw/2), 0, 0, sin(yaw/2)]
    (input.cpp:26-31)."""
    half = 0.5 * yaw_from_quat(q)
    z = jnp.zeros_like(half)
    return jnp.stack([jnp.cos(half), z, z, jnp.sin(half)])


def home_latch(home: HomeFrame, p: jax.Array, q: jax.Array) -> HomeFrame:
    """Latch the home frame on the first fix; later fixes are no-ops
    (the ``recived`` guard, input.cpp:22-33)."""
    take = ~home.latched
    return HomeFrame(
        p_home=jnp.where(take, p, home.p_home),
        q_home=jnp.where(take, _yaw_only(q), home.q_home),
        latched=jnp.asarray(True) | home.latched,
    )


def global_to_local(
    home: HomeFrame, p: jax.Array, q: jax.Array, v: jax.Array, w: jax.Array
):
    """``Global2Local`` (input.cpp:104-109).  Identity until latched."""
    qi = quat_conjugate(home.q_home)  # unit quaternion: conjugate == inverse
    p_l = quat_rotate(qi, p - home.p_home)
    q_l = quat_multiply(qi, q)
    v_l = quat_rotate(qi, v)
    w_l = quat_rotate(qi, w)
    lat = home.latched
    return (
        jnp.where(lat, p_l, p),
        jnp.where(lat, q_l, q),
        jnp.where(lat, v_l, v),
        jnp.where(lat, w_l, w),
    )


def feed_odom(
    home: HomeFrame,
    p: jax.Array,
    q: jax.Array,
    v: jax.Array,
    w: jax.Array,
    use_global_odom: bool = False,
):
    """One odometry sample through the latch: returns (home', p, q, v, w) —
    local-frame odometry unless ``use_global_odom`` (input.cpp:62-67)."""
    home = home_latch(home, p, q)
    if use_global_odom:
        return home, p, q, v, w
    return (home, *global_to_local(home, p, q, v, w))
