"""Per-rotor actuation: QuadX mixer + rotor actuators -> body wrench.

JAX re-design of the vendored AirSim per-rotor pipeline, the fidelity level
above the plant's collective-thrust abstraction (``sim/plant.py``):

- **mixer**: (throttle, roll, pitch, yaw) -> 4 motor signals with the
  simple_flight saturation policy (``firmwares/simple_flight/firmware/
  Mixer.hpp:19-48``): below ``min_angling_throttle`` all motors get raw
  throttle; otherwise signals are sign-mixed per the QuadX table, shifted up
  by any undershoot below ``min_motor_output``, rescaled if the max exceeds
  ``max_motor_output``, and clipped.  Branchless via ``jnp.where``.
- **actuators**: each motor signal runs through a first-order low-pass
  (``common/FirstOrderFilter.hpp`` semantics, time constant
  ``control_signal_filter_tc``) and produces thrust along body z plus a
  drag torque signed by turning direction
  (``vehicles/multirotor/RotorActuator.hpp:108-129``:
  thrust = signal * max_thrust, torque = signal * max_torque * direction).
- **geometry**: the usual QuadX pattern (``MultiRotorParams.hpp:101-141``):
  front-right/rear-left spin CCW, front-left/rear-right CW; arm positions at
  45 deg.  The body wrench is the vertex-wrench sum the physics engine
  aggregates (``PhysicsBody`` vertices -> ``FastPhysicsEngine``).

Everything is a pure function of a small ``RotorState`` carry; batching over
scenarios is vmap, exactly like the rest of the plant.
"""

from __future__ import annotations

import math
from typing import NamedTuple

import jax
import jax.numpy as jnp

GRAVITY = 9.81

# QuadX sign table (Mixer.hpp:66-72): rows FRONT_R, REAR_L, FRONT_L, REAR_R;
# columns throttle, roll, pitch, yaw.
MIXER_QUADX = (
    (1.0, -1.0, 1.0, 1.0),
    (1.0, 1.0, -1.0, 1.0),
    (1.0, 1.0, 1.0, -1.0),
    (1.0, -1.0, -1.0, -1.0),
)

# Turning directions (MultiRotorParams.hpp:116-140): FRONT_R, REAR_L spin
# CCW (-1), FRONT_L, REAR_R spin CW (+1).  In the reference's NED frame +1
# yields clockwise torque; in our z-up world the reaction torque on the body
# is -direction about +z.
ROTOR_DIRECTIONS = (-1.0, -1.0, 1.0, 1.0)


class RotorParams(NamedTuple):
    """Quad geometry + per-rotor actuator constants."""

    max_thrust: jax.Array  # N per rotor at signal 1.0
    max_torque: jax.Array  # N m drag torque per rotor at signal 1.0
    filter_tc: jax.Array  # control-signal low-pass time constant [s]
    arm_length: jax.Array  # m, center to rotor
    rotor_z: jax.Array  # rotor plane offset above COG [m] (z-up)
    min_motor_output: jax.Array  # simple_flight Params.hpp motor block
    max_motor_output: jax.Array
    min_angling_throttle: jax.Array

    @staticmethod
    def default(
        mass: float = 1.5, hover_percentage: float = 0.30, dtype=jnp.float32
    ) -> "RotorParams":
        """Defaults matched to the collective plant: 4 rotors at hover
        throttle = ``hover_percentage`` carry ``mass * g`` (the approximate
        thrust model of ``ctrl_param_fpv_real.yaml``), so both fidelity
        levels share the same hover point.  Torque/thrust ratio and filter
        tc use the AirSim GWS 9X5 propeller constants
        (RotorParams.hpp:38-46: max_thrust 4.179 N, max_torque 0.0556 N m,
        tc 0.005 s)."""
        per_rotor = mass * GRAVITY / (4.0 * hover_percentage)
        torque_ratio = 0.055562 / 4.179446268
        return RotorParams(
            max_thrust=jnp.asarray(per_rotor, dtype=dtype),
            max_torque=jnp.asarray(per_rotor * torque_ratio, dtype=dtype),
            filter_tc=jnp.asarray(0.005, dtype=dtype),
            arm_length=jnp.asarray(0.2275, dtype=dtype),
            rotor_z=jnp.asarray(0.025, dtype=dtype),
            min_motor_output=jnp.asarray(0.0, dtype=dtype),
            max_motor_output=jnp.asarray(1.0, dtype=dtype),
            min_angling_throttle=jnp.asarray(0.05, dtype=dtype),
        )

    def positions(self, dtype=jnp.float32) -> jax.Array:
        """(4, 3) rotor positions in the body frame (x forward, y left,
        z up).  QuadX at 45 deg (MultiRotorParams.hpp:121-141 rotated by the
        quadx 45-deg yaw): FRONT_R, REAR_L, FRONT_L, REAR_R."""
        s = self.arm_length / math.sqrt(2.0)
        z = self.rotor_z
        return jnp.stack(
            [
                jnp.stack([s, -s, z]),
                jnp.stack([-s, s, z]),
                jnp.stack([s, s, z]),
                jnp.stack([-s, -s, z]),
            ]
        ).astype(dtype)


class RotorState(NamedTuple):
    filtered: jax.Array  # (4,) low-passed control signals


def rotor_init(dtype=jnp.float32) -> RotorState:
    return RotorState(filtered=jnp.zeros(4, dtype=dtype))


def mix_quadx(
    throttle: jax.Array,
    roll: jax.Array,
    pitch: jax.Array,
    yaw: jax.Array,
    p: RotorParams,
) -> jax.Array:
    """(4,) motor signals from the angle-mixer controls (Mixer.hpp:19-48)."""
    table = jnp.asarray(MIXER_QUADX, dtype=throttle.dtype)
    controls = jnp.stack([throttle, roll, pitch, yaw])
    # exact mix on the VPU (±1 weights; a bf16 MXU pass would round the
    # throttle inputs to 8-bit mantissas)
    m = (
        table[:, 0] * controls[0] + table[:, 1] * controls[1]
        + table[:, 2] * controls[2] + table[:, 3] * controls[3]
    )

    # shift up by the undershoot below min_motor_output
    undershoot = jnp.maximum(p.min_motor_output - jnp.min(m), 0.0)
    m = m + undershoot
    # rescale when the max exceeds max_motor_output (the reference compares
    # `scale > max_motor_output`, i.e. with max_motor_output = 1 it divides
    # exactly when some motor saturates)
    scale = jnp.max(m) / p.max_motor_output
    m = jnp.where(scale > p.max_motor_output, m / scale, m)
    m = jnp.clip(m, p.min_motor_output, p.max_motor_output)

    # below the angling threshold: raw throttle everywhere (no attitude
    # authority on the ground, Mixer.hpp:21-24)
    return jnp.where(throttle < p.min_angling_throttle, jnp.full_like(m, throttle), m)


def rotor_step(
    rs: RotorState,
    motor_signals: jax.Array,
    dt: jax.Array | float,
    p: RotorParams,
) -> tuple[RotorState, jax.Array, jax.Array]:
    """Advance the actuator filters one step and emit the body wrench.

    Returns (new state, force (3,) body frame, torque (3,) body frame).
    The first-order filter matches ``FirstOrderFilter.hpp``'s discrete
    update: output decays toward input with factor ``exp(-dt / tc)``.
    """
    dtype = rs.filtered.dtype
    alpha = jnp.exp(-jnp.asarray(dt, dtype) / p.filter_tc)
    filtered = alpha * rs.filtered + (1.0 - alpha) * jnp.clip(motor_signals, 0.0, 1.0)

    thrust = filtered * p.max_thrust  # (4,) along body +z
    dirs = jnp.asarray(ROTOR_DIRECTIONS, dtype=dtype)
    # reaction torque on the body opposes rotor spin: -direction about +z
    drag_torque = -dirs * filtered * p.max_torque

    force = jnp.stack(
        [jnp.zeros((), dtype), jnp.zeros((), dtype), jnp.sum(thrust)]
    )
    pos = p.positions(dtype)
    # r x F with F = thrust_i * e_z:  (y_i * F_i, -x_i * F_i, 0)
    tx = jnp.sum(pos[:, 1] * thrust)
    ty = -jnp.sum(pos[:, 0] * thrust)
    tz = jnp.sum(drag_torque)
    torque = jnp.stack([tx, ty, tz])
    return RotorState(filtered=filtered), force, torque
