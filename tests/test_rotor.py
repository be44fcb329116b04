"""Per-rotor actuation tests: QuadX mixer, actuator filters, rotor plant.

Semantics under test come from the vendored AirSim stack:
``firmwares/simple_flight/firmware/Mixer.hpp`` (mixer + saturation policy),
``common/FirstOrderFilter.hpp`` (signal filter), ``vehicles/multirotor/
RotorActuator.hpp`` + ``MultiRotorParams.hpp`` (thrust/torque, QuadX
geometry, turning directions).
"""

import jax.numpy as jnp
import numpy as np

from avoid_mpc_tpu.sim import SixDofParams
from avoid_mpc_tpu.sim.plant import (
    GRAVITY,
    sixdof_init,
    sixdof_rotor_init,
    sixdof_step,
    sixdof_step_rotor,
)
from avoid_mpc_tpu.sim.rotor import (
    MIXER_QUADX,
    ROTOR_DIRECTIONS,
    RotorParams,
    mix_quadx,
    rotor_init,
    rotor_step,
)

DT = jnp.float64
RP = RotorParams.default(dtype=DT)
PLANT = SixDofParams.default(dtype=DT)
QI = jnp.asarray([1.0, 0, 0, 0], dtype=DT)


def _mix_oracle(throttle, roll, pitch, yaw, rp):
    """Direct NumPy transcription of Mixer.hpp:19-48."""
    if throttle < float(rp.min_angling_throttle):
        return np.full(4, throttle)
    m = np.array(
        [
            throttle * t + roll * r + pitch * p + yaw * y
            for (t, r, p, y) in MIXER_QUADX
        ]
    )
    undershoot = float(rp.min_motor_output) - m.min()
    if undershoot > 0:
        m = m + undershoot
    scale = m.max() / float(rp.max_motor_output)
    if scale > float(rp.max_motor_output):
        m = m / scale
    return np.clip(m, float(rp.min_motor_output), float(rp.max_motor_output))


def test_mixer_matches_reference_oracle():
    rng = np.random.default_rng(3)
    for _ in range(50):
        throttle = float(rng.uniform(0, 1.2))
        roll, pitch, yaw = rng.uniform(-0.5, 0.5, size=3)
        got = mix_quadx(
            jnp.asarray(throttle, DT), jnp.asarray(roll, DT),
            jnp.asarray(pitch, DT), jnp.asarray(yaw, DT), RP,
        )
        want = _mix_oracle(throttle, roll, pitch, yaw, RP)
        np.testing.assert_allclose(np.asarray(got), want, atol=1e-12)


def test_mixer_low_throttle_passthrough():
    m = mix_quadx(jnp.asarray(0.01, DT), jnp.asarray(0.4, DT),
                  jnp.asarray(-0.4, DT), jnp.asarray(0.2, DT), RP)
    np.testing.assert_allclose(np.asarray(m), 0.01, atol=1e-12)


def test_mixer_undershoot_preserves_differences():
    # a large negative mix on one motor shifts all up, keeping deltas
    m = np.asarray(mix_quadx(jnp.asarray(0.1, DT), jnp.asarray(0.3, DT),
                             jnp.asarray(0.0, DT), jnp.asarray(0.0, DT), RP))
    assert m.min() >= 0.0
    # roll sign table: FRONT_R/REAR_R get -roll, REAR_L/FRONT_L get +roll
    np.testing.assert_allclose(m[1] - m[0], 0.6, atol=1e-12)
    np.testing.assert_allclose(m[2] - m[3], 0.6, atol=1e-12)


def test_filter_first_order_decay():
    rs = rotor_init(dtype=DT)
    tc, dt = float(RP.filter_tc), 0.005
    sig = jnp.ones(4, dtype=DT)
    rs, _, _ = rotor_step(rs, sig, dt, RP)
    expect = 1.0 - np.exp(-dt / tc)
    np.testing.assert_allclose(np.asarray(rs.filtered), expect, rtol=1e-9)
    # converges to the input
    for _ in range(2000):
        rs, _, _ = rotor_step(rs, sig, dt, RP)
    np.testing.assert_allclose(np.asarray(rs.filtered), 1.0, atol=1e-6)


def test_hover_wrench():
    # filtered signals at the hover point -> net force = m g, zero torque
    rs = rotor_init(dtype=DT)
    hover = float(PLANT.hover_percentage)
    sig = jnp.full(4, hover, dtype=DT)
    for _ in range(3000):
        rs, force, torque = rotor_step(rs, sig, 0.005, RP)
    np.testing.assert_allclose(float(force[2]), 1.5 * GRAVITY, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(torque), 0.0, atol=1e-9)


def test_yaw_torque_sign():
    # positive yaw command spins up the CW pair (directions +1) -> their
    # reaction torque on the body is negative about +z... and vice versa.
    rs = rotor_init(dtype=DT)
    m = mix_quadx(jnp.asarray(0.5, DT), jnp.asarray(0.0, DT),
                  jnp.asarray(0.0, DT), jnp.asarray(0.2, DT), RP)
    for _ in range(200):
        rs, _, torque = rotor_step(rs, m, 0.005, RP)
    # motors 0,1 (CCW, direction -1) got +yaw in the table -> spin faster;
    # body reaction from CCW rotors is +z
    assert float(torque[2]) > 0
    # roll/pitch stay balanced
    np.testing.assert_allclose(np.asarray(torque[:2]), 0.0, atol=1e-9)


def test_roll_torque_sign():
    # positive roll in the sign table boosts REAR_L/FRONT_L (left side,
    # body +y) -> torque about +x is positive (right-hand rule: +y thrust up
    # rolls the body toward -y... check against the cross product directly)
    rs = rotor_init(dtype=DT)
    m = mix_quadx(jnp.asarray(0.5, DT), jnp.asarray(0.2, DT),
                  jnp.asarray(0.0, DT), jnp.asarray(0.0, DT), RP)
    for _ in range(200):
        rs, _, torque = rotor_step(rs, m, 0.005, RP)
    pos = np.asarray(RP.positions(DT))
    thrust = np.asarray(rs.filtered) * float(RP.max_thrust)
    want_tx = float(np.sum(pos[:, 1] * thrust))
    np.testing.assert_allclose(float(torque[0]), want_tx, rtol=1e-9)
    assert abs(float(torque[0])) > 1e-3  # real authority


def test_rotor_plant_attitude_tracking_matches_collective():
    """The per-rotor plant must fly: from hover, track a small attitude step
    comparably to the collective plant (same cascade, different actuation)."""
    import math

    from avoid_mpc_tpu.utils.quaternion import quat_to_rotmat

    tilt = 0.1
    q_des = jnp.asarray(
        [math.cos(tilt / 2), math.sin(tilt / 2), 0.0, 0.0], dtype=DT
    )
    hover = PLANT.hover_percentage

    sc = sixdof_init(jnp.asarray([0, 0, 2.0], DT), dtype=DT)
    sc = sc._replace(grounded=jnp.asarray(False))
    sr = sixdof_rotor_init(jnp.asarray([0, 0, 2.0], DT), dtype=DT)
    sr = sr._replace(body=sr.body._replace(grounded=jnp.asarray(False)))
    # pre-spin the actuators to hover so both start force-balanced
    sr = sr._replace(rotors=sr.rotors._replace(filtered=jnp.full(4, hover, DT)))

    for _ in range(50):
        sc = sixdof_step(sc, q_des, hover, 0.02, PLANT)
        sr = sixdof_step_rotor(sr, q_des, hover, 0.02, PLANT, RP)

    def roll_of(q):
        R = np.asarray(quat_to_rotmat(q))
        return math.atan2(R[2, 1], R[2, 2])

    assert abs(roll_of(sc.q) - tilt) < 0.03
    assert abs(roll_of(sr.body.q) - tilt) < 0.03


def test_rotor_plant_ground_lock():
    s = sixdof_rotor_init(jnp.zeros(3, dtype=DT), dtype=DT)
    s2 = sixdof_step_rotor(s, QI, jnp.asarray(0.1, DT), 0.02, PLANT, RP)
    assert bool(s2.body.grounded)
    np.testing.assert_allclose(np.asarray(s2.body.p), 0.0, atol=1e-12)
    # sustained above-hover throttle lifts off once the filters spin up
    for _ in range(10):
        s = sixdof_step_rotor(s, QI, jnp.asarray(0.6, DT), 0.02, PLANT, RP)
    assert not bool(s.body.grounded)
    assert float(s.body.v[2]) > 0


def test_directions_table():
    # FRONT_R/REAR_L CCW, FRONT_L/REAR_R CW (MultiRotorParams.hpp:116-140)
    assert ROTOR_DIRECTIONS == (-1.0, -1.0, 1.0, 1.0)
