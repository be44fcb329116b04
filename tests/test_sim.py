"""6-DoF plant, sensor, and scenario tests."""

import jax
import jax.numpy as jnp
import numpy as np

from avoid_mpc_tpu.config import PerceptionConfig
from avoid_mpc_tpu.control import ControllerParams, acc2quaternion
from avoid_mpc_tpu.sim import (
    ObstacleField,
    ScenarioConfig,
    SixDofParams,
    random_forest,
    random_start_states,
    render_depth,
    sixdof_init,
    sixdof_step,
)
from avoid_mpc_tpu.sim.plant import GRAVITY, sixdof_to_mpc_state
from avoid_mpc_tpu.sim.scenarios import forest_point_cloud
from avoid_mpc_tpu.sim.sensors import ImuParams, imu_measure

DT = jnp.float64
PLANT = SixDofParams.default(dtype=DT)
QI = jnp.asarray([1.0, 0, 0, 0], dtype=DT)
PCFG = PerceptionConfig()


def test_grounded_until_liftoff_thrust():
    s = sixdof_init(jnp.zeros(3, dtype=DT), dtype=DT)
    s2 = sixdof_step(s, QI, jnp.asarray(0.1, DT), 0.02, PLANT)
    assert bool(s2.grounded)
    np.testing.assert_allclose(np.asarray(s2.p), 0.0, atol=1e-12)
    # above hover thrust -> lifts off
    s3 = sixdof_step(s, QI, jnp.asarray(0.5, DT), 0.02, PLANT)
    assert not bool(s3.grounded)
    assert float(s3.v[2]) > 0


def test_hover_equilibrium():
    """At exactly hover thrust with level attitude the plant must not move."""
    s = sixdof_init(jnp.asarray([0, 0, 2.0], dtype=DT), dtype=DT)._replace(
        grounded=jnp.asarray(False)
    )
    hover = PLANT.hover_percentage
    for _ in range(50):
        s = sixdof_step(s, QI, hover, 0.02, PLANT)
    np.testing.assert_allclose(np.asarray(s.p), [0, 0, 2.0], atol=1e-9)
    np.testing.assert_allclose(np.asarray(s.v), 0.0, atol=1e-9)


def test_free_fall():
    s = sixdof_init(jnp.asarray([0, 0, 100.0], dtype=DT), dtype=DT)._replace(
        grounded=jnp.asarray(False)
    )
    t = 1.0
    n = 50
    for _ in range(n):
        s = sixdof_step(s, QI, jnp.asarray(0.0, DT), t / n, PLANT)
    # the Verlet carry starts at a_lin=0, giving the scheme's one-substep
    # startup offset of 0.5*g*h (mirrors the reference integrator's
    # first-step behavior) — tolerance covers it
    np.testing.assert_allclose(
        float(s.p[2]), 100.0 - 0.5 * GRAVITY * t * t, atol=0.03
    )
    np.testing.assert_allclose(float(s.v[2]), -GRAVITY * t, atol=0.03)


def test_attitude_tracking():
    """Commanding a tilt: the cascade must converge the attitude and the
    plant must accelerate in the tilt direction."""
    s = sixdof_init(jnp.asarray([0, 0, 2.0], dtype=DT), dtype=DT)._replace(
        grounded=jnp.asarray(False)
    )
    acc_cmd = jnp.asarray([2.0, 0.0, GRAVITY], dtype=DT)
    q_des = acc2quaternion(acc_cmd, jnp.asarray(0.0, DT))
    thrust = float(jnp.linalg.norm(acc_cmd)) * float(PLANT.mass) / float(PLANT.max_thrust)
    for _ in range(100):  # 2 seconds
        s = sixdof_step(s, q_des, jnp.asarray(thrust, DT), 0.02, PLANT)
    # attitude converged to the command
    dot = abs(float(jnp.sum(s.q * q_des)))
    assert dot > 0.999, dot
    # accelerating along +x
    assert float(s.v[0]) > 1.0
    assert abs(float(s.v[1])) < 0.2


def test_mpc_state_projection():
    s = sixdof_init(jnp.asarray([1, 2, 3.0], dtype=DT), yaw0=jnp.asarray(0.5, DT), dtype=DT)
    x = sixdof_to_mpc_state(s)
    np.testing.assert_allclose(np.asarray(x[:3]), [1, 2, 3])
    np.testing.assert_allclose(float(x[3]), 0.5, atol=1e-9)


def test_render_depth_wall_and_ground():
    field = ObstacleField.empty(dtype=DT)
    field = field._replace(
        cyl_xy=field.cyl_xy.at[0].set(jnp.asarray([5.0, 0.0], DT)),
        cyl_r=field.cyl_r.at[0].set(0.5),
        cyl_mask=field.cyl_mask.at[0].set(True),
    )
    # camera at origin 1.5m up, looking +x (camera z forward through Tbc-like R)
    Twc = jnp.asarray(
        [[0, 0, 1, 0], [-1, 0, 0, 0], [0, -1, 0, 1.5], [0, 0, 0, 1.0]], dtype=DT
    )
    depth = render_depth(Twc, field, PCFG, height=48, width=64)
    d = np.asarray(depth)
    # center pixel: cylinder front face at 4.5m
    np.testing.assert_allclose(d[24, 32], 4.5, atol=1e-6)
    # corner ray looks up-left past the (infinite-height) cylinder -> sky
    assert d[0, 0] >= 2 * PCFG.depth_max - 1
    # bottom looks down at the ground plane: depth = 1.5 / tan(angle) scaled;
    # just check it is finite and between 1.5 and depth_max
    assert 1.4 < d[47, 32] < PCFG.depth_max


def test_render_depth_noise():
    field = ObstacleField.empty(dtype=DT)
    Twc = jnp.eye(4, dtype=DT).at[2, 3].set(1.5)
    d1 = render_depth(Twc, field, PCFG, height=24, width=32, key=jax.random.PRNGKey(0))
    d2 = render_depth(Twc, field, PCFG, height=24, width=32)
    resid = np.asarray(d1 - d2)
    assert 0.01 < resid.std() < 0.04  # sigma = 0.02


def test_random_forest_properties():
    cfg = ScenarioConfig()
    f = random_forest(jax.random.PRNGKey(1), cfg, dtype=DT)
    xy = np.asarray(f.cyl_xy)
    mask = np.asarray(f.cyl_mask)
    r = np.asarray(f.cyl_r)
    assert mask.sum() > 10
    assert (r >= cfg.radius_range[0]).all() and (r <= cfg.radius_range[1]).all()
    # start clearing respected for unmasked cylinders
    assert (np.linalg.norm(xy[mask], axis=1) > cfg.min_clear_radius).all()
    # different keys -> different forests
    f2 = random_forest(jax.random.PRNGKey(2), cfg, dtype=DT)
    assert not np.allclose(np.asarray(f2.cyl_xy), xy)


def test_random_start_jitter_bounded():
    cfg = ScenarioConfig()
    starts = jax.vmap(lambda k: random_start_states(k, cfg, dtype=DT))(
        jax.random.split(jax.random.PRNGKey(0), 64)
    )
    s = np.asarray(starts)
    assert (np.abs(s[:, 0:2]) <= cfg.start_xy_jitter).all()
    assert (s[:, 3:] == 0).all()


def test_forest_point_cloud_on_surfaces():
    cfg = ScenarioConfig()
    f = random_forest(jax.random.PRNGKey(3), cfg, dtype=DT)
    pts, mask = forest_point_cloud(f, 512, jax.random.PRNGKey(4), dtype=DT)
    pts, mask = np.asarray(pts), np.asarray(mask)
    xy = np.asarray(f.cyl_xy)
    r = np.asarray(f.cyl_r)
    # every valid point lies on some cylinder surface
    d = np.abs(
        np.linalg.norm(pts[mask][:, None, 0:2] - xy[None], axis=-1) - r[None]
    ).min(axis=1)
    assert d.max() < 1e-6


def test_imu_measurement():
    p = ImuParams.default(dtype=DT)._replace(
        accel_noise=jnp.asarray(0.0, DT), gyro_noise=jnp.asarray(0.0, DT),
        accel_bias_walk=jnp.asarray(0.0, DT), gyro_bias_walk=jnp.asarray(0.0, DT),
    )
    # hovering level: specific force = +g on body z
    accel, gyro, bias = imu_measure(
        QI, jnp.zeros(3, DT), jnp.zeros(3, DT), jnp.zeros(6, DT),
        jnp.asarray(0.01, DT), p, jax.random.PRNGKey(0),
    )
    np.testing.assert_allclose(np.asarray(accel), [0, 0, GRAVITY], atol=1e-9)
    np.testing.assert_allclose(np.asarray(gyro), 0.0, atol=1e-12)
