"""Rotating-lidar sensor model vs the analytic field (LidarSimple parity).

Reference: AirLib/include/sensors/lidar/LidarSimple.hpp +
LidarSimpleParams.hpp (VLP-16 defaults; scan pattern per AirSim's
UnrealLidarSensor: points_per_second/update_frequency rays split across
channels, head sweeping rotations_per_second*360/update_frequency deg).
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from avoid_mpc_tpu.config import LidarConfig, load_config
from avoid_mpc_tpu.sim.sensors import ObstacleField, lidar_scan

CFG = LidarConfig(
    number_of_channels=8,
    range=30.0,
    points_per_second=8000,
    rotations_per_second=10,
    update_frequency=10.0,  # 1 full rotation per update, 800 rays
    vertical_fov_upper=-5.0,
    vertical_fov_lower=-45.0,
)


def one_cylinder_field(dtype=jnp.float64):
    f = ObstacleField.empty(dtype=dtype)
    return f._replace(
        cyl_xy=f.cyl_xy.at[0].set(jnp.asarray([5.0, 0.0], dtype)),
        cyl_r=f.cyl_r.at[0].set(0.5),
        cyl_mask=f.cyl_mask.at[0].set(True),
    )


def body_at(p, dtype=jnp.float64):
    return jnp.eye(4, dtype=dtype).at[:3, 3].set(jnp.asarray(p, dtype))


def test_lidar_defaults_match_reference_params():
    """LidarSimpleParams defaults (VLP-16): 16 ch, 100 m, 100k pts/s,
    10 rot/s, vFOV [-45,-15], mounted 1 m above the body."""
    d = LidarConfig()
    assert d.number_of_channels == 16
    assert d.range == 100.0
    assert d.points_per_second == 100000
    assert d.rotations_per_second == 10
    assert (d.vertical_fov_lower, d.vertical_fov_upper) == (-45.0, -15.0)
    assert d.rel_position == (0.0, 0.0, 1.0)
    assert d.points_per_scan == 10000
    assert d.points_per_channel == 625
    # and the default EngineConfig yaml round-trips the block
    cfg = load_config()
    assert cfg.lidar.number_of_channels == 16


def test_lidar_geometry_ground_and_cylinder():
    """Every returned point lies on a field surface (ground z=0 or the
    cylinder wall) at its reported range; rays beyond range are masked."""
    field = one_cylinder_field()
    Twb = body_at([0.0, 0.0, 2.0])
    scan = jax.jit(lambda T: lidar_scan(T, field, CFG, jnp.asarray(0.0, jnp.float64)))(Twb)
    pts = np.asarray(scan.points).reshape(-1, 3)
    mask = np.asarray(scan.mask).ravel()
    rng = np.asarray(scan.ranges).ravel()
    assert mask.any()
    hit = pts[mask]
    on_ground = np.abs(hit[:, 2]) < 1e-6
    r_cyl = np.sqrt((hit[:, 0] - 5.0) ** 2 + hit[:, 1] ** 2)
    on_cyl = np.abs(r_cyl - 0.5) < 1e-6
    assert (on_ground | on_cyl).all()
    assert on_cyl.any() and on_ground.any()
    # reported range consistent with the sensor origin (1 m above body)
    origin = np.array([0.0, 0.0, 3.0])
    np.testing.assert_allclose(
        np.linalg.norm(hit - origin, axis=1), rng[mask], rtol=1e-9
    )
    assert (rng[mask] <= CFG.range + 1e-9).all()
    assert np.isinf(rng[~mask]).all()


def test_lidar_channel_elevations():
    """Each channel's rays leave at its assigned elevation angle."""
    field = one_cylinder_field()
    Twb = body_at([0.0, 0.0, 10.0])
    scan = lidar_scan(Twb, field, CFG, jnp.asarray(0.0, jnp.float64))
    origin = np.array([0.0, 0.0, 11.0])
    elevs = np.linspace(CFG.vertical_fov_lower, CFG.vertical_fov_upper,
                        CFG.number_of_channels)
    pts = np.asarray(scan.points)
    mask = np.asarray(scan.mask)
    for c in range(CFG.number_of_channels):
        if not mask[c].any():
            continue
        v = pts[c][mask[c]] - origin
        got = np.degrees(np.arctan2(v[:, 2], np.linalg.norm(v[:, 0:2], axis=1)))
        np.testing.assert_allclose(got, elevs[c], atol=1e-6)


def test_lidar_range_clamp_and_empty_field():
    """Short range drops far hits; an empty field above ground sees only
    ground within range."""
    field = ObstacleField.empty(dtype=jnp.float64)
    short = dataclasses.replace(CFG, range=3.0)
    Twb = body_at([0.0, 0.0, 2.0])  # sensor at z=3: steep rays reach ground
    scan = lidar_scan(Twb, field, short, jnp.asarray(0.0, jnp.float64))
    rng = np.asarray(scan.ranges)
    mask = np.asarray(scan.mask)
    # -45 deg channel: ground at 3/sin(45) ~ 4.24 m > 3 -> masked
    assert not mask[0].any()
    assert (rng[mask] <= 3.0 + 1e-9).all()


def test_lidar_azimuth_carry_and_sweep():
    """The head phase advances rotations_per_second*360/update_frequency
    degrees per update (mod the horizontal FOV span)."""
    field = one_cylinder_field()
    cfg = dataclasses.replace(CFG, rotations_per_second=5, update_frequency=20.0,
                              points_per_second=8000)
    # sweep = 5*360/20 = 90 deg per update
    Twb = body_at([0.0, 0.0, 2.0])
    az = jnp.asarray(10.0, jnp.float64)
    s1 = lidar_scan(Twb, field, cfg, az)
    np.testing.assert_allclose(float(s1.azimuth_deg), 100.0, atol=1e-9)
    s2 = lidar_scan(Twb, field, cfg, s1.azimuth_deg)
    np.testing.assert_allclose(float(s2.azimuth_deg), 190.0, atol=1e-9)


def test_lidar_feeds_rolling_map():
    """The scan's (points, mask) drop into the rolling map like a depth
    frame (flattened to the map's per-frame capacity)."""
    from avoid_mpc_tpu.mapping import MapShape, map_add_frame, map_init, map_query

    field = one_cylinder_field(jnp.float32)
    cfg = dataclasses.replace(CFG, number_of_channels=4, points_per_second=1024,
                              update_frequency=4.0)  # 256 rays
    Twb = body_at([3.0, 0.0, 1.0], jnp.float32)
    scan = lidar_scan(Twb, field, cfg, jnp.asarray(0.0, jnp.float32))
    pts = scan.points.reshape(-1, 3)
    mask = scan.mask.reshape(-1)
    m = map_init(MapShape(n_frames=2, points_per_frame=pts.shape[0]), dtype=jnp.float32)
    m = map_add_frame(m, pts, mask, jnp.zeros_like(pts), jnp.zeros_like(mask),
                      Twb)
    d, near = map_query(m, jnp.asarray([[4.4, 0.0, 0.5]], jnp.float32), k=1)
    # nearest mapped lidar return is on the cylinder wall near the query
    assert float(d[0, 0]) < 0.5
