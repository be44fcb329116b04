"""Sensor models: analytic depth-camera raycaster + IMU.

Replaces the Unreal/AirSim rendering + sensor stack for closed-loop
evaluation:

- **depth camera**: planar-depth raycast against an analytic obstacle field
  (vertical cylinders + spheres + ground plane) — the synthetic stand-in for
  ``simGetImages`` DepthPlanar (``airsim_ros_wrapper.cpp:1233-1285``).
  Gaussian noise with sigma ``depth_std_dev`` is added exactly like the
  bridge does (``cv::randn``, :1274-1277, launch value 0.02).
- **IMU**: body-frame specific force + gyro with bias random walk and white
  noise — the ``ImuSimple`` model (``AirLib/include/sensors/imu/
  ImuSimple.hpp``) reduced to its closed-loop-relevant parts.

Rays are evaluated as one (H*W, K) batch per frame — pure VPU work that
batches over scenarios with vmap.  Planar depth = distance along the camera
forward axis (AirSim DepthPlanar convention).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from avoid_mpc_tpu.config import PerceptionConfig

GRAVITY = 9.81


class ObstacleField(NamedTuple):
    """Analytic obstacle primitives. Fixed K per kind with validity masks."""

    cyl_xy: jax.Array  # (Kc, 2) vertical cylinder axis positions
    cyl_r: jax.Array  # (Kc,) radii
    cyl_mask: jax.Array  # (Kc,) bool
    sph_c: jax.Array  # (Ks, 3) sphere centers
    sph_r: jax.Array  # (Ks,)
    sph_mask: jax.Array  # (Ks,)

    @staticmethod
    def empty(n_cyl: int = 32, n_sph: int = 8, dtype=jnp.float32) -> "ObstacleField":
        return ObstacleField(
            cyl_xy=jnp.zeros((n_cyl, 2), dtype=dtype),
            cyl_r=jnp.ones(n_cyl, dtype=dtype),
            cyl_mask=jnp.zeros(n_cyl, dtype=bool),
            sph_c=jnp.zeros((n_sph, 3), dtype=dtype),
            sph_r=jnp.ones(n_sph, dtype=dtype),
            sph_mask=jnp.zeros(n_sph, dtype=bool),
        )


def _ray_cylinder(o: jax.Array, d: jax.Array, cxy: jax.Array, r: jax.Array):
    """Smallest positive t with |(o + t d)_xy - c| = r. (R,1) vs (K,)."""
    oxy = o[0:2]
    dxy = d[..., 0:2]  # (R,2)
    a = jnp.sum(dxy * dxy, axis=-1)[:, None]  # (R,1)
    fo = oxy[None, :] - cxy  # (K,2)
    # fo holds world-scale offsets (~100 m): a dot product here takes the
    # default bf16 MXU pass and puts ~0.2 m of error into the intersection t
    # (CLAUDE.md rule 1).  Written as broadcast outer products the sum stays
    # on the VPU in full f32 at the same FLOP count (a HIGHEST-precision dot
    # costs ~6x here — measured +10 ms on the 307k-ray tick).
    b2 = 2.0 * (
        dxy[:, 0:1] * fo[None, :, 0] + dxy[:, 1:2] * fo[None, :, 1]
    )  # (R,K)
    c = jnp.sum(fo * fo, axis=-1)[None, :] - (r**2)[None, :]  # (1,K)->(R,K)
    disc = b2 * b2 - 4.0 * a * c
    sq = jnp.sqrt(jnp.maximum(disc, 0.0))
    t0 = (-b2 - sq) / jnp.maximum(2.0 * a, 1e-12)
    t1 = (-b2 + sq) / jnp.maximum(2.0 * a, 1e-12)
    t = jnp.where(t0 > 1e-4, t0, t1)
    hit = (disc > 0.0) & (t > 1e-4)
    return jnp.where(hit, t, jnp.inf)


def _ray_sphere(o: jax.Array, d: jax.Array, c: jax.Array, r: jax.Array):
    f = o[None, :] - c  # (K,3)
    # broadcast outer products: exact f32 on the VPU (see _ray_cylinder)
    b2 = 2.0 * (
        d[:, 0:1] * f[None, :, 0]
        + d[:, 1:2] * f[None, :, 1]
        + d[:, 2:3] * f[None, :, 2]
    )  # (R,K)
    cc = jnp.sum(f * f, axis=-1)[None, :] - (r**2)[None, :]
    disc = b2 * b2 - 4.0 * cc
    sq = jnp.sqrt(jnp.maximum(disc, 0.0))
    t0 = (-b2 - sq) / 2.0
    t1 = (-b2 + sq) / 2.0
    t = jnp.where(t0 > 1e-4, t0, t1)
    hit = (disc > 0.0) & (t > 1e-4)
    return jnp.where(hit, t, jnp.inf)


def render_depth(
    Twc: jax.Array,
    field: ObstacleField,
    pcfg: PerceptionConfig,
    height: int | None = None,
    width: int | None = None,
    key: jax.Array | None = None,
) -> jax.Array:
    """Render a planar-depth image (h, w) from camera pose Twc (4,4).

    Camera convention: x right, y down, z forward (the pinhole model the map
    back-projects with, FrameKDMap.cpp:131-138) — so this output feeds
    ``ops.depth.process_depth_frame`` directly.  When ``key`` is given,
    Gaussian noise sigma=``depth_std_dev`` is added (bridge parity).
    """
    h = height or pcfg.height
    w = width or pcfg.width
    dtype = Twc.dtype
    scale_u = pcfg.width / w
    scale_v = pcfg.height / h
    fx, fy = pcfg.fx / scale_u, pcfg.fy / scale_v
    cx, cy = pcfg.cx / scale_u, pcfg.cy / scale_v

    u = jnp.arange(w, dtype=dtype)[None, :]
    v = jnp.arange(h, dtype=dtype)[:, None]
    dirs_cam = jnp.stack(
        [
            jnp.broadcast_to((u - cx) / fx, (h, w)),
            jnp.broadcast_to((v - cy) / fy, (h, w)),
            jnp.ones((h, w), dtype=dtype),
        ],
        axis=-1,
    ).reshape(-1, 3)  # (R,3), z = forward, planar depth = t (unit-z rays)

    R = Twc[:3, :3]
    o = Twc[:3, 3]
    # exact ray directions without the MXU: per-column FMA chains (VPU f32)
    dirs_world = jnp.stack(
        [
            dirs_cam[:, 0] * R[i, 0]
            + dirs_cam[:, 1] * R[i, 1]
            + dirs_cam[:, 2] * R[i, 2]
            for i in range(3)
        ],
        axis=-1,
    )  # (R,3)

    t_cyl = _ray_cylinder(o, dirs_world, field.cyl_xy, field.cyl_r)
    t_cyl = jnp.where(field.cyl_mask[None, :], t_cyl, jnp.inf)
    t_sph = _ray_sphere(o, dirs_world, field.sph_c, field.sph_r)
    t_sph = jnp.where(field.sph_mask[None, :], t_sph, jnp.inf)

    # ground plane z=0
    dz = dirs_world[:, 2]
    t_gnd = jnp.where(dz < -1e-6, -o[2] / dz, jnp.inf)

    t = jnp.minimum(jnp.minimum(t_cyl.min(axis=1), t_sph.min(axis=1)), t_gnd)
    # planar depth: rays have unit z in camera frame, so depth == t
    depth = jnp.where(jnp.isfinite(t), t, 2.0 * pcfg.depth_max).reshape(h, w)
    if key is not None:
        depth = depth + pcfg.depth_std_dev * jax.random.normal(key, depth.shape, dtype)
    return depth


class CameraRig(NamedTuple):
    """Extrinsics of the declared non-front camera streams.

    The reference bridge publishes three image loops: RGBD (front_center),
    stereo (front_left/front_right) and bottom (bottom_center)
    (``airsim_ros_wrapper.cpp:1129-1231``); their mounting poses come from
    the AirSim ``settings.json`` (not in-repo).  Defaults: a symmetric
    stereo pair of ``baseline`` meters about the front camera, and a nadir
    bottom camera (image-right = body-right, z looking straight down).
    """

    T_b_left: jax.Array  # (4,4) body->front_left camera
    T_b_right: jax.Array  # (4,4) body->front_right camera
    T_b_bottom: jax.Array  # (4,4) body->bottom_center camera

    @staticmethod
    def default(Tbc, baseline: float = 0.1, dtype=jnp.float32) -> "CameraRig":
        Tbc = jnp.asarray(Tbc, dtype=dtype)
        # front camera's image-right axis is -y_body (Tbc col 0), so the
        # LEFT camera sits at +y_body (body y points left)
        left = Tbc.at[1, 3].add(0.5 * baseline)
        right = Tbc.at[1, 3].add(-0.5 * baseline)
        # nadir: x_cam (image right) = -y_body = body-right,
        # y_cam (image down) = -x_body, z_cam (view) = -z_body (down);
        # right-handed (x cross y = z), mounted 3 cm below the body origin
        bottom = jnp.asarray(
            [
                [0.0, -1.0, 0.0, 0.0],
                [-1.0, 0.0, 0.0, 0.0],
                [0.0, 0.0, -1.0, -0.03],
                [0.0, 0.0, 0.0, 1.0],
            ],
            dtype=dtype,
        )
        return CameraRig(T_b_left=left, T_b_right=right, T_b_bottom=bottom)


class RigCapture(NamedTuple):
    """Depth frames of the stereo + bottom streams for one tick."""

    left: jax.Array  # (h, w)
    right: jax.Array  # (h, w)
    bottom: jax.Array  # (h, w)


def render_rig(
    Twb: jax.Array,
    rig: CameraRig,
    field: ObstacleField,
    pcfg: PerceptionConfig,
    height: int | None = None,
    width: int | None = None,
    key: jax.Array | None = None,
) -> RigCapture:
    """Render the stereo pair + bottom camera (planar depth, same camera
    model and noise treatment as the front stream) — the remaining declared
    sensor surface of the bridge (``airsim_ros_wrapper.cpp:1170-1231``)."""
    keys = (None, None, None) if key is None else tuple(jax.random.split(key, 3))
    from avoid_mpc_tpu.utils.quaternion import compose_tf

    poses = [  # exact f32 pose compose (world-scale translation, rule 1)
        compose_tf(Twb, T) for T in (rig.T_b_left, rig.T_b_right, rig.T_b_bottom)
    ]
    frames = [
        render_depth(Twc, field, pcfg, height, width, key=k)
        for Twc, k in zip(poses, keys)
    ]
    return RigCapture(*frames)


class ImuParams(NamedTuple):
    accel_noise: jax.Array  # white noise sigma [m/s^2]
    gyro_noise: jax.Array  # [rad/s]
    accel_bias_walk: jax.Array  # bias random-walk sigma per sqrt(s)
    gyro_bias_walk: jax.Array

    @staticmethod
    def default(dtype=jnp.float32) -> "ImuParams":
        # magnitudes from ImuSimple.hpp defaults, rounded
        return ImuParams(
            accel_noise=jnp.asarray(0.05, dtype=dtype),
            gyro_noise=jnp.asarray(0.005, dtype=dtype),
            accel_bias_walk=jnp.asarray(0.001, dtype=dtype),
            gyro_bias_walk=jnp.asarray(0.0001, dtype=dtype),
        )


def imu_measure(
    q: jax.Array,
    a_world: jax.Array,
    w_body: jax.Array,
    bias: jax.Array,  # (6,) accel+gyro bias state
    dt: jax.Array,
    params: ImuParams,
    key: jax.Array,
):
    """One IMU sample: specific force f_b = R^T (a + g e_z), gyro = w, plus
    bias random walk + white noise (ImuSimple semantics). Returns
    (accel_meas, gyro_meas, new_bias)."""
    from avoid_mpc_tpu.utils.quaternion import quat_to_rotmat

    k1, k2, k3 = jax.random.split(key, 3)
    dtype = a_world.dtype
    g = jnp.asarray([0.0, 0.0, GRAVITY], dtype=dtype)
    # exact specific force: elementwise R.T v on the VPU (no bf16 MXU pass)
    f_body = jnp.sum(quat_to_rotmat(q) * (a_world + g)[:, None], axis=0)
    sq = jnp.sqrt(dt)
    bias = bias + jnp.concatenate(
        [
            params.accel_bias_walk * sq * jax.random.normal(k1, (3,), dtype),
            params.gyro_bias_walk * sq * jax.random.normal(k2, (3,), dtype),
        ]
    )
    noise = jax.random.normal(k3, (6,), dtype)
    accel = f_body + bias[:3] + params.accel_noise * noise[:3]
    gyro = w_body + bias[3:] + params.gyro_noise * noise[3:]
    return accel, gyro, bias


class BarometerParams(NamedTuple):
    """Pressure-altitude model (AirLib BarometerSimple reduced)."""

    noise_sigma: jax.Array  # altitude-equivalent noise [m]
    bias_walk: jax.Array

    @staticmethod
    def default(dtype=jnp.float32) -> "BarometerParams":
        return BarometerParams(
            noise_sigma=jnp.asarray(0.1, dtype=dtype),
            bias_walk=jnp.asarray(0.005, dtype=dtype),
        )


def barometer_measure(z: jax.Array, bias: jax.Array, dt, p: BarometerParams, key):
    """Altitude measurement + new bias (random-walk drift)."""
    k1, k2 = jax.random.split(key)
    bias = bias + p.bias_walk * jnp.sqrt(dt) * jax.random.normal(k1, (), z.dtype)
    alt = z + bias + p.noise_sigma * jax.random.normal(k2, (), z.dtype)
    return alt, bias


class GpsParams(NamedTuple):
    """Horizontal/vertical position fix model (AirLib GpsSimple reduced)."""

    eph: jax.Array  # horizontal 1-sigma [m]
    epv: jax.Array  # vertical 1-sigma [m]

    @staticmethod
    def default(dtype=jnp.float32) -> "GpsParams":
        return GpsParams(
            eph=jnp.asarray(0.3, dtype=dtype), epv=jnp.asarray(0.5, dtype=dtype)
        )


def gps_measure(p_world: jax.Array, params: GpsParams, key):
    n = jax.random.normal(key, (3,), p_world.dtype)
    sig = jnp.stack([params.eph, params.eph, params.epv])
    return p_world + sig * n


def magnetometer_measure(q: jax.Array, declination: jax.Array, noise: jax.Array, key):
    """Body-frame measurement of the horizontal north field (unit vector)."""
    from avoid_mpc_tpu.utils.quaternion import quat_to_rotmat

    north = jnp.stack(
        [jnp.cos(declination), jnp.sin(declination), jnp.zeros_like(declination)]
    )
    body = jnp.sum(quat_to_rotmat(q) * north[:, None], axis=0)  # exact R.T v
    return body + noise * jax.random.normal(key, (3,), body.dtype)


def distance_sensor_measure(
    Twc: jax.Array, field: "ObstacleField", pcfg, max_range=40.0, key=None
):
    """Single-ray forward rangefinder (AirLib DistanceSimple): planar depth of
    the central camera ray."""
    d = render_depth(Twc, field, pcfg, height=8, width=8, key=key)
    return jnp.minimum(d[4, 4], max_range)


class LidarScan(NamedTuple):
    """One lidar update (the ``LidarData`` output of LidarBase).

    ``points`` are WORLD-frame coordinates (the reference's default
    ``DataFrame = VehicleInertialFrame``), fixed shape (channels,
    points_per_channel, 3) with ``mask`` False for rays that hit nothing
    within range (the reference simply omits those points; fixed shapes
    require the mask instead).  ``azimuth_deg`` is the horizontal angle to
    carry into the next update (the rotating head's phase)."""

    points: jax.Array  # (C, Ppc, 3) world frame
    mask: jax.Array  # (C, Ppc) bool — hit within range
    ranges: jax.Array  # (C, Ppc) measured range (inf where no hit)
    azimuth_deg: jax.Array  # scalar — carried head phase


def lidar_scan(
    Twb: jax.Array,
    field: "ObstacleField",
    cfg,
    azimuth0_deg: jax.Array,
    key: jax.Array | None = None,
) -> LidarScan:
    """One rotating-lidar update against the analytic obstacle field.

    The ``LidarSimple`` role (AirLib/include/sensors/lidar/LidarSimple.hpp
    + LidarSimpleParams.hpp): ``points_per_second / update_frequency`` rays
    per update, split evenly over ``number_of_channels`` lasers whose
    elevations span [vertical_fov_lower, vertical_fov_upper]; the head
    sweeps ``rotations_per_second * 360 / update_frequency`` degrees of
    azimuth from ``azimuth0_deg``, wrapped into the horizontal FOV window.
    Rays beyond ``cfg.range`` (VLP-16 default 100 m) are masked out — the
    range clamp the reference applies by dropping points.  ``cfg`` is a
    :class:`avoid_mpc_tpu.config.LidarConfig`.

    Frames are z-up (the reference's NED mount (0,0,-1) is (0,0,+1) here);
    the sensor is rigidly mounted at ``cfg.rel_position`` on the body with
    identity orientation (the reference default).
    """
    dtype = Twb.dtype
    c = cfg.number_of_channels
    ppc = cfg.points_per_channel

    # laser elevations: evenly spaced across the vertical FOV (UnrealLidarSensor)
    elev = jnp.linspace(
        cfg.vertical_fov_lower, cfg.vertical_fov_upper, c, dtype=dtype
    )
    # azimuth sweep this update, wrapped into the horizontal FOV window
    sweep = 360.0 * cfg.rotations_per_second / cfg.update_frequency
    fov_span = cfg.horizontal_fov_end - cfg.horizontal_fov_start
    az = azimuth0_deg + jnp.arange(ppc, dtype=dtype) * (sweep / ppc)
    az = cfg.horizontal_fov_start + jnp.mod(
        az - cfg.horizontal_fov_start, fov_span
    )
    az_next = cfg.horizontal_fov_start + jnp.mod(
        azimuth0_deg + sweep - cfg.horizontal_fov_start, fov_span
    )

    deg = jnp.pi / 180.0
    el_r = (elev * deg)[:, None]  # (C, 1)
    az_r = (az * deg)[None, :]  # (1, Ppc)
    dirs_local = jnp.stack(
        [
            jnp.cos(el_r) * jnp.cos(az_r) * jnp.ones((c, ppc), dtype),
            jnp.cos(el_r) * jnp.sin(az_r) * jnp.ones((c, ppc), dtype),
            jnp.sin(el_r) * jnp.ones((c, ppc), dtype),
        ],
        axis=-1,
    ).reshape(-1, 3)  # (R, 3), unit length

    R_wb = Twb[:3, :3]
    # exact world rays on the VPU (rule 1): elementwise R v + column FMAs
    rel = jnp.asarray(cfg.rel_position, dtype)
    o = Twb[:3, 3] + jnp.sum(R_wb * rel[None, :], axis=-1)
    dirs = jnp.stack(
        [
            dirs_local[:, 0] * R_wb[i, 0]
            + dirs_local[:, 1] * R_wb[i, 1]
            + dirs_local[:, 2] * R_wb[i, 2]
            for i in range(3)
        ],
        axis=-1,
    )  # (R, 3) world

    t_cyl = _ray_cylinder(o, dirs, field.cyl_xy, field.cyl_r)
    t_cyl = jnp.where(field.cyl_mask[None, :], t_cyl, jnp.inf)
    t_sph = _ray_sphere(o, dirs, field.sph_c, field.sph_r)
    t_sph = jnp.where(field.sph_mask[None, :], t_sph, jnp.inf)
    dz = dirs[:, 2]
    t_gnd = jnp.where(dz < -1e-6, -o[2] / dz, jnp.inf)
    t = jnp.minimum(jnp.minimum(t_cyl.min(axis=1), t_sph.min(axis=1)), t_gnd)

    if key is not None and cfg.range_std_dev > 0.0:
        t = t + cfg.range_std_dev * jax.random.normal(key, t.shape, dtype)

    hit = jnp.isfinite(t) & (t <= cfg.range)
    pts = o[None, :] + jnp.where(hit, t, 0.0)[:, None] * dirs
    return LidarScan(
        points=pts.reshape(c, ppc, 3),
        mask=hit.reshape(c, ppc),
        ranges=jnp.where(hit, t, jnp.inf).reshape(c, ppc),
        azimuth_deg=az_next,
    )
