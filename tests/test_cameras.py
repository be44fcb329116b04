"""Stereo + bottom camera streams (the bridge's remaining declared image
surface, ``airsim_ros_wrapper.cpp:1129-1231``): geometry checks of the rig
renderer and its wiring into the world capture surface."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from avoid_mpc_tpu.config import EngineConfig, PerceptionConfig
from avoid_mpc_tpu.sim.sensors import CameraRig, ObstacleField, render_rig
from avoid_mpc_tpu.sim.world import build_world, world_init, world_step_full

DTYPE = jnp.float32
PCFG = PerceptionConfig()


def level_pose(p):
    return jnp.eye(4, dtype=DTYPE).at[:3, 3].set(jnp.asarray(p, DTYPE))


def field_with_cylinder(x=4.0, y=0.0, r=0.3):
    f = ObstacleField.empty(dtype=DTYPE)
    return f._replace(
        cyl_xy=f.cyl_xy.at[0].set(jnp.asarray([x, y], DTYPE)),
        cyl_r=f.cyl_r.at[0].set(r),
        cyl_mask=f.cyl_mask.at[0].set(True),
    )


def test_stereo_disparity_geometry():
    """A cylinder straight ahead: both eyes see it at (nearly) the same
    planar depth, and the horizontal pixel shift between the two depth
    silhouettes equals the stereo disparity fx * baseline / depth."""
    baseline = 0.1
    rig = CameraRig.default(PCFG.Tbc, baseline=baseline, dtype=DTYPE)
    Twb = level_pose([0.0, 0.0, 1.5])
    cyl_x, cyl_r = 4.0, 0.3
    cap = render_rig(Twb, rig, field_with_cylinder(cyl_x, 0.0, cyl_r), PCFG,
                     height=96, width=128)
    h, w = 96, 128
    fx = PCFG.fx * (w / PCFG.width)
    row_l = np.asarray(cap.left)[h // 2]
    row_r = np.asarray(cap.right)[h // 2]
    hit_l = np.where(row_l < 10.0)[0]
    hit_r = np.where(row_r < 10.0)[0]
    assert hit_l.size > 0 and hit_r.size > 0
    depth = float(row_l[hit_l].min())
    # front face of the cylinder (camera at x=0.05 body offset)
    assert abs(depth - (cyl_x - cyl_r - 0.05)) < 0.05
    # disparity: left camera sits at +y_body (scene shifts right in image)
    disparity_px = float(hit_l.mean() - hit_r.mean())
    expected = fx * baseline / depth
    assert abs(disparity_px - expected) < 1.5, (disparity_px, expected)


def test_bottom_camera_sees_ground():
    """Nadir stream: at altitude h over flat ground the central planar depth
    is h (+ the 3 cm mount offset), and the image is ~uniform."""
    rig = CameraRig.default(PCFG.Tbc, dtype=DTYPE)
    alt = 2.0
    cap = render_rig(level_pose([0.0, 0.0, alt]), rig, ObstacleField.empty(dtype=DTYPE),
                     PCFG, height=48, width=64)
    bottom = np.asarray(cap.bottom)
    assert abs(float(bottom[24, 32]) - (alt - 0.03)) < 1e-3
    # planar depth is constant over a fronto-parallel plane
    assert float(bottom.max() - bottom.min()) < 1e-2


def test_rig_extrinsics_valid():
    rig = CameraRig.default(PCFG.Tbc, dtype=DTYPE)
    for T in (rig.T_b_left, rig.T_b_right, rig.T_b_bottom):
        R = np.asarray(T)[:3, :3]
        np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-6)
        assert np.linalg.det(R) > 0.999  # right-handed
    # symmetric baseline about the front camera
    np.testing.assert_allclose(
        np.asarray(rig.T_b_left)[1, 3] + np.asarray(rig.T_b_right)[1, 3],
        2 * PCFG.Tbc[1, 3], atol=1e-7,
    )


def test_world_capture_surface():
    """capture_stereo_bottom=True publishes the three extra frames on the
    world_step_full capture surface; the default pays nothing (aux=None) and
    the front-depth noise stream is identical either way."""
    cfg = EngineConfig()
    params, hyper = build_world(cfg, render_scale=8, map_frames=4)
    f = field_with_cylinder()
    key = jax.random.PRNGKey(0)
    ws = world_init(cfg, params, hyper, jnp.zeros(2, DTYPE), key)

    _, _, depth_off, _, _, aux_off = world_step_full(ws, f, params, hyper)
    assert aux_off is None

    hyper_on = hyper._replace(capture_stereo_bottom=True)
    _, _, depth_on, _, _, aux = world_step_full(ws, f, params, hyper_on)
    assert aux is not None
    for frame in (aux.left, aux.right, aux.bottom):
        assert frame.shape == (hyper.render_h, hyper.render_w)
        assert bool(jnp.all(jnp.isfinite(frame)))
    np.testing.assert_array_equal(np.asarray(depth_off), np.asarray(depth_on))
