"""Depth pipeline tests: back-projection, block-max downsample, edge cloud."""

import jax.numpy as jnp
import numpy as np

from avoid_mpc_tpu.config import PerceptionConfig
from avoid_mpc_tpu.ops.depth import (
    CameraModel,
    _block_max_inv_depth,
    _erode3x3,
    depth_to_points,
    edge_cloud,
)

PCFG = PerceptionConfig()
CAM = CameraModel.from_config(PCFG, dtype=jnp.float64)


def flat_depth(value):
    return np.full((PCFG.height, PCFG.width), value, dtype=np.float64)


def test_block_max_keeps_nearest():
    depth = flat_depth(50.0)
    depth[0, 0] = 2.0  # one near return in the top-left block
    inv = np.asarray(_block_max_inv_depth(jnp.asarray(depth), CAM))
    assert inv.shape == (48, 64)
    np.testing.assert_allclose(inv[0, 0], 0.5)  # nearest wins
    np.testing.assert_allclose(inv[1, 1], 1 / 50.0)


def test_invalid_depth_masked():
    depth = flat_depth(0.05)  # below depth_min everywhere
    pts, mask = depth_to_points(jnp.asarray(depth), jnp.eye(4, dtype=jnp.float64), CAM)
    assert not np.asarray(mask).any()
    depth = flat_depth(500.0)  # beyond depth_max
    _, mask = depth_to_points(jnp.asarray(depth), jnp.eye(4, dtype=jnp.float64), CAM)
    assert not np.asarray(mask).any()


def test_backprojection_geometry():
    """A flat wall at depth d: center pixel must land on the camera axis,
    transformed through Tbc (camera looks along body +x)."""
    d = 10.0
    depth = flat_depth(d)
    Twb = np.eye(4)
    Twb[:3, 3] = [1.0, 2.0, 3.0]
    pts, mask = depth_to_points(jnp.asarray(depth), jnp.asarray(Twb), CAM)
    assert np.asarray(mask).all()
    pts = np.asarray(pts).reshape(48, 64, 3)
    # center grid pixel (cy/scale, cx/scale) = (24, 32): camera ray -> z axis
    center = pts[24, 32]
    # camera frame: (u-cx)=0 -> x_c=0, y_c=0, z_c=d; world = Twb @ Tbc @ p
    Tbc = PCFG.Tbc
    p_cam = np.array([0.0, 0.0, d, 1.0])
    want = (Twb @ Tbc @ p_cam)[:3]
    np.testing.assert_allclose(center, want, atol=1e-9)
    # all wall points must lie at world x = 1.0 (body) + 0.05 (Tbc x-offset) + d
    np.testing.assert_allclose(pts[..., 0], 1.0 + 0.05 + d, atol=1e-9)


def test_backprojection_matches_manual_loop():
    """Full parity with a per-pixel NumPy loop of the reference math
    (FrameKDMap.cpp:104-125,131-138)."""
    rng = np.random.default_rng(0)
    depth = rng.uniform(1.0, 20.0, (PCFG.height, PCFG.width))
    Twb = np.eye(4)
    Twb[:3, :3] = np.array([[0, -1, 0], [1, 0, 0], [0, 0, 1.0]])
    Twb[:3, 3] = [0.5, -0.2, 1.0]
    pts, mask = depth_to_points(jnp.asarray(depth), jnp.asarray(Twb), CAM)
    pts = np.asarray(pts).reshape(48, 64, 3)

    s = PCFG.resize_scale
    fx, fy, cx, cy = PCFG.fx / s, PCFG.fy / s, PCFG.cx / s, PCFG.cy / s
    Twc = Twb @ PCFG.Tbc
    inv = 1.0 / depth
    for row, col in [(0, 0), (10, 20), (47, 63), (24, 32)]:
        block = inv[row * s : (row + 1) * s, col * s : (col + 1) * s]
        d = 1.0 / block.max()
        p_cam = np.array([(col - cx) * d / fx, (row - cy) * d / fy, d, 1.0])
        want = (Twc @ p_cam)[:3]
        np.testing.assert_allclose(pts[row, col], want, atol=1e-9)


def test_erode_is_min_filter():
    img = jnp.asarray(np.arange(25.0).reshape(5, 5))
    out = np.asarray(_erode3x3(img))
    import scipy.ndimage as ndi

    want = ndi.minimum_filter(np.arange(25.0).reshape(5, 5), size=3, mode="constant", cval=np.inf)
    np.testing.assert_allclose(out, want)


def test_edge_cloud_detects_object_boundary():
    """A near square object on a far background must produce edge points near
    the object's silhouette, at roughly the object depth (inflated)."""
    depth = flat_depth(50.0)
    # 100x100-pixel square at depth 5m in the image center
    depth[190:290, 270:370] = 5.0
    Twb = np.eye(4)
    pts, mask = edge_cloud(jnp.asarray(depth), jnp.asarray(Twb), CAM)
    pts, mask = np.asarray(pts), np.asarray(mask)
    assert mask.sum() > 10, mask.sum()
    edge_pts = pts[mask]
    # edges live on the square's silhouette: world x ~ 5m (camera looks +x)
    near = edge_pts[np.abs(edge_pts[:, 0] - 5.05) < 1.0]
    assert len(near) >= 0.5 * mask.sum()
    # no edge at the untouched far wall interior
    assert not np.any(np.abs(edge_pts[:, 0] - 25.0) < 5.0)


def test_edge_cloud_empty_scene():
    """Uniform depth -> no edges."""
    depth = flat_depth(30.0)
    _, mask = edge_cloud(jnp.asarray(depth), jnp.asarray(jnp.eye(4, dtype=jnp.float64)), CAM)
    assert not np.asarray(mask).any()
