"""Depth pipeline tests: back-projection, block-max downsample, edge cloud."""

import jax.numpy as jnp
import numpy as np
import pytest

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


def _reference_edge_oracle(depth_np, pcfg):
    """The reference BuildEdgeCloud pipeline, bit-for-bit with OpenCV
    (FrameKDMap.cpp:90-130 downsample + :176-214 edge build): block-max
    inverse depth, uchar quantization d/(dmax-dmin)*200, 3x3 erode,
    cv2.Canny(0.1, 0.3).  Returns (edge mask (gh,gw), eroded uchar img)."""
    import cv2

    s = pcfg.resize_scale
    gh, gw = pcfg.grid_height, pcfg.grid_width
    valid = (depth_np > pcfg.depth_min) & (depth_np < pcfg.depth_max)
    inv = np.where(valid, 1.0 / np.maximum(depth_np, 1e-6), 0.0)
    inv = inv[: gh * s, : gw * s].reshape(gh, s, gw, s).max(axis=(1, 3))
    span = pcfg.depth_max - pcfg.depth_min
    img = np.where(
        inv > 1e-2,
        (1.0 / np.maximum(inv, 1e-2) / span * 200.0).astype(np.uint8),
        np.uint8(255),
    ).astype(np.uint8)
    eroded = cv2.erode(img, np.ones((3, 3), np.uint8))
    canny = cv2.Canny(eroded, 0.1, 0.3)
    # the reference back-projects only edge pixels whose eroded depth is in
    # range (FrameKDMap.cpp:204-206 `continue`) — sky-side Canny pixels
    # (eroded == 255) never become cloud points, so the golden set is the
    # depth-valid edge set
    dq = eroded.astype(np.float64) * span / 200.0
    depth_ok = (dq > pcfg.depth_min) & (dq < pcfg.depth_max)
    return (canny > 0) & depth_ok, eroded


def _within_one_pixel(a, b):
    """Every True in a is within 1 pixel (8-neighborhood) of a True in b."""
    import cv2

    grown = cv2.dilate(b.astype(np.uint8), np.ones((3, 3), np.uint8)) > 0
    return bool((~a | grown).all())


def test_edge_cloud_matches_opencv_canny_golden():
    """Golden test vs the real reference pipeline (OpenCV erode + Canny with
    the reference's 0.1/0.3 thresholds): our Sobel+NMS edge detector must
    agree within one pixel on synthetic depth scenes."""
    pytest.importorskip("cv2")
    import dataclasses

    from avoid_mpc_tpu.config import PerceptionConfig
    from avoid_mpc_tpu.ops.depth import CameraModel, edge_cloud

    pcfg = dataclasses.replace(
        PerceptionConfig(), width=128, height=96, resize_scale=2,
        fx=64.0, fy=64.0, cx=64.0, cy=48.0,
    )
    cam = CameraModel.from_config(pcfg, dtype=jnp.float64)
    gh, gw = pcfg.grid_height, pcfg.grid_width
    h, w = pcfg.height, pcfg.width

    scenes = []
    # 1: vertical strip (a trunk) at 5 m on a 20 m background
    d = np.full((h, w), 20.0)
    d[:, 40:56] = 5.0
    scenes.append(d)
    # 2: two discs at different depths + invalid (far) sky band
    d = np.full((h, w), 30.0)
    yy, xx = np.mgrid[0:h, 0:w]
    d[(yy - 40) ** 2 + (xx - 40) ** 2 < 20**2] = 8.0
    d[(yy - 60) ** 2 + (xx - 90) ** 2 < 15**2] = 3.5
    d[:12] = 1e4  # beyond depth_max -> invalid
    scenes.append(d)
    # 3: sloped ground plane with a near pole
    d = np.tile(np.linspace(25.0, 4.0, h)[:, None], (1, w))
    d[:, 100:108] = 2.0
    scenes.append(d)

    for i, depth_np in enumerate(scenes):
        oracle, _ = _reference_edge_oracle(depth_np, pcfg)
        _, emask = edge_cloud(jnp.asarray(depth_np), jnp.eye(4, dtype=jnp.float64), cam)
        ours = np.asarray(emask).reshape(gh, gw)
        # bidirectional 1-pixel agreement (quantized-NMS tie-breaks differ)
        assert _within_one_pixel(ours, oracle), f"scene {i}: ours not in oracle+1px"
        assert _within_one_pixel(oracle, ours), f"scene {i}: oracle not in ours+1px"
        # and the edge sets are comparable in size (no gross over/under-detect)
        n_o, n_u = oracle.sum(), ours.sum()
        assert n_o > 0 and 0.5 <= n_u / n_o <= 2.0, (i, n_o, n_u)
