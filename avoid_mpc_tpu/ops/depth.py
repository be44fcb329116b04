"""Depth-image -> point-cloud / edge-cloud pipeline, as fixed-shape array ops.

Re-design of the reference's per-pixel OpenCV loops
(``FrameKDMap.cpp:90-214``) into vectorized XLA ops:

- **inverse-depth downsample**: the reference resizes the inverse-depth image
  /10 intending to keep the *nearest* return per block (inverse depth makes
  "nearest" = "max").  We implement exactly that intent as a scale x scale
  block max — conservative for obstacle avoidance.  (The reference passes
  ``cv::INTER_MAX`` to ``cv::resize``, which is a flag bound, not an
  interpolation mode — see FrameKDMap.cpp:109.)
- **back-projection**: pinhole unproject at the block-downsampled grid with
  intrinsics scaled by 1/scale (reference FrameKDMap.cpp:21-24,131-138), then
  world transform through Twb @ Tbc.
- **edge cloud**: quantize depth to ~uint8 (reference :181-194), 3x3 erode
  (min-filter; cv::erode's default border is +inf so SAME/inf padding matches
  exactly), then a Canny-style edge detector: Sobel gradients +
  direction-quantized non-maximum suppression.  With the reference's Canny
  thresholds (0.1/0.3 on integer gradients) every nonzero-gradient local
  maximum is an edge, which is what we compute.
- Transform note: the reference applies Tbc *twice* for edge points and uses
  the previous frame's pose (``FrameKDMap.cpp:207-210``: ``mCurFrame.Twc *
  mParamTbc`` where Twc already contains Tbc, and Twc is updated only after
  ProcessDepth — ``FrameKDMap.cpp:40-50``).  We use the correct single
  Twb @ Tbc for both clouds.

Outputs are fixed-shape (grid_h*grid_w) with validity masks — ready for the
masked k-NN kernels and jit-stable across frames.  Batched over scenarios via
vmap (leading axes on depth and Twb).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from avoid_mpc_tpu.config import PerceptionConfig

# Inverse-depth validity floor (reference FrameKDMap.cpp:113 "invDepth < 1e-2").
_INV_DEPTH_MIN = 1e-2
# Depth quantization span factor (reference :185-187: d/(dmax-dmin)*200).
_QUANT_LEVELS = 200.0


class CameraModel(NamedTuple):
    """Static+runtime camera description at the downsampled grid resolution."""

    fx: jax.Array
    fy: jax.Array
    cx: jax.Array
    cy: jax.Array
    depth_min: jax.Array
    depth_max: jax.Array
    Tbc: jax.Array  # (4,4) body->camera extrinsic
    scale: int  # static downsample factor
    grid_h: int  # static
    grid_w: int  # static

    @staticmethod
    def from_config(p: PerceptionConfig, dtype=jnp.float32) -> "CameraModel":
        s = p.resize_scale
        return CameraModel(
            fx=jnp.asarray(p.fx / s, dtype=dtype),
            fy=jnp.asarray(p.fy / s, dtype=dtype),
            cx=jnp.asarray(p.cx / s, dtype=dtype),
            cy=jnp.asarray(p.cy / s, dtype=dtype),
            depth_min=jnp.asarray(p.depth_min, dtype=dtype),
            depth_max=jnp.asarray(p.depth_max, dtype=dtype),
            Tbc=jnp.asarray(p.Tbc, dtype=dtype),
            scale=s,
            grid_h=p.grid_height,
            grid_w=p.grid_width,
        )


def _block_max_inv_depth(depth: jax.Array, cam: CameraModel) -> jax.Array:
    """Full-res depth (H,W) -> downsampled inverse depth (gh,gw), keeping the
    nearest (max inverse-depth) valid return per block."""
    valid = (depth > cam.depth_min) & (depth < cam.depth_max)
    inv = jnp.where(valid, 1.0 / jnp.maximum(depth, 1e-6), 0.0)
    gh, gw, s = cam.grid_h, cam.grid_w, cam.scale
    inv = inv[: gh * s, : gw * s].reshape(gh, s, gw, s)
    return inv.max(axis=(1, 3))


def _unproject_grid(depth_grid: jax.Array, cam: CameraModel) -> jax.Array:
    """(gh,gw) depths -> (gh,gw,3) camera-frame points at pixel centers."""
    u = jnp.arange(cam.grid_w, dtype=depth_grid.dtype)[None, :]
    v = jnp.arange(cam.grid_h, dtype=depth_grid.dtype)[:, None]
    x = (u - cam.cx) * depth_grid / cam.fx
    y = (v - cam.cy) * depth_grid / cam.fy
    return jnp.stack([x, y, depth_grid], axis=-1)


def _to_world(pts_cam: jax.Array, Twb: jax.Array, cam: CameraModel) -> jax.Array:
    # World coordinates through a matmul: full f32 mandatory (CLAUDE.md
    # rule 1).  The default bf16 MXU pass shifts back-projected points by
    # ~0.3 m at 50 m range (measured on-chip round 5) — larger than the
    # 0.1 m dedupe threshold and a real bite out of the 0.2-0.5 m safety
    # margins.  Everything is written as per-element FMA chains (compose_tf
    # + per-column rotation) so it stays exact on the VPU at full speed.
    from avoid_mpc_tpu.utils.quaternion import compose_tf

    Twc = compose_tf(Twb, cam.Tbc)
    R, t = Twc[:3, :3], Twc[:3, 3]
    return jnp.stack(
        [
            pts_cam[..., 0] * R[i, 0]
            + pts_cam[..., 1] * R[i, 1]
            + pts_cam[..., 2] * R[i, 2]
            + t[i]
            for i in range(3)
        ],
        axis=-1,
    )


def depth_to_points(depth: jax.Array, Twb: jax.Array, cam: CameraModel):
    """Obstacle cloud: (H,W) depth + (4,4) body pose -> ((gh*gw,3) world
    points, (gh*gw,) valid mask). Reference ``ProcessDepth``
    (FrameKDMap.cpp:90-130)."""
    inv = _block_max_inv_depth(depth, cam)
    valid = inv > _INV_DEPTH_MIN
    d = jnp.where(valid, 1.0 / jnp.maximum(inv, _INV_DEPTH_MIN), 0.0)
    valid &= (d > cam.depth_min) & (d < cam.depth_max)
    pts = _to_world(_unproject_grid(d, cam), Twb, cam)
    return pts.reshape(-1, 3), valid.reshape(-1)


def _erode3x3(img: jax.Array) -> jax.Array:
    """3x3 min-filter, SAME padding with +inf (cv::erode default border)."""
    return jax.lax.reduce_window(
        img,
        jnp.asarray(jnp.inf, img.dtype),
        jax.lax.min,
        window_dimensions=(3, 3),
        window_strides=(1, 1),
        padding="SAME",
    )


def _sobel(img: jax.Array):
    """3x3 Sobel gradients with replicate padding (cv default)."""
    p = jnp.pad(img, 1, mode="edge")
    tl, tc, tr = p[:-2, :-2], p[:-2, 1:-1], p[:-2, 2:]
    ml, mr = p[1:-1, :-2], p[1:-1, 2:]
    bl, bc, br = p[2:, :-2], p[2:, 1:-1], p[2:, 2:]
    gx = (tr + 2 * mr + br) - (tl + 2 * ml + bl)
    gy = (bl + 2 * bc + br) - (tl + 2 * tc + tr)
    return gx, gy


def _nms(mag: jax.Array, gx: jax.Array, gy: jax.Array) -> jax.Array:
    """Canny non-maximum suppression with 4-bin direction quantization,
    matching OpenCV's tie-breaks (canny.cpp): strict ``>`` against one
    neighbor and ``>=`` against the other in the axis bins, strict against
    both in the diagonal bins — so constant-gradient ramps (every pixel tied
    with its neighbors) produce NO edges, exactly like cv::Canny."""
    p = jnp.pad(mag, 1, mode="constant")
    c = p[1:-1, 1:-1]
    nbr = {
        "e": p[1:-1, 2:], "w": p[1:-1, :-2],
        "n": p[:-2, 1:-1], "s": p[2:, 1:-1],
        "ne": p[:-2, 2:], "sw": p[2:, :-2],
        "nw": p[:-2, :-2], "se": p[2:, 2:],
    }
    ax, ay = jnp.abs(gx), jnp.abs(gy)
    same_sign = (gx * gy) >= 0
    # direction bins: horizontal grad -> compare e/w; vertical -> n/s; diagonals
    horiz = ax >= 2.4142 * ay  # gradient within 22.5deg of horizontal
    vert = ay >= 2.4142 * ax
    keep_h = (c > nbr["w"]) & (c >= nbr["e"])
    keep_v = (c > nbr["n"]) & (c >= nbr["s"])
    keep_d1 = (c > nbr["nw"]) & (c > nbr["se"])  # gradient along +x+y
    keep_d2 = (c > nbr["ne"]) & (c > nbr["sw"])
    keep_diag = jnp.where(same_sign, keep_d1, keep_d2)
    return jnp.where(horiz, keep_h, jnp.where(vert, keep_v, keep_diag))


def edge_cloud(depth: jax.Array, Twb: jax.Array, cam: CameraModel):
    """Edge cloud for warm-start waypoints: ((gh*gw,3) points, (gh*gw,) mask).

    Reference ``BuildEdgeCloud`` (FrameKDMap.cpp:176-214): quantize inverse
    depth to ~uint8 (255 where invalid), 3x3 erode (inflates obstacles —
    min-filter takes the nearer depth), edge-detect, back-project edge pixels
    at the *eroded* (inflated) depth.
    """
    inv = _block_max_inv_depth(depth, cam)
    span = cam.depth_max - cam.depth_min
    valid = inv > _INV_DEPTH_MIN
    q = jnp.where(
        valid,
        jnp.floor((1.0 / jnp.maximum(inv, _INV_DEPTH_MIN)) / span * _QUANT_LEVELS),
        255.0,
    )
    q = jnp.clip(q, 0.0, 255.0)
    eroded = _erode3x3(q)
    gx, gy = _sobel(eroded)
    mag = jnp.abs(gx) + jnp.abs(gy)  # L1 magnitude (cv::Canny default)
    edges = _nms(mag, gx, gy) & (mag > 0.5)
    d = eroded * span / _QUANT_LEVELS
    edge_valid = edges & (d > cam.depth_min) & (d < cam.depth_max)
    pts = _to_world(_unproject_grid(d, cam), Twb, cam)
    return pts.reshape(-1, 3), edge_valid.reshape(-1)


def process_depth_frame(depth: jax.Array, Twb: jax.Array, cam: CameraModel):
    """One camera frame -> (obstacle points, obstacle mask, edge points,
    edge mask), all fixed-shape (gh*gw, ...). The device-side half of the
    reference's ``AddVertex`` (FrameKDMap.cpp:34-52)."""
    pts, mask = depth_to_points(depth, Twb, cam)
    epts, emask = edge_cloud(depth, Twb, cam)
    return pts, mask, epts, emask
