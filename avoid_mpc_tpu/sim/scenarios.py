"""Scenario generation: randomized clutter fields, starts, goals.

The Monte-Carlo axis of the framework (SURVEY.md §2.5 "scenario
parallelism"): thousands of randomized cluttered-forest scenarios solved in
parallel.  Randomization mirrors the reference's fault-injection knobs:
randomized start pose +-max_randow_start (``airsim_ros_wrapper.cpp:78-97``,
launch +-0.5 m) and per-frame Gaussian depth noise.

All generators are pure functions of a PRNG key and broadcast with vmap —
one key per scenario gives a reproducible fleet.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from avoid_mpc_tpu.sim.sensors import ObstacleField


class ScenarioConfig(NamedTuple):
    """Static scenario-generation parameters."""

    n_cylinders: int = 32
    n_spheres: int = 0
    x_range: tuple[float, float] = (5.0, 45.0)  # forest span ahead of start
    y_range: tuple[float, float] = (-8.0, 8.0)
    radius_range: tuple[float, float] = (0.15, 0.6)
    min_clear_radius: float = 2.0  # keep a disk around the start clear
    start_xy_jitter: float = 0.5  # launch max_randow_start_{x,y}
    start_height: float = 0.0


def random_forest(key: jax.Array, cfg: ScenarioConfig, dtype=jnp.float32) -> ObstacleField:
    """A random cylinder forest. Cylinders landing inside the start clearing
    are masked out rather than resampled (static shapes)."""
    k1, k2, k3 = jax.random.split(key, 3)
    n = cfg.n_cylinders
    xy = jnp.stack(
        [
            jax.random.uniform(k1, (n,), dtype, cfg.x_range[0], cfg.x_range[1]),
            jax.random.uniform(k2, (n,), dtype, cfg.y_range[0], cfg.y_range[1]),
        ],
        axis=-1,
    )
    r = jax.random.uniform(k3, (n,), dtype, cfg.radius_range[0], cfg.radius_range[1])
    clear = jnp.linalg.norm(xy, axis=-1) > (cfg.min_clear_radius + r)
    field = ObstacleField.empty(n_cyl=n, n_sph=max(cfg.n_spheres, 1), dtype=dtype)
    return field._replace(cyl_xy=xy, cyl_r=r, cyl_mask=clear)


def random_start_states(key: jax.Array, cfg: ScenarioConfig, dtype=jnp.float32) -> jax.Array:
    """Randomized initial MPC state (10,): position jitter like the bridge's
    randomized start pose (airsim_ros_wrapper.cpp:78-97)."""
    d = jax.random.uniform(key, (2,), dtype, -cfg.start_xy_jitter, cfg.start_xy_jitter)
    x = jnp.zeros(10, dtype=dtype)
    return x.at[0].set(d[0]).at[1].set(d[1]).at[2].set(cfg.start_height)


def forest_point_cloud(
    field: ObstacleField, n_points: int, key: jax.Array, z_range=(0.0, 3.0), dtype=jnp.float32
):
    """Sample a synthetic point cloud on the forest surfaces — the stand-in
    for accumulated depth observations when benchmarking the solver+k-NN
    path without rendering (BASELINE.json config "dual KD-tree cluttered
    forest ... 10k-point cloud")."""
    k1, k2, k3 = jax.random.split(key, 3)
    n_cyl = field.cyl_xy.shape[0]
    idx = jax.random.randint(k1, (n_points,), 0, n_cyl)
    theta = jax.random.uniform(k2, (n_points,), dtype, 0.0, 2.0 * jnp.pi)
    z = jax.random.uniform(k3, (n_points,), dtype, z_range[0], z_range[1])
    c = field.cyl_xy[idx]
    r = field.cyl_r[idx]
    pts = jnp.stack(
        [c[:, 0] + r * jnp.cos(theta), c[:, 1] + r * jnp.sin(theta), z], axis=-1
    )
    mask = field.cyl_mask[idx]
    return pts, mask
