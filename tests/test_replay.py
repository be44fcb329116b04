"""Flight log + replay determinism tests (the high-speed replay config)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from avoid_mpc_tpu.config import EngineConfig, MPCConfig, TaskConfig
from avoid_mpc_tpu.sim import ScenarioConfig, build_world, random_forest
from avoid_mpc_tpu.sim.replay import record_flight, replay

DTYPE = jnp.float64

CFG = EngineConfig(
    mpc=dataclasses.replace(
        MPCConfig(), mpc_T=0.5, sqp_iters=4, sqp_iters_fast=3, mpc_max_iter=2,
        speed=12.0,  # the 12 m/s high-speed configuration
    ),
    task=TaskConfig(height=1.5),
)


def test_record_and_replay_reproduces_commands():
    params, hyper = build_world(CFG, render_scale=8, grid_scale=4, map_frames=4, dtype=DTYPE)
    scfg = ScenarioConfig(n_cylinders=8, x_range=(6.0, 30.0), radius_range=(0.2, 0.4))
    field = random_forest(jax.random.PRNGKey(5), scfg, dtype=DTYPE)

    log = jax.jit(
        lambda k: record_flight(CFG, params, hyper, field, 120, k, dtype=DTYPE)
    )(jax.random.PRNGKey(0))
    p = np.asarray(log.p)
    assert np.isfinite(p).all()
    # the drone actually flew fast
    assert np.asarray(log.v)[:, 0].max() > 6.0

    u_replayed, is_safety = jax.jit(
        lambda log: replay(log, CFG, params, hyper, dtype=DTYPE)
    )(log)
    # deterministic replay: identical inputs -> identical commands
    np.testing.assert_allclose(
        np.asarray(u_replayed), np.asarray(log.u_cmd), rtol=1e-9, atol=1e-9
    )
