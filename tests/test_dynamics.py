"""Unit tests: quadrotor dynamics vs independent NumPy oracle."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from avoid_mpc_tpu.config import MPCConfig
from avoid_mpc_tpu.models.quadrotor import (
    DynamicsParams,
    quad_dynamics,
    rk4_step,
    rollout,
)
from tests import oracles

CFG = MPCConfig()


def _params(dtype=jnp.float64, use_drag=False):
    import dataclasses

    cfg = dataclasses.replace(CFG, use_drag_coefficient=use_drag)
    return DynamicsParams.from_config(cfg, dtype=dtype)


def _rand_state(rng):
    x = rng.standard_normal(10)
    x[7:10] += [0.0, 0.0, 0.0]
    return x


def test_ode_matches_oracle():
    rng = np.random.default_rng(0)
    p = _params()
    for _ in range(20):
        x = _rand_state(rng)
        u = rng.standard_normal(4) * 3
        got = quad_dynamics(jnp.asarray(x), jnp.asarray(u), p)
        want = oracles.ode(x, u, CFG.tau)
        np.testing.assert_allclose(np.asarray(got), want, rtol=1e-12, atol=1e-12)


def test_ode_with_drag_matches_oracle():
    rng = np.random.default_rng(1)
    p = _params(use_drag=True)
    for _ in range(10):
        x = _rand_state(rng)
        x[7:10] = rng.standard_normal(3) * 0.5  # keep thrust direction sane
        u = rng.standard_normal(4)
        got = quad_dynamics(jnp.asarray(x), jnp.asarray(u), p)
        want = oracles.ode(x, u, CFG.tau, use_drag=True)
        np.testing.assert_allclose(np.asarray(got), want, rtol=1e-9, atol=1e-9)


def test_rk4_matches_oracle():
    rng = np.random.default_rng(2)
    p = _params()
    for _ in range(10):
        x = _rand_state(rng)
        u = rng.standard_normal(4) * 2 + np.array([0, 0, 9.81, 0])
        got = rk4_step(jnp.asarray(x), jnp.asarray(u), CFG.mpc_dt, p)
        want = oracles.rk4(x, u, CFG.mpc_dt, CFG.tau)
        np.testing.assert_allclose(np.asarray(got), want, rtol=1e-12, atol=1e-12)


def test_rollout_matches_oracle():
    rng = np.random.default_rng(3)
    p = _params()
    n = CFG.horizon_steps
    x0 = _rand_state(rng)
    us = rng.standard_normal((n, 4)) + np.array([0, 0, 9.81, 0])
    got = rollout(jnp.asarray(x0), jnp.asarray(us), CFG.mpc_dt, p)
    want = oracles.rollout(x0, us, CFG.mpc_dt, CFG.tau)
    assert got.shape == (n + 1, 10)
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-11, atol=1e-11)


def test_hover_is_equilibrium():
    """At hover (u=[0,0,g,0], zero vel/acc) the state must not move."""
    p = _params()
    x = jnp.zeros(10).at[2].set(1.5)
    u = jnp.array([0.0, 0.0, 9.81, 0.0])
    x1 = rk4_step(x, u, CFG.mpc_dt, p)
    np.testing.assert_allclose(np.asarray(x1), np.asarray(x), atol=1e-12)


def test_accel_lag_convergence():
    """Constant command: the acceleration state converges toward cmd - g."""
    p = _params()
    x = jnp.zeros(10)
    u = jnp.array([2.0, -1.0, 12.0, 0.0])
    for _ in range(300):
        x = rk4_step(x, u, 0.033, p)
    np.testing.assert_allclose(np.asarray(x[7:10]), [2.0, -1.0, 12.0 - 9.81], atol=1e-5)


def test_vmap_batching():
    rng = np.random.default_rng(4)
    p = _params()
    xs = rng.standard_normal((16, 10))
    us = rng.standard_normal((16, 4))
    batched = jax.vmap(lambda x, u: rk4_step(x, u, 0.033, p))(jnp.asarray(xs), jnp.asarray(us))
    for i in range(16):
        np.testing.assert_allclose(
            np.asarray(batched[i]), oracles.rk4(xs[i], us[i], 0.033, CFG.tau), rtol=1e-12, atol=1e-12
        )


def test_f32_close_to_f64():
    """The f32 TPU path stays within float tolerance of the f64 oracle."""
    rng = np.random.default_rng(5)
    p32 = _params(dtype=jnp.float32)
    n = 30
    x0 = _rand_state(rng)
    us = rng.standard_normal((n, 4)) + np.array([0, 0, 9.81, 0])
    got = rollout(jnp.asarray(x0, dtype=jnp.float32), jnp.asarray(us, dtype=jnp.float32), 0.033, p32)
    assert got.dtype == jnp.float32
    want = oracles.rollout(x0, us, 0.033, CFG.tau)
    np.testing.assert_allclose(np.asarray(got), want, rtol=2e-4, atol=2e-4)


def test_jit_static_shapes():
    p = _params()
    f = jax.jit(lambda x, u: rk4_step(x, u, 0.033, p))
    x = jnp.zeros(10)
    u = jnp.array([0.0, 0.0, 9.81, 0.0])
    np.testing.assert_allclose(np.asarray(f(x, u)), np.asarray(x), atol=1e-12)
