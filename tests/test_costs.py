"""Unit tests: cost terms vs independent NumPy oracle."""

import jax.numpy as jnp
import numpy as np

from avoid_mpc_tpu.config import MPCConfig
from avoid_mpc_tpu.models.costs import (
    CostParams,
    collision_cost,
    control_cost,
    goal_cost,
    path_gap_cost,
    trajectory_cost,
)
from avoid_mpc_tpu.models.quadrotor import DynamicsParams, rollout
from tests import oracles

CFG = MPCConfig()
CP = CostParams.from_config(CFG, dtype=jnp.float64)
W = CFG.weights


def _problem(rng, n=10, k=3):
    x0 = rng.standard_normal(10) * 0.3
    us = rng.standard_normal((n, 4)) * 2 + np.array([0, 0, 9.81, 0])
    xs = oracles.rollout(x0, us, CFG.mpc_dt, CFG.tau)
    ref = rng.standard_normal((n, 10))
    obstacles = rng.standard_normal((n, k, 3)) * 3
    target = rng.standard_normal(10)
    return x0, us, xs, ref, obstacles, target


def test_trajectory_cost_matches_oracle():
    rng = np.random.default_rng(10)
    for n in (5, 30):
        x0, us, xs, ref, obstacles, target = _problem(rng, n)
        got = trajectory_cost(
            jnp.asarray(xs), jnp.asarray(us), jnp.asarray(ref),
            jnp.asarray(obstacles), jnp.asarray(target), CP,
        )
        want = oracles.stage_costs(
            xs, us, ref, obstacles, target,
            np.array(W.q_goal), np.array(W.q_path), np.array(W.q_u),
            W.collide_lambda, CFG.drone_radius,
        )
        np.testing.assert_allclose(float(got), want, rtol=1e-10)


def test_control_cost_hover_zero():
    u = jnp.array([0.0, 0.0, 9.81, 0.0])
    assert float(control_cost(u, CP)) == 0.0


def test_goal_cost_at_target_zero():
    t = jnp.arange(10.0)
    assert float(goal_cost(t, t, CP)) == 0.0


def test_path_gap_yaw_rotation_invariance():
    """A delta purely along the path (x-direction in path frame) with zero
    path_p_x weight must cost nothing regardless of ref yaw."""
    yaw = 0.7
    ref = jnp.zeros(10).at[3].set(yaw)
    # displace along the path direction (cos yaw, sin yaw)
    x = jnp.zeros(10).at[0].set(2.0 * np.cos(yaw)).at[1].set(2.0 * np.sin(yaw)).at[3].set(yaw)
    c = float(path_gap_cost(x, ref, CP))
    assert abs(c) < 1e-20  # path_p_x weight is 0 in the default config


def test_collision_cost_padding_is_zero():
    """The (1e4,1e4,1e4) padding sentinel contributes exactly zero cost and grad."""
    import jax

    x = jnp.zeros(10).at[4].set(5.0)
    far = jnp.full((3, 3), 1e4)
    assert float(collision_cost(x, far, CP)) == 0.0
    g = jax.grad(lambda xx: collision_cost(xx, far, CP))(x)
    np.testing.assert_allclose(np.asarray(g), 0.0, atol=1e-30)


def test_collision_cost_close_obstacle_positive_and_velocity_scaled():
    x = jnp.zeros(10).at[4].set(3.0)  # flying +x at 3 m/s
    obs = jnp.array([[0.6, 0.0, 0.0]])  # 0.6m ahead, radius 0.5 -> dist margin 0.1
    c1 = float(collision_cost(x, obs[None][0][None, :][0][None], CP)) if False else float(
        collision_cost(x, obs, CP)
    )
    assert c1 > 0
    x2 = x.at[4].set(6.0)
    c2 = float(collision_cost(x2, obs, CP))
    np.testing.assert_allclose(c2, 2 * c1, rtol=1e-8)  # ~linear in |v.dir|


def test_cost_grads_finite():
    """Gradients through the full objective are finite (softplus stability)."""
    import jax

    rng = np.random.default_rng(11)
    x0, us, xs, ref, obstacles, target = _problem(rng, 8)
    # place one obstacle very close to a trajectory point (stiff region)
    obstacles[2, 0] = xs[3, 0:3] + 1e-3
    dp = DynamicsParams.from_config(CFG, dtype=jnp.float64)

    def total(u_flat):
        us_ = u_flat.reshape(8, 4)
        xs_ = rollout(jnp.asarray(x0), us_, CFG.mpc_dt, dp)
        return trajectory_cost(xs_, us_, jnp.asarray(ref), jnp.asarray(obstacles), jnp.asarray(target), CP)

    g = jax.grad(total)(jnp.asarray(us).ravel())
    assert np.all(np.isfinite(np.asarray(g)))


def test_gradient_matches_finite_difference():
    rng = np.random.default_rng(12)
    x0, us, xs, ref, obstacles, target = _problem(rng, 6)
    import jax

    dp = DynamicsParams.from_config(CFG, dtype=jnp.float64)

    def total(u_flat):
        us_ = u_flat.reshape(6, 4)
        xs_ = rollout(jnp.asarray(x0), us_, CFG.mpc_dt, dp)
        return trajectory_cost(xs_, us_, jnp.asarray(ref), jnp.asarray(obstacles), jnp.asarray(target), CP)

    z = jnp.asarray(us).ravel()
    g = np.asarray(jax.grad(total)(z))
    eps = 1e-6
    for i in range(0, 24, 5):
        zp = np.asarray(z).copy()
        zm = zp.copy()
        zp[i] += eps
        zm[i] -= eps
        fd = (float(total(jnp.asarray(zp))) - float(total(jnp.asarray(zm)))) / (2 * eps)
        np.testing.assert_allclose(g[i], fd, rtol=2e-5, atol=1e-7)


def test_collision_quadratics_match_ad():
    """Analytic collision grad/Hessian (the solver's linearize hot path)
    vs jax AD on the same function, across all barrier-extension knobs."""
    import jax

    from avoid_mpc_tpu.config import MPCWeights
    from avoid_mpc_tpu.models.costs import collision_quadratics
    from avoid_mpc_tpu.solver.ilqr import _collision_pv

    rng = np.random.default_rng(0)
    for lam_o, marg in [(0.0, 0.0), (0.8, 0.0), (0.0, 0.05), (0.7, 0.04)]:
        cfg = MPCConfig(
            margin_v=marg,
            weights=MPCWeights(
                q_goal=CFG.weights.q_goal, q_path=CFG.weights.q_path,
                q_u=CFG.weights.q_u, collide_lambda=1.2,
                collide_lambda_omni=lam_o,
            ),
        )
        cp = CostParams.from_config(cfg, dtype=jnp.float64)
        for i in range(20):
            pv = jnp.asarray(rng.normal(0, 3, 6))
            obs = jnp.asarray(pv[0:3] + rng.normal(0, 1.0, (3, 3)))
            if i % 4 == 0:  # include a far-sentinel padding point
                obs = obs.at[2].set(jnp.asarray([1e4, 1e4, 1e4]))
            r = jnp.asarray(0.5 + marg * float(jnp.linalg.norm(pv[3:6])))
            g_ad = jax.grad(_collision_pv)(pv, obs, cp, r)
            h_ad = jax.hessian(_collision_pv)(pv, obs, cp, r)
            g_an, h_an = collision_quadratics(pv, obs, r, cp)
            np.testing.assert_allclose(np.asarray(g_an), np.asarray(g_ad), atol=1e-10)
            np.testing.assert_allclose(np.asarray(h_an), np.asarray(h_ad), atol=1e-9)


def test_barrier_extensions_default_to_reference():
    """lam_omni = margin_v = 0 reproduces the exact reference objective, and
    enabling them raises the cost of a tangential pass (the diagnosed
    collision mode: v perpendicular to the obstacle direction)."""
    from avoid_mpc_tpu.config import MPCWeights
    from avoid_mpc_tpu.models.costs import node_radius

    # tangential geometry: obstacle to the +y side, velocity along +x
    x = jnp.zeros(10).at[4].set(8.0)  # 8 m/s along x
    obs = jnp.asarray([[0.0, 0.8, 0.0]])  # 0.8 m to the side
    c_ref = float(collision_cost(x, obs, CP))
    # velocity gate ~0 -> barrier essentially dead in the reference cost
    assert c_ref < 1e-3

    cfg = MPCConfig(
        weights=MPCWeights(
            q_goal=CFG.weights.q_goal, q_path=CFG.weights.q_path,
            q_u=CFG.weights.q_u, collide_lambda=1.2, collide_lambda_omni=1.0,
        ),
    )
    cp2 = CostParams.from_config(cfg, dtype=jnp.float64)
    c_omni = float(collision_cost(x, obs, cp2))
    assert c_omni > 100.0 * max(c_ref, 1e-12)

    # speed margin: r_eff grows with the reference-path speed
    cfg3 = MPCConfig(margin_v=0.05)
    cp3 = CostParams.from_config(cfg3, dtype=jnp.float64)
    ref_fast = jnp.zeros(10).at[4].set(10.0)
    r_eff = float(node_radius(ref_fast, cp3))
    np.testing.assert_allclose(r_eff, 0.5 + 0.05 * 10.0, rtol=1e-12)
    c_margin = float(collision_cost(x, obs, cp3, radius=jnp.asarray(r_eff)))
    assert c_margin > c_ref
