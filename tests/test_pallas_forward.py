"""Fused line-search kernel vs the XLA reference (interpret mode)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.slow  # interpret-mode kernels: minutes on CPU

from avoid_mpc_tpu.config import MPCConfig
from avoid_mpc_tpu.models.costs import trajectory_cost
from avoid_mpc_tpu.solver.ilqr import (
    MPCProblem,
    SolverHyper,
    SolverParams,
    _affine_dynamics,
    _backward,
    _linearize,
)
from avoid_mpc_tpu.solver.pallas_forward import line_search_batched

CFG = MPCConfig(mpc_T=0.2)  # N = 6 (interpret mode is slow)
N = CFG.horizon_steps
SP = SolverParams.from_config(CFG, dtype=jnp.float32)


def build_case(b, seed=0):
    rng = np.random.default_rng(seed)
    Ad, Bd, cvec = _affine_dynamics(SP, jnp.float32)
    probs, uss, xss, kffs, Ks, dv1s, dv2s, costs = [], [], [], [], [], [], [], []
    for i in range(b):
        x0 = jnp.asarray(rng.standard_normal(10) * 0.4, jnp.float32).at[2].add(1.5)
        ref = jnp.asarray(rng.standard_normal((N, 10)), jnp.float32)
        obstacles = jnp.asarray(rng.standard_normal((N, 3, 3)) * 3 + 2, jnp.float32)
        target = jnp.asarray(rng.standard_normal(10), jnp.float32)
        us = jnp.asarray(rng.uniform(-2, 2, (N, 4)) + np.array([0, 0, 9.81, 0]), jnp.float32)
        us = jnp.clip(us, SP.u_lower, SP.u_upper)
        xs = [x0]
        for k in range(N):
            xs.append(Ad @ xs[-1] + Bd @ us[k] + cvec)
        xs = jnp.stack(xs)
        problem = MPCProblem(x0, ref, obstacles, target)
        cx, cxx, lu, luu = _linearize(problem, xs, us, SP)
        kff, K, dV1, dV2, pg = _backward(
            us, Ad, Bd, cx, cxx, lu, luu, jnp.float32(1e-4), SP, SolverHyper()
        )
        cost = trajectory_cost(xs, us, ref, obstacles, target, SP.cost)
        probs.append(problem); uss.append(us); xss.append(xs)
        kffs.append(kff); Ks.append(K); dv1s.append(dV1); dv2s.append(dV2)
        costs.append(cost)
    stack = lambda xs_: jnp.stack(xs_)
    batch_p = jax.tree.map(lambda *a: jnp.stack(a), *probs)
    return (Ad, Bd, cvec, batch_p, stack(uss), stack(xss), stack(kffs),
            stack(Ks), stack(dv1s), stack(dv2s), stack(costs))


def xla_line_search(problem, us, xs, kff, K, dV1, dV2, cost, n_alphas=8):
    """Reference implementation (mirrors ilqr line_search_xla)."""
    from avoid_mpc_tpu.models.quadrotor import rk4_step

    Ad, Bd, cvec = _affine_dynamics(SP, jnp.float32)
    alphas = jnp.asarray(2.0 ** -jnp.arange(n_alphas), jnp.float32)
    big = jnp.asarray(np.finfo(np.float32).max / 8, jnp.float32)

    def rollout(alpha):
        def step(x, inp):
            u_k, x_k, k_k, K_k = inp
            u = jnp.clip(u_k + alpha * k_k + K_k @ (x - x_k), SP.u_lower, SP.u_upper)
            x_next = Ad @ x + Bd @ u + cvec
            return x_next, (x_next, u)

        _, (xs_n, us_n) = jax.lax.scan(step, problem.x0, (us, xs[:-1], kff, K))
        xs_n = jnp.concatenate([problem.x0[None], xs_n])
        c = trajectory_cost(xs_n, us_n, problem.ref, problem.obstacles, problem.target, SP.cost)
        return c, xs_n, us_n

    costs_a, xs_a, us_a = jax.vmap(rollout)(alphas)
    costs_a = jnp.where(jnp.isfinite(costs_a), costs_a, big)
    expected = alphas * dV1 + alphas**2 * dV2
    ok = (cost - costs_a) > 1e-4 * jnp.maximum(-expected, 0.0)
    any_ok = jnp.any(ok)
    best = jnp.argmin(jnp.where(ok, costs_a, big))
    return (
        jnp.where(any_ok, us_a[best], us),
        jnp.where(any_ok, xs_a[best], xs),
        jnp.where(any_ok, costs_a[best], cost),
        any_ok,
    )


def test_fused_line_search_matches_xla():
    b = 4
    Ad, Bd, cvec, problems, us, xs, kff, K, dV1, dV2, cost = build_case(b)
    cp = SP.cost
    us_p, xs_p, cost_p, ok_p = line_search_batched(
        Ad, Bd, cvec, SP.u_lower, SP.u_upper, cp.q_goal, cp.q_path, cp.q_u,
        cp.collide_lambda, cp.drone_radius,
        problems.x0, us, xs, kff, K, problems.ref, problems.obstacles,
        problems.target, dV1, dV2, cost,
        n_alphas=4, block_b=8, interpret=True,
    )
    for i in range(b):
        u_r, x_r, c_r, ok_r = xla_line_search(
            MPCProblem(problems.x0[i], problems.ref[i], problems.obstacles[i], problems.target[i]),
            us[i], xs[i], kff[i], K[i], dV1[i], dV2[i], cost[i], n_alphas=4,
        )
        assert bool(ok_p[i]) == bool(ok_r), i
        if bool(ok_r):
            np.testing.assert_allclose(np.asarray(us_p[i]), np.asarray(u_r), rtol=2e-4, atol=2e-4)
            np.testing.assert_allclose(np.asarray(xs_p[i]), np.asarray(x_r), rtol=2e-4, atol=2e-4)
            np.testing.assert_allclose(float(cost_p[i]), float(c_r), rtol=2e-4)


def test_fused_line_search_padding():
    b = 5
    Ad, Bd, cvec, problems, us, xs, kff, K, dV1, dV2, cost = build_case(b, seed=3)
    cp = SP.cost
    us_p, xs_p, cost_p, ok_p = line_search_batched(
        Ad, Bd, cvec, SP.u_lower, SP.u_upper, cp.q_goal, cp.q_path, cp.q_u,
        cp.collide_lambda, cp.drone_radius,
        problems.x0, us, xs, kff, K, problems.ref, problems.obstacles,
        problems.target, dV1, dV2, cost,
        n_alphas=4, block_b=8, interpret=True,
    )
    assert us_p.shape == (b, N, 4) and xs_p.shape == (b, N + 1, 10)
    assert np.isfinite(np.asarray(cost_p)).all()
