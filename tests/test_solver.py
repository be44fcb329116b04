"""Solver tests: box-constrained iLQR vs scipy golden oracle + KKT checks.

The golden scenario is the reference's own offline benchmark
(``tools/mpc_obstacle_casadi.py:429-552``): start at origin, goal at
(5, 0.1, 1), a 10x10-point cylinder of obstacles at x=1 with radius 0.1,
3 nearest obstacle points per stage.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from scipy.optimize import minimize
from sklearn.neighbors import KDTree

from avoid_mpc_tpu.config import GRAVITY, MPCConfig
from avoid_mpc_tpu.models.costs import CostParams, trajectory_cost
from avoid_mpc_tpu.models.quadrotor import DynamicsParams, rollout
from avoid_mpc_tpu.solver import (
    MPCProblem,
    SolverHyper,
    SolverParams,
    solve,
    solve_batched,
)
from avoid_mpc_tpu.solver.ilqr import hover_warm_start

CFG = MPCConfig()
N = CFG.horizon_steps
SP64 = SolverParams.from_config(CFG, dtype=jnp.float64)
HP = SolverHyper(iters=30)  # generous budget for parity tests


def cylinder_obstacles():
    """The reference benchmark obstacle field (:449-456)."""
    pts = []
    for z in np.linspace(0, 3, 10):
        for theta in np.linspace(0, 2 * 3.14, 10):
            pts.append([0.1 * np.cos(theta) + 1.0, 0.1 * np.sin(theta), z])
    return np.asarray(pts)


def reference_benchmark_problem(obstacle_free=False):
    """Straight-line ref from p_init to p_goal with 3-NN obstacle assoc
    (reference :448-498)."""
    p_init = np.array([0.0, 0.0, 1.0, 0, 0, 0, 0, 0, 0, 0.0])
    p_goal = np.array([5.0, 0.1, 1.0, 0, 0, 0, 0, 0, 0, 0.0])
    dp = (p_goal - p_init) / N
    ref = np.stack([p_init + i * dp for i in range(N)])
    if obstacle_free:
        obstacles = np.full((N, 3, 3), 1e4)
    else:
        obs_pts = cylinder_obstacles()
        tree = KDTree(obs_pts)
        _, idx = tree.query(ref[:, 0:3], k=3)
        obstacles = obs_pts[idx]  # (N, 3, 3)
    return MPCProblem(
        x0=jnp.asarray(p_init),
        ref=jnp.asarray(ref),
        obstacles=jnp.asarray(obstacles),
        target=jnp.asarray(p_goal),
    )


def scipy_golden(problem, u_init, maxiter=500):
    """Golden oracle: same NLP, solved by an independent optimizer (SLSQP)
    in f64 with exact JAX gradients of the (separately validated) objective."""

    def cost_np(z):
        us = jnp.asarray(z.reshape(N, 4))
        xs = rollout(problem.x0, us, SP64.dt, SP64.dyn)
        return float(trajectory_cost(xs, us, problem.ref, problem.obstacles, problem.target, SP64.cost))

    grad_fn = jax.jit(
        jax.grad(
            lambda z: trajectory_cost(
                rollout(problem.x0, z.reshape(N, 4), SP64.dt, SP64.dyn),
                z.reshape(N, 4), problem.ref, problem.obstacles, problem.target, SP64.cost,
            )
        )
    )
    bounds = [
        (float(lo), float(hi))
        for _ in range(N)
        for lo, hi in zip(np.asarray(SP64.u_lower), np.asarray(SP64.u_upper))
    ]
    res = minimize(
        cost_np,
        np.asarray(u_init, dtype=np.float64).ravel(),
        jac=lambda z: np.asarray(grad_fn(jnp.asarray(z))),
        method="SLSQP",
        bounds=bounds,
        options={"maxiter": maxiter, "ftol": 1e-12},
    )
    return res.x.reshape(N, 4), res


def projected_grad_norm(problem, us, sp):
    """Solver-independent KKT stationarity check: sup-norm of the gradient of
    the reduced cost, projected on the feasible directions of the u box."""
    g = jax.grad(
        lambda u: trajectory_cost(
            rollout(problem.x0, u, sp.dt, sp.dyn), u,
            problem.ref, problem.obstacles, problem.target, sp.cost,
        )
    )(us)
    at_lo = (us <= sp.u_lower + 1e-9) & (g > 0)
    at_hi = (us >= sp.u_upper - 1e-9) & (g < 0)
    return float(jnp.max(jnp.abs(jnp.where(at_lo | at_hi, 0.0, g))))


@pytest.fixture(scope="module")
def free_solution():
    problem = reference_benchmark_problem(obstacle_free=True)
    us0 = hover_warm_start(N, dtype=jnp.float64)
    res = jax.jit(lambda p, u: solve(p, u, SP64, HP))(problem, us0)
    return problem, res


def reassociate(problem, xs):
    """Re-associate 3-NN obstacles along the predicted trajectory — the
    reference's outer loop body (tools/mpc_obstacle_casadi.py:506-534)."""
    obs_pts = cylinder_obstacles()
    tree = KDTree(obs_pts)
    traj = np.asarray(xs[1 : N + 1, 0:3])
    _, idx = tree.query(traj, k=3)
    return problem._replace(obstacles=jnp.asarray(obs_pts[idx])), idx[:, 0]


@pytest.fixture(scope="module")
def obstacle_solution():
    """Solve to the obstacle re-association fixed point (the reference
    benchmark protocol): solve -> re-query 3-NN from the predicted
    trajectory -> repeat until the nearest association stabilizes."""
    problem = reference_benchmark_problem(obstacle_free=False)
    us = hover_warm_start(N, dtype=jnp.float64)
    solver = jax.jit(lambda p, u: solve(p, u, SP64, HP))
    prev_idx = None
    for _ in range(12):
        res = solver(problem, us)
        us = res.us
        problem, idx = reassociate(problem, res.xs)
        if prev_idx is not None and np.array_equal(idx, prev_idx):
            break
        prev_idx = idx
    res = solver(problem, us)  # final solve at the fixed-point association
    return problem, res


def test_obstacle_free_matches_scipy_golden(free_solution):
    problem, res = free_solution
    us_gold, sres = scipy_golden(problem, np.asarray(res.us))
    assert sres.success, sres.message
    np.testing.assert_allclose(np.asarray(res.us), us_gold, atol=1e-3)
    # the command actually flown is us[0] — the tight tolerance target
    np.testing.assert_allclose(np.asarray(res.us[0]), us_gold[0], atol=1e-3)


def test_obstacle_scenario_matches_scipy_golden(obstacle_solution):
    problem, res = obstacle_solution
    us_gold, sres = scipy_golden(problem, np.asarray(res.us))
    assert sres.success, sres.message
    np.testing.assert_allclose(np.asarray(res.us), us_gold, atol=1e-3)
    cost_gold = sres.fun
    assert float(res.cost) <= cost_gold + 1e-4


def test_kkt_stationarity(free_solution, obstacle_solution):
    for problem, res in (free_solution, obstacle_solution):
        pg = projected_grad_norm(problem, res.us, SP64)
        assert pg < 5e-4, pg
        assert bool(res.converged)


def test_bounds_respected(obstacle_solution):
    _, res = obstacle_solution
    us = np.asarray(res.us)
    assert np.all(us >= np.asarray(SP64.u_lower) - 1e-12)
    assert np.all(us <= np.asarray(SP64.u_upper) + 1e-12)


def test_warm_start_monotone(obstacle_solution):
    """Re-solving from the solution must not increase cost (warm-start carry,
    the mNlpW0 analogue)."""
    problem, res = obstacle_solution
    res2 = solve(problem, res.us, SP64, SolverHyper(iters=3))
    assert float(res2.cost) <= float(res.cost) + 1e-8


def test_batched_matches_individual():
    problems = []
    for free in (True, False):
        problems.append(reference_benchmark_problem(obstacle_free=free))
    batch = jax.tree.map(lambda *a: jnp.stack(a), *problems)
    us0 = jnp.stack([hover_warm_start(N, dtype=jnp.float64)] * 2)
    hp = SolverHyper(iters=8)
    bres = solve_batched(batch, us0, SP64, hp)
    for i, p in enumerate(problems):
        single = solve(p, us0[i], SP64, hp)
        # vmap changes XLA fusion order; the iterative line-search argmin can
        # amplify ulp-level differences, so compare at convergence tolerance.
        np.testing.assert_allclose(np.asarray(bres.us[i]), np.asarray(single.us), atol=1e-6)
        np.testing.assert_allclose(float(bres.cost[i]), float(single.cost), rtol=1e-9)


def test_f32_close_to_f64(obstacle_solution):
    """f32 (TPU dtype) stays within the parity budget of the f64 optimum.

    Warm-started from the f64 solution: a cold start may legitimately pick
    the opposite side of the (nearly symmetric) cylinder — a different local
    minimum, not a precision matter. Warm-starting pins the basin, which is
    also how the solver always runs in the receding-horizon loop.
    """
    problem, res64 = obstacle_solution
    sp32 = SolverParams.from_config(CFG, dtype=jnp.float32)
    p32 = jax.tree.map(lambda a: jnp.asarray(a, dtype=jnp.float32), problem)
    res32 = solve(MPCProblem(*p32), jnp.asarray(res64.us, dtype=jnp.float32), sp32, HP)
    assert res32.us.dtype == jnp.float32
    np.testing.assert_allclose(np.asarray(res32.us[0]), np.asarray(res64.us[0]), atol=5e-3)
    assert np.all(np.isfinite(np.asarray(res32.us)))


def test_unsmoothed_objective_oracle(obstacle_solution):
    """Closes the oracle-circularity gap (VERDICT r2): both scipy_golden and
    the solver optimize the SMOOTHED |v.dir| (sqrt(z^2+1e-8)); the exact-abs
    reference NLP (ca.norm_2 of a scalar, tools/mpc_obstacle_casadi.py:197-199)
    was never solved by anything.  Here the fully NumPy-independent oracle
    (tests/oracles.py::solve_nlp_slsqp, no JAX anywhere in its chain) solves
    the UNSMOOTHED objective on the cylinder fixed point, warm-started from
    the smoothed optimum so both land in the same basin, and the two optima
    must agree within the 1e-3 parity budget (the smoothing-induced objective
    error bound is sqrt(eps) = 1e-4)."""
    from tests.oracles import rollout as np_rollout
    from tests.oracles import solve_nlp_slsqp, stage_costs

    problem, res = obstacle_solution
    w = CFG.weights
    args = dict(
        x0=np.asarray(problem.x0),
        ref=np.asarray(problem.ref),
        obstacles=np.asarray(problem.obstacles),
        target=np.asarray(problem.target),
        dt=CFG.mpc_dt,
        tau=CFG.tau,
        q_goal=np.asarray(w.q_goal),
        q_path=np.asarray(w.q_path),
        q_u=np.asarray(w.q_u),
        lam=w.collide_lambda,
        radius=CFG.drone_radius,
        u_lower=np.asarray(CFG.u_lower),
        u_upper=np.asarray(CFG.u_upper),
        n=N,
    )
    us_exact, xs_exact, sres = solve_nlp_slsqp(
        u_init=np.asarray(res.us), abs_smoothing=0.0, maxiter=200, **args
    )
    # SLSQP may stop on the kink's FD-gradient noise; what matters is that it
    # could not move materially away from the smoothed optimum.
    np.testing.assert_allclose(np.asarray(res.us), us_exact, atol=1e-3)
    np.testing.assert_allclose(np.asarray(res.us[0]), us_exact[0], atol=1e-3)
    # and the exact-objective VALUES agree at both points within the smoothing
    # error bound (scaled by the total barrier mass).
    cost_at_ours = stage_costs(
        np_rollout(args["x0"], np.asarray(res.us), CFG.mpc_dt, CFG.tau),
        np.asarray(res.us),
        args["ref"], args["obstacles"], args["target"], args["q_goal"],
        args["q_path"], args["q_u"], args["lam"], args["radius"],
        abs_smoothing=0.0,
    )
    cost_exact = stage_costs(
        xs_exact, us_exact, args["ref"], args["obstacles"], args["target"],
        args["q_goal"], args["q_path"], args["q_u"], args["lam"],
        args["radius"], abs_smoothing=0.0,
    )
    assert abs(float(cost_at_ours) - float(cost_exact)) < 1e-3, (
        cost_at_ours, cost_exact,
    )


def test_active_bounds_scenario():
    """An aggressive target saturates the xy accel bounds; solution must sit
    on the bound with inward-pointing gradient (KKT at active set)."""
    problem = reference_benchmark_problem(obstacle_free=True)
    target = np.asarray(problem.target).copy()
    target[0] = 50.0  # unreachable -> max accel
    aggressive_w = dataclasses.replace(
        CFG,
        weights=dataclasses.replace(CFG.weights, q_goal=(500.0, 50, 100, 100, 1, 1, 1, 0, 0, 0)),
    )
    sp = SolverParams.from_config(aggressive_w, dtype=jnp.float64)
    problem = problem._replace(target=jnp.asarray(target))
    res = solve(problem, hover_warm_start(N, dtype=jnp.float64), sp, HP)
    us = np.asarray(res.us)
    assert us[:, 0].max() >= float(sp.u_upper[0]) - 1e-6  # ax bound active
    pg = projected_grad_norm(problem, res.us, sp)
    assert pg < 5e-3, pg


@pytest.mark.slow
def test_interior_point_oracle(obstacle_solution):
    """Second independent oracle, interior-point family (VERDICT r4 item 3):
    the reference's IPOPT (HighLvlMpc.cpp:50-52) is an interior-point
    method, so agreement with scipy trust-constr (barrier interior point,
    pure-NumPy objective, no JAX in the chain) at the re-association fixed
    point closes the algorithm-family gap the SLSQP oracle leaves open.
    Criterion: control trajectories within 1e-3 (BASELINE.md)."""
    from tests.oracles import solve_nlp_trust_constr

    problem, res = obstacle_solution
    w = CFG.weights
    us_ip, xs_ip, sres = solve_nlp_trust_constr(
        x0=np.asarray(problem.x0),
        ref=np.asarray(problem.ref),
        obstacles=np.asarray(problem.obstacles),
        target=np.asarray(problem.target),
        dt=CFG.mpc_dt,
        tau=CFG.tau,
        q_goal=np.asarray(w.q_goal),
        q_path=np.asarray(w.q_path),
        q_u=np.asarray(w.q_u),
        lam=w.collide_lambda,
        radius=CFG.drone_radius,
        u_lower=np.asarray(CFG.u_lower),
        u_upper=np.asarray(CFG.u_upper),
        n=N,
        u_init=np.asarray(res.us),
        maxiter=150,
    )
    # the interior-point optimum and the box-iLQR optimum must agree on the
    # whole control trajectory, and tightest on the command actually flown
    np.testing.assert_allclose(np.asarray(res.us), us_ip, atol=1e-3)
    np.testing.assert_allclose(np.asarray(res.us[0]), us_ip[0], atol=1e-3)
