"""Mesh sharding tests on the virtual 8-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np

from avoid_mpc_tpu.config import MPCConfig
from avoid_mpc_tpu.ops.knn import knn
from avoid_mpc_tpu.parallel import (
    knn_sharded_points,
    make_mesh,
    shard_solve,
    sharded_metrics,
)
from avoid_mpc_tpu.solver import SolverHyper, SolverParams, solve_batched
from avoid_mpc_tpu.solver.ilqr import MPCProblem, hover_warm_start

CFG = MPCConfig(mpc_T=0.33)  # N=10, keep tests quick
N = CFG.horizon_steps
SP = SolverParams.from_config(CFG, dtype=jnp.float64)
HP = SolverHyper(iters=4)


def batch_problems(b):
    rng = np.random.default_rng(0)
    x0 = np.zeros((b, 10))
    x0[:, 2] = 1.0
    x0[:, :2] += rng.uniform(-0.5, 0.5, (b, 2))
    ref = np.zeros((b, N, 10))
    ref[..., 0] = np.linspace(0, 3, N)[None]
    ref[..., 2] = 1.0
    target = ref[:, -1].copy()
    target[:, 4] = 5.0
    obstacles = np.full((b, N, 3, 3), 1e4)
    return MPCProblem(
        x0=jnp.asarray(x0), ref=jnp.asarray(ref),
        obstacles=jnp.asarray(obstacles), target=jnp.asarray(target),
    )


def test_mesh_shapes():
    m = make_mesh()
    assert m.devices.size == 8 and m.axis_names == ("scenario", "points")
    m2 = make_mesh(n_point_shards=2)
    assert m2.shape["scenario"] == 4 and m2.shape["points"] == 2


def test_shard_solve_matches_unsharded():
    b = 16
    problems = batch_problems(b)
    us0 = jnp.stack([hover_warm_start(N, dtype=jnp.float64)] * b)
    mesh = make_mesh()
    sharded = shard_solve(mesh, problems, us0, SP, HP)
    plain = solve_batched(problems, us0, SP, HP)
    np.testing.assert_allclose(np.asarray(sharded.us), np.asarray(plain.us), atol=1e-8)
    np.testing.assert_allclose(np.asarray(sharded.cost), np.asarray(plain.cost), rtol=1e-9)


def test_sharded_metrics_psum():
    b = 16
    mesh = make_mesh()
    costs = jnp.arange(b, dtype=jnp.float64)
    conv = jnp.asarray([True, False] * (b // 2))
    mean_cost, frac = sharded_metrics(mesh, costs, conv)
    np.testing.assert_allclose(float(mean_cost), np.arange(b).mean())
    np.testing.assert_allclose(float(frac), 0.5)


def test_knn_sharded_points_matches_dense():
    rng = np.random.default_rng(1)
    queries = jnp.asarray(rng.standard_normal((8, 3)))
    points = jnp.asarray(rng.standard_normal((1024, 3)))
    mask = jnp.asarray(rng.random(1024) > 0.2)
    mesh = make_mesh(n_scenario_shards=1, n_point_shards=8)
    ds, ps = knn_sharded_points(mesh, queries, points, mask, k=3)
    dd, pd = knn(queries, points, mask, k=3)
    np.testing.assert_allclose(np.asarray(ds), np.asarray(dd), rtol=1e-10, atol=1e-12)
    np.testing.assert_allclose(np.asarray(ps), np.asarray(pd), rtol=1e-12)


def test_two_axis_mesh_compose():
    """Scenario-sharded solve and points-sharded knn on one 4x2 mesh in one
    jitted step (the dryrun_multichip composition)."""
    mesh = make_mesh(n_scenario_shards=4, n_point_shards=2)
    b = 8
    problems = batch_problems(b)
    us0 = jnp.stack([hover_warm_start(N, dtype=jnp.float64)] * b)
    rng = np.random.default_rng(2)
    world = jnp.asarray(rng.standard_normal((256, 3)) * 10)
    wmask = jnp.ones(256, bool)

    res = shard_solve(mesh, problems, us0, SP, HP)
    mean_cost, frac = sharded_metrics(mesh, res.cost, res.converged)
    ds, ps = knn_sharded_points(mesh, problems.x0[:, 0:3], world, wmask, k=3)
    assert np.isfinite(float(mean_cost))
    assert ds.shape == (b, 3)
