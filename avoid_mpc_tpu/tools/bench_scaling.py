"""Scaling-efficiency sweep on a virtual CPU device mesh (1 -> 2 -> 4 -> 8).

Stand-in for the BASELINE.md multi-host leg (1 chip / 1 host / >=2 hosts):
scenario-DP ``shard_solve`` over a forced-host-device mesh measures the
sharding machinery's overhead (dispatch + psum metrics reduction); the
solves themselves are embarrassingly parallel, so efficiency ~1.0 is the
pass criterion.  Run via ``bench_matrix`` (which sets JAX_PLATFORMS=cpu and
--xla_force_host_platform_device_count=8 in a subprocess) or standalone with
those set in the environment.

Prints one JSON line.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))


def main():
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np

    from avoid_mpc_tpu.config import MPCConfig
    from avoid_mpc_tpu.parallel import make_mesh, shard_solve, sharded_metrics
    from avoid_mpc_tpu.solver import SolverHyper, SolverParams
    from avoid_mpc_tpu.solver.ilqr import MPCProblem

    assert jax.device_count() >= 8, jax.devices()
    # sized for CPU wall-clock: the curve measures sharding overhead, not
    # absolute throughput (that's the TPU configs' job)
    b, n_pts = 128, 32
    cfg = MPCConfig(mpc_T=0.66)
    n = cfg.horizon_steps
    sp = SolverParams.from_config(cfg)
    hp = SolverHyper(iters=10)

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))
    from __graft_entry__ import _build_problem_batch

    x0, ref, target, pts, mask = _build_problem_batch(b, n, n_pts, jnp.float32)
    from avoid_mpc_tpu.ops.knn import knn

    _, obstacles = jax.vmap(lambda r, p, m: knn(r[:, 0:3], p, m, k=3))(ref, pts, mask)
    problems = MPCProblem(x0=x0, ref=ref, obstacles=obstacles, target=target)
    us = jnp.zeros((b, n, 4), jnp.float32).at[:, :, 2].set(9.81)

    curve = {}
    t_per = {}
    for nd in (1, 2, 4, 8):
        mesh = make_mesh(
            n_scenario_shards=nd, n_point_shards=1, devices=jax.devices()[:nd]
        )

        def run(pr, u, mesh=mesh):
            return shard_solve(mesh, pr, u, sp, hp)

        res = jax.block_until_ready(run(problems, us))  # compile + warm
        lat = []
        for _ in range(3):
            t0 = time.time()
            res = jax.block_until_ready(run(problems, us))
            lat.append(time.time() - t0)
        p50 = float(np.median(lat))
        t_per[nd] = p50
        curve[str(nd)] = {
            "p50_ms": round(p50 * 1e3, 2),
            "solves_per_sec": round(b / p50, 1),
        }
        # metrics reduction rides psum over the scenario axis
        _ = sharded_metrics(mesh, res.cost, res.converged)

    for nd in (2, 4, 8):
        # fixed total batch: ideal is t_1/n, so efficiency = t_1 / (n * t_n)
        curve[str(nd)]["efficiency_vs_1dev"] = round(t_per[1] / (nd * t_per[nd]), 3)
    print(json.dumps({
        "metric": "scaling_curve_virtual_cpu_mesh",
        "batch": b, "horizon": n, "devices": curve,
    }))


if __name__ == "__main__":
    main()
