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
    # WEAK scaling: per-device batch fixed, global batch grows with the mesh.
    # The virtual "devices" are threads of one multi-core host, so the
    # speedup n*t_1/t_n measures how well shard_map + the psum metrics
    # collectives convert extra devices into throughput (bounded by host
    # cores; ideal flat-t weak scaling = n).  This is the single-host
    # stand-in for BASELINE.md's multi-host leg — it validates the sharded
    # program and bounds its overhead; absolute multi-chip speedup needs
    # real chips.
    b_per, n_pts = 8, 32
    cfg = MPCConfig(mpc_T=0.66)
    n = cfg.horizon_steps
    sp = SolverParams.from_config(cfg)
    hp = SolverHyper(iters=10)

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))
    from __graft_entry__ import _build_problem_batch

    curve = {}
    t_per = {}
    for nd in (1, 2, 4, 8):
        b = b_per * nd
        x0, ref, target, pts, mask = _build_problem_batch(b, n, n_pts, jnp.float32)
        from avoid_mpc_tpu.ops.knn import knn

        _, obstacles = jax.vmap(lambda r, p, m: knn(r[:, 0:3], p, m, k=3))(ref, pts, mask)
        problems = MPCProblem(x0=x0, ref=ref, obstacles=obstacles, target=target)
        us = jnp.zeros((b, n, 4), jnp.float32).at[:, :, 2].set(9.81)
        mesh = make_mesh(
            n_scenario_shards=nd, n_point_shards=1, devices=jax.devices()[:nd]
        )

        def run(pr, u, mesh=mesh):
            res = shard_solve(mesh, pr, u, sp, hp)
            # metrics reduction rides psum over the scenario axis
            return res, sharded_metrics(mesh, res.cost, res.converged)

        res = jax.block_until_ready(run(problems, us))  # compile + warm
        lat = []
        for _ in range(3):
            t0 = time.time()
            res = jax.block_until_ready(run(problems, us))
            lat.append(time.time() - t0)
        p50 = float(np.median(lat))
        t_per[nd] = p50
        curve[str(nd)] = {
            "global_batch": b,
            "p50_ms": round(p50 * 1e3, 2),
            "solves_per_sec": round(b / p50, 1),
        }

    for nd in (2, 4, 8):
        # throughput speedup vs the 1-device mesh (ideal = n)
        curve[str(nd)]["speedup_vs_1dev"] = round(nd * t_per[1] / t_per[nd], 3)
    print(json.dumps({
        "metric": "weak_scaling_virtual_cpu_mesh",
        "batch_per_device": b_per, "horizon": n, "devices": curve,
    }))


if __name__ == "__main__":
    main()
