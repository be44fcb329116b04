"""Scale-out: scenario data parallelism + sharded-cloud queries on a mesh.

The reference's "distributed system" is three ROS nodes and a TCP RPC link on
one machine (SURVEY.md §2.5).  The TPU-native scale axis is different in
kind: thousands of independent MPC scenarios sharded over a
``jax.sharding.Mesh`` (axis ``'scenario'``), with a second axis
(``'points'``) for sharding one large world point cloud across chips when
every scenario queries shared geometry.

Collective usage:
- metrics reductions ride ``psum`` over the scenario axis (solves are
  embarrassingly parallel — ICI traffic is a few scalars),
- the sharded-cloud k-NN does local top-k then ``all_gather`` of the
  per-shard candidates (k per shard, not the cloud) and a final merge — the
  reduction pattern that replaces the reference's per-frame thread fan-out
  (``FrameKDMap.cpp:346-365``) at pod scale.

Multi-host: the same code runs under ``jax.distributed.initialize`` — the
mesh spans all global devices; DCN only carries the scalar reductions.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from avoid_mpc_tpu.ops.knn import knn
from avoid_mpc_tpu.solver.ilqr import (
    MPCProblem,
    SolverHyper,
    SolverParams,
    solve_batched,
)


def make_mesh(
    n_scenario_shards: int | None = None,
    n_point_shards: int = 1,
    devices=None,
) -> Mesh:
    """A ('scenario', 'points') mesh over the available devices."""
    devices = np.asarray(devices if devices is not None else jax.devices())
    n = devices.size
    if n_scenario_shards is None:
        n_scenario_shards = n // n_point_shards
    assert n_scenario_shards * n_point_shards == n, (n_scenario_shards, n_point_shards, n)
    return Mesh(
        devices.reshape(n_scenario_shards, n_point_shards), ("scenario", "points")
    )


def shard_solve(
    mesh: Mesh,
    problems: MPCProblem,
    us_init: jax.Array,
    sp: SolverParams,
    hp: SolverHyper = SolverHyper(),
):
    """Scenario-sharded batched solve: each device solves its shard of the
    Monte-Carlo batch; results stay device-resident (no gather)."""

    @partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(P("scenario"), P("scenario")),
        out_specs=P("scenario"),
        check_vma=False,
    )
    def run(problems, us_init):
        return solve_batched(problems, us_init, sp, hp)

    return run(problems, us_init)


def sharded_metrics(mesh: Mesh, costs: jax.Array, converged: jax.Array):
    """Global mean cost + convergence fraction via psum over the scenario
    axis — the cross-chip reduction of the benchmark harness."""

    @partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(P("scenario"), P("scenario")),
        out_specs=P(),
        check_vma=False,
    )
    def reduce_(costs, converged):
        local = jnp.stack(
            [jnp.sum(costs), jnp.sum(converged.astype(costs.dtype)),
             jnp.asarray(costs.shape[0], costs.dtype)]
        )
        total = jax.lax.psum(local, axis_name="scenario")
        return jnp.stack([total[0] / total[2], total[1] / total[2]])

    out = reduce_(costs, converged)
    return out[0], out[1]


def knn_sharded_points(
    mesh: Mesh,
    queries: jax.Array,
    points: jax.Array,
    mask: jax.Array,
    k: int,
):
    """k-NN against one big world cloud sharded over the 'points' axis.

    Queries are replicated across point shards; each shard computes its local
    top-k; the (n_shards, Q, k) candidates are all-gathered (k values per
    shard — tiny ICI payload) and merged to the global top-k.
    """

    @partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(P(), P("points"), P("points")),
        out_specs=(P(), P()),
        check_vma=False,
    )
    def run(queries, pts_shard, mask_shard):
        d_local, p_local = knn(queries, pts_shard, mask_shard, k)
        d_all = jax.lax.all_gather(d_local, "points")  # (S, Q, k)
        p_all = jax.lax.all_gather(p_local, "points")  # (S, Q, k, 3)
        s = d_all.shape[0]
        q = queries.shape[0]
        d_cat = jnp.moveaxis(d_all, 0, 1).reshape(q, s * k)
        p_cat = jnp.moveaxis(p_all, 0, 1).reshape(q, s * k, 3)
        d2 = jnp.where(jnp.isfinite(d_cat), d_cat, jnp.inf)
        neg, idx = jax.lax.top_k(-d2, k)
        best_p = jnp.take_along_axis(p_cat, idx[..., None], axis=1)
        return -neg, best_p

    return run(queries, points, mask)
