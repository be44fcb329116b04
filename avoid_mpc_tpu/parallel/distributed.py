"""Multi-host initialization + the pod-slice Monte-Carlo entry.

The reference's process fabric is ROS topics on one machine; the TPU-native
scale-out is one SPMD program across hosts: every host runs the same code,
``jax.distributed.initialize`` wires the runtime, and the
('scenario','points') mesh spans the global device set — DCN carries only
the psum'd metric scalars (SURVEY.md §5 "Distributed communication backend").

Run on each host of a pod slice **by file path**, not ``-m``:

    python avoid_mpc_tpu/parallel/distributed.py --batch 8192 \
        --coordinator HOST:PORT --num-processes N --process-id I

(``python -m`` would import the package first, and its module-level constants
initialize a JAX backend before ``jax.distributed.initialize`` can run —
this file defers every package import until after bring-up for exactly that
reason.  On single-host environments it degrades to the local mesh.)

Multi-process validation: tests/test_distributed_multiproc.py runs this
end-to-end with 2 coordinated processes x 4 CPU devices and archives
MULTIPROC.json.
"""

from __future__ import annotations

import argparse


def initialize_if_needed(coordinator: str | None = None, num_processes: int | None = None, process_id: int | None = None):
    """Idempotent jax.distributed bring-up. No-ops on single-process runs
    unless explicit coordinates are given or JAX_COORDINATOR_ADDRESS is set."""
    import os

    import jax

    if coordinator or os.environ.get("JAX_COORDINATOR_ADDRESS"):
        try:
            jax.distributed.initialize(
                coordinator_address=coordinator,
                num_processes=num_processes,
                process_id=process_id,
            )
        except RuntimeError as e:
            # Tolerate ONLY the idempotent case.  Anything else (e.g. "must
            # be called before any backend is initialized" — the -m footgun,
            # see module docstring) must surface: swallowing it silently
            # degrades a coordinated run to N independent single-process
            # runs that still "pass".
            if "already initialized" not in str(e).lower():
                raise
    return jax.process_index(), jax.process_count()


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--batch", type=int, default=4096, help="global batch")
    parser.add_argument("--coordinator", default=None)
    parser.add_argument("--num-processes", type=int, default=None)
    parser.add_argument("--process-id", type=int, default=None)
    parser.add_argument("--points", type=int, default=512, help="cloud points/scenario")
    parser.add_argument("--out", default=None, help="write metrics JSON here (pid 0)")
    args = parser.parse_args(argv)

    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import NamedSharding, PartitionSpec as P

    pid, nproc = initialize_if_needed(args.coordinator, args.num_processes, args.process_id)

    from __graft_entry__ import _build_problem_batch
    from avoid_mpc_tpu.config import MPCConfig
    from avoid_mpc_tpu.ops.knn import knn
    from avoid_mpc_tpu.parallel import make_mesh, shard_solve, sharded_metrics
    from avoid_mpc_tpu.solver import SolverHyper, SolverParams
    from avoid_mpc_tpu.solver.ilqr import MPCProblem

    cfg = MPCConfig(mpc_T=0.66)
    sp = SolverParams.from_config(cfg)
    # 2-wide 'points' axis when the device count allows: the world-cloud
    # k-NN below then all_gathers across a REAL sharded axis.  Device order
    # interleaves the halves of the global device list so each points pair
    # spans them — in the 2-process topology that makes the all_gather a
    # genuine cross-process (DCN/Gloo) collective, not an intra-host one.
    n_pt = 2 if jax.device_count() % 2 == 0 else 1
    devs = np.asarray(jax.devices())
    if n_pt == 2:
        devs = devs.reshape(2, -1).T.reshape(-1)
    mesh = make_mesh(n_point_shards=n_pt, devices=devs)
    b = args.batch
    x0, ref, target, pts, mask = _build_problem_batch(b, cfg.horizon_steps, args.points, jnp.float32)
    us = jnp.zeros((b, cfg.horizon_steps, 4), jnp.float32).at[:, :, 2].set(9.81)
    _, obstacles = jax.jit(
        lambda r, p, m: jax.vmap(lambda a, b_, c: knn(a[:, 0:3], b_, c, 3))(r, p, m)
    )(ref, pts, mask)

    problems = MPCProblem(x0, ref, obstacles, target)
    if nproc > 1:
        # Multi-controller: every process builds the SAME deterministic
        # global batch (seeded), then assembles true global arrays — each
        # process donating the shards it owns on the ('scenario') axis.
        # This is the TPU-native analogue of the reference's per-node topic
        # fan-out (bfctrl_node.cpp:26-72): one SPMD program, data sharded
        # by scenario, DCN carrying only the psum'd metric scalars.
        sh = NamedSharding(mesh, P("scenario"))

        def globalize(a):
            host = np.asarray(a)
            return jax.make_array_from_callback(host.shape, sh, lambda idx: host[idx])

        problems = jax.tree.map(globalize, problems)
        us = globalize(us)

    res = shard_solve(mesh, problems, us, sp, SolverHyper())
    mean_cost, conv = sharded_metrics(mesh, res.cost, res.converged)
    mean_cost, conv = float(mean_cost), float(conv)

    # points-sharded world-cloud k-NN: one big cloud split over the 'points'
    # mesh axis, per-shard top-k all_gathered and merged (parallel/mesh.py).
    # Every process builds the same deterministic cloud and donates the rows
    # it owns; the replicated result is checksummed so the test can compare
    # process topologies bit-for-bit.
    from avoid_mpc_tpu.parallel import knn_sharded_points

    world_np = np.asarray(pts).reshape(-1, 3)[: 2048 * n_pt]
    wmask_np = np.ones(world_np.shape[0], bool)
    queries_np = np.asarray(x0[:64, 0:3])
    if nproc > 1:
        sh_pts = NamedSharding(mesh, P("points"))
        sh_rep = NamedSharding(mesh, P())
        world = jax.make_array_from_callback(
            world_np.shape, sh_pts, lambda idx: world_np[idx]
        )
        wmask = jax.make_array_from_callback(
            wmask_np.shape, sh_pts, lambda idx: wmask_np[idx]
        )
        queries = jax.make_array_from_callback(
            queries_np.shape, sh_rep, lambda idx: queries_np[idx]
        )
    else:
        world, wmask, queries = map(jnp.asarray, (world_np, wmask_np, queries_np))
    ds, _ = knn_sharded_points(mesh, queries, world, wmask, k=3)
    knn_checksum = float(jnp.sum(jax.device_get(ds)))
    if pid == 0:
        print(
            f"hosts={nproc} devices={jax.device_count()} batch={b} "
            f"mean_cost={mean_cost:.3f} converged={conv:.2f} "
            f"knn_checksum={knn_checksum:.6f}"
        )
        if args.out:
            import json

            with open(args.out, "w") as f:
                json.dump(
                    {
                        "num_processes": nproc,
                        "devices": jax.device_count(),
                        "local_devices": jax.local_device_count(),
                        "batch": b,
                        "mean_cost": mean_cost,
                        "converged_frac": conv,
                        "knn_sharded_checksum": knn_checksum,
                        "point_shards": n_pt,
                    },
                    f,
                )


if __name__ == "__main__":
    main()
