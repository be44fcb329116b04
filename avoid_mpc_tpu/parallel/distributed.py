"""Multi-host initialization + the pod-slice Monte-Carlo entry.

The reference's process fabric is ROS topics on one machine; the TPU-native
scale-out is one SPMD program across hosts: every host runs the same code,
``jax.distributed.initialize`` wires the runtime, and the
('scenario','points') mesh spans the global device set — DCN carries only
the psum'd metric scalars (SURVEY.md §5 "Distributed communication backend").

Run on each host of a pod slice:

    python -m avoid_mpc_tpu.parallel.distributed --batch 8192

(on single-host environments this degrades to the local mesh; the multi-host
path is validated by the driver's virtual-device dryrun since this machine
has one chip).
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
        except RuntimeError:
            pass  # already initialized
    return jax.process_index(), jax.process_count()


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--batch", type=int, default=4096, help="global batch")
    parser.add_argument("--coordinator", default=None)
    parser.add_argument("--num-processes", type=int, default=None)
    parser.add_argument("--process-id", type=int, default=None)
    args = parser.parse_args(argv)

    import jax
    import jax.numpy as jnp

    pid, nproc = initialize_if_needed(args.coordinator, args.num_processes, args.process_id)

    from __graft_entry__ import _build_problem_batch
    from avoid_mpc_tpu.config import MPCConfig
    from avoid_mpc_tpu.ops.knn import knn
    from avoid_mpc_tpu.parallel import make_mesh, shard_solve, sharded_metrics
    from avoid_mpc_tpu.solver import SolverHyper, SolverParams
    from avoid_mpc_tpu.solver.ilqr import MPCProblem

    cfg = MPCConfig(mpc_T=0.66)
    sp = SolverParams.from_config(cfg)
    mesh = make_mesh()
    b = args.batch
    x0, ref, target, pts, mask = _build_problem_batch(b, cfg.horizon_steps, 512, jnp.float32)
    us = jnp.zeros((b, cfg.horizon_steps, 4), jnp.float32).at[:, :, 2].set(9.81)
    _, obstacles = jax.jit(
        lambda r, p, m: jax.vmap(lambda a, b_, c: knn(a[:, 0:3], b_, c, 3))(r, p, m)
    )(ref, pts, mask)
    res = shard_solve(mesh, MPCProblem(x0, ref, obstacles, target), us, sp, SolverHyper())
    mean_cost, conv = sharded_metrics(mesh, res.cost, res.converged)
    if pid == 0:
        print(
            f"hosts={nproc} devices={jax.device_count()} batch={b} "
            f"mean_cost={float(mean_cost):.3f} converged={float(conv):.2f}"
        )


if __name__ == "__main__":
    main()
