"""Offline solver harness — the ``tools/mpc_obstacle_casadi.py`` __main__.

The reference's offline tool builds the NLP from the YAML config, runs a
cylinder-obstacle closed-loop benchmark (100 warm-up solves, then the timed
3-NN re-association loop), prints the wall time, saves a 3-D plot to
``test/mpc.png``, and emits a ``description.yaml`` provenance file next to
the generated artifact (``tools/mpc_obstacle_casadi.py:266-308, 429-552``).

This tool does the same against the JAX solver: there is no codegen artifact
(XLA compiles at trace time), so "generation" is jit warm-up, and the
provenance file describes the solver configuration instead of an ``.so``.

Usage:  python -m avoid_mpc_tpu.tools.offline_benchmark [--config path.yaml]
"""

from __future__ import annotations

import argparse
import os
import time

import numpy as np


def cylinder_obstacles() -> np.ndarray:
    """The reference benchmark field (:449-456): 10 rings x 10 angles on a
    0.1 m cylinder at (1, 0)."""
    pts = []
    for z in np.linspace(0, 3, 10):
        for theta in np.linspace(0, 2 * 3.14, 10):
            pts.append([0.1 * np.cos(theta) + 1.0, 0.1 * np.sin(theta), z])
    return np.asarray(pts)


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--config", default=None, help="mpc_parameters.yaml path")
    parser.add_argument("--out-dir", default=None)
    parser.add_argument("--warmup", type=int, default=100)
    parser.add_argument("--plot", action="store_true", default=True)
    parser.add_argument("--f64", action="store_true", help="run in float64 (CPU)")
    args = parser.parse_args(argv)

    import jax
    import jax.numpy as jnp
    import yaml

    from avoid_mpc_tpu.config import load_config
    from avoid_mpc_tpu.ops.knn import knn
    from avoid_mpc_tpu.solver import SolverHyper, SolverParams, solve
    from avoid_mpc_tpu.solver.ilqr import MPCProblem, hover_warm_start

    if args.f64:
        jax.config.update("jax_enable_x64", True)
    dtype = jnp.float64 if args.f64 else jnp.float32

    cfg = load_config(args.config).mpc
    n = cfg.horizon_steps
    sp = SolverParams.from_config(cfg, dtype=dtype)
    hp = SolverHyper.from_config(cfg)

    obstacles_pts = jnp.asarray(cylinder_obstacles(), dtype=dtype)
    obs_mask = jnp.ones(obstacles_pts.shape[0], dtype=bool)
    p_init = jnp.zeros(10, dtype=dtype).at[2].set(1.0)
    p_goal = jnp.zeros(10, dtype=dtype).at[0].set(5.0).at[1].set(0.1).at[2].set(1.0)
    ref0 = p_init + (p_goal - p_init) * jnp.linspace(0, 1, n, endpoint=False, dtype=dtype)[:, None]

    @jax.jit
    def solve_once(ref, us):
        _, obs = knn(ref[:, 0:3], obstacles_pts, obs_mask, k=cfg.nearest_point_count)
        res = solve(MPCProblem(p_init, ref, obs, p_goal), us, sp, hp)
        return res.us, res.xs, res.cost

    us = hover_warm_start(n, dtype=dtype)
    ref = ref0

    # warm-up: jit compile + the reference's 100 warm solves (:499-503)
    t0 = time.time()
    us, xs, cost = jax.block_until_ready(solve_once(ref, us))
    compile_s = time.time() - t0
    for _ in range(args.warmup):
        us, xs, cost = solve_once(ref, us)
    jax.block_until_ready(us)

    # timed re-association loop (:506-534): re-query 3-NN from the predicted
    # trajectory, resolve, stop when the nearest association stabilizes
    prev = None
    t0 = time.time()
    for it in range(cfg.mpc_max_iter):
        ref = xs[:n]
        us, xs, cost = solve_once(ref, us)
        _, obs_now = knn(xs[1 : n + 1, 0:3], obstacles_pts, obs_mask, k=1)
        key = np.asarray(obs_now[:, 0, :])
        if prev is not None and np.allclose(key, prev):
            break
        prev = key
    jax.block_until_ready(us)
    elapsed = time.time() - t0
    print(f"Time: {elapsed}")
    print(
        f"compile: {compile_s:.1f}s | final cost: {float(cost):.4f} | "
        f"outer iters: {it + 1} | device: {jax.devices()[0]}"
    )

    out_dir = args.out_dir or os.path.join(os.path.dirname(__file__), "..", "..", "test")
    os.makedirs(out_dir, exist_ok=True)

    if args.plot:
        import matplotlib

        matplotlib.use("Agg")
        from matplotlib import pyplot as plt

        traj = np.asarray(xs[:, :3])
        fig = plt.figure()
        ax = fig.add_subplot(111, projection="3d")
        ax.plot(traj[:, 0], traj[:, 1], traj[:, 2])
        o = np.asarray(obstacles_pts)
        ax.scatter(o[:, 0], o[:, 1], o[:, 2], c="b", marker="o", s=5)
        ax.scatter(5.0, 0.1, 1.0, c="r", marker="o", s=5)
        ax.scatter(0, 0, 1, c="g", marker="*", s=5)
        plt.savefig(os.path.join(out_dir, "mpc.png"))
        print(f"saved {os.path.join(out_dir, 'mpc.png')}")

    # provenance (the description.yaml analogue, :266-288)
    desc = {
        "date": time.strftime("%Y-%m-%d %H:%M:%S"),
        "s_dim": 10,
        "u_dim": 4,
        "obstacle_dim": 3,
        "weights_dim": 25,
        "T": cfg.mpc_T,
        "dt": cfg.mpc_dt,
        "nearest_point_count": cfg.nearest_point_count,
        "solver": "box-ilqr",
        "sqp_iters": hp.iters,
        "dtype": str(dtype.__name__ if hasattr(dtype, "__name__") else dtype),
        "device": str(jax.devices()[0]),
    }
    with open(os.path.join(out_dir, "description.yaml"), "w") as f:
        yaml.safe_dump(desc, f)
    print(f"saved {os.path.join(out_dir, 'description.yaml')}")


if __name__ == "__main__":
    main()
