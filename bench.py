"""Benchmark: batched cluttered-scene MPC solve throughput on one chip.

Headline metric (BASELINE.json): MPC solves/sec/chip and p50 solve-step
latency at N=20 horizon with 4096 concurrent randomized cluttered scenarios.
Each step = per-scenario 3-NN obstacle association against its own forest
cloud + one warm-started box-iLQR solve (10 SQP iterations, the IPOPT
max_iter=10 parity budget).

Baseline: the reference runs <=3 warm-started IPOPT solves per 33 ms tick on
CPU (SURVEY.md §6) => ~90 solves/s; vs_baseline = solves_per_sec / 90.

Prints ONE JSON line.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from __graft_entry__ import _build_problem_batch, _solve_step_fn

    b = int(os.environ.get("BENCH_BATCH", 4096))
    n_pts = int(os.environ.get("BENCH_POINTS", 1024))
    timed_steps = int(os.environ.get("BENCH_STEPS", 5))

    dtype = jnp.float32
    step, cfg = _solve_step_fn(dtype)
    n = cfg.horizon_steps
    x0, ref, target, pts, mask = _build_problem_batch(b, n, n_pts, dtype)
    us = jnp.zeros((b, n, 4), dtype=dtype).at[:, :, 2].set(9.81)

    fn = jax.jit(step)

    # compile + warm the carry (2 warm-up steps)
    t0 = time.time()
    us, ref, cost, conv = jax.block_until_ready(fn(x0, ref, target, pts, mask, us))
    compile_s = time.time() - t0
    us, ref, cost, conv = jax.block_until_ready(fn(x0, ref, target, pts, mask, us))

    lat = []
    for _ in range(timed_steps):
        t0 = time.time()
        us, ref, cost, conv = jax.block_until_ready(fn(x0, ref, target, pts, mask, us))
        lat.append(time.time() - t0)

    p50 = float(np.median(lat))
    solves_per_sec = b / p50
    result = {
        "metric": "mpc_solves_per_sec_per_chip",
        "value": round(solves_per_sec, 1),
        "unit": "solves/s",
        "vs_baseline": round(solves_per_sec / 90.0, 2),
        "p50_step_ms": round(p50 * 1e3, 2),
        "batch": b,
        "horizon": n,
        "cloud_points": n_pts,
        "sqp_iters": 10,
        "compile_s": round(compile_s, 1),
        "device": str(jax.devices()[0]),
        "mean_cost": float(jnp.mean(cost)),
        "converged_frac": float(jnp.mean(conv.astype(jnp.float32))),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
