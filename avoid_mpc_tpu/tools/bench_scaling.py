"""Weak-scaling sweep on a virtual CPU device mesh — fixed methodology.

Stand-in for the BASELINE.md multi-host leg until real multi-chip exists:
scenario-DP ``shard_solve`` + psum metrics over 1/2/4/8 virtual devices.

Methodology (round-2 VERDICT item 4 — the previous sweep's >1 "efficiency"
meant a corrupted baseline, not superlinear scaling; two real bugs fixed:
the timed loop re-traced the un-jitted shard_map step every iteration, and
XLA's multi-threaded eigen let the 1-device baseline borrow the whole
host's thread pool):

- **weak scaling only**: per-device batch fixed at 64;
- **each mesh size runs in its own subprocess** with
  ``--xla_cpu_multi_thread_eigen=false``, so every virtual device executes
  single-threaded and devices map 1:1 onto cores (plus one shared
  orchestrator thread — measured ~8% of a core);
- compile excluded, >=20 timed steps, median reported;
- virtual devices beyond the core count oversubscribe by construction, so
  the pass metric is **core-normalized efficiency**
  ``eff_n = t_1 * (n / min(n, C)) / t_n`` (ideal flat weak scaling up to C
  cores, proportional slowdown beyond); pass band [0.8, 1.15].

Single-size entry (run by the sweep driver, or standalone):

    JAX_PLATFORMS=cpu JAX_NUM_CPU_DEVICES=4 \
        XLA_FLAGS=--xla_cpu_multi_thread_eigen=false \
        python avoid_mpc_tpu/tools/bench_scaling.py --devices 4

Sweep driver (spawns the subprocesses, prints the curve):

    python avoid_mpc_tpu/tools/bench_scaling.py --sweep
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, _REPO)

B_PER_DEVICE = 64
N_POINTS = 32
TIMED_STEPS = 20


def run_one(nd: int) -> dict:
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np

    from __graft_entry__ import _build_problem_batch
    from avoid_mpc_tpu.config import MPCConfig
    from avoid_mpc_tpu.ops.knn import knn
    from avoid_mpc_tpu.parallel import make_mesh, shard_solve, sharded_metrics
    from avoid_mpc_tpu.solver import SolverHyper, SolverParams
    from avoid_mpc_tpu.solver.ilqr import MPCProblem

    assert jax.device_count() >= nd, (jax.device_count(), nd)
    cfg = MPCConfig(mpc_T=0.66)
    n = cfg.horizon_steps
    sp = SolverParams.from_config(cfg)
    hp = SolverHyper(iters=10)

    b = B_PER_DEVICE * nd
    x0, ref, target, pts, mask = _build_problem_batch(b, n, N_POINTS, jnp.float32)
    _, obstacles = jax.vmap(lambda r, p, m: knn(r[:, 0:3], p, m, k=3))(ref, pts, mask)
    problems = MPCProblem(x0=x0, ref=ref, obstacles=obstacles, target=target)
    us = jnp.zeros((b, n, 4), jnp.float32).at[:, :, 2].set(9.81)
    mesh = make_mesh(n_scenario_shards=nd, n_point_shards=1, devices=jax.devices()[:nd])

    # jit the whole step ONCE: shard_solve/sharded_metrics build fresh
    # shard_map-decorated closures per call, so an un-jitted timed loop
    # re-traces every step — this (not thread contention) produced the
    # corrupted round-2 scaling numbers.
    @jax.jit
    def run(pr, u):
        res = shard_solve(mesh, pr, u, sp, hp)
        return res, sharded_metrics(mesh, res.cost, res.converged)

    t0 = time.time()
    jax.block_until_ready(run(problems, us))  # compile + warm (excluded)
    compile_s = time.time() - t0
    lat = []
    for _ in range(TIMED_STEPS):
        t0 = time.time()
        jax.block_until_ready(run(problems, us))
        lat.append(time.time() - t0)
    p50 = float(np.median(lat))
    return {
        "devices": nd,
        "global_batch": b,
        "p50_ms": round(p50 * 1e3, 2),
        "solves_per_sec": round(b / p50, 1),
        "timed_steps": TIMED_STEPS,
        "compile_s": round(compile_s, 1),
    }


def sweep() -> dict:
    cores = os.cpu_count() or 1
    curve = {}
    # Every multi-device point is BRACKETED by 1-device baseline runs and
    # normalized against the faster of its two time-adjacent brackets: on a
    # shared/virtualized host the single-CPU rate drifts >10% over minutes
    # (round-4 artifacts measured 84.7 vs 131 ms for the identical n=1
    # workload minutes apart), and a baseline measured far from the point it
    # normalizes manufactures out-of-band "efficiencies" in either
    # direction.  The p50-of-20 within ONE subprocess is stable; the drift
    # lives between subprocess runs, so the bracket is the right grain.
    t1_runs = []

    def run_one(nd):
        env = dict(os.environ)
        env.pop("PALLAS_AXON_POOL_IPS", None)  # no TPU claim in children
        env["XLA_FLAGS"] = "--xla_cpu_multi_thread_eigen=false"
        env["JAX_PLATFORMS"] = "cpu"
        env["JAX_NUM_CPU_DEVICES"] = str(nd)
        cmd = [sys.executable, os.path.abspath(__file__), "--devices", str(nd)]
        r = subprocess.run(
            cmd, env=env, cwd=_REPO, capture_output=True, text=True, timeout=1800
        )
        if r.returncode != 0:
            return {"error": r.stderr[-1000:]}
        res = json.loads(r.stdout.strip().splitlines()[-1])
        print(json.dumps({str(nd): res}), file=sys.stderr, flush=True)
        return res

    last_t1 = None
    for nd in (2, 4, 8):
        if last_t1 is None:
            pre = run_one(1)
            t1_runs.append(pre.get("p50_ms"))
            last_t1 = pre.get("p50_ms")
            if "1" not in curve:
                curve["1"] = pre
        res = run_one(nd)
        post = run_one(1)
        t1_runs.append(post.get("p50_ms"))
        if "p50_ms" in res:
            brackets = [t for t in (last_t1, post.get("p50_ms")) if t]
            t1_local = min(brackets) if brackets else None
            if t1_local:
                ideal = t1_local * nd / min(nd, cores)
                res["core_normalized_efficiency"] = round(
                    ideal / res["p50_ms"], 3
                )
                res["t1_bracket_ms"] = brackets
        curve[str(nd)] = res
        last_t1 = post.get("p50_ms")

    t1 = min((t for t in t1_runs if t), default=None)
    if t1 is not None and curve.get("1", {}).get("p50_ms"):
        curve["1"]["p50_ms_baseline_runs"] = t1_runs
        curve["1"]["p50_ms"] = t1
    return {
        "metric": "weak_scaling_virtual_cpu_mesh",
        "batch_per_device": B_PER_DEVICE,
        "host_cores": cores,
        "protocol": (
            f"per-size subprocess, single-threaded eigen per device; compile "
            f"excluded; median of {TIMED_STEPS} steps; each point normalized "
            f"by the faster of its two TIME-ADJACENT 1-device bracket runs "
            f"(host-drift guard); ideal weak time = t1_local * n / "
            f"min(n, {cores}); pass band [0.8, 1.15]"
        ),
        "devices": curve,
    }


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--devices", type=int, default=None)
    parser.add_argument("--sweep", action="store_true")
    args = parser.parse_args(argv)
    if args.sweep or args.devices is None:
        print(json.dumps(sweep()), flush=True)
    else:
        print(json.dumps(run_one(args.devices)), flush=True)


if __name__ == "__main__":
    main()
