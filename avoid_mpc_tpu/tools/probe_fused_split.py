"""On-chip attribution for the FUSED solve step (round-4 perf work).

BENCH_r03 measured the full bench step (3-NN association + fused SQP solve +
ref shift) at p50 16.28 ms pipelined for batch 4096 — but nothing measures
how that splits between the knn association and the fused Pallas solve, so
the optimization target was unknown (VERDICT r3 "what's weak" #1).

This probe times, each as ONE jitted chained scan (K ticks per dispatch so
the axon tunnel's ~25 ms round trip amortizes away):

  knn_only     the per-tick 3-NN obstacle association alone
  solve_only   the fused SQP solve alone (obstacles fixed)
  full_step    the bench.py step (association + solve + shift), as a check

Prints one JSON line per measurement.  Protocol mirrors bench.py's chained
path; reference latency budget: 33 ms/tick (AvoidanceStateMachine.cpp:109).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(
    0,
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
)


def main():
    from avoid_mpc_tpu.utils.compile_cache import enable_persistent_cache

    enable_persistent_cache()
    import jax
    import jax.numpy as jnp
    import numpy as np

    from __graft_entry__ import _build_problem_batch, _solve_step_fn
    from avoid_mpc_tpu.config import MPCConfig
    from avoid_mpc_tpu.ops.knn import knn
    from avoid_mpc_tpu.solver import SolverHyper, SolverParams, solve
    from avoid_mpc_tpu.solver.ilqr import MPCProblem

    B = int(os.environ.get("PROF_BATCH", 4096))
    NPTS = int(os.environ.get("PROF_POINTS", 1024))
    K = int(os.environ.get("PROF_CHAIN", 16))
    dtype = jnp.float32

    cfg = MPCConfig(mpc_T=0.66)  # N = 20
    n = cfg.horizon_steps
    sp = SolverParams.from_config(cfg, dtype=dtype)
    hp = SolverHyper(iters=10, fuse=True)

    x0, ref, target, pts, mask = _build_problem_batch(B, n, NPTS, dtype)
    us = jnp.zeros((B, n, 4), dtype).at[:, :, 2].set(9.81)
    wash = jax.jit(lambda *a: a)
    x0, ref, target, pts, mask, us = jax.block_until_ready(
        wash(x0, ref, target, pts, mask, us)
    )

    def timeit(name, fn, *args, reps=5):
        t0 = time.time()
        out = jax.block_until_ready(fn(*args))
        compile_s = time.time() - t0
        lat = []
        for _ in range(reps):
            t0 = time.time()
            out = jax.block_until_ready(fn(*args))
            lat.append(time.time() - t0)
        print(
            json.dumps(
                {
                    "name": name,
                    "p50_tick_ms": round(float(np.median(lat)) * 1e3 / K, 3),
                    "p50_dispatch_ms": round(float(np.median(lat)) * 1e3, 3),
                    "chain": K,
                    "compile_s": round(compile_s, 1),
                }
            ),
            flush=True,
        )
        return out

    # --- knn association only, chained (output feeds next iter's query) ---
    def knn_chain(ref, pts, mask):
        def body(carry, _):
            _, obs = jax.vmap(lambda r, p, m: knn(r[:, 0:3], p, m, 3))(
                carry, pts, mask
            )
            return carry.at[:, :, 0:3].add(obs[:, :, 0, :] * 1e-9), None

        out, _ = jax.lax.scan(body, ref, None, length=K)
        return out

    timeit("knn_only", jax.jit(knn_chain), ref, pts, mask)

    # --- fused solve only, chained (warm-start + ref carried) ---
    _, obstacles = jax.jit(
        lambda r, p, m: jax.vmap(lambda ri, pi, mi: knn(ri[:, 0:3], pi, mi, 3))(
            r, p, m
        )
    )(ref, pts, mask)
    obstacles = jax.block_until_ready(wash(obstacles))[0]

    def solve_chain(x0, ref, obstacles, target, us):
        def body(carry, _):
            us_c, ref_c = carry
            res = jax.vmap(
                lambda x, r, o, t, u: solve(
                    MPCProblem(x0=x, ref=r, obstacles=o, target=t), u, sp, hp
                )
            )(x0, ref_c, obstacles, target, us_c)
            return (res.us, res.xs[:, :-1]), res.cost

        (us_f, ref_f), costs = jax.lax.scan(body, (us, ref), None, length=K)
        return us_f, ref_f, costs

    timeit("solve_only", jax.jit(solve_chain), x0, ref, obstacles, target, us)

    # --- the full bench step, chained, as a cross-check ---
    step, _ = _solve_step_fn(dtype, fuse=True)

    def full_chain(x0, ref, target, pts, mask, us):
        def body(carry, _):
            us_c, ref_c = carry
            us2, ref2, cost, conv = step(x0, ref_c, target, pts, mask, us_c)
            return (us2, ref2), cost

        (us_f, ref_f), costs = jax.lax.scan(body, (us, ref), None, length=K)
        return us_f, ref_f, costs

    timeit("full_step", jax.jit(full_chain), x0, ref, target, pts, mask, us)
    print(json.dumps({"device": str(jax.devices()[0]), "batch": B}), flush=True)


if __name__ == "__main__":
    main()
