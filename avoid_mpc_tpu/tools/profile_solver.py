"""Per-component solver cost attribution on-chip (round-2 p50 work).

The fused 4096-scenario solve step (bench.py protocol: 3-NN association +
10 warm-started box-iLQR iterations) is timed against isolated component
loops, each compiled as ONE jitted graph with a data-dependent scan so the
per-dispatch floor of this environment contaminates nothing:

  solve_iters1 / solve_iters10   full step at 1 / 10 SQP iterations;
                                 the slope (t10-t1)/9 is the true per-
                                 iteration cost
  assoc_knn                      the per-step 3-NN association alone
  linearize_x10                  10x analytic cost linearization
  backward_x10                   10x fused Riccati/boxQP Pallas sweep
  forward_x10                    10x fused 8-alpha line-search Pallas kernel

Every component loop feeds a reduction of iteration i's output into
iteration i+1's input (1e-9-scaled) so XLA cannot hoist or CSE the body.

Prints one JSON line per measurement. Used to produce the roofline note in
PARITY.md; reference latency protocol: tools/mpc_obstacle_casadi.py:499-536.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))


def main():
    from avoid_mpc_tpu.utils.compile_cache import enable_persistent_cache

    enable_persistent_cache()
    import jax
    import jax.numpy as jnp
    import numpy as np

    from __graft_entry__ import _build_problem_batch, _solve_step_fn
    from avoid_mpc_tpu.config import MPCConfig
    from avoid_mpc_tpu.ops.knn import knn
    from avoid_mpc_tpu.solver import SolverHyper, SolverParams
    from avoid_mpc_tpu.solver.ilqr import MPCProblem, _affine_dynamics, _linearize
    from avoid_mpc_tpu.solver.pallas_backward import riccati_backward_batched
    from avoid_mpc_tpu.solver.pallas_forward import line_search_batched

    B = int(os.environ.get("PROF_BATCH", 4096))
    NPTS = 1024
    N = 20
    dtype = jnp.float32

    x0, ref, target, pts, mask = _build_problem_batch(B, N, NPTS, dtype)
    us = jnp.zeros((B, N, 4), dtype).at[:, :, 2].set(9.81)
    wash = jax.jit(lambda *a: a)
    x0, ref, target, pts, mask, us = jax.block_until_ready(
        wash(x0, ref, target, pts, mask, us)
    )

    def timeit(name, fn, *args, reps=5, extra=None):
        t0 = time.time()
        out = jax.block_until_ready(fn(*args))
        compile_s = time.time() - t0
        lat = []
        for _ in range(reps):
            t0 = time.time()
            out = jax.block_until_ready(fn(*args))
            lat.append(time.time() - t0)
        rec = {
            "name": name,
            "p50_ms": round(float(np.median(lat)) * 1e3, 3),
            "compile_s": round(compile_s, 1),
        }
        if extra:
            rec.update(extra)
        print(json.dumps(rec), flush=True)
        return out

    # --- full solve step at 1 and 10 iterations ---
    results = {}
    for it in (1, 10):
        step, _ = _solve_step_fn(dtype, sqp_iters=it)
        out = timeit(f"solve_iters{it}", jax.jit(step), x0, ref, target, pts, mask, us)
        results[it] = out

    # --- association alone ---
    def assoc(ref, pts, mask):
        return jax.vmap(lambda r, p, m: knn(r[:, 0:3], p, m, 3))(ref, pts, mask)

    _, obstacles = timeit("assoc_knn", jax.jit(assoc), ref, pts, mask)

    # --- shared component inputs (one linearize at the warm point) ---
    cfg = MPCConfig(mpc_T=0.66)
    sp = SolverParams.from_config(cfg, dtype=dtype)
    hp = SolverHyper()
    Ad, Bd, cvec = _affine_dynamics(sp, dtype)

    def rollout(x0, us):
        def f(x, u):
            xn = Ad @ x + Bd @ u + cvec
            return xn, xn

        _, xs = jax.lax.scan(f, x0, us)
        return jnp.concatenate([x0[None], xs], axis=0)

    xs = jax.jit(jax.vmap(rollout))(x0, us)

    def lin_batch(xs, us, obstacles):
        def one(x0_, xsi, usi, refi, obsi, tgt):
            p = MPCProblem(x0=x0_, ref=refi, obstacles=obsi, target=tgt)
            return _linearize(p, xsi, usi, sp)

        return jax.vmap(one)(x0, xs, us, ref, obstacles, target)

    with jax.default_matmul_precision("highest"):
        cx, cxx, lu, luu = jax.jit(lin_batch)(xs, us, obstacles)
    cx, cxx, lu = jax.block_until_ready(wash(cx, cxx, lu)[0:3])
    luu0 = luu[0]
    reg = jnp.full((B,), 1e-6, dtype)

    # --- linearize x10 (analytic; matmul precision as in solve) ---
    def lin10(xs, us, obstacles):
        def it(carry, _):
            with jax.default_matmul_precision("highest"):
                cx_, cxx_, lu_, _ = lin_batch(
                    xs + carry[:, None, None] * 1e-9, us, obstacles
                )
            return cx_[:, 0, 0], (cx_[:, 0, 0])

        out, _ = jax.lax.scan(it, jnp.zeros(B, dtype), None, length=10)
        return out

    timeit("linearize_x10", jax.jit(lin10), xs, us, obstacles)

    # --- fused Riccati backward x10 ---
    def bw10(cx, cxx, lu, us, reg):
        def it(carry, _):
            kff, K, dV1, dV2, pg = riccati_backward_batched(
                Ad, Bd, luu0, sp.u_lower, sp.u_upper,
                cx + carry[:, None, None] * 1e-9, cxx, lu, us, reg,
                bq_iters=hp.boxqp_iters,
            )
            return pg, None

        out, _ = jax.lax.scan(it, jnp.zeros(B, dtype), None, length=10)
        return out

    timeit("backward_x10", jax.jit(bw10), cx, cxx, lu, us, reg)

    # one backward to get realistic kff/K for the forward kernel
    kff, K, dV1, dV2, pg = jax.jit(
        lambda: riccati_backward_batched(
            Ad, Bd, luu0, sp.u_lower, sp.u_upper, cx, cxx, lu, us, reg,
            bq_iters=hp.boxqp_iters,
        )
    )()
    cp = sp.cost
    cost0 = jnp.zeros(B, dtype)

    # --- fused line search x10 ---
    def fw10(us, xs, kff, K, dV1, dV2):
        def it(carry, _):
            us_new, xs_new, cost_new, ok = line_search_batched(
                Ad, Bd, cvec, sp.u_lower, sp.u_upper,
                cp.q_goal, cp.q_path, cp.q_u, cp.collide_lambda, cp.drone_radius,
                x0, us + carry[:, None, None] * 1e-9, xs, kff, K,
                ref, obstacles, target, dV1, dV2, carry,
                n_alphas=hp.n_alphas, lam_omni=cp.lam_omni, margin_v=cp.margin_v,
            )
            return cost_new, None

        out, _ = jax.lax.scan(it, cost0, None, length=10)
        return out

    timeit("forward_x10", jax.jit(fw10), us, xs, kff, K, dV1, dV2)

    print(json.dumps({"device": str(jax.devices()[0]), "batch": B}), flush=True)


if __name__ == "__main__":
    main()
