"""Attribute the fused-path |du0| outlier (round-3 VERDICT item 6).

verify_fused.py measures p95|du0| ~ 9e-3 against the CPU golden but a
max|du0| ~ 0.8 on at least one scenario of the 256-scenario verify set.
This tool reproduces the verify problems on CPU, runs the fused kernel in
interpret mode (same math as the chip, minus Mosaic lowering), and:

 1. ranks scenarios by |du0| vs the vendored golden,
 2. for the worst scenario, traces BOTH solvers iteration-by-iteration
    (cost / trust-region reg / projected gradient at iters=1..10) to find
    the iteration where they fork and what forked (line-search accept flip
    vs reg-path split vs boxqp active-set),
 3. reports final solution quality on the forked scenario (who ends lower).

Usage:  JAX_PLATFORMS=cpu python avoid_mpc_tpu/tools/diagnose_fused_outlier.py
Writes nothing; prints the attribution. Conclusions archived in PARITY.md.
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np

_REPO = os.path.dirname(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)
sys.path.insert(0, _REPO)


def main():
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from avoid_mpc_tpu.config import MPCConfig
    from avoid_mpc_tpu.solver import SolverHyper, SolverParams, solve
    from avoid_mpc_tpu.solver.ilqr import _affine_dynamics
    from avoid_mpc_tpu.solver.pallas_sqp import sqp_solve_batched
    from avoid_mpc_tpu.tools.verify_fused import build_problems

    b = int(os.environ.get("DIAG_BATCH", 256))
    cfg = MPCConfig(mpc_T=0.66)
    n = cfg.horizon_steps
    sp = SolverParams.from_config(cfg, dtype=jnp.float32)
    problems, us0 = build_problems(b, n, jnp.float32)
    gold = np.load(os.path.join(_REPO, "tests", "data", "fused_gold.npz"))

    Ad, Bd, cvec = _affine_dynamics(sp, jnp.float32)
    cp = sp.cost

    def run_fused(probs, us, iters, block_shape=(1, 8)):
        return sqp_solve_batched(
            Ad, Bd, cvec, sp.u_lower, sp.u_upper,
            cp.q_goal, cp.q_path, cp.q_u, cp.u_hover, cp.collide_lambda,
            cp.drone_radius, cp.lam_omni, cp.margin_v,
            probs.x0, us, probs.ref, probs.obstacles, probs.target,
            iters=iters, block_shape=block_shape, interpret=True,
        )

    # --- 1. rank scenarios by |du0| (interpret-mode fused vs golden) ------
    us_f, xs_f, cost_f, pg_f, reg_f = run_fused(
        problems, us0, 10, block_shape=(2, 128)
    )
    us_f, cost_f = np.asarray(us_f), np.asarray(cost_f)
    du0 = np.abs(us_f[:, 0] - gold["us"][:b, 0]).max(axis=1)
    order = np.argsort(-du0)
    print(json.dumps({
        "interpret_vs_golden": {
            "p95_du0": float(np.percentile(du0, 95)),
            "max_du0": float(du0.max()),
            "worst_scenarios": [int(i) for i in order[:5]],
            "worst_du0": [round(float(du0[i]), 4) for i in order[:5]],
        }
    }), flush=True)

    worst = int(order[0])
    p_w = jax.tree.map(lambda a: a[worst], problems)
    u_w = us0[worst]

    # --- 2. per-iteration fork trace on the worst scenario ----------------
    rows = []
    for it in range(1, 11):
        hp = SolverHyper(iters=it)
        res = solve(p_w, u_w, sp, hp)  # XLA path (CPU -> no pallas routing)
        fu, fx, fc, fp, fr = run_fused(
            jax.tree.map(lambda a: a[None], p_w), u_w[None], it
        )
        rows.append({
            "iter": it,
            "xla_cost": float(res.cost), "fused_cost": float(fc[0]),
            "xla_reg": float(res.reg), "fused_reg": float(fr[0]),
            "xla_pg": float(res.grad_norm), "fused_pg": float(fp[0]),
            "du0_max": float(np.abs(np.asarray(res.us[0]) - np.asarray(fu[0, 0])).max()),
        })
        print(json.dumps(rows[-1]), flush=True)

    # --- 3. attribution ---------------------------------------------------
    fork_iter = next(
        (r["iter"] for r in rows if r["du0_max"] > 1e-4), None
    )
    reg_forked = next(
        (r["iter"] for r in rows
         if abs(r["xla_reg"] - r["fused_reg"]) > 1e-9 * max(r["xla_reg"], 1e-12)),
        None,
    )
    final = rows[-1]
    print(json.dumps({
        "attribution": {
            "worst_scenario": worst,
            "fork_iteration": fork_iter,
            "first_reg_divergence_iter": reg_forked,
            "reg_fork_is_linesearch_accept_flip": (
                reg_forked is not None
                and (reg_forked <= (fork_iter or 11))
            ),
            "final_cost_delta_rel": (final["fused_cost"] - final["xla_cost"])
            / max(abs(final["xla_cost"]), 1.0),
            "both_near_stationary": bool(
                final["xla_pg"] < 10.0 * max(final["fused_pg"], 1e-9)
                or final["fused_pg"] < 10.0 * max(final["xla_pg"], 1e-9)
            ),
        }
    }), flush=True)


if __name__ == "__main__":
    main()
