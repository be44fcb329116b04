"""On-chip verification of the fully-fused SQP kernel (solver/pallas_sqp.py).

Two phases because the image pins one backend per process:

    # 1. CPU golden (XLA per-scenario solver, the semantic source of truth):
    JAX_PLATFORMS=cpu python avoid_mpc_tpu/tools/verify_fused.py --cpu out.npz
    # 2. real chip, fused kernel, compare:
    python avoid_mpc_tpu/tools/verify_fused.py --tpu out.npz

A pre-generated golden for the default seed/shapes is vendored at
``tests/data/fused_gold.npz`` (regenerate with --cpu if the problem builder or
solver semantics change).

Flagship shapes (N=20, 10 iterations, K=3, batch 256 of randomized cylinder
scenarios).  Catches exactly the class of bug CPU interpret tests cannot:
Mosaic lowering differences and on-chip fp behavior (CLAUDE.md rule 2 —
both round-1 bf16 bugs were invisible on CPU).
"""

from __future__ import annotations

import os
import sys

import numpy as np

_REPO = os.path.dirname(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)
sys.path.insert(0, _REPO)


def build_problems(b, n, dtype):
    import jax
    import jax.numpy as jnp

    from avoid_mpc_tpu.solver.ilqr import MPCProblem, hover_warm_start

    rng = np.random.default_rng(42)
    t = np.arange(1, n + 1) * 0.033
    x0 = np.zeros((b, 10), np.float32)
    x0[:, 2] = 1.5
    x0[:, 4] = rng.uniform(0, 8, b)
    ref = np.zeros((b, n, 10), np.float32)
    speed = rng.uniform(2, 10, b)
    ref[:, :, 0] = speed[:, None] * t[None, :]
    ref[:, :, 4] = speed[:, None]
    tgt = np.zeros((b, 10), np.float32)
    tgt[:, 0] = ref[:, -1, 0]
    obstacles = np.full((b, n, 3, 3), 1e4, np.float32)
    for i in range(b):
        k = rng.integers(1, 3)
        for j in range(k):
            obstacles[i, :, j, :] = [
                ref[i, n // 2, 0] + rng.uniform(-1, 1),
                rng.uniform(-0.5, 0.5),
                1.5,
            ]
    problems = MPCProblem(
        jnp.asarray(x0), jnp.asarray(ref), jnp.asarray(obstacles), jnp.asarray(tgt)
    )
    us0 = jnp.stack([hover_warm_start(n, dtype)] * b)
    return problems, us0


def main(argv=None):
    argv = argv if argv is not None else sys.argv[1:]
    mode, path = argv[0], argv[1]
    b = 256

    import jax
    import jax.numpy as jnp

    from avoid_mpc_tpu.config import MPCConfig
    from avoid_mpc_tpu.solver.ilqr import SolverHyper, SolverParams, solve_batched

    cfg = MPCConfig(mpc_T=0.66)  # N = 20
    n = cfg.horizon_steps
    sp = SolverParams.from_config(cfg, dtype=jnp.float32)
    problems, us0 = build_problems(b, n, jnp.float32)

    if mode == "--cpu":
        assert jax.devices()[0].platform == "cpu", jax.devices()
        hp = SolverHyper()  # XLA path on CPU regardless of flags
        res = solve_batched(problems, us0, sp, hp)
        np.savez(
            path,
            us=np.asarray(res.us), cost=np.asarray(res.cost),
            grad_norm=np.asarray(res.grad_norm),
            converged=np.asarray(res.converged),
        )
        print(
            f"cpu golden: mean_cost={float(res.cost.mean()):.4f} "
            f"conv={float(res.converged.mean()):.3f}", flush=True,
        )
        return 0

    assert mode == "--tpu"
    assert jax.devices()[0].platform != "cpu", jax.devices()
    dump = argv[2] if len(argv) > 2 else None  # per-scenario npz (diagnosis)
    gold = np.load(path)
    gconv = float(gold["converged"].mean())
    print(
        f"golden: mean_cost={float(gold['cost'].mean()):.4f} conv={gconv:.3f}",
        flush=True,
    )
    print("compiling fused solve on chip...", flush=True)
    hp = SolverHyper()  # fuse=True routes to pallas_sqp on TPU
    res = jax.block_until_ready(solve_batched(problems, us0, sp, hp))
    us, cost = np.asarray(res.us), np.asarray(res.cost)
    conv = float(np.asarray(res.converged).mean())
    if dump:
        np.savez(
            dump, us=us, cost=cost,
            grad_norm=np.asarray(res.grad_norm),
            converged=np.asarray(res.converged),
        )

    # Acceptance calibrated against the on-chip *per-phase* kernels run on
    # the same golden (the semantically-identical known-good path): that run
    # measures max_rel_dcost 1.9e-4, max|du0| 7.8e-2, conv 0.551 vs golden
    # 0.531 — i.e. on random 256-scenario batches where ~47% of scenarios
    # legitimately exhaust the 10-iteration budget unconverged, individual
    # trajectories may diverge between any two fp orderings (an Armijo
    # accept flip compounds), so per-scenario MAX bounds are the wrong test.
    # The right tests: (a) the bulk of scenarios agree tightly (p95), (b)
    # the on-chip solution quality is not systematically worse than the CPU
    # golden, (c) the convergence certificate tracks the golden's own rate.
    #
    # The max|du0| ~ 0.8 outlier is DIAGNOSED (round 4, tools/
    # diagnose_fused_outlier.py + the --dump per-scenario analysis): it is
    # budget truncation, not a kernel defect.  The worst scenario (#190 of
    # the default set) is unconverged in BOTH solvers at the parity budget
    # (10 iters = the reference's IPOPT max_iter); even CPU-interpret vs
    # CPU-XLA — same machine fp — forks to |du0| 0.58 there, because a
    # sub-ulp cost difference flips one late Armijo selection between two
    # near-equal candidates mid-descent.  Run to 30 iterations the two
    # paths land on the SAME solution (rel dcost 3.4e-7, |du0| 0.009).
    # All other |du0|>0.01 scenarios agree in cost to <=2.3e-4.
    dc = np.abs(cost - gold["cost"]) / np.maximum(np.abs(gold["cost"]), 1.0)
    du0 = np.abs(us[:, 0] - gold["us"][:, 0]).max(axis=1)  # per-scenario (B,)
    quality = (cost - gold["cost"]) / np.maximum(np.abs(gold["cost"]), 1.0)
    # The 1e-3 BASELINE criterion is asserted as a HARD GATE on the
    # mutually-converged subset (VERDICT r4 item 3): scenarios where BOTH
    # solvers certify tol-1e-4 stationarity within the 10-iteration budget
    # have no budget-truncation excuse — every one of them must land on the
    # same first control to 1e-3, or this exits nonzero.
    both_conv = np.asarray(res.converged) & gold["converged"].astype(bool)
    du0_conv_max = float(du0[both_conv].max()) if both_conv.any() else 0.0
    print(
        f"tpu fused: mean_cost={float(cost.mean()):.4f} conv={conv:.3f} "
        f"p95_rel_dcost={np.percentile(dc, 95):.3e} "
        f"max_rel_dcost={dc.max():.3e} "
        f"p95|du0|={np.percentile(du0, 95):.3e} max|du0|={du0.max():.3e} "
        f"mean_quality={quality.mean():+.3e} "
        f"converged_subset: n={int(both_conv.sum())}/{len(du0)} "
        f"max|du0|={du0_conv_max:.3e}",
        flush=True,
    )
    ok = (
        np.percentile(dc, 95) < 1e-3
        and np.percentile(du0, 95) < 1e-2
        and quality.mean() < 1e-4  # not systematically worse than golden
        and abs(conv - gconv) < 0.05
        and both_conv.sum() > 0
        and du0_conv_max < 1e-3  # the BASELINE criterion, hard-gated
    )
    print("FUSED_ONCHIP_OK" if ok else "FUSED_ONCHIP_MISMATCH", flush=True)
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
