"""Scratch probe: sweep the fused-SQP kernel's batch-tile width on-chip.

bt=128 puts every (bt,) vector op on 1/8 of a vreg and walks 32 grid tiles;
wider tiles should amortize the kernel's long sequential op chain.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from bench import _enable_compile_cache

_enable_compile_cache()

import jax
import jax.numpy as jnp
import numpy as np

from avoid_mpc_tpu.config import MPCConfig
from avoid_mpc_tpu.solver.ilqr import SolverParams, _affine_dynamics
from avoid_mpc_tpu.solver.pallas_sqp import sqp_solve_batched
from avoid_mpc_tpu.tools.verify_fused import build_problems

B = int(os.environ.get("PROBE_B", 4096))
cfg = MPCConfig(mpc_T=0.66)
n = cfg.horizon_steps
sp = SolverParams.from_config(cfg, dtype=jnp.float32)
problems, us0 = build_problems(B, n, jnp.float32)
Ad, Bd, cvec = _affine_dynamics(sp, jnp.float32)
cp = sp.cost

wash = jax.jit(lambda *a: a)
args = jax.block_until_ready(wash(
    Ad, Bd, cvec, sp.u_lower, sp.u_upper, cp.q_goal, cp.q_path, cp.q_u,
    cp.u_hover, cp.collide_lambda, cp.drone_radius, cp.lam_omni, cp.margin_v,
    problems.x0, us0, problems.ref, problems.obstacles, problems.target,
))

gold_cost = None
for bb in (128, 256, 512):
    t0 = time.time()
    try:
        out = jax.block_until_ready(sqp_solve_batched(*args, block_b=bb))
    except Exception as e:
        print(f"block_b={bb}: FAILED {type(e).__name__}: {str(e)[:300]}",
              flush=True)
        continue
    compile_s = time.time() - t0
    ts = []
    for _ in range(10):
        t0 = time.time()
        out = jax.block_until_ready(sqp_solve_batched(*args, block_b=bb))
        ts.append(time.time() - t0)
    cost = np.asarray(out[2])
    if gold_cost is None:
        gold_cost = cost
    dc = np.abs(cost - gold_cost) / np.maximum(np.abs(gold_cost), 1.0)
    print(
        f"block_b={bb}: p50={np.percentile(ts, 50)*1e3:.2f} ms "
        f"min={min(ts)*1e3:.2f} ms compile={compile_s:.1f}s "
        f"mean_cost={cost.mean():.4f} max_rel_dcost_vs_bt128={dc.max():.2e}",
        flush=True,
    )
