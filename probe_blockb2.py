"""Scratch probe v2: fused-SQP batch-tile sweep with honest timing.

Single dispatches through the axon tunnel give wall times dominated by (or
hidden behind) the async client, so each measurement is a lax.scan chain of
K data-dependent solves (us feeds back) inside ONE jit — per-solve time =
chain wall / K, same protocol as bench.py's headline.
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
K = int(os.environ.get("PROBE_CHAIN", 16))
SIZES = tuple(
    int(s) for s in os.environ.get("PROBE_SIZES", "128,256,512").split(",")
)
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
consts, x0, us_init, ref, obs, tgt = args[:13], *args[13:]

for bb in SIZES:
    def chain(us_in, bb=bb):
        def body(us_c, _):
            out = sqp_solve_batched(
                *consts, x0, us_c, ref, obs, tgt, block_b=bb
            )
            return out[0], out[2]
        us_f, costs = jax.lax.scan(body, us_in, None, length=K)
        return us_f, costs[-1]

    fn = jax.jit(chain)
    t0 = time.time()
    try:
        us_f, cost = jax.block_until_ready(fn(us_init))
        _ = np.asarray(cost)  # force a real device->host read
    except Exception as e:
        print(f"block_b={bb}: FAILED {type(e).__name__}: {str(e)[:300]}",
              flush=True)
        continue
    compile_s = time.time() - t0
    ts = []
    for _ in range(3):
        t0 = time.time()
        us_f, cost = jax.block_until_ready(fn(us_init))
        _ = np.asarray(cost)
        ts.append((time.time() - t0) / K)
    print(
        f"block_b={bb}: per-solve p50={np.percentile(ts, 50)*1e3:.2f} ms "
        f"min={min(ts)*1e3:.2f} ms compile={compile_s:.1f}s "
        f"mean_cost={np.asarray(cost).mean():.4f}",
        flush=True,
    )
