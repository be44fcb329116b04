"""Roofline analysis for the headline MPC solve step.

AOT-compiles the exact bench.py step (batch x horizon x 10 SQP iters) and
reads XLA's own cost model (``compiled.cost_analysis()``: flops + bytes
accessed) to bound the best achievable per-step device time on this chip
and on a v5p host:

    t_min = max(flops / peak_flops, bytes / hbm_bandwidth)

This answers BASELINE.md's "<10 ms p50" north-star question with hardware
arithmetic instead of hope.  Peak numbers are the published per-chip specs
(v5e: 197 TFLOP/s bf16 MXU, f32 runs as 3-pass bf16 so ~1/3 effective;
819 GB/s HBM.  v5p: 459 TFLOP/s bf16, 2765 GB/s HBM).

Usage: ``timeout 900 python avoid_mpc_tpu/tools/roofline.py`` (TPU;
compile served from ``.jax_cache`` after a bench.py run).
"""

from __future__ import annotations

import json
import os
import sys
import time

_REPO = os.path.dirname(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)
sys.path.insert(0, _REPO)

CHIPS = {
    # name: (peak f32-effective FLOP/s on MXU, HBM bytes/s)
    "v5e": (197e12 / 3.0, 819e9),
    "v5p": (459e12 / 3.0, 2765e9),
}


def main():
    from bench import _enable_compile_cache

    _enable_compile_cache()
    import jax
    import jax.numpy as jnp

    from __graft_entry__ import _build_problem_batch, _solve_step_fn

    b = int(os.environ.get("BENCH_BATCH", 4096))
    n_pts = int(os.environ.get("BENCH_POINTS", 1024))
    dtype = jnp.float32
    step, cfg = _solve_step_fn(dtype)
    n = cfg.horizon_steps
    x0, ref, target, pts, mask = _build_problem_batch(b, n, n_pts, dtype)
    us = jnp.zeros((b, n, 4), dtype=dtype).at[:, :, 2].set(9.81)

    t0 = time.time()
    compiled = jax.jit(step).lower(x0, ref, target, pts, mask, us).compile()
    compile_s = time.time() - t0
    ca = compiled.cost_analysis()
    if isinstance(ca, list):  # older jax returns one dict per device program
        ca = ca[0]
    flops = float(ca.get("flops", 0.0))
    bw_bytes = float(ca.get("bytes accessed", 0.0))

    out = {
        "metric": "roofline_mpc_step",
        "batch": b,
        "horizon": n,
        "cloud_points": n_pts,
        "sqp_iters": 10,
        "flops": flops,
        "bytes_accessed": bw_bytes,
        "arithmetic_intensity_flops_per_byte": round(flops / max(bw_bytes, 1.0), 3),
        "compile_s": round(compile_s, 1),
        "device": str(jax.devices()[0]),
    }
    for name, (peak_flops, hbm) in CHIPS.items():
        t_flops = flops / peak_flops
        t_bytes = bw_bytes / hbm
        out[name] = {
            "t_compute_ms": round(t_flops * 1e3, 3),
            "t_memory_ms": round(t_bytes * 1e3, 3),
            "t_min_ms": round(max(t_flops, t_bytes) * 1e3, 3),
            "bound": "memory" if t_bytes > t_flops else "compute",
        }
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
