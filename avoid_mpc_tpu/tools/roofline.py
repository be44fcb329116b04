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

    # XLA's cost model cannot see inside Pallas custom calls: round-2 traces
    # showed it charging the fused solve ~18 GB while the op's real HBM
    # footprint is its operands + results (everything else lives in VMEM for
    # the kernel's whole lifetime).  Tally that honest floor analytically:
    # every jitted-program input/output once, plus both Pallas calls' I/O.
    sz = lambda *shapes: sum(
        4 * int(jnp.prod(jnp.asarray(s))) for s in shapes
    )
    solve_io = sz((b, 10), (b, n, 4), (b, n, 10), (b, n, 3, 3), (b, 10),
                  (n, 4, b), (n + 1, 10, b), (3, b))
    knn_io = sz((b, 20, 3), (b, n_pts, 3), (b, n_pts),  # queries/pts/mask
                (20, 3, b), (3, 20, 3, b))  # dists + coords out
    pallas_io_bytes = float(solve_io + knn_io)

    # measured: K chained data-dependent steps in one dispatch (single
    # dispatches through the axon tunnel hide behind the async client)
    K = 8
    def chain(x0, ref, target, pts, mask, us):
        def body(carry, _):
            us_c, ref_c = carry
            us2, ref2, cost, conv = step(x0, ref_c, target, pts, mask, us_c)
            return (us2, ref2), cost
        (_, _), costs = jax.lax.scan(body, (us, ref), None, length=K)
        return costs
    fc = jax.jit(chain)
    import numpy as np
    jax.block_until_ready(fc(x0, ref, target, pts, mask, us))
    t0 = time.time()
    reps = 3
    for _ in range(reps):
        np.asarray(jax.block_until_ready(fc(x0, ref, target, pts, mask, us)))
    measured_ms = (time.time() - t0) / (reps * K) * 1e3

    out = {
        "metric": "roofline_mpc_step",
        "batch": b,
        "horizon": n,
        "cloud_points": n_pts,
        "sqp_iters": 10,
        "flops": flops,
        "bytes_accessed_xla_cost_model": bw_bytes,
        "bytes_accessed_note": (
            "XLA's estimate for the two Pallas custom calls is opaque-op "
            "guesswork; their real HBM footprint is pallas_io_bytes"
        ),
        "pallas_io_bytes": pallas_io_bytes,
        "measured_p50_step_ms": round(measured_ms, 2),
        "compile_s": round(compile_s, 1),
        "device": str(jax.devices()[0]),
    }
    for name, (peak_flops, hbm) in CHIPS.items():
        t_flops = flops / peak_flops
        t_bytes = pallas_io_bytes / hbm
        out[name] = {
            "t_compute_ms": round(t_flops * 1e3, 3),
            "t_memory_ms": round(t_bytes * 1e3, 3),
            "t_min_ms": round(max(t_flops, t_bytes) * 1e3, 3),
            "bound": "memory" if t_bytes > t_flops else "compute",
        }
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
