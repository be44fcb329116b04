"""Benchmark: batched cluttered-scene MPC solve throughput on one chip.

Headline metric (BASELINE.json): MPC solves/sec/chip and p50 solve-step
latency at N=20 horizon with 4096 concurrent randomized cluttered scenarios.
Each step = per-scenario 3-NN obstacle association against its own forest
cloud + one warm-started box-iLQR solve (10 SQP iterations, the IPOPT
max_iter=10 parity budget).

Baseline: the reference runs <=3 warm-started IPOPT solves per 33 ms tick on
CPU (SURVEY.md §6) => ~90 solves/s; vs_baseline = solves_per_sec / 90.

Timeout hardening (round-2, VERDICT.md item 1): the axon tunnel makes cold
compiles take 5-15 min, which killed the round-1 driver bench (rc=124).
Two defenses:
  * a persistent compilation cache at ``.jax_cache/`` (pre-warmed during the
    round with identical shapes/devices, so the driver run loads the
    serialized executable in seconds), and
  * staged output — the full-config JSON line is printed after the FIRST
    timed step, then refined after the remaining steps, so a run killed
    mid-measurement still leaves a parseable full-batch number.

The full BASELINE.md benchmark matrix (obstacle-free tracking, 1k-cloud
single scenario, 10k-cloud dual-map forest, 12 m/s replay, scaling curve)
lives in ``avoid_mpc_tpu/tools/bench_matrix.py``; this file stays the
driver's one-line headline.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np


def _enable_compile_cache():
    import jax

    cache_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache")
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)


def main():
    _enable_compile_cache()
    import jax
    import jax.numpy as jnp

    from __graft_entry__ import _build_problem_batch, _solve_step_fn

    b = int(os.environ.get("BENCH_BATCH", 4096))
    n_pts = int(os.environ.get("BENCH_POINTS", 1024))
    timed_steps = int(os.environ.get("BENCH_STEPS", 5))
    # Receding-horizon chaining: K consecutive MPC ticks per dispatch (each
    # tick = re-association + warm-started solve, ref/us carried — exactly
    # the deployed closed-loop semantics).  The axon tunnel adds ~25 ms of
    # host round-trip PER DISPATCH (device-trace measured; the graph itself
    # runs ~21 ms on-chip), so single-step dispatch latency mostly measures
    # the tunnel.  Both numbers are reported.
    chain_k = int(os.environ.get("BENCH_CHAIN", 32))

    dtype = jnp.float32
    # Fused-kernel gating for unattended runs: the fully-fused solve is only
    # benched once its on-chip compile has been warmed+verified once (the
    # marker is touched after a successful fused run, and the persistent
    # cache then serves the executable in seconds).  Before that, default to
    # the per-phase kernels whose cache entries are known-warm — a cold
    # multi-minute Mosaic compile inside a timeout-bounded driver run must
    # not be the first time the kernel meets silicon.  AVOID_MPC_FORCE_FUSE
    # overrides (used by the attended verification sequence).
    marker = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), ".jax_cache", "FUSED_WARMED"
    )
    force = os.environ.get("AVOID_MPC_FORCE_FUSE") == "1"
    fuse = None if (force or os.path.exists(marker)) else False
    step, cfg = _solve_step_fn(dtype, fuse=fuse)
    n = cfg.horizon_steps
    x0, ref, target, pts, mask = _build_problem_batch(b, n, n_pts, dtype)
    us = jnp.zeros((b, n, 4), dtype=dtype).at[:, :, 2].set(9.81)

    # Wash every input through a jitted identity: arrays not produced by a jit
    # execution can be re-uploaded (~24 ms) on every use in this environment.
    wash = jax.jit(lambda *a: a)
    x0, ref, target, pts, mask, us = jax.block_until_ready(
        wash(x0, ref, target, pts, mask, us)
    )

    def make_fns(step):
        fn = jax.jit(step)

        def chained(x0, ref, target, pts, mask, us):
            def body(carry, _):
                us_c, ref_c = carry
                us2, ref2, cost, conv = step(x0, ref_c, target, pts, mask, us_c)
                return (us2, ref2), None

            (us_f, ref_f), _ = jax.lax.scan(body, (us, ref), None, length=chain_k)
            # cost/conv reported from one more tick at the chain's fixed point
            us3, ref3, cost, conv = step(x0, ref_f, target, pts, mask, us_f)
            return us3, ref3, cost, conv

        return fn, jax.jit(chained)

    fn, fn_chain = make_fns(step)

    t0 = time.time()
    try:
        us1, ref1, cost, conv = jax.block_until_ready(
            fn(x0, ref, target, pts, mask, us)
        )
    except Exception as e:  # pragma: no cover - on-chip toolchain escape hatch
        # If the fully-fused kernel fails to compile/run on this chip, fall
        # back to the per-phase kernels rather than failing the bench.
        print(f"# fused solve failed ({type(e).__name__}); retrying with "
              f"AVOID_MPC_NO_FUSE", file=sys.stderr, flush=True)
        fuse = False
        step, cfg = _solve_step_fn(dtype, fuse=False)
        fn, fn_chain = make_fns(step)
        us1, ref1, cost, conv = jax.block_until_ready(
            fn(x0, ref, target, pts, mask, us)
        )
    fused_ran = (
        fuse is not False and os.environ.get("AVOID_MPC_NO_FUSE") != "1"
    )  # fuse=None defers to _solve_step_fn's env check — mirror it here
    if fused_ran and jax.devices()[0].platform == "tpu":
        # fused path compiled + executed on silicon: future unattended runs
        # may use it (the persistent cache now holds the executable)
        open(marker, "w").close()
    compile_s = time.time() - t0
    t0 = time.time()
    out_c = jax.block_until_ready(fn_chain(x0, ref, target, pts, mask, us))
    compile_chain_s = time.time() - t0
    # warm-up (steadies the warm-start carry + any lazy transfers)
    us1, ref1, cost, conv = jax.block_until_ready(fn(x0, ref, target, pts, mask, us))

    def pipelined_throughput(reps=6):
        """Enqueue `reps` chained calls back-to-back (async dispatch) and
        block once: the host run-ahead hides the tunnel round-trip, so this
        measures steady device throughput — what a production host sees."""
        out = (us, ref)
        t0 = time.time()
        for _ in range(reps):
            o = fn_chain(x0, out[1], target, pts, mask, out[0])
            out = (o[0], o[1])
        jax.block_until_ready(out)
        return (time.time() - t0) / (reps * (chain_k + 1))

    def result_line(lat_chain, lat_single, cost, conv, t_pipe=None):
        # Headline = best sustained rate under ONE protocol, reported
        # explicitly (ADVICE r2): p50_step_ms is always the median chained
        # per-tick latency; the async-pipelined rate gets its own field and
        # the headline records which protocol produced it.
        p50 = float(np.median(lat_chain)) / (chain_k + 1)
        p50_single = float(np.median(lat_single)) if lat_single else None
        protocol = "chained"
        best = p50
        if t_pipe is not None and t_pipe < best:
            best = t_pipe
            protocol = "pipelined"
        solves_per_sec = b / best
        return {
            "metric": "mpc_solves_per_sec_per_chip",
            "value": round(solves_per_sec, 1),
            "unit": "solves/s",
            "vs_baseline": round(solves_per_sec / 90.0, 2),
            "headline_protocol": protocol,
            "p50_step_ms": round(p50 * 1e3, 2),
            "p50_pipelined_ms": round(t_pipe * 1e3, 2) if t_pipe is not None else None,
            "p50_single_dispatch_ms": round(p50_single * 1e3, 2) if p50_single else None,
            "chain_len": chain_k + 1,
            "batch": b,
            "horizon": n,
            "cloud_points": n_pts,
            "sqp_iters": 10,
            "iter_exit": "grad_tol 1e-4 within max 10 iters, per batch tile"
                         " (the reference's IPOPT tol/max_iter semantics,"
                         " HighLvlMpc.cpp:17-23)",
            "timed_steps": len(lat_chain),
            "compile_s": round(compile_s + compile_chain_s, 1),
            "device": str(jax.devices()[0]),
            "mean_cost": float(jnp.mean(cost)),
            "converged_frac": float(jnp.mean(conv.astype(jnp.float32))),
        }

    lat_single = []
    for _ in range(timed_steps):
        t0 = time.time()
        us1, ref1, cost, conv = jax.block_until_ready(fn(x0, ref, target, pts, mask, us))
        lat_single.append(time.time() - t0)

    lat_chain = []
    for i in range(timed_steps):
        t0 = time.time()
        us_c, ref_c, cost, conv = jax.block_until_ready(
            fn_chain(x0, ref, target, pts, mask, us)
        )
        lat_chain.append(time.time() - t0)
        if i == 0 and timed_steps > 1:
            # staged full-config line: survives a mid-measurement timeout
            print(json.dumps(result_line(lat_chain, lat_single, cost, conv)), flush=True)

    t_pipe = pipelined_throughput()
    print(json.dumps(result_line(lat_chain, lat_single, cost, conv, t_pipe)), flush=True)


if __name__ == "__main__":
    main()
