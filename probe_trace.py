"""Scratch probe: per-op device-time attribution of the headline bench step.

Runs the exact bench.py step (fused solve + Pallas knn) under
jax.profiler.trace, then prints trace_report's per-op rollup.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from bench import _enable_compile_cache

_enable_compile_cache()

import jax
import jax.numpy as jnp

from __graft_entry__ import _build_problem_batch, _solve_step_fn

b, n_pts = 4096, 1024
dtype = jnp.float32
step, cfg = _solve_step_fn(dtype)
n = cfg.horizon_steps
x0, ref, target, pts, mask = _build_problem_batch(b, n, n_pts, dtype)
us = jnp.zeros((b, n, 4), dtype=dtype).at[:, :, 2].set(9.81)
wash = jax.jit(lambda *a: a)
x0, ref, target, pts, mask, us = jax.block_until_ready(
    wash(x0, ref, target, pts, mask, us)
)
fn = jax.jit(step)
print("compiling...", flush=True)
out = jax.block_until_ready(fn(x0, ref, target, pts, mask, us))
print("tracing...", flush=True)
with jax.profiler.trace("/tmp/jaxtrace_step"):
    for _ in range(3):
        out = jax.block_until_ready(fn(x0, ref, target, pts, mask, us))
print("done", flush=True)
