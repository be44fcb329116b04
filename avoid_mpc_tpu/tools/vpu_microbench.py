"""Measured per-op VPU costs on the real chip — the roofline's missing input.

The analytic floor in ``tools/roofline.py`` charges every op as an FMA
(FMA = 2 flops at peak VPU rate) and waves at transcendentals as "small
constants".  Whether the fused solver's 2x-over-floor gap is exp/log1p,
divides, or plain issue overhead is a measurement question, not a modeling
one.  This tool times Pallas kernels that issue long chains of ONE op kind
on a (8, 128) f32 tile (exactly one VREG — the fused kernel's batch tile)
and reports cycles/op:

  * ``serial``   — a dependent chain: measures op LATENCY.
  * ``ilp8``     — 8 independent chains: throughput, loop-bookkeeping bound.
  * ``ilp8x4``   — 8 chains unrolled 4x: issue-limited THROUGHPUT, the
                   number that matters for the solver (its per-stage
                   obstacle terms are independent).

Cost model use: multiply the roofline's itemized op counts by these
measured cycles instead of assuming 1 cycle/op.

Usage: ``timeout 900 python avoid_mpc_tpu/tools/vpu_microbench.py`` (TPU).
Writes one JSON line; CPU/interpret runs are meaningless (numbers are
host-dependent) and refused.
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

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
from jax.experimental import pallas as pl  # noqa: E402
from jax.experimental.pallas import tpu as pltpu  # noqa: E402

# op name -> a bounded self-map y' = f(y) whose fixpoint/orbit stays in a
# safe range so a chain of any length neither overflows nor denormalizes.
OPS = {
    "fma": lambda y: y * 0.999 + 0.0005,  # -> 0.5
    "mul": lambda y: y * 1.0000001,
    "add": lambda y: y + 1e-7,
    "max": lambda y: jnp.maximum(y, 0.4999),
    "exp": lambda y: jnp.exp(-y),  # orbit -> 0.567
    "log1p": lambda y: jnp.log1p(y),  # decays slowly within (0, 1]
    "sqrt": lambda y: jnp.sqrt(y),  # -> 1
    "rsqrt": lambda y: jax.lax.rsqrt(y),  # -> 1
    "div": lambda y: 0.36 / y,  # 2-cycle orbit around 0.6
    "tanh": lambda y: jnp.tanh(y) + 0.5,
    "select": lambda y: jnp.where(y > 0.5, y * 0.999, y * 1.001),
}


def _make_kernel(fn, n_iter: int, lanes: int, unroll: int = 1):
    """n_iter loop iterations x lanes independent chains x unroll
    applications per chain per iteration (unroll amortizes the fori_loop's
    scalar bookkeeping, which otherwise caps measured throughput near
    1 op/cycle)."""

    def kernel(x_ref, o_ref):
        def body(_, ys):
            for _ in range(unroll):
                ys = tuple(fn(y) for y in ys)
            return ys

        ys = tuple(x_ref[i] for i in range(lanes))
        ys = jax.lax.fori_loop(0, n_iter, body, ys)
        acc = ys[0]
        for y in ys[1:]:
            acc = acc + y
        o_ref[0] = acc

    return kernel


def _time_chain(fn, n_iter: int, lanes: int, unroll: int = 1,
                reps: int = 7) -> float:
    """Wall seconds per kernel launch for n_iter chained ops x lanes chains.

    Sync is a host FETCH of one result element, not block_until_ready: for
    tiny-result kernels the axon tunnel's block_until_ready returns before
    device completion (measured: a 4M-op chain "completes" in 50 us with
    block, 58 ms with a fetch), so only the fetch bounds real execution.
    The fixed dispatch+fetch floor (~31 ms) cancels in the two-size slope.
    Each rep gets a distinct input to defeat any result memoization."""
    run = jax.jit(
        pl.pallas_call(
            _make_kernel(fn, n_iter, lanes, unroll),
            out_shape=jax.ShapeDtypeStruct((1, 8, 128), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )
    )
    xs = [
        jnp.full((lanes, 8, 128), 0.6 + 1e-4 * i, jnp.float32)
        for i in range(reps + 1)
    ]
    float(run(xs[0])[0, 0, 0])  # compile + warm
    ts = []
    for i in range(1, reps + 1):
        t0 = time.perf_counter()
        float(run(xs[i])[0, 0, 0])
        ts.append(time.perf_counter() - t0)
    return min(ts)


def measure(clock_hz: float) -> dict:
    out = {}
    for name, fn in OPS.items():
        row = {}
        for mode, (lanes, unroll) in (
            ("serial", (1, 1)),
            ("ilp8", (8, 1)),
            ("ilp8x4", (8, 4)),  # unrolled: amortizes loop bookkeeping
        ):
            # two sizes; the slope cancels launch/loop overhead.  Chains must
            # be LONG: the axon tunnel's per-dispatch floor is ~25-30 ms with
            # ms-scale jitter, so the op work in the slope (n2-n1 iterations)
            # has to dwarf it — millions of ops, not thousands.
            n1, n2 = 1_000_000, 4_000_000
            t1 = _time_chain(fn, n1, lanes, unroll)
            t2 = _time_chain(fn, n2, lanes, unroll)
            per_op_s = (t2 - t1) / ((n2 - n1) * lanes * unroll)
            row[mode] = round(per_op_s * clock_hz, 3)  # cycles per VREG op
        out[name] = row
    return out


def main():
    from bench import _enable_compile_cache

    _enable_compile_cache()
    dev = jax.devices()[0]
    if dev.platform not in ("tpu",) and "TPU" not in str(dev):
        print(json.dumps({"error": f"needs the real chip, got {dev}"}))
        return 1
    clock_hz = 0.94e9  # v5e TensorCore clock
    res = measure(clock_hz)
    fma = res["fma"]["ilp8x4"] or 1.0
    rel = {k: round(v["ilp8x4"] / fma, 2) for k, v in res.items()}
    print(
        json.dumps(
            {
                "metric": "vpu_cycles_per_vreg_op",
                "device": str(dev),
                "clock_hz_assumed": clock_hz,
                "tile": [8, 128],
                "ops": res,
                "ilp8x4_relative_to_fma": rel,
                "note": (
                    "serial = dependent-chain latency; ilp8 = 8 independent "
                    "chains; ilp8x4 = 8 chains unrolled 4x (amortized loop "
                    "bookkeeping = true issue throughput). cycles assume "
                    "the v5e 940 MHz clock; relative costs are clock-free."
                ),
            }
        ),
        flush=True,
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
