"""Single-robot real-time probe: full-fidelity closed-loop tick vs 33 ms.

The reference's own real-time bar is the 30 Hz avoidance timer on one
vehicle (``AvoidanceStateMachine.cpp:109``: 33 ms MPC period).  This probe
runs ONE scenario at full fidelity — 480x360 depth render, 100-keyframe
rolling map (``mpc_parameters.yaml`` max_frame_count), N=30 engine horizon,
<=3 outer solves — and reports per-tick latency two ways:

  * ``chained``: K ticks per dispatch via ``rollout_world`` (lax.scan) —
    the device compute time per tick, with this environment's ~25 ms axon
    tunnel round-trip amortized away.  This is the number to hold against
    the 33 ms budget: a production host (no tunnel) sees the dispatch floor
    of a local PCIe/ICI link (<1 ms), and the host loop async-dispatches.
  * ``single``: one tick per dispatch, blocking — what this tunneled dev
    environment sees; dominated by the round-trip.

Prints one JSON line; archive the result in PARITY.md.

Usage:  timeout 1200 python -m avoid_mpc_tpu.tools.probe_single_robot
"""

from __future__ import annotations

import json
import os
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    sys.path.insert(0, _REPO)
    from avoid_mpc_tpu.utils.compile_cache import enable_persistent_cache

    enable_persistent_cache()
    import jax
    import jax.numpy as jnp

    from avoid_mpc_tpu.config import EngineConfig
    from avoid_mpc_tpu.sim import ScenarioConfig, random_forest
    from avoid_mpc_tpu.sim.world import build_world, rollout_world, world_init, world_step
    from avoid_mpc_tpu.utils.profiling import LatencyTracker

    chain_k = int(os.environ.get("PROBE_CHAIN", 30))
    ticks_warm = 60  # fly into the TASK phase so the engine path is hot

    cfg = EngineConfig()
    params, hyper = build_world(cfg)  # full fidelity: render_scale=1, 100 frames
    field = random_forest(jax.random.PRNGKey(11), ScenarioConfig(n_cylinders=24))
    ws = world_init(cfg, params, hyper, jnp.zeros(2), jax.random.PRNGKey(5))

    # decay is a TRACED argument fed from measured latency each dispatch
    # (AvoidanceStateMachine.cpp:329-343) — not baked into the closure
    roll = jax.jit(
        lambda ws, d: rollout_world(
            ws, field, params._replace(decay=d), hyper, chain_k
        )[0]
    )
    step1 = jax.jit(
        lambda ws, d: world_step(ws, field, params._replace(decay=d), hyper)[0]
    )
    tracker = LatencyTracker(init=float(cfg.mpc.decay))
    decay = lambda: jnp.asarray(min(tracker.decay, 0.1), jnp.float32)

    t0 = time.time()
    ws = jax.block_until_ready(roll(ws, decay()))  # compile + fly into TASK
    compile_s = time.time() - t0
    while ticks_warm > chain_k:
        ws = roll(ws, decay())
        ticks_warm -= chain_k
    ws = jax.block_until_ready(ws)

    t0 = time.time()
    ws1 = jax.block_until_ready(step1(ws, decay()))
    compile_single_s = time.time() - t0

    lat_chain = []
    for _ in range(5):
        t0 = time.time()
        ws = jax.block_until_ready(roll(ws, decay()))
        dt_s = time.time() - t0
        tracker.update(dt_s / chain_k)
        lat_chain.append(dt_s / chain_k)
    lat_single = []
    for _ in range(5):
        t0 = time.time()
        ws1 = jax.block_until_ready(step1(ws1, decay()))
        dt_s = time.time() - t0
        tracker.update(dt_s)
        lat_single.append(dt_s)

    import numpy as np

    chained_ms = float(np.median(lat_chain)) * 1e3
    single_ms = float(np.median(lat_single)) * 1e3
    print(json.dumps({
        "metric": "single_robot_tick_ms",
        "chained_per_tick_ms": round(chained_ms, 2),
        "single_dispatch_ms": round(single_ms, 2),
        "budget_ms": 33.3,
        "meets_30hz_device": bool(chained_ms <= 33.3),
        "chain_len": chain_k,
        "render": [int(hyper.render_h), int(hyper.render_w)],
        "map_frames": int(hyper.map_shape.n_frames),
        "points_per_frame": int(hyper.map_shape.points_per_frame),
        "horizon": int(hyper.engine.n),
        "outer_iters": int(hyper.engine.max_outer_iters),
        "decay_final_ms": round(min(tracker.decay, 0.1) * 1e3, 3),
        "compile_s": round(compile_s, 1),
        "compile_single_s": round(compile_single_s, 1),
        "mission": int(ws.mission),
        "device": str(jax.devices()[0]),
    }), flush=True)


if __name__ == "__main__":
    main()
