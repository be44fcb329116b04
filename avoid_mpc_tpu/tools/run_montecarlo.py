"""Monte-Carlo campaign runner — the launch-file analogue.

Where the reference launches four processes and records rosbags
(``launch/mpc_obstacle_avoidance_sim.launch``), this runner executes a fleet
of fully-simulated closed-loop scenarios (rendered depth -> rolling map ->
MPC engine -> bfctrl -> 6-DoF plant) as one jitted, vmapped, optionally
mesh-sharded program, and writes an npz "bag" + summary.

Latency feedback (``AvoidanceStateMachine.cpp:329-343``): the reference
measures each solve's wall time and uses it as the next state-prediction
lookahead.  Here ``decay`` is a TRACED per-dispatch argument (not baked
into the jitted closure): each chunk runs with the LatencyTracker's current
EWMA of measured per-tick wall time (seeded with the config's decay,
clamped to 100 ms so a cold-compile chunk cannot poison the lookahead),
updated from the previous chunk's measurement — no recompilation.

Usage:
  python -m avoid_mpc_tpu.tools.run_montecarlo --batch 64 --ticks 300 \
      [--config cfg.yaml] [--out runs/campaign] [--shard]
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
import time


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--config", default=None)
    parser.add_argument("--batch", type=int, default=16)
    parser.add_argument("--ticks", type=int, default=200)
    parser.add_argument("--chunk", type=int, default=50, help="ticks per device dispatch")
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--out", default="runs/montecarlo")
    parser.add_argument("--render-scale", type=int, default=8)
    parser.add_argument("--grid-scale", type=int, default=4)
    parser.add_argument("--map-frames", type=int, default=None,
                        help="keyframe slots (default: config max_frame_count = 100)")
    parser.add_argument("--speed", type=float, default=None)
    parser.add_argument("--trees", type=int, default=16)
    parser.add_argument("--profile", default=None, help="jax.profiler trace dir")
    # --- collision-barrier ablation knobs (runtime values: no recompile) ---
    parser.add_argument("--lam-omni", type=float, default=None,
                        help="omnidirectional barrier weight (collide_lambda_omni)")
    parser.add_argument("--margin-v", type=float, default=None,
                        help="speed-scaled margin m/(m/s)")
    parser.add_argument("--ttc", type=float, default=None,
                        help="TTC slow-down threshold s (<=0 off)")
    parser.add_argument("--drone-radius", type=float, default=None)
    args = parser.parse_args(argv)

    import jax
    import jax.numpy as jnp
    import numpy as np

    from avoid_mpc_tpu.config import load_config
    from avoid_mpc_tpu.utils.compile_cache import enable_persistent_cache

    enable_persistent_cache()
    from avoid_mpc_tpu.sim import (
        ScenarioConfig,
        build_world,
        random_forest,
        rollout_world,
        world_init,
    )
    from avoid_mpc_tpu.utils.profiling import LatencyTracker, timed, trace
    from avoid_mpc_tpu.utils.recorder import FlightRecorder

    cfg = load_config(args.config)
    mpc_over = {}
    if args.speed is not None:
        mpc_over["speed"] = args.speed
    if args.margin_v is not None:
        mpc_over["margin_v"] = args.margin_v
    if args.ttc is not None:
        mpc_over["ttc_threshold"] = args.ttc
    if args.drone_radius is not None:
        mpc_over["drone_radius"] = args.drone_radius
    if args.lam_omni is not None:
        mpc_over["weights"] = dataclasses.replace(
            cfg.mpc.weights, collide_lambda_omni=args.lam_omni
        )
    if mpc_over:
        cfg = dataclasses.replace(cfg, mpc=dataclasses.replace(cfg.mpc, **mpc_over))

    params, hyper = build_world(
        cfg, render_scale=args.render_scale, grid_scale=args.grid_scale, map_frames=args.map_frames
    )
    scfg = ScenarioConfig(n_cylinders=args.trees)

    keys = jax.random.split(jax.random.PRNGKey(args.seed), args.batch)
    fields = jax.vmap(lambda k: random_forest(k, scfg))(keys)
    starts = jax.vmap(
        lambda k: jax.random.uniform(k, (2,), jnp.float32, -scfg.start_xy_jitter, scfg.start_xy_jitter)
    )(keys)
    ws = jax.vmap(lambda s, k: world_init(cfg, params, hyper, s, k))(starts, keys)

    step_chunk = jax.jit(
        jax.vmap(
            lambda w, f, d: rollout_world(
                w, f, params._replace(decay=d), hyper, args.chunk
            ),
            in_axes=(0, 0, None),
        )
    )

    rec = FlightRecorder(os.path.join(args.out, "campaign.npz"), config=cfg)
    tracker = LatencyTracker(init=float(cfg.mpc.decay))
    n_chunks = max(args.ticks // args.chunk, 1)

    # running per-scenario minimum clearance over the WHOLE flight (the
    # summary previously looked only at the final chunk)
    min_clear = np.full(args.batch, np.inf)
    ctx = trace(args.profile) if args.profile else _nullcontext()
    with ctx:
        for i in range(n_chunks):
            decay = jnp.asarray(min(tracker.decay, 0.1), jnp.float32)
            (ws, diag), dt_s = timed(step_chunk, ws, fields, decay)
            tracker.update(dt_s / args.chunk)
            rec.record(jax.tree.map(lambda a: np.asarray(a[:, -1]), diag))
            p = np.asarray(diag.p)
            min_clear = np.minimum(min_clear, np.asarray(diag.clearance).min(axis=1))
            print(
                f"chunk {i + 1}/{n_chunks}: t={float(ws.t[0]):.2f}s "
                f"x=[{p[:, -1, 0].min():.1f},{p[:, -1, 0].max():.1f}] "
                f"min_clear={min_clear.min():.2f} "
                f"tick={tracker.ewma * 1e3:.1f}ms",
                flush=True,
            )

    bag = rec.save()
    summary = {
        "batch": args.batch,
        "ticks": n_chunks * args.chunk,
        "tick_ms_ewma": tracker.ewma * 1e3,
        # tracker samples are already per-tick (update divides by chunk)
        "tick_ms_p50": tracker.percentile(50) * 1e3,
        "decay_final_ms": round(min(tracker.decay, 0.1) * 1e3, 3),
        "final_x_mean": float(np.asarray(diag.p)[:, -1, 0].mean()),
        "min_clearance": float(min_clear.min()),
        "collisions": int((min_clear <= 0.0).sum()),
        "per_scenario_min_clearance": [round(float(c), 3) for c in min_clear],
        "config": {
            "speed": cfg.mpc.speed, "drone_radius": cfg.mpc.drone_radius,
            "lam_omni": cfg.mpc.weights.collide_lambda_omni,
            "margin_v": cfg.mpc.margin_v, "ttc": cfg.mpc.ttc_threshold,
            "trees": args.trees, "map_frames": hyper.map_shape.n_frames,
            "seed": args.seed,
        },
        "bag": bag,
        "device": str(jax.devices()[0]),
    }
    with open(os.path.join(args.out, "summary.json"), "w") as f:
        json.dump(summary, f, indent=2)
    print(json.dumps(summary))


class _nullcontext:
    def __enter__(self):
        return self

    def __exit__(self, *a):
        return False


if __name__ == "__main__":
    main()
