"""Collision-barrier ablation — closed-loop Monte-Carlo sweep of the three
round-2 mitigation candidates for the diagnosed tangential-pass failure mode
(PARITY.md "Known quantitative gaps"; reference cost semantics
``tools/mpc_obstacle_casadi.py:186-204``):

  1. omnidirectional barrier weight (``collide_lambda_omni``),
  2. speed-scaled margin (``margin_v``),
  3. time-to-collision slow-down trigger (``ttc_threshold``).

All three are *runtime* parameters, so the whole sweep shares ONE compiled
world program: compile once, then each configuration is a few seconds of
device time.  Results (per-config collisions / min clearance / progress) go
to ``runs/ablation/results.json``.

Usage:
  python -m avoid_mpc_tpu.tools.ablate_barrier [--speed 8] [--ticks 400]
      [--batch 16] [--trees 24] [--configs baseline,omni03,...]
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
import sys
import time

sys.path.insert(
    0,
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
)

# name -> (lam_omni, margin_v, ttc_threshold)
CONFIGS: dict[str, tuple[float, float, float]] = {
    "baseline": (0.0, 0.0, 0.0),
    "omni03": (0.3, 0.0, 0.0),
    "omni10": (1.0, 0.0, 0.0),
    "margin003": (0.0, 0.03, 0.0),
    "margin006": (0.0, 0.06, 0.0),
    "ttc05": (0.0, 0.0, 0.5),
    "omni05_margin003": (0.5, 0.03, 0.0),
    "margin003_ttc05": (0.0, 0.03, 0.5),
    "margin006_omni10": (1.0, 0.06, 0.0),
    "margin006_ttc08": (0.0, 0.06, 0.8),
    "margin010": (0.0, 0.10, 0.0),
}


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--speed", type=float, default=8.0)
    parser.add_argument("--batch", type=int, default=16)
    parser.add_argument("--ticks", type=int, default=400)
    parser.add_argument("--chunk", type=int, default=100)
    parser.add_argument("--trees", type=int, default=24)
    parser.add_argument("--seed", type=int, default=1)
    parser.add_argument("--render-scale", type=int, default=2)
    parser.add_argument("--grid-scale", type=int, default=5)
    parser.add_argument("--map-frames", type=int, default=16)
    parser.add_argument("--out", default="runs/ablation")
    parser.add_argument("--configs", default=None,
                        help="comma list from: " + ",".join(CONFIGS))
    args = parser.parse_args(argv)

    from avoid_mpc_tpu.utils.compile_cache import enable_persistent_cache

    enable_persistent_cache()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from avoid_mpc_tpu.config import EngineConfig, MPCConfig, TaskConfig
    from avoid_mpc_tpu.sim import (
        ScenarioConfig,
        build_world,
        random_forest,
        rollout_world,
        world_init,
    )

    names = (args.configs.split(",") if args.configs else list(CONFIGS))
    os.makedirs(args.out, exist_ok=True)

    def make_cfg(lam_omni, margin_v, ttc):
        mpc = MPCConfig(speed=args.speed, margin_v=margin_v, ttc_threshold=ttc)
        mpc = dataclasses.replace(
            mpc, weights=dataclasses.replace(mpc.weights, collide_lambda_omni=lam_omni)
        )
        return EngineConfig(mpc=mpc, task=TaskConfig(height=1.5))

    # ONE build + ONE jitted graph for the whole sweep: the world params are
    # closed over (CameraModel shapes are trace-time statics), and the four
    # ablation knobs are jit ARGUMENTS patched into the params pytree inside
    # the trace — so every configuration reuses the same compiled program.
    cfg0 = make_cfg(*CONFIGS[names[0]])
    params0, hyper = build_world(
        cfg0, render_scale=args.render_scale, grid_scale=args.grid_scale,
        map_frames=args.map_frames,
    )
    if any(CONFIGS[n][2] > 0.0 for n in names):
        # ttc_threshold is a runtime knob here, but the TTC map query is a
        # trace-time gate (EngineHyper.use_ttc): compile it in whenever any
        # swept config needs it — the runtime (threshold > 0) check keeps
        # the semantics identical for the ttc=0 configs.
        hyper = hyper._replace(engine=hyper.engine._replace(use_ttc=True))

    keys = jax.random.split(jax.random.PRNGKey(args.seed), args.batch)
    scfg = ScenarioConfig(n_cylinders=args.trees)
    fields = jax.vmap(lambda k: random_forest(k, scfg))(keys)
    starts = jax.vmap(
        lambda k: jax.random.uniform(
            k, (2,), jnp.float32, -scfg.start_xy_jitter, scfg.start_xy_jitter
        )
    )(keys)

    def patch(knobs):
        lam_omni, margin_v, ttc = knobs
        eng = params0.engine
        sp = eng.sp
        cost = sp.cost._replace(lam_omni=lam_omni, margin_v=margin_v)
        return params0._replace(
            engine=eng._replace(sp=sp._replace(cost=cost), ttc_threshold=ttc)
        )

    @jax.jit
    def step_chunk(w, f, knobs):
        p = patch(knobs)
        return jax.vmap(lambda wi, fi: rollout_world(wi, fi, p, hyper, args.chunk))(w, f)

    n_chunks = max(args.ticks // args.chunk, 1)
    results = {}
    for name in names:
        lam_omni, margin_v, ttc = CONFIGS[name]
        cfg = make_cfg(lam_omni, margin_v, ttc)
        knobs = tuple(jnp.asarray(v, jnp.float32) for v in (lam_omni, margin_v, ttc))
        ws = jax.vmap(lambda s, k: world_init(cfg, params0, hyper, s, k))(starts, keys)
        min_clear = np.full(args.batch, np.inf)
        t0 = time.time()
        for _ in range(n_chunks):
            ws, diag = jax.block_until_ready(step_chunk(ws, fields, knobs))
            min_clear = np.minimum(min_clear, np.asarray(diag.clearance).min(axis=1))
        wall = time.time() - t0
        p = np.asarray(diag.p)
        res = {
            "collisions": int((min_clear <= 0.0).sum()),
            "min_clearance": round(float(min_clear.min()), 3),
            "per_scenario_min_clearance": [round(float(c), 3) for c in min_clear],
            "final_x_mean": round(float(p[:, -1, 0].mean()), 1),
            "final_x_min": round(float(p[:, -1, 0].min()), 1),
            "wall_s": round(wall, 1),
            "knobs": {"lam_omni": lam_omni, "margin_v": margin_v, "ttc": ttc},
        }
        results[name] = res
        print(json.dumps({name: res}), flush=True)

    payload = {
        "protocol": {
            "speed": args.speed, "batch": args.batch, "ticks": args.ticks,
            "trees": args.trees, "seed": args.seed,
            "render_scale": args.render_scale, "grid_scale": args.grid_scale,
            "map_frames": args.map_frames,
            "device": str(jax.devices()[0]),
        },
        "results": results,
    }
    path = os.path.join(args.out, f"results_speed{args.speed:g}.json")
    with open(path, "w") as f:
        json.dump(payload, f, indent=2)
    print("wrote", path, flush=True)


if __name__ == "__main__":
    main()
