"""The full BASELINE.md benchmark matrix (round-2, VERDICT item 4).

Five configs from BASELINE.json plus the virtual-mesh scaling curve, each
with p50/p99 step latency:

  obstacle_free   4096 concurrent obstacle-free waypoint-tracking solves
                  (obstacle slots at the far sentinel, as the reference pads
                  absent obstacles, AvoidanceStateMachine.cpp:225)
  single_1k       ONE scenario, 1k-point cloud: per-step 3-NN association +
                  warm-started solve — the single-robot latency config
  forest_10k      dual-map cluttered forest: full receding-horizon engine
                  step (edge warm start + per-stage obstacle association +
                  <=3 outer solves) against a 10k-point rolling map,
                  N=30 reference horizon, batched scenarios
  replay_12ms     12 m/s flight log re-driven through perception + mapping +
                  engine open-loop (sim/replay.py) — per-tick latency
  montecarlo_4096 the bench.py headline (4096 randomized forests)
  scaling         solves/s on a virtual CPU mesh at 1/2/4/8 devices
                  (subprocess with JAX_PLATFORMS=cpu) — the multi-host
                  stand-in; efficiency = T_n / (n * T_1)

Writes one JSON artifact (default ``BENCH_MATRIX.json`` at the repo root)
and prints each config's result as it lands.  Protocol mirrored from the
reference's offline benchmark (warm-up, then timed loop,
``tools/mpc_obstacle_casadi.py:499-536``).
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _timed_steps(fn, args, n_steps, carry_idx=None):
    """Run fn(*args) n_steps times; if carry_idx, feed outputs back into the
    argument list (warm-start semantics).  Returns latency list (s)."""
    import jax

    lat = []
    for _ in range(n_steps):
        t0 = time.time()
        out = jax.block_until_ready(fn(*args))
        lat.append(time.time() - t0)
        if carry_idx is not None:
            args = list(args)
            for ai, oi in carry_idx:
                args[ai] = out[oi]
            args = tuple(args)
    return lat


def _stats(lat, batch):
    import numpy as np

    p50 = float(np.percentile(lat, 50))
    p99 = float(np.percentile(lat, 99))
    return {
        "p50_ms": round(p50 * 1e3, 3),
        "p99_ms": round(p99 * 1e3, 3),
        "solves_per_sec": round(batch / p50, 1),
        "batch": batch,
        "timed_steps": len(lat),
    }


CHAIN_K = int(os.environ.get("BENCH_CHAIN", 32))


def _chained_device_stats(chain_fn, args, batch, reps=4):
    """Device-honest per-tick latency: `chain_fn` runs CHAIN_K+1 ticks per
    dispatch (lax.scan + one trailing tick), so the axon tunnel's ~25 ms
    per-dispatch host round-trip is amortized to <1 ms (same protocol as
    bench.py's headline).  Returns {p50_device_ms, solves_per_sec_device,
    chain_len, chain_compile_s}."""
    import jax

    t0 = time.time()
    jax.block_until_ready(chain_fn(*args))
    compile_s = time.time() - t0
    lat = []
    for _ in range(reps):
        t0 = time.time()
        jax.block_until_ready(chain_fn(*args))
        lat.append((time.time() - t0) / (CHAIN_K + 1))
    import numpy as np

    p50 = float(np.percentile(lat, 50))
    return {
        "p50_device_ms": round(p50 * 1e3, 3),
        "solves_per_sec_device": round(batch / p50, 1),
        "chain_len": CHAIN_K + 1,
        "chain_compile_s": round(compile_s, 1),
    }


def _chain_solver_step(step):
    """CHAIN_K receding ticks per dispatch for a (x0, ref, target, pts, mask,
    us) -> (us, ref, cost, conv) solver step (ref/us carried)."""
    import jax

    def chained(x0, ref, target, pts, mask, us):
        def body(carry, _):
            us_c, ref_c = carry
            us2, ref2, _, _ = step(x0, ref_c, target, pts, mask, us_c)
            return (us2, ref2), None

        (us_f, ref_f), _ = jax.lax.scan(body, (us, ref), None, length=CHAIN_K)
        return step(x0, ref_f, target, pts, mask, us_f)

    return chained


def bench_obstacle_free(steps: int):
    import jax
    import jax.numpy as jnp

    from __graft_entry__ import _build_problem_batch, _solve_step_fn

    b, n_pts = 4096, 8
    step, cfg = _solve_step_fn(jnp.float32)
    n = cfg.horizon_steps
    x0, ref, target, pts, mask = _build_problem_batch(b, n, n_pts, jnp.float32)
    # obstacle-free: mask out every cloud point -> far-sentinel association
    mask = jnp.zeros_like(mask)
    us = jnp.zeros((b, n, 4), jnp.float32).at[:, :, 2].set(9.81)
    wash = jax.jit(lambda *a: a)
    x0, ref, target, pts, mask, us = jax.block_until_ready(
        wash(x0, ref, target, pts, mask, us)
    )
    fn = jax.jit(step)
    t0 = time.time()
    out = jax.block_until_ready(fn(x0, ref, target, pts, mask, us))
    compile_s = time.time() - t0
    lat = _timed_steps(fn, (x0, ref, target, pts, mask, out[0]), steps,
                       carry_idx=[(5, 0), (1, 1)])
    chain = jax.jit(_chain_solver_step(step))
    dev = _chained_device_stats(chain, (x0, ref, target, pts, mask, us), b)
    return {**_stats(lat, b), **dev, "horizon": n,
            "compile_s": round(compile_s, 1)}


def bench_single_1k(steps: int):
    import jax
    import jax.numpy as jnp

    from __graft_entry__ import _build_problem_batch, _solve_step_fn

    b, n_pts = 1, 1024
    step, cfg = _solve_step_fn(jnp.float32)
    n = cfg.horizon_steps
    x0, ref, target, pts, mask = _build_problem_batch(b, n, n_pts, jnp.float32)
    us = jnp.zeros((b, n, 4), jnp.float32).at[:, :, 2].set(9.81)
    wash = jax.jit(lambda *a: a)
    x0, ref, target, pts, mask, us = jax.block_until_ready(
        wash(x0, ref, target, pts, mask, us)
    )
    fn = jax.jit(step)
    t0 = time.time()
    out = jax.block_until_ready(fn(x0, ref, target, pts, mask, us))
    compile_s = time.time() - t0
    lat = _timed_steps(fn, (x0, ref, target, pts, mask, out[0]), steps,
                       carry_idx=[(5, 0), (1, 1)])
    chain = jax.jit(_chain_solver_step(step))
    dev = _chained_device_stats(chain, (x0, ref, target, pts, mask, us), b)
    return {**_stats(lat, b), **dev, "horizon": n, "cloud_points": n_pts,
            "compile_s": round(compile_s, 1),
            "note": "p50_ms includes the ~25 ms per-dispatch tunnel floor; "
                    "p50_device_ms is the chained device time"}


def _forest_rolling_maps(b, n_frames, pts_per_frame, key):
    """Per-scenario 10k-point rolling maps filled from random forests:
    obstacle cloud = cylinder surface samples, edge cloud = trunk silhouette
    verticals (the role Canny edges play in FrameKDMap.cpp:176-214)."""
    import jax
    import jax.numpy as jnp

    from avoid_mpc_tpu.mapping.rolling_map import MapShape, RollingMap, map_init
    from avoid_mpc_tpu.sim.scenarios import (
        ScenarioConfig,
        forest_point_cloud,
        random_forest,
    )

    shape = MapShape(n_frames=n_frames, points_per_frame=pts_per_frame)
    scfg = ScenarioConfig(n_cylinders=32)

    def one(k):
        k1, k2, k3 = jax.random.split(k, 3)
        field = random_forest(k1, scfg)
        pts, mask = forest_point_cloud(field, n_frames * pts_per_frame, k2)
        epts, emask = forest_point_cloud(field, n_frames * pts_per_frame, k3)
        m = map_init(shape)
        m = m._replace(
            kf_points=pts.reshape(n_frames, pts_per_frame, 3),
            kf_mask=mask.reshape(n_frames, pts_per_frame),
            kf_edge_points=epts.reshape(n_frames, pts_per_frame, 3),
            kf_edge_mask=emask.reshape(n_frames, pts_per_frame),
            kf_valid=jnp.ones(n_frames, bool),
            head=jnp.asarray(n_frames - 1, jnp.int32),
            count=jnp.asarray(n_frames, jnp.int32),
            cur_points=pts[:pts_per_frame],
            cur_mask=mask[:pts_per_frame],
            cur_edge_points=epts[:pts_per_frame],
            cur_edge_mask=emask[:pts_per_frame],
            cur_valid=jnp.asarray(True),
        )
        return m

    return jax.vmap(one)(jax.random.split(key, b))


def bench_forest_10k(steps: int, batch: int = 1024):
    """Full receding-horizon engine tick vs a 10k-point dual map."""
    import jax
    import jax.numpy as jnp

    from avoid_mpc_tpu.config import EngineConfig
    from avoid_mpc_tpu.engine import (
        EngineHyper,
        EngineParams,
        engine_init,
        receding_step,
    )

    cfg = EngineConfig()  # N=30 reference horizon, mpc_max_iter=3
    p = EngineParams.from_config(cfg)
    h = EngineHyper.from_config(cfg)
    b = batch
    n_frames, ppf = 4, 2560  # ~10k queryable points (cur + F-1 keyframes + cur)
    maps = _forest_rolling_maps(b, n_frames, ppf, jax.random.PRNGKey(0))

    es = engine_init(cfg)
    es = jax.tree.map(lambda a: jnp.broadcast_to(a[None], (b,) + a.shape), es)
    quad = jnp.zeros((b, 10), jnp.float32).at[:, 2].set(1.5).at[:, 4].set(8.0)

    def step(es, quad, maps):
        return jax.vmap(lambda e, q, m: receding_step(e, q, m, p, h))(es, quad, maps)

    fn = jax.jit(step)
    wash = jax.jit(lambda *a: a)
    es, quad, maps = jax.block_until_ready(wash(es, quad, maps))
    t0 = time.time()
    out = jax.block_until_ready(fn(es, quad, maps))
    compile_s = time.time() - t0
    lat = _timed_steps(fn, (out[0], quad, maps), steps, carry_idx=[(0, 0)])

    def chained(es, quad, maps):
        def body(e, _):
            e2, _out = step(e, quad, maps)
            return e2, None

        e_f, _ = jax.lax.scan(body, es, None, length=CHAIN_K)
        return step(e_f, quad, maps)

    dev = _chained_device_stats(jax.jit(chained), (es, quad, maps), b)
    qpts = (n_frames) * ppf  # cur + (F-1) live keyframe slots in the query set
    return {**_stats(lat, b), **dev, "horizon": h.n,
            "outer_iters": h.max_outer_iters,
            "map_points": qpts, "compile_s": round(compile_s, 1)}


def bench_replay_12ms(steps: int):
    import jax
    import jax.numpy as jnp

    from avoid_mpc_tpu.config import EngineConfig, MPCConfig, TaskConfig
    from avoid_mpc_tpu.sim import ScenarioConfig, build_world, random_forest
    from avoid_mpc_tpu.sim.replay import record_flight, replay

    import dataclasses

    cfg = EngineConfig(
        mpc=dataclasses.replace(MPCConfig(), speed=12.0), task=TaskConfig(height=1.5)
    )
    params, hyper = build_world(cfg, render_scale=2, grid_scale=5, map_frames=16)
    field = random_forest(jax.random.PRNGKey(7), ScenarioConfig(n_cylinders=24))
    ticks = 240
    t0 = time.time()
    log = jax.block_until_ready(
        record_flight(cfg, params, hyper, field, ticks, jax.random.PRNGKey(3))
    )
    record_s = time.time() - t0
    speed = float(jnp.max(jnp.linalg.norm(log.v, axis=-1)))

    rep = jax.jit(lambda lg: replay(lg, cfg, params, hyper))
    t0 = time.time()
    out = jax.block_until_ready(rep(log))
    compile_s = time.time() - t0
    lat = _timed_steps(rep, (log,), steps)
    import numpy as np

    p50 = float(np.percentile(lat, 50))
    u_err = float(jnp.max(jnp.abs(out[0] - log.u_cmd)))
    return {
        "p50_ms_per_tick": round(p50 / ticks * 1e3, 3),
        "p99_ms_per_tick": round(float(np.percentile(lat, 99)) / ticks * 1e3, 3),
        "ticks": ticks,
        "peak_speed_mps": round(speed, 2),
        "replay_cmd_max_abs_err": u_err,
        "record_s": round(record_s, 1),
        "compile_s": round(compile_s, 1),
    }


def bench_montecarlo_4096(steps: int):
    import jax
    import jax.numpy as jnp

    from __graft_entry__ import _build_problem_batch, _solve_step_fn

    b, n_pts = 4096, 1024
    step, cfg = _solve_step_fn(jnp.float32)
    n = cfg.horizon_steps
    x0, ref, target, pts, mask = _build_problem_batch(b, n, n_pts, jnp.float32)
    us = jnp.zeros((b, n, 4), jnp.float32).at[:, :, 2].set(9.81)
    wash = jax.jit(lambda *a: a)
    x0, ref, target, pts, mask, us = jax.block_until_ready(
        wash(x0, ref, target, pts, mask, us)
    )
    fn = jax.jit(step)
    t0 = time.time()
    out = jax.block_until_ready(fn(x0, ref, target, pts, mask, us))
    compile_s = time.time() - t0
    lat = _timed_steps(fn, (x0, out[1], target, pts, mask, out[0]), steps,
                       carry_idx=[(5, 0), (1, 1)])
    # chained device number (same protocol as the other legs / bench.py):
    # the per-dispatch wall p50 above is tunnel-floor dominated here
    chain = jax.jit(_chain_solver_step(step))
    dev = _chained_device_stats(chain, (x0, ref, target, pts, mask, us), b)
    return {**_stats(lat, b), **dev, "horizon": n, "cloud_points": n_pts,
            "sqp_iters": 10, "compile_s": round(compile_s, 1)}


def bench_scaling():
    """Run the weak-scaling sweep (bench_scaling.py --sweep): each mesh size
    in its own core-pinned CPU subprocess, compile excluded, >=20 steps,
    core-normalized efficiency (round-2 VERDICT item 4 methodology)."""
    env = dict(os.environ)
    # The sweep driver itself must be a CPU-only python: with
    # PALLAS_AXON_POOL_IPS inherited, its sitecustomize would claim the one
    # TPU chip (already held by THIS process) and block forever.
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env["JAX_PLATFORMS"] = "cpu"
    out = subprocess.run(
        [sys.executable,
         os.path.join(_REPO, "avoid_mpc_tpu", "tools", "bench_scaling.py"),
         "--sweep"],
        capture_output=True, text=True, cwd=_REPO, timeout=3600, env=env,
    )
    for line in reversed(out.stdout.strip().splitlines()):
        try:
            return json.loads(line)
        except json.JSONDecodeError:
            continue
    return {"error": out.stderr[-2000:]}


CONFIGS = {
    "obstacle_free": bench_obstacle_free,
    "single_1k": bench_single_1k,
    "forest_10k": bench_forest_10k,
    "replay_12ms": bench_replay_12ms,
    "montecarlo_4096": bench_montecarlo_4096,
    "scaling": bench_scaling,
}


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--configs", default=None, help=",".join(CONFIGS))
    parser.add_argument("--steps", type=int, default=20)
    parser.add_argument("--out", default=os.path.join(_REPO, "BENCH_MATRIX.json"))
    parser.add_argument("--merge", action="store_true",
                        help="keep existing legs in --out, refresh only --configs")
    args = parser.parse_args(argv)

    sys.path.insert(0, _REPO)
    from avoid_mpc_tpu.utils.compile_cache import enable_persistent_cache

    enable_persistent_cache()
    import jax

    try:
        commit = subprocess.run(
            ["git", "rev-parse", "--short", "HEAD"], cwd=_REPO,
            capture_output=True, text=True, timeout=10,
        ).stdout.strip()
    except Exception:
        commit = "unknown"

    names = args.configs.split(",") if args.configs else list(CONFIGS)
    results = {}
    if args.merge and os.path.exists(args.out):
        # refresh a subset of legs in an existing matrix (each leg carries
        # its own commit stamp, so partial regeneration stays honest)
        with open(args.out) as f:
            results = json.load(f).get("results", {})
    for name in names:
        fn = CONFIGS[name]
        t0 = time.time()
        try:
            res = fn() if name == "scaling" else fn(args.steps)
        except Exception as e:  # record, keep the matrix going
            res = {"error": f"{type(e).__name__}: {e}"}
        res["wall_s"] = round(time.time() - t0, 1)
        res["commit"] = commit
        results[name] = res
        print(json.dumps({name: res}), flush=True)

    payload = {"device": str(jax.devices()[0]), "results": results}
    with open(args.out, "w") as f:
        json.dump(payload, f, indent=2)
    print("wrote", args.out, flush=True)


if __name__ == "__main__":
    main()
