"""Component-level attribution of the control tick on the real chip.

VERDICT r4 item 4: the 27.4 ms single-robot tick and the 20.4 ms forest_10k
step were only ever measured whole; this probe times each component of the
tick as its own chained dispatch so the render / map-ops / solve split is a
measured artifact, not a guess.

Components (single-robot full fidelity, 480x640 render, 100x3072 map):
  render      render_depth of the 24-cylinder field
  ingest      process_depth_frame + map_add_frame + map_keyframe_update
              (includes DroneBehindPts 10-NN per frame + dedupe 1-NN)
  assoc       the engine's per-stage obstacle association: ONE outer iter's
              map_query (Q=N stages, k=3) over the full ~310k-point map
  guard       map_nearest_distance + edge map_query (Q=1 each) — the
              PlanWapionts queries, one outer iter
  solve       one warm-started box-iLQR solve at the engine's budget
  engine      the whole receding_step (3 outer iters of the above)
  ctrl_plant  bfctrl FSM + geometric controller + 6-DoF plant step

plus the forest_10k batched shapes (B=1024, 4x2560 map): assoc / solve /
engine legs.  Each component runs as a lax.scan chain of CHAIN iterations
per dispatch with data-dependent carries (no CSE hoisting), timed over
several dispatches; the per-iteration median is reported.

Writes one JSON line per component and a final summary JSON; archive as
ATTRIBUTION.json.

Usage:  timeout 5400 python -m avoid_mpc_tpu.tools.attribute_tick
"""

from __future__ import annotations

import json
import os
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CHAIN = int(os.environ.get("ATTR_CHAIN", 16))
REPS = int(os.environ.get("ATTR_REPS", 5))
# ATTR_SMOKE=1: tiny shapes on CPU, purely to validate tracing before
# spending a TPU compile round on the real shapes.
SMOKE = os.environ.get("ATTR_SMOKE", "") == "1"


def _time_chained(name, fn, *args):
    """fn(*args) runs CHAIN iterations internally; time per iteration."""
    import jax
    import numpy as np

    t0 = time.time()
    out = jax.block_until_ready(fn(*args))
    compile_s = time.time() - t0
    lat = []
    for _ in range(REPS):
        t0 = time.time()
        out = jax.block_until_ready(fn(*args))
        lat.append((time.time() - t0) / CHAIN)
    ms = float(np.median(lat)) * 1e3
    rec = {"component": name, "per_iter_ms": round(ms, 3),
           "compile_s": round(compile_s, 1)}
    print(json.dumps(rec), flush=True)
    return ms


def main():
    sys.path.insert(0, _REPO)
    from avoid_mpc_tpu.utils.compile_cache import enable_persistent_cache

    enable_persistent_cache()
    import jax
    import jax.numpy as jnp

    from avoid_mpc_tpu.config import EngineConfig
    from avoid_mpc_tpu.engine import (
        EngineHyper, EngineParams, engine_init, receding_step,
    )
    from avoid_mpc_tpu.engine.receding import (
        _associate_obstacles, _edge_warm_start,
    )
    from avoid_mpc_tpu.mapping.rolling_map import (
        MapShape, map_add_frame, map_init, map_keyframe_update, map_query,
        map_nearest_distance,
    )
    from avoid_mpc_tpu.ops.depth import CameraModel, process_depth_frame
    from avoid_mpc_tpu.sim import ScenarioConfig, random_forest
    from avoid_mpc_tpu.sim.sensors import render_depth
    from avoid_mpc_tpu.sim.world import build_world
    from avoid_mpc_tpu.solver.ilqr import MPCProblem, solve

    if SMOKE:
        jax.config.update("jax_platforms", "cpu")

    results = {}
    cfg = EngineConfig()
    if SMOKE:
        params, hyper = build_world(cfg, render_scale=8, map_frames=3)
    else:
        params, hyper = build_world(cfg)  # full fidelity
    eng_p = params.engine
    eng_h = hyper.engine
    n, k = eng_h.n, eng_h.k
    field = random_forest(jax.random.PRNGKey(11), ScenarioConfig(n_cylinders=24))

    # --- synthetic full map at reference scale (100+1 frames x 3072 pts) ---
    shape = hyper.map_shape
    f, ppf = shape.n_frames, shape.points_per_frame
    key = jax.random.PRNGKey(0)
    kpts = jax.random.uniform(key, (f, ppf, 3), jnp.float32, 0.0, 40.0)
    m = map_init(shape)
    m = m._replace(
        kf_points=kpts, kf_mask=jnp.ones((f, ppf), bool),
        kf_edge_points=kpts + 0.05, kf_edge_mask=jnp.ones((f, ppf), bool),
        kf_valid=jnp.ones(f, bool),
        head=jnp.asarray(f - 1, jnp.int32), count=jnp.asarray(f, jnp.int32),
        cur_points=kpts[0], cur_mask=jnp.ones(ppf, bool),
        cur_edge_points=kpts[0] + 0.05, cur_edge_mask=jnp.ones(ppf, bool),
        cur_valid=jnp.asarray(True), pending=jnp.asarray(True),
    )
    m = jax.block_until_ready(jax.jit(lambda x: x)(m))

    quad = jnp.zeros(10, jnp.float32).at[2].set(1.5).at[4].set(8.0)
    es = engine_init(cfg)
    Twc = jnp.eye(4, dtype=jnp.float32).at[:3, 3].set(jnp.asarray([5.0, 0.0, 1.5]))

    # render: carry the key so every frame differs
    @jax.jit
    def chain_render(key):
        def body(key, _):
            key, kn = jax.random.split(key)
            d = render_depth(Twc, field, hyper.pcfg, hyper.render_h,
                             hyper.render_w, key=kn)
            return key, jnp.mean(d)
        key, out = jax.lax.scan(body, key, None, length=CHAIN)
        return key, out

    results["render"] = _time_chained("render", chain_render, key)

    # ingest: depth -> clouds -> add + maintenance, carrying the map
    depth0 = jax.block_until_ready(
        jax.jit(lambda: render_depth(Twc, field, hyper.pcfg, hyper.render_h,
                                     hyper.render_w, key=key))()
    )
    Twb = jnp.eye(4, dtype=jnp.float32).at[:3, 3].set(jnp.asarray([5.0, 0.0, 1.5]))

    @jax.jit
    def chain_ingest(m, depth):
        def body(carry, i):
            m, d = carry
            pts, mask, epts, emask = process_depth_frame(d, Twb, params.cam)
            m2 = map_add_frame(m, pts, mask, epts, emask, Twc)
            m2 = map_keyframe_update(m2, params.Tbc, params.depth_min,
                                     params.dedupe_dist, params.dedupe_count)
            return (m2, d + 1e-6 * i.astype(jnp.float32)), None
        (m, _), _ = jax.lax.scan(body, (m, depth), jnp.arange(CHAIN))
        return m

    results["ingest"] = _time_chained("ingest", chain_ingest, m, depth0)

    # assoc: one outer iteration's per-stage k-NN over the full map,
    # brute-force vs bbox-culled
    ref0 = es.ref_path
    eng_h_brute = eng_h._replace(assoc_radius=0.0)

    def make_chain_assoc(hh):
        @jax.jit
        def chain_assoc(ref, m):
            def body(ref, _):
                pts, replan, _ovf = _associate_obstacles(ref, m, eng_p, k, hh)
                # data-dependent carry: nudge the ref path by the neighbors
                return ref + 1e-7 * jnp.mean(pts), replan
            ref, _ = jax.lax.scan(body, ref, None, length=CHAIN)
            return ref
        return chain_assoc

    results["assoc_brute"] = _time_chained(
        "assoc_brute", make_chain_assoc(eng_h_brute), ref0, m)
    results["assoc_culled"] = _time_chained(
        "assoc_culled", make_chain_assoc(eng_h), ref0, m)

    # guard: PlanWapionts queries (1-NN obstacle distance + 1-NN edge)
    @jax.jit
    def chain_guard(ref, m):
        def body(ref, _):
            ref2, safe = _edge_warm_start(ref, m, eng_p)
            return ref + 1e-7 * jnp.mean(ref2), safe
        ref, _ = jax.lax.scan(body, ref, None, length=CHAIN)
        return ref

    results["guard"] = _time_chained("guard", chain_guard, ref0, m)

    # solve: one engine-budget box-iLQR solve, warm-start carried
    obs0 = jnp.full((n, k, 3), 1e4, jnp.float32)
    us0 = jnp.zeros((n, 4), jnp.float32).at[:, 2].set(9.81)
    target0 = ref0[-1]

    @jax.jit
    def chain_solve(us):
        def body(us, _):
            prob = MPCProblem(x0=quad, ref=ref0, obstacles=obs0, target=target0)
            res = solve(prob, us, eng_p.sp, eng_h.solver)
            return res.us, res.cost
        us, _ = jax.lax.scan(body, us, None, length=CHAIN)
        return us

    results["solve"] = _time_chained("solve", chain_solve, us0)

    # engine: the whole receding step
    @jax.jit
    def chain_engine(es, m):
        def body(es, _):
            es2, out = receding_step(es, quad, m, eng_p, eng_h)
            return es2, out.cost
        es, _ = jax.lax.scan(body, es, None, length=CHAIN)
        return es

    results["engine"] = _time_chained("engine", chain_engine, es, m)

    # ctrl+plant
    from avoid_mpc_tpu.control.bfctrl import (
        BfctrlParams, CommandInput, VfrHudInput, bfctrl_init, bfctrl_step,
    )
    from avoid_mpc_tpu.control.geometric import CMD_ACCELERATION
    from avoid_mpc_tpu.sim.plant import sixdof_init, sixdof_step

    bf = bfctrl_init(params.bfctrl)
    plant = sixdof_init(jnp.zeros(3, jnp.float32))

    @jax.jit
    def chain_ctrl(bf, plant):
        def body(carry, i):
            bf, plant = carry
            t = i.astype(jnp.float32) * 0.033
            cmd = CommandInput(
                mode=jnp.asarray(CMD_ACCELERATION, jnp.int32),
                p=jnp.zeros(3), v=jnp.zeros(3),
                a=jnp.asarray([0.1, 0.0, 9.8]), w=jnp.zeros(3),
                q=jnp.asarray([1.0, 0, 0, 0.0]), yaw=jnp.asarray(0.0),
                yaw_rate=jnp.asarray(0.0), thrust=jnp.asarray(0.0),
                age=jnp.asarray(0.0),
            )
            bf2, u, des, status, hov = bfctrl_step(
                bf, t, plant.p, plant.v, plant.q, cmd,
                jnp.asarray(0, jnp.int32), jnp.asarray(0.0),
                jnp.asarray(jnp.inf), jnp.zeros(2), params.bfctrl,
                imu_a=jnp.asarray([0.0, 0.0, 9.81]),
                vfr=VfrHudInput(throttle=jnp.asarray(0.3), age=jnp.asarray(0.0)),
            )
            plant2 = sixdof_step(plant, u.q, u.thrust, params.con_dt,
                                 params.plant)
            return (bf2, plant2), None
        (bf, plant), _ = jax.lax.scan(body, (bf, plant), jnp.arange(CHAIN))
        return bf, plant

    results["ctrl_plant"] = _time_chained("ctrl_plant", chain_ctrl, bf, plant)

    single_sum = (results["render"] + results["ingest"] + results["engine"]
                  + results["ctrl_plant"])
    print(json.dumps({"single_robot_component_sum_ms": round(single_sum, 2),
                      "note": "engine includes assoc/guard/solve x3"}),
          flush=True)

    # ------------------------------------------------------------------
    # forest_10k shapes: B=1024 scenarios, 4x2560 map
    from avoid_mpc_tpu.tools.bench_matrix import _forest_rolling_maps

    b, nf, fppf = (4, 4, 2560) if SMOKE else (1024, 4, 2560)
    maps = _forest_rolling_maps(b, nf, fppf, jax.random.PRNGKey(0))
    maps = jax.block_until_ready(jax.jit(lambda x: x)(maps))
    es_b = jax.tree.map(
        lambda a: jnp.broadcast_to(a[None], (b,) + a.shape), engine_init(cfg)
    )
    quad_b = jnp.zeros((b, 10), jnp.float32).at[:, 2].set(1.5).at[:, 4].set(8.0)
    ref_b = es_b.ref_path

    def make_chain_assoc_b(hh):
        @jax.jit
        def chain_assoc_b(ref, maps):
            def body(ref, _):
                pts, _, _ = jax.vmap(
                    lambda r, mm: _associate_obstacles(r, mm, eng_p, k, hh)
                )(ref, maps)
                return ref + 1e-7 * jnp.mean(pts), None
            ref, _ = jax.lax.scan(body, ref, None, length=CHAIN)
            return ref
        return chain_assoc_b

    results["forest_assoc_brute_b1024"] = _time_chained(
        "forest_assoc_brute_b1024", make_chain_assoc_b(eng_h_brute), ref_b, maps)
    results["forest_assoc_culled_b1024"] = _time_chained(
        "forest_assoc_culled_b1024", make_chain_assoc_b(eng_h), ref_b, maps)

    @jax.jit
    def chain_guard_b(ref, maps):
        def body(ref, _):
            ref2, safe = jax.vmap(
                lambda r, mm: _edge_warm_start(r, mm, eng_p)
            )(ref, maps)
            return ref + 1e-7 * ref2, None
        ref, _ = jax.lax.scan(body, ref, None, length=CHAIN)
        return ref

    results["forest_guard_b1024"] = _time_chained(
        "forest_guard_b1024", chain_guard_b, ref_b, maps)

    us_b = jnp.zeros((b, n, 4), jnp.float32).at[:, :, 2].set(9.81)
    obs_b = jnp.full((b, n, k, 3), 1e4, jnp.float32)

    @jax.jit
    def chain_solve_b(us):
        def body(us, _):
            def one(q, r, o, t, u):
                prob = MPCProblem(x0=q, ref=r, obstacles=o, target=t)
                return solve(prob, u, eng_p.sp, eng_h.solver).us
            us2 = jax.vmap(one)(quad_b, ref_b, obs_b, ref_b[:, -1], us)
            return us2, None
        us, _ = jax.lax.scan(body, us, None, length=CHAIN)
        return us

    results["forest_solve_b1024"] = _time_chained(
        "forest_solve_b1024", chain_solve_b, us_b)

    @jax.jit
    def chain_engine_b(es, maps):
        def body(es, _):
            es2, out = jax.vmap(
                lambda e, q, mm: receding_step(e, q, mm, eng_p, eng_h)
            )(es, quad_b, maps)
            return es2, None
        es, _ = jax.lax.scan(body, es, None, length=CHAIN)
        return es

    results["forest_engine_b1024"] = _time_chained(
        "forest_engine_b1024", chain_engine_b, es_b, maps)

    payload = {
        "chain": CHAIN, "reps": REPS,
        "device": str(jax.devices()[0]),
        "single_robot": {
            "render_ms": results["render"], "ingest_ms": results["ingest"],
            "assoc_brute_1iter_ms": results["assoc_brute"],
            "assoc_culled_1iter_ms": results["assoc_culled"],
            "guard_1iter_ms": results["guard"],
            "solve_1x_ms": results["solve"], "engine_ms": results["engine"],
            "ctrl_plant_ms": results["ctrl_plant"],
            "map_points": (f + 1) * ppf,
            "render_hw": [hyper.render_h, hyper.render_w],
        },
        "forest_10k_b1024": {
            "assoc_brute_1iter_ms": results["forest_assoc_brute_b1024"],
            "assoc_culled_1iter_ms": results["forest_assoc_culled_b1024"],
            "guard_1iter_ms": results["forest_guard_b1024"],
            "solve_1x_ms": results["forest_solve_b1024"],
            "engine_ms": results["forest_engine_b1024"],
            "map_points": nf * fppf,
        },
    }
    out_path = os.path.join(_REPO, "ATTRIBUTION.json")
    with open(out_path, "w") as fo:
        json.dump(payload, fo, indent=2)
    print(json.dumps({"wrote": out_path}), flush=True)


if __name__ == "__main__":
    main()
