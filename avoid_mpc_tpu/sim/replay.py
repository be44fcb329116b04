"""Flight logging + sensor-stream replay — the high-speed replay path.

BASELINE.json config 4: "high-speed AirSim replay: 12 m/s cluttered-scene
point-cloud log, full receding-horizon closed loop."  The reference captures
rosbags of depth/odometry topics and re-drives its stack from them; here:

- :func:`record_flight` flies the full closed loop at speed (one scanned,
  jitted program) while capturing the per-tick sensor stream (depth frame,
  body pose, latency-compensated state) and the engine's commands,
- :func:`replay` re-runs the *perception + mapping + receding-horizon engine*
  stack open-loop on the logged stream — the deterministic regression /
  benchmarking harness: identical inputs must reproduce the logged commands,
  and per-tick latency can be measured without simulator cost.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from avoid_mpc_tpu.config import EngineConfig
from avoid_mpc_tpu.engine import engine_init, receding_step
from avoid_mpc_tpu.mapping import map_add_frame, map_init, map_keyframe_update
from avoid_mpc_tpu.ops.depth import process_depth_frame
from avoid_mpc_tpu.utils.quaternion import compose_tf
from avoid_mpc_tpu.sim.sensors import ObstacleField
from avoid_mpc_tpu.sim.world import (
    MISSION_TASK,
    WorldHyper,
    WorldParams,
    world_init,
    world_step_full,
)


class FlightLog(NamedTuple):
    """One scenario's captured sensor/command stream."""

    depth: jax.Array  # (T, h, w)
    Twb: jax.Array  # (T, 4, 4)
    x_pred: jax.Array  # (T, 10) latency-compensated MPC state
    mission: jax.Array  # (T,)
    u_cmd: jax.Array  # (T, 4) engine command actually flown
    p: jax.Array  # (T, 3) true position
    v: jax.Array  # (T, 3)


def record_flight(
    cfg: EngineConfig,
    params: WorldParams,
    hyper: WorldHyper,
    field: ObstacleField,
    n_ticks: int,
    key: jax.Array,
    start_xy=None,
    dtype=jnp.float32,
) -> FlightLog:
    """Fly the closed loop and capture the stream (jitted scan)."""
    start = jnp.zeros(2, dtype=dtype) if start_xy is None else jnp.asarray(start_xy, dtype)
    ws = world_init(cfg, params, hyper, start, key, dtype=dtype)

    def step(ws, _):
        ws, diag, depth, Twb, x_pred, _aux = world_step_full(ws, field, params, hyper)
        return ws, FlightLog(
            depth=depth, Twb=Twb, x_pred=x_pred, mission=diag.mission,
            u_cmd=diag.u_cmd, p=diag.p, v=diag.v,
        )

    _, log = jax.lax.scan(step, ws, None, length=n_ticks)
    return log


def replay(
    log: FlightLog,
    cfg: EngineConfig,
    params: WorldParams,
    hyper: WorldHyper,
    dtype=jnp.float32,
):
    """Re-drive perception + map + engine on the logged stream (open loop).

    Returns (u_cmd (T,4), is_safety (T,)) — with identical inputs this must
    reproduce the logged commands exactly (determinism regression), and it is
    the solver-latency benchmark without simulator cost.
    """
    m0 = map_init(hyper.map_shape, dtype=dtype)
    e0 = engine_init(cfg, dtype=dtype)

    def step(carry, inp):
        m, e = carry
        depth, Twb, x_pred, mission = inp
        pts, mask, epts, emask = process_depth_frame(depth, Twb, params.cam)
        m = map_add_frame(m, pts, mask, epts, emask, compose_tf(Twb, params.Tbc))
        m = map_keyframe_update(
            m, params.Tbc, params.depth_min, params.dedupe_dist, params.dedupe_count
        )
        e_new, out = receding_step(e, x_pred, m, params.engine, hyper.engine)
        in_task = mission == MISSION_TASK
        e = jax.tree.map(lambda a, b: jnp.where(in_task, a, b), e_new, e)
        return (m, e), (out.u_cmd, out.is_safety)

    (_, _), (u_cmd, is_safety) = jax.lax.scan(
        step, (m0, e0), (log.depth, log.Twb, log.x_pred, log.mission)
    )
    return u_cmd, is_safety
