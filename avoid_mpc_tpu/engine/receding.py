"""Receding-horizon engine — the reference TASK step as one jitted function.

Re-design of ``AvoidanceStateMachine::Step`` case TASK
(``AvoidanceStateMachine.cpp:322-355``) and its helpers.  The reference runs
this at 30 Hz on a ROS timer with data-dependent breaks; here it is a pure
function of (engine state, quadrotor state, rolling map) that batches over
thousands of scenarios with vmap — the early exit of the outer
re-association loop becomes a per-scenario *freeze mask* so the jaxpr stays
static while scenarios converge independently (SURVEY.md §7 "masked
fixed-iteration loops").

Per tick:
1.  **horizon shift** (``GetInitPath`` :24-54): slide the reference path one
    stage, extend the far end by task mode (forward / global-goal).
2.  **outer loop** x ``mpc_max_iter`` (:328-344), each iteration masked by an
    ``active`` flag:
    a. **edge warm start** (``PlanWapionts`` :259-281): if the first ref
       waypoint is within ``safety_distance`` of an obstacle, snap it to the
       nearest *edge-cloud* point — the Edge tree's local-minimum escape.
    b. **obstacle association** (``ProcessWaypoints`` :204-235): 3-NN of the
       obstacle cloud per horizon stage; ``need_replan`` when any stage is
       unsafe; missing neighbors padded with the far sentinel (:225).
    c. early exit when ``!need_replan && iter>0 && is_safety`` (:333-335).
    d. **solve** (:336-337): box-iLQR warm-started from the previous
       solution (the ``mNlpW0`` carry); fast-iteration budget on iter 0
       (the ``solverFaster`` analogue, HighLvlMpc.cpp:50-52).
    e. the reference path becomes the predicted optimal nodes 0..N-1
       (:338-343).
3.  **output** (:345-350): the first control when safe, otherwise the PD
    slow-down command (``PubSlowDownCmd`` :379-397).

Reference quirks mirrored deliberately (flagged for parity, not taste):
- the terminal target is pushed forward along +x and its y zeroed in *all*
  task modes (``GetRefStates`` :250-254),
- intermediate ref-path z is overwritten with the task height each shift
  (:46-52).

Divergence: the reference measures each solve's wall time and feeds it back
as the next prediction lookahead (:329-343).  Wall-clock does not exist
inside a jitted batch; latency compensation is a modeled per-scenario
``decay`` parameter applied by the caller when it samples the quadrotor
state (SURVEY.md §6 "decay").
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from avoid_mpc_tpu.config import GRAVITY, STATE_DIM, EngineConfig
from avoid_mpc_tpu.mapping.rolling_map import (
    RollingMap,
    map_nearest_distance,
    map_nonempty,
    map_query,
    map_query_culled,
)
from avoid_mpc_tpu.solver.ilqr import (
    MPCProblem,
    SolverHyper,
    SolverParams,
    solve,
)

TASK_FORWARD = 0
TASK_GLOBAL_GOAL = 1


class EngineParams(NamedTuple):
    """Runtime engine parameters (per-scenario broadcastable scalars)."""

    sp: SolverParams
    safety_distance: jax.Array
    speed: jax.Array
    height: jax.Array
    farthest_x: jax.Array  # TaskParam goal_x cap for the forward task (:31)
    slow_down_kp: jax.Array
    slow_down_kd: jax.Array
    mpc_T: jax.Array
    # Time-to-collision slow-down trigger (s); <= 0 disables (reference
    # triggers on instantaneous 1-NN distance only).  Round-2 extension for
    # the tangential-pass failure mode (PARITY.md "Known quantitative gaps").
    # Only consulted when EngineHyper.use_ttc is set (trace-time gate, so the
    # shipped default pays no 1-NN map query); float default matches the
    # sibling fields only via from_config — annotated honestly (ADVICE r2).
    ttc_threshold: jax.Array | float = 0.0

    @staticmethod
    def from_config(cfg: EngineConfig, dtype=jnp.float32) -> "EngineParams":
        m = cfg.mpc
        return EngineParams(
            sp=SolverParams.from_config(m, dtype=dtype),
            safety_distance=jnp.asarray(m.safety_distance, dtype=dtype),
            speed=jnp.asarray(m.speed, dtype=dtype),
            height=jnp.asarray(cfg.task.height, dtype=dtype),
            farthest_x=jnp.asarray(cfg.task.goal_x, dtype=dtype),
            slow_down_kp=jnp.asarray(m.slow_down_kp, dtype=dtype),
            slow_down_kd=jnp.asarray(m.slow_down_kd, dtype=dtype),
            mpc_T=jnp.asarray(m.mpc_T, dtype=dtype),
            ttc_threshold=jnp.asarray(m.ttc_threshold, dtype=dtype),
        )


class EngineHyper(NamedTuple):
    """Static engine knobs."""

    n: int  # horizon stages
    k: int  # nearest obstacle points per stage
    max_outer_iters: int  # mpc_max_iter
    task_mode: int  # TASK_FORWARD | TASK_GLOBAL_GOAL
    solver: SolverHyper
    solver_fast: SolverHyper
    # Trace-time gate for the TTC slow-down trigger: when False (the shipped
    # default, ttc_threshold = 0) the engine tick emits NO extra full-map
    # 1-NN query — the disabled feature costs nothing (ADVICE r2).  Enabling
    # recompiles, matching how the other shape knobs work.
    use_ttc: bool = False
    # Sub-linear obstacle association (the KD-tree's algorithmic role,
    # kd_tree_two.h:108-133): cull the cloud to the horizon path's bbox
    # expanded by assoc_radius before the per-stage k-NN.  Exact within the
    # radius (denser-than-m_max tubes rescued by exact brute force); the
    # collision softplus is exactly 0 in f32 beyond ~1.6 m (see
    # MPCConfig.assoc_radius).  radius <= 0 -> pure brute force.
    assoc_radius: float = 2.5
    assoc_m_max: int = 8192

    @staticmethod
    def from_config(cfg: EngineConfig) -> "EngineHyper":
        m = cfg.mpc
        return EngineHyper(
            n=m.horizon_steps,
            k=m.nearest_point_count,
            max_outer_iters=m.mpc_max_iter,
            task_mode=TASK_GLOBAL_GOAL if cfg.task.task == "global_goal" else TASK_FORWARD,
            # tol_exit off: these solves live inside the scanned world/tick
            # programs where the while_loop's dynamic trip count explodes
            # XLA compile time (see SolverHyper.tol_exit)
            solver=SolverHyper.from_config(m, fast=False)._replace(
                tol_exit=False
            ),
            solver_fast=SolverHyper.from_config(m, fast=True)._replace(
                tol_exit=False
            ),
            use_ttc=m.ttc_threshold > 0.0,
            assoc_radius=m.assoc_radius,
            assoc_m_max=m.assoc_m_max,
        )


class EngineState(NamedTuple):
    """Per-scenario state carried across control ticks."""

    ref_path: jax.Array  # (N, 10) — mRefPath
    us_warm: jax.Array  # (N, 4) — the mNlpW0 warm-start carry
    goal: jax.Array  # (10,) — mStateGlobalGoal


class StepOutput(NamedTuple):
    u_cmd: jax.Array  # (4,) acceleration-mode command [ax,ay,az,yaw_dot]
    is_safety: jax.Array  # bool — False -> u_cmd is the slow-down fallback
    need_replan: jax.Array  # bool — some stage still unsafe after the loop
    predicted: jax.Array  # (N+1, 10) predicted optimal trajectory
    obstacles: jax.Array  # (N, K, 3) last associated obstacle points
    cost: jax.Array  # solver objective (diagnostic)
    outer_iters: jax.Array  # int — outer iterations actually used


def engine_init(cfg: EngineConfig, dtype=jnp.float32) -> EngineState:
    """Initial straight-line reference path (``InitCircleState``,
    AvoidanceStateMachine.cpp:14-23): origin -> (3, 0, height)."""
    m = cfg.mpc
    n = m.horizon_steps
    h = cfg.task.height
    xs = jnp.linspace(0.0, 3.0, n, endpoint=False, dtype=dtype)
    ref = jnp.zeros((n, STATE_DIM), dtype=dtype)
    ref = ref.at[:, 0].set(xs).at[:, 2].set(h)
    goal = jnp.zeros(STATE_DIM, dtype=dtype).at[2].set(h)
    return EngineState(
        ref_path=ref,
        us_warm=jnp.zeros((n, 4), dtype=dtype).at[:, 2].set(GRAVITY),
        goal=goal,
    )


def _shift_horizon(state: EngineState, pos: jax.Array, p: EngineParams, h: EngineHyper):
    """``GetInitPath`` (:24-54): slide stages left, extend the far end."""
    ref = state.ref_path
    dt = p.sp.dt
    if h.task_mode == TASK_FORWARD:
        goalx = jnp.minimum(p.speed * p.mpc_T + pos[0], p.farthest_x)
        goaly = jnp.zeros_like(goalx)
        goalz = p.height
    else:
        last = ref[-1, 0:3]
        d = state.goal[0:3] - last
        dn = jnp.linalg.norm(d)
        step = d / jnp.maximum(dn, 1e-9) * jnp.minimum(dn, p.speed * dt)
        new = last + step
        goalx, goaly, goalz = new[0], new[1], new[2]
    shifted = ref.at[:-1].set(ref[1:]).at[:-1, 2].set(goalz)
    last_row = (
        jnp.zeros(STATE_DIM, dtype=ref.dtype)
        .at[0].set(goalx)
        .at[1].set(goaly)
        .at[2].set(goalz)
        .at[4].set(p.speed)  # terminal v_x = speed (:53)
    )
    return state._replace(ref_path=shifted.at[-1].set(last_row))


def _edge_warm_start(ref: jax.Array, m: RollingMap, p: EngineParams):
    """``PlanWapionts`` (:259-281): snap the first waypoint to the nearest
    edge point when it sits inside the safety margin.
    Returns (ref', is_safety)."""
    p1 = ref[0, 0:3]
    d_obs = map_nearest_distance(m, p1)
    unsafe = d_obs <= p.safety_distance
    d_edge, edge_pts = map_query(m, p1[None, :], k=1, edge=True)
    edge_found = jnp.isfinite(d_edge[0, 0])
    new_p1 = jnp.where(unsafe & edge_found, edge_pts[0, 0], p1)
    ref = ref.at[0, 0:3].set(new_p1)
    is_safety = jnp.where(unsafe, edge_found, True)
    return ref, is_safety


def _associate_obstacles(
    ref: jax.Array, m: RollingMap, p: EngineParams, k: int, h: "EngineHyper"
):
    """``ProcessWaypoints`` (:204-235): per-stage k-NN + unsafe check.
    knn already pads missing neighbors with the far sentinel (:225).

    With ``h.assoc_radius > 0`` the k-NN goes through the bbox cull
    (sub-linear in map size, exact within the radius; denser-than-m_max
    tubes are rescued by an exact brute-force fallback inside knn_culled):
    a not-found slot then means "nearest > assoc_radius >> safety_distance",
    so the reference's "distances empty -> replan" clause maps to the map
    actually being empty.  Returns ``(pts, need_replan, overflow)`` —
    overflow is diagnostic only (the rescue keeps results exact)."""
    if h.assoc_radius > 0:
        dists, pts, overflow = map_query_culled(
            m, ref[:, 0:3], k=k, r_cut=h.assoc_radius, m_max=h.assoc_m_max,
            edge=False,
        )
        nearest = dists[:, 0]
        stage_bad = jnp.isfinite(nearest) & (nearest <= p.safety_distance)
        need_replan = jnp.any(stage_bad) | ~map_nonempty(m)
        return pts, need_replan, overflow
    dists, pts = map_query(m, ref[:, 0:3], k=k, edge=False)
    nearest = dists[:, 0]
    # "distances empty or nearest <= safety" -> replan (:228-231)
    need_replan = jnp.any(~jnp.isfinite(nearest) | (nearest <= p.safety_distance))
    return pts, need_replan, jnp.asarray(False)


def _build_target(ref: jax.Array, pos: jax.Array, p: EngineParams):
    """``GetRefStates`` terminal-target push (:250-254), mirrored exactly:
    x += max(0, speed*T - max(0, last_x - pos_x)); y = 0."""
    target = ref[-1]
    dx = jnp.maximum(0.0, p.speed * p.mpc_T - jnp.maximum(0.0, target[0] - pos[0]))
    return target.at[0].add(dx).at[1].set(0.0)


def _slow_down_cmd(quad_state: jax.Array, p: EngineParams):
    """``PubSlowDownCmd`` (:379-397): PD deceleration + gravity, clipped."""
    v = quad_state[4:7]
    a = quad_state[7:10]
    acc = -v * p.slow_down_kp - a * p.slow_down_kd + jnp.asarray(
        [0.0, 0.0, 9.8], dtype=quad_state.dtype
    )
    lo = p.sp.u_lower
    hi = p.sp.u_upper
    # reference clips xy to +-a_max_xy and z to +-a_max_z (:383-388)
    ax = jnp.clip(acc[0], lo[0], hi[0])
    ay = jnp.clip(acc[1], lo[1], hi[1])
    az = jnp.clip(acc[2], -hi[2], hi[2])
    return jnp.stack([ax, ay, az, jnp.zeros_like(ax)])


def receding_step(
    state: EngineState,
    quad_state: jax.Array,
    rolling_map: RollingMap,
    p: EngineParams,
    h: EngineHyper,
) -> tuple[EngineState, StepOutput]:
    """One control tick (TASK case of ``Step``, :322-355) for one scenario.
    vmap over leading axes of (state, quad_state, rolling_map) to batch."""
    pos = quad_state[0:3]
    state = _shift_horizon(state, pos, p, h)

    n, k = h.n, h.k
    dtype = quad_state.dtype

    def outer(carry, it):
        ref, us_warm, active, is_safety, need_replan, pred, obstacles, cost = carry

        ref_i, safety_i = _edge_warm_start(ref, rolling_map, p)
        obstacles_i, replan_i, _ovf_i = _associate_obstacles(
            ref_i, rolling_map, p, k, h
        )

        # early exit (:333-335): stop when safe & associated & not 1st iter
        stop_now = (~replan_i) & (it > 0) & safety_i
        run = active & ~stop_now

        target = _build_target(ref_i, pos, p)
        problem = MPCProblem(x0=quad_state, ref=ref_i, obstacles=obstacles_i, target=target)
        if h.solver_fast == h.solver:
            # identical budgets: one solver instance (halves compile size)
            res = solve(problem, us_warm, p.sp, h.solver)
        else:
            res = jax.lax.cond(
                it == 0,
                lambda: solve(problem, us_warm, p.sp, h.solver_fast),
                lambda: solve(problem, us_warm, p.sp, h.solver),
            )

        sel = lambda a, b: jnp.where(run, a, b)
        ref_new = sel(res.xs[:n], ref)  # predicted nodes 0..N-1 (:338-343)
        us_new = sel(res.us, us_warm)
        carry = (
            ref_new,
            us_new,
            active & ~stop_now,
            jnp.where(active, safety_i, is_safety),
            jnp.where(active, replan_i, need_replan),
            sel(res.xs, pred),
            sel(obstacles_i, obstacles),
            sel(res.cost, cost),
        )
        return carry, run

    init = (
        state.ref_path,
        state.us_warm,
        jnp.asarray(True),
        jnp.asarray(True),
        jnp.asarray(True),
        jnp.zeros((n + 1, STATE_DIM), dtype=dtype),
        jnp.full((n, k, 3), 1e4, dtype=dtype),
        jnp.asarray(jnp.inf, dtype=dtype),
    )
    (ref, us_warm, _, is_safety, need_replan, pred, obstacles, cost), ran = jax.lax.scan(
        outer, init, jnp.arange(h.max_outer_iters)
    )

    # TTC slow-down trigger (round-2 extension, default off): estimated
    # time-to-collision toward the current 1-NN obstacle below threshold
    # forces the PD fallback even when a "safe" plan exists — covering the
    # tangential-pass geometry the |v.dir|-gated barrier is blind to.
    # Static gate: disabled builds emit no map query at all (ADVICE r2).
    if h.use_ttc:
        d1, pt1 = map_query(rolling_map, pos[None, :], k=1, edge=False)
        vec = pt1[0, 0] - pos
        dist1 = jnp.maximum(d1[0, 0], 1e-6)
        closing = jnp.sum(quad_state[4:7] * (vec / dist1))  # exact 3-dot
        ttc = (dist1 - p.sp.cost.drone_radius) / jnp.maximum(closing, 1e-3)
        ttc_trigger = (
            (p.ttc_threshold > 0.0)
            & (closing > 0.0)
            & jnp.isfinite(dist1)
            & (ttc < p.ttc_threshold)
        )
        is_safety = is_safety & ~ttc_trigger

    u_mpc = us_warm[0]
    u_slow = _slow_down_cmd(quad_state, p)
    u_cmd = jnp.where(is_safety, u_mpc, u_slow)

    new_state = EngineState(ref_path=ref, us_warm=us_warm, goal=state.goal)
    out = StepOutput(
        u_cmd=u_cmd,
        is_safety=is_safety,
        need_replan=need_replan,
        predicted=pred,
        obstacles=obstacles,
        cost=cost,
        outer_iters=jnp.sum(ran.astype(jnp.int32)),
    )
    return new_state, out
