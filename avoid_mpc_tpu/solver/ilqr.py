"""Box-constrained iLQR/SQP — the TPU-native replacement for CasADi+IPOPT.

The reference solves a multiple-shooting NLP (decision variables X, U with
dynamics equality constraints, ``tools/mpc_obstacle_casadi.py:150-242``) with
warm-started IPOPT capped at 10 iterations (``HighLvlMpc.cpp:17-23``).  Here
the dynamics constraints are eliminated exactly by rollout (single shooting),
so the optimum coincides with the reference NLP's optimum, and the solve
becomes differential dynamic programming with per-stage box QPs for the
control bounds (Tassa 2014).

TPU-first structure — each solver iteration is four phases, chosen so the
sequential parts are minimal and everything wide is batched:

1. **Linearize** all N stages *in parallel* (vmap of jacfwd/hessian over the
   horizon) — the analogue of the reference's ``F.map(N, "openmp")`` fan-out.
2. **Backward Riccati sweep** — `lax.scan` over N (sequential, tiny 10x10 /
   4x4 math, batched over thousands of scenarios by the outer vmap).
3. **Forward line search** — ALL step-size candidates rolled out in parallel
   (vmap over alphas of a scan over stages), best improving one selected.
4. **Trust-region adaptation** — Levenberg-style regularization update, all
   data-dependent choices via `where` (no Python control flow).

Everything is dtype-polymorphic: f64 for CPU parity oracles, f32 on TPU.
Iteration count is static (the IPOPT ``max_iter`` analogue); convergence is
reported, not branched on, so the jaxpr has static shape.

The warm-start carry (the ``mNlpW0`` analogue, ``HighLvlMpc.cpp:129``) is the
returned ``us`` fed back as ``us_init`` of the next call.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from avoid_mpc_tpu.config import CONTROL_DIM, STATE_DIM, MPCConfig
from avoid_mpc_tpu.models.costs import (
    CostParams,
    collision_cost,
    collision_quadratics,
    node_radius,
    trajectory_cost,
)
from avoid_mpc_tpu.models.quadrotor import DynamicsParams, rk4_step
from avoid_mpc_tpu.solver.linalg import solve4_mat
from avoid_mpc_tpu.solver.boxqp import boxqp


class MPCProblem(NamedTuple):
    """Per-scenario problem data — the analogue of the reference P-vector
    (init state + ref path + obstacle points + target,
    ``tools/mpc_obstacle_casadi.py:76-86``)."""

    x0: jax.Array  # (10,)
    ref: jax.Array  # (N, 10) reference path; slots 0..N-2 used by gap cost
    obstacles: jax.Array  # (N, K, 3); slots 0..N-2 used by collision cost
    target: jax.Array  # (10,)


class SolverParams(NamedTuple):
    """Runtime (non-shape) solver parameters."""

    dt: jax.Array  # scalar
    dyn: DynamicsParams
    cost: CostParams
    u_lower: jax.Array  # (4,)
    u_upper: jax.Array  # (4,)

    @staticmethod
    def from_config(cfg: MPCConfig, dtype=jnp.float32) -> "SolverParams":
        return SolverParams(
            dt=jnp.asarray(cfg.mpc_dt, dtype=dtype),
            dyn=DynamicsParams.from_config(cfg, dtype=dtype),
            cost=CostParams.from_config(cfg, dtype=dtype),
            u_lower=jnp.asarray(cfg.u_lower, dtype=dtype),
            u_upper=jnp.asarray(cfg.u_upper, dtype=dtype),
        )


class SolverHyper(NamedTuple):
    """Static (trace-time) solver knobs."""

    iters: int = 10  # IPOPT max_iter analogue
    n_alphas: int = 8  # parallel line-search candidates 2^0 .. 2^-(n-1)
    boxqp_iters: int = 4
    reg_init: float = 1e-6
    reg_min: float = 1e-9
    reg_max: float = 1e6
    grad_tol: float = 1e-4  # reported-convergence threshold (IPOPT tol analogue)
    # Exit the fused kernel's outer loop at grad_tol (the reference's IPOPT
    # tol/max_iter semantics).  Disable for solves embedded in large scanned
    # programs (the closed-loop world step): the while_loop's dynamic trip
    # count explodes XLA compile time there, and the engine's small budgets
    # gain little from exiting early.  Solutions are identical either way.
    tol_exit: bool = True
    # Use the fused Pallas Riccati sweep when vmapped on TPU f32 (the XLA
    # scan path otherwise; results agree to fp tolerance).
    use_pallas: bool = True
    # Fuse the ENTIRE solve (rollout + all iterations of linearize/backward/
    # line-search/trust-region + final certificate) into ONE Pallas program
    # per batch tile (solver/pallas_sqp.py) — everything VMEM-resident, HBM
    # traffic = problem in / trajectory out.  Falls back to the per-phase
    # kernels when off (A/B and debugging).
    fuse: bool = True

    @staticmethod
    def from_config(cfg: MPCConfig, fast: bool = False) -> "SolverHyper":
        return SolverHyper(
            iters=cfg.sqp_iters_fast if fast else cfg.sqp_iters,
            n_alphas=cfg.line_search_alphas,
            boxqp_iters=cfg.boxqp_iters,
            reg_init=cfg.reg_init,
            reg_min=cfg.reg_min,
            reg_max=cfg.reg_max,
        )


class SolveResult(NamedTuple):
    us: jax.Array  # (N, 4) optimal controls; us[0] is the command to fly
    xs: jax.Array  # (N+1, 10) predicted optimal trajectory
    cost: jax.Array  # scalar final objective
    grad_norm: jax.Array  # sup-norm of the projected gradient at the solution
    converged: jax.Array  # bool: grad_norm < grad_tol
    reg: jax.Array  # final regularization (diagnostic)


def _affine_dynamics(sp: SolverParams, dtype):
    """Exact affine form of the discrete transition for the drag-free model:
    x_{k+1} = Ad x_k + Bd u_k + cvec.

    The no-drag ODE (tools/mpc_obstacle_casadi.py:106-122) is linear
    time-invariant, and RK4 of an LTI system is itself a constant affine
    map — so Ad/Bd/cvec are computed ONCE per solve (three jacfwd/eval calls
    at the origin), eliminating every per-stage, per-iteration dynamics AD
    pass and turning all rollouts into 10x10 mat-vecs.
    """
    zx = jnp.zeros(STATE_DIM, dtype=dtype)
    zu = jnp.zeros(CONTROL_DIM, dtype=dtype)

    def f(x, u):
        return rk4_step(x, u, sp.dt, sp.dyn)

    Ad = jax.jacfwd(f, argnums=0)(zx, zu)
    Bd = jax.jacfwd(f, argnums=1)(zx, zu)
    cvec = f(zx, zu)
    return Ad, Bd, cvec


# indices of the collision-relevant state components (position, velocity)
_PV_IDX = jnp.asarray([0, 1, 2, 4, 5, 6])


def _gap_quadratic(ref, cp: CostParams):
    """Analytic gap-cost Hessian M = 2 R(yaw)^T diag(q_path) R(yaw): diagonal
    except the two yaw-rotated 2x2 blocks at (0,1) and (4,5)
    (reference rot construction, tools/mpc_obstacle_casadi.py:174-185)."""
    q = cp.q_path
    c = jnp.cos(ref[..., 3])
    s = jnp.sin(ref[..., 3])

    def block(qa, qb):
        m00 = qa * c * c + qb * s * s
        m11 = qa * s * s + qb * c * c
        m01 = (qa - qb) * c * s
        return m00, m01, m11

    p00, p01, p11 = block(q[0], q[1])
    v00, v01, v11 = block(q[4], q[5])
    M = jnp.zeros(ref.shape[:-1] + (STATE_DIM, STATE_DIM), dtype=ref.dtype)
    diag = jnp.broadcast_to(q, ref.shape[:-1] + (STATE_DIM,))
    M = M.at[..., jnp.arange(STATE_DIM), jnp.arange(STATE_DIM)].set(diag)
    M = M.at[..., 0, 0].set(p00).at[..., 1, 1].set(p11)
    M = M.at[..., 0, 1].set(p01).at[..., 1, 0].set(p01)
    M = M.at[..., 4, 4].set(v00).at[..., 5, 5].set(v11)
    M = M.at[..., 4, 5].set(v01).at[..., 5, 4].set(v01)
    return 2.0 * M


def _collision_pv(pv, obs, cp: CostParams, radius=None):
    """Collision cost as a function of the 6-dim (p, v) sub-state only —
    the semantic source the analytic ``collision_quadratics`` is tested
    against (tests/test_costs.py)."""
    x = jnp.zeros(STATE_DIM, dtype=pv.dtype)
    x = x.at[0:3].set(pv[0:3]).at[4:7].set(pv[3:6])
    return collision_cost(x, obs, cp, radius=radius)


def _linearize(problem: MPCProblem, xs, us, sp: SolverParams):
    """Cost linearization along the horizon (dynamics are precomputed
    affine).  Every derivative is analytic — gap/goal quadratics and the
    closed-form collision grad/Hessian (``collision_quadratics``); no AD in
    the solve loop.  One vectorized pass over stages — the analogue of the
    reference's ``F.map(N, "openmp")`` fan-out.

    Returns per-node state-cost grad/Hessian for nodes 1..N and per-stage
    control-cost grad/Hessian.
    """
    n = us.shape[0]
    cp = sp.cost
    dtype = us.dtype

    # --- interior nodes 1..N-1 (slots 0..N-2) ---
    interior_x = xs[1:n]  # (N-1, 10)
    ref = problem.ref[: n - 1]
    obs = problem.obstacles[: n - 1]

    M = _gap_quadratic(ref, cp)  # (N-1, 10, 10) analytic
    gap_cx = jnp.einsum("nij,nj->ni", M, interior_x - ref)

    pv = interior_x[:, _PV_IDX]
    col_g, col_h = collision_quadratics(pv, obs, node_radius(ref, cp), cp)

    cx_int = gap_cx.at[:, _PV_IDX].add(col_g)
    cxx_int = M.at[:, _PV_IDX[:, None], _PV_IDX[None, :]].add(col_h)

    # --- terminal node N: goal quadratic (analytic) ---
    cx_term = 2.0 * cp.q_goal * (xs[n] - problem.target)
    cxx_term = jnp.diag(2.0 * cp.q_goal).astype(dtype)

    cx = jnp.concatenate([cx_int, cx_term[None]], axis=0)  # (N, 10)
    cxx = jnp.concatenate([cxx_int, cxx_term[None]], axis=0)  # (N, 10, 10)

    # Control cost is diagonal quadratic — analytic derivatives.
    lu = 2.0 * cp.q_u * (us - cp.u_hover)  # (N, 4)
    luu = jnp.diag(2.0 * cp.q_u).astype(dtype)  # constant (4, 4)
    return cx, cxx, lu, luu


def _backward(us, Ad, Bd, cx, cxx, lu, luu, reg, sp: SolverParams, hp: SolverHyper):
    """Backward Riccati sweep with per-stage box QPs.

    Dynamics Jacobians are the constant LTI Ad/Bd (or per-stage (N,...)
    arrays in the generic drag path — both broadcast through the scan).

    Carry: (V_x, V_xx) — value expansion at node k+1 *excluding* that node's
    state cost (it is added as the first step of each stage so the terminal
    node's goal term enters naturally).
    Regularization: Levenberg dual scheme (Tassa 2014) — reg through B damps
    the value curvature, and a direct Quu term keeps the QP PD and bends
    failed steps toward gradient descent when the collision Hessian goes
    indefinite.
    """
    n, nu = us.shape
    nx = cx.shape[-1]
    dtype = us.dtype
    eye = jnp.eye(nx, dtype=dtype)
    eye_u = jnp.eye(nu, dtype=dtype)
    per_stage_AB = Ad.ndim == 3

    def stage(carry, inp):
        Vx, Vxx = carry
        if per_stage_AB:
            A_k, B_k, cx_k1, cxx_k1, lu_k, u_k = inp
        else:
            cx_k1, cxx_k1, lu_k, u_k = inp
            A_k, B_k = Ad, Bd
        Wx = Vx + cx_k1
        Wxx = Vxx + cxx_k1
        Wxx_reg = Wxx + reg * eye

        Qx = A_k.T @ Wx
        Qu = lu_k + B_k.T @ Wx
        Qxx = A_k.T @ Wxx @ A_k
        BtW = B_k.T @ Wxx_reg
        Qux = BtW @ A_k
        Quu = luu + BtW @ B_k + reg * eye_u
        Quu = 0.5 * (Quu + Quu.T)

        # Box QP over the control delta: bounds relative to current u_k
        # (reference bounds HighLvlMpc.cpp:28-33).
        k_ff, free = boxqp(
            Quu, Qu, sp.u_lower - u_k, sp.u_upper - u_k,
            jnp.zeros_like(u_k), iters=hp.boxqp_iters,
        )
        mf = free.astype(dtype)
        Quu_f = Quu * (mf[:, None] * mf[None, :]) + jnp.diag(1.0 - mf)
        K = -solve4_mat(Quu_f, Qux * mf[:, None])  # clamped rows -> 0

        Vx_new = Qx + K.T @ (Quu @ k_ff + Qu) + Qux.T @ k_ff
        Vxx_new = Qxx + K.T @ Quu @ K + K.T @ Qux + Qux.T @ K
        Vxx_new = 0.5 * (Vxx_new + Vxx_new.T)

        # Expected cost decrease pieces for the line search acceptance.
        dV1 = k_ff @ Qu
        dV2 = 0.5 * k_ff @ Quu @ k_ff
        # Projected gradient: stationarity measure honoring active bounds.
        pg = jnp.where(free, Qu, 0.0)
        return (Vx_new, Vxx_new), (k_ff, K, dV1, dV2, jnp.max(jnp.abs(pg)))

    init = (jnp.zeros(nx, dtype=dtype), jnp.zeros((nx, nx), dtype=dtype))
    inputs = (Ad, Bd, cx, cxx, lu, us) if per_stage_AB else (cx, cxx, lu, us)
    rev = jax.tree.map(lambda a: jnp.flip(a, axis=0), inputs)
    (_, _), outs = jax.lax.scan(stage, init, rev)
    k_ff, K, dV1, dV2, pg = jax.tree.map(lambda a: jnp.flip(a, axis=0), outs)
    return k_ff, K, jnp.sum(dV1), jnp.sum(dV2), jnp.max(pg)


def _backward_dispatch(us, Ad, Bd, cx, cxx, lu, luu, reg, sp: SolverParams, hp: SolverHyper):
    """Route the backward sweep: the fused Pallas kernel when this solve is
    vmapped on a TPU backend in f32 with LTI dynamics; the XLA scan
    otherwise.  custom_vmap makes the batching transparent — the per-scenario
    ``solve`` stays the single source of truth for semantics."""
    use_pallas = (
        hp.use_pallas
        and not sp.dyn.use_drag
        and us.dtype == jnp.float32
        and jax.devices()[0].platform == "tpu"
    )
    if not use_pallas:
        return _backward(us, Ad, Bd, cx, cxx, lu, luu, reg, sp, hp)

    from avoid_mpc_tpu.solver.pallas_backward import riccati_backward_batched

    # All traced values must be explicit arguments: custom_vmap stages its
    # function to a jaxpr, and closed-over tracers become constants its
    # lowering cannot handle.
    @jax.custom_batching.custom_vmap
    def bw(us, cx, cxx, lu, reg, Ad_, Bd_, luu_, lo, hi):
        # Unbatched on TPU: still run the fused kernel, with a singleton
        # batch axis.  The XLA scan at B=1 serializes ~600 tiny stage ops
        # and measured ~200 ms per closed-loop tick (single-robot probe);
        # the kernel path at B=1 is ~2 ms.  The per-scenario `_backward`
        # remains the semantic oracle on CPU (tests force platform=cpu).
        out = riccati_backward_batched(
            Ad_, Bd_, luu_, lo, hi,
            cx[None], cxx[None], lu[None], us[None], reg[None],
            bq_iters=hp.boxqp_iters,
        )
        return jax.tree.map(lambda a: a[0], out)

    @bw.def_vmap
    def _bw_vmap(axis_size, in_batched, us, cx, cxx, lu, reg, Ad_, Bd_, luu_, lo, hi):
        # per-scenario args the vmap fixpoint left unbatched (e.g. the reg
        # carry on its first scan trace) get broadcast to the batch; the
        # shared constants (Ad/Bd/luu/bounds) stay unbatched.
        def bcast(x, batched):
            return x if batched else jnp.broadcast_to(x[None], (axis_size,) + x.shape)

        us, cx, cxx, lu, reg = (
            bcast(a, f)
            for a, f in zip((us, cx, cxx, lu, reg), in_batched[:5])
        )
        # shared constants identical across the batch; de-batch if the vmap
        # fixpoint batched one anyway
        Ad_, Bd_, luu_, lo, hi = (
            (a[0] if f else a)
            for a, f in zip((Ad_, Bd_, luu_, lo, hi), in_batched[5:])
        )
        out = riccati_backward_batched(
            Ad_, Bd_, luu_, lo, hi, cx, cxx, lu, us, reg,
            bq_iters=hp.boxqp_iters,
        )
        return out, tuple(True for _ in out)

    return bw(us, cx, cxx, lu, reg, Ad, Bd, luu, sp.u_lower, sp.u_upper)


def _closed_loop_rollout(x0, us, xs_ref, k_ff, K, alpha, sp: SolverParams, dyn_step):
    """Forward pass with feedback: u = clip(u_k + a*k + K(x - x_k)).
    ``dyn_step(x, u)`` is the affine LTI transition (or rk4 in the generic
    drag path)."""

    def step(x, inp):
        u_k, x_k, k_k, K_k = inp
        u = u_k + alpha * k_k + K_k @ (x - x_k)
        u = jnp.clip(u, sp.u_lower, sp.u_upper)
        x_next = dyn_step(x, u)
        return x_next, (x_next, u)

    _, (xs_new, us_new) = jax.lax.scan(step, x0, (us, xs_ref[:-1], k_ff, K))
    xs_new = jnp.concatenate([x0[None], xs_new], axis=0)
    return xs_new, us_new


def _total_cost(problem: MPCProblem, xs, us, cp: CostParams):
    return trajectory_cost(xs, us, problem.ref, problem.obstacles, problem.target, cp)


def solve(
    problem: MPCProblem,
    us_init: jax.Array,
    sp: SolverParams,
    hp: SolverHyper = SolverHyper(),
) -> SolveResult:
    """Solve one MPC instance. vmap over a leading scenario axis to batch
    (see :func:`solve_batched`)."""
    # TPU f32 matmuls default to bf16 MXU passes; positions are O(10 m) and
    # the solver needs mm/1e-4-level stationarity, so every dot in the solve
    # must run at full f32 (the 10-dim matmuls are cheap either way).
    with jax.default_matmul_precision("highest"):
        return _solve_impl(problem, us_init, sp, hp)


def _solve_impl(
    problem: MPCProblem,
    us_init: jax.Array,
    sp: SolverParams,
    hp: SolverHyper,
) -> SolveResult:
    dtype = us_init.dtype
    us0 = jnp.clip(us_init, sp.u_lower, sp.u_upper)

    # Fully-fused path: the whole solve in one Pallas program (VMEM-resident
    # across iterations; see pallas_sqp.py).  Same routing conditions as the
    # per-phase kernels.
    if (
        hp.use_pallas
        and hp.fuse
        and not sp.dyn.use_drag
        and dtype == jnp.float32
        and jax.devices()[0].platform == "tpu"
    ):
        return _solve_fused(problem, us0, sp, hp)

    if sp.dyn.use_drag:
        # generic path: nonlinear dynamics, per-stage Jacobians each iteration
        dyn_step = lambda x, u: rk4_step(x, u, sp.dt, sp.dyn)

        def stage_jacobians(xs, us):
            A = jax.vmap(jax.jacfwd(dyn_step, argnums=0))(xs[:-1], us)
            B = jax.vmap(jax.jacfwd(dyn_step, argnums=1))(xs[:-1], us)
            return A, B

    else:
        # LTI fast path: one affine transition shared by every stage,
        # iteration, and line-search candidate
        Ad, Bd, cvec = _affine_dynamics(sp, dtype)
        dyn_step = lambda x, u: Ad @ x + Bd @ u + cvec

        def stage_jacobians(xs, us):
            return Ad, Bd

    def full_rollout(x0, us):
        def step(x, u):
            x_next = dyn_step(x, u)
            return x_next, x_next

        _, xs = jax.lax.scan(step, x0, us)
        return jnp.concatenate([x0[None], xs], axis=0)

    xs0 = full_rollout(problem.x0, us0)
    cost0 = _total_cost(problem, xs0, us0, sp.cost)
    alphas = jnp.asarray(2.0 ** -jnp.arange(hp.n_alphas), dtype=dtype)
    big = jnp.asarray(jnp.finfo(dtype).max / 8, dtype=dtype)

    def line_search_xla_for(prob, us, xs, k_ff, K, dV1, dV2, cost):
        def try_alpha(alpha):
            xs_a, us_a = _closed_loop_rollout(
                prob.x0, us, xs, k_ff, K, alpha, sp, dyn_step
            )
            return _total_cost(prob, xs_a, us_a, sp.cost), xs_a, us_a

        costs_a, xs_a, us_a = jax.vmap(try_alpha)(alphas)
        costs_a = jnp.where(jnp.isfinite(costs_a), costs_a, big)
        # Accept candidates that achieve a fraction of the predicted decrease
        # (classic DDP acceptance; expected[alpha] = a*dV1 + a^2*dV2 < 0).
        expected = alphas * dV1 + alphas**2 * dV2
        improve = cost - costs_a
        ok = improve > 1e-4 * jnp.maximum(-expected, 0.0)
        any_ok = jnp.any(ok)
        best = jnp.argmin(jnp.where(ok, costs_a, big))
        us_new = jnp.where(any_ok, us_a[best], us)
        xs_new = jnp.where(any_ok, xs_a[best], xs)
        cost_new = jnp.where(any_ok, costs_a[best], cost)
        return us_new, xs_new, cost_new, any_ok

    use_pallas_fwd = (
        hp.use_pallas
        and not sp.dyn.use_drag
        and dtype == jnp.float32
        and jax.devices()[0].platform == "tpu"
    )

    def line_search(us, xs, k_ff, K, dV1, dV2, cost):
        if not use_pallas_fwd:
            return line_search_xla_for(problem, us, xs, k_ff, K, dV1, dV2, cost)

        from avoid_mpc_tpu.solver.pallas_forward import line_search_batched

        cp = sp.cost

        # NOTE: custom_vmap requires every value the staged function closes
        # over to be UNBATCHED under vmap — so the fallback must take the
        # (batched) problem data through its arguments, never from closure.
        @jax.custom_batching.custom_vmap
        def ls(us, xs, k_ff, K, dV1, dV2, cost, x0, ref, obstacles, target,
               Ad_, Bd_, cvec_, lo, hi, qg, qp, qu, lam, rad, lamo, marg):
            # Unbatched on TPU: fused kernel with a singleton batch axis
            # (see _backward_dispatch — the B=1 XLA scan path costs ~100x).
            out = line_search_batched(
                Ad_, Bd_, cvec_, lo, hi, qg, qp, qu, lam, rad,
                x0[None], us[None], xs[None], k_ff[None], K[None],
                ref[None], obstacles[None], target[None],
                dV1[None], dV2[None], cost[None],
                n_alphas=hp.n_alphas, lam_omni=lamo, margin_v=marg,
            )
            return jax.tree.map(lambda a: a[0], out)

        @ls.def_vmap
        def _ls_vmap(axis_size, in_batched, us, xs, k_ff, K, dV1, dV2, cost,
                     x0, ref, obstacles, target, Ad_, Bd_, cvec_, lo, hi,
                     qg, qp, qu, lam, rad, lamo, marg):
            def bcast(x, batched):
                return x if batched else jnp.broadcast_to(x[None], (axis_size,) + x.shape)

            def unbatch(x, batched):
                # shared constants are identical across the batch; if the
                # vmap fixpoint batched one anyway, take slice 0
                return x[0] if batched else x

            per = (us, xs, k_ff, K, dV1, dV2, cost, x0, ref, obstacles, target)
            us_, xs_, kff_, K_, dV1_, dV2_, cost_, x0_, ref_, obs_, tgt_ = (
                bcast(a, f) for a, f in zip(per, in_batched[: len(per)])
            )
            consts = (Ad_, Bd_, cvec_, lo, hi, qg, qp, qu, lam, rad, lamo, marg)
            Ad_, Bd_, cvec_, lo, hi, qg, qp, qu, lam, rad, lamo, marg = (
                unbatch(a, f) for a, f in zip(consts, in_batched[len(per):])
            )
            out = line_search_batched(
                Ad_, Bd_, cvec_, lo, hi, qg, qp, qu, lam, rad,
                x0_, us_, xs_, kff_, K_, ref_, obs_, tgt_, dV1_, dV2_, cost_,
                n_alphas=hp.n_alphas, lam_omni=lamo, margin_v=marg,
            )
            return out, tuple(True for _ in out)

        return ls(
            us, xs, k_ff, K, dV1, dV2, cost, problem.x0, problem.ref,
            problem.obstacles, problem.target, Ad, Bd, cvec,
            sp.u_lower, sp.u_upper, cp.q_goal, cp.q_path, cp.q_u,
            cp.collide_lambda, cp.drone_radius, cp.lam_omni, cp.margin_v,
        )

    # iters+1 scan: the extra masked pass linearizes at the FINAL point and
    # reports its projected gradient without applying the update, so
    # ``grad_norm`` certifies the returned iterate (round-1 VERDICT).  Doing
    # it inside the scan keeps one uniform kernel schedule — a standalone
    # post-loop backward call compiles with entry layouts/transposes that
    # measured ~9.4 ms on-chip vs ~1 ms for the identical in-loop kernel.
    def iteration(carry, i):
        us, xs, cost, reg, grad_norm = carry
        A, B = stage_jacobians(xs, us)
        cx, cxx, lu, luu = _linearize(problem, xs, us, sp)
        k_ff, K, dV1, dV2, pg = _backward_dispatch(
            us, A, B, cx, cxx, lu, luu, reg, sp, hp
        )
        # ``i`` is the scan counter — unbatched under vmap, so this stays a
        # real branch (the final pass skips the line-search kernel entirely)
        def update(args):
            us, xs, cost, reg, k_ff, K, dV1, dV2 = args
            us_new, xs_new, cost_new, any_ok = line_search(
                us, xs, k_ff, K, dV1, dV2, cost
            )
            reg_new = jnp.where(
                any_ok,
                jnp.maximum(reg * 0.2, hp.reg_min),
                jnp.minimum(jnp.maximum(reg, 1e-4) * 8.0, hp.reg_max),
            )
            return us_new, xs_new, cost_new, reg_new

        def hold(args):
            us, xs, cost, reg, *_ = args
            return us, xs, cost, reg

        us, xs, cost, reg = jax.lax.cond(
            i < hp.iters, update, hold, (us, xs, cost, reg, k_ff, K, dV1, dV2)
        )
        return (us, xs, cost, reg, pg), None

    reg0 = jnp.asarray(hp.reg_init, dtype=dtype)
    carry = (us0, xs0, cost0, reg0, jnp.asarray(jnp.inf, dtype=dtype))
    (us, xs, cost, reg, grad_norm), _ = jax.lax.scan(
        iteration, carry, jnp.arange(hp.iters + 1)
    )
    return SolveResult(
        us=us,
        xs=xs,
        cost=cost,
        grad_norm=grad_norm,
        converged=grad_norm < hp.grad_tol,
        reg=reg,
    )


def _solve_fused(
    problem: MPCProblem, us0: jax.Array, sp: SolverParams, hp: SolverHyper
) -> SolveResult:
    """Dispatch to the fully-fused SQP kernel (pallas_sqp.py) via custom_vmap:
    the per-scenario call runs the kernel with a singleton batch; a vmapped
    call maps the whole batch onto the kernel's lane axis.  Semantics are
    tested against the per-scenario XLA ``solve`` (tests/test_pallas_sqp.py)."""
    from avoid_mpc_tpu.solver.pallas_sqp import sqp_solve_batched

    Ad, Bd, cvec = _affine_dynamics(sp, jnp.float32)
    cp = sp.cost
    kw = dict(
        iters=hp.iters, n_alphas=hp.n_alphas, bq_iters=hp.boxqp_iters,
        reg_init=hp.reg_init, reg_min=hp.reg_min, reg_max=hp.reg_max,
        grad_tol=hp.grad_tol, tol_exit=hp.tol_exit,
    )

    # custom_vmap: every traced value must be an explicit argument (closed-
    # over tracers become constants its lowering cannot handle).
    @jax.custom_batching.custom_vmap
    def fs(x0, us0, ref, obstacles, target, Ad_, Bd_, cvec_, lo, hi,
           qg, qp, qu, uh, lam, rad, lamo, marg):
        out = sqp_solve_batched(
            Ad_, Bd_, cvec_, lo, hi, qg, qp, qu, uh, lam, rad, lamo, marg,
            x0[None], us0[None], ref[None], obstacles[None], target[None],
            **kw,
        )
        return jax.tree.map(lambda a: a[0], out)

    @fs.def_vmap
    def _fs_vmap(axis_size, in_batched, x0, us0, ref, obstacles, target,
                 Ad_, Bd_, cvec_, lo, hi, qg, qp, qu, uh, lam, rad, lamo, marg):
        def bcast(x, batched):
            return x if batched else jnp.broadcast_to(x[None], (axis_size,) + x.shape)

        per = (x0, us0, ref, obstacles, target)
        x0_, us0_, ref_, obs_, tgt_ = (
            bcast(a, f) for a, f in zip(per, in_batched[:5])
        )
        consts = (Ad_, Bd_, cvec_, lo, hi, qg, qp, qu, uh, lam, rad, lamo, marg)
        Ad_, Bd_, cvec_, lo, hi, qg, qp, qu, uh, lam, rad, lamo, marg = (
            (a[0] if f else a) for a, f in zip(consts, in_batched[5:])
        )
        out = sqp_solve_batched(
            Ad_, Bd_, cvec_, lo, hi, qg, qp, qu, uh, lam, rad, lamo, marg,
            x0_, us0_, ref_, obs_, tgt_, **kw,
        )
        return out, tuple(True for _ in out)

    us, xs, cost, pg, reg = fs(
        problem.x0, us0, problem.ref, problem.obstacles, problem.target,
        Ad, Bd, cvec, sp.u_lower, sp.u_upper, cp.q_goal, cp.q_path, cp.q_u,
        cp.u_hover, cp.collide_lambda, cp.drone_radius, cp.lam_omni,
        cp.margin_v,
    )
    return SolveResult(
        us=us, xs=xs, cost=cost, grad_norm=pg,
        converged=pg < hp.grad_tol, reg=reg,
    )


def solve_batched(
    problems: MPCProblem,
    us_init: jax.Array,
    sp: SolverParams,
    hp: SolverHyper = SolverHyper(),
) -> SolveResult:
    """Batch of independent MPC solves: every leaf of ``problems`` and
    ``us_init`` carries a leading scenario axis. This is the unit the mesh
    shards over (scenario data parallelism, SURVEY.md §2.5)."""
    return jax.vmap(lambda p, u: solve(p, u, sp, hp))(problems, us_init)


def hover_warm_start(n: int, dtype=jnp.float32) -> jax.Array:
    """Initial control guess: hover thrust (the reference seeds zeros but is
    always warm-started in practice; hover converges faster cold)."""
    u = jnp.zeros((n, CONTROL_DIM), dtype=dtype)
    return u.at[:, 2].set(9.81)


assert STATE_DIM == 10 and CONTROL_DIM == 4
