"""The MPC objective — faithful to the reference NLP, fully batched.

Reference: the symbolic objective assembled in
``tools/mpc_obstacle_casadi.py:158-220``.  Four terms:

1. **control** (every stage k=0..N-1):  (u_k - [0,0,g,0])^T Q_u (u_k - [0,0,g,0])   (:209-210)
2. **path gap** (interior nodes j=1..N-1): rotate the full 10-dim state delta's
   (x,y) position and velocity blocks into the reference-yaw frame, then
   quadratic with Q_path  (:172-208)
3. **collision** (interior nodes): for each of K nearest obstacle points,
   lambda * softplus(-32 * (||p_obs - p|| - r)) * |v . dir_to_obstacle|  (:186-204)
4. **goal** (terminal node N): (x_N - target)^T Q_goal (x_N - target)  (:168-170)

Indexing note (critical for parity): stage k's state costs are evaluated on
the *next* node X[:, k+1]; the gap/collision terms use ref/obstacle slot k for
node k+1 and are skipped for the terminal node (where the goal term applies).
The reference's per-stage Python loop becomes vectorized stage math here — no
Python loops survive into the jaxpr.

The reference constructs Q_colide = diag(weights[-4:-1]) but never uses it in
the objective (:147, :201-204); we mirror that by omitting it.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from avoid_mpc_tpu.config import GRAVITY, MPCConfig

# Stiffness of the soft collision barrier (reference :203, "dist * -32").
COLLISION_SHARPNESS = 32.0

# Smoothing of the |v . dir| factor: the reference uses an exact abs
# (ca.norm_2 of a scalar, :197-199), which is nonsmooth where the
# velocity-toward-obstacle crosses zero — the optimum frequently sits ON that
# kink, stalling any derivative-based solver (IPOPT included) at gradient
# norms O(1). We use |z| ~= sqrt(z^2 + eps); the induced objective error is
# <= sqrt(eps) = 1e-4, well inside the 1e-3 parity budget, and the problem
# becomes C^2 so Newton-type solvers converge tightly.
ABS_SMOOTHING = 1e-8


class CostParams(NamedTuple):
    q_goal: jax.Array  # (10,) terminal weights
    q_path: jax.Array  # (10,) path-gap weights
    q_u: jax.Array  # (4,) control weights
    collide_lambda: jax.Array  # scalar
    drone_radius: jax.Array  # scalar
    u_hover: jax.Array  # (4,) = [0, 0, g, 0]
    # --- round-2 barrier extensions (runtime knobs; 0 = exact reference) ---
    # Omnidirectional barrier weight: adds lam_omni * softplus(-32*(d - r))
    # with NO |v.dir| gate.  Fixes the diagnosed tangential-pass blindness:
    # the reference's velocity gate (tools/mpc_obstacle_casadi.py:186-204)
    # zeroes the barrier exactly when the plan grazes an obstacle tangentially.
    lam_omni: jax.Array = 0.0
    # Speed-scaled margin: effective radius r_eff = r + margin_v * ||v_ref||
    # per horizon node (v_ref from the reference path, so r_eff is constant
    # w.r.t. the decision variables).  Margin grows with planned speed to
    # cover tracking drift eroding tangential clearance.
    margin_v: jax.Array = 0.0

    @staticmethod
    def from_config(cfg: MPCConfig, dtype=jnp.float32) -> "CostParams":
        w = cfg.weights
        return CostParams(
            q_goal=jnp.asarray(w.q_goal, dtype=dtype),
            q_path=jnp.asarray(w.q_path, dtype=dtype),
            q_u=jnp.asarray(w.q_u, dtype=dtype),
            collide_lambda=jnp.asarray(w.collide_lambda, dtype=dtype),
            drone_radius=jnp.asarray(cfg.drone_radius, dtype=dtype),
            u_hover=jnp.asarray([0.0, 0.0, GRAVITY, 0.0], dtype=dtype),
            lam_omni=jnp.asarray(w.collide_lambda_omni, dtype=dtype),
            margin_v=jnp.asarray(cfg.margin_v, dtype=dtype),
        )


def node_radius(ref: jax.Array, cp: CostParams) -> jax.Array:
    """Per-node effective collision radius r_eff = r + margin_v * ||v_ref||.

    ``ref``: (..., 10) reference nodes; returns (...,).  With margin_v = 0
    this is a broadcast of the reference's constant drone_radius."""
    v = ref[..., 4:7]
    speed = jnp.sqrt(jnp.sum(v * v, axis=-1))
    return cp.drone_radius + cp.margin_v * speed


def control_cost(u: jax.Array, cp: CostParams) -> jax.Array:
    """(u - u_hover)^T diag(q_u) (u - u_hover); broadcasts over leading dims."""
    du = u - cp.u_hover
    return jnp.sum(du * du * cp.q_u, axis=-1)


def _rotate_delta_into_path_frame(delta: jax.Array, ref_yaw: jax.Array) -> jax.Array:
    """Apply the reference's yaw rotation to the (x,y) position and velocity
    blocks of a 10-dim state delta (reference :174-185).

    The reference builds rot with cos = cos(yaw), sin = sin(-yaw) giving
        [dx'; dy'] = [[cos,  sin(yaw)], [-sin(yaw), cos]] @ [dx; dy]
    i.e. rotation by -yaw (world -> path frame), applied at indices (0,1)
    and (4,5). Other components pass through.
    """
    c = jnp.cos(ref_yaw)
    s = jnp.sin(ref_yaw)
    dx = delta[..., 0] * c + delta[..., 1] * s
    dy = -delta[..., 0] * s + delta[..., 1] * c
    dvx = delta[..., 4] * c + delta[..., 5] * s
    dvy = -delta[..., 4] * s + delta[..., 5] * c
    return jnp.stack(
        [dx, dy, delta[..., 2], delta[..., 3], dvx, dvy, delta[..., 6],
         delta[..., 7], delta[..., 8], delta[..., 9]],
        axis=-1,
    )


def path_gap_cost(x: jax.Array, ref: jax.Array, cp: CostParams) -> jax.Array:
    """(rot @ (x - ref))^T diag(q_path) (rot @ (x - ref)); ref yaw = ref[..., 3]."""
    delta = _rotate_delta_into_path_frame(x - ref, ref[..., 3])
    return jnp.sum(delta * delta * cp.q_path, axis=-1)


def collision_cost(
    x: jax.Array, obstacles: jax.Array, cp: CostParams, radius: jax.Array | None = None
) -> jax.Array:
    """Soft collision cost against K obstacle points (reference :186-204).

    x: (..., 10) node state; obstacles: (..., K, 3) world points.
    cost = sum_K  lambda      * softplus(-32*(||o - p|| - r)) * |v . (o-p)/||o-p|||
                + lam_omni    * softplus(-32*(||o - p|| - r))

    ``radius``: per-node effective radius (broadcastable to the node dims);
    defaults to the constant ``cp.drone_radius``.  The second (ungated) term
    vanishes at the reference default lam_omni = 0.

    Far-away padding points (the reference pads missing obstacles with
    (1e4,1e4,1e4), AvoidanceStateMachine.cpp:225) contribute exactly zero:
    softplus underflows to 0 well before f32 runs out of range.
    """
    if radius is None:
        radius = cp.drone_radius
    p = x[..., None, 0:3]  # (..., 1, 3)
    v = x[..., None, 4:7]
    vec = obstacles - p  # (..., K, 3)
    # Safe norm: the padding keeps ||vec|| >> 0; guard anyway so grads stay finite.
    d2 = jnp.sum(vec * vec, axis=-1)
    dist = jnp.sqrt(jnp.maximum(d2, 1e-12))
    v_along = jnp.sum(v * vec, axis=-1) / dist
    v_toward = jnp.sqrt(v_along * v_along + ABS_SMOOTHING)
    barrier = jax.nn.softplus(
        -COLLISION_SHARPNESS * (dist - jnp.asarray(radius)[..., None])
    )
    return jnp.sum(
        (cp.collide_lambda * v_toward + cp.lam_omni) * barrier, axis=-1
    )


def goal_cost(x: jax.Array, target: jax.Array, cp: CostParams) -> jax.Array:
    delta = x - target
    return jnp.sum(delta * delta * cp.q_goal, axis=-1)


def stage_state_cost(
    x: jax.Array, ref: jax.Array, obstacles: jax.Array, cp: CostParams
) -> jax.Array:
    """Interior-node state cost: path gap + collision (node j = stage k+1,
    using ref/obstacle slot k)."""
    return path_gap_cost(x, ref, cp) + collision_cost(
        x, obstacles, cp, radius=node_radius(ref, cp)
    )


def trajectory_cost(
    xs: jax.Array,
    us: jax.Array,
    ref: jax.Array,
    obstacles: jax.Array,
    target: jax.Array,
    cp: CostParams,
) -> jax.Array:
    """Total objective over one horizon.

    xs: (N+1, 10) states (node 0 = initial state), us: (N, 4) controls,
    ref: (N, 10) reference path (slots 0..N-2 used), obstacles: (N, K, 3)
    (slots 0..N-2 used), target: (10,).

    Matches the reference objective exactly: interior nodes 1..N-1 get
    gap+collision from slot j-1; node N gets the goal term; all stages get
    the control term. Vectorized — one fused XLA computation, no stage loop.
    """
    n = us.shape[0]
    interior = xs[1:n]  # nodes 1..N-1  -> (N-1, 10)
    c_gap = jnp.sum(path_gap_cost(interior, ref[: n - 1], cp))
    c_col = jnp.sum(
        collision_cost(
            interior, obstacles[: n - 1], cp, radius=node_radius(ref[: n - 1], cp)
        )
    )
    c_goal = goal_cost(xs[n], target, cp)
    c_u = jnp.sum(control_cost(us, cp))
    return c_gap + c_col + c_goal + c_u


def collision_quadratics(
    pv: jax.Array, obstacles: jax.Array, radius: jax.Array, cp: CostParams
) -> tuple[jax.Array, jax.Array]:
    """Analytic gradient and Hessian of :func:`collision_cost` w.r.t. the
    6-dim (p, v) sub-state — the closed-form replacement for the per-stage
    AD Hessian in the solver's linearize phase (the round-1 p50 hot spot).

    pv: (..., 6) = [p(3), v(3)]; obstacles: (..., K, 3); radius: (...,)
    effective per-node radius (constant w.r.t. pv — margin_v uses reference
    velocities, see :func:`node_radius`).

    Derivation (per obstacle, eps = ABS_SMOOTHING):
        vec = o - p, d = ||vec||, u = vec/d, w = (v.vec)/d, g = sqrt(w^2+eps)
        z = -32*(d - r),  S = softplus(z),  sig = sigmoid(z)
        c = lam * S * g + lam_omni * S
        grad_p = lam*(32*sig*g*u + S*h*q/d) + lam_omni*32*sig*u,
                 h = w/g, q = w*u - v
        grad_v = lam*S*h*u
        Hessian blocks (outer products op(a,b) = a b^T, P = uu^T, E = I):
        cpp = lam*[1024*sig'*g*P + 32*sig*g*(P - E)/d
                   + 32*sig*h*(op(u,q) + op(q,u))/d
                   + S*((eps/g^3)*op(q,q)/d^2
                        + h*(op(u,q) + op(q,u) + w*(P - E))/d^2)]
              + lam_omni*[1024*sig'*P + 32*sig*(P - E)/d]
        cpv = lam*[32*sig*h*P + S*((eps/g^3)*op(q,u)/d + h*(P - E)/d)]
        cvv = lam*S*(eps/g^3)*P
    Verified against jax.grad/jax.hessian in tests/test_costs.py.
    """
    dtype = pv.dtype
    p = pv[..., None, 0:3]
    v = pv[..., None, 3:6]
    vec = obstacles - p  # (..., K, 3)
    d2 = jnp.sum(vec * vec, axis=-1)
    d = jnp.sqrt(jnp.maximum(d2, 1e-12))  # (..., K)
    u = vec / d[..., None]
    w = jnp.sum(v * vec, axis=-1) / d  # (..., K)
    g = jnp.sqrt(w * w + ABS_SMOOTHING)
    h = w / g
    z = -COLLISION_SHARPNESS * (d - jnp.asarray(radius)[..., None])
    sig = jax.nn.sigmoid(z)
    S = jax.nn.softplus(z)
    sigp = sig * (1.0 - sig)
    eg3 = ABS_SMOOTHING / (g * g * g)
    q = w[..., None] * u - jnp.broadcast_to(v, u.shape)  # (..., K, 3)

    lam = cp.collide_lambda
    lo = cp.lam_omni
    sh = COLLISION_SHARPNESS
    sh2 = sh * sh

    # gradients, summed over K
    grad_p = jnp.sum(
        lam
        * (
            (sh * sig * g)[..., None] * u
            + (S * h / d)[..., None] * q
        )
        + lo * (sh * sig)[..., None] * u,
        axis=-2,
    )
    grad_v = jnp.sum((lam * S * h)[..., None] * u, axis=-2)
    grad = jnp.concatenate([grad_p, grad_v], axis=-1)  # (..., 6)

    def op(a, b):  # (..., K, 3) x (..., K, 3) -> (..., K, 3, 3)
        return a[..., :, None] * b[..., None, :]

    P = op(u, u)
    eye3 = jnp.eye(3, dtype=dtype)
    PmE = P - eye3
    uq = op(u, q) + op(q, u)

    c1 = (sh2 * sigp * g)[..., None, None]
    c2 = (sh * sig * g / d)[..., None, None]
    c3 = (sh * sig * h / d)[..., None, None]
    c4 = (S * eg3 / (d * d))[..., None, None]
    c5 = (S * h / (d * d))[..., None, None]
    cpp = lam * (
        c1 * P + c2 * PmE + c3 * uq + c4 * op(q, q) + c5 * (uq + w[..., None, None] * PmE)
    ) + lo * ((sh2 * sigp)[..., None, None] * P + (sh * sig / d)[..., None, None] * PmE)

    cpv = lam * (
        (sh * sig * h)[..., None, None] * P
        + (S * eg3 / d)[..., None, None] * op(q, u)
        + (S * h / d)[..., None, None] * PmE
    )
    cvv = (lam * S * eg3)[..., None, None] * P

    cpp = jnp.sum(cpp, axis=-3)
    cpv = jnp.sum(cpv, axis=-3)
    cvv = jnp.sum(cvv, axis=-3)
    top = jnp.concatenate([cpp, cpv], axis=-1)
    bot = jnp.concatenate([jnp.swapaxes(cpv, -1, -2), cvv], axis=-1)
    hess = jnp.concatenate([top, bot], axis=-2)  # (..., 6, 6)
    return grad, hess
