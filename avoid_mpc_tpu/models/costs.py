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
        )


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


def collision_cost(x: jax.Array, obstacles: jax.Array, cp: CostParams) -> jax.Array:
    """Soft collision cost against K obstacle points (reference :186-204).

    x: (..., 10) node state; obstacles: (..., K, 3) world points.
    cost = sum_K lambda * softplus(-32*(||o - p|| - r)) * |v . (o-p)/||o-p|||

    Far-away padding points (the reference pads missing obstacles with
    (1e4,1e4,1e4), AvoidanceStateMachine.cpp:225) contribute exactly zero:
    softplus underflows to 0 well before f32 runs out of range.
    """
    p = x[..., None, 0:3]  # (..., 1, 3)
    v = x[..., None, 4:7]
    vec = obstacles - p  # (..., K, 3)
    # Safe norm: the padding keeps ||vec|| >> 0; guard anyway so grads stay finite.
    d2 = jnp.sum(vec * vec, axis=-1)
    dist = jnp.sqrt(jnp.maximum(d2, 1e-12))
    v_along = jnp.sum(v * vec, axis=-1) / dist
    v_toward = jnp.sqrt(v_along * v_along + ABS_SMOOTHING)
    barrier = jax.nn.softplus(-COLLISION_SHARPNESS * (dist - cp.drone_radius))
    return jnp.sum(cp.collide_lambda * barrier * v_toward, axis=-1)


def goal_cost(x: jax.Array, target: jax.Array, cp: CostParams) -> jax.Array:
    delta = x - target
    return jnp.sum(delta * delta * cp.q_goal, axis=-1)


def stage_state_cost(
    x: jax.Array, ref: jax.Array, obstacles: jax.Array, cp: CostParams
) -> jax.Array:
    """Interior-node state cost: path gap + collision (node j = stage k+1,
    using ref/obstacle slot k)."""
    return path_gap_cost(x, ref, cp) + collision_cost(x, obstacles, cp)


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
    c_col = jnp.sum(collision_cost(interior, obstacles[: n - 1], cp))
    c_goal = goal_cost(xs[n], target, cp)
    c_u = jnp.sum(control_cost(us, cp))
    return c_gap + c_col + c_goal + c_u
