"""Quadrotor point-mass model with first-order actuator lag.

TPU-native re-formulation of the reference's symbolic CasADi model
(``tools/mpc_obstacle_casadi.py:51-129`` for the ODE, ``:338-357`` for the RK4
integrator).  The model is a pure jittable function of (state, control,
params); everything batches with ``vmap`` and sequences with ``lax.scan`` —
the reference's ``F.map(N, "openmp")`` horizon fan-out becomes a scan.

State  x = [px, py, pz, yaw, vx, vy, vz, ax, ay, az]   (10,)
Control u = [ax_cmd, ay_cmd, az_cmd, yaw_dot]          (4,)

ODE (reference :106-122):
    p_dot   = v
    yaw_dot = u[3]
    v_dot   = a - drag(a, yaw, v)
    a_dot   = (u[:3] - [0, 0, g] - a) * tau[:3]
where drag is the optional Faessler rotor-drag term
R(a+g*e_z, yaw) @ diag(c) @ R^T @ v (reference :95-105), disabled by default.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from avoid_mpc_tpu.config import CONTROL_DIM, GRAVITY, STATE_DIM

RK4_SUBSTEPS = 4  # reference "M = 4  # refinement" (:339)


class DynamicsParams(NamedTuple):
    """Runtime dynamics parameters (part of the reference P-vector,
    ``tools/mpc_obstacle_casadi.py:91-94``)."""

    tau: jax.Array  # (4,) inverse actuator time constants
    gain: jax.Array  # (4,) command gains (folded in at build time in the
    # reference, :114-118; we keep them runtime but default to ~1)
    drag_coefficient: jax.Array  # scalar; 0 disables drag
    use_drag: bool = False  # static: changes the traced graph

    @staticmethod
    def from_config(cfg, dtype=jnp.float32) -> "DynamicsParams":
        return DynamicsParams(
            tau=jnp.asarray(cfg.tau, dtype=dtype),
            gain=jnp.asarray(cfg.gain, dtype=dtype),
            drag_coefficient=jnp.asarray(
                cfg.drag_coefficient if cfg.use_drag_coefficient else 0.0, dtype=dtype
            ),
            use_drag=bool(cfg.use_drag_coefficient),
        )


def _acc_to_rotmat(acc: jax.Array, yaw: jax.Array) -> jax.Array:
    """Body rotation from desired acceleration + yaw (differential flatness).

    Reference ``acc2rotmat`` (tools/mpc_obstacle_casadi.py:253-264); also used
    by the geometric controller (controller.cpp:92-110).
    acc: (..., 3) total thrust-direction acceleration (gravity included).
    """
    proj_xb = jnp.stack([jnp.cos(yaw), jnp.sin(yaw), jnp.zeros_like(yaw)], axis=-1)
    zb = acc / jnp.linalg.norm(acc, axis=-1, keepdims=True)
    yb = jnp.cross(zb, proj_xb)
    yb = yb / jnp.linalg.norm(yb, axis=-1, keepdims=True)
    xb = jnp.cross(yb, zb)
    return jnp.stack([xb, yb, zb], axis=-1)  # columns are body axes


def quad_dynamics(x: jax.Array, u: jax.Array, params: DynamicsParams) -> jax.Array:
    """Continuous-time ODE x_dot = f(x, u). Shapes broadcast over leading dims.

    Faithful to reference :106-122 (note: the reference comments out the gain
    multiplication "for efficiency"; we keep gain but the default config sets
    it to ~1, matching the deployed behavior).
    """
    vel = x[..., 4:7]
    acc = x[..., 7:10]
    yaw_rate = u[..., 3]

    if params.use_drag:
        # rotor drag: R diag(c) R^T v with R from (a + g e_z, yaw)
        g_vec = jnp.zeros_like(acc).at[..., 2].add(GRAVITY)
        R = _acc_to_rotmat(acc + g_vec, x[..., 3])
        drag = jnp.einsum("...ij,...j->...i", R * params.drag_coefficient, jnp.einsum("...ji,...j->...i", R, vel))
    else:
        drag = jnp.zeros_like(vel)

    a_cmd = u[..., :3]
    # (a_cmd - a) * tau, with gravity offset on z (reference :119-121)
    g_off = jnp.zeros_like(a_cmd).at[..., 2].add(GRAVITY)
    a_dot = (a_cmd - g_off - acc) * params.tau[:3]

    return jnp.concatenate(
        [
            vel,
            yaw_rate[..., None],
            acc - drag,
            a_dot,
        ],
        axis=-1,
    )


def rk4_step(
    x: jax.Array, u: jax.Array, dt: float, params: DynamicsParams, substeps: int = RK4_SUBSTEPS
) -> jax.Array:
    """Discrete transition x_{k+1} = F(x_k, u_k): RK4 with M substeps.

    Reference ``sys_dynamics`` (tools/mpc_obstacle_casadi.py:338-357): M=4
    refinement substeps of classical RK4 with zero-order-hold control.
    The substep loop is unrolled (static M) so XLA fuses the whole transition
    into one kernel.
    """
    h = dt / substeps
    for _ in range(substeps):
        k1 = quad_dynamics(x, u, params)
        k2 = quad_dynamics(x + 0.5 * h * k1, u, params)
        k3 = quad_dynamics(x + 0.5 * h * k2, u, params)
        k4 = quad_dynamics(x + h * k3, u, params)
        x = x + (h / 6.0) * (k1 + 2.0 * k2 + 2.0 * k3 + k4)
    return x


def rollout(
    x0: jax.Array, us: jax.Array, dt: float, params: DynamicsParams
) -> jax.Array:
    """Roll the horizon forward: (nx,), (N, nu) -> (N+1, nx) states.

    The reference builds this as N parallel symbolic shooting nodes
    (``F.map(N, "openmp")``, :156-157); single-shooting on TPU is a
    ``lax.scan`` — sequential over N but batched over thousands of scenarios
    via vmap, which is where the hardware parallelism goes.
    """

    def step(x, u):
        x_next = rk4_step(x, u, dt, params)
        return x_next, x_next

    _, xs = jax.lax.scan(step, x0, us)
    return jnp.concatenate([x0[None], xs], axis=0)


def state_names() -> list[str]:
    return ["px", "py", "pz", "yaw", "vx", "vy", "vz", "ax", "ay", "az"]


def control_names() -> list[str]:
    return ["ax_cmd", "ay_cmd", "az_cmd", "yaw_dot"]


assert STATE_DIM == 10 and CONTROL_DIM == 4
