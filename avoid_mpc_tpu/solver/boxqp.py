"""Projected-Newton box-constrained QP for the per-stage control update.

The reference handles control box bounds through IPOPT's interior point
(bounds assembled in ``HighLvlMpc.cpp:25-49``).  In the TPU solver the bounds
surface as a tiny per-stage QP over the 4-dim control delta inside the DDP
backward sweep (Tassa et al. 2014, "Control-limited differential dynamic
programming").  nu=4, so a Newton solve on the free set is a 4x4 masked
factorization — trivially cheap and fully batchable with vmap.

All shapes static; fixed iteration count; no data-dependent control flow.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_EPS = 1e-8


def _objective(H: jax.Array, q: jax.Array, z: jax.Array) -> jax.Array:
    return 0.5 * z @ H @ z + q @ z


def boxqp(
    H: jax.Array,
    q: jax.Array,
    lb: jax.Array,
    ub: jax.Array,
    z0: jax.Array,
    iters: int = 8,
):
    """Minimize 0.5 z^T H z + q^T z  s.t.  lb <= z <= ub.

    H must be positive definite (the caller regularizes). Returns
    ``(z_star, free_mask)`` where ``free_mask`` marks coordinates not pinned
    at an active bound — the rows of the feedback gain that stay live.

    Fixed-iteration projected Newton with a 3-candidate parallel backtracking
    step (1, 0.5, 0.25): every branch is evaluated and selected with where —
    jit/vmap-safe.
    """
    from avoid_mpc_tpu.solver.linalg import solve4

    dtype = H.dtype
    z = jnp.clip(z0, lb, ub)
    alphas = jnp.asarray([1.0, 0.5, 0.25], dtype=dtype)

    # Unrolled fixed iterations (iters is small and static): no scan carry
    # overhead inside the already-nested stage loop, and the 4x4 Newton
    # system uses the closed-form cofactor solve (solver/linalg.py) instead
    # of a pivoted LU.
    for _ in range(iters):
        g = H @ z + q
        clamp_lo = (z <= lb + _EPS) & (g > 0)
        clamp_hi = (z >= ub - _EPS) & (g < 0)
        free = jnp.logical_not(clamp_lo | clamp_hi)
        mf = free.astype(dtype)
        # Masked free-set Newton system: identity on clamped coords.
        Hff = H * (mf[:, None] * mf[None, :]) + jnp.diag(1.0 - mf)
        dz = -solve4(Hff, g * mf) * mf
        # Parallel backtracking: pick the best of three candidate steps.
        cands = jnp.clip(z[None, :] + alphas[:, None] * dz[None, :], lb, ub)
        objs = jax.vmap(lambda zz: _objective(H, q, zz))(cands)
        best = jnp.argmin(objs)
        improved = objs[best] < _objective(H, q, z)
        z = jnp.where(improved, cands[best], z)
    g = H @ z + q
    free = jnp.logical_not(((z <= lb + _EPS) & (g > 0)) | ((z >= ub - _EPS) & (g < 0)))
    return z, free
