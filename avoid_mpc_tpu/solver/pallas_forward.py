"""Fused line-search forward-pass Pallas kernel.

After the backward sweep was fused (pallas_backward.py), the line search
became the dominant per-iteration cost: 8 candidate step sizes, each a
20-stage closed-loop rollout plus a full objective evaluation — hundreds of
small XLA ops shuttling (A, B, ...) tensors through HBM.  This kernel runs
the whole phase VMEM-resident per batch tile:

1. for each alpha (unrolled): roll the closed loop
   ``u = clip(u_k + a k_k + K_k (x - x_k))`` through the affine LTI dynamics
   and accumulate the exact objective (control + yaw-rotated gap + softplus
   collision + terminal goal — models/costs.py semantics),
2. per-lane Armijo acceptance + argmin selection over alphas (identical
   logic to the XLA path in ilqr._solve_impl),
3. one final rollout at the per-lane selected alpha, storing the accepted
   trajectory (lanes with no accepted candidate get alpha=0, i.e. the
   feedback-only rollout — discarded outside via the any_ok mask).

Layout: batch in lanes (B-last), K passed in the backward kernel's K^T
layout (N, 10, 4, B) so the two kernels chain without relayout.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NX = 10
NU = 4
_BIG = 3.0e38
_ABS_EPS = 1e-8  # models/costs.ABS_SMOOTHING
_SHARP = 32.0  # models/costs.COLLISION_SHARPNESS


def _softplus(x):
    # numerically stable log(1 + exp(x)); exact for the parity budget
    return jnp.where(x > 20.0, x, jnp.log1p(jnp.exp(jnp.minimum(x, 20.0))))


def _make_kernel(n: int, n_obs: int, n_alphas: int):
    alphas = [2.0**-i for i in range(n_alphas)]

    def kernel(
        ad_ref,  # VMEM (10, 10) — columns used for Ad @ x
        bd_ref,  # VMEM (10, 4)
        cvec_ref,  # VMEM (10, 1)
        bounds_ref,  # SMEM (2, 4)
        qgoal_ref,  # SMEM (1, 10)
        qpath_ref,  # SMEM (1, 10)
        qu_ref,  # SMEM (1, 4)
        misc_ref,  # SMEM (1, 8): [lambda, radius, gravity, lam_omni, margin_v, 0, 0, 0]
        x0_ref,  # VMEM (10, BT)
        us_ref,  # VMEM (N, 4, BT)
        xsref_ref,  # VMEM (N, 10, BT) — nodes 0..N-1 of the current traj
        kff_ref,  # VMEM (N, 4, BT)
        kt_ref,  # VMEM (N, 10, 4, BT)
        ref_ref,  # VMEM (N, 10, BT) — reference path (slots 0..N-2 used)
        obs_ref,  # VMEM (N, n_obs, 3, BT)
        target_ref,  # VMEM (10, BT)
        dv_ref,  # VMEM (3, BT): [dV1; dV2; cost_old]
        us_out,  # (N, 4, BT)
        xs_out,  # (N+1, 10, BT)
        cost_out,  # (1, BT)
        ok_out,  # (1, BT) int32 any_ok
    ):
        bt = x0_ref.shape[-1]
        dtype = jnp.float32
        lam = misc_ref[0, 0]
        radius = misc_ref[0, 1]
        grav = misc_ref[0, 2]
        lam_omni = misc_ref[0, 3]
        margin_v = misc_ref[0, 4]

        def step_x(x, u):
            """x' = Ad x + Bd u + c, columns-of-A form: 14 (10,BT) FMAs."""
            acc = jnp.broadcast_to(cvec_ref[:, 0:1], (NX, bt)) * 1.0
            for j in range(NX):
                acc = acc + ad_ref[:, j : j + 1] * x[j][None, :]
            for j in range(NU):
                acc = acc + bd_ref[:, j : j + 1] * u[j][None, :]
            return acc

        def control_cost(u):
            c = jnp.zeros((bt,), dtype)
            for cidx in range(NU):
                # control cost reference point is hover [0, 0, g, 0]
                du = u[cidx] - (grav if cidx == 2 else 0.0)
                c = c + qu_ref[0, cidx] * du * du
            return c

        lo = jnp.stack([jnp.full((bt,), bounds_ref[0, c], dtype) for c in range(NU)])
        hi = jnp.stack([jnp.full((bt,), bounds_ref[1, c], dtype) for c in range(NU)])

        def node_cost(x, k):
            """State cost at node k+1 given stage k (static): gap+collision
            for k < n-1, goal for k == n-1."""
            if k == n - 1:
                c = jnp.zeros((bt,), dtype)
                for i in range(NX):
                    d = x[i] - target_ref[i]
                    c = c + qgoal_ref[0, i] * d * d
                return c
            ref_k = ref_ref[k]  # (10, BT)
            yaw = ref_k[3]
            cy = jnp.cos(yaw)
            sy = jnp.sin(yaw)
            d = [x[i] - ref_k[i] for i in range(NX)]
            rx = d[0] * cy + d[1] * sy
            ry = -d[0] * sy + d[1] * cy
            rvx = d[4] * cy + d[5] * sy
            rvy = -d[4] * sy + d[5] * cy
            rot = [rx, ry, d[2], d[3], rvx, rvy, d[6], d[7], d[8], d[9]]
            c = jnp.zeros((bt,), dtype)
            for i in range(NX):
                c = c + qpath_ref[0, i] * rot[i] * rot[i]
            # collision over n_obs points; per-node effective radius
            # r_eff = r + margin_v*||v_ref|| (models/costs.node_radius)
            rv2 = ref_k[4] * ref_k[4] + ref_k[5] * ref_k[5] + ref_k[6] * ref_k[6]
            r_eff = radius + margin_v * jnp.sqrt(rv2)
            obs_k = obs_ref[k]  # (n_obs, 3, BT)
            for o in range(n_obs):
                vx = obs_k[o, 0] - x[0]
                vy = obs_k[o, 1] - x[1]
                vz = obs_k[o, 2] - x[2]
                d2 = jnp.maximum(vx * vx + vy * vy + vz * vz, 1e-12)
                dist = jnp.sqrt(d2)
                v_along = (x[4] * vx + x[5] * vy + x[6] * vz) / dist
                v_toward = jnp.sqrt(v_along * v_along + _ABS_EPS)
                c = c + (lam * v_toward + lam_omni) * _softplus(
                    -_SHARP * (dist - r_eff)
                )
            return c

        def rollout(alpha, store: bool):
            """alpha: python float or (BT,) vector. Returns total cost."""

            x = jnp.stack([x0_ref[i] for i in range(NX)], axis=0)  # (10,BT)
            if store:
                xs_out[0] = x
            total = jnp.zeros((bt,), dtype)
            for k in range(n):
                u_k = us_ref[k]
                kff_k = kff_ref[k]
                kt_k = kt_ref[k]  # (10, 4, BT)
                xref_k = xsref_ref[k]
                # u = clip(u_k + alpha k + K (x - xref))
                if isinstance(alpha, float):
                    u = u_k + alpha * kff_k
                else:
                    u = u_k + alpha[None, :] * kff_k
                for b in range(NX):
                    dxb = (x[b] - xref_k[b])[None, :]
                    u = u + kt_k[b] * dxb  # (4,BT): K[c,b] = KT[b,c]
                u = jnp.minimum(jnp.maximum(u, lo), hi)
                x = step_x(x, u)
                total = total + control_cost(u) + node_cost(x, k)
                if store:
                    us_out[k] = u
                    xs_out[k + 1] = x
            return total

        costs = [rollout(a, store=False) for a in alphas]  # list of (BT,)

        dV1 = dv_ref[0]
        dV2 = dv_ref[1]
        cost_old = dv_ref[2]
        best_cost = jnp.full((bt,), _BIG, dtype)
        best_alpha = jnp.zeros((bt,), dtype)
        any_ok = jnp.zeros((bt,), jnp.bool_)
        for a, c in zip(alphas, costs):
            expected = a * dV1 + a * a * dV2
            ok = (cost_old - c) > 1e-4 * jnp.maximum(-expected, 0.0)
            c_m = jnp.where(ok, c, _BIG)
            take = c_m < best_cost
            best_cost = jnp.where(take, c_m, best_cost)
            best_alpha = jnp.where(take, a, best_alpha)
            any_ok = any_ok | ok

        # final rollout at the selected per-lane alpha, storing the trajectory
        final_cost = rollout(best_alpha, store=True)
        cost_out[0] = jnp.where(any_ok, final_cost, cost_old)
        ok_out[0] = any_ok.astype(jnp.int32)

    return kernel


@functools.partial(jax.jit, static_argnames=("n_alphas", "block_b", "interpret"))
def line_search_batched(
    Ad, Bd, cvec, u_lower, u_upper,
    q_goal, q_path, q_u, lam, radius,
    x0, us, xs_ref, kff, K, ref, obstacles, target,
    dV1, dV2, cost_old,
    n_alphas: int = 8, block_b: int = 128, interpret: bool = False,
    lam_omni=0.0, margin_v=0.0,
):
    """Batch-first interface. x0 (B,10), us (B,N,4), xs_ref (B,N+1,10),
    kff (B,N,4), K (B,N,4,10), ref (B,N,10), obstacles (B,N,K,3),
    target (B,10), dV1/dV2/cost_old (B,).
    Returns (us_new (B,N,4), xs_new (B,N+1,10), cost_new (B,), any_ok (B,))."""
    b, n = us.shape[0], us.shape[1]
    n_obs = obstacles.shape[2]
    dtype = jnp.float32
    bt = min(block_b, max(b, 1))
    pad = (-b) % bt
    if pad:
        padf = lambda a: jnp.pad(a, [(0, pad)] + [(0, 0)] * (a.ndim - 1))
        x0, us, xs_ref, kff, K, ref, obstacles, target, dV1, dV2, cost_old = map(
            padf, (x0, us, xs_ref, kff, K, ref, obstacles, target, dV1, dV2, cost_old)
        )
    bp = b + pad

    to_last = lambda a: jnp.moveaxis(a, 0, -1)
    x0_t = to_last(x0)
    us_t = to_last(us)
    xsref_t = to_last(xs_ref[:, :n])  # nodes 0..N-1
    kff_t = to_last(kff)
    kt_t = to_last(jnp.swapaxes(K, 2, 3))  # (N,10,4,B)
    ref_t = to_last(ref)
    obs_t = to_last(obstacles)
    target_t = to_last(target)
    dv_t = jnp.stack([dV1, dV2, cost_old], axis=0)  # (3,B)
    bounds = jnp.stack([u_lower, u_upper]).astype(dtype)  # (2,4)

    grid = (bp // bt,)
    lane = lambda *lead: pl.BlockSpec(
        lead + (bt,), lambda i: tuple(0 for _ in lead) + (i,), memory_space=pltpu.VMEM
    )
    smem = pl.BlockSpec(memory_space=pltpu.SMEM)
    vmem = pl.BlockSpec(memory_space=pltpu.VMEM)

    us_new_t, xs_new_t, cost_t, ok_t = pl.pallas_call(
        _make_kernel(n, n_obs, n_alphas),
        grid=grid,
        in_specs=[
            vmem, vmem, vmem, smem, smem, smem, smem, smem,
            lane(NX),
            lane(n, NU),
            lane(n, NX),
            lane(n, NU),
            lane(n, NX, NU),
            lane(n, NX),
            lane(n, n_obs, 3),
            lane(NX),
            lane(3),
        ],
        out_specs=[
            lane(n, NU),
            lane(n + 1, NX),
            lane(1),
            lane(1),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n, NU, bp), dtype),
            jax.ShapeDtypeStruct((n + 1, NX, bp), dtype),
            jax.ShapeDtypeStruct((1, bp), dtype),
            jax.ShapeDtypeStruct((1, bp), jnp.int32),
        ],
        interpret=interpret,
    )(
        Ad.astype(dtype), Bd.astype(dtype), cvec.astype(dtype)[:, None], bounds,
        q_goal.astype(dtype)[None, :], q_path.astype(dtype)[None, :],
        q_u.astype(dtype)[None, :],
        jnp.stack([
            jnp.asarray(lam, dtype), jnp.asarray(radius, dtype),
            jnp.asarray(9.81, dtype), jnp.asarray(lam_omni, dtype),
            jnp.asarray(margin_v, dtype), jnp.asarray(0.0, dtype),
            jnp.asarray(0.0, dtype), jnp.asarray(0.0, dtype),
        ])[None, :].astype(dtype),
        x0_t, us_t, xsref_t, kff_t, kt_t, ref_t, obs_t, target_t, dv_t,
    )

    us_new = jnp.moveaxis(us_new_t, -1, 0)[:b]
    xs_new = jnp.moveaxis(xs_new_t, -1, 0)[:b]
    return us_new, xs_new, cost_t[0, :b], ok_t[0, :b] != 0
