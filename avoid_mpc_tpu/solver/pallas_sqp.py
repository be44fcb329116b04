"""Fully-fused SQP solve — ONE Pallas program per batch tile.

Round-2 roofline analysis (``ROOFLINE.json``) showed the batched solver at
the v5e memory roofline: 21.1 GB of HBM traffic per 4096-scenario step for
only 164 MFLOP of useful math (arithmetic intensity 0.008), because each of
the 10 SQP iterations round-trips the (B,N,10,10)/(B,N,10,4) stage tensors
through HBM between separately-launched phases (XLA linearize -> Pallas
backward -> Pallas forward).  This kernel removes the round trips entirely:
the WHOLE solve — initial rollout, then per iteration {inline cost
linearization, Riccati backward sweep with per-stage box QPs, multi-alpha
line search, Levenberg trust-region update}, then the final-iterate
projected-gradient certificate — runs inside one kernel, with every
intermediate (cx/cxx/kff/K/candidate trajectories) resident in VMEM.

HBM traffic per solve becomes inputs + outputs only (~3 KB/scenario: the
problem data in, the optimal trajectory out) — a ~1000x cut vs the phase-
split path.  With HBM out of the way the program is bound by VPU
*instruction issue*, which sets the layout (round-4 rework):

Layout: batch rides the TRAILING TWO dims as a (BS, BL) = (8, 128) tile —
sublanes x lanes of one full f32 VREG — so every per-scenario scalar op in
the Riccati sweep, box QP, and analytic linearization is a full-vector
instruction.  The previous layout (batch in lanes only, trailing ``(128,)``)
left 7 of 8 sublanes idle on every such op: measured 16.3 ms/step at
batch 4096 vs ~6 ms with the 2-D tile.  Line-search alpha candidates ride a
third, leading axis (the whole 8-alpha Armijo sweep costs ONE rollout's
worth of op issues).  Rollout stage loops are ``fori_loop``s (dynamic
first-axis ref indexing) to keep Mosaic's scoped-VMEM footprint flat.

Semantics match :func:`avoid_mpc_tpu.solver.ilqr.solve` on the LTI
(drag-free) path to fp tolerance — tested in ``tests/test_pallas_sqp.py``
(interpret mode on CPU) and on-chip.

Reference analogue: the warm-started IPOPT solve capped at 10 iterations
with tol 1e-4 (``HighLvlMpc.cpp:17-23``) — here the cap is the static
``iters``, each "iteration" is the DDP analogue of one SQP step, and the
outer loop exits early once the projected gradient certifies stationarity
for every lane in the batch tile (``grad_tol``, the IPOPT-tol analogue).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from avoid_mpc_tpu.solver.pallas_backward import (
    NU,
    NX,
    _contract_left,
    _inv4_lanes,
    _mv4,
    _swap01,
)

_BIG = 3.0e38
_ABS_EPS = 1e-8  # models/costs.ABS_SMOOTHING
_SHARP = 32.0  # models/costs.COLLISION_SHARPNESS
_EPS = 1e-8  # boxqp clamp tolerance (solver/boxqp.py)
# full-state indices of the 6-dim (p, v) collision sub-state
_PV = (0, 1, 2, 4, 5, 6)


def _softplus(x):
    # max(x,0) + log1p(exp(-|x|)): one exp whose argument is always <= 0, so
    # no overflow clamp/select is needed (padding lanes see |z| ~ 3e5 and
    # land on exp -> 0, log1p -> 0 exactly).  Transcendentals are the fused
    # kernel's real cost (~15-20 VPU cycles each vs 1 for an FMA); this form
    # halves the select/clamp overhead of the naive log1p(exp(x)).
    return jnp.maximum(x, 0.0) + jnp.log1p(jnp.exp(-jnp.abs(x)))


def _softplus_sigmoid(x):
    """(softplus(x), sigmoid(x)) sharing ONE exp(-|x|) — the linearization
    needs both at the same argument for every obstacle/stage."""
    e = jnp.exp(-jnp.abs(x))
    den_inv = 1.0 / (1.0 + e)
    sig = jnp.where(x >= 0.0, den_inv, e * den_inv)
    return jnp.maximum(x, 0.0) + jnp.log1p(e), sig


def _hff_masked(Quu, mf):
    """Masked Newton system Hff = M Quu M + (I - diag(m)) built per-element
    (Mosaic supports neither scatter nor rank-2 -> rank-4 eye reshapes on
    2-D batch tiles, so the diagonal correction is written out)."""
    rows = []
    for c in range(4):
        row = []
        for d in range(4):
            e = Quu[c, d] * mf[c] * mf[d]
            if c == d:
                e = e + (1.0 - mf[c])
            row.append(e)
        rows.append(jnp.stack(row))
    return jnp.stack(rows)


def _boxqp_tiles(Quu, Qu, lb, ub, iters: int):
    """Projected-Newton box QP on (BS, BL) batch tiles (solver/boxqp.py
    semantics; 2-D-tile port of pallas_backward._boxqp_lanes).
    Quu: (4, 4, BS, BL), Qu/lb/ub: (4, BS, BL).  Returns (z, free)."""
    z = jnp.clip(jnp.zeros_like(Qu), lb, ub)

    def objective(zz):
        Hz = _mv4(Quu, zz)
        return sum(0.5 * zz[c] * Hz[c] + Qu[c] * zz[c] for c in range(4))

    for _ in range(iters):
        g = _mv4(Quu, z) + Qu
        clamp_lo = (z <= lb + _EPS) & (g > 0)
        clamp_hi = (z >= ub - _EPS) & (g < 0)
        free = jnp.logical_not(clamp_lo | clamp_hi)
        mf = free.astype(z.dtype)
        Hff = _hff_masked(Quu, mf)
        dz = -_mv4(_inv4_lanes(Hff), g * mf) * mf
        obj0 = objective(z)
        best_z, best_obj = z, obj0
        for alpha in (1.0, 0.5, 0.25):
            cand = jnp.clip(z + alpha * dz, lb, ub)
            o = objective(cand)
            take = o < best_obj
            best_obj = jnp.where(take, o, best_obj)
            best_z = jnp.where(take[None], cand, best_z)
        z = best_z

    g = _mv4(Quu, z) + Qu
    free = jnp.logical_not(
        ((z <= lb + _EPS) & (g > 0)) | ((z >= ub - _EPS) & (g < 0))
    )
    return z, free


def _make_kernel(
    n: int,
    n_obs: int,
    iters: int,
    n_alphas: int,
    bq_iters: int,
    reg_init: float,
    reg_min: float,
    reg_max: float,
    grad_tol: float,
    tol_exit: bool,
):
    alphas = [2.0**-i for i in range(n_alphas)]

    def kernel(
        # constants
        ad_s,  # SMEM (10, 10)   (backward contractions: scalar reads)
        bd_s,  # SMEM (10, 4)
        bounds_ref,  # SMEM (2, 4): [u_lower; u_upper]
        qgoal_ref,  # SMEM (1, 10)
        qpath_ref,  # SMEM (1, 10)
        qu_ref,  # SMEM (1, 4)
        uh_ref,  # SMEM (1, 4): control-cost reference point (u_hover)
        misc_ref,  # SMEM (1, 8): [lambda, radius, 0, lam_omni, margin_v, 0,0,0]
        cvec_ref,  # SMEM (10, 1)
        # per-tile problem data (batch = trailing (BS, BL) tile)
        x0_ref,  # VMEM (10, BS, BL)
        usin_ref,  # VMEM (N, 4, BS, BL)
        ref_ref,  # VMEM (N, 10, BS, BL)
        obs_ref,  # VMEM (N, n_obs, 3, BS, BL)
        target_ref,  # VMEM (10, BS, BL)
        # outputs
        us_ref,  # (N, 4, BS, BL)
        xs_ref,  # (N+1, 10, BS, BL)
        stats_ref,  # (3, BS, BL): [cost; grad_norm; reg]
        # scratch
        kff_ref,  # (N, 4, BS, BL)
        kt_ref,  # (N, 10, 4, BS, BL)  K^T layout
        cus_ref,  # (N, 4, A, BS, BL)  line-search candidate controls
        cxs_ref,  # (N+1, 10, A, BS, BL)  candidate states
        carry_ref,  # (2, BS, BL): [cost; reg] across predicated iterations
        done_ref,  # SMEM (1, 1) int32: tile-converged flag
    ):
        bsh = x0_ref.shape[1:]  # (BS, BL)
        dtype = jnp.float32
        lam = misc_ref[0, 0]
        radius = misc_ref[0, 1]
        lam_omni = misc_ref[0, 3]
        margin_v = misc_ref[0, 4]

        lo = jnp.stack([jnp.full(bsh, bounds_ref[0, c], dtype) for c in range(NU)])
        hi = jnp.stack([jnp.full(bsh, bounds_ref[1, c], dtype) for c in range(NU)])

        # ---------------- forward machinery (pallas_forward.py semantics) ---
        # All rollout math runs on (·, A, BS, BL) slabs where A is a leading
        # "line-search candidates" axis: the whole 8-alpha Armijo sweep costs
        # ONE rollout's worth of op issues instead of eight sequential
        # rollouts.  A=1 reuses the same code for the warm-start and final
        # stored rollouts.
        def step_x(x, u):
            """x' = Ad x + Bd u + c on (10, A, BS, BL): per-row scalar-SMEM
            FMAs (140 vreg-FMAs either way; the per-row form avoids the
            rank-2 -> rank-4 column-broadcast casts Mosaic cannot lower)."""
            a_shape = x.shape[1:]
            outs = []
            for i in range(NX):
                acc = jnp.full(a_shape, cvec_ref[i, 0], dtype)
                for j in range(NX):
                    acc = acc + ad_s[i, j] * x[j]
                for j in range(NU):
                    acc = acc + bd_s[i, j] * u[j]
                outs.append(acc)
            return jnp.stack(outs)

        def control_cost(u):
            c = jnp.zeros(u.shape[1:], dtype)
            for cidx in range(NU):
                du = u[cidx] - uh_ref[0, cidx]
                c = c + qu_ref[0, cidx] * du * du
            return c

        def node_cost_interior(x, k):
            """Path + collision cost at node k+1 given stage k (DYNAMIC k,
            k < n-1); x (10, A, BS, BL)."""
            a_shape = x.shape[1:]
            ref_k = ref_ref[k]
            cy = jnp.cos(ref_k[3])[None]
            sy = jnp.sin(ref_k[3])[None]
            d = [x[i] - ref_k[i][None] for i in range(NX)]
            rx = d[0] * cy + d[1] * sy
            ry = -d[0] * sy + d[1] * cy
            rvx = d[4] * cy + d[5] * sy
            rvy = -d[4] * sy + d[5] * cy
            rot = [rx, ry, d[2], d[3], rvx, rvy, d[6], d[7], d[8], d[9]]
            c = jnp.zeros(a_shape, dtype)
            for i in range(NX):
                c = c + qpath_ref[0, i] * rot[i] * rot[i]
            rv2 = ref_k[4] * ref_k[4] + ref_k[5] * ref_k[5] + ref_k[6] * ref_k[6]
            r_eff = (radius + margin_v * jnp.sqrt(rv2))[None]
            obs_k = obs_ref[k]
            for o in range(n_obs):
                vx = obs_k[o, 0][None] - x[0]
                vy = obs_k[o, 1][None] - x[1]
                vz = obs_k[o, 2][None] - x[2]
                d2 = jnp.maximum(vx * vx + vy * vy + vz * vz, 1e-12)
                # rsqrt-form distance math: one rsqrt + multiplies instead of
                # sqrt + divide (both multi-pass on the VPU)
                rinv = jax.lax.rsqrt(d2)
                dist = d2 * rinv
                v_along = (x[4] * vx + x[5] * vy + x[6] * vz) * rinv
                t2 = v_along * v_along + _ABS_EPS
                v_toward = t2 * jax.lax.rsqrt(t2)
                c = c + (lam * v_toward + lam_omni) * _softplus(
                    -_SHARP * (dist - r_eff)
                )
            return c

        def terminal_cost(x):
            """Goal quadratic at node N; x (10, A, BS, BL)."""
            c = jnp.zeros(x.shape[1:], dtype)
            for i in range(NX):
                d = x[i] - target_ref[i][None]
                c = c + qgoal_ref[0, i] * d * d
            return c

        def init_rollout():
            """Clip the warm start into us_ref, roll into xs_ref, return cost."""
            x = jnp.stack([x0_ref[i] for i in range(NX)], axis=0)[:, None]
            xs_ref[0] = x[:, 0]
            total = jnp.zeros(bsh, dtype)

            def stage(k, x, total, interior):
                u = jnp.minimum(jnp.maximum(usin_ref[k], lo), hi)
                us_ref[k] = u
                x = step_x(x, u[:, None])
                xs_ref[k + 1] = x[:, 0]
                node = node_cost_interior(x, k) if interior else terminal_cost(x)
                total = total + control_cost(u[:, None])[0] + node[0]
                return x, total

            def body(k, carry):
                return stage(k, *carry, True)

            x, total = jax.lax.fori_loop(0, n - 1, body, (x, total))
            _, total = stage(n - 1, x, total, False)
            return total

        def ls_rollout(alpha):
            """Closed-loop rollout u = clip(u_k + a k + K (x - x_k)) for the
            whole (A, BS, BL) slab of alphas at once; returns total cost
            (A, BS, BL) and persists EVERY candidate trajectory into
            cus_ref/cxs_ref — the accepted alpha is mask-selected afterwards,
            so no second (re-roll) rollout is needed."""
            a_dim = alpha.shape[0]
            x = jnp.broadcast_to(
                jnp.stack([x0_ref[i] for i in range(NX)], axis=0)[:, None],
                (NX, a_dim) + bsh,
            ) * 1.0
            cxs_ref[0] = x
            total = jnp.zeros((a_dim,) + bsh, dtype)

            def stage(k, x, total, interior):
                kff_k = kff_ref[k]
                u = us_ref[k][:, None] + alpha[None] * kff_k[:, None]
                kt_k = kt_ref[k]  # (10, 4, BS, BL); K[c, b] = KT[b, c]
                xref_k = xs_ref[k]
                for b in range(NX):
                    u = u + kt_k[b][:, None] * (x[b] - xref_k[b][None])[None]
                u = jnp.minimum(jnp.maximum(u, lo[:, None]), hi[:, None])
                x = step_x(x, u)
                node = node_cost_interior(x, k) if interior else terminal_cost(x)
                total = total + control_cost(u) + node
                cus_ref[k] = u
                cxs_ref[k + 1] = x
                return x, total

            def body(k, carry):
                return stage(k, *carry, True)

            x, total = jax.lax.fori_loop(0, n - 1, body, (x, total))
            _, total = stage(n - 1, x, total, False)
            return total

        # ---------------- inline linearization (ilqr._linearize semantics) --
        def linearize_terminal():
            """Goal quadratic at node N: cx = 2 q_goal (x - target)."""
            x = xs_ref[n]
            cx = jnp.stack(
                [2.0 * qgoal_ref[0, i] * (x[i] - target_ref[i]) for i in range(NX)]
            )
            zero = jnp.zeros(bsh, dtype)
            rows = []
            for i in range(NX):
                rows.append(
                    jnp.stack(
                        [
                            jnp.full(bsh, 2.0 * qgoal_ref[0, i], dtype)
                            if j == i
                            else zero
                            for j in range(NX)
                        ]
                    )
                )
            return cx, jnp.stack(rows)

        def linearize_interior(k):
            """Gap quadratic (analytic yaw-rotated M) + closed-form collision
            grad/Hessian (models/costs.collision_quadratics), node k+1 /
            slot k.  DYNAMIC k (reverse-sweep fori counter)."""
            x = xs_ref[k + 1]
            ref_k = ref_ref[k]
            cy = jnp.cos(ref_k[3])
            sy = jnp.sin(ref_k[3])
            qp = [qpath_ref[0, i] for i in range(NX)]
            # 2x2 yaw blocks of M (un-doubled; final entries are 2*these)
            p00 = qp[0] * cy * cy + qp[1] * sy * sy
            p11 = qp[0] * sy * sy + qp[1] * cy * cy
            p01 = (qp[0] - qp[1]) * cy * sy
            v00 = qp[4] * cy * cy + qp[5] * sy * sy
            v11 = qp[4] * sy * sy + qp[5] * cy * cy
            v01 = (qp[4] - qp[5]) * cy * sy
            dx = [x[i] - ref_k[i] for i in range(NX)]

            # gradient cx = M @ dx (10, BS, BL) as a mutable list
            cx = [2.0 * qp[i] * dx[i] for i in range(NX)]
            cx[0] = 2.0 * (p00 * dx[0] + p01 * dx[1])
            cx[1] = 2.0 * (p01 * dx[0] + p11 * dx[1])
            cx[4] = 2.0 * (v00 * dx[4] + v01 * dx[5])
            cx[5] = 2.0 * (v01 * dx[4] + v11 * dx[5])

            # Hessian entries as a dense python dict-of-lists (10x10 of bsh)
            zero = jnp.zeros(bsh, dtype)
            H = [[zero for _ in range(NX)] for _ in range(NX)]
            for i in range(NX):
                H[i][i] = jnp.full(bsh, 2.0 * qp[i], dtype) + zero
            H[0][0] = 2.0 * p00 + zero
            H[1][1] = 2.0 * p11 + zero
            H[0][1] = H[1][0] = 2.0 * p01 + zero
            H[4][4] = 2.0 * v00 + zero
            H[5][5] = 2.0 * v11 + zero
            H[4][5] = H[5][4] = 2.0 * v01 + zero

            # collision: per-obstacle closed forms on the (p, v) sub-state
            rv2 = ref_k[4] * ref_k[4] + ref_k[5] * ref_k[5] + ref_k[6] * ref_k[6]
            r_eff = radius + margin_v * jnp.sqrt(rv2)
            obs_k = obs_ref[k]  # (n_obs, 3, BS, BL)
            p_vec = [x[0], x[1], x[2]]
            v_vec = [x[4], x[5], x[6]]
            gp = [zero, zero, zero]
            gv = [zero, zero, zero]
            cpp = [[zero] * 3 for _ in range(3)]
            cpv = [[zero] * 3 for _ in range(3)]
            cvv = [[zero] * 3 for _ in range(3)]
            for o in range(n_obs):
                vec = [obs_k[o, i] - p_vec[i] for i in range(3)]
                d2 = jnp.maximum(
                    vec[0] * vec[0] + vec[1] * vec[1] + vec[2] * vec[2], 1e-12
                )
                # rsqrt-form closed-form quadratics: the naive forms spend
                # 2 sqrt + ~13 divides + 2 exp per obstacle (all multi-pass
                # VPU ops); the reciprocal forms spend 2 rsqrt + 1 exp +
                # 1 divide and multiplies.  Math is identical to ~1 ulp.
                rinv = jax.lax.rsqrt(d2)
                rinv2 = rinv * rinv
                d = d2 * rinv
                u3 = [vec[i] * rinv for i in range(3)]
                w = (
                    v_vec[0] * vec[0] + v_vec[1] * vec[1] + v_vec[2] * vec[2]
                ) * rinv
                g2 = w * w + _ABS_EPS
                ginv = jax.lax.rsqrt(g2)
                g = g2 * ginv
                h = w * ginv
                z = -_SHARP * (d - r_eff)
                S, sig = _softplus_sigmoid(z)
                sigp = sig * (1.0 - sig)
                eg3 = _ABS_EPS * ginv * ginv * ginv
                q3 = [w * u3[i] - v_vec[i] for i in range(3)]

                # gradients
                a_p = lam * _SHARP * sig * g + lam_omni * _SHARP * sig
                b_p = lam * S * h * rinv
                c_v = lam * S * h
                for i in range(3):
                    gp[i] = gp[i] + a_p * u3[i] + b_p * q3[i]
                    gv[i] = gv[i] + c_v * u3[i]

                # Hessian blocks
                sh2 = _SHARP * _SHARP
                c1 = sh2 * sigp * g
                c2 = _SHARP * sig * g * rinv
                c3 = _SHARP * sig * h * rinv
                c4 = S * eg3 * rinv2
                c5 = S * h * rinv2
                o1 = sh2 * sigp
                o2 = _SHARP * sig * rinv
                m1 = _SHARP * sig * h
                m2 = S * eg3 * rinv
                m3 = S * h * rinv
                vv = lam * S * eg3
                for i in range(3):
                    for j in range(3):
                        P = u3[i] * u3[j]
                        E = 1.0 if i == j else 0.0
                        PmE = P - E
                        uq = u3[i] * q3[j] + q3[i] * u3[j]
                        cpp[i][j] = cpp[i][j] + lam * (
                            c1 * P
                            + c2 * PmE
                            + c3 * uq
                            + c4 * q3[i] * q3[j]
                            + c5 * (uq + w * PmE)
                        ) + lam_omni * (o1 * P + o2 * PmE)
                        cpv[i][j] = cpv[i][j] + lam * (
                            m1 * P + m2 * q3[i] * u3[j] + m3 * PmE
                        )
                        cvv[i][j] = cvv[i][j] + vv * P

            # scatter the 6x6 pv blocks into the full-state grad/Hessian
            for i in range(3):
                cx[_PV[i]] = cx[_PV[i]] + gp[i]
                cx[_PV[3 + i]] = cx[_PV[3 + i]] + gv[i]
                for j in range(3):
                    H[_PV[i]][_PV[j]] = H[_PV[i]][_PV[j]] + cpp[i][j]
                    H[_PV[i]][_PV[3 + j]] = H[_PV[i]][_PV[3 + j]] + cpv[i][j]
                    H[_PV[3 + i]][_PV[j]] = H[_PV[3 + i]][_PV[j]] + cpv[j][i]
                    H[_PV[3 + i]][_PV[3 + j]] = H[_PV[3 + i]][_PV[3 + j]] + cvv[i][j]

            cx = jnp.stack(cx)
            cxx = jnp.stack([jnp.stack(row) for row in H])
            return cx, cxx

        # ---------------- Riccati stage (pallas_backward.py semantics) ------
        def riccati_step(k, cx_k, cxx_k, carry, reg):
            Vx, Vxx, dV1, dV2, pg = carry
            u_k = us_ref[k]
            # control-cost gradient about the hover reference point
            lu_k = jnp.stack(
                [
                    2.0 * qu_ref[0, c] * (u_k[c] - uh_ref[0, c])
                    for c in range(NU)
                ]
            )

            Wx = Vx + cx_k
            Wxx = Vxx + cxx_k

            Qx = _contract_left(ad_s, Wx, NX, NX)
            Qu = lu_k + _contract_left(bd_s, Wx, NX, NU)
            T1 = _contract_left(ad_s, Wxx, NX, NX)  # T1[a] = (A^T Wxx)[a]
            # Qxx = A^T Wxx A is symmetric (Wxx is): build the upper
            # triangle once and mirror — 45% fewer FMAs than the second
            # full contraction, and exactly symmetric by construction.
            qxx = [[None] * NX for _ in range(NX)]
            for a in range(NX):
                t1a = T1[a]
                for c2 in range(a, NX):
                    acc = ad_s[0, c2] * t1a[0]
                    for j in range(1, NX):
                        acc = acc + ad_s[j, c2] * t1a[j]
                    qxx[a][c2] = acc
                    if c2 != a:
                        qxx[c2][a] = acc
            # BtW = Bd^T (Wxx + reg I): the reg-I term contracts to the
            # closed form Bd[a, c] * reg (no rank-4 eye materialization)
            BtW = _contract_left(bd_s, Wxx, NX, NU) + jnp.stack(
                [
                    jnp.stack([bd_s[a, c] * reg for a in range(NX)])
                    for c in range(NU)
                ]
            )
            QuxT = _contract_left(ad_s, _swap01(BtW), NX, NX)  # (b, c, BS, BL)
            Quu = _contract_left(bd_s, _swap01(BtW), NX, NU)
            Quu = 0.5 * (Quu + _swap01(Quu))
            # + luu + reg I, diagonal written out per-element
            luu_b = jnp.stack(
                [
                    jnp.stack(
                        [
                            (jnp.full(bsh, 2.0 * qu_ref[0, c], dtype) + reg)
                            if c == dd
                            else jnp.zeros(bsh, dtype)
                            for dd in range(NU)
                        ]
                    )
                    for c in range(NU)
                ]
            )
            Quu = Quu + luu_b

            lb = jnp.stack([bounds_ref[0, c] - u_k[c] for c in range(NU)])
            ub = jnp.stack([bounds_ref[1, c] - u_k[c] for c in range(NU)])
            k_ff, free = _boxqp_tiles(Quu, Qu, lb, ub, bq_iters)
            mf = free.astype(dtype)

            inv = _inv4_lanes(_hff_masked(Quu, mf))
            QuxTm = QuxT * mf[None]
            KT = -jnp.stack(
                [
                    jnp.stack(
                        [
                            sum(QuxTm[b, dd] * inv[dd, c] for dd in range(NU))
                            for c in range(NU)
                        ]
                    )
                    for b in range(NX)
                ]
            )  # (10, 4, BS, BL)

            t_vec = _mv4(Quu, k_ff) + Qu
            Vx_new = Qx
            for c in range(NU):
                Vx_new = Vx_new + KT[:, c] * t_vec[c][None]
                Vx_new = Vx_new + QuxT[:, c] * k_ff[c][None]

            M1T = jnp.stack(
                [
                    jnp.stack(
                        [
                            sum(KT[b, c] * Quu[c, dd] for c in range(NU))
                            for dd in range(NU)
                        ]
                    )
                    for b in range(NX)
                ]
            )
            # Vxx = Qxx + K^T Quu K + K^T Qux + Qux^T K — every term
            # symmetric (Quu symmetrized above), so build the upper
            # triangle and mirror; no fp-symmetrization pass needed.
            vxx = [[None] * NX for _ in range(NX)]
            for a in range(NX):
                for b in range(a, NX):
                    acc = qxx[a][b]
                    for dd in range(NU):
                        acc = acc + M1T[a, dd] * KT[b, dd]
                    for c in range(NU):
                        acc = acc + KT[a, c] * QuxT[b, c]
                        acc = acc + QuxT[a, c] * KT[b, c]
                    vxx[a][b] = acc
                    if b != a:
                        vxx[b][a] = acc
            Vxx_new = jnp.stack([jnp.stack(r) for r in vxx])

            dV1 = dV1 + sum(k_ff[c] * Qu[c] for c in range(NU))
            Hk = _mv4(Quu, k_ff)
            dV2 = dV2 + 0.5 * sum(k_ff[c] * Hk[c] for c in range(NU))
            pg_k = jnp.max(jnp.abs(jnp.where(free, Qu, 0.0)), axis=0)
            pg = jnp.maximum(pg, pg_k)

            kff_ref[k] = k_ff
            kt_ref[k] = KT
            return (Vx_new, Vxx_new, dV1, dV2, pg)

        def backward(reg):
            """Full reverse sweep; fills kff/kt refs, returns (dV1, dV2, pg)."""
            init = (
                jnp.zeros((NX,) + bsh, dtype),
                jnp.zeros((NX, NX) + bsh, dtype),
                jnp.zeros(bsh, dtype),
                jnp.zeros(bsh, dtype),
                jnp.zeros(bsh, dtype),
            )
            cxN, cxxN = linearize_terminal()
            carry = riccati_step(n - 1, cxN, cxxN, init, reg)

            def body(t, carry):
                k = n - 1 - t
                cxk, cxxk = linearize_interior(k)
                return riccati_step(k, cxk, cxxk, carry, reg)

            carry = jax.lax.fori_loop(1, n, body, carry)
            return carry[2], carry[3], carry[4]

        # ---------------- the solve ----------------------------------------
        cost0 = init_rollout()
        reg0 = jnp.full(bsh, reg_init, dtype)

        n_a = len(alphas)
        # (A, BS, BL) slab of alphas: rows of python-float fulls (2^-i exact
        # in fp; jnp.exp2(-i) on the VPU is an approximation whose sub-ulp
        # error flipped Armijo accepts on-chip, and a captured jnp constant
        # would hit Mosaic's "captures constants" error).
        alpha_slab = jnp.concatenate(
            [jnp.full((1,) + bsh, a, dtype) for a in alphas], axis=0
        )
        arow = jax.lax.broadcasted_iota(jnp.int32, (n_a,) + bsh, 0)

        def outer_core(cost, reg):
            """One SQP iteration at (cost, reg): backward sweep, slab line
            search, accept.  Returns (cost_new, reg_new, done) where done
            certifies every lane of the tile stationary."""
            dV1, dV2, pg = backward(reg)
            # Reference exit semantics (HighLvlMpc.cpp:17-23: IPOPT tol 1e-4
            # within max_iter 10): stop iterating once the projected
            # gradient certifies stationarity.  SPMD grain = the batch tile,
            # so the exit fires when EVERY lane in the tile is stationary; a
            # stationary iterate is a fixed point of further iterations (the
            # Armijo test cannot accept a non-improving candidate), so
            # early-exit returns the same trajectory to fp noise.
            done = jnp.max(pg) < grad_tol

            # one (A, BS, BL)-slab rollout evaluates every alpha's cost at
            # once AND persists every candidate trajectory
            c = ls_rollout(alpha_slab)  # (A, BS, BL)
            expected = alpha_slab * dV1[None] + (
                alpha_slab * alpha_slab
            ) * dV2[None]
            ok = (cost[None] - c) > 1e-4 * jnp.maximum(-expected, 0.0)
            c_m = jnp.where(ok, c, _BIG)
            best_cost = jnp.min(c_m, axis=0)  # (BS, BL)
            # first (= largest-alpha) row achieving the min — matches the
            # sequential sweep's strictly-better update order
            amin = jnp.min(
                jnp.where(c_m <= best_cost[None], arow, jnp.int32(2**30)),
                axis=0,
            )
            sel = (arow == amin[None]).astype(dtype)  # one-hot over A
            any_ok = jnp.max(ok.astype(dtype), axis=0) > 0.5

            # accept = mask-select the winning candidate row out of the
            # stored slab (sel is an exact 0/1 one-hot, so the masked sum is
            # bitwise the winning trajectory — zeros plus one exact value);
            # no-improvement lanes keep the incumbent.
            def accept_u(k, _):
                cus_k = cus_ref[k]  # (NU, A, BS, BL)
                u_sel = sum(cus_k[:, a] * sel[a][None] for a in range(n_a))
                us_ref[k] = jnp.where(any_ok[None], u_sel, us_ref[k])
                return 0

            def accept_x(k, _):
                cxs_k = cxs_ref[k]  # (NX, A, BS, BL)
                x_sel = sum(cxs_k[:, a] * sel[a][None] for a in range(n_a))
                xs_ref[k] = jnp.where(any_ok[None], x_sel, xs_ref[k])
                return 0

            jax.lax.fori_loop(0, n, accept_u, 0)
            jax.lax.fori_loop(0, n + 1, accept_x, 0)
            cost_new = jnp.where(any_ok, best_cost, cost)
            reg_new = jnp.where(
                any_ok,
                jnp.maximum(reg * 0.2, reg_min),
                jnp.minimum(jnp.maximum(reg, 1e-4) * 8.0, reg_max),
            )
            return cost_new, reg_new, done

        # tol_exit=True compiles the while_loop (standalone solves);
        # tol_exit=False compiles a fixed-budget fori_loop whose body is
        # PREDICATED on the tile's converged flag (round-5, VERDICT r4
        # item 2): the while_loop's dynamic trip count blows up XLA compile
        # time when this kernel is embedded in large scanned programs (the
        # closed-loop world step: a 100-tick scan x 3 engine solves never
        # finished compiling in 40 min with while, vs ~minutes with fori),
        # but a STATIC trip count whose iterations branch out their whole
        # body on a scalar `pl.when` keeps the compile shape of fori while
        # transferring the tol-exit wall-time win (measured 2.3x on the
        # flagship bench) to every engine/scan context.  Results are
        # identical either way: stationary iterates are fixed points of
        # further iterations, and the skipped iterations are exactly the
        # ones the while_loop would not have run.
        if tol_exit:

            def outer_w(carry):
                i, cost, reg, _ = carry
                cost_new, reg_new, done = outer_core(cost, reg)
                return (i + jnp.int32(1), cost_new, reg_new, done)

            def outer_cond(carry):
                i, _, _, done = carry
                return jnp.logical_and(i < iters, jnp.logical_not(done))

            _, cost, reg, _ = jax.lax.while_loop(
                outer_cond, outer_w, (jnp.int32(0), cost0, reg0, jnp.asarray(False))
            )
        else:
            carry_ref[0] = cost0
            carry_ref[1] = reg0
            done_ref[0, 0] = jnp.int32(0)

            def outer_f(_t, z):
                @pl.when(done_ref[0, 0] == 0)
                def _():
                    cost_new, reg_new, done = outer_core(
                        carry_ref[0], carry_ref[1]
                    )
                    carry_ref[0] = cost_new
                    carry_ref[1] = reg_new
                    done_ref[0, 0] = done.astype(jnp.int32)

                return z

            jax.lax.fori_loop(0, iters, outer_f, jnp.int32(0))
            cost = carry_ref[0]
            reg = carry_ref[1]
        # final-iterate certificate: linearize + sweep at the returned point
        _, _, pg = backward(reg)
        stats_ref[0:1] = cost[None]
        stats_ref[1:2] = pg[None]
        stats_ref[2:3] = reg[None]

    return kernel


def _tile_shape(bt: int) -> tuple[int, int]:
    """Choose the (BS, BL) batch tile for a bt-scenario block: full (8, 128)
    VREG tiles when bt allows, lanes-only otherwise (small/odd batches)."""
    if bt >= 256 and bt % 128 == 0:
        return (min(bt // 128, 8), 128)
    return (1, bt)


@functools.partial(
    jax.jit,
    static_argnames=(
        "iters", "n_alphas", "bq_iters", "reg_init", "reg_min", "reg_max",
        "grad_tol", "tol_exit", "block_b", "block_shape", "interpret",
    ),
)
def sqp_solve_batched(
    Ad, Bd, cvec, u_lower, u_upper,
    q_goal, q_path, q_u, u_hover, lam, radius, lam_omni, margin_v,
    x0, us_init, ref, obstacles, target,
    iters: int = 10, n_alphas: int = 8, bq_iters: int = 4,
    reg_init: float = 1e-6, reg_min: float = 1e-9, reg_max: float = 1e6,
    grad_tol: float = 1e-4, tol_exit: bool = True,
    block_b: int = 1024, block_shape: tuple[int, int] | None = None,
    interpret: bool = False,
):
    """Batch-first interface to the fused full solve.

    Args: Ad (10,10), Bd (10,4), cvec (10,), bounds (4,), weights as in
    CostParams, x0 (B,10), us_init (B,N,4), ref (B,N,10),
    obstacles (B,N,K,3), target (B,10).
    Returns (us (B,N,4), xs (B,N+1,10), cost (B,), grad_norm (B,), reg (B,)).

    ``block_b`` bounds the scenarios per kernel instance; the batch tile is
    laid out as trailing (BS, BL) dims per ``_tile_shape`` (full-VREG (8,128)
    tiles on the throughput path).  ``block_shape`` overrides the tile
    directly (tests).
    """
    b, n = us_init.shape[0], us_init.shape[1]
    n_obs = obstacles.shape[2]
    dtype = jnp.float32
    if block_shape is not None:
        bs_t, bl = block_shape
        bt = bs_t * bl
    else:
        bt = min(block_b, max(b, 1))
        bs_t, bl = _tile_shape(bt)
        bt = bs_t * bl
    pad = (-b) % bt
    if pad:
        # Replicate the LAST REAL scenario into the padding lanes (edge mode)
        # rather than zero-filling: the tol early exit takes a max over every
        # lane in the tile, and an all-zero problem (obstacle at the drone's
        # position) may never reach stationarity — one such lane would
        # silently disable the early exit for the whole tile at non-aligned
        # batch sizes.  A replicated lane converges exactly when its real
        # twin does, so padding never gates the exit.
        padf = lambda a: jnp.pad(
            a, [(0, pad)] + [(0, 0)] * (a.ndim - 1), mode="edge"
        )
        x0, us_init, ref, obstacles, target = map(
            padf, (x0, us_init, ref, obstacles, target)
        )
    bp = b + pad

    # batch-last, then split the batch into trailing (rows, BL) for the
    # (BS, BL) tile grid
    def to_tiles(a):
        a = jnp.moveaxis(a.astype(dtype), 0, -1)
        return jnp.reshape(a, a.shape[:-1] + (bp // bl, bl))

    x0_t = to_tiles(x0)
    us_t = to_tiles(us_init)
    ref_t = to_tiles(ref)
    obs_t = to_tiles(obstacles)
    target_t = to_tiles(target)
    bounds = jnp.stack([u_lower, u_upper]).astype(dtype)
    misc = jnp.stack(
        [
            jnp.asarray(lam, dtype), jnp.asarray(radius, dtype),
            jnp.asarray(0.0, dtype), jnp.asarray(lam_omni, dtype),
            jnp.asarray(margin_v, dtype), jnp.asarray(0.0, dtype),
            jnp.asarray(0.0, dtype), jnp.asarray(0.0, dtype),
        ]
    )[None, :]

    grid = (bp // bt,)
    lane = lambda *lead: pl.BlockSpec(
        lead + (bs_t, bl), lambda i: tuple(0 for _ in lead) + (i, 0),
        memory_space=pltpu.VMEM,
    )
    smem = pl.BlockSpec(memory_space=pltpu.SMEM)

    us_out, xs_out, stats = pl.pallas_call(
        _make_kernel(
            n, n_obs, iters, n_alphas, bq_iters,
            float(reg_init), float(reg_min), float(reg_max), float(grad_tol),
            bool(tol_exit),
        ),
        grid=grid,
        in_specs=[
            smem, smem, smem, smem, smem, smem, smem, smem,
            smem,
            lane(NX),
            lane(n, NU),
            lane(n, NX),
            lane(n, n_obs, 3),
            lane(NX),
        ],
        out_specs=[
            lane(n, NU),
            lane(n + 1, NX),
            lane(3),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n, NU, bp // bl, bl), dtype),
            jax.ShapeDtypeStruct((n + 1, NX, bp // bl, bl), dtype),
            jax.ShapeDtypeStruct((3, bp // bl, bl), dtype),
        ],
        scratch_shapes=[
            pltpu.VMEM((n, NU, bs_t, bl), dtype),
            pltpu.VMEM((n, NX, NU, bs_t, bl), dtype),
            pltpu.VMEM((n, NU, n_alphas, bs_t, bl), dtype),
            pltpu.VMEM((n + 1, NX, n_alphas, bs_t, bl), dtype),
            pltpu.VMEM((2, bs_t, bl), dtype),  # [cost; reg] predicated carry
            pltpu.SMEM((1, 1), jnp.int32),  # tile-converged flag
        ],
        # the (8,128)-tile program holds the stage scratch plus the slab
        # line-search live set in VMEM — comfortably inside the v5e's
        # physical VMEM, above Mosaic's 16 MB default
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 2**20),
        interpret=interpret,
    )(
        Ad.astype(dtype), Bd.astype(dtype), bounds,
        q_goal.astype(dtype)[None, :], q_path.astype(dtype)[None, :],
        q_u.astype(dtype)[None, :], u_hover.astype(dtype)[None, :],
        misc.astype(dtype),
        cvec.astype(dtype)[:, None],
        x0_t, us_t, ref_t, obs_t, target_t,
    )

    def from_tiles(a):
        a = jnp.reshape(a, a.shape[:-2] + (bp,))
        return jnp.moveaxis(a, -1, 0)[:b]

    us = from_tiles(us_out)
    xs = from_tiles(xs_out)
    stats = from_tiles(stats)
    return us, xs, stats[:, 0], stats[:, 1], stats[:, 2]
