"""Fused Riccati-backward-sweep Pallas kernel.

The measured hot spot of the batched solver is the backward pass: the XLA
scan over N stages emits thousands of tiny (B,4,4)/(B,10,10) kernels per
solver iteration — each a launch plus an HBM round trip.  This kernel fuses
the ENTIRE sweep (stage loop, per-stage box QP, gain computation, value
recursion) into one Pallas program per batch tile, with all intermediates
resident in VMEM.

Layout: **batch in lanes**.  All per-scenario tensors arrive transposed to
batch-last — e.g. ``cxx: (N, 10, 10, BT)`` — so every small-matrix operation
becomes a short unrolled loop of (rows, BT) vector FMAs on the VPU at full
f32 precision (no MXU, hence no bf16 hazard; see ops/knn.py for the same
lesson).  The 4x4 Newton systems inside the box QP use the closed-form
cofactor inverse evaluated on (1, BT) lane slices.

Semantics match :func:`avoid_mpc_tpu.solver.ilqr._backward` +
:func:`avoid_mpc_tpu.solver.boxqp.boxqp` (tested against them to fp
tolerance).  Exposed through ``riccati_backward_batched`` (batch-first
interface, transposes handled here).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NX = 10
NU = 4
_EPS = 1e-8  # boxqp clamp tolerance (solver/boxqp.py)


def _contract_left(A_ref, W, m: int, n: int):
    """out[a] = sum_i A[i, a] * W[i]  for A (m, n) in SMEM and W (m, p, BT)
    (or (m, BT)) — n outputs, each m FMAs on a (p, BT) tile."""
    outs = []
    for a in range(n):
        acc = A_ref[0, a] * W[0]
        for i in range(1, m):
            acc = acc + A_ref[i, a] * W[i]
        outs.append(acc)
    return jnp.stack(outs, axis=0)


def _swap01(T):
    """(p, q, BT) -> (q, p, BT)."""
    return jnp.swapaxes(T, 0, 1)


def _inv4_lanes(H):
    """Closed-form 4x4 inverse on lane slices. H: (4, 4, BT) -> (4, 4, BT).
    Same cofactor algebra as solver/linalg.inv4, evaluated per-lane."""
    a = [[H[i, j] for j in range(4)] for i in range(4)]
    s0 = a[2][0] * a[3][1] - a[2][1] * a[3][0]
    s1 = a[2][0] * a[3][2] - a[2][2] * a[3][0]
    s2 = a[2][0] * a[3][3] - a[2][3] * a[3][0]
    s3 = a[2][1] * a[3][2] - a[2][2] * a[3][1]
    s4 = a[2][1] * a[3][3] - a[2][3] * a[3][1]
    s5 = a[2][2] * a[3][3] - a[2][3] * a[3][2]
    c0 = a[0][0] * a[1][1] - a[0][1] * a[1][0]
    c1 = a[0][0] * a[1][2] - a[0][2] * a[1][0]
    c2 = a[0][0] * a[1][3] - a[0][3] * a[1][0]
    c3 = a[0][1] * a[1][2] - a[0][2] * a[1][1]
    c4 = a[0][1] * a[1][3] - a[0][3] * a[1][1]
    c5 = a[0][2] * a[1][3] - a[0][3] * a[1][2]
    det = c0 * s5 - c1 * s4 + c2 * s3 + c3 * s2 - c4 * s1 + c5 * s0
    r = 1.0 / det
    b = [
        [(a[1][1] * s5 - a[1][2] * s4 + a[1][3] * s3) * r,
         (-a[0][1] * s5 + a[0][2] * s4 - a[0][3] * s3) * r,
         (a[3][1] * c5 - a[3][2] * c4 + a[3][3] * c3) * r,
         (-a[2][1] * c5 + a[2][2] * c4 - a[2][3] * c3) * r],
        [(-a[1][0] * s5 + a[1][2] * s2 - a[1][3] * s1) * r,
         (a[0][0] * s5 - a[0][2] * s2 + a[0][3] * s1) * r,
         (-a[3][0] * c5 + a[3][2] * c2 - a[3][3] * c1) * r,
         (a[2][0] * c5 - a[2][2] * c2 + a[2][3] * c1) * r],
        [(a[1][0] * s4 - a[1][1] * s2 + a[1][3] * s0) * r,
         (-a[0][0] * s4 + a[0][1] * s2 - a[0][3] * s0) * r,
         (a[3][0] * c4 - a[3][1] * c2 + a[3][3] * c0) * r,
         (-a[2][0] * c4 + a[2][1] * c2 - a[2][3] * c0) * r],
        [(-a[1][0] * s3 + a[1][1] * s1 - a[1][2] * s0) * r,
         (a[0][0] * s3 - a[0][1] * s1 + a[0][2] * s0) * r,
         (-a[3][0] * c3 + a[3][1] * c1 - a[3][2] * c0) * r,
         (a[2][0] * c3 - a[2][1] * c1 + a[2][2] * c0) * r],
    ]
    return jnp.stack([jnp.stack(row, axis=0) for row in b], axis=0)


def _mv4(H, z):
    """(4,4,BT) x (4,BT) -> (4,BT), unrolled."""
    return jnp.stack(
        [sum(H[c, d] * z[d] for d in range(4)) for c in range(4)], axis=0
    )


def _boxqp_lanes(Quu, Qu, lb, ub, iters: int):
    """Batched-in-lanes projected-Newton box QP (solver/boxqp.py semantics).
    Quu: (4,4,BT), Qu/lb/ub: (4,BT). Returns (z, free) both (4,BT)."""
    z = jnp.clip(jnp.zeros_like(Qu), lb, ub)

    def objective(zz):
        Hz = _mv4(Quu, zz)
        return sum(0.5 * zz[c] * Hz[c] + Qu[c] * zz[c] for c in range(4))

    eye4 = jnp.eye(4, dtype=Qu.dtype)[:, :, None]

    for _ in range(iters):
        g = _mv4(Quu, z) + Qu
        clamp_lo = (z <= lb + _EPS) & (g > 0)
        clamp_hi = (z >= ub - _EPS) & (g < 0)
        free = jnp.logical_not(clamp_lo | clamp_hi)
        mf = free.astype(z.dtype)
        # masked system: Hff = M Quu M + (I - diag(m))
        # (no .at[] updates — Mosaic has no scatter; diagonal via eye mask)
        Hff = Quu * mf[:, None, :] * mf[None, :, :] + eye4 * (1.0 - mf)[:, None, :]
        dz = -_mv4(_inv4_lanes(Hff), g * mf) * mf
        obj0 = objective(z)
        best_z, best_obj = z, obj0
        for alpha in (1.0, 0.5, 0.25):
            cand = jnp.clip(z + alpha * dz, lb, ub)
            o = objective(cand)
            take = o < best_obj
            best_obj = jnp.where(take, o, best_obj)
            best_z = jnp.where(take[None, :], cand, best_z)
        z = best_z

    g = _mv4(Quu, z) + Qu
    free = jnp.logical_not(
        ((z <= lb + _EPS) & (g > 0)) | ((z >= ub - _EPS) & (g < 0))
    )
    return z, free


def _make_kernel(n: int, bq_iters: int):
    def kernel(
        ad_ref,  # SMEM (10, 10)
        bd_ref,  # SMEM (10, 4)
        luu_ref,  # SMEM (4, 4)
        bounds_ref,  # SMEM (2, 4): [u_lower; u_upper]
        cx_ref,  # VMEM (N, 10, BT)
        cxx_ref,  # VMEM (N, 10, 10, BT)
        lu_ref,  # VMEM (N, 4, BT)
        us_ref,  # VMEM (N, 4, BT)
        reg_ref,  # VMEM (1, BT)
        kff_ref,  # out (N, 4, BT)
        kt_ref,  # out (N, 10, 4, BT)  — K^T layout (b, c)
        dv_ref,  # out (3, BT): [dV1; dV2; pg]
    ):
        bt = cx_ref.shape[-1]
        dtype = cx_ref.dtype
        reg = reg_ref[0]  # (BT,)

        def stage(t, carry):
            Vx, Vxx, dV1, dV2, pg = carry
            k = n - 1 - t
            cx_k = cx_ref[k]  # (10, BT)
            cxx_k = cxx_ref[k]  # (10, 10, BT)
            lu_k = lu_ref[k]  # (4, BT)
            u_k = us_ref[k]  # (4, BT)

            Wx = Vx + cx_k
            Wxx = Vxx + cxx_k
            eye_nx = jnp.eye(NX, dtype=dtype)[:, :, None]
            WxxR = Wxx + eye_nx * reg[None, None, :]

            # Qx = Ad^T Wx ; Qu = lu + Bd^T Wx
            Qx = _contract_left(ad_ref, Wx, NX, NX)  # (10, BT)
            Qu = lu_k + _contract_left(bd_ref, Wx, NX, NU)  # (4, BT)

            # Qxx = Ad^T Wxx Ad (unregularized value curvature)
            T1 = _contract_left(ad_ref, Wxx, NX, NX)  # (a, j, BT)
            Qxx = _swap01(_contract_left(ad_ref, _swap01(T1), NX, NX))
            # QxxT built: out[b] over a — swap back to (a, b, BT)

            # BtW = Bd^T WxxR : (c, j, BT)
            BtW = _contract_left(bd_ref, WxxR, NX, NU)
            # QuxT[b, c] = sum_j Ad[j, b] BtW[c, j]
            QuxT = _contract_left(ad_ref, _swap01(BtW), NX, NX)  # (b, c, BT)
            # Quu = Bd^T WxxR Bd + luu + reg I
            Quu = _contract_left(bd_ref, _swap01(BtW), NX, NU)  # (c', c, BT)
            Quu = 0.5 * (Quu + _swap01(Quu))
            luu_b = jnp.stack(
                [
                    jnp.stack([jnp.full((bt,), luu_ref[c, d], dtype) for d in range(NU)])
                    for c in range(NU)
                ]
            )  # (4, 4, BT)
            eye_nu = jnp.eye(NU, dtype=dtype)[:, :, None]
            Quu = Quu + luu_b + eye_nu * reg[None, None, :]

            # box QP on the control delta
            lb = jnp.stack(
                [bounds_ref[0, c] - u_k[c] for c in range(NU)], axis=0
            )
            ub = jnp.stack(
                [bounds_ref[1, c] - u_k[c] for c in range(NU)], axis=0
            )
            k_ff, free = _boxqp_lanes(Quu, Qu, lb, ub, bq_iters)
            mf = free.astype(dtype)

            # K^T = -(Qux^T masked) inv(Quu_f):  KT[b, c] = -sum_d QuxT[b,d] mf_d inv[d, c]
            eye_nu4 = jnp.eye(NU, dtype=dtype)[:, :, None]
            Hff = (
                Quu * mf[:, None, :] * mf[None, :, :]
                + eye_nu4 * (1.0 - mf)[:, None, :]
            )
            inv = _inv4_lanes(Hff)
            QuxTm = QuxT * mf[None, :, :]  # mask columns (c index)
            KT = -jnp.stack(
                [
                    jnp.stack(
                        [sum(QuxTm[b, d] * inv[d, c] for d in range(NU)) for c in range(NU)],
                        axis=0,
                    )
                    for b in range(NX)
                ],
                axis=0,
            )  # (10, 4, BT)

            # Vx = Qx + K^T (Quu k + Qu) + Qux^T k
            t_vec = _mv4(Quu, k_ff) + Qu  # (4, BT)
            Vx_new = Qx
            for c in range(NU):
                Vx_new = Vx_new + KT[:, c] * t_vec[c][None, :]
                Vx_new = Vx_new + QuxT[:, c] * k_ff[c][None, :]

            # Vxx = Qxx + K^T Quu K + K^T Qux + Qux^T K
            # M1T[b, d] = sum_c KT[b, c] Quu[c, d]
            M1T = jnp.stack(
                [
                    jnp.stack(
                        [sum(KT[b, c] * Quu[c, d] for c in range(NU)) for d in range(NU)],
                        axis=0,
                    )
                    for b in range(NX)
                ],
                axis=0,
            )  # (10, 4, BT)
            # Vxx = Qxx + K^T Quu K + S + S^T with S = K^T Qux — built row by
            # row (no scatter updates in Mosaic):
            #   row_a[b] = Qxx[a,b] + sum_d M1T[a,d] KT[b,d]   (K^T Quu K)
            #            + sum_c KT[a,c] QuxT[b,c]             (S)
            #            + sum_c QuxT[a,c] KT[b,c]             (S^T)
            rows = []
            for a in range(NX):
                row = Qxx[a]
                for d in range(NU):
                    row = row + M1T[a, d][None, :] * KT[:, d]
                for c in range(NU):
                    row = row + KT[a, c][None, :] * QuxT[:, c]
                    row = row + QuxT[a, c][None, :] * KT[:, c]
                rows.append(row)
            Vxx_new = jnp.stack(rows, axis=0)
            Vxx_new = 0.5 * (Vxx_new + _swap01(Vxx_new))

            # expected-decrease terms + projected gradient
            dV1 = dV1 + sum(k_ff[c] * Qu[c] for c in range(NU))[None, :]
            Hk = _mv4(Quu, k_ff)
            dV2 = dV2 + 0.5 * sum(k_ff[c] * Hk[c] for c in range(NU))[None, :]
            pg_k = jnp.max(jnp.abs(jnp.where(free, Qu, 0.0)), axis=0)[None, :]
            pg = jnp.maximum(pg, pg_k)

            # store outputs at stage k
            kff_ref[k] = k_ff
            kt_ref[k] = KT
            return (Vx_new, Vxx_new, dV1, dV2, pg)

        init = (
            jnp.zeros((NX, bt), dtype=dtype),
            jnp.zeros((NX, NX, bt), dtype=dtype),
            jnp.zeros((1, bt), dtype=dtype),
            jnp.zeros((1, bt), dtype=dtype),
            jnp.zeros((1, bt), dtype=dtype),
        )
        _, _, dV1, dV2, pg = jax.lax.fori_loop(0, n, stage, init)
        dv_ref[0:1] = dV1
        dv_ref[1:2] = dV2
        dv_ref[2:3] = pg

    return kernel


@functools.partial(jax.jit, static_argnames=("bq_iters", "block_b", "interpret"))
def riccati_backward_batched(
    Ad, Bd, luu, u_lower, u_upper, cx, cxx, lu, us, reg,
    bq_iters: int = 4, block_b: int = 128, interpret: bool = False,
):
    """Batch-first interface to the fused sweep.

    Args: Ad (10,10), Bd (10,4), luu (4,4), bounds (4,), cx (B,N,10),
    cxx (B,N,10,10), lu (B,N,4), us (B,N,4), reg (B,).
    Returns kff (B,N,4), K (B,N,4,10), dV1 (B,), dV2 (B,), pg (B,).
    """
    b, n = cx.shape[0], cx.shape[1]
    dtype = cx.dtype
    bt = min(block_b, max(b, 1))
    pad = (-b) % bt
    if pad:
        padf = lambda a: jnp.pad(a, [(0, pad)] + [(0, 0)] * (a.ndim - 1))
        cx, cxx, lu, us, reg = map(padf, (cx, cxx, lu, us, reg))
    bp = b + pad

    # transpose to batch-last
    cx_t = jnp.moveaxis(cx, 0, -1)  # (N,10,B)
    cxx_t = jnp.moveaxis(cxx, 0, -1)  # (N,10,10,B)
    lu_t = jnp.moveaxis(lu, 0, -1)  # (N,4,B)
    us_t = jnp.moveaxis(us, 0, -1)  # (N,4,B)
    reg_t = reg[None, :]  # (1,B)
    bounds = jnp.stack([u_lower, u_upper], axis=0)  # (2,4)

    grid = (bp // bt,)
    lane_spec = lambda *lead: pl.BlockSpec(
        lead + (bt,), lambda i: tuple(0 for _ in lead) + (i,), memory_space=pltpu.VMEM
    )
    smem = pl.BlockSpec(memory_space=pltpu.SMEM)

    kff_t, kt_t, dv = pl.pallas_call(
        _make_kernel(n, bq_iters),
        grid=grid,
        in_specs=[
            smem, smem, smem, smem,
            lane_spec(n, NX),
            lane_spec(n, NX, NX),
            lane_spec(n, NU),
            lane_spec(n, NU),
            lane_spec(1),
        ],
        out_specs=[
            lane_spec(n, NU),
            lane_spec(n, NX, NU),
            lane_spec(3),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n, NU, bp), dtype),
            jax.ShapeDtypeStruct((n, NX, NU, bp), dtype),
            jax.ShapeDtypeStruct((3, bp), dtype),
        ],
        interpret=interpret,
    )(Ad, Bd, luu, bounds, cx_t, cxx_t, lu_t, us_t, reg_t)

    kff = jnp.moveaxis(kff_t, -1, 0)[:b]  # (B,N,4)
    K = jnp.moveaxis(jnp.swapaxes(kt_t, 1, 2), -1, 0)[:b]  # (B,N,4,10)
    dV1, dV2, pg = dv[0, :b], dv[1, :b], dv[2, :b]
    return kff, K, dV1, dV2, pg
