"""Fused masked top-k nearest-neighbor Pallas kernel.

The XLA k-NN (ops/knn.py) spends its time in layout shuffles and top_k
dispatch for what is arithmetically trivial work.  This kernel computes, per
scenario, the full masked distance tile and extracts the top-k with
iterative min+mask passes, VMEM-resident:

- queries in sublanes, points in lanes: d2 (Q, P) built from three
  (Q,1)-(1,P) broadcasted differences — exact f32 on the VPU (the difference
  form; see ops/knn.py for why the norm-expansion matmul is forbidden),
- k passes of [row-min -> first-argmin via iota trick -> mask-out] per point
  chunk, merged into a running (Q, k) best list across chunks,
- returns distances + global indices; coordinate gathering happens outside
  (one XLA take_along_axis).

Grid = (B, num_point_chunks); the running best lives in VMEM scratch and is
finalized on the last chunk.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_BIG = 3.0e38  # python float: jnp constants would be captured tracers in the kernel


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _make_kernel(k: int, q_pad: int, chunk: int, group: int):
    """One program handles `group` scenarios (amortizes grid/DMA overhead
    over many tiny per-scenario tiles)."""

    def kernel(q_ref, p_ref, m_ref, dist_ref, idx_ref, best_d_ref, best_i_ref):
        ci = pl.program_id(1)
        n_chunks = pl.num_programs(1)

        @pl.when(ci == 0)
        def _():
            best_d_ref[:] = jnp.full((group, q_pad, k), _BIG, jnp.float32)
            best_i_ref[:] = jnp.zeros((group, q_pad, k), jnp.int32)

        lane = jax.lax.broadcasted_iota(jnp.int32, (q_pad, chunk), 1)
        offset = ci * chunk

        for g in range(group):
            # masked squared distances for this chunk: (Q, C)
            d2 = jnp.zeros((q_pad, chunk), jnp.float32)
            for dim in range(3):
                diff = q_ref[g, :, dim][:, None] - p_ref[g, :, dim][None, :]
                d2 = d2 + diff * diff
            valid = m_ref[g, 0] != 0
            d2 = jnp.where(valid[None, :], d2, _BIG)

            # merge the chunk into the running best via k extract-min passes
            for j in range(k):
                row_min = jnp.min(d2, axis=1, keepdims=True)  # (Q,1)
                amin = jnp.min(
                    jnp.where(d2 <= row_min, lane, jnp.int32(2**30)),
                    axis=1, keepdims=True,
                )  # first index achieving the min
                cand_d = row_min[:, 0]
                cand_i = amin[:, 0] + offset
                # insert into the sorted best lists: walk the slots carrying
                # the displaced entry (no zero-width slices in Mosaic)
                bd = best_d_ref[g]
                bi = best_i_ref[g]
                cols_d, cols_i = [], []
                carry_d, carry_i = cand_d, cand_i
                for slot in range(k):
                    old_d, old_i = bd[:, slot], bi[:, slot]
                    take = carry_d < old_d
                    cols_d.append(jnp.where(take, carry_d, old_d)[:, None])
                    cols_i.append(jnp.where(take, carry_i, old_i)[:, None])
                    carry_d = jnp.where(take, old_d, carry_d)
                    carry_i = jnp.where(take, old_i, carry_i)
                best_d_ref[g] = jnp.concatenate(cols_d, axis=1)
                best_i_ref[g] = jnp.concatenate(cols_i, axis=1)
                # remove the extracted candidate from this chunk's tile
                d2 = jnp.where(lane == amin, _BIG, d2)

        @pl.when(ci == n_chunks - 1)
        def _():
            dist_ref[:] = best_d_ref[:]
            idx_ref[:] = best_i_ref[:]

    return kernel


@functools.partial(jax.jit, static_argnames=("k", "chunk", "group", "interpret"))
def knn_pallas_batched(
    queries: jax.Array,  # (B, Q, 3)
    points: jax.Array,  # (B, P, 3)
    mask: jax.Array,  # (B, P) bool
    k: int = 3,
    chunk: int = 2048,
    group: int = 8,
    interpret: bool = False,
):
    """Batched masked k-NN. Returns (dists (B,Q,k), pts (B,Q,k,3)) with the
    same semantics as vmapped ops.knn.knn (inf distances + FAR_SENTINEL
    coordinates where fewer than k valid points exist)."""
    from avoid_mpc_tpu.ops.knn import FAR_SENTINEL

    b, q, _ = queries.shape
    p = points.shape[1]
    q_pad = _round_up(max(q, 8), 8)
    chunk = min(chunk, _round_up(p, 128))
    p_pad = _round_up(p, chunk)
    group = min(group, max(b, 1))
    b_pad = _round_up(b, group)

    qf = jnp.pad(
        queries.astype(jnp.float32), ((0, b_pad - b), (0, q_pad - q), (0, 0))
    )
    pf = jnp.pad(
        points.astype(jnp.float32), ((0, b_pad - b), (0, p_pad - p), (0, 0))
    )
    # (B, 1, P): keeps the mask's last-two block dims tile-legal
    mi = jnp.pad(mask.astype(jnp.int32), ((0, b_pad - b), (0, p_pad - p)))[:, None, :]

    grid = (b_pad // group, p_pad // chunk)
    dists2, idx = pl.pallas_call(
        _make_kernel(k, q_pad, chunk, group),
        grid=grid,
        in_specs=[
            pl.BlockSpec((group, q_pad, 3), lambda i, c: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((group, chunk, 3), lambda i, c: (i, c, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((group, 1, chunk), lambda i, c: (i, 0, c), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((group, q_pad, k), lambda i, c: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((group, q_pad, k), lambda i, c: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b_pad, q_pad, k), jnp.float32),
            jax.ShapeDtypeStruct((b_pad, q_pad, k), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((group, q_pad, k), jnp.float32),
            pltpu.VMEM((group, q_pad, k), jnp.int32),
        ],
        interpret=interpret,
    )(qf, pf, mi)
    dists2 = dists2[:b]
    idx = idx[:b]

    dists2 = dists2[:, :q]
    idx = jnp.clip(idx[:, :q], 0, p - 1)
    found = dists2 < _BIG * 0.5
    dists = jnp.sqrt(jnp.where(found, dists2, jnp.inf)).astype(queries.dtype)
    flat_idx = idx.reshape(b, q * k)[..., None].astype(jnp.int32)  # (B, Q*k, 1)
    pts = jnp.take_along_axis(points, flat_idx, axis=1).reshape(b, q, k, 3)
    pts = jnp.where(found[..., None], pts, jnp.asarray(FAR_SENTINEL, queries.dtype))
    return dists, pts
