"""Fused masked top-k nearest-neighbor Pallas kernel (batch-in-lanes).

The XLA k-NN (ops/knn.py) spends its time in layout shuffles and top_k
dispatch for what is arithmetically trivial work.  This kernel puts the
**scenario batch in the lane dimension**: arrays arrive dim-major
(``points (3, P, B)``, ``queries (3, Q, B)``) so that every slice the kernel
touches is a contiguous (rows, lanes) tile:

- for each query q: d2 = sum_dim (points[dim] - queries[dim, q])^2 — three
  (chunk, BT) FMAs against a lane-broadcast scalar vector, exact f32 on the
  VPU (the difference form; the norm-expansion matmul is forbidden, see
  ops/knn.py),
- top-k per query via k passes of [sublane-min -> first-argmin via iota
  trick -> mask-out], merged into per-query sorted best lists in VMEM
  scratch across point chunks,
- returns distances + global indices; coordinate gathering happens outside
  (one XLA take_along_axis).

Grid = (B_tiles, point_chunks), chunks innermost so the scratch best-lists
persist per batch tile.
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


def _make_kernel(k: int, q: int, chunk: int, bt: int):
    def kernel(q_ref, p_ref, m_ref, dist_ref, idx_ref, best_d_ref, best_i_ref):
        ci = pl.program_id(1)
        n_chunks = pl.num_programs(1)

        @pl.when(ci == 0)
        def _():
            best_d_ref[:] = jnp.full((q, k, bt), _BIG, jnp.float32)
            best_i_ref[:] = jnp.zeros((q, k, bt), jnp.int32)

        row = jax.lax.broadcasted_iota(jnp.int32, (chunk, bt), 0)
        offset = ci * chunk
        valid = m_ref[:] != 0  # (chunk, bt)
        px = p_ref[0]
        py = p_ref[1]
        pz = p_ref[2]

        for qi in range(q):
            dx = px - q_ref[0, qi][None, :]
            dy = py - q_ref[1, qi][None, :]
            dz = pz - q_ref[2, qi][None, :]
            d2 = dx * dx + dy * dy + dz * dz
            d2 = jnp.where(valid, d2, _BIG)

            for _pass in range(k):
                col_min = jnp.min(d2, axis=0)  # (bt,)
                amin = jnp.min(
                    jnp.where(d2 <= col_min[None, :], row, jnp.int32(2**30)), axis=0
                )  # first row achieving the min, (bt,)
                cand_d = col_min
                cand_i = amin + offset
                # lane-wise sorted insertion into the best list (no scatter,
                # no zero-width slices — Mosaic constraints)
                bd = best_d_ref[qi]  # (k, bt)
                bi = best_i_ref[qi]
                rows_d, rows_i = [], []
                carry_d, carry_i = cand_d, cand_i
                for slot in range(k):
                    old_d, old_i = bd[slot], bi[slot]
                    take = carry_d < old_d
                    rows_d.append(jnp.where(take, carry_d, old_d)[None, :])
                    rows_i.append(jnp.where(take, carry_i, old_i)[None, :])
                    carry_d = jnp.where(take, old_d, carry_d)
                    carry_i = jnp.where(take, old_i, carry_i)
                best_d_ref[qi] = jnp.concatenate(rows_d, axis=0)
                best_i_ref[qi] = jnp.concatenate(rows_i, axis=0)
                d2 = jnp.where(row == amin[None, :], _BIG, d2)

        @pl.when(ci == n_chunks - 1)
        def _():
            dist_ref[:] = best_d_ref[:]
            idx_ref[:] = best_i_ref[:]

    return kernel


@functools.partial(jax.jit, static_argnames=("k", "chunk", "block_b", "interpret"))
def knn_pallas_batched(
    queries: jax.Array,  # (B, Q, 3)
    points: jax.Array,  # (B, P, 3)
    mask: jax.Array,  # (B, P) bool
    k: int = 3,
    chunk: int = 512,
    block_b: int = 128,
    interpret: bool = False,
):
    """Batched masked k-NN. Returns (dists (B,Q,k), pts (B,Q,k,3)) with the
    same semantics as vmapped ops.knn.knn (inf distances + FAR_SENTINEL
    coordinates where fewer than k valid points exist)."""
    from avoid_mpc_tpu.ops.knn import FAR_SENTINEL

    b, q, _ = queries.shape
    p = points.shape[1]
    chunk = min(chunk, _round_up(p, 128))
    p_pad = _round_up(p, chunk)
    bt = min(block_b, _round_up(max(b, 1), 128))
    b_pad = _round_up(b, bt)

    # dim-major, batch-last
    qf = jnp.pad(
        jnp.moveaxis(queries.astype(jnp.float32), 0, -1),  # (Q, 3, B) -> wait
        ((0, 0), (0, 0), (0, b_pad - b)),
    )
    qf = jnp.swapaxes(qf, 0, 1)  # (3, Q, B)
    pf = jnp.swapaxes(
        jnp.pad(
            jnp.moveaxis(points.astype(jnp.float32), 0, -1),
            ((0, p_pad - p), (0, 0), (0, b_pad - b)),
        ),
        0, 1,
    )  # (3, P, B)
    mi = jnp.pad(
        jnp.moveaxis(mask.astype(jnp.int32), 0, -1), ((0, p_pad - p), (0, b_pad - b))
    )  # (P, B)

    grid = (b_pad // bt, p_pad // chunk)
    dists2_t, idx_t = pl.pallas_call(
        _make_kernel(k, q, chunk, bt),
        grid=grid,
        in_specs=[
            pl.BlockSpec((3, q, bt), lambda i, c: (0, 0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((3, chunk, bt), lambda i, c: (0, c, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((chunk, bt), lambda i, c: (c, i), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((q, k, bt), lambda i, c: (0, 0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((q, k, bt), lambda i, c: (0, 0, i), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((q, k, b_pad), jnp.float32),
            jax.ShapeDtypeStruct((q, k, b_pad), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((q, k, bt), jnp.float32),
            pltpu.VMEM((q, k, bt), jnp.int32),
        ],
        interpret=interpret,
    )(qf, pf, mi)

    dists2 = jnp.moveaxis(dists2_t, -1, 0)[:b]  # (B, Q, k)
    idx = jnp.moveaxis(idx_t, -1, 0)[:b]
    found = dists2 < _BIG * 0.5
    idx = jnp.clip(idx, 0, p - 1)
    dists = jnp.sqrt(jnp.where(found, dists2, jnp.inf)).astype(queries.dtype)
    flat_idx = idx.reshape(b, q * k)[..., None].astype(jnp.int32)  # (B, Q*k, 1)
    pts = jnp.take_along_axis(points, flat_idx, axis=1).reshape(b, q, k, 3)
    pts = jnp.where(found[..., None], pts, jnp.asarray(FAR_SENTINEL, queries.dtype))
    return dists, pts
