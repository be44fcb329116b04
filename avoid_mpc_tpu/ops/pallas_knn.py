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
- the winner's COORDINATES ride along with its distance through the sorted
  insertion (extracted with an exact masked sum over the argmin row — f32
  zeros + one selected value, no rounding), so the kernel emits (dists,
  coords) directly.  Round-2 returned indices and gathered outside; the
  XLA take_along_axis + its layout copies cost ~2.5 ms/step at the
  flagship batch (device trace), ~4x the kernel itself.

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
    def kernel(
        q_ref, p_ref, m_ref, dist_ref, crd_ref, best_d_ref, best_c_ref
    ):
        ci = pl.program_id(1)
        n_chunks = pl.num_programs(1)

        @pl.when(ci == 0)
        def _():
            best_d_ref[:] = jnp.full((q, k, bt), _BIG, jnp.float32)
            best_c_ref[:] = jnp.zeros((3, q, k, bt), jnp.float32)

        row = jax.lax.broadcasted_iota(jnp.int32, (chunk, bt), 0)
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
                sel = row == amin[None, :]  # exactly one row per lane
                cand_d = col_min
                # winner coordinates: masked sum = f32 zeros + the one
                # selected value, exact (no one-hot matmul — that would
                # round coordinates to bf16 on the MXU)
                cand_x = jnp.sum(jnp.where(sel, px, 0.0), axis=0)
                cand_y = jnp.sum(jnp.where(sel, py, 0.0), axis=0)
                cand_z = jnp.sum(jnp.where(sel, pz, 0.0), axis=0)
                # lane-wise sorted insertion into the best list (no scatter,
                # no zero-width slices — Mosaic constraints)
                bd = best_d_ref[qi]  # (k, bt)
                rows_d = []
                rows_c = [[], [], []]
                carry_d = cand_d
                carry_c = [cand_x, cand_y, cand_z]
                for slot in range(k):
                    old_d = bd[slot]
                    take = carry_d < old_d
                    rows_d.append(jnp.where(take, carry_d, old_d)[None, :])
                    for d in range(3):
                        old_c = best_c_ref[d, qi, slot]
                        rows_c[d].append(
                            jnp.where(take, carry_c[d], old_c)[None, :]
                        )
                        carry_c[d] = jnp.where(take, old_c, carry_c[d])
                    carry_d = jnp.where(take, old_d, carry_d)
                best_d_ref[qi] = jnp.concatenate(rows_d, axis=0)
                for d in range(3):
                    best_c_ref[d, qi] = jnp.concatenate(rows_c[d], axis=0)
                d2 = jnp.where(sel, _BIG, d2)

        @pl.when(ci == n_chunks - 1)
        def _():
            dist_ref[:] = best_d_ref[:]
            crd_ref[:] = best_c_ref[:]

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
    dists2_t, coords_t = pl.pallas_call(
        _make_kernel(k, q, chunk, bt),
        grid=grid,
        in_specs=[
            pl.BlockSpec((3, q, bt), lambda i, c: (0, 0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((3, chunk, bt), lambda i, c: (0, c, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((chunk, bt), lambda i, c: (c, i), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((q, k, bt), lambda i, c: (0, 0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (3, q, k, bt), lambda i, c: (0, 0, 0, i), memory_space=pltpu.VMEM
            ),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((q, k, b_pad), jnp.float32),
            jax.ShapeDtypeStruct((3, q, k, b_pad), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((q, k, bt), jnp.float32),
            pltpu.VMEM((3, q, k, bt), jnp.float32),
        ],
        # map-maintenance queries (dedupe/prune) run Q = points-per-frame
        # (3072 in the campaign worlds): the query block + outputs + scratch
        # total ~16.5 MB, just over Mosaic's 16 MB default scoped-VMEM limit
        # (v5e has 128 MB physical)
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=64 * 2**20),
        interpret=interpret,
    )(qf, pf, mi)

    dists2 = jnp.moveaxis(dists2_t, -1, 0)[:b]  # (B, Q, k)
    found = dists2 < _BIG * 0.5
    dists = jnp.sqrt(jnp.where(found, dists2, jnp.inf)).astype(queries.dtype)
    pts = jnp.moveaxis(coords_t, (0, 3), (3, 0))[:b]  # (B, Q, k, 3)
    pts = jnp.where(
        found[..., None],
        pts.astype(queries.dtype),
        jnp.asarray(FAR_SENTINEL, queries.dtype),
    )
    return dists, pts
