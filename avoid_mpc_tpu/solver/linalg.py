"""Closed-form small-matrix linear algebra for the solver hot path.

``jnp.linalg.solve`` lowers tiny systems to pivoted LU — scalar-heavy code
that serializes badly on TPU when it sits inside a double scan (stage loop x
solver iterations) over a 4096-scenario batch.  The control dimension is 4,
so the per-stage QP systems get a branch-free cofactor (adjugate) inverse:
~70 fused multiply-adds, fully vectorized over any batch shape, no pivoting
(the solver regularizes these matrices SPD).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def inv4(H: jax.Array) -> jax.Array:
    """Closed-form inverse of a (well-conditioned) 4x4, batched over leading
    dims. Cofactor expansion — branch-free, elementwise over the batch."""
    m = H
    a00, a01, a02, a03 = m[..., 0, 0], m[..., 0, 1], m[..., 0, 2], m[..., 0, 3]
    a10, a11, a12, a13 = m[..., 1, 0], m[..., 1, 1], m[..., 1, 2], m[..., 1, 3]
    a20, a21, a22, a23 = m[..., 2, 0], m[..., 2, 1], m[..., 2, 2], m[..., 2, 3]
    a30, a31, a32, a33 = m[..., 3, 0], m[..., 3, 1], m[..., 3, 2], m[..., 3, 3]

    # 2x2 sub-determinants of the lower two rows (shared by all cofactors)
    s0 = a20 * a31 - a21 * a30
    s1 = a20 * a32 - a22 * a30
    s2 = a20 * a33 - a23 * a30
    s3 = a21 * a32 - a22 * a31
    s4 = a21 * a33 - a23 * a31
    s5 = a22 * a33 - a23 * a32
    # and of the upper two rows
    c0 = a00 * a11 - a01 * a10
    c1 = a00 * a12 - a02 * a10
    c2 = a00 * a13 - a03 * a10
    c3 = a01 * a12 - a02 * a11
    c4 = a01 * a13 - a03 * a11
    c5 = a02 * a13 - a03 * a12

    det = c0 * s5 - c1 * s4 + c2 * s3 + c3 * s2 - c4 * s1 + c5 * s0
    rdet = 1.0 / det

    b = jnp.stack(
        [
            a11 * s5 - a12 * s4 + a13 * s3,
            -a01 * s5 + a02 * s4 - a03 * s3,
            a31 * c5 - a32 * c4 + a33 * c3,
            -a21 * c5 + a22 * c4 - a23 * c3,
            -a10 * s5 + a12 * s2 - a13 * s1,
            a00 * s5 - a02 * s2 + a03 * s1,
            -a30 * c5 + a32 * c2 - a33 * c1,
            a20 * c5 - a22 * c2 + a23 * c1,
            a10 * s4 - a11 * s2 + a13 * s0,
            -a00 * s4 + a01 * s2 - a03 * s0,
            a30 * c4 - a31 * c2 + a33 * c0,
            -a20 * c4 + a21 * c2 - a23 * c0,
            -a10 * s3 + a11 * s1 - a12 * s0,
            a00 * s3 - a01 * s1 + a02 * s0,
            -a30 * c3 + a31 * c1 - a32 * c0,
            a20 * c3 - a21 * c1 + a22 * c0,
        ],
        axis=-1,
    )
    return (b * rdet[..., None]).reshape(m.shape)


def solve4(H: jax.Array, b: jax.Array) -> jax.Array:
    """H^{-1} b for 4x4 H, batched. b: (..., 4)."""
    return jnp.einsum("...ij,...j->...i", inv4(H), b)


def solve4_mat(H: jax.Array, B: jax.Array) -> jax.Array:
    """H^{-1} B for 4x4 H and (..., 4, m) B, batched."""
    return inv4(H) @ B
