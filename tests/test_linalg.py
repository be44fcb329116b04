"""Closed-form 4x4 inverse vs jnp.linalg."""

import jax.numpy as jnp
import numpy as np

from avoid_mpc_tpu.solver.linalg import inv4, solve4, solve4_mat


def test_inv4_matches_numpy():
    rng = np.random.default_rng(0)
    for _ in range(20):
        A = rng.standard_normal((4, 4))
        H = A @ A.T + 0.1 * np.eye(4)  # SPD
        got = np.asarray(inv4(jnp.asarray(H)))
        np.testing.assert_allclose(got, np.linalg.inv(H), rtol=1e-9, atol=1e-10)


def test_inv4_batched():
    rng = np.random.default_rng(1)
    A = rng.standard_normal((7, 3, 4, 4))
    H = A @ np.swapaxes(A, -1, -2) + 0.5 * np.eye(4)
    got = np.asarray(inv4(jnp.asarray(H)))
    np.testing.assert_allclose(got, np.linalg.inv(H), rtol=1e-8, atol=1e-10)


def test_solve4():
    rng = np.random.default_rng(2)
    A = rng.standard_normal((4, 4))
    H = A @ A.T + np.eye(4)
    b = rng.standard_normal(4)
    np.testing.assert_allclose(
        np.asarray(solve4(jnp.asarray(H), jnp.asarray(b))), np.linalg.solve(H, b), rtol=1e-9
    )
    B = rng.standard_normal((4, 10))
    np.testing.assert_allclose(
        np.asarray(solve4_mat(jnp.asarray(H), jnp.asarray(B))), np.linalg.solve(H, B), rtol=1e-9
    )
