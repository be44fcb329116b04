"""Pallas k-NN kernel vs the XLA reference (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from avoid_mpc_tpu.ops.knn import knn
from avoid_mpc_tpu.ops.pallas_knn import knn_pallas_batched

pytestmark = pytest.mark.slow  # interpret-mode kernels: minutes on CPU


def ref_knn(queries, points, mask, k):
    return jax.vmap(lambda q, p, m: knn(q, p, m, k))(queries, points, mask)


def test_matches_xla_knn():
    rng = np.random.default_rng(0)
    B, Q, P = 3, 20, 512
    queries = jnp.asarray(rng.standard_normal((B, Q, 3)) * 5, jnp.float32)
    points = jnp.asarray(rng.standard_normal((B, P, 3)) * 5, jnp.float32)
    mask = jnp.asarray(rng.random((B, P)) > 0.3)
    d_p, p_p = knn_pallas_batched(queries, points, mask, k=3, chunk=256, interpret=True)
    d_r, p_r = ref_knn(queries, points, mask, 3)
    np.testing.assert_allclose(np.asarray(d_p), np.asarray(d_r), rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(p_p), np.asarray(p_r), rtol=1e-6, atol=1e-6)


def test_unaligned_sizes_and_padding():
    rng = np.random.default_rng(1)
    B, Q, P = 2, 13, 300  # neither aligned
    queries = jnp.asarray(rng.standard_normal((B, Q, 3)), jnp.float32)
    points = jnp.asarray(rng.standard_normal((B, P, 3)), jnp.float32)
    mask = jnp.ones((B, P), bool)
    d_p, p_p = knn_pallas_batched(queries, points, mask, k=3, chunk=128, interpret=True)
    d_r, p_r = ref_knn(queries, points, mask, 3)
    np.testing.assert_allclose(np.asarray(d_p), np.asarray(d_r), rtol=1e-5, atol=1e-5)


def test_few_valid_points_sentinel():
    B, Q, P = 1, 4, 128
    points = jnp.zeros((B, P, 3), jnp.float32).at[0, 0].set(
        jnp.asarray([1.0, 2, 3], jnp.float32)
    )
    mask = jnp.zeros((B, P), bool).at[0, 0].set(True)
    queries = jnp.zeros((B, Q, 3), jnp.float32)
    d, p = knn_pallas_batched(queries, points, mask, k=3, chunk=128, interpret=True)
    d = np.asarray(d)
    assert np.isfinite(d[:, :, 0]).all() and np.isinf(d[:, :, 1:]).all()
    np.testing.assert_allclose(np.asarray(p)[0, 0, 0], [1, 2, 3])
    np.testing.assert_allclose(np.asarray(p)[0, :, 1:], 1e4)


def test_empty_map():
    d, p = knn_pallas_batched(
        jnp.zeros((2, 5, 3), jnp.float32), jnp.zeros((2, 256, 3), jnp.float32),
        jnp.zeros((2, 256), bool), k=3, chunk=128, interpret=True,
    )
    assert np.isinf(np.asarray(d)).all()
    np.testing.assert_allclose(np.asarray(p), 1e4)
