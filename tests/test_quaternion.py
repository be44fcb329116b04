"""Quaternion/rotation round-trips — the counterpart of the reference's only
gtest suite (uav_utils_test.cpp:10-50)."""

import jax.numpy as jnp
import numpy as np
from scipy.spatial.transform import Rotation

from avoid_mpc_tpu.utils.quaternion import (
    quat_conjugate,
    quat_integrate,
    quat_multiply,
    quat_rotate,
    quat_to_rotmat,
    rotmat_to_quat,
    rotmat_to_ypr,
    skew,
    vee,
    yaw_from_quat,
    ypr_to_rotmat,
)


def rand_quats(n, seed=0):
    rng = np.random.default_rng(seed)
    q = rng.standard_normal((n, 4))
    return q / np.linalg.norm(q, axis=1, keepdims=True)


def test_quat_to_rotmat_matches_scipy():
    qs = rand_quats(50)
    R = np.asarray(quat_to_rotmat(jnp.asarray(qs)))
    want = Rotation.from_quat(qs[:, [1, 2, 3, 0]]).as_matrix()  # scipy xyzw
    np.testing.assert_allclose(R, want, atol=1e-12)


def test_rotmat_quat_roundtrip():
    qs = rand_quats(100, seed=1)
    q2 = np.asarray(rotmat_to_quat(quat_to_rotmat(jnp.asarray(qs))))
    # q and -q are the same rotation
    sign = np.sign(np.sum(q2 * qs, axis=1, keepdims=True))
    np.testing.assert_allclose(q2 * sign, qs, atol=1e-7)


def test_multiply_matches_scipy():
    qa, qb = rand_quats(20, 2), rand_quats(20, 3)
    got = np.asarray(quat_multiply(jnp.asarray(qa), jnp.asarray(qb)))
    ra = Rotation.from_quat(qa[:, [1, 2, 3, 0]])
    rb = Rotation.from_quat(qb[:, [1, 2, 3, 0]])
    want = (ra * rb).as_quat()[:, [3, 0, 1, 2]]
    sign = np.sign(np.sum(got * want, axis=1, keepdims=True))
    np.testing.assert_allclose(got * sign, want, atol=1e-12)


def test_rotate_matches_rotmat():
    qs = rand_quats(10, 4)
    v = np.random.default_rng(5).standard_normal((10, 3))
    got = np.asarray(quat_rotate(jnp.asarray(qs), jnp.asarray(v)))
    want = np.einsum("nij,nj->ni", np.asarray(quat_to_rotmat(jnp.asarray(qs))), v)
    np.testing.assert_allclose(got, want, atol=1e-12)


def test_yaw_extraction():
    for yaw in [-2.5, -0.3, 0.0, 1.2, 3.0]:
        q = Rotation.from_euler("ZYX", [yaw, 0.2, -0.1]).as_quat()[[3, 0, 1, 2]]
        got = float(yaw_from_quat(jnp.asarray(q)))
        np.testing.assert_allclose(got, yaw, atol=1e-12)


def test_ypr_roundtrip():
    yaw, pitch, roll = 0.7, -0.3, 0.4
    R = ypr_to_rotmat(jnp.asarray(yaw), jnp.asarray(pitch), jnp.asarray(roll))
    want = Rotation.from_euler("ZYX", [yaw, pitch, roll]).as_matrix()
    np.testing.assert_allclose(np.asarray(R), want, atol=1e-12)
    y2, p2, r2 = rotmat_to_ypr(R)
    np.testing.assert_allclose([float(y2), float(p2), float(r2)], [yaw, pitch, roll], atol=1e-12)


def test_skew_vee_roundtrip():
    v = jnp.asarray([0.3, -0.5, 0.9])
    np.testing.assert_allclose(np.asarray(vee(skew(v))), np.asarray(v))
    # skew(v) @ w == v x w
    w = jnp.asarray([1.0, 2.0, -1.0])
    np.testing.assert_allclose(
        np.asarray(skew(v) @ w), np.cross(np.asarray(v), np.asarray(w)), atol=1e-12
    )


def test_quat_integrate_constant_rate():
    """Integrating a constant body yaw rate must advance yaw by w*t."""
    q = jnp.asarray([1.0, 0, 0, 0])
    w = jnp.asarray([0.0, 0.0, 1.5])
    for _ in range(100):
        q = quat_integrate(q, w, 0.01)
    np.testing.assert_allclose(float(yaw_from_quat(q)), 1.5, atol=1e-9)


def test_conjugate_inverse():
    q = jnp.asarray(rand_quats(1, 7)[0])
    qq = quat_multiply(q, quat_conjugate(q))
    np.testing.assert_allclose(np.asarray(qq), [1, 0, 0, 0], atol=1e-12)


def test_compose_tf_rigid_inverse():
    """FMA-chain pose compose/inverse == matrix products (f64 oracle)."""
    from scipy.spatial.transform import Rotation

    from avoid_mpc_tpu.utils.quaternion import compose_tf, rigid_inverse

    rng = np.random.default_rng(11)
    for _ in range(5):
        Ta = np.eye(4)
        Ta[:3, :3] = Rotation.from_quat(rng.standard_normal(4)).as_matrix()
        Ta[:3, 3] = rng.uniform(-150, 150, 3)  # world-scale translation
        Tb = np.eye(4)
        Tb[:3, :3] = Rotation.from_quat(rng.standard_normal(4)).as_matrix()
        Tb[:3, 3] = rng.uniform(-1, 1, 3)
        got = np.asarray(compose_tf(jnp.asarray(Ta), jnp.asarray(Tb)))
        np.testing.assert_allclose(got, Ta @ Tb, atol=1e-9)
        inv = np.asarray(rigid_inverse(jnp.asarray(Ta)))
        np.testing.assert_allclose(inv, np.linalg.inv(Ta), atol=1e-9)
        # batched leading axis
        batch = jnp.stack([jnp.asarray(Ta)] * 3)
        gotb = np.asarray(compose_tf(batch, jnp.asarray(Tb)))
        np.testing.assert_allclose(gotb[1], Ta @ Tb, atol=1e-9)
