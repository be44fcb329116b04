"""frame_assist (tf_assist role) and stream_stats (topic_statistics role)."""

import math

import jax.numpy as jnp
import numpy as np
from scipy.spatial.transform import Rotation

from avoid_mpc_tpu.utils.frame_assist import (
    Odom,
    body_tf,
    constant_odom_stream,
    convert_odom,
    odom_to_euler_deg,
)
from avoid_mpc_tpu.utils.stream_stats import StreamStats


def test_convert_odom_matches_scipy():
    rng = np.random.default_rng(3)
    R = Rotation.from_euler("zyx", [0.4, -0.2, 0.7])
    t = np.asarray([1.0, -2.0, 0.5])
    p = rng.standard_normal(3)
    v = rng.standard_normal(3)
    q_att = Rotation.from_euler("zyx", [0.1, 0.2, -0.3])
    q_wxyz = np.roll(q_att.as_quat(), 1)  # xyzw -> wxyz
    out = convert_odom(
        Odom(jnp.asarray(p), jnp.asarray(v), jnp.asarray(q_wxyz)),
        jnp.asarray(R.as_matrix()), jnp.asarray(t),
    )
    np.testing.assert_allclose(np.asarray(out.p), R.apply(p) + t, atol=1e-6)
    np.testing.assert_allclose(np.asarray(out.v), R.apply(v), atol=1e-6)
    got = Rotation.from_quat(np.roll(np.asarray(out.q), -1))  # wxyz -> xyzw
    want = R * q_att
    np.testing.assert_allclose(
        got.as_matrix(), want.as_matrix(), atol=1e-6
    )
    # identity transform is a no-op
    out_id = convert_odom(
        Odom(jnp.asarray(p), jnp.asarray(v), jnp.asarray(q_wxyz)),
        jnp.eye(3), jnp.zeros(3),
    )
    np.testing.assert_allclose(np.asarray(out_id.p), p, atol=1e-7)
    R_wb, t_wb = body_tf(out)
    np.testing.assert_allclose(np.asarray(R_wb), want.as_matrix(), atol=1e-6)


def test_odom_to_euler_deg_matches_scipy():
    rng = np.random.default_rng(7)
    for _ in range(5):
        rot = Rotation.from_quat(rng.standard_normal(4))  # normalizes
        q_wxyz = np.roll(rot.as_quat(), 1)
        got = np.asarray(odom_to_euler_deg(jnp.asarray(q_wxyz)))
        yaw, pitch, roll = rot.as_euler("ZYX")  # intrinsic zyx == tf 'rzyx'
        want = np.rad2deg([roll, pitch, yaw])  # packed x=roll y=pitch z=yaw
        np.testing.assert_allclose(got, want, atol=1e-5)


def test_constant_odom_stream_send_odom_semantics():
    samples = constant_odom_stream(5, rate_hz=1.0, stamp_offset_s=0.2)
    assert len(samples) == 5
    for k, (odom, stamp) in enumerate(samples):
        np.testing.assert_allclose(np.asarray(odom.p), 0.0)
        np.testing.assert_allclose(np.asarray(odom.q), [1, 0, 0, 0])
        assert abs(stamp - (k - 0.2)) < 1e-12  # lags wall time by 0.2 s
    # identity attitude -> zero euler vector
    np.testing.assert_allclose(
        np.asarray(odom_to_euler_deg(samples[0][0].q)), 0.0, atol=1e-7
    )


def test_stream_stats_rate_jitter_age():
    s = StreamStats("odom")
    t = 100.0
    count = 0
    # 50 Hz stream polled at 100 Hz for 2 s
    for k in range(200):
        t += 0.01
        if k % 2 == 1:
            count += 1
        s.update(count, now=t)
    assert abs(s.rate_hz() - 50.0) < 1.0, s.rate_hz()
    assert s.jitter_s() < 1e-6  # perfectly regular
    assert s.age_s(now=t) <= 0.02 + 1e-9
    # stream stops -> age grows, rate keeps its history
    assert s.age_s(now=t + 3.0) >= 3.0
    summ = s.summary(now=t)
    assert summ["count"] == 100 and summ["name"] == "odom"


def test_stream_stats_empty():
    s = StreamStats()
    assert s.rate_hz() == 0.0
    assert math.isinf(s.age_s())
