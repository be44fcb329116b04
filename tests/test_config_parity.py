"""The reference's own config file loads unchanged (PARITY.md claim, now
with an artifact behind it).

``tests/data/reference_mpc_parameters.yaml`` is a byte-identical vendored
copy of ``/root/reference/roswrapper/ros/src/avoid_mpc/config/
mpc_parameters.yaml:1-84`` (config data, not code).  Every derived constant
asserted below is cross-checked against the values the reference's two
readers extract from it: the Python codegen reader
(``tools/mpc_obstacle_casadi.py:360-426``) and the C++ ParameterManager
(``ParameterManager.cpp:12-113``).
"""

import os

import numpy as np
import pytest

from avoid_mpc_tpu.config import GRAVITY, WEIGHTS_DIM, load_config

YAML = os.path.join(os.path.dirname(__file__), "data", "reference_mpc_parameters.yaml")


@pytest.fixture(scope="module")
def cfg():
    return load_config(YAML)


def test_horizon_shape(cfg):
    # N = T/dt = 1.0/0.033 -> 30 (mpc_obstacle_casadi.py:36 int(T/dt+0.5))
    assert cfg.mpc.mpc_T == 1.0
    assert cfg.mpc.mpc_dt == 0.033
    assert cfg.mpc.horizon_steps == 30
    assert cfg.mpc.mpc_max_iter == 3
    assert cfg.mpc.nearest_point_count == 3
    assert cfg.mpc.use_drag_coefficient is False


def test_weights_vector_order(cfg):
    # reference weights layout: 10 goal + 10 path + 4 u + lambda (:48,142-148)
    w = cfg.mpc.weights.as_vector()
    assert w.shape == (WEIGHTS_DIM,) == (25,)
    np.testing.assert_allclose(
        w[:10], [50.0, 50.0, 100.0, 100.0, 1.0, 1.0, 1.0, 0.0, 0.0, 0.0]
    )
    np.testing.assert_allclose(
        w[10:20], [0.0, 10.0, 50.0, 100.0, 0.0, 1.0, 1.0, 0.0, 1.0, 1.0]
    )
    np.testing.assert_allclose(w[20:24], [0.3, 0.3, 0.5, 1.0])
    assert w[24] == 1.2


def test_dynamics_parameters(cfg):
    np.testing.assert_allclose(
        cfg.mpc.tau, (6.09837416, 6.21675029, 15.79816293, 0.0)
    )
    np.testing.assert_allclose(
        cfg.mpc.gain, (0.999999, 0.999999, 0.999999, 1.0)
    )


def test_control_bounds(cfg):
    # HighLvlMpc.cpp:28-33 box bounds from a_min_z/a_max_z/a_max_xy/a_max_yaw_dot
    np.testing.assert_allclose(cfg.mpc.u_lower, [-10.0, -10.0, 5.0, -10.0])
    np.testing.assert_allclose(cfg.mpc.u_upper, [10.0, 10.0, 15.0, 10.0])
    np.testing.assert_allclose(cfg.mpc.u_hover, [0.0, 0.0, GRAVITY, 0.0])


def test_task_and_safety(cfg):
    assert cfg.mpc.speed == 10.0
    assert cfg.mpc.drone_radius == 0.5
    assert cfg.mpc.safety_distance == 0.2
    assert cfg.mpc.decay == 0.015
    assert cfg.mpc.slow_down_kp == 0.3
    assert cfg.mpc.slow_down_kd == 0.3
    assert cfg.task.height == 1.5
    assert cfg.task.goal_x == 500.0
    assert cfg.task.use_odom_est is True
    assert cfg.task.only_trust_vel is False


def test_reference_objective_is_exact(cfg):
    # The vendored reference file must produce the EXACT reference objective:
    # no barrier extensions (ADVICE r2: the tuned profile lives in
    # configs/tuned.yaml, never in a reference-compatible load).
    assert cfg.mpc.weights.collide_lambda_omni == 0.0
    assert cfg.mpc.margin_v == 0.0
    assert cfg.mpc.ttc_threshold == 0.0


def test_perception_block(cfg):
    p = cfg.perception
    assert (p.fx, p.fy, p.cx, p.cy) == (320.0, 320.0, 320.0, 240.0)
    assert p.resize_scale == 10
    assert p.pixel_to_meter == 1.0
    assert (p.depth_min, p.depth_max) == (0.1, 100.0)
    assert p.keyframe_dist_threshold == 0.1
    assert p.keyframe_count_threshold == 10
    assert p.max_frame_count == 100
    # grid = 640x480 / 10 => 64x48 = 3072 points/frame (FrameKDMap.cpp:104-125)
    assert p.grid_width == 64 and p.grid_height == 48
    assert p.points_per_frame == 3072


def test_Tbc_matrix(cfg):
    # XmlRpc 4x4 parse analogue (ParameterManager.cpp:60-85)
    expect = np.array(
        [
            [0.0, 0.0, 1.0, 0.05],
            [-1.0, 0.0, 0.0, 0.0],
            [0.0, -1.0, 0.0, 0.01],
            [0.0, 0.0, 0.0, 1.0],
        ]
    )
    np.testing.assert_allclose(cfg.perception.Tbc, expect)
    # valid SE(3): rotation block orthonormal, det +1
    R = cfg.perception.Tbc[:3, :3]
    np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-12)
    assert np.linalg.det(R) > 0.999999
