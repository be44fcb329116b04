"""Configuration — the single source of truth for problem shape and weights.

Mirrors the reference's layered config (``config/mpc_parameters.yaml`` read by
both the Python codegen tool ``tools/mpc_obstacle_casadi.py:360-426`` and the
C++ ``ParameterManager.cpp:12-113``).  One YAML file feeds the problem
definition, the solver, the perception pipeline and the task logic so that
shape constants (N, nearest-point count, dims) can never diverge between
components — the property the reference maintains by shipping a
``description.yaml`` next to each generated ``.so``.

Static (shape-determining) fields are plain Python ints consumed at trace
time; runtime weights are packed into arrays so that they can be changed
without recompilation (the reference appends gains/taus/weights/radius to the
IPOPT parameter vector for the same reason, ``HighLvlMpc.cpp:97-107``).
"""

from __future__ import annotations

import dataclasses
import os
from typing import Any

import numpy as np
import yaml

# State layout: [px, py, pz, yaw, vx, vy, vz, ax, ay, az]
# (reference tools/mpc_obstacle_casadi.py:41-44)
STATE_DIM = 10
# Control layout: [ax_cmd, ay_cmd, az_cmd, yaw_dot]  (:45-46)
CONTROL_DIM = 4
OBSTACLE_DIM = 3
GRAVITY = 9.81
# weights vector layout: 10 goal + 10 path + 4 control + 1 collide_lambda
# (reference tools/mpc_obstacle_casadi.py:48)
WEIGHTS_DIM = 2 * STATE_DIM + CONTROL_DIM + 1


@dataclasses.dataclass(frozen=True)
class MPCWeights:
    """Cost weights, matching the reference weights-vector layout.

    Reference: ``read_params_from_yaml`` (tools/mpc_obstacle_casadi.py:360-426)
    and the diag() slicing at :142-148.
    """

    q_goal: tuple[float, ...]  # 10: terminal goal quadratic
    q_path: tuple[float, ...]  # 10: yaw-rotated path-gap quadratic
    q_u: tuple[float, ...]  # 4: control quadratic (about hover [0,0,g,0])
    collide_lambda: float  # scalar soft collision cost multiplier
    # Omnidirectional (velocity-ungated) barrier weight — round-2 extension
    # fixing the reference cost's tangential-pass blindness
    # (tools/mpc_obstacle_casadi.py:186-204 gates the barrier by |v.dir|).
    # 0.0 = exact reference objective.  Not part of the 25-weight vector.
    collide_lambda_omni: float = 0.0

    def as_vector(self) -> np.ndarray:
        """25-vector in reference ordering (goal, path, u, lambda)."""
        return np.asarray(
            list(self.q_goal) + list(self.q_path) + list(self.q_u) + [self.collide_lambda],
            dtype=np.float64,
        )

    @staticmethod
    def from_vector(w: np.ndarray) -> "MPCWeights":
        w = np.asarray(w, dtype=np.float64)
        assert w.shape == (WEIGHTS_DIM,), w.shape
        return MPCWeights(
            q_goal=tuple(w[:STATE_DIM]),
            q_path=tuple(w[STATE_DIM : 2 * STATE_DIM]),
            q_u=tuple(w[2 * STATE_DIM : 2 * STATE_DIM + CONTROL_DIM]),
            collide_lambda=float(w[-1]),
        )


@dataclasses.dataclass(frozen=True)
class MPCConfig:
    """Problem-shape + solver configuration.

    Shape-determining fields (``horizon_steps``, ``nearest_point_count``) are
    static ints; everything else is a runtime parameter.
    """

    # Horizon (reference mpc_parameters.yaml: mpc_T=1.0, mpc_dt=0.033 => N=30)
    mpc_T: float = 1.0
    mpc_dt: float = 0.033
    # Outer re-association iterations per control tick (mpc_max_iter: 3)
    mpc_max_iter: int = 3
    # Obstacle points per horizon stage (nearest_point_num: 3)
    nearest_point_count: int = 3
    use_drag_coefficient: bool = False
    drag_coefficient: float = 0.033

    weights: MPCWeights = dataclasses.field(
        default_factory=lambda: MPCWeights(
            # mpc_parameters.yaml goal_* / path_* / u_* / collide_lambda
            q_goal=(50.0, 50.0, 100.0, 100.0, 1.0, 1.0, 1.0, 0.0, 0.0, 0.0),
            q_path=(0.0, 10.0, 50.0, 100.0, 0.0, 1.0, 1.0, 0.0, 1.0, 1.0),
            q_u=(0.3, 0.3, 0.5, 1.0),
            collide_lambda=1.2,
        )
    )

    # First-order actuator-lag time "constants" (inverse time constants; the
    # dynamics use (u_cmd - a) * tau, reference :119-121). yaml tau_a_*.
    tau: tuple[float, float, float, float] = (6.09837416, 6.21675029, 15.79816293, 0.0)
    gain: tuple[float, float, float, float] = (0.999999, 0.999999, 0.999999, 1.0)

    # Control box bounds (reference HighLvlMpc.cpp:28-33 + yaml a_*):
    # u in [-a_max_xy, a_max_xy]^2 x [a_min_z, a_max_z] x [-a_max_yaw_dot, ...]
    a_min_z: float = 5.0
    a_max_z: float = 15.0
    a_max_xy: float = 10.0
    a_max_yaw_dot: float = 10.0

    drone_radius: float = 0.5
    safety_distance: float = 0.2
    speed: float = 10.0
    # Speed-scaled collision margin (m per m/s of planned speed): effective
    # radius r + margin_v*||v_ref|| per horizon node.  0.0 = reference.
    margin_v: float = 0.0
    # Time-to-collision slow-down trigger (s): force the PD slow-down
    # fallback when (1-NN distance - r)/closing speed drops below this.
    # <= 0 disables (reference behavior: trigger on instantaneous distance
    # only, AvoidanceStateMachine.cpp:345-350).
    ttc_threshold: float = 0.0

    # Latency-compensation lookahead seed (yaml decay: 0.015 s)
    decay: float = 0.015
    # Control loop period (reference launch con_dt = mpc_dt)
    con_dt: float = 0.033

    # Slow-down PD fallback (yaml slow_down_kp/kd)
    slow_down_kp: float = 0.3
    slow_down_kd: float = 0.3

    # --- solver knobs (new; the reference's analogue is ipopt.max_iter=10,
    # tol 1e-4, warm start on: tools/mpc_obstacle_casadi.py:232-240) ---
    sqp_iters: int = 10
    sqp_iters_fast: int = 6  # the "solverFaster" analogue (HighLvlMpc.cpp:50-52)

    # --- sub-linear obstacle association (new; replaces the KD-tree's
    # algorithmic role, kd_tree_two.h:108-133).  Per-stage k-NN first culls
    # the rolling cloud to the points within assoc_radius (L-inf) of the
    # horizon path's bounding box — exact for every neighbor within that
    # radius, and the collision softplus (slope -32, drone_radius 0.5)
    # underflows to exactly 0 in f32 beyond ~1.6 m, so 2.5 m preserves the
    # solve to solver precision.  assoc_m_max bounds the candidate set; a
    # denser tube (e.g. accumulated ground returns) is rescued by an exact
    # brute-force fallback, so the cull never changes behavior.
    # assoc_radius <= 0 disables the cull (pure brute force).
    assoc_radius: float = 2.5
    assoc_m_max: int = 8192
    line_search_alphas: int = 8
    reg_init: float = 1e-6
    reg_min: float = 1e-9
    reg_max: float = 1e6
    boxqp_iters: int = 4

    @property
    def horizon_steps(self) -> int:
        """N = T / dt (reference tools/mpc_obstacle_casadi.py:36)."""
        return int(round(self.mpc_T / self.mpc_dt))

    @property
    def u_lower(self) -> np.ndarray:
        return np.array(
            [-self.a_max_xy, -self.a_max_xy, self.a_min_z, -self.a_max_yaw_dot]
        )

    @property
    def u_upper(self) -> np.ndarray:
        return np.array(
            [self.a_max_xy, self.a_max_xy, self.a_max_z, self.a_max_yaw_dot]
        )

    @property
    def u_hover(self) -> np.ndarray:
        """Control cost reference point [0, 0, g, 0] (reference :209)."""
        return np.array([0.0, 0.0, GRAVITY, 0.0])


@dataclasses.dataclass(frozen=True)
class PerceptionConfig:
    """Depth camera + rolling-map parameters (yaml perception block;
    reference ParameterManager.h:11-33, FrameKDMap.cpp:6-32)."""

    fx: float = 320.0
    fy: float = 320.0
    cx: float = 320.0
    cy: float = 240.0
    width: int = 640
    height: int = 480
    resize_scale: int = 10
    pixel_to_meter: float = 1.0
    depth_max: float = 100.0
    depth_min: float = 0.1
    # Body-to-camera extrinsics (yaml T_b_c), row-major 4x4
    T_b_c: tuple[tuple[float, ...], ...] = (
        (0.0, 0.0, 1.0, 0.05),
        (-1.0, 0.0, 0.0, 0.0),
        (0.0, -1.0, 0.0, 0.01),
        (0.0, 0.0, 0.0, 1.0),
    )
    keyframe_dist_threshold: float = 0.1
    keyframe_count_threshold: int = 10
    max_frame_count: int = 100
    # Simulated depth sensor noise (reference launch depth_std_dev=0.02,
    # airsim_ros_wrapper.cpp:1274-1277)
    depth_std_dev: float = 0.02

    @property
    def Tbc(self) -> np.ndarray:
        return np.asarray(self.T_b_c, dtype=np.float64)

    @property
    def grid_width(self) -> int:
        return self.width // self.resize_scale

    @property
    def grid_height(self) -> int:
        return self.height // self.resize_scale

    @property
    def points_per_frame(self) -> int:
        return self.grid_width * self.grid_height


@dataclasses.dataclass(frozen=True)
class TaskConfig:
    """Mission parameters (yaml task block; ParameterManager.h:51-61)."""

    task: str = "forward"  # "forward" | "global_goal"
    height: float = 1.5
    goal_x: float = 500.0
    use_odom_est: bool = True
    only_trust_vel: bool = False


@dataclasses.dataclass(frozen=True)
class LidarConfig:
    """Rotating-lidar sensor parameters (yaml ``lidar`` block).

    Mirrors ``LidarSimpleParams`` (AirLib/include/sensors/lidar/
    LidarSimpleParams.hpp:25-44 — the Velodyne VLP-16 defaults: 16 channels,
    100 m range, 100k points/s, 10 rot/s, vertical FOV [-45, -15] deg for
    multirotors, mounted 1 m above the body origin).  The reference's Unreal
    scan generator is stripped from the vendored fork; the scan pattern here
    follows AirSim's UnrealLidarSensor semantics: per update,
    points_per_second / update_frequency rays split evenly across channels,
    each channel sweeping rotations_per_second * 360 / update_frequency
    degrees of azimuth from the carried horizontal angle.

    ``range_std_dev`` (per-point range noise) is our extension (default 0 =
    reference behavior); the vendored LidarSimple has no noise model.
    Angles are degrees; the local frame is z-up (the reference's NED
    relative position (0, 0, -1) becomes +1 here).
    """

    number_of_channels: int = 16
    range: float = 100.0  # meters (10000 cm in the reference)
    points_per_second: int = 100000
    rotations_per_second: int = 10
    horizontal_fov_start: float = 0.0
    horizontal_fov_end: float = 359.0
    vertical_fov_upper: float = -15.0  # multirotor defaults (simmode gate)
    vertical_fov_lower: float = -45.0
    update_frequency: float = 10.0  # Hz
    rel_position: tuple[float, float, float] = (0.0, 0.0, 1.0)  # z-up
    range_std_dev: float = 0.0  # per-point range noise (extension)

    @property
    def points_per_scan(self) -> int:
        """Rays per update — static, shapes the output arrays."""
        return int(self.points_per_second / self.update_frequency)

    @property
    def points_per_channel(self) -> int:
        return self.points_per_scan // self.number_of_channels


@dataclasses.dataclass(frozen=True)
class EngineConfig:
    """Top-level bundle: MPC + perception + task."""

    mpc: MPCConfig = dataclasses.field(default_factory=MPCConfig)
    perception: PerceptionConfig = dataclasses.field(default_factory=PerceptionConfig)
    task: TaskConfig = dataclasses.field(default_factory=TaskConfig)
    lidar: LidarConfig = dataclasses.field(default_factory=LidarConfig)


def _pick(d: dict[str, Any], *names: str, default: Any = None) -> Any:
    for n in names:
        if n in d:
            return d[n]
    return default


def load_config(path: str | None = None) -> EngineConfig:
    """Load an :class:`EngineConfig` from YAML.

    Accepts the same flat key space as the reference
    ``config/mpc_parameters.yaml`` (goal_p_x, tau_a_x, ...), so a reference
    config file drops in unchanged.
    """
    if path is None:
        path = os.path.join(os.path.dirname(__file__), "..", "configs", "default.yaml")
    with open(path) as f:
        d = yaml.safe_load(f)

    defaults = MPCConfig()
    weights = MPCWeights(
        q_goal=tuple(
            float(_pick(d, f"goal_{n}", default=g))
            for n, g in zip(
                ["p_x", "p_y", "p_z", "yaw", "v_x", "v_y", "v_z", "a_x", "a_y", "a_z"],
                defaults.weights.q_goal,
            )
        ),
        q_path=tuple(
            float(_pick(d, f"path_{n}", default=g))
            for n, g in zip(
                ["p_x", "p_y", "p_z", "yaw", "v_x", "v_y", "v_z", "a_x", "a_y", "a_z"],
                defaults.weights.q_path,
            )
        ),
        q_u=tuple(
            float(_pick(d, f"u_{n}", default=g))
            for n, g in zip(["a_x", "a_y", "a_z", "yaw_dot"], defaults.weights.q_u)
        ),
        collide_lambda=float(_pick(d, "collide_lambda", default=defaults.weights.collide_lambda)),
        collide_lambda_omni=float(
            _pick(d, "collide_lambda_omni", default=defaults.weights.collide_lambda_omni)
        ),
    )
    mpc = MPCConfig(
        mpc_T=float(_pick(d, "mpc_T", default=defaults.mpc_T)),
        mpc_dt=float(_pick(d, "mpc_dt", default=defaults.mpc_dt)),
        mpc_max_iter=int(_pick(d, "mpc_max_iter", default=defaults.mpc_max_iter)),
        nearest_point_count=int(_pick(d, "nearest_point_num", default=defaults.nearest_point_count)),
        use_drag_coefficient=bool(int(_pick(d, "use_drag_coefficient", default=0))),
        weights=weights,
        tau=(
            float(_pick(d, "tau_a_x", default=defaults.tau[0])),
            float(_pick(d, "tau_a_y", default=defaults.tau[1])),
            float(_pick(d, "tau_a_z", default=defaults.tau[2])),
            float(_pick(d, "tau_yaw_dot", default=defaults.tau[3])),
        ),
        gain=(
            float(_pick(d, "gain_a_x", default=defaults.gain[0])),
            float(_pick(d, "gain_a_y", default=defaults.gain[1])),
            float(_pick(d, "gain_a_z", default=defaults.gain[2])),
            float(_pick(d, "gain_yaw_dot", default=defaults.gain[3])),
        ),
        a_min_z=float(_pick(d, "a_min_z", default=defaults.a_min_z)),
        a_max_z=float(_pick(d, "a_max_z", default=defaults.a_max_z)),
        a_max_xy=float(_pick(d, "a_max_xy", default=defaults.a_max_xy)),
        a_max_yaw_dot=float(_pick(d, "a_max_yaw_dot", default=defaults.a_max_yaw_dot)),
        drone_radius=float(_pick(d, "drone_radius", default=defaults.drone_radius)),
        safety_distance=float(_pick(d, "safety_distance", default=defaults.safety_distance)),
        speed=float(_pick(d, "speed", default=defaults.speed)),
        margin_v=float(_pick(d, "margin_v", default=defaults.margin_v)),
        ttc_threshold=float(_pick(d, "ttc_threshold", default=defaults.ttc_threshold)),
        decay=float(_pick(d, "decay", default=defaults.decay)),
        slow_down_kp=float(_pick(d, "slow_down_kp", default=defaults.slow_down_kp)),
        slow_down_kd=float(_pick(d, "slow_down_kd", default=defaults.slow_down_kd)),
    )
    pdef = PerceptionConfig()
    perception = PerceptionConfig(
        fx=float(_pick(d, "fx", default=pdef.fx)),
        fy=float(_pick(d, "fy", default=pdef.fy)),
        cx=float(_pick(d, "cx", default=pdef.cx)),
        cy=float(_pick(d, "cy", default=pdef.cy)),
        resize_scale=int(_pick(d, "resize_scale", default=pdef.resize_scale)),
        pixel_to_meter=float(_pick(d, "pixel2meter", default=pdef.pixel_to_meter)),
        depth_max=float(_pick(d, "depth_max", default=pdef.depth_max)),
        depth_min=float(_pick(d, "depth_min", default=pdef.depth_min)),
        T_b_c=tuple(tuple(float(v) for v in row) for row in _pick(d, "T_b_c", default=pdef.T_b_c)),
        keyframe_dist_threshold=float(_pick(d, "keyframe_th_dist", default=pdef.keyframe_dist_threshold)),
        keyframe_count_threshold=int(_pick(d, "keyframe_th_count", default=pdef.keyframe_count_threshold)),
        max_frame_count=int(_pick(d, "max_frame_count", default=pdef.max_frame_count)),
    )
    tdef = TaskConfig()
    task = TaskConfig(
        task=str(_pick(d, "task", default=tdef.task)),
        height=float(_pick(d, "height", default=tdef.height)),
        goal_x=float(_pick(d, "goal_x", default=tdef.goal_x)),
        use_odom_est=bool(_pick(d, "use_odom_est", default=tdef.use_odom_est)),
        only_trust_vel=bool(_pick(d, "only_trust_vel", default=tdef.only_trust_vel)),
    )
    # optional nested lidar block (AirSimSettings LidarSetting key names,
    # AirLib/include/sensors/lidar/LidarSimpleParams.hpp:49-77)
    ldef = LidarConfig()
    lb = d.get("lidar", {}) or {}
    lidar = LidarConfig(
        number_of_channels=int(_pick(lb, "NumberOfChannels", "number_of_channels", default=ldef.number_of_channels)),
        range=float(_pick(lb, "Range", "range", default=ldef.range)),
        points_per_second=int(_pick(lb, "PointsPerSecond", "points_per_second", default=ldef.points_per_second)),
        rotations_per_second=int(_pick(lb, "RotationsPerSecond", "rotations_per_second", default=ldef.rotations_per_second)),
        horizontal_fov_start=float(_pick(lb, "HorizontalFOVStart", "horizontal_fov_start", default=ldef.horizontal_fov_start)),
        horizontal_fov_end=float(_pick(lb, "HorizontalFOVEnd", "horizontal_fov_end", default=ldef.horizontal_fov_end)),
        vertical_fov_upper=float(_pick(lb, "VerticalFOVUpper", "vertical_fov_upper", default=ldef.vertical_fov_upper)),
        vertical_fov_lower=float(_pick(lb, "VerticalFOVLower", "vertical_fov_lower", default=ldef.vertical_fov_lower)),
        update_frequency=float(_pick(lb, "UpdateFrequency", "update_frequency", default=ldef.update_frequency)),
        rel_position=tuple(float(v) for v in _pick(lb, "rel_position", default=ldef.rel_position)),
        range_std_dev=float(_pick(lb, "range_std_dev", default=ldef.range_std_dev)),
    )
    return EngineConfig(mpc=mpc, perception=perception, task=task, lidar=lidar)
