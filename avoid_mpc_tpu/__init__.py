"""avoid_mpc_tpu — a TPU-native MPC engine for mapless quadrotor collision avoidance.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
SJTU-ViSYS-team/Avoid-MPC ("Mapless Collision-Free Flight via MPC using Dual
KD-Trees in Cluttered Environments", arXiv 2503.10141):

- the CasADi/IPOPT NLP (reference ``tools/mpc_obstacle_casadi.py``) becomes a
  batched box-constrained iLQR/SQP solver (:mod:`avoid_mpc_tpu.solver`),
- both KD-trees (reference ``FrameKDMap.cpp``) become TPU-resident masked
  top-k nearest-neighbor kernels (:mod:`avoid_mpc_tpu.ops.knn`) over a
  fixed-shape rolling point-cloud map (:mod:`avoid_mpc_tpu.mapping`),
- the receding-horizon loop (reference ``AvoidanceStateMachine.cpp``) becomes
  one jitted step function batched over thousands of scenarios
  (:mod:`avoid_mpc_tpu.engine`),
- the simulator (vendored AirSim ``FastPhysicsEngine`` + simple_flight) becomes
  a JAX 6-DoF plant + cascade controller (:mod:`avoid_mpc_tpu.sim`),
- scale-out is scenario data-parallelism over a ``jax.sharding.Mesh``
  (:mod:`avoid_mpc_tpu.parallel`).

Everything under ``jit`` uses static shapes, ``lax.scan``/``lax.cond`` control
flow, and dtype-polymorphic math (f32 on TPU, f64 for CPU parity oracles).
"""

from avoid_mpc_tpu.config import (  # noqa: F401
    MPCConfig,
    MPCWeights,
    PerceptionConfig,
    TaskConfig,
    load_config,
)

__version__ = "0.1.0"
