from avoid_mpc_tpu.utils import quaternion  # noqa: F401
