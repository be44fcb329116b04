from avoid_mpc_tpu.runtime.native import (  # noqa: F401
    MavlinkCodec,
    FrameRing,
    HostKDTree,
    Scheduler,
    native_available,
)
