from avoid_mpc_tpu.runtime.native import (  # noqa: F401
    MavConnection,
    MavlinkCodec,
    FrameRing,
    HostKDTree,
    Scheduler,
    native_available,
)
from avoid_mpc_tpu.runtime.mav_input import (  # noqa: F401
    MavVehicleInput,
    VehicleSnapshot,
)
