"""ctypes bindings for the native host runtime (``runtime/*.cpp``).

The reference's native runtime pieces — per-topic callback queues, nanoflann
KD-trees, and AirLib's ScheduledExecutor — map to three C++ components built
into ``libavoidmpc_host.so``:

- :class:`FrameRing`: lock-free SPSC ring for fixed-size sensor frames,
- :class:`HostKDTree`: from-scratch 3-D KD-tree (CPU oracle / host-only k-NN),
- :class:`Scheduler`: fixed-rate task threads with overrun + latency stats
  (the measured latency feeds the MPC ``decay`` like the reference's own
  solve-time feedback).

The library auto-builds with ``make`` on first use; ``native_available()``
reports whether the toolchain produced it (pure-JAX paths never depend on it).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_RUNTIME_DIR = os.path.join(os.path.dirname(__file__), "..", "..", "runtime")
_LIB_PATH = os.path.join(_RUNTIME_DIR, "libavoidmpc_host.so")
_lib = None
_lib_lock = threading.Lock()


def _load():
    global _lib
    with _lib_lock:
        if _lib is not None:
            return _lib
        if not os.path.exists(_LIB_PATH):
            try:
                subprocess.run(
                    ["make", "-C", _RUNTIME_DIR],
                    check=True,
                    capture_output=True,
                    timeout=120,
                )
            except (subprocess.SubprocessError, OSError) as e:
                raise RuntimeError(f"native runtime build failed: {e}") from e
        lib = ctypes.CDLL(_LIB_PATH)

        lib.frame_ring_create.restype = ctypes.c_void_p
        lib.frame_ring_create.argtypes = [ctypes.c_size_t, ctypes.c_size_t]
        lib.frame_ring_destroy.argtypes = [ctypes.c_void_p]
        lib.frame_ring_push.restype = ctypes.c_int
        lib.frame_ring_push.argtypes = [ctypes.c_void_p, ctypes.c_char_p, ctypes.c_double]
        for f in ("frame_ring_pop", "frame_ring_pop_latest"):
            getattr(lib, f).restype = ctypes.c_int
            getattr(lib, f).argtypes = [
                ctypes.c_void_p, ctypes.c_char_p, ctypes.POINTER(ctypes.c_double)
            ]
        lib.frame_ring_dropped.restype = ctypes.c_uint64
        lib.frame_ring_dropped.argtypes = [ctypes.c_void_p]
        lib.frame_ring_size.restype = ctypes.c_uint64
        lib.frame_ring_size.argtypes = [ctypes.c_void_p]

        lib.kdtree_build.restype = ctypes.c_void_p
        lib.kdtree_build.argtypes = [ctypes.POINTER(ctypes.c_float), ctypes.c_int32]
        lib.kdtree_destroy.argtypes = [ctypes.c_void_p]
        lib.kdtree_knn.argtypes = [
            ctypes.c_void_p, ctypes.POINTER(ctypes.c_float), ctypes.c_int32,
            ctypes.c_int32, ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_float),
        ]

        lib.scheduler_create.restype = ctypes.c_void_p
        lib.scheduler_add_task.restype = ctypes.c_int
        _TASK_FN = ctypes.CFUNCTYPE(None, ctypes.c_void_p)
        lib.scheduler_add_task.argtypes = [ctypes.c_void_p, _TASK_FN, ctypes.c_void_p, ctypes.c_double]
        lib._TASK_FN = _TASK_FN
        for f in ("scheduler_start", "scheduler_stop", "scheduler_destroy"):
            getattr(lib, f).argtypes = [ctypes.c_void_p]
        lib.scheduler_ticks.restype = ctypes.c_uint64
        lib.scheduler_ticks.argtypes = [ctypes.c_void_p, ctypes.c_int]
        lib.scheduler_overruns.restype = ctypes.c_uint64
        lib.scheduler_overruns.argtypes = [ctypes.c_void_p, ctypes.c_int]
        lib.scheduler_latency.restype = ctypes.c_double
        lib.scheduler_latency.argtypes = [ctypes.c_void_p, ctypes.c_int]

        _lib = lib
        return lib


def native_available() -> bool:
    try:
        _load()
        return True
    except RuntimeError:
        return False


class FrameRing:
    """SPSC ring of fixed-size frames (e.g. depth images) between a sensor
    thread and the device-feeding loop."""

    def __init__(self, slot_bytes: int, capacity: int):
        self._lib = _load()
        self._slot = slot_bytes
        self._ptr = self._lib.frame_ring_create(slot_bytes, capacity)

    def push(self, frame: np.ndarray, stamp: float) -> bool:
        buf = np.ascontiguousarray(frame).view(np.uint8).reshape(-1)
        assert buf.nbytes == self._slot, (buf.nbytes, self._slot)
        return bool(self._lib.frame_ring_push(self._ptr, buf.tobytes(), stamp))

    def _pop(self, fn) -> tuple[np.ndarray, float] | None:
        out = ctypes.create_string_buffer(self._slot)
        stamp = ctypes.c_double()
        if not fn(self._ptr, out, ctypes.byref(stamp)):
            return None
        return np.frombuffer(out.raw, dtype=np.uint8).copy(), stamp.value

    def pop(self):
        return self._pop(self._lib.frame_ring_pop)

    def pop_latest(self):
        """Freshest frame, discarding the backlog (latency-first)."""
        return self._pop(self._lib.frame_ring_pop_latest)

    @property
    def dropped(self) -> int:
        return int(self._lib.frame_ring_dropped(self._ptr))

    def __len__(self) -> int:
        return int(self._lib.frame_ring_size(self._ptr))

    def __del__(self):
        if getattr(self, "_ptr", None):
            self._lib.frame_ring_destroy(self._ptr)
            self._ptr = None


class HostKDTree:
    """From-scratch C++ KD-tree over (n,3) points; k-NN queries."""

    def __init__(self, points: np.ndarray):
        self._lib = _load()
        pts = np.ascontiguousarray(points, dtype=np.float32)
        assert pts.ndim == 2 and pts.shape[1] == 3
        self._n = pts.shape[0]
        self._ptr = self._lib.kdtree_build(
            pts.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), self._n
        )

    def query(self, queries: np.ndarray, k: int):
        """Returns (dists, idx): (m,k) ascending distances (inf pad) and
        point ids (-1 pad)."""
        q = np.ascontiguousarray(queries, dtype=np.float32).reshape(-1, 3)
        m = q.shape[0]
        idx = np.empty((m, k), dtype=np.int32)
        d2 = np.empty((m, k), dtype=np.float32)
        self._lib.kdtree_knn(
            self._ptr,
            q.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), m, k,
            idx.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            d2.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        )
        return np.sqrt(d2), idx

    def __del__(self):
        if getattr(self, "_ptr", None):
            self._lib.kdtree_destroy(self._ptr)
            self._ptr = None


class Scheduler:
    """Fixed-rate task threads with overrun/latency accounting."""

    def __init__(self):
        self._lib = _load()
        self._ptr = self._lib.scheduler_create()
        self._callbacks = []  # keep CFUNCTYPE refs alive

    def add_task(self, fn, period_s: float) -> int:
        cb = self._lib._TASK_FN(lambda _arg: fn())
        self._callbacks.append(cb)
        return self._lib.scheduler_add_task(self._ptr, cb, None, period_s)

    def start(self):
        self._lib.scheduler_start(self._ptr)

    def stop(self):
        self._lib.scheduler_stop(self._ptr)

    def ticks(self, task: int) -> int:
        return int(self._lib.scheduler_ticks(self._ptr, task))

    def overruns(self, task: int) -> int:
        return int(self._lib.scheduler_overruns(self._ptr, task))

    def latency(self, task: int) -> float:
        """EWMA task latency in seconds — the `decay` feedback source."""
        return float(self._lib.scheduler_latency(self._ptr, task))

    def __del__(self):
        if getattr(self, "_ptr", None):
            self._lib.scheduler_destroy(self._ptr)
            self._ptr = None


class MavlinkCodec:
    """MAVLink v2 pack/parse (runtime/mavlink.cpp) — the real-vehicle
    transport core (the MavLinkCom role in the reference)."""

    SET_ATTITUDE_TARGET = 82
    HEARTBEAT = 0
    COMMAND_LONG = 76
    PARAM_VALUE = 22
    PARAM_SET = 23
    _CRC_EXTRA = {82: 49, 0: 50, 76: 152, 23: 168, 22: 220}

    def __init__(self):
        self._lib = _load()
        lib = self._lib
        if not hasattr(lib, "_mav_bound"):
            lib.mavlink2_pack.restype = ctypes.c_int
            lib.mavlink2_pack.argtypes = [
                ctypes.c_uint32, ctypes.c_char_p, ctypes.c_size_t,
                ctypes.c_uint8, ctypes.c_uint8, ctypes.c_uint8, ctypes.c_uint8,
                ctypes.c_char_p,
            ]
            lib.mavlink2_pack_set_attitude_target.restype = ctypes.c_int
            lib.mavlink2_pack_set_attitude_target.argtypes = [
                ctypes.c_uint32, ctypes.POINTER(ctypes.c_float), ctypes.c_float,
                ctypes.c_float, ctypes.c_float, ctypes.c_float, ctypes.c_uint8,
                ctypes.c_uint8, ctypes.c_uint8, ctypes.c_uint8, ctypes.c_uint8,
                ctypes.c_uint8, ctypes.c_char_p,
            ]
            lib.mavlink2_pack_heartbeat.restype = ctypes.c_int
            lib.mavlink2_pack_heartbeat.argtypes = [
                ctypes.c_uint32, ctypes.c_uint8, ctypes.c_uint8,
                ctypes.c_uint8, ctypes.c_uint8, ctypes.c_uint8,
                ctypes.c_uint8, ctypes.c_uint8, ctypes.c_char_p,
            ]
            lib.mavlink2_pack_command_long.restype = ctypes.c_int
            lib.mavlink2_pack_command_long.argtypes = [
                ctypes.POINTER(ctypes.c_float), ctypes.c_uint16,
                ctypes.c_uint8, ctypes.c_uint8, ctypes.c_uint8,
                ctypes.c_uint8, ctypes.c_uint8, ctypes.c_uint8,
                ctypes.c_char_p,
            ]
            lib.mavlink2_pack_param_set.restype = ctypes.c_int
            lib.mavlink2_pack_param_set.argtypes = [
                ctypes.c_float, ctypes.c_char_p, ctypes.c_uint8,
                ctypes.c_uint8, ctypes.c_uint8, ctypes.c_uint8,
                ctypes.c_uint8, ctypes.c_uint8, ctypes.c_char_p,
            ]
            lib.mavlink2_pack_param_value.restype = ctypes.c_int
            lib.mavlink2_pack_param_value.argtypes = [
                ctypes.c_float, ctypes.c_uint16, ctypes.c_uint16,
                ctypes.c_char_p, ctypes.c_uint8, ctypes.c_uint8,
                ctypes.c_uint8, ctypes.c_uint8, ctypes.c_char_p,
            ]
            lib.mavlink_parser_create.restype = ctypes.c_void_p
            lib.mavlink_parser_destroy.argtypes = [ctypes.c_void_p]
            lib.mavlink_parser_feed.restype = ctypes.c_int
            lib.mavlink_parser_feed.argtypes = [
                ctypes.c_void_p, ctypes.c_uint8, ctypes.c_uint8,
                ctypes.POINTER(ctypes.c_uint32), ctypes.c_char_p,
                ctypes.POINTER(ctypes.c_uint8),
            ]
            lib._mav_bound = True
        self._parser = lib.mavlink_parser_create()
        self._seq = 0

    def pack_set_attitude_target(
        self, time_boot_ms, q, roll_rate, pitch_rate, yaw_rate, thrust,
        target_system=1, target_component=1, type_mask=0x07,
    ) -> bytes:
        out = ctypes.create_string_buffer(64)
        qf = (ctypes.c_float * 4)(*[float(v) for v in q])
        n = self._lib.mavlink2_pack_set_attitude_target(
            int(time_boot_ms), qf, float(roll_rate), float(pitch_rate),
            float(yaw_rate), float(thrust), target_system, target_component,
            type_mask, self._seq & 0xFF, 255, 0, out,
        )
        self._seq += 1
        return out.raw[:n]

    def pack_heartbeat(
        self, custom_mode=0, type_=2, autopilot=12, base_mode=0,
        system_status=4,
    ) -> bytes:
        """HEARTBEAT (#0): type 2 = MAV_TYPE_QUADROTOR, autopilot 12 =
        MAV_AUTOPILOT_PX4, system_status 4 = MAV_STATE_ACTIVE."""
        out = ctypes.create_string_buffer(64)
        n = self._lib.mavlink2_pack_heartbeat(
            int(custom_mode), type_, autopilot, base_mode, system_status,
            self._seq & 0xFF, 255, 0, out,
        )
        self._seq += 1
        return out.raw[:n]

    def pack_command_long(
        self, command, params=(), target_system=1, target_component=1,
        confirmation=0,
    ) -> bytes:
        """COMMAND_LONG (#76): e.g. command 400 = ARM_DISARM (param1 1/0),
        22 = NAV_TAKEOFF — the arming/mode surface of MavLinkVehicle."""
        p7 = (ctypes.c_float * 7)(*([float(v) for v in params] + [0.0] * 7)[:7])
        out = ctypes.create_string_buffer(64)
        n = self._lib.mavlink2_pack_command_long(
            p7, int(command), target_system, target_component, confirmation,
            self._seq & 0xFF, 255, 0, out,
        )
        self._seq += 1
        return out.raw[:n]

    def pack_param_set(
        self, param_id: str, value: float, param_type=9,
        target_system=1, target_component=1,
    ) -> bytes:
        """PARAM_SET (#23): write an onboard parameter. param_type 9 =
        MAV_PARAM_TYPE_REAL32 (the only type PX4-style stacks use on the
        wire). The reference's MavLinkParameter setter role."""
        out = ctypes.create_string_buffer(64)
        n = self._lib.mavlink2_pack_param_set(
            float(value), param_id.encode()[:16], param_type,
            target_system, target_component, self._seq & 0xFF, 255, 0, out,
        )
        self._seq += 1
        return out.raw[:n]

    def pack_param_value(
        self, param_id: str, value: float, param_count=1, param_index=0,
        param_type=9,
    ) -> bytes:
        """PARAM_VALUE (#22): the vehicle-side parameter reply/broadcast
        (PARAM_SET ack, param read response)."""
        out = ctypes.create_string_buffer(64)
        n = self._lib.mavlink2_pack_param_value(
            float(value), param_count, param_index, param_id.encode()[:16],
            param_type, self._seq & 0xFF, 1, 1, out,
        )
        self._seq += 1
        return out.raw[:n]

    def parse(self, data: bytes, msgid_expected: int = SET_ATTITUDE_TARGET):
        """Feed bytes; return list of (msgid, payload bytes) frames."""
        crc_extra = self._CRC_EXTRA[msgid_expected]
        frames = []
        msgid = ctypes.c_uint32()
        plen = ctypes.c_uint8()
        payload = ctypes.create_string_buffer(256)
        for b in data:
            r = self._lib.mavlink_parser_feed(
                self._parser, b, crc_extra, ctypes.byref(msgid), payload,
                ctypes.byref(plen),
            )
            if r == 1:
                frames.append((msgid.value, payload.raw[: plen.value]))
        return frames

    def __del__(self):
        if getattr(self, "_parser", None):
            self._lib.mavlink_parser_destroy(self._parser)
            self._parser = None


def _bind_mavconn(lib):
    """Declare the mav_conn_* ctypes signatures once per loaded lib."""
    if hasattr(lib, "_mavconn_bound"):
        return
    f32p = ctypes.POINTER(ctypes.c_float)
    u64p = ctypes.POINTER(ctypes.c_uint64)
    lib.mav_conn_create.restype = ctypes.c_void_p
    lib.mav_conn_create.argtypes = [
        ctypes.c_uint16, ctypes.c_char_p, ctypes.c_uint16,
        ctypes.c_uint8, ctypes.c_uint8,
    ]
    lib.mav_conn_destroy.argtypes = [ctypes.c_void_p]
    lib.mav_conn_create_tcp_server.restype = ctypes.c_void_p
    lib.mav_conn_create_tcp_server.argtypes = [
        ctypes.c_uint16, ctypes.c_double, ctypes.c_uint8,
        ctypes.c_uint8,
    ]
    lib.mav_conn_create_tcp_client.restype = ctypes.c_void_p
    lib.mav_conn_create_tcp_client.argtypes = [
        ctypes.c_char_p, ctypes.c_uint16, ctypes.c_double,
        ctypes.c_uint8, ctypes.c_uint8,
    ]
    lib.mav_conn_send_heartbeat.argtypes = [ctypes.c_void_p]
    lib.mav_conn_set_attitude_target.restype = ctypes.c_int
    lib.mav_conn_set_attitude_target.argtypes = [
        ctypes.c_void_p, f32p, f32p, ctypes.c_float, ctypes.c_uint8,
        ctypes.c_int,
    ]
    lib.mav_conn_send_attitude.restype = ctypes.c_int
    lib.mav_conn_send_attitude.argtypes = [
        ctypes.c_void_p, ctypes.c_float, f32p, f32p,
    ]
    lib.mav_conn_send_local_position.restype = ctypes.c_int
    lib.mav_conn_send_local_position.argtypes = [
        ctypes.c_void_p, ctypes.c_float, f32p, f32p,
    ]
    lib.mav_conn_send_command_long.restype = ctypes.c_int
    lib.mav_conn_send_command_long.argtypes = [
        ctypes.c_void_p, f32p, ctypes.c_uint16, ctypes.c_uint8,
        ctypes.c_uint8,
    ]
    lib.mav_conn_start_streams.argtypes = [
        ctypes.c_void_p, ctypes.c_double, ctypes.c_double,
    ]
    lib.mav_conn_heartbeat_age.restype = ctypes.c_double
    lib.mav_conn_heartbeat_age.argtypes = [ctypes.c_void_p]
    lib.mav_conn_link_ok.restype = ctypes.c_int
    lib.mav_conn_link_ok.argtypes = [ctypes.c_void_p, ctypes.c_double]
    lib.mav_conn_stats.argtypes = [ctypes.c_void_p, u64p]
    for name in ("mav_conn_attitude", "mav_conn_local_position",
                 "mav_conn_attitude_target", "mav_conn_command_long"):
        fn = getattr(lib, name)
        fn.restype = ctypes.c_int
        fn.argtypes = [ctypes.c_void_p, f32p]
    lib.mav_conn_create_serial.restype = ctypes.c_void_p
    lib.mav_conn_create_serial.argtypes = [
        ctypes.c_char_p, ctypes.c_int, ctypes.c_uint8, ctypes.c_uint8,
    ]
    lib.mav_conn_log_open.restype = ctypes.c_int
    lib.mav_conn_log_open.argtypes = [ctypes.c_void_p, ctypes.c_char_p]
    lib.mav_conn_log_close.argtypes = [ctypes.c_void_p]
    lib.mav_log_reader_open.restype = ctypes.c_void_p
    lib.mav_log_reader_open.argtypes = [ctypes.c_char_p]
    lib.mav_log_reader_next.restype = ctypes.c_int
    lib.mav_log_reader_next.argtypes = [
        ctypes.c_void_p, ctypes.POINTER(ctypes.c_uint64),
        ctypes.POINTER(ctypes.c_uint32), ctypes.c_char_p,
        ctypes.POINTER(ctypes.c_uint8),
    ]
    lib.mav_log_reader_close.argtypes = [ctypes.c_void_p]
    lib.mav_ftp_server_create.restype = ctypes.c_void_p
    lib.mav_ftp_server_create.argtypes = [ctypes.c_void_p, ctypes.c_char_p]
    lib.mav_ftp_server_ops.restype = ctypes.c_uint64
    lib.mav_ftp_server_ops.argtypes = [ctypes.c_void_p]
    lib.mav_ftp_server_destroy.argtypes = [ctypes.c_void_p]
    lib.mav_ftp_client_create.restype = ctypes.c_void_p
    lib.mav_ftp_client_create.argtypes = [ctypes.c_void_p]
    lib.mav_ftp_client_destroy.argtypes = [ctypes.c_void_p]
    lib.mav_ftp_list.restype = ctypes.c_int
    lib.mav_ftp_list.argtypes = [
        ctypes.c_void_p, ctypes.c_char_p, ctypes.c_char_p, ctypes.c_int,
        ctypes.c_double,
    ]
    lib.mav_ftp_get.restype = ctypes.c_long
    lib.mav_ftp_get.argtypes = [
        ctypes.c_void_p, ctypes.c_char_p, ctypes.c_char_p, ctypes.c_double,
    ]
    lib.mav_ftp_put.restype = ctypes.c_long
    lib.mav_ftp_put.argtypes = [
        ctypes.c_void_p, ctypes.c_char_p, ctypes.c_char_p, ctypes.c_double,
    ]
    for name in ("mav_ftp_remove", "mav_ftp_mkdir", "mav_ftp_rmdir"):
        fn = getattr(lib, name)
        fn.restype = ctypes.c_int
        fn.argtypes = [ctypes.c_void_p, ctypes.c_char_p, ctypes.c_double]
    lib.mav_ftp_crc32.restype = ctypes.c_int
    lib.mav_ftp_crc32.argtypes = [
        ctypes.c_void_p, ctypes.c_char_p, ctypes.POINTER(ctypes.c_uint32),
        ctypes.c_double,
    ]
    lib.mav_video_server_create.restype = ctypes.c_void_p
    lib.mav_video_server_create.argtypes = [ctypes.c_void_p]
    lib.mav_video_server_has_request.restype = ctypes.c_int
    lib.mav_video_server_has_request.argtypes = [
        ctypes.c_void_p, ctypes.POINTER(ctypes.c_int),
        ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_int),
    ]
    lib.mav_video_server_send_frame.restype = ctypes.c_int
    lib.mav_video_server_send_frame.argtypes = [
        ctypes.c_void_p, ctypes.c_char_p, ctypes.c_uint32, ctypes.c_uint16,
        ctypes.c_uint16, ctypes.c_uint8, ctypes.c_uint8,
    ]
    lib.mav_video_server_destroy.argtypes = [ctypes.c_void_p]
    lib.mav_video_client_create.restype = ctypes.c_void_p
    lib.mav_video_client_create.argtypes = [ctypes.c_void_p]
    lib.mav_video_client_request.restype = ctypes.c_int
    lib.mav_video_client_request.argtypes = [
        ctypes.c_void_p, ctypes.c_int, ctypes.c_float, ctypes.c_int,
        ctypes.c_uint8, ctypes.c_uint8,
    ]
    lib.mav_video_client_read_frame.restype = ctypes.c_int
    lib.mav_video_client_read_frame.argtypes = [
        ctypes.c_void_p, ctypes.c_char_p, ctypes.c_int,
        ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
        ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
        ctypes.POINTER(ctypes.c_float),
    ]
    lib.mav_video_client_destroy.argtypes = [ctypes.c_void_p]
    lib.adhoc_create_local.restype = ctypes.c_void_p
    lib.adhoc_create_local.argtypes = [ctypes.c_int]
    lib.adhoc_create_remote.restype = ctypes.c_void_p
    lib.adhoc_create_remote.argtypes = [ctypes.c_char_p, ctypes.c_int]
    lib.adhoc_send.restype = ctypes.c_int
    lib.adhoc_send.argtypes = [ctypes.c_void_p, ctypes.c_char_p, ctypes.c_int]
    lib.adhoc_recv.restype = ctypes.c_int
    lib.adhoc_recv.argtypes = [
        ctypes.c_void_p, ctypes.c_char_p, ctypes.c_int, ctypes.c_double,
    ]
    lib.adhoc_received.restype = ctypes.c_uint64
    lib.adhoc_received.argtypes = [ctypes.c_void_p]
    lib.adhoc_destroy.argtypes = [ctypes.c_void_p]
    lib._mavconn_bound = True


class MavConnection:
    """Live MAVLink endpoint (runtime/mavlink_conn.cpp): socket + receive
    thread + typed vehicle-state latches + heartbeat watchdog + periodic
    HEARTBEAT / SET_ATTITUDE_TARGET streams on the native scheduler.
    Transports: point-to-point UDP (the constructor), TCP server/client
    (:meth:`tcp_server` / :meth:`tcp_client`) and serial (:meth:`serial`) —
    the connectLocalUdp / connectLocalTcp / connectRemoteTcp /
    connectSerial surface of the reference's MavLinkCom.  Microservices on
    top: FTP (:class:`MavFtpServer`/:class:`MavFtpClient`), tlog capture
    (:meth:`log_open` + :func:`read_tlog`), PARAM, and the periodic
    HEARTBEAT/setpoint streams.

    The MavLinkConnection/MavLinkVehicle role of the reference's MavLinkCom
    (MavLinkCom/src/MavLinkConnection.cpp, MavLinkVehicle.cpp), whose typed
    state feed the bfctrl input adapter consumes
    (betaflight_ctrl/src/input.cpp:15-104)."""

    def __init__(self, local_port: int, remote_host: str, remote_port: int,
                 sysid: int = 255, compid: int = 0):
        self._lib = _load()
        lib = self._lib
        _bind_mavconn(lib)
        self._ptr = lib.mav_conn_create(
            local_port, remote_host.encode(), remote_port, sysid, compid
        )
        if not self._ptr:
            raise OSError(f"mav_conn_create failed (port {local_port})")

    @classmethod
    def tcp_server(cls, port: int, timeout_s: float = 5.0,
                   sysid: int = 1, compid: int = 1) -> "MavConnection":
        """Listen on ``port`` and block up to ``timeout_s`` for ONE peer
        (MavLinkCom connectLocalTcp semantics)."""
        lib = _load()
        _bind_mavconn(lib)
        ptr = lib.mav_conn_create_tcp_server(port, timeout_s, sysid, compid)
        if not ptr:
            raise OSError(f"mav_conn_create_tcp_server failed (port {port})")
        self = cls.__new__(cls)
        self._lib = lib
        self._ptr = ptr
        return self

    @classmethod
    def tcp_client(cls, host: str, port: int, timeout_s: float = 5.0,
                   sysid: int = 255, compid: int = 0) -> "MavConnection":
        """Connect to ``host:port``, retrying until ``timeout_s``
        (MavLinkCom connectRemoteTcp semantics)."""
        lib = _load()
        _bind_mavconn(lib)
        ptr = lib.mav_conn_create_tcp_client(
            host.encode(), port, timeout_s, sysid, compid
        )
        if not ptr:
            raise OSError(f"mav_conn_create_tcp_client failed ({host}:{port})")
        self = cls.__new__(cls)
        self._lib = lib
        self._ptr = ptr
        return self

    @classmethod
    def serial(cls, device: str, baud: int = 115200,
               sysid: int = 255, compid: int = 0) -> "MavConnection":
        """Open a serial MAVLink endpoint on a tty (raw 8N1 at ``baud``) —
        the MavLinkCom connectSerial surface
        (MavLinkCom/src/serial_com/SerialPort.cpp).  Works on real UARTs
        and pty pairs (how the loopback tests drive it)."""
        lib = _load()
        _bind_mavconn(lib)
        ptr = lib.mav_conn_create_serial(device.encode(), baud, sysid, compid)
        if not ptr:
            raise OSError(f"mav_conn_create_serial failed ({device})")
        self = cls.__new__(cls)
        self._lib = lib
        self._ptr = ptr
        return self

    def log_open(self, path: str):
        """Start capturing every frame (both directions) to ``path`` in tlog
        format (8-byte big-endian epoch-us + raw v2 frame) — the
        MavLinkFileLog::openForWriting role."""
        if self._lib.mav_conn_log_open(self._ptr, path.encode()) != 0:
            raise OSError(f"mav_conn_log_open failed ({path})")

    def log_close(self):
        self._lib.mav_conn_log_close(self._ptr)

    def send_heartbeat(self):
        self._lib.mav_conn_send_heartbeat(self._ptr)

    def set_attitude_target(self, q, rates=(0.0, 0.0, 0.0), thrust=0.0,
                            type_mask=0x07, send_now=True):
        qf = (ctypes.c_float * 4)(*[float(v) for v in q])
        rf = (ctypes.c_float * 3)(*[float(v) for v in rates])
        self._lib.mav_conn_set_attitude_target(
            self._ptr, qf, rf, float(thrust), type_mask, 1 if send_now else 0
        )

    def send_attitude(self, time_s, rpy, rates=(0.0, 0.0, 0.0)):
        rf = (ctypes.c_float * 3)(*[float(v) for v in rpy])
        vf = (ctypes.c_float * 3)(*[float(v) for v in rates])
        return self._lib.mav_conn_send_attitude(self._ptr, float(time_s), rf, vf)

    def send_local_position(self, time_s, xyz, vxyz=(0.0, 0.0, 0.0)):
        pf = (ctypes.c_float * 3)(*[float(v) for v in xyz])
        vf = (ctypes.c_float * 3)(*[float(v) for v in vxyz])
        return self._lib.mav_conn_send_local_position(
            self._ptr, float(time_s), pf, vf
        )

    def send_command_long(self, command, params=(), target_system=1,
                          target_component=1):
        p7 = (ctypes.c_float * 7)(*([float(v) for v in params] + [0.0] * 7)[:7])
        return self._lib.mav_conn_send_command_long(
            self._ptr, p7, int(command), target_system, target_component
        )

    def start_streams(self, hb_hz=1.0, att_hz=50.0):
        """Reference rates: 1 Hz HEARTBEAT, 50 Hz offboard attitude stream."""
        self._lib.mav_conn_start_streams(self._ptr, float(hb_hz), float(att_hz))

    def heartbeat_age(self) -> float:
        return float(self._lib.mav_conn_heartbeat_age(self._ptr))

    def link_ok(self, timeout_s: float = 2.0) -> bool:
        return bool(self._lib.mav_conn_link_ok(self._ptr, float(timeout_s)))

    def stats(self) -> dict:
        out = (ctypes.c_uint64 * 8)()
        self._lib.mav_conn_stats(self._ptr, out)
        keys = ("rx_frames", "crc_errors", "unknown", "heartbeats",
                "attitudes", "local_positions", "attitude_targets",
                "commands")
        return dict(zip(keys, [int(v) for v in out]))

    def _typed(self, name, n):
        out = (ctypes.c_float * n)()
        count = getattr(self._lib, name)(self._ptr, out)
        return count, [float(v) for v in out]

    def attitude(self):
        """(count, [time_s, roll, pitch, yaw, p, q, r]) — latest ATTITUDE."""
        return self._typed("mav_conn_attitude", 7)

    def local_position(self):
        """(count, [time_s, x, y, z, vx, vy, vz]) — latest LOCAL_POSITION_NED."""
        return self._typed("mav_conn_local_position", 7)

    def attitude_target(self):
        """(count, [time_s, q0..q3, p, q, r, thrust, type_mask]) — latest
        SET_ATTITUDE_TARGET received (vehicle role)."""
        return self._typed("mav_conn_attitude_target", 10)

    def command_long(self):
        """(count, [param1..7, command]) — latest COMMAND_LONG received."""
        return self._typed("mav_conn_command_long", 8)

    def close(self):
        if getattr(self, "_ptr", None):
            self._lib.mav_conn_destroy(self._ptr)
            self._ptr = None

    def __del__(self):
        self.close()


def read_tlog(path: str):
    """Iterate a tlog written by :meth:`MavConnection.log_open`, yielding
    ``(timestamp_us, msgid, payload_bytes)`` — the
    MavLinkFileLog::openForReading / read surface (MavLinkCom/src/
    MavLinkLog.cpp)."""
    lib = _load()
    _bind_mavconn(lib)
    h = lib.mav_log_reader_open(path.encode())
    if not h:
        raise OSError(f"mav_log_reader_open failed ({path})")
    try:
        while True:
            ts = ctypes.c_uint64()
            msgid = ctypes.c_uint32()
            payload = ctypes.create_string_buffer(300)
            plen = ctypes.c_uint8()
            r = lib.mav_log_reader_next(
                h, ctypes.byref(ts), ctypes.byref(msgid), payload,
                ctypes.byref(plen)
            )
            if r == 0:
                return
            if r < 0:
                raise IOError(f"corrupt tlog record in {path}")
            yield int(ts.value), int(msgid.value), payload.raw[: plen.value]
    finally:
        lib.mav_log_reader_close(h)


class MavFtpServer:
    """MAVLink-FTP responder rooted at a local directory, serving
    list/read/write/remove/mkdir/rmdir/crc32 over FILE_TRANSFER_PROTOCOL on
    an existing :class:`MavConnection` (the vehicle-side role the
    reference's MavLinkFtpClient talks to; runtime/mavlink_ftp.cpp)."""

    def __init__(self, conn: MavConnection, root: str):
        self._lib = conn._lib
        self._ptr = self._lib.mav_ftp_server_create(conn._ptr, root.encode())
        if not self._ptr:
            raise OSError("mav_ftp_server_create failed (subscriber slots?)")

    def ops_served(self) -> int:
        return int(self._lib.mav_ftp_server_ops(self._ptr))

    def close(self):
        if getattr(self, "_ptr", None):
            self._lib.mav_ftp_server_destroy(self._ptr)
            self._ptr = None

    def __del__(self):
        self.close()


class MavFtpClient:
    """Blocking MAVLink-FTP client on an existing :class:`MavConnection` —
    the MavLinkFtpClient surface (MavLinkCom/include/MavLinkFtpClient.hpp:
    list/get/put/remove/mkdir/rmdir) with resend-on-timeout transactions."""

    def __init__(self, conn: MavConnection):
        self._lib = conn._lib
        self._ptr = self._lib.mav_ftp_client_create(conn._ptr)
        if not self._ptr:
            raise OSError("mav_ftp_client_create failed (subscriber slots?)")

    def list(self, path: str = "/", timeout_s: float = 3.0):
        """Directory entries as (kind, name, size) tuples; kind 'D'|'F'."""
        buf = ctypes.create_string_buffer(65536)
        n = self._lib.mav_ftp_list(
            self._ptr, path.encode(), buf, len(buf), timeout_s
        )
        if n < 0:
            raise OSError(f"ftp list({path}) failed: {n}")
        out = []
        for line in buf.value.decode().splitlines():
            if not line:
                continue
            kind, rest = line[0], line[1:]
            if kind == "F" and "\t" in rest:
                name, size = rest.rsplit("\t", 1)
                out.append((kind, name, int(size)))
            else:
                out.append((kind, rest, 0))
        return out

    def get(self, remote: str, local: str, timeout_s: float = 5.0) -> int:
        n = self._lib.mav_ftp_get(
            self._ptr, remote.encode(), local.encode(), timeout_s
        )
        if n < 0:
            raise OSError(f"ftp get({remote}) failed: {n}")
        return int(n)

    def put(self, local: str, remote: str, timeout_s: float = 5.0) -> int:
        n = self._lib.mav_ftp_put(
            self._ptr, local.encode(), remote.encode(), timeout_s
        )
        if n < 0:
            raise OSError(f"ftp put({remote}) failed: {n}")
        return int(n)

    def remove(self, path: str, timeout_s: float = 3.0):
        rc = self._lib.mav_ftp_remove(self._ptr, path.encode(), timeout_s)
        if rc != 0:
            raise OSError(f"ftp remove({path}) failed: {rc}")

    def mkdir(self, path: str, timeout_s: float = 3.0):
        rc = self._lib.mav_ftp_mkdir(self._ptr, path.encode(), timeout_s)
        if rc != 0:
            raise OSError(f"ftp mkdir({path}) failed: {rc}")

    def rmdir(self, path: str, timeout_s: float = 3.0):
        rc = self._lib.mav_ftp_rmdir(self._ptr, path.encode(), timeout_s)
        if rc != 0:
            raise OSError(f"ftp rmdir({path}) failed: {rc}")

    def crc32(self, path: str, timeout_s: float = 3.0) -> int:
        out = ctypes.c_uint32()
        rc = self._lib.mav_ftp_crc32(
            self._ptr, path.encode(), ctypes.byref(out), timeout_s
        )
        if rc != 0:
            raise OSError(f"ftp crc32({path}) failed: {rc}")
        return int(out.value)

    def close(self):
        if getattr(self, "_ptr", None):
            self._lib.mav_ftp_client_destroy(self._ptr)
            self._ptr = None

    def __del__(self):
        self.close()


class VideoFrame:
    """One reassembled image (MavLinkVideoClient::MavLinkVideoFrame,
    MavLinkCom/include/MavLinkVideoStream.hpp:28-36)."""

    __slots__ = ("data", "width", "height", "type", "quality", "progress")

    def __init__(self, data, width, height, type_, quality, progress):
        self.data = data
        self.width = width
        self.height = height
        self.type = type_
        self.quality = quality
        self.progress = progress


class MavVideoServer:
    """Vehicle-side video streamer on an existing :class:`MavConnection` —
    the MavLinkVideoServer surface (MavLinkCom/include/MavLinkVideoStream.hpp:
    45-64): poll :meth:`has_request` for DO_CONTROL_VIDEO commands, answer
    with :meth:`send_frame` (one DATA_TRANSMISSION_HANDSHAKE + N
    ENCAPSULATED_DATA packets; runtime/mavlink_video.cpp)."""

    def __init__(self, conn: MavConnection):
        self._lib = conn._lib
        self._ptr = self._lib.mav_video_server_create(conn._ptr)
        if not self._ptr:
            raise OSError("mav_video_server_create failed (subscriber slots?)")

    def has_request(self):
        """Pending request as (camera_id, every_n_sec, save_locally), or
        None (MavLinkVideoServer::hasVideoRequest — consumed on read)."""
        cam = ctypes.c_int()
        interval = ctypes.c_float()
        save = ctypes.c_int()
        if not self._lib.mav_video_server_has_request(
            self._ptr, ctypes.byref(cam), ctypes.byref(interval),
            ctypes.byref(save)
        ):
            return None
        return int(cam.value), float(interval.value), bool(save.value)

    def send_frame(self, data: bytes, width: int, height: int,
                   image_type: int = 0, quality: int = 90) -> int:
        """Stream one frame; returns the MAVLink packet count sent."""
        n = self._lib.mav_video_server_send_frame(
            self._ptr, data, len(data), width, height, image_type, quality
        )
        if n < 0:
            raise OSError("mav_video_server_send_frame failed")
        return int(n)

    def close(self):
        if getattr(self, "_ptr", None):
            self._lib.mav_video_server_destroy(self._ptr)
            self._ptr = None

    def __del__(self):
        self.close()


class MavVideoClient:
    """GCS-side video receiver — the MavLinkVideoClient surface
    (MavLinkCom/include/MavLinkVideoStream.hpp:22-43): ask with
    :meth:`request_video`, poll :meth:`read_next_frame` for the newest
    complete image (handed out once, with in-flight assembly progress)."""

    _CAP = 16 * 1024 * 1024

    def __init__(self, conn: MavConnection):
        self._lib = conn._lib
        self._ptr = self._lib.mav_video_client_create(conn._ptr)
        if not self._ptr:
            raise OSError("mav_video_client_create failed (subscriber slots?)")
        self._buf = ctypes.create_string_buffer(self._CAP)

    def request_video(self, camera_id: int, every_n_sec: float,
                      save_locally: bool = False,
                      target_system: int = 1, target_component: int = 1):
        rc = self._lib.mav_video_client_request(
            self._ptr, camera_id, every_n_sec, int(save_locally),
            target_system, target_component
        )
        if rc != 0:
            raise OSError("mav_video_client_request failed")

    def read_next_frame(self):
        """Newest complete :class:`VideoFrame`, or None if nothing new
        (then .progress of the frame being assembled is lost — poll again)."""
        w = ctypes.c_int()
        h = ctypes.c_int()
        t = ctypes.c_int()
        q = ctypes.c_int()
        prog = ctypes.c_float()
        n = self._lib.mav_video_client_read_frame(
            self._ptr, self._buf, self._CAP, ctypes.byref(w), ctypes.byref(h),
            ctypes.byref(t), ctypes.byref(q), ctypes.byref(prog)
        )
        if n < 0:
            raise OSError("frame larger than client buffer")
        if n == 0:
            return None
        return VideoFrame(self._buf.raw[:n], int(w.value), int(h.value),
                          int(t.value), int(q.value), float(prog.value))

    def progress(self) -> float:
        """Assembly fraction (0..1) of the frame currently in flight."""
        w = ctypes.c_int()
        h = ctypes.c_int()
        t = ctypes.c_int()
        q = ctypes.c_int()
        prog = ctypes.c_float()
        # peek: read_frame with fresh=False only fills progress
        self._lib.mav_video_client_read_frame(
            self._ptr, None, 0, ctypes.byref(w), ctypes.byref(h),
            ctypes.byref(t), ctypes.byref(q), ctypes.byref(prog)
        )
        return float(prog.value)

    def close(self):
        if getattr(self, "_ptr", None):
            self._lib.mav_video_client_destroy(self._ptr)
            self._ptr = None

    def __del__(self):
        self.close()


class AdHocConnection:
    """Raw-datagram UDP link to a NON-MAVLink peer — the reference's
    AdHocConnection (MavLinkCom/include/AdHocConnection.hpp): ``local``
    binds a port and latches the first sender as the reply address
    (connectLocalUdp); ``remote`` targets a known address from an ephemeral
    port (connectRemoteUdp).  Messages are raw bytes, no framing/CRC
    (runtime/adhoc.cpp)."""

    _CAP = 65536

    def __init__(self, ptr, lib):
        self._ptr = ptr
        self._lib = lib
        self._buf = ctypes.create_string_buffer(self._CAP)

    @classmethod
    def local(cls, local_port: int) -> "AdHocConnection":
        lib = _load()
        _bind_mavconn(lib)
        ptr = lib.adhoc_create_local(local_port)
        if not ptr:
            raise OSError(f"adhoc_create_local failed (port {local_port})")
        return cls(ptr, lib)

    @classmethod
    def remote(cls, host: str, port: int) -> "AdHocConnection":
        lib = _load()
        _bind_mavconn(lib)
        ptr = lib.adhoc_create_remote(host.encode(), port)
        if not ptr:
            raise OSError(f"adhoc_create_remote failed ({host}:{port})")
        return cls(ptr, lib)

    def send(self, data: bytes) -> int:
        """Bytes sent; raises if no remote is known yet (local mode before
        the first inbound datagram)."""
        n = self._lib.adhoc_send(self._ptr, data, len(data))
        if n < 0:
            raise OSError("adhoc_send: no remote latched yet")
        return int(n)

    def recv(self, timeout_s: float = 1.0):
        """Oldest queued datagram as bytes, or None on timeout."""
        n = self._lib.adhoc_recv(self._ptr, self._buf, self._CAP, timeout_s)
        return self._buf.raw[:n] if n > 0 else None

    @property
    def received(self) -> int:
        return int(self._lib.adhoc_received(self._ptr))

    def close(self):
        if getattr(self, "_ptr", None):
            self._lib.adhoc_destroy(self._ptr)
            self._ptr = None

    def __del__(self):
        self.close()
