"""Native host runtime tests (C++ via ctypes)."""

import time

import numpy as np
import pytest

from avoid_mpc_tpu.runtime import FrameRing, HostKDTree, Scheduler, native_available

pytestmark = pytest.mark.skipif(
    not native_available(), reason="native runtime not built"
)


def test_frame_ring_fifo():
    ring = FrameRing(slot_bytes=12, capacity=4)
    for i in range(3):
        ring.push(np.full(3, i, dtype=np.float32), stamp=float(i))
    assert len(ring) == 3
    data, stamp = ring.pop()
    np.testing.assert_allclose(data.view(np.float32), 0.0)
    assert stamp == 0.0
    assert len(ring) == 2


def test_frame_ring_overflow_drops_oldest():
    ring = FrameRing(slot_bytes=4, capacity=2)
    for i in range(5):
        ring.push(np.asarray([i], dtype=np.float32), stamp=float(i))
    assert ring.dropped == 3
    data, stamp = ring.pop()
    assert stamp == 3.0  # oldest surviving frame


def test_frame_ring_pop_latest():
    ring = FrameRing(slot_bytes=4, capacity=8)
    for i in range(5):
        ring.push(np.asarray([i], dtype=np.float32), stamp=float(i))
    data, stamp = ring.pop_latest()
    assert stamp == 4.0
    assert len(ring) == 0


def test_kdtree_matches_bruteforce():
    rng = np.random.default_rng(0)
    pts = rng.standard_normal((5000, 3)).astype(np.float32)
    tree = HostKDTree(pts)
    q = rng.standard_normal((64, 3)).astype(np.float32)
    d, idx = tree.query(q, k=5)
    d2 = ((q[:, None, :] - pts[None]) ** 2).sum(-1)
    want_idx = np.argsort(d2, axis=1)[:, :5]
    want_d = np.sqrt(np.take_along_axis(d2, want_idx, axis=1))
    np.testing.assert_allclose(d, want_d, rtol=1e-4, atol=1e-5)
    # indices can differ on exact ties; distances are the contract
    assert (np.abs(np.sort(d, axis=1) - d) < 1e-6).all()


def test_kdtree_fewer_points_than_k():
    tree = HostKDTree(np.asarray([[1.0, 2, 3]], dtype=np.float32))
    d, idx = tree.query(np.zeros((1, 3), dtype=np.float32), k=3)
    assert np.isfinite(d[0, 0]) and np.isinf(d[0, 1:]).all()
    assert idx[0, 0] == 0 and (idx[0, 1:] == -1).all()


def test_scheduler_runs_and_measures():
    counter = {"n": 0}

    def tick():
        counter["n"] += 1
        time.sleep(0.002)

    s = Scheduler()
    t = s.add_task(tick, period_s=0.01)
    s.start()
    time.sleep(0.25)
    s.stop()
    assert s.ticks(t) >= 15, s.ticks(t)
    assert 0.001 < s.latency(t) < 0.05
    assert counter["n"] == s.ticks(t)


def test_mavlink_roundtrip():
    """Pack SET_ATTITUDE_TARGET, parse it back byte-by-byte, verify fields."""
    import struct

    from avoid_mpc_tpu.runtime import MavlinkCodec

    codec = MavlinkCodec()
    q = [0.9238795, 0.0, 0.0, 0.3826834]  # 45 deg yaw
    frame = codec.pack_set_attitude_target(
        12345, q, 0.1, -0.2, 0.3, 0.55, type_mask=0x07
    )
    assert frame[0] == 0xFD and len(frame) >= 12
    parser = MavlinkCodec()
    frames = parser.parse(frame)
    assert len(frames) == 1
    msgid, payload = frames[0]
    assert msgid == MavlinkCodec.SET_ATTITUDE_TARGET
    # v2 truncates trailing zeros; pad back for unpacking
    payload = payload + b"\x00" * (39 - len(payload))
    t, qw, qx, qy, qz, rr, pr, yr, thrust = struct.unpack("<Iffffffff", payload[:36])
    assert t == 12345
    np.testing.assert_allclose([qw, qx, qy, qz], q, rtol=1e-6)
    np.testing.assert_allclose([rr, pr, yr, thrust], [0.1, -0.2, 0.3, 0.55], rtol=1e-6)
    assert payload[36] == 1 and payload[38] == 0x07


def test_mavlink_crc_rejects_corruption():
    from avoid_mpc_tpu.runtime import MavlinkCodec

    codec = MavlinkCodec()
    frame = bytearray(codec.pack_set_attitude_target(1, [1, 0, 0, 0], 0, 0, 0, 0.5))
    frame[12] ^= 0xFF  # corrupt payload
    parser = MavlinkCodec()
    assert parser.parse(bytes(frame)) == []


def test_mavlink_stream_with_garbage():
    """Frames embedded in garbage bytes are still recovered."""
    from avoid_mpc_tpu.runtime import MavlinkCodec

    codec = MavlinkCodec()
    f1 = codec.pack_set_attitude_target(1, [1, 0, 0, 0], 0, 0, 0, 0.3)
    f2 = codec.pack_set_attitude_target(2, [1, 0, 0, 0], 0, 0, 0, 0.4)
    stream = b"\x00\x17" + f1 + b"\xfa\x01" + f2
    parser = MavlinkCodec()
    frames = parser.parse(stream)
    assert len(frames) == 2


def test_mavlink_heartbeat_roundtrip():
    """HEARTBEAT (#0) with the PX4-quadrotor identity fields — the 1 Hz
    liveness beacon (MavLinkConnection's heartbeat role)."""
    import struct

    from avoid_mpc_tpu.runtime import MavlinkCodec

    codec = MavlinkCodec()
    frame = codec.pack_heartbeat(custom_mode=0x60000, base_mode=0x80)
    parser = MavlinkCodec()
    frames = parser.parse(frame, msgid_expected=MavlinkCodec.HEARTBEAT)
    assert len(frames) == 1
    msgid, payload = frames[0]
    assert msgid == MavlinkCodec.HEARTBEAT
    payload = payload + b"\x00" * (9 - len(payload))
    custom_mode, type_, autopilot, base_mode, status, ver = struct.unpack(
        "<IBBBBB", payload
    )
    assert custom_mode == 0x60000
    assert (type_, autopilot, base_mode, status, ver) == (2, 12, 0x80, 4, 3)


def test_mavlink_command_long_roundtrip():
    """COMMAND_LONG (#76): ARM (MAV_CMD_COMPONENT_ARM_DISARM=400, param1=1)."""
    import struct

    from avoid_mpc_tpu.runtime import MavlinkCodec

    codec = MavlinkCodec()
    frame = codec.pack_command_long(400, params=[1.0])
    parser = MavlinkCodec()
    frames = parser.parse(frame, msgid_expected=MavlinkCodec.COMMAND_LONG)
    assert len(frames) == 1
    msgid, payload = frames[0]
    assert msgid == MavlinkCodec.COMMAND_LONG
    payload = payload + b"\x00" * (33 - len(payload))
    vals = struct.unpack("<7fHBBB", payload)
    assert vals[0] == 1.0 and all(v == 0 for v in vals[1:7])
    assert vals[7] == 400 and vals[8] == 1 and vals[9] == 1 and vals[10] == 0


def test_sanitizer_stress_harness():
    """Race-detection CI (SURVEY §5): build + run the ASAN/UBSAN and TSAN
    stress binaries (`make -C runtime sanitize`) — concurrent frame-ring
    producers/consumers, parallel KD-tree queries, scheduler threads, and a
    noisy MAVLink decode loop. Any data race, leak, or UB fails the make."""
    import shutil
    import subprocess
    from pathlib import Path

    if shutil.which("g++") is None:
        pytest.skip("no C++ toolchain")
    runtime_dir = Path(__file__).resolve().parents[1] / "runtime"
    proc = subprocess.run(
        ["make", "-C", str(runtime_dir), "sanitize"],
        capture_output=True,
        text=True,
        timeout=300,
    )
    assert proc.returncode == 0, proc.stdout + proc.stderr
    assert "all stress checks passed" in proc.stdout + proc.stderr


def test_mavlink_param_roundtrip():
    """PARAM_SET (#23) + PARAM_VALUE (#22): the onboard-parameter protocol
    (MavLinkParameter read/write surface — e.g. hover_percentage tuning)."""
    import struct

    from avoid_mpc_tpu.runtime import MavlinkCodec

    codec = MavlinkCodec()
    fset = codec.pack_param_set("MPC_XY_VEL_MAX", 12.0)
    fval = codec.pack_param_value("MPC_XY_VEL_MAX", 12.0, param_count=3, param_index=2)

    parser = MavlinkCodec()
    frames = parser.parse(fset, msgid_expected=MavlinkCodec.PARAM_SET)
    assert len(frames) == 1 and frames[0][0] == MavlinkCodec.PARAM_SET
    payload = frames[0][1]
    payload = payload + b"\x00" * (23 - len(payload))
    value, tsys, tcomp = struct.unpack("<fBB", payload[:6])
    pid = payload[6:22].rstrip(b"\x00").decode()
    assert (value, tsys, tcomp, pid, payload[22]) == (12.0, 1, 1, "MPC_XY_VEL_MAX", 9)

    frames = parser.parse(fval, msgid_expected=MavlinkCodec.PARAM_VALUE)
    assert len(frames) == 1 and frames[0][0] == MavlinkCodec.PARAM_VALUE
    payload = frames[0][1]
    payload = payload + b"\x00" * (25 - len(payload))
    value, count, index = struct.unpack("<fHH", payload[:8])
    pid = payload[8:24].rstrip(b"\x00").decode()
    assert (value, count, index, pid, payload[24]) == (12.0, 3, 2, "MPC_XY_VEL_MAX", 9)
