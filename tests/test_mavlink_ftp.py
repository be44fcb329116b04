"""MAVLink FTP microservice, tlog capture, and serial transport.

Covers the remaining MavLinkCom surface (reference:
MavLinkCom/src/MavLinkFtpClient.cpp — list/get/put/remove/mkdir/rmdir;
MavLinkCom/src/MavLinkLog.cpp — MavLinkFileLog write/read;
MavLinkCom/src/serial_com/SerialPort.cpp — serial transport), all exercised
through real endpoints: two live UDP sockets for FTP and the log, and a
pair of pseudo-terminals bridged by a relay for serial (the same tty path a
real UART would take, minus the wire).
"""

import os
import pty
import socket
import threading
import time
import zlib

import numpy as np
import pytest

from avoid_mpc_tpu.runtime.native import (
    MavConnection,
    MavFtpClient,
    MavFtpServer,
    native_available,
    read_tlog,
)

pytestmark = pytest.mark.skipif(
    not native_available(), reason="native runtime unavailable"
)


def _free_ports(n):
    socks = [socket.socket() for _ in range(n)]
    for s in socks:
        s.bind(("127.0.0.1", 0))
    ports = [s.getsockname()[1] for s in socks]
    for s in socks:
        s.close()
    return ports


def _wait(pred, timeout=3.0):
    deadline = time.monotonic() + timeout
    while time.monotonic() < deadline:
        if pred():
            return True
        time.sleep(0.01)
    return False


@pytest.fixture
def pair():
    pa, pb = _free_ports(2)
    gcs = MavConnection(pa, "127.0.0.1", pb, sysid=255, compid=0)
    veh = MavConnection(pb, "127.0.0.1", pa, sysid=1, compid=1)
    yield gcs, veh
    gcs.close()
    veh.close()


def test_ftp_put_get_roundtrip(pair, tmp_path):
    """put -> list -> crc32 -> get -> byte-identical, over real sockets.
    The payload spans many 239-byte FTP chunks."""
    gcs, veh = pair
    root = tmp_path / "vehicle_fs"
    root.mkdir()
    server = MavFtpServer(veh, str(root))
    client = MavFtpClient(gcs)
    try:
        rng = np.random.default_rng(0)
        blob = rng.integers(0, 256, size=5000, dtype=np.uint8).tobytes()
        src = tmp_path / "src.bin"
        src.write_bytes(blob)

        sent = client.put(str(src), "flight1.bin", timeout_s=5.0)
        assert sent == len(blob)
        assert (root / "flight1.bin").read_bytes() == blob

        entries = client.list("/")
        assert ("F", "flight1.bin", len(blob)) in entries

        # remote CRC32 matches the local standard crc32
        assert client.crc32("flight1.bin") == (zlib.crc32(blob) & 0xFFFFFFFF)

        dst = tmp_path / "dst.bin"
        got = client.get("flight1.bin", str(dst), timeout_s=5.0)
        assert got == len(blob)
        assert dst.read_bytes() == blob
        assert server.ops_served() > len(blob) // 239  # real chunked traffic
    finally:
        client.close()
        server.close()


def test_ftp_dirs_remove_and_errors(pair, tmp_path):
    gcs, veh = pair
    root = tmp_path / "fs"
    root.mkdir()
    (root / "keep.txt").write_text("x")
    server = MavFtpServer(veh, str(root))
    client = MavFtpClient(gcs)
    try:
        client.mkdir("logs")
        assert (root / "logs").is_dir()
        entries = dict(
            (name, kind) for kind, name, _ in client.list("/")
        )
        assert entries == {"logs": "D", "keep.txt": "F"}

        client.rmdir("logs")
        assert not (root / "logs").exists()
        client.remove("keep.txt")
        assert not (root / "keep.txt").exists()

        # missing file -> NAK FileNotFound surfaces as an error
        with pytest.raises(OSError):
            client.get("nope.bin", str(tmp_path / "nope.bin"), timeout_s=1.0)
        # path escape is rejected (server never serves outside its root)
        with pytest.raises(OSError):
            client.get("../escape", str(tmp_path / "esc"), timeout_s=1.0)
    finally:
        client.close()
        server.close()


def test_tlog_capture_and_replay(pair, tmp_path):
    """Both directions captured; reader returns (ts, msgid, payload) in
    order with sane timestamps (MavLinkFileLog round trip)."""
    gcs, veh = pair
    log = tmp_path / "flight.tlog"
    gcs.log_open(str(log))
    t0 = time.time()

    veh.send_heartbeat()  # rx on gcs -> logged
    veh.send_attitude(2.0, (0.1, -0.2, 0.3))
    assert _wait(lambda: gcs.attitude()[0] >= 1)
    gcs.set_attitude_target((1, 0, 0, 0), thrust=0.55, send_now=True)  # tx
    time.sleep(0.05)
    gcs.log_close()

    records = list(read_tlog(str(log)))
    msgids = [m for _, m, _ in records]
    assert 0 in msgids  # HEARTBEAT (rx)
    assert 30 in msgids  # ATTITUDE (rx)
    assert 82 in msgids  # SET_ATTITUDE_TARGET (tx)
    for ts_us, _, payload in records:
        assert abs(ts_us / 1e6 - t0) < 60.0  # wall-clock microseconds
        assert len(payload) >= 1
    # timestamps are monotone non-decreasing
    ts = [t for t, _, _ in records]
    assert ts == sorted(ts)


def _pty_bridge():
    """Two pty pairs bridged by relay threads: the two slave tty paths
    behave like the two ends of a serial cable."""
    m1, s1 = pty.openpty()
    m2, s2 = pty.openpty()

    def pump(src, dst):
        try:
            while True:
                data = os.read(src, 4096)
                if not data:
                    return
                os.write(dst, data)
        except OSError:
            return

    for a, b in ((m1, m2), (m2, m1)):
        t = threading.Thread(target=pump, args=(a, b), daemon=True)
        t.start()
    return (m1, m2), (os.ttyname(s1), os.ttyname(s2))


def test_serial_transport_exchange():
    """Serial endpoints over a pty 'cable': raw-tty open, framing across
    byte-dribble boundaries, typed decode + watchdog — the connectSerial
    path of MavLinkCom."""
    masters, (dev_a, dev_b) = _pty_bridge()
    ctrl = MavConnection.serial(dev_a, baud=115200, sysid=255, compid=0)
    veh = MavConnection.serial(dev_b, baud=115200, sysid=1, compid=1)
    try:
        veh.send_heartbeat()
        assert _wait(lambda: ctrl.link_ok(2.0))
        veh.send_local_position(1.5, (3.0, -1.0, -2.0), (1.0, 0.0, 0.0))
        veh.send_attitude(1.5, (0.02, -0.04, 0.8))
        assert _wait(lambda: ctrl.local_position()[0] >= 1)
        assert _wait(lambda: ctrl.attitude()[0] >= 1)
        _, lpn = ctrl.local_position()
        np.testing.assert_allclose(lpn[1:4], (3.0, -1.0, -2.0), atol=1e-6)

        ctrl.set_attitude_target((1, 0, 0, 0), thrust=0.33, send_now=True)
        assert _wait(lambda: veh.attitude_target()[0] >= 1)
        _, tgt = veh.attitude_target()
        assert tgt[8] == pytest.approx(0.33, abs=1e-6)
        assert ctrl.stats()["crc_errors"] == 0
        assert veh.stats()["crc_errors"] == 0
    finally:
        ctrl.close()
        veh.close()
        for fd in masters:
            os.close(fd)


def test_ftp_over_serial(tmp_path):
    """The FTP microservice is transport-agnostic: the same put/get runs
    over the serial bridge."""
    masters, (dev_a, dev_b) = _pty_bridge()
    gcs = MavConnection.serial(dev_a, sysid=255, compid=0)
    veh = MavConnection.serial(dev_b, sysid=1, compid=1)
    root = tmp_path / "fs"
    root.mkdir()
    server = MavFtpServer(veh, str(root))
    client = MavFtpClient(gcs)
    try:
        blob = bytes(range(256)) * 4  # 1 KB, several chunks
        src = tmp_path / "s.bin"
        src.write_bytes(blob)
        assert client.put(str(src), "s.bin", timeout_s=5.0) == len(blob)
        dst = tmp_path / "d.bin"
        assert client.get("s.bin", str(dst), timeout_s=5.0) == len(blob)
        assert dst.read_bytes() == blob
    finally:
        client.close()
        server.close()
        gcs.close()
        veh.close()
        for fd in masters:
            os.close(fd)
