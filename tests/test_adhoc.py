"""Ad-hoc raw-datagram connection over real UDP sockets.

Covers the reference's AdHocConnection
(MavLinkCom/include/AdHocConnection.hpp / src/impl/AdHocConnectionImpl.cpp):
raw non-MAVLink datagrams, with connectLocalUdp's latch-the-first-sender
reply semantics and connectRemoteUdp's fixed-target mode.
"""

import socket
import time

import pytest

from avoid_mpc_tpu.runtime.native import AdHocConnection, native_available

pytestmark = pytest.mark.skipif(
    not native_available(), reason="native runtime unavailable"
)


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_remote_to_local_latch_and_reply():
    """remote -> local: the listener latches the first sender and replies
    back to it (connectLocalUdp semantics)."""
    port = _free_port()
    listener = AdHocConnection.local(port)
    caller = AdHocConnection.remote("127.0.0.1", port)
    try:
        # local side knows no remote yet -> send refuses
        with pytest.raises(OSError):
            listener.send(b"premature")

        caller.send(b"hello-adhoc")
        got = listener.recv(timeout_s=3.0)
        assert got == b"hello-adhoc"

        # the sender is latched; the reply reaches the caller's ephemeral port
        listener.send(b"welcome")
        assert caller.recv(timeout_s=3.0) == b"welcome"
        assert listener.received == 1 and caller.received == 1
    finally:
        caller.close()
        listener.close()


def test_raw_bytes_no_framing():
    """Payloads are arbitrary bytes (no MAVLink magic/CRC), order preserved."""
    port = _free_port()
    listener = AdHocConnection.local(port)
    caller = AdHocConnection.remote("127.0.0.1", port)
    try:
        msgs = [bytes([i]) * (i + 1) for i in range(5)] + [b"\xfd\x00broken"]
        for m in msgs:
            caller.send(m)
        for m in msgs:
            assert listener.recv(timeout_s=3.0) == m
        assert listener.recv(timeout_s=0.05) is None  # queue drained
    finally:
        caller.close()
        listener.close()
