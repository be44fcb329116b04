"""The generated MAVLink dialect table vs the hand-written C wire layer.

The table (tools/gen_mavlink_table.py -> runtime/mav_msgs.py) derives
serialization order, payload lengths, and CRC_EXTRA seeds from the XML
declarations alone (the mavgen algorithm); these tests pin it against (a)
the protocol's known CRC_EXTRA values, (b) the C++ layer's actual frames
round-tripped over a real socket pair.
"""

import socket
import struct
import time

import numpy as np
import pytest

from avoid_mpc_tpu.runtime.mav_msgs import BY_ID, MESSAGES
from avoid_mpc_tpu.runtime.native import MavConnection, native_available
from avoid_mpc_tpu.runtime.tlog_replay import unpack_fields
from avoid_mpc_tpu.tools.gen_mavlink_table import render

# the authoritative CRC_EXTRA values from MAVLink common.xml
KNOWN_CRC_EXTRA = {
    "HEARTBEAT": 50, "PARAM_VALUE": 220, "PARAM_SET": 168, "ATTITUDE": 39,
    "LOCAL_POSITION_NED": 185, "COMMAND_LONG": 152,
    "SET_ATTITUDE_TARGET": 49, "FILE_TRANSFER_PROTOCOL": 84,
    "DATA_TRANSMISSION_HANDSHAKE": 29, "ENCAPSULATED_DATA": 223,
}


def test_crc_extras_match_protocol():
    assert set(KNOWN_CRC_EXTRA) == set(MESSAGES)
    for name, want in KNOWN_CRC_EXTRA.items():
        assert MESSAGES[name].crc_extra == want, name


def test_generated_module_is_current():
    """runtime/mav_msgs.py must be the exact output of the generator —
    editing the table without regenerating fails here."""
    import avoid_mpc_tpu.runtime.mav_msgs as m

    with open(m.__file__.rstrip("c")) as f:
        assert f.read() == render()


def test_struct_formats_are_self_consistent():
    for name, mdef in MESSAGES.items():
        assert struct.calcsize(mdef.fmt) == mdef.wire_len, name
        assert sum(nv for _, nv in mdef.fields) == len(
            struct.unpack(mdef.fmt, b"\x00" * mdef.wire_len)
        ), name


@pytest.mark.skipif(not native_available(), reason="native runtime unavailable")
def test_table_decodes_real_frames():
    """Frames packed by the C++ layer, sent over a real UDP pair, decode
    through the generated table to the field values that were packed."""

    def _ports(n):
        socks = [socket.socket() for _ in range(n)]
        for s in socks:
            s.bind(("127.0.0.1", 0))
        ports = [s.getsockname()[1] for s in socks]
        for s in socks:
            s.close()
        return ports

    import tempfile

    pa, pb = _ports(2)
    a = MavConnection(pa, "127.0.0.1", pb, sysid=255, compid=0)
    b = MavConnection(pb, "127.0.0.1", pa, sysid=1, compid=1)
    with tempfile.NamedTemporaryFile(suffix=".tlog") as tf:
        try:
            b.log_open(tf.name)
            a.set_attitude_target((0.9, 0.1, -0.2, 0.3), thrust=0.42)
            a.send_attitude(1.25, (0.01, -0.02, 0.03))
            a.send_local_position(1.25, (1.0, 2.0, -3.0), (0.1, 0.2, 0.3))
            deadline = time.monotonic() + 5.0
            while time.monotonic() < deadline:
                if (b.attitude_target()[0] >= 1 and b.attitude()[0] >= 1
                        and b.local_position()[0] >= 1):
                    break
                time.sleep(0.001)
        finally:
            # the tlog FILE buffer flushes on close
            a.close()
            b.close()
        from avoid_mpc_tpu.runtime.native import read_tlog

        got = {}
        for _ts, msgid, payload in read_tlog(tf.name):
            got[msgid] = payload
        att = unpack_fields(MESSAGES["ATTITUDE"].msgid, got[30])
        np.testing.assert_allclose(
            [att["roll"], att["pitch"], att["yaw"]], [0.01, -0.02, 0.03],
            rtol=1e-6,
        )
        lpn = unpack_fields(MESSAGES["LOCAL_POSITION_NED"].msgid, got[32])
        np.testing.assert_allclose(
            [lpn["x"], lpn["y"], lpn["z"]], [1.0, 2.0, -3.0], rtol=1e-6
        )
        tgt = unpack_fields(MESSAGES["SET_ATTITUDE_TARGET"].msgid, got[82])
        np.testing.assert_allclose(tgt["q"], (0.9, 0.1, -0.2, 0.3), rtol=1e-6)
        np.testing.assert_allclose(tgt["thrust"], 0.42, rtol=1e-6)
