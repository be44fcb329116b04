"""MAVLink UDP connection layer: loopback vehicle <-> controller exchange.

Two live endpoints on 127.0.0.1 (real sockets + receive threads +
scheduler-driven TX streams, runtime/mavlink_conn.cpp): a "vehicle" flying
odometry out (ATTITUDE + LOCAL_POSITION_NED + HEARTBEAT) and a "controller"
flying attitude targets back — the loop the reference runs through
MavLinkCom's MavLinkConnection/MavLinkVehicle
(MavLinkCom/src/MavLinkConnection.cpp) into betaflight_ctrl's input adapter
(betaflight_ctrl/src/input.cpp:15-104).
"""

import socket
import time

import numpy as np
import pytest

from avoid_mpc_tpu.runtime.native import MavConnection, native_available

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
    ctrl = MavConnection(pa, "127.0.0.1", pb, sysid=255, compid=0)
    veh = MavConnection(pb, "127.0.0.1", pa, sysid=1, compid=1)
    yield ctrl, veh
    ctrl.close()
    veh.close()


def test_heartbeat_watchdog(pair):
    ctrl, veh = pair
    # no heartbeat seen yet -> link down, age huge
    assert not ctrl.link_ok(10.0)
    assert ctrl.heartbeat_age() > 1e6
    veh.send_heartbeat()
    assert _wait(lambda: ctrl.link_ok(2.0))
    age0 = ctrl.heartbeat_age()
    assert age0 < 2.0
    # watchdog trips once the peer stays silent past the timeout
    assert _wait(lambda: not ctrl.link_ok(0.15), timeout=2.0)


def test_odometry_in_targets_out(pair):
    """The full loop: vehicle state in through real sockets, typed; attitude
    setpoints out, typed on the vehicle side."""
    ctrl, veh = pair

    rpy = (0.05, -0.1, 1.2)
    rates = (0.3, -0.2, 0.1)
    xyz = (4.5, -2.0, -1.2)
    vxyz = (3.0, 0.1, -0.2)
    veh.send_attitude(12.5, rpy, rates)
    veh.send_local_position(12.5, xyz, vxyz)

    assert _wait(lambda: ctrl.attitude()[0] >= 1)
    assert _wait(lambda: ctrl.local_position()[0] >= 1)
    _, att = ctrl.attitude()
    np.testing.assert_allclose(att[0], 12.5, atol=1e-3)
    np.testing.assert_allclose(att[1:4], rpy, rtol=1e-6)
    np.testing.assert_allclose(att[4:7], rates, rtol=1e-6)
    _, lpn = ctrl.local_position()
    np.testing.assert_allclose(lpn[1:4], xyz, rtol=1e-6)
    np.testing.assert_allclose(lpn[4:7], vxyz, rtol=1e-6)

    q = (0.9238795, 0.0, 0.3826834, 0.0)  # 45 deg pitch
    ctrl.set_attitude_target(q, rates=(0, 0, 0.5), thrust=0.62, type_mask=0x07)
    assert _wait(lambda: veh.attitude_target()[0] >= 1)
    _, tgt = veh.attitude_target()
    np.testing.assert_allclose(tgt[1:5], q, rtol=1e-6)
    np.testing.assert_allclose(tgt[7], 0.5, rtol=1e-6)  # yaw rate
    np.testing.assert_allclose(tgt[8], 0.62, rtol=1e-6)  # thrust
    assert tgt[9] == 7.0  # type_mask

    # command channel (arm): COMMAND_LONG #400, param1=1
    ctrl.send_command_long(400, params=(1.0,))
    assert _wait(lambda: veh.command_long()[0] >= 1)
    _, cmd = veh.command_long()
    assert cmd[7] == 400.0 and cmd[0] == 1.0

    stats = veh.stats()
    assert stats["crc_errors"] == 0 and stats["unknown"] == 0


def test_periodic_streams(pair):
    """Scheduler-driven TX: HEARTBEAT + the latched SET_ATTITUDE_TARGET at a
    fixed rate (reference: 1 Hz heartbeat, 50 Hz offboard stream — scaled up
    here so the test runs in well under a second)."""
    ctrl, veh = pair
    ctrl.set_attitude_target((1, 0, 0, 0), thrust=0.5, send_now=False)
    ctrl.start_streams(hb_hz=20.0, att_hz=100.0)
    time.sleep(0.35)
    assert veh.link_ok(0.5)  # heartbeats flowing
    stats = veh.stats()
    # ~35 expected at 100 Hz; allow heavy scheduling slop on a loaded box
    assert stats["attitude_targets"] >= 10, stats
    assert stats["heartbeats"] >= 3, stats
    # stream keeps flying the LATEST latched setpoint
    ctrl.set_attitude_target((0, 1, 0, 0), thrust=0.9, send_now=False)
    assert _wait(lambda: abs(veh.attitude_target()[1][8] - 0.9) < 1e-6)


def test_vehicle_input_adapter_staleness_gates(pair):
    """MavVehicleInput: odometry flows into bfctrl-shaped inputs; heartbeat
    loss makes every age inf (the link-loss failsafe the reference's
    heartbeat-timeout path implements)."""
    from avoid_mpc_tpu.runtime.mav_input import MavVehicleInput

    ctrl, veh = pair
    inp = MavVehicleInput(ctrl, heartbeat_timeout=0.25)

    veh.send_heartbeat()
    veh.send_attitude(3.0, (0.0, 0.1, np.pi / 2))
    veh.send_local_position(3.0, (1.0, 2.0, -5.0), (0.5, 0.3, -0.1))
    assert _wait(lambda: inp.snapshot().odom_age < 0.5)

    s = inp.snapshot()
    assert s.link_ok
    # NED -> NWU: (N, E, D) -> (N, -E, -D)
    np.testing.assert_allclose(s.odom_p, (1.0, -2.0, 5.0), rtol=1e-6)
    np.testing.assert_allclose(s.odom_v, (0.5, -0.3, 0.1), rtol=1e-6)
    # attitude conjugates to (roll, -pitch, -yaw); consistency check: the
    # NWU body-x axis from the quaternion must point along the NWU heading
    # of a vehicle at NED yaw +90deg (i.e. -y in NWU)
    from avoid_mpc_tpu.utils.quaternion import quat_rotate

    import jax.numpy as jnp
    bx = np.asarray(quat_rotate(jnp.asarray(s.odom_q), jnp.asarray([1.0, 0.0, 0.0])))
    # NED body-x = (0, cos(0.1), -sin(0.1)) -> NWU (0, -cos(0.1), +sin(0.1))
    np.testing.assert_allclose(bx[0], 0.0, atol=1e-5)
    np.testing.assert_allclose(bx[1], -np.cos(0.1), atol=1e-5)
    np.testing.assert_allclose(bx[2], np.sin(0.1), atol=1e-5)
    assert s.att_age < 1.0

    # silence -> watchdog trips -> all ages inf at once
    assert _wait(lambda: not inp.snapshot().link_ok, timeout=2.0)
    s2 = inp.snapshot()
    assert np.isinf(s2.odom_age) and np.isinf(s2.att_age)


def test_tcp_transport_exchange():
    """TCP server/client transport (MavLinkCom connectLocalTcp /
    connectRemoteTcp analogue): the byte-resync parser frames the stream
    without datagram boundaries, and the same typed decode + watchdog
    surface works over it."""
    import threading

    (port,) = _free_ports(1)
    holder = {}

    def serve():
        holder["veh"] = MavConnection.tcp_server(port, timeout_s=5.0, sysid=1, compid=1)

    t = threading.Thread(target=serve)
    t.start()
    ctrl = MavConnection.tcp_client("127.0.0.1", port, timeout_s=5.0, sysid=255, compid=0)
    t.join(timeout=6.0)
    veh = holder.get("veh")
    assert veh is not None
    try:
        veh.send_heartbeat()
        assert _wait(lambda: ctrl.link_ok(2.0))
        # vehicle -> controller odometry over the stream
        veh.send_local_position(1.0, (2.0, -1.0, -1.5), (0.5, 0.0, 0.0))
        veh.send_attitude(1.0, (0.01, -0.02, 0.3))
        assert _wait(lambda: ctrl.local_position()[0] >= 1)
        assert _wait(lambda: ctrl.attitude()[0] >= 1)
        _, lpn = ctrl.local_position()
        np.testing.assert_allclose(lpn[1:4], (2.0, -1.0, -1.5), atol=1e-6)
        # controller -> vehicle setpoint over the stream
        ctrl.set_attitude_target((1.0, 0.0, 0.0, 0.0), thrust=0.42, send_now=True)
        assert _wait(lambda: veh.attitude_target()[0] >= 1)
        _, tgt = veh.attitude_target()
        assert tgt[8] == pytest.approx(0.42, abs=1e-6)
        # no CRC errors across the stream
        assert ctrl.stats()["crc_errors"] == 0
        assert veh.stats()["crc_errors"] == 0
    finally:
        ctrl.close()
        veh.close()
