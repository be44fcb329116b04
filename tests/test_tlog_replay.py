"""Record a real closed-loop UDP flight to a tlog, then re-drive bfctrl
from the log and assert the flight is reproduced — the rosbag
record/replay workflow (bag_record.py + MavLinkFileLog) closed end-to-end.
"""

import socket
import time

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from avoid_mpc_tpu.control.bfctrl import (
    FSM_AUTO_HOVER,
    BfctrlParams,
    CommandInput,
    bfctrl_init,
    bfctrl_step,
)
from avoid_mpc_tpu.runtime.mav_input import MavVehicleInput
from avoid_mpc_tpu.runtime.native import MavConnection, native_available
from avoid_mpc_tpu.sim.plant import SixDofParams, sixdof_init, sixdof_step
from avoid_mpc_tpu.utils.quaternion import quat_to_rotmat, rotmat_to_ypr

pytestmark = pytest.mark.skipif(
    not native_available(), reason="native runtime unavailable"
)

DT = 0.02


def _free_ports(n):
    socks = [socket.socket() for _ in range(n)]
    for s in socks:
        s.bind(("127.0.0.1", 0))
    ports = [s.getsockname()[1] for s in socks]
    for s in socks:
        s.close()
    return ports


def _wait(pred, timeout=5.0):
    deadline = time.monotonic() + timeout
    while time.monotonic() < deadline:
        if pred():
            return True
        time.sleep(0.0005)
    return False


def _fly_and_record(tlog_path, n_ticks=140, dtype=jnp.float32):
    """The closed-loop takeoff flight of test_mavlink_closed_loop, with the
    GCS connection capturing every frame (both directions) to ``tlog_path``."""
    pa, pb = _free_ports(2)
    gcs = MavConnection(pa, "127.0.0.1", pb, sysid=255, compid=0)
    fc = MavConnection(pb, "127.0.0.1", pa, sysid=1, compid=1)
    try:
        gcs.log_open(tlog_path)
        params = BfctrlParams.default(dtype=dtype)
        ctrl_state = bfctrl_init(params)
        cmd = CommandInput.none(dtype=dtype)
        plant = sixdof_init(jnp.zeros(3, dtype=dtype), dtype=dtype)
        plant_params = SixDofParams.default(dtype=dtype)
        vin = MavVehicleInput(gcs)

        @jax.jit
        def ctrl_tick(s, t, p, v, q):
            s, u, _d, _st, _hp = bfctrl_step(
                s, t, p, v, q, cmd,
                jnp.asarray(0, jnp.int32), jnp.asarray(0.0, dtype),
                jnp.asarray(jnp.inf, dtype), jnp.zeros(2, dtype), params,
            )
            return s, u.q, u.thrust

        @jax.jit
        def plant_tick(ps, q_des, thrust):
            return sixdof_step(ps, q_des, thrust, DT, plant_params)

        sent = []
        lpn_count = tgt_count = 0
        for k in range(n_ticks):
            t = k * DT
            p = np.asarray(plant.p, np.float64)
            v = np.asarray(plant.v, np.float64)
            yaw, pitch, roll = (
                float(x)
                for x in jax.device_get(rotmat_to_ypr(quat_to_rotmat(plant.q)))
            )
            fc.send_local_position(t, (p[0], -p[1], -p[2]), (v[0], -v[1], -v[2]))
            fc.send_attitude(t, (roll, -pitch, -yaw))
            lpn_count += 1
            assert _wait(lambda: gcs.local_position()[0] >= lpn_count)
            assert _wait(lambda: gcs.attitude()[0] >= lpn_count)

            snap = vin.snapshot()
            ctrl_state, q_des, thrust = ctrl_tick(
                ctrl_state,
                jnp.asarray(t, dtype),
                jnp.asarray(snap.odom_p, dtype),
                jnp.asarray(snap.odom_v, dtype),
                jnp.asarray(snap.odom_q, dtype),
            )
            qd = tuple(float(x) for x in jax.device_get(q_des))
            gcs.set_attitude_target(qd, thrust=float(thrust))
            sent.append(qd + (float(thrust),))
            tgt_count += 1
            assert _wait(lambda: fc.attitude_target()[0] >= tgt_count)

            _, tgt = fc.attitude_target()
            plant = plant_tick(
                plant, jnp.asarray(tgt[1:5], dtype), jnp.asarray(tgt[8], dtype)
            )
        assert int(ctrl_state.fsm) == FSM_AUTO_HOVER
        return params, sent
    finally:
        gcs.close()
        fc.close()


def test_tlog_records_and_replay_reproduces_flight(tmp_path):
    """Round trip: fly over UDP recording a tlog; decode the log; re-drive
    bfctrl from the logged odometry; the regenerated attitude-target stream
    must match the logged one tick for tick (f32 round-off)."""
    from avoid_mpc_tpu.runtime.tlog_replay import decode_tlog, replay_bfctrl

    tlog = str(tmp_path / "flight.tlog")
    params, sent = _fly_and_record(tlog)

    # the capture holds both directions: odometry in, targets out
    kinds = [r.kind for r in decode_tlog(tlog)]
    assert kinds.count("target") == len(sent)
    assert kinds.count("odom") >= len(sent)
    assert kinds.count("att") >= len(sent)

    logged, regen = replay_bfctrl(tlog, params, DT)
    assert len(logged) == len(sent)
    logged = np.asarray(logged)
    regen = np.asarray(regen)
    sent_a = np.asarray(sent)
    # the log is a faithful wire capture of what was sent...
    np.testing.assert_allclose(logged, sent_a, rtol=0, atol=1e-6)
    # ...and the replayed controller reproduces the flight: the odometry
    # round-trips through euler angles (ATTITUDE wire format), so the
    # regenerated attitude quaternions agree to f32 euler round-off
    np.testing.assert_allclose(regen[:, 0:4], logged[:, 0:4], atol=5e-5)
    np.testing.assert_allclose(regen[:, 4], logged[:, 4], atol=5e-4)
