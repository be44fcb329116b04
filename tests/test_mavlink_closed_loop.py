"""Closed-loop flight THROUGH the MAVLink link: bfctrl on one endpoint,
the 6-DoF plant on the other, lock-stepped over real UDP sockets.

This is the deployment loop the reference runs across processes — bfctrl
publishing attitude setpoints to /mavros/setpoint_raw/attitude and the
flight controller answering with odometry (betaflight_ctrl: BfCtrlFSM.cpp
process() + input.cpp odometry feed) — exercised end-to-end with the wire
in the middle:

  GCS side:  MavVehicleInput snapshot (NED -> z-up world) -> bfctrl_step
             (INIT -> AUTO_TAKEOFF -> AUTO_HOVER FSM) -> geometric
             controller -> SET_ATTITUDE_TARGET out.
  FC side:   latched attitude target -> sixdof_step (attitude cascade +
             thrust) -> LOCAL_POSITION_NED + ATTITUDE + HEARTBEAT back.

Pass = the vehicle takes off and holds hover at the takeoff height with the
whole control path crossing the socket every tick (no direct function call
between controller and plant), zero CRC errors both ways.
"""

import socket
import time

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from avoid_mpc_tpu.control.bfctrl import (
    FSM_AUTO_HOVER,
    FSM_AUTO_TAKEOFF,
    FSM_INIT,
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

DT = 0.02  # 50 Hz, the reference's control tick


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


def test_takeoff_and_hover_over_the_wire():
    dtype = jnp.float32
    pa, pb = _free_ports(2)
    gcs = MavConnection(pa, "127.0.0.1", pb, sysid=255, compid=0)
    fc = MavConnection(pb, "127.0.0.1", pa, sysid=1, compid=1)
    try:
        params = BfctrlParams.default(dtype=dtype)
        ctrl_state = bfctrl_init(params)
        cmd = CommandInput.none(dtype=dtype)
        plant_params = SixDofParams.default(dtype=dtype)
        plant = sixdof_init(jnp.zeros(3, dtype=dtype), dtype=dtype)
        vin = MavVehicleInput(gcs)

        @jax.jit
        def ctrl_tick(s, t, p, v, q):
            s, u, _des, _status, _hp = bfctrl_step(
                s, t, p, v, q, cmd,
                jnp.asarray(0, jnp.int32), jnp.asarray(0.0, dtype),
                jnp.asarray(jnp.inf, dtype), jnp.zeros(2, dtype), params,
            )
            return s, u.q, u.thrust

        @jax.jit
        def plant_tick(ps, q_des, thrust):
            ps = sixdof_step(ps, q_des, thrust, DT, plant_params)
            ypr = rotmat_to_ypr(quat_to_rotmat(ps.q))
            return ps, ps.p, ps.v, ypr

        fsm_seen = []
        lpn_count = att_count = tgt_count = 0
        n_ticks = 220  # 4.4 s of sim time: 1.5 s ramp + settle
        for k in range(n_ticks):
            t = k * DT

            # --- FC side: current state out over the wire (world -> NED) --
            fc.send_heartbeat()
            p = np.asarray(plant.p, np.float64)
            v = np.asarray(plant.v, np.float64)
            yaw, pitch, roll = (
                float(x)
                for x in jax.device_get(rotmat_to_ypr(quat_to_rotmat(plant.q)))
            )
            fc.send_local_position(t, (p[0], -p[1], -p[2]), (v[0], -v[1], -v[2]))
            fc.send_attitude(t, (roll, -pitch, -yaw))
            lpn_count += 1
            att_count += 1
            assert _wait(lambda: gcs.local_position()[0] >= lpn_count)
            assert _wait(lambda: gcs.attitude()[0] >= att_count)

            # --- GCS side: snapshot -> FSM tick -> setpoint out -----------
            snap = vin.snapshot()
            assert snap.link_ok
            ctrl_state, q_des, thrust = ctrl_tick(
                ctrl_state,
                jnp.asarray(t, dtype),
                jnp.asarray(snap.odom_p, dtype),
                jnp.asarray(snap.odom_v, dtype),
                jnp.asarray(snap.odom_q, dtype),
            )
            fsm_seen.append(int(ctrl_state.fsm))
            gcs.set_attitude_target(
                tuple(float(x) for x in jax.device_get(q_des)),
                thrust=float(thrust),
            )
            tgt_count += 1
            assert _wait(lambda: fc.attitude_target()[0] >= tgt_count)

            # --- FC side: latched setpoint -> plant ------------------------
            _, tgt = fc.attitude_target()
            plant, _, _, _ = plant_tick(
                plant,
                jnp.asarray(tgt[1:5], dtype),
                jnp.asarray(tgt[8], dtype),
            )

        # FSM walked the reference's takeoff path
        assert fsm_seen[0] in (FSM_INIT, FSM_AUTO_TAKEOFF)
        assert FSM_AUTO_TAKEOFF in fsm_seen
        assert fsm_seen[-1] == FSM_AUTO_HOVER
        # vehicle is at the takeoff height, essentially stationary, centered
        p_end = np.asarray(plant.p, np.float64)
        v_end = np.asarray(plant.v, np.float64)
        assert abs(p_end[2] - float(params.takeoff_height)) < 0.2, p_end
        assert np.hypot(p_end[0], p_end[1]) < 0.3, p_end
        assert np.linalg.norm(v_end) < 0.5, v_end
        # the wire stayed clean in both directions
        assert gcs.stats()["crc_errors"] == 0
        assert fc.stats()["crc_errors"] == 0
        assert fc.stats()["attitude_targets"] >= n_ticks
    finally:
        gcs.close()
        fc.close()
