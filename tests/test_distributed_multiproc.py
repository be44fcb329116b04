"""REAL multi-process ``jax.distributed`` validation (SURVEY.md §4(4)).

Launches 2 coordinated subprocesses x 4 CPU devices each, runs the scenario-
sharded Monte-Carlo solve end-to-end through
``avoid_mpc_tpu.parallel.distributed.main`` (global arrays assembled with
``jax.make_array_from_callback``, cross-process psum via Gloo), and asserts
the global metrics match a single-process 8-device run of the identical
program.  This is the process-fabric analogue of the reference's multi-node
ROS graph (``bfctrl_node.cpp:26-72`` topics; rpclib endpoints) — one SPMD
program across OS processes instead of a topic bus.

Also archives the evidence as ``MULTIPROC.json`` at the repo root.

Environment note: subprocesses must NOT inherit ``PALLAS_AXON_POOL_IPS`` —
the image's sitecustomize would try to claim the (single) TPU chip in every
python process and block.  Unsetting it + ``JAX_PLATFORMS=cpu`` gives clean
CPU-only children.
"""

import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def _child_env(n_devices: int) -> dict:
    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)  # no TPU claim in children
    env.pop("XLA_FLAGS", None)
    env["JAX_PLATFORMS"] = "cpu"
    env["JAX_NUM_CPU_DEVICES"] = str(n_devices)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    return env


def _run_single(tmp_path, batch):
    out = tmp_path / "single.json"
    cmd = [
        sys.executable, os.path.join(REPO, "avoid_mpc_tpu", "parallel", "distributed.py"),
        "--batch", str(batch), "--points", "128", "--out", str(out),
    ]
    r = subprocess.run(
        cmd, env=_child_env(8), cwd=REPO, capture_output=True, text=True,
        timeout=600,
    )
    assert r.returncode == 0, (r.stdout, r.stderr)
    return json.loads(out.read_text())


def _run_multi(tmp_path, batch, nproc=2, dev_per_proc=4):
    port = _free_port()
    outs = [tmp_path / f"proc{i}.json" for i in range(nproc)]
    procs = []
    for i in range(nproc):
        cmd = [
            sys.executable, os.path.join(REPO, "avoid_mpc_tpu", "parallel", "distributed.py"),
            "--batch", str(batch), "--points", "128",
            "--coordinator", f"127.0.0.1:{port}",
            "--num-processes", str(nproc), "--process-id", str(i),
            "--out", str(outs[i]),
        ]
        procs.append(
            subprocess.Popen(
                cmd, env=_child_env(dev_per_proc), cwd=REPO,
                stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
            )
        )
    logs = []
    for p in procs:
        try:
            so, se = p.communicate(timeout=600)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        logs.append((p.returncode, so, se))
    assert all(rc == 0 for rc, _, _ in logs), logs
    return json.loads(outs[0].read_text())


@pytest.mark.slow
def test_two_process_metrics_match_single_process(tmp_path):
    batch = 64
    single = _run_single(tmp_path, batch)
    multi = _run_multi(tmp_path, batch)

    assert single["num_processes"] == 1 and single["devices"] == 8
    assert multi["num_processes"] == 2 and multi["devices"] == 8
    assert multi["local_devices"] == 4
    # identical seeded problem set + deterministic solver: global psum'd
    # metrics must agree across process topologies to f32 reduction noise
    np.testing.assert_allclose(
        multi["mean_cost"], single["mean_cost"], rtol=1e-5
    )
    np.testing.assert_allclose(
        multi["converged_frac"], single["converged_frac"], atol=1e-6
    )
    # the points-sharded world-cloud k-NN ran with its all_gather spanning
    # the process boundary (device interleave in distributed.py) and merged
    # to the same global top-k as the single-process mesh
    assert multi["point_shards"] == 2
    np.testing.assert_allclose(
        multi["knn_sharded_checksum"], single["knn_sharded_checksum"],
        rtol=1e-6,
    )

    with open(os.path.join(REPO, "MULTIPROC.json"), "w") as f:
        json.dump({"single_process": single, "two_process": multi}, f, indent=1)
