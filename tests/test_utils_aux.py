"""Tests: COG filter, geofence, recorder/checkpoint, latency tracker."""

import os

import jax
import jax.numpy as jnp
import numpy as np

from avoid_mpc_tpu.safety import CubeGeofence, SphereGeofence, geofence_check
from avoid_mpc_tpu.utils.filters import cog_filter_init, cog_filter_update
from avoid_mpc_tpu.utils.profiling import LatencyTracker
from avoid_mpc_tpu.utils.recorder import (
    FlightRecorder,
    load_checkpoint,
    save_checkpoint,
)


def cog_oracle(samples, window=10, decay=0.8):
    """Direct re-implementation of COGFilter.cpp:2-23."""
    q = samples[-window:]
    w = np.array([decay**i for i in range(len(q))])[::-1]  # newest weight 1
    return (np.asarray(q) * w[:, None]).sum(0) / w.sum()


def test_cog_filter_matches_oracle():
    rng = np.random.default_rng(0)
    s = cog_filter_init(dtype=jnp.float64)
    samples = []
    for i in range(25):
        x = rng.standard_normal(3)
        samples.append(x)
        s, filt = cog_filter_update(s, jnp.asarray(x))
        want = cog_oracle(samples)
        np.testing.assert_allclose(np.asarray(filt), want, rtol=1e-12)


def test_cog_filter_jit_scan():
    xs = jnp.asarray(np.random.default_rng(1).standard_normal((30, 3)))

    @jax.jit
    def run(xs):
        s = cog_filter_init(dtype=xs.dtype)

        def body(s, x):
            s, f = cog_filter_update(s, x)
            return s, f

        _, fs = jax.lax.scan(body, s, xs)
        return fs

    fs = run(xs)
    assert fs.shape == (30, 3)


def test_geofence():
    cube = CubeGeofence(lo=jnp.asarray([-1.0, -1, 0]), hi=jnp.asarray([10.0, 1, 3]))
    sphere = SphereGeofence(center=jnp.asarray([0.0, 0, 1]), radius=jnp.asarray(50.0))
    inside = jnp.asarray([5.0, 0.0, 1.5])
    outside = jnp.asarray([5.0, 2.0, 1.5])
    assert bool(geofence_check(inside, [cube, sphere]))
    assert not bool(geofence_check(outside, [cube, sphere]))
    np.testing.assert_allclose(float(cube.distance_inside(inside)), 1.0)
    # batched
    pts = jnp.stack([inside, outside])
    assert cube.contains(pts).tolist() == [True, False]


def test_flight_recorder_roundtrip(tmp_path):
    rec = FlightRecorder(str(tmp_path / "bag.npz"), config=None)
    for i in range(5):
        rec.record({"p": jnp.full(3, float(i)), "ok": jnp.asarray(i % 2 == 0)})
    path = rec.save()
    assert os.path.exists(path) and os.path.exists(path + ".manifest.json")
    leaves = FlightRecorder.load(path)
    assert len(leaves) == 2
    shapes = sorted(l.shape for l in leaves)
    assert shapes == [(5,), (5, 3)]
    p_leaf = next(l for l in leaves if l.ndim == 2)
    np.testing.assert_allclose(p_leaf[:, 0], np.arange(5.0))


def test_checkpoint_roundtrip(tmp_path):
    state = {
        "a": jnp.arange(6, dtype=jnp.float32).reshape(2, 3),
        "b": (jnp.asarray(3), jnp.asarray([True, False])),
    }
    save_checkpoint(str(tmp_path / "ckpt"), state)
    like = jax.tree.map(jnp.zeros_like, state)
    restored = load_checkpoint(str(tmp_path / "ckpt"), like)
    np.testing.assert_allclose(np.asarray(restored["a"]), np.asarray(state["a"]))
    np.testing.assert_allclose(np.asarray(restored["b"][0]), 3)


def test_latency_tracker():
    t = LatencyTracker(init=0.015)
    assert abs(t.decay - 0.015) < 1e-9  # the decay seed (yaml decay: 0.015)
    for _ in range(100):
        t.update(0.01)
    assert abs(t.decay - 0.01) < 1e-3
    assert abs(t.percentile(50) - 0.01) < 1e-9
