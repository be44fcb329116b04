"""Fused Pallas Riccati sweep vs the XLA reference implementation.

Runs the kernel in interpreter mode on CPU (semantics check); the real-chip
run is exercised by bench.py / on-device verification.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.slow  # interpret-mode kernels: minutes on CPU

from avoid_mpc_tpu.config import MPCConfig
from avoid_mpc_tpu.solver.ilqr import (
    MPCProblem,
    SolverHyper,
    SolverParams,
    _affine_dynamics,
    _backward,
    _linearize,
)
from avoid_mpc_tpu.solver.pallas_backward import riccati_backward_batched

CFG = MPCConfig(mpc_T=0.33)  # N = 10
N = CFG.horizon_steps
SP = SolverParams.from_config(CFG, dtype=jnp.float32)
HP = SolverHyper(iters=1, boxqp_iters=4)


def make_batch(b, seed=0, tight_bounds=False):
    """Random linearization data from real problem instances."""
    rng = np.random.default_rng(seed)
    Ad, Bd, cvec = _affine_dynamics(SP, jnp.float32)
    all_cx, all_cxx, all_lu, all_us = [], [], [], []
    for i in range(b):
        x0 = jnp.asarray(rng.standard_normal(10) * 0.5, jnp.float32)
        ref = jnp.asarray(rng.standard_normal((N, 10)), jnp.float32)
        obstacles = jnp.asarray(rng.standard_normal((N, 3, 3)) * 2, jnp.float32)
        target = jnp.asarray(rng.standard_normal(10), jnp.float32)
        us = jnp.asarray(
            rng.uniform(-3, 3, (N, 4)) + np.array([0, 0, 9.81, 0]), jnp.float32
        )
        if tight_bounds:
            us = jnp.clip(us, SP.u_lower, SP.u_upper)
        xs = [x0]
        for k in range(N):
            xs.append(Ad @ xs[-1] + Bd @ us[k] + cvec)
        xs = jnp.stack(xs)
        problem = MPCProblem(x0, ref, obstacles, target)
        cx, cxx, lu, luu = _linearize(problem, xs, us, SP)
        all_cx.append(cx)
        all_cxx.append(cxx)
        all_lu.append(lu)
        all_us.append(us)
    return (
        Ad, Bd, luu,
        jnp.stack(all_cx), jnp.stack(all_cxx), jnp.stack(all_lu), jnp.stack(all_us),
    )


@pytest.mark.parametrize("reg_val", [1e-6, 1.0])
def test_fused_matches_xla_backward(reg_val):
    b = 4
    Ad, Bd, luu, cx, cxx, lu, us = make_batch(b)
    reg = jnp.full((b,), reg_val, jnp.float32)

    kff_p, K_p, dV1_p, dV2_p, pg_p = riccati_backward_batched(
        Ad, Bd, luu, SP.u_lower, SP.u_upper, cx, cxx, lu, us, reg,
        bq_iters=HP.boxqp_iters, block_b=8, interpret=True,
    )

    ref_fn = jax.vmap(
        lambda u, a, b_, c, d, r: _backward(u, Ad, Bd, a, b_, c, luu, r, SP, HP),
        in_axes=(0, 0, 0, 0, None, 0),
    )
    # call per-scenario reference directly
    outs = [
        _backward(us[i], Ad, Bd, cx[i], cxx[i], lu[i], luu, reg[i], SP, HP)
        for i in range(b)
    ]
    kff_r = jnp.stack([o[0] for o in outs])
    K_r = jnp.stack([o[1] for o in outs])
    dV1_r = jnp.stack([o[2] for o in outs])
    dV2_r = jnp.stack([o[3] for o in outs])
    pg_r = jnp.stack([o[4] for o in outs])

    np.testing.assert_allclose(np.asarray(kff_p), np.asarray(kff_r), rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(K_p), np.asarray(K_r), rtol=2e-3, atol=2e-3)
    np.testing.assert_allclose(np.asarray(dV1_p), np.asarray(dV1_r), rtol=1e-3, atol=1e-3)
    np.testing.assert_allclose(np.asarray(dV2_p), np.asarray(dV2_r), rtol=1e-3, atol=1e-3)
    np.testing.assert_allclose(np.asarray(pg_p), np.asarray(pg_r), rtol=1e-3, atol=1e-3)


def test_fused_padding_batch_not_multiple_of_block():
    b = 5  # pads to 8
    Ad, Bd, luu, cx, cxx, lu, us = make_batch(b, seed=1)
    reg = jnp.full((b,), 1e-4, jnp.float32)
    kff, K, dV1, dV2, pg = riccati_backward_batched(
        Ad, Bd, luu, SP.u_lower, SP.u_upper, cx, cxx, lu, us, reg,
        bq_iters=2, block_b=8, interpret=True,
    )
    assert kff.shape == (b, N, 4) and K.shape == (b, N, 4, 10)
    assert np.isfinite(np.asarray(kff)).all()
    # padded scenarios must not contaminate real ones: recompute with b=8 input
    o = _backward(us[0], Ad, Bd, cx[0], cxx[0], lu[0], luu, reg[0], SP,
                  SolverHyper(boxqp_iters=2))
    np.testing.assert_allclose(np.asarray(kff[0]), np.asarray(o[0]), rtol=2e-4, atol=2e-4)
