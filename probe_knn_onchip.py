"""Scratch probe: on-chip check of the coordinate-returning knn kernel
against the XLA top_k path (both running on the TPU)."""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from bench import _enable_compile_cache

_enable_compile_cache()

import jax
import jax.numpy as jnp
import numpy as np

from avoid_mpc_tpu.ops.knn import _knn_xla
from avoid_mpc_tpu.ops.pallas_knn import knn_pallas_batched

rng = np.random.default_rng(7)
b, q, p, k = 256, 20, 1024, 3
queries = jnp.asarray(rng.uniform(-30, 30, (b, q, 3)), jnp.float32)
points = jnp.asarray(rng.uniform(-30, 30, (b, p, 3)), jnp.float32)
mask = jnp.asarray(rng.uniform(0, 1, (b, p)) > 0.1)

print("compiling pallas knn...", flush=True)
d_pl, p_pl = jax.block_until_ready(
    jax.jit(knn_pallas_batched, static_argnames=("k",))(
        queries, points, mask, k=k
    )
)
print("compiling xla knn...", flush=True)
d_x, p_x = jax.block_until_ready(
    jax.jit(jax.vmap(lambda qq, pp, mm: _knn_xla(qq, pp, mm, k)))(
        queries, points, mask
    )
)
dd = np.abs(np.asarray(d_pl) - np.asarray(d_x)).max()
dp = np.abs(np.asarray(p_pl) - np.asarray(p_x)).max()
print(f"max|d_dist|={dd:.3e} max|d_pts|={dp:.3e}", flush=True)
ok = dd < 1e-5 and dp < 1e-5
print("KNN_ONCHIP_OK" if ok else "KNN_ONCHIP_MISMATCH", flush=True)
sys.exit(0 if ok else 1)
