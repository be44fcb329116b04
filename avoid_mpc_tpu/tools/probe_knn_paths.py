"""On-chip shoot-out of k-NN strategies at engine (forest) shapes.

forest_10k spends ~20 ms/tick with the solver early-exiting fast, so the
3x per-tick k-NN over the 10k-point rolling map is the suspect.  Candidates:

  * ``pallas``  — the production path (ops/pallas_knn.py, VPU difference
                  form, fused mask+top-k);
  * ``mxu``     — rank by the norm-expansion score on the MXU under
                  ``default_matmul_precision('highest')`` (CLAUDE.md rule 1),
                  then recompute exact difference-form distances for the k
                  winners only.  Selection can differ from exact only on
                  near-ties below the score's fp noise (~1e-3 m^2 at map
                  scale); returned distances are exact either way.

Prints one JSON line per (path, shape) with device-time stats and
cross-path agreement, so the decision to reroute the engine's big-map
queries is measurement-driven.

VERDICT (measured round 4, chain-protocol device times): the MXU path
LOSES — 275 ms vs 6.1 ms per call at (B=1024, Q=30, P=10240).  The
norm-expansion cross term is a matmul with CONTRACTION DIM 3, so the
128x128 systolic array runs at ~2% utilization while the (B, Q, P) score
matrix (1.3 GB at forest shape) round-trips HBM.  The VPU difference-form
Pallas kernel keeps the production path (selection agreement between the
two: 99.999%, near-tie swaps only).  Kept as the measurement record and
for re-evaluation if shapes change.

Usage: ``timeout 1800 python avoid_mpc_tpu/tools/probe_knn_paths.py`` (TPU).
"""

from __future__ import annotations

import json
import os
import sys
import time

_REPO = os.path.dirname(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)
sys.path.insert(0, _REPO)


def knn_mxu(queries, points, mask, k: int):
    """MXU-ranked k-NN (see module docstring).  Same signature/returns as
    ops.knn.knn: ((Q,k) dists ascending, (Q,k,3) coords, FAR pad)."""
    import jax
    import jax.numpy as jnp

    from avoid_mpc_tpu.ops.knn import FAR_SENTINEL

    with jax.default_matmul_precision("highest"):
        cross = queries @ points.T  # (Q,P) — the MXU does the heavy lifting
    p2 = jnp.sum(points * points, axis=-1)
    score = p2[None, :] - 2.0 * cross  # = d2 - ||q||^2 (row-const shift)
    score = jnp.where(mask[None, :], score, jnp.inf)
    _, idx = jax.lax.top_k(-score, k)
    sel = points[idx]  # (Q,k,3)
    diff = sel - queries[:, None, :]
    d2 = jnp.sum(diff * diff, axis=-1)  # exact difference form for winners
    valid = jnp.isfinite(jnp.take_along_axis(score, idx, axis=1))
    pts = jnp.where(valid[..., None], sel, FAR_SENTINEL)
    return jnp.where(valid, jnp.sqrt(d2), jnp.inf), pts


def main():
    from bench import _enable_compile_cache

    _enable_compile_cache()
    import jax
    import jax.numpy as jnp
    import numpy as np

    from avoid_mpc_tpu.ops.knn import knn

    rng = np.random.default_rng(3)
    shapes = [
        # (B, Q, P): forest_10k engine shape and the headline shape
        (1024, 30, 10240),
        (4096, 20, 1024),
    ]
    for b, q, p in shapes:
        queries = jnp.asarray(
            rng.uniform(-30, 30, (b, q, 3)), jnp.float32
        )
        points = jnp.asarray(rng.uniform(-30, 30, (b, p, 3)), jnp.float32)
        mask = jnp.asarray(rng.uniform(size=(b, p)) < 0.9)

        paths = {
            "pallas": jax.vmap(lambda qq, pp, mm: knn(qq, pp, mm, 3)),
            "mxu": jax.vmap(lambda qq, pp, mm: knn_mxu(qq, pp, mm, 3)),
        }
        outs = {}
        K = 16
        for name, vfn in paths.items():
            # chained protocol (see roofline.py): K data-dependent calls per
            # dispatch — queries shift by a function of the previous output,
            # so steps serialize — then a host FETCH bounds completion (the
            # tunnel's block_until_ready is a weak sync for small programs).
            def chain(queries, points, mask):
                def body(qq, _):
                    d, pt = vfn(qq, points, mask)
                    bump = jnp.mean(pt, axis=2) * 1e-7  # (B, Q, 3)
                    return qq + jnp.where(
                        jnp.isfinite(bump), bump, 0.0
                    ), d[:, 0, 0]
                qq, ds = jax.lax.scan(body, queries, None, length=K)
                return ds
            fn = jax.jit(chain)
            t0 = time.time()
            float(fn(queries, points, mask)[0, 0])
            compile_s = time.time() - t0
            ts = []
            for _ in range(7):
                t0 = time.time()
                float(fn(queries, points, mask)[0, 0])
                ts.append((time.time() - t0) / K)
            out = jax.block_until_ready(
                jax.jit(vfn)(queries, points, mask)
            )
            outs[name] = out
            print(
                json.dumps(
                    {
                        "path": name,
                        "B": b, "Q": q, "P": p,
                        "p50_ms_per_call": round(float(np.median(ts)) * 1e3, 3),
                        "min_ms_per_call": round(float(np.min(ts)) * 1e3, 3),
                        "chain_len": K,
                        "compile_s": round(compile_s, 1),
                    }
                ),
                flush=True,
            )
        d_ref, pts_ref = outs["pallas"]
        d_mxu, pts_mxu = outs["mxu"]
        d_ref, d_mxu = np.asarray(d_ref), np.asarray(d_mxu)
        finite = np.isfinite(d_ref) & np.isfinite(d_mxu)
        same_pt = np.all(np.asarray(pts_ref) == np.asarray(pts_mxu), axis=-1)
        dd = np.abs(d_ref - d_mxu)[finite]
        print(
            json.dumps(
                {
                    "agreement": {
                        "B": b, "Q": q, "P": p,
                        "same_point_frac": round(float(same_pt.mean()), 6),
                        "max_dist_delta_on_finite": float(dd.max()) if dd.size else 0.0,
                    }
                }
            ),
            flush=True,
        )


if __name__ == "__main__":
    sys.exit(main())
