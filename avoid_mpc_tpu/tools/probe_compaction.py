"""Batched stream-compaction shoot-out for the bbox cull (round 5).

Measured on-chip: the unbatched searchsorted compaction wins 3.5x on the
310k-point single-robot association, but under vmap at forest shapes
(B=1024 x P=10240) it collapses to 346 ms vs 6.5 ms brute — binary-search
gathers do not vectorize across lanes.  This probe times every batched
compaction strategy XLA offers at the forest shapes so the batched cull
rule can be upgraded from "fall back to brute" to the measured winner:

  brute         no cull: the Pallas batched k-NN over all P (baseline)
  searchsorted  cumsum + vmapped searchsorted + gather (the unbatched impl)
  sortkeys      keys = inbox ? iota : P+iota; full (B,P) sort; first M are
                the in-box indices in original order
  topk          lax.top_k(-keys, M) — partial sort
  scatter       pos = cumsum-1 clamped to M; scatter points into (M+1,3)

Each strategy then runs the batched k-NN over the (B, M) candidates; the
report includes both the compaction time alone and the end-to-end
association time.  Prints one JSON line per strategy.

Usage:  timeout 5400 python -m avoid_mpc_tpu.tools.probe_compaction
        PROBE_SMOKE=1 ... (tiny CPU shapes, tracing check only)
"""

from __future__ import annotations

import functools
import json
import os
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SMOKE = os.environ.get("PROBE_SMOKE", "") == "1"
CHAIN = int(os.environ.get("PROBE_CHAIN", 2 if SMOKE else 16))
REPS = int(os.environ.get("PROBE_REPS", 1 if SMOKE else 5))


def main():
    sys.path.insert(0, _REPO)
    from avoid_mpc_tpu.utils.compile_cache import enable_persistent_cache

    enable_persistent_cache()
    import jax
    import jax.numpy as jnp

    if SMOKE:
        jax.config.update("jax_platforms", "cpu")

    from avoid_mpc_tpu.ops.knn import knn

    B, P, Q, M, K = (8, 1024, 8, 256, 3) if SMOKE else (1024, 10240, 32, 512, 3)
    R_CUT = 2.5

    rng_key = jax.random.PRNGKey(0)
    k1, k2 = jax.random.split(rng_key)
    points = jax.random.uniform(k1, (B, P, 3), jnp.float32, 0.0, 40.0)
    mask = jnp.ones((B, P), bool)
    # path-like queries per scenario: segment from a to a+(10,2,0)
    a = jax.random.uniform(k2, (B, 1, 3), jnp.float32, 5.0, 30.0)
    t = jnp.linspace(0.0, 1.0, Q)[None, :, None]
    queries = a + t * jnp.asarray([10.0, 2.0, 0.0])

    def inbox_of(q, pts, msk):
        lo = jnp.min(q, axis=0) - R_CUT
        hi = jnp.max(q, axis=0) + R_CUT
        return jnp.all((pts >= lo) & (pts <= hi), axis=-1) & msk

    # ---- compaction strategies: (q, pts, msk) -> (cand (M,3), cmask (M,))
    def comp_searchsorted(q, pts, msk):
        inbox = inbox_of(q, pts, msk)
        cs = jnp.cumsum(inbox.astype(jnp.int32))
        sel = jnp.searchsorted(cs, jnp.arange(1, M + 1, dtype=cs.dtype))
        cmask = jnp.arange(M) < cs[-1]
        return pts[jnp.minimum(sel, P - 1)], cmask

    def comp_sortkeys(q, pts, msk):
        inbox = inbox_of(q, pts, msk)
        iota = jnp.arange(P, dtype=jnp.int32)
        keys = jnp.where(inbox, iota, P + iota)
        skeys = jax.lax.sort(keys)[:M]
        cmask = skeys < P
        return pts[jnp.where(cmask, skeys, 0) % P], cmask

    def comp_topk(q, pts, msk):
        inbox = inbox_of(q, pts, msk)
        iota = jnp.arange(P, dtype=jnp.int32)
        keys = jnp.where(inbox, iota, P + iota)
        neg, _ = jax.lax.top_k(-keys, M)
        skeys = -neg[::-1]  # ascending
        cmask = skeys < P
        return pts[jnp.where(cmask, skeys, 0) % P], cmask

    def comp_scatter(q, pts, msk):
        inbox = inbox_of(q, pts, msk)
        pos = jnp.cumsum(inbox.astype(jnp.int32)) - 1
        idx = jnp.where(inbox & (pos < M), pos, M)
        cand = jnp.zeros((M + 1, 3), pts.dtype).at[idx].set(pts)
        cmask = jnp.arange(M) < jnp.sum(inbox)
        return cand[:M], cmask

    strategies = {
        "searchsorted": comp_searchsorted,
        "sortkeys": comp_sortkeys,
        "topk": comp_topk,
        "scatter": comp_scatter,
    }

    def timed(name, fn, *args):
        t0 = time.time()
        out = jax.block_until_ready(fn(*args))
        compile_s = time.time() - t0
        lat = []
        for _ in range(REPS):
            t0 = time.time()
            out = jax.block_until_ready(fn(*args))
            lat.append((time.time() - t0) / CHAIN)
        import numpy as np

        ms = float(np.median(lat)) * 1e3
        print(json.dumps({"strategy": name, "per_iter_ms": round(ms, 3),
                          "compile_s": round(compile_s, 1)}), flush=True)
        return ms

    results = {}

    # baseline: brute batched knn over all P
    @jax.jit
    def brute_chain(qs):
        def body(qs, _):
            d, o = jax.vmap(lambda q, p, m: knn(q, p, m, K))(qs, points, mask)
            return qs + 1e-7 * jnp.mean(o), None
        qs, _ = jax.lax.scan(body, qs, None, length=CHAIN)
        return qs

    results["brute"] = timed("brute", brute_chain, queries)

    for name, comp in strategies.items():
        @jax.jit
        def comp_only_chain(qs, comp=comp):
            def body(qs, _):
                cand, cmask = jax.vmap(comp)(qs, points, mask)
                return qs + 1e-7 * jnp.mean(cand), None
            qs, _ = jax.lax.scan(body, qs, None, length=CHAIN)
            return qs

        @jax.jit
        def e2e_chain(qs, comp=comp):
            def body(qs, _):
                cand, cmask = jax.vmap(comp)(qs, points, mask)
                d, o = jax.vmap(lambda q, p, m: knn(q, p, m, K))(qs, cand, cmask)
                return qs + 1e-7 * jnp.mean(o), None
            qs, _ = jax.lax.scan(body, qs, None, length=CHAIN)
            return qs

        results[f"{name}_comp"] = timed(f"{name}_comp", comp_only_chain, queries)
        results[f"{name}_e2e"] = timed(f"{name}_e2e", e2e_chain, queries)

    payload = {"B": B, "P": P, "Q": Q, "M": M, "chain": CHAIN,
               "device": "cpu-smoke" if SMOKE else "tpu", "results": results}
    print(json.dumps(payload), flush=True)
    if not SMOKE:
        with open(os.path.join(_REPO, "COMPACTION_PROBE.json"), "w") as f:
            json.dump(payload, f, indent=2)


if __name__ == "__main__":
    main()
