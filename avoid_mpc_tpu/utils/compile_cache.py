"""Persistent XLA compilation cache helper.

The axon-tunnel TPU environment compiles nontrivial jits in 5-15 minutes;
the serialized-executable cache turns reruns into seconds.  Every tool/bench
entrypoint calls :func:`enable_persistent_cache` before building graphs so
repeated campaigns/benches (and the driver's timed bench run) hit the cache.
"""

from __future__ import annotations

import os


def enable_persistent_cache(cache_dir: str | None = None) -> str:
    """Point JAX at the repo-local on-disk compilation cache."""
    import jax

    if cache_dir is None:
        cache_dir = os.path.join(
            os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
            ".jax_cache",
        )
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    return cache_dir
