"""Signal filters — the COG accelerometer filter, as explicit-state ops.

Reference: ``COGFilter`` (avoid_mpc/src/COGFilter.cpp:2-23): exponentially
weighted moving average over a sliding window (newest sample gets weight 1,
each older sample decays by ``weight_decay``), window size 10, decay 0.8 —
applied to the body-frame IMU accelerations before gravity subtraction
(``AvoidanceStateMachine.cpp:136-153``).

The deque becomes a fixed-shape ring buffer with a fill counter so the warm-up
behavior (shorter effective window before 10 samples arrive) matches exactly.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class COGFilterState(NamedTuple):
    buffer: jax.Array  # (window, dim) newest at slot `head`
    head: jax.Array  # int32 ring index of the newest sample
    count: jax.Array  # int32 samples seen (capped at window)


def cog_filter_init(window: int = 10, dim: int = 3, dtype=jnp.float32) -> COGFilterState:
    return COGFilterState(
        buffer=jnp.zeros((window, dim), dtype=dtype),
        head=jnp.asarray(0, jnp.int32),
        count=jnp.asarray(0, jnp.int32),
    )


def cog_filter_update(
    s: COGFilterState, x: jax.Array, decay: float = 0.8
) -> tuple[COGFilterState, jax.Array]:
    """Push a sample, return (new_state, filtered value)."""
    window = s.buffer.shape[0]
    head = jnp.mod(s.head + 1, window)
    buffer = s.buffer.at[head].set(x)
    count = jnp.minimum(s.count + 1, window)

    # age of each slot: newest = 0
    idx = jnp.arange(window, dtype=jnp.int32)
    age = jnp.mod(head - idx, window)
    w = jnp.power(jnp.asarray(decay, dtype=x.dtype), age.astype(x.dtype))
    w = jnp.where(age < count, w, 0.0)
    filtered = (w[:, None] * buffer).sum(axis=0) / jnp.maximum(w.sum(), 1e-12)
    return COGFilterState(buffer=buffer, head=head, count=count), filtered
