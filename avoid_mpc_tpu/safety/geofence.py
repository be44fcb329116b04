"""Geofences + safety evaluation — the AirLib safety layer, batched.

Reference: ``AirLib/src/safety/`` (``SafetyEval``, ``CubeGeoFence``,
``SphereGeoFence``) — axis-aligned-cube and sphere keep-in fences with
distance queries; unused in the reference's flight pipeline but part of its
API surface (SURVEY.md §2.4).  Here they are pure batched predicates usable
inside jitted Monte-Carlo loops (e.g. to terminate scenarios that leave the
arena).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class CubeGeofence(NamedTuple):
    lo: jax.Array  # (3,) min corner
    hi: jax.Array  # (3,) max corner

    def contains(self, p: jax.Array) -> jax.Array:
        return jnp.all((p >= self.lo) & (p <= self.hi), axis=-1)

    def distance_inside(self, p: jax.Array) -> jax.Array:
        """Distance to the nearest face (negative when outside)."""
        return jnp.minimum(jnp.min(p - self.lo, axis=-1), jnp.min(self.hi - p, axis=-1))


class SphereGeofence(NamedTuple):
    center: jax.Array  # (3,)
    radius: jax.Array  # scalar

    def contains(self, p: jax.Array) -> jax.Array:
        return jnp.linalg.norm(p - self.center, axis=-1) <= self.radius

    def distance_inside(self, p: jax.Array) -> jax.Array:
        return self.radius - jnp.linalg.norm(p - self.center, axis=-1)


def geofence_check(p: jax.Array, fences) -> jax.Array:
    """All-fences keep-in check (SafetyEval's obstacle-free variant)."""
    ok = jnp.asarray(True)
    for f in fences:
        ok = ok & f.contains(p)
    return ok


def nearest_fence_distance(p: jax.Array, fences) -> jax.Array:
    d = jnp.asarray(jnp.inf, dtype=p.dtype)
    for f in fences:
        d = jnp.minimum(d, f.distance_inside(p))
    return d
