"""Batched ray type.

API parity with the reference's `Ray { origin, direction }` + `at(t)`
(ray.rs:5-19), as a NamedTuple of [..., 3] arrays so a whole wavefront is
one value.  Most internal code passes (origin, direction) arrays directly;
this type is the user-facing convenience.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp


class Ray(NamedTuple):
    origin: jnp.ndarray     # [..., 3]
    direction: jnp.ndarray  # [..., 3]

    def at(self, t: jnp.ndarray) -> jnp.ndarray:
        """origin + t * direction (ray.rs:17-19), t broadcast over [...]."""
        return self.origin + jnp.asarray(t)[..., None] * self.direction
