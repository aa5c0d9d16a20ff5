"""Batched 1-D interval.

API parity with interval.rs:1-36 (EMPTY/UNIVERSE constants, size/contains/
surrounds/clamp), vectorized.  `surrounds` (strict) is the hit-range test
used throughout intersection; `clamp` is the color-intensity clamp
(colors.rs:7,19-21).
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

INFINITY = float("inf")


class Interval(NamedTuple):
    min: jnp.ndarray
    max: jnp.ndarray

    def size(self):
        return self.max - self.min  # interval.rs:20-22

    def contains(self, x):
        return (self.min <= x) & (x <= self.max)  # interval.rs:24-26

    def surrounds(self, x):
        return (self.min < x) & (x < self.max)  # interval.rs:28-30 (strict)

    def clamp(self, x):
        return jnp.clip(x, self.min, self.max)  # interval.rs:32-36


EMPTY = Interval(jnp.float32(INFINITY), jnp.float32(-INFINITY))      # interval.rs:9
UNIVERSE = Interval(jnp.float32(-INFINITY), jnp.float32(INFINITY))   # interval.rs:10
