"""Axis-aligned bounding boxes — CORRECT slab test and sphere overlap.

Parity with bounding_box.rs:1-76, minus its two latent bugs (documented in
SURVEY.md §7): the reference's slab loop `for a in 0..2` skips the z axis
(bounding_box.rs:53) and operator precedence computes `min - origin/dir`
instead of `(min - origin)/dir` (bounding_box.rs:55-56).  Both are fixed
here; tests pin the correct behavior.

Used by parallel/spatial.py for grid-cell scene sharding (the reference's
create_bounding_volumes + intersect_sphere flow,
orchestrator_server.rs:119-163) and available as a general culling
primitive.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax.numpy as jnp
import numpy as np

from distributed_raytracer_tpu.core.vecmath import BIG


class AABB(NamedTuple):
    lo: jnp.ndarray  # [..., 3]
    hi: jnp.ndarray  # [..., 3]


def intersect_sphere(box: AABB, center, radius) -> jnp.ndarray:
    """True where the sphere overlaps the box: closest-point-in-box vs
    radius (the bounding_box.rs:31-44 test, vectorized).

    Broadcasts: box [...,3] vs center [...,3], radius [...]."""
    center = jnp.asarray(center)
    closest = jnp.clip(center, box.lo, box.hi)
    d2 = jnp.sum((center - closest) ** 2, axis=-1)
    return d2 <= jnp.asarray(radius) ** 2


def hit_interval(
    box: AABB, ray_o: jnp.ndarray, ray_d: jnp.ndarray,
    t_min: float = 1e-3, t_max: float = BIG,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Correct 3-axis slab test.  Returns (hit, t_enter, t_exit), batched
    over rays [R,3] x boxes broadcast.

    (The reference's version tests only x/y and mis-parenthesizes the t
    computation, bounding_box.rs:53-56 — fixed, not replicated.)
    """
    inv_d = 1.0 / jnp.where(jnp.abs(ray_d) > 1e-30, ray_d, 1e-30)
    t0 = (box.lo - ray_o) * inv_d
    t1 = (box.hi - ray_o) * inv_d
    t_near = jnp.max(jnp.minimum(t0, t1), axis=-1)
    t_far = jnp.min(jnp.maximum(t0, t1), axis=-1)
    t_enter = jnp.maximum(t_near, t_min)
    t_exit = jnp.minimum(t_far, t_max)
    return t_enter <= t_exit, t_enter, t_exit


def grid_cells(
    n_x: int = 6,
    n_z: int = 6,
    x_range: Tuple[float, float] = (-12.0, 12.0),
    z_range: Tuple[float, float] = (-12.0, 12.0),
    overlap: float = 2.0,
    edge_extent: float = 1e6,
) -> AABB:
    """x/z grid of overlapping, y-unbounded slabs — the reference's spatial
    sharding layout (create_bounding_volumes, orchestrator_server.rs:119-143:
    a 6x6 x/z grid of 8-wide overlapping slabs with edge cells extended to
    +/-1e6 and y unbounded), parameterized instead of hard-coded.

    Returns an AABB batch of shape [n_x * n_z, 3]."""
    xs = np.linspace(x_range[0], x_range[1], n_x + 1)
    zs = np.linspace(z_range[0], z_range[1], n_z + 1)
    lo, hi = [], []
    for i in range(n_x):
        for k in range(n_z):
            x0, x1 = xs[i] - overlap, xs[i + 1] + overlap
            z0, z1 = zs[k] - overlap, zs[k + 1] + overlap
            if i == 0:
                x0 = -edge_extent
            if i == n_x - 1:
                x1 = edge_extent
            if k == 0:
                z0 = -edge_extent
            if k == n_z - 1:
                z1 = edge_extent
            lo.append((x0, -edge_extent, z0))
            hi.append((x1, edge_extent, z1))
    return AABB(
        lo=jnp.asarray(np.asarray(lo), jnp.float32),
        hi=jnp.asarray(np.asarray(hi), jnp.float32),
    )
