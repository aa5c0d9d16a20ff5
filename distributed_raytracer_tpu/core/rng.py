"""Closed-form batched samplers on threefry keys.

The reference samples with *rejection loops* on a global, unseeded thread RNG
(random_unit_vector: vec3.rs:76-84; random_in_unit_disk: vec3.rs:111-118;
random_f64: prelude.rs:23-25).  Rejection loops are data-dependent control
flow — hostile to fixed-shape SIMD — and unseeded RNG makes renders
non-reproducible.  Here every sampler is a closed-form transform of threefry
draws, so a whole wavefront samples in one fused VPU op and every render is
reproducible from a single root key.
"""

from __future__ import annotations

from typing import Sequence, Union

import jax
import jax.numpy as jnp

Shape = Union[int, Sequence[int]]


def _shape(batch_shape: Shape) -> tuple:
    if isinstance(batch_shape, int):
        return (batch_shape,)
    return tuple(batch_shape)


def uniform(key: jax.Array, batch_shape: Shape = ()) -> jnp.ndarray:
    """U[0,1) draws — the `random_f64()` equivalent (prelude.rs:23-25)."""
    return jax.random.uniform(key, _shape(batch_shape), dtype=jnp.float32)


def uniform_range(
    key: jax.Array, lo: float, hi: float, batch_shape: Shape = ()
) -> jnp.ndarray:
    """U[lo,hi) draws — `random_f64_range` (prelude.rs:28-30)."""
    return jax.random.uniform(
        key, _shape(batch_shape), dtype=jnp.float32, minval=lo, maxval=hi
    )


def unit_vector(key: jax.Array, batch_shape: Shape = ()) -> jnp.ndarray:
    """Uniform direction on the unit sphere, shape [*batch, 3].

    Replaces the rejection loop of vec3.rs:76-84 with the Gaussian-normalize
    identity (isotropy of the multivariate normal): same distribution, fixed
    shape, no control flow.
    """
    g = jax.random.normal(key, _shape(batch_shape) + (3,), dtype=jnp.float32)
    norm2 = jnp.sum(g * g, axis=-1, keepdims=True)
    # Degenerate all-zero draw has probability ~0; guard anyway.
    inv = jax.lax.rsqrt(jnp.maximum(norm2, 1e-20))
    return g * inv


def in_unit_disk(key: jax.Array, batch_shape: Shape = ()) -> jnp.ndarray:
    """Uniform point in the unit disk (z=0), shape [*batch, 3].

    Replaces the rejection loop of vec3.rs:111-118 with the sqrt-polar map
    (r = sqrt(u1), theta = 2*pi*u2): exact same distribution, fixed shape.
    """
    ku, kv = jax.random.split(key)
    shp = _shape(batch_shape)
    r = jnp.sqrt(jax.random.uniform(ku, shp, dtype=jnp.float32))
    theta = jax.random.uniform(
        kv, shp, dtype=jnp.float32, minval=0.0, maxval=2.0 * jnp.pi
    )
    return jnp.stack(
        [r * jnp.cos(theta), r * jnp.sin(theta), jnp.zeros(shp, jnp.float32)],
        axis=-1,
    )


def square_jitter(key: jax.Array, batch_shape: Shape = ()) -> jnp.ndarray:
    """Random offset in [-0.5, 0.5)^2 (z=0) — `sample_square` (camera.rs:253-256)."""
    shp = _shape(batch_shape)
    xy = jax.random.uniform(
        key, shp + (2,), dtype=jnp.float32, minval=-0.5, maxval=0.5
    )
    return jnp.concatenate([xy, jnp.zeros(shp + (1,), jnp.float32)], axis=-1)
