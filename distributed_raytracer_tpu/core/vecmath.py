"""Batched 3-vector math on trailing-dim-3 arrays.

TPU-native replacement for the reference's scalar `Vec3` type
(/root/reference/src/raytracer/vec3.rs:7-122): every helper here operates on
arrays of shape [..., 3] so a whole wavefront of rays is one VPU op, instead
of one struct at a time.  All math is f32 (TPU-native) rather than the
reference's f64; epsilons are rescaled accordingly (see NEAR_ZERO_EPS).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

# The reference uses 1e-8 on f64 (vec3.rs:42-45).  That is below f32
# resolution for unit-scale quantities, so we use 1e-6: small enough that a
# Lambertian scatter direction this short is numerically degenerate, large
# enough to be representable in f32.
NEAR_ZERO_EPS = 1e-6

# Strictly-positive lower bound on ray t to avoid shadow acne
# (camera.rs:126,270 uses 0.001 on f64; fine in f32 too).
T_MIN = 1e-3

# Stand-in for +inf that survives arithmetic without producing NaNs.
BIG = 1e30


def dot(u: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """Batched dot product over the trailing axis (vec3.rs:64-66)."""
    return jnp.sum(u * v, axis=-1)


def length_squared(v: jnp.ndarray) -> jnp.ndarray:
    return dot(v, v)


def length(v: jnp.ndarray) -> jnp.ndarray:
    return jnp.sqrt(length_squared(v))


def cross(u: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """Batched cross product (vec3.rs:68-74)."""
    return jnp.stack(
        [
            u[..., 1] * v[..., 2] - u[..., 2] * v[..., 1],
            u[..., 2] * v[..., 0] - u[..., 0] * v[..., 2],
            u[..., 0] * v[..., 1] - u[..., 1] * v[..., 0],
        ],
        axis=-1,
    )


def unit_vector(v: jnp.ndarray) -> jnp.ndarray:
    """Normalize over the trailing axis (vec3.rs:120-122).

    Guarded against zero-length input (returns 0 rather than NaN) so it is
    safe inside masked lanes of the bounce loop.
    """
    norm2 = length_squared(v)
    safe = jnp.where(norm2 > 0.0, norm2, 1.0)  # double-where: keep AD NaN-free
    inv = jnp.where(norm2 > 0.0, jax.lax.rsqrt(safe), 0.0)
    return v * inv[..., None]


def near_zero(v: jnp.ndarray) -> jnp.ndarray:
    """True where all three components are tiny (vec3.rs:42-45), batched."""
    return jnp.all(jnp.abs(v) < NEAR_ZERO_EPS, axis=-1)


def reflect(v: jnp.ndarray, n: jnp.ndarray) -> jnp.ndarray:
    """Mirror reflection about unit normal n (vec3.rs:97-102)."""
    return v - 2.0 * dot(v, n)[..., None] * n


def refract(uv: jnp.ndarray, n: jnp.ndarray, etai_over_etat: jnp.ndarray) -> jnp.ndarray:
    """Snell refraction of unit vector uv about unit normal n (vec3.rs:104-109).

    etai_over_etat broadcasts over the batch ([...] or scalar).
    """
    cos_theta = jnp.minimum(dot(-uv, n), 1.0)
    eta = jnp.asarray(etai_over_etat)[..., None]
    r_out_perp = eta * (uv + cos_theta[..., None] * n)
    k = jnp.abs(1.0 - length_squared(r_out_perp))
    safe_k = jnp.where(k > 0.0, k, 1.0)  # double-where for AD at grazing k=0
    r_out_parallel = -jnp.where(k > 0.0, jnp.sqrt(safe_k), 0.0)[..., None] * n
    return r_out_perp + r_out_parallel


def lerp(a: jnp.ndarray, b: jnp.ndarray, t: jnp.ndarray) -> jnp.ndarray:
    """(1-t)*a + t*b with t broadcast over the trailing vector axis."""
    t = jnp.asarray(t)[..., None]
    return (1.0 - t) * a + t * b
