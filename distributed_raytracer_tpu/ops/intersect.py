"""Batched closest-hit ray×sphere intersection.

TPU-native replacement for the reference's per-object virtual dispatch:
`Sphere::hit` (sphere.rs:28-57, the half-b quadratic with near-then-far root
selection) combined with `HittableList::hit`'s linear closest-so-far scan
(hittable_list.rs:60-74).  Instead of N sequential trait calls per ray, we
compute ALL ray×sphere candidate ts as dense [R, N] arrays — the two inner
products that dominate are expressed as [R,3]×[3,N] matmuls so XLA can put
them on the MXU — mask invalid roots, and take a branchless argmin.

The strict `Interval::surrounds` semantics (interval.rs:31-33: t_min < t <
t_max, both strict) are preserved.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from distributed_raytracer_tpu.core.vecmath import BIG, T_MIN
from distributed_raytracer_tpu.models.scene import Scene


class HitResult(NamedTuple):
    """Batched analogue of HitRecord (hittable.rs:6-13), before shading gathers."""

    t: jnp.ndarray    # [R] f32, distance of closest valid hit (BIG if none)
    idx: jnp.ndarray  # [R] i32, index of the winning sphere (0 if none)
    hit: jnp.ndarray  # [R] bool


def candidate_ts(
    ray_o: jnp.ndarray,
    ray_d: jnp.ndarray,
    scene: Scene,
    t_min: float = T_MIN,
    t_max: float = BIG,
) -> jnp.ndarray:
    """All valid hit distances as a dense [R, N] array (BIG where invalid).

    Quadratic per sphere.rs:31-49, vectorized:
        a    = |d|^2                       (per ray)
        h    = d . (c - o) = d.c - d.o     (the half-b trick, sphere.rs:33)
        c_q  = |c - o|^2 - r^2 = (|c|^2 - r^2) - 2 o.c + |o|^2
        disc = h^2 - a*c_q
        root = (h -/+ sqrt(disc)) / a, near root preferred (sphere.rs:43-49)
    d.c and o.c are [R,3] @ [3,N] matmuls.
    """
    centers_t = scene.centers.T  # [3, N]
    # precision matters: TPU matmuls default to bf16 passes, which at the
    # quadratic's value scales flips hit/miss on ~6% of rays (measured on
    # v5e).  Force full f32 accumulation.
    d_dot_c = jnp.matmul(ray_d, centers_t, precision="highest")  # [R, N]
    o_dot_c = jnp.matmul(ray_o, centers_t, precision="highest")  # [R, N]

    a = jnp.sum(ray_d * ray_d, axis=-1, keepdims=True)       # [R, 1]
    d_dot_o = jnp.sum(ray_d * ray_o, axis=-1, keepdims=True)  # [R, 1]
    o_norm2 = jnp.sum(ray_o * ray_o, axis=-1, keepdims=True)  # [R, 1]
    c_norm2_minus_r2 = (
        jnp.sum(scene.centers * scene.centers, axis=-1) - scene.radii * scene.radii
    )  # [N]

    h = d_dot_c - d_dot_o                                  # [R, N]
    c_q = c_norm2_minus_r2[None, :] - 2.0 * o_dot_c + o_norm2  # [R, N]

    disc = h * h - a * c_q
    # double-where: sqrt's derivative at 0 is inf, and inf * (select 0) = NaN
    # under reverse-mode AD; feed sqrt a safe value on the miss branch.
    safe_disc = jnp.where(disc > 0.0, disc, 1.0)
    sqrtd = jnp.where(disc > 0.0, jnp.sqrt(safe_disc), 0.0)
    inv_a = 1.0 / a
    root_near = (h - sqrtd) * inv_a
    root_far = (h + sqrtd) * inv_a

    # radius<=0 marks padding spheres (SceneBuilder/shard_scene): mask them
    # outright rather than trusting the discriminant at the f32 edge
    real = (scene.radii > 0.0)[None, :]
    ok = (disc >= 0.0) & real
    near_valid = ok & (root_near > t_min) & (root_near < t_max)
    far_valid = ok & (root_far > t_min) & (root_far < t_max)
    t = jnp.where(near_valid, root_near, jnp.where(far_valid, root_far, BIG))
    return t


def closest_hit(
    ray_o: jnp.ndarray,
    ray_d: jnp.ndarray,
    scene: Scene,
    t_min: float = T_MIN,
    t_max: float = BIG,
) -> HitResult:
    """Closest-hit over the whole scene: branchless argmin over the sphere axis,
    replacing the closest-so-far scan of hittable_list.rs:60-74."""
    t_all = candidate_ts(ray_o, ray_d, scene, t_min, t_max)  # [R, N]
    idx = jnp.argmin(t_all, axis=-1).astype(jnp.int32)       # [R]
    t = jnp.min(t_all, axis=-1)
    return HitResult(t=t, idx=idx, hit=t < BIG)
