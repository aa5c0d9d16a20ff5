"""Batched material scattering — select-based dispatch over mat_type codes.

TPU-native replacement for `trait Material::scatter` dynamic dispatch
(material.rs:4-8) and its five impls.  All scatter modes are computed for
every ray in fused VPU ops and the winner is selected with `jnp.where` on
the hit sphere's mat_type — the standard trade of redundant compute for
uniform control flow.

Scatter-or-absorb semantics match the reference exactly:
- Lambertian (material.rs:44-57): dir = normal + random_unit_vector, with
  the near-zero degenerate fallback to the normal; always scatters.
- Metal (material.rs:71-81): dir = unit(reflect(d, n)) + fuzz*ruv; absorbed
  if the fuzzed direction points below the surface.
- Dielectric (material.rs:101-123): Schlick reflectance vs stochastic
  refraction, total-internal-reflection guard; always scatters, white
  attenuation.
- DefaultMaterial (material.rs:10-19): always absorbs.
- Transparent (material.rs:21-31): passes the ray through unchanged with
  white attenuation (the reference uses it for AABB pass-through).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from distributed_raytracer_tpu.core import rng as drng
from distributed_raytracer_tpu.core import vecmath as vm
from distributed_raytracer_tpu.models.scene import (
    ABSORB,
    DIELECTRIC,
    LAMBERTIAN,
    METAL,
    TRANSPARENT,
    Scene,
)


class ScatterResult(NamedTuple):
    origin: jnp.ndarray       # [R,3] scatter origin (hit point)
    direction: jnp.ndarray    # [R,3] scattered direction
    attenuation: jnp.ndarray  # [R,3] per-bounce attenuation factor
    scattered: jnp.ndarray    # [R] bool — False means absorbed


def surface_geometry(ray_o, ray_d, t, centers, radii):
    """Hit point, outward normal, and face orientation — the batched
    equivalent of HitRecord::set_face_normal (hittable.rs:16-22) plus
    sphere.rs:51-54's outward-normal computation.

    centers/radii here are the per-ray GATHERED winning-sphere attributes.
    """
    p = ray_o + t[:, None] * ray_d
    safe_r = jnp.where(radii > 0.0, radii, 1.0)
    outward = (p - centers) / safe_r[:, None]
    front_face = vm.dot(ray_d, outward) < 0.0
    normal = jnp.where(front_face[:, None], outward, -outward)
    return p, normal, front_face


def gather_hit_params(scene: Scene, sphere_idx: jnp.ndarray) -> dict:
    """Per-ray winning-sphere attributes (the HitRecord mat clone,
    sphere.rs:55), as a dict of [R,...] arrays."""
    return dict(
        centers=scene.centers[sphere_idx],
        radii=scene.radii[sphere_idx],
        albedo=scene.albedo[sphere_idx],
        mat=scene.mat_type[sphere_idx],
        fuzz=scene.fuzz[sphere_idx],
        ior=scene.ior[sphere_idx],
    )


def scatter(
    key: jax.Array,
    ray_o: jnp.ndarray,
    ray_d: jnp.ndarray,
    t: jnp.ndarray,
    sphere_idx: jnp.ndarray,
    scene: Scene,
    draws=None,
) -> ScatterResult:
    """One scatter event for a wavefront of rays that hit sphere_idx at t."""
    return scatter_gathered(
        key, ray_o, ray_d, t, gather_hit_params(scene, sphere_idx), draws=draws
    )


def scatter_gathered(
    key: jax.Array,
    ray_o: jnp.ndarray,
    ray_d: jnp.ndarray,
    t: jnp.ndarray,
    params: dict,
    draws: "tuple[jnp.ndarray, jnp.ndarray] | None" = None,
) -> ScatterResult:
    """scatter() with the winning-sphere attributes already gathered — the
    entry point for the scene-sharded (object-server-parallel) path, where
    the gather is a masked psum over the scene mesh axis.

    draws: optionally supply the random draws externally as
    (unit_vectors [R,3], uniform [R]) — used by the path-replay backward
    (grad/pathgrad.py), which must regenerate the exact same noise per
    (ray, bounce) outside the scan."""
    r = ray_o.shape[0]

    centers = params["centers"]  # [R,3]
    radii = params["radii"]      # [R]
    albedo = params["albedo"]    # [R,3]
    mat = params["mat"]          # [R]
    fuzz = params["fuzz"]        # [R]
    ior = params["ior"]          # [R]

    p, normal, front_face = surface_geometry(ray_o, ray_d, t, centers, radii)

    if draws is None:
        k_unit, k_choice = jax.random.split(key)
        ruv = drng.unit_vector(k_unit, r)  # shared draw across material branches
        u_choice = drng.uniform(k_choice, r)
    else:
        ruv, u_choice = draws

    # --- Lambertian (material.rs:46-56) ---
    lam_dir = normal + ruv
    lam_dir = jnp.where(vm.near_zero(lam_dir)[:, None], normal, lam_dir)

    # --- Metal (material.rs:73-80) ---
    reflected = vm.unit_vector(vm.reflect(ray_d, normal))
    metal_dir = reflected + fuzz[:, None] * ruv
    metal_ok = vm.dot(metal_dir, normal) > 0.0  # below-surface absorb

    # --- Dielectric (material.rs:103-122) ---
    ri = jnp.where(front_face, 1.0 / ior, ior)
    unit_d = vm.unit_vector(ray_d)
    cos_theta = jnp.minimum(vm.dot(-unit_d, normal), 1.0)
    sin2 = 1.0 - cos_theta * cos_theta
    safe_sin2 = jnp.where(sin2 > 0.0, sin2, 1.0)  # double-where for AD
    sin_theta = jnp.where(sin2 > 0.0, jnp.sqrt(safe_sin2), 0.0)
    cannot_refract = ri * sin_theta > 1.0
    # Schlick (material.rs:93-98)
    r0 = (1.0 - ri) / (1.0 + ri)
    r0 = r0 * r0
    reflectance = r0 + (1.0 - r0) * (1.0 - cos_theta) ** 5
    choose_reflect = cannot_refract | (reflectance > u_choice)
    diel_dir = jnp.where(
        choose_reflect[:, None],
        vm.reflect(unit_d, normal),
        vm.refract(unit_d, normal, ri),
    )

    # --- select by material code ---
    is_lam = mat == LAMBERTIAN
    is_metal = mat == METAL
    is_diel = mat == DIELECTRIC
    is_transparent = mat == TRANSPARENT
    is_absorb = mat == ABSORB

    direction = jnp.where(
        is_lam[:, None],
        lam_dir,
        jnp.where(
            is_metal[:, None],
            metal_dir,
            jnp.where(is_diel[:, None], diel_dir, ray_d),  # transparent: unchanged
        ),
    )
    white = jnp.ones_like(albedo)
    attenuation = jnp.where((is_diel | is_transparent)[:, None], white, albedo)
    scattered = jnp.where(
        is_absorb, False, jnp.where(is_metal, metal_ok, True)
    )
    # Transparent keeps the original origin semantics of material.rs:28
    # (scattered = r_in.clone()), i.e. origin stays the ray origin, not p.
    origin = jnp.where(is_transparent[:, None], ray_o, p)
    return ScatterResult(
        origin=origin, direction=direction, attenuation=attenuation, scattered=scattered
    )
