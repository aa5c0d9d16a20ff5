"""Material scatter semantics (material.rs:10-123), batched."""

import jax
import jax.numpy as jnp
import numpy as np

from distributed_raytracer_tpu.models.scene import SceneBuilder
from distributed_raytracer_tpu.ops import materials
from distributed_raytracer_tpu.ops.intersect import closest_hit


def scatter_on(scene, o, d, key=None):
    key = key if key is not None else jax.random.PRNGKey(0)
    res = closest_hit(o, d, scene)
    assert bool(np.all(np.asarray(res.hit)))
    return materials.scatter(key, o, d, res.t, res.idx, scene)


def head_on_rays(n=256):
    o = jnp.tile(jnp.asarray([[0.0, 0.0, 0.0]]), (n, 1))
    d = jnp.tile(jnp.asarray([[0.0, 0.0, -1.0]]), (n, 1))
    return o, d


def test_lambertian_distribution_and_albedo():
    scene = SceneBuilder().add_lambertian((0, 0, -2), 1.0, (0.1, 0.2, 0.7)).build()
    o, d = head_on_rays()
    sc = scatter_on(scene, o, d)
    assert bool(np.all(np.asarray(sc.scattered)))
    np.testing.assert_allclose(
        np.asarray(sc.attenuation), np.tile([0.1, 0.2, 0.7], (256, 1)), rtol=1e-6
    )
    # scatter dir = normal + unit vec: mean direction should be ~normal (0,0,1)
    dirs = np.asarray(sc.direction)
    mean = dirs.mean(0)
    assert mean[2] > 0.8 and abs(mean[0]) < 0.15 and abs(mean[1]) < 0.15
    # max length 2 (normal + unit), never below the tangent plane minus eps
    assert np.all(np.linalg.norm(dirs, axis=-1) <= 2.0 + 1e-5)
    # scatter origin is the hit point (0,0,-1)
    np.testing.assert_allclose(np.asarray(sc.origin), np.tile([0.0, 0.0, -1.0], (256, 1)), atol=1e-5)


def test_metal_perfect_mirror():
    scene = SceneBuilder().add_metal((0, 0, -2), 1.0, (0.8, 0.8, 0.8), 0.0).build()
    # 45-degree grazing ray onto the sphere's top point (0,0,-1)... use head-on:
    o, d = head_on_rays(8)
    sc = scatter_on(scene, o, d)
    # head-on reflection off normal (0,0,1): d=(0,0,-1) -> (0,0,1), unit-normalized
    np.testing.assert_allclose(np.asarray(sc.direction), np.tile([0.0, 0.0, 1.0], (8, 1)), atol=1e-6)
    assert bool(np.all(np.asarray(sc.scattered)))


def test_metal_fuzz_below_surface_absorbs():
    # fuzz=1 at grazing incidence produces some below-surface dirs -> absorbed
    # (material.rs:79-80: scatter iff dot(scattered, normal) > 0)
    scene = SceneBuilder().add_metal((0, 0, -2), 1.0, (0.8, 0.8, 0.8), 1.0).build()
    n = 2048
    xs = np.linspace(0.9, 0.99, n, dtype=np.float32)  # near-silhouette rays
    o = jnp.asarray(np.stack([xs, np.zeros(n, np.float32), np.zeros(n, np.float32)], -1))
    d = jnp.tile(jnp.asarray([[0.0, 0.0, -1.0]]), (n, 1))
    res = closest_hit(o, d, scene)
    sc = materials.scatter(jax.random.PRNGKey(0), o, d, res.t, res.idx, scene)
    scat = np.asarray(sc.scattered)
    # verify the absorb rule against the actual per-ray normal
    p = np.asarray(sc.origin)
    normal = (p - np.array([0, 0, -2])) / 1.0
    below = np.sum(np.asarray(sc.direction) * normal, -1) <= 0
    np.testing.assert_array_equal(scat, ~below)
    assert 0 < scat.sum() < n  # both outcomes occur at fuzz=1


def test_dielectric_head_on_mostly_refracts():
    scene = SceneBuilder().add_dielectric((0, 0, -2), 1.0, 1.5).build()
    o, d = head_on_rays(4096)
    sc = scatter_on(scene, o, d)
    assert bool(np.all(np.asarray(sc.scattered)))
    np.testing.assert_allclose(np.asarray(sc.attenuation), 1.0)
    dirs = np.asarray(sc.direction)
    # head-on: refraction keeps direction (0,0,-1); reflection flips to (0,0,1).
    # Schlick at cos=1, ri=1/1.5: r0 = 0.04 -> ~4% reflect
    refract_frac = (dirs[:, 2] < 0).mean()
    r0 = ((1 - 1 / 1.5) / (1 + 1 / 1.5)) ** 2
    assert abs((1 - refract_frac) - r0) < 0.02


def test_dielectric_total_internal_reflection():
    # ray inside glass (ior 1.5) hitting the surface beyond the critical angle
    # critical angle asin(1/1.5) ~ 41.8 deg; use 60 deg
    scene = SceneBuilder().add_dielectric((0.0, 0.0, 0.0), 1.0, 1.5).build()
    # start inside the sphere, direction at 60 deg from the outward normal at exit
    # point: shoot from center-ish at a slant so incidence angle > critical.
    # Geometry: ray from (-0.8, 0, 0) direction (cos80, sin80-ish)... simpler:
    # chord ray: origin (0, -0.9, 0) direction (1, 0.05, 0): grazing exit.
    o = jnp.asarray([[0.0, -0.9, 0.0]])
    d = jnp.asarray([[1.0, 0.05, 0.0]])
    res = closest_hit(o, d, scene)
    sc = materials.scatter(jax.random.PRNGKey(0), o, d, res.t, res.idx, scene)
    # exit attempt is back_face (inside): ri = 1.5; check sin_theta * ri > 1 ->
    # must reflect: direction stays inside (dot with outward normal < 0)
    p = np.asarray(o + res.t[:, None] * d)[0]
    outward = p / np.linalg.norm(p)
    assert float(np.dot(np.asarray(sc.direction)[0], outward)) < 0


def test_absorbing_material():
    scene = SceneBuilder().add_absorbing((0, 0, -2), 1.0).build()
    o, d = head_on_rays(4)
    sc = scatter_on(scene, o, d)
    assert not bool(np.any(np.asarray(sc.scattered)))


def test_transparent_passthrough():
    scene = SceneBuilder().add_transparent((0, 0, -2), 1.0).build()
    o, d = head_on_rays(4)
    sc = scatter_on(scene, o, d)
    assert bool(np.all(np.asarray(sc.scattered)))
    np.testing.assert_allclose(np.asarray(sc.attenuation), 1.0)
    np.testing.assert_array_equal(np.asarray(sc.direction), np.asarray(d))
    # material.rs:28: scattered = r_in.clone() -> origin unchanged too
    np.testing.assert_array_equal(np.asarray(sc.origin), np.asarray(o))


def test_schlick_values():
    # material.rs:93-98 closed form at normal incidence
    ri = 1.0 / 1.5
    r0 = ((1 - ri) / (1 + ri)) ** 2
    assert abs(r0 - 0.04) < 0.001
