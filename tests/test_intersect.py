"""Ray×sphere intersection parity vs independent f64 quadratic (sphere.rs:28-57
semantics: half-b quadratic, near-then-far root, strict surrounds interval)."""

import jax.numpy as jnp
import numpy as np

from distributed_raytracer_tpu.core.vecmath import BIG
from distributed_raytracer_tpu.models.scene import SceneBuilder
from distributed_raytracer_tpu.ops.intersect import closest_hit


def unit_sphere_scene():
    return SceneBuilder().add_lambertian((0.0, 0.0, -2.0), 1.0, (0.5, 0.5, 0.5)).build()


def test_head_on_hit():
    scene = unit_sphere_scene()
    o = jnp.asarray([[0.0, 0.0, 0.0]])
    d = jnp.asarray([[0.0, 0.0, -1.0]])
    res = closest_hit(o, d, scene)
    assert bool(res.hit[0])
    np.testing.assert_allclose(float(res.t[0]), 1.0, rtol=1e-5)  # near root
    assert int(res.idx[0]) == 0


def test_inside_sphere_takes_far_root():
    # origin at sphere center: near root is negative -> far root (sphere.rs:43-49)
    scene = unit_sphere_scene()
    o = jnp.asarray([[0.0, 0.0, -2.0]])
    d = jnp.asarray([[0.0, 0.0, -1.0]])
    res = closest_hit(o, d, scene)
    assert bool(res.hit[0])
    np.testing.assert_allclose(float(res.t[0]), 1.0, rtol=1e-5)


def test_miss():
    scene = unit_sphere_scene()
    o = jnp.asarray([[0.0, 5.0, 0.0]])
    d = jnp.asarray([[0.0, 0.0, -1.0]])
    res = closest_hit(o, d, scene)
    assert not bool(res.hit[0])
    assert float(res.t[0]) == np.float32(BIG)


def test_t_min_excludes_origin_contact():
    # shadow-acne guard: a hit exactly at t=0 must be rejected (strict > t_min)
    scene = unit_sphere_scene()
    o = jnp.asarray([[0.0, 0.0, -1.0]])  # on the surface
    d = jnp.asarray([[0.0, 0.0, -1.0]])
    res = closest_hit(o, d, scene)
    assert bool(res.hit[0])
    np.testing.assert_allclose(float(res.t[0]), 2.0, rtol=1e-4)  # exits far side


def test_unnormalized_direction():
    # a != 1 must be handled (sphere.rs:31 computes a = |d|^2)
    scene = unit_sphere_scene()
    o = jnp.asarray([[0.0, 0.0, 0.0]])
    d = jnp.asarray([[0.0, 0.0, -4.0]])
    res = closest_hit(o, d, scene)
    np.testing.assert_allclose(float(res.t[0]), 0.25, rtol=1e-5)


def test_closest_of_many():
    # closest-so-far semantics of hittable_list.rs:60-74: nearest sphere wins
    scene = (
        SceneBuilder()
        .add_lambertian((0.0, 0.0, -10.0), 1.0, (0.5, 0.5, 0.5))
        .add_lambertian((0.0, 0.0, -4.0), 1.0, (0.5, 0.5, 0.5))
        .add_lambertian((0.0, 0.0, -7.0), 1.0, (0.5, 0.5, 0.5))
        .build()
    )
    o = jnp.zeros((1, 3))
    d = jnp.asarray([[0.0, 0.0, -1.0]])
    res = closest_hit(o, d, scene)
    assert int(res.idx[0]) == 1
    np.testing.assert_allclose(float(res.t[0]), 3.0, rtol=1e-5)


def test_vs_f64_reference_random():
    # random rays vs an independent f64 quadratic
    rng = np.random.default_rng(3)
    n_spheres = 16
    b = SceneBuilder()
    centers = rng.uniform(-5, 5, (n_spheres, 3))
    radii = rng.uniform(0.3, 2.0, n_spheres)
    for c, r in zip(centers, radii):
        b.add_lambertian(c, r, (0.5, 0.5, 0.5))
    scene = b.build()

    o = rng.uniform(-8, 8, (256, 3)).astype(np.float32)
    d = rng.normal(size=(256, 3)).astype(np.float32)
    res = closest_hit(jnp.asarray(o), jnp.asarray(d), scene)

    # f64 reference
    of, df = o.astype(np.float64), d.astype(np.float64)
    oc = centers[None] - of[:, None]
    a = np.sum(df * df, -1)[:, None]
    h = np.sum(df[:, None] * oc, -1)
    c = np.sum(oc * oc, -1) - radii[None] ** 2
    disc = h * h - a * c
    sq = np.sqrt(np.maximum(disc, 0))
    near, far = (h - sq) / a, (h + sq) / a
    ok = disc >= 0
    t = np.where(
        ok & (near > 1e-3), near, np.where(ok & (far > 1e-3), far, np.inf)
    )
    t_ref = t.min(-1)
    hit_ref = np.isfinite(t_ref)

    np.testing.assert_array_equal(np.asarray(res.hit), hit_ref)
    np.testing.assert_allclose(
        np.asarray(res.t)[hit_ref], t_ref[hit_ref], rtol=2e-4
    )


def test_padding_spheres_never_hit():
    scene = (
        SceneBuilder()
        .add_lambertian((0.0, 0.0, -2.0), 1.0, (0.5, 0.5, 0.5))
        .build(pad_to=128)
    )
    assert scene.num_spheres == 128
    rng = np.random.default_rng(5)
    o = jnp.asarray(rng.uniform(-5, 5, (128, 3)), jnp.float32)
    d = jnp.asarray(rng.normal(size=(128, 3)), jnp.float32)
    res = closest_hit(o, d, scene)
    assert np.all(np.asarray(res.idx)[np.asarray(res.hit)] == 0)
