"""Block-culled sweep (ops/pallas/culled_kernel.py) vs dense closest hit."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental.pallas import tpu as pltpu

from distributed_raytracer_tpu.models.presets import random_sphere_field, rtiow_final_scene
from distributed_raytracer_tpu.ops.intersect import closest_hit
from distributed_raytracer_tpu.ops.pallas.culled_kernel import (
    build_culled_scene,
    make_culled_intersect,
)
from distributed_raytracer_tpu.ops.trace import trace_rays


@pytest.fixture(scope="module")
def culled_setup():
    scene = rtiow_final_scene(seed=0)
    culled = build_culled_scene(scene, chunk=128)
    rng = np.random.default_rng(0)
    o = jnp.asarray(rng.uniform(-8, 8, (512, 3)), jnp.float32)
    d = jnp.asarray(rng.normal(size=(512, 3)), jnp.float32)
    return scene, culled, o, d


def test_reorder_preserves_sphere_multiset(culled_setup):
    scene, culled, *_ = culled_setup
    # same spheres, different order: compare sorted (radius, center-norm)
    def sig(s):
        r = np.asarray(s.radii)
        keep = r > 0
        c = np.linalg.norm(np.asarray(s.centers)[keep], axis=-1)
        return np.sort(np.stack([r[keep], c]), axis=-1)

    np.testing.assert_allclose(sig(scene), sig(culled.scene), rtol=1e-6)


@pytest.mark.parametrize("mode", ["grid", "walk"])
def test_matches_dense(culled_setup, mode):
    _, culled, o, d = culled_setup
    fn = make_culled_intersect(culled, mode=mode)
    ref = closest_hit(o, d, culled.scene)
    with pltpu.force_tpu_interpret_mode():
        got = fn(o, d, culled.scene)
    h = np.asarray(ref.hit)
    np.testing.assert_array_equal(np.asarray(got.hit), h)
    np.testing.assert_array_equal(np.asarray(got.idx)[h], np.asarray(ref.idx)[h])
    np.testing.assert_allclose(
        np.asarray(got.t)[h], np.asarray(ref.t)[h], rtol=3e-3
    )


def test_matches_dense_big_scene():
    scene = random_sphere_field(1000, seed=2)
    culled = build_culled_scene(scene, chunk=128)
    rng = np.random.default_rng(1)
    o = jnp.asarray(rng.uniform(-40, 40, (256, 3)), jnp.float32)
    d = jnp.asarray(rng.normal(size=(256, 3)), jnp.float32)
    fn = make_culled_intersect(culled)
    ref = closest_hit(o, d, culled.scene)
    with pltpu.force_tpu_interpret_mode():
        got = fn(o, d, culled.scene)
    h = np.asarray(ref.hit)
    np.testing.assert_array_equal(np.asarray(got.hit), h)
    np.testing.assert_array_equal(np.asarray(got.idx)[h], np.asarray(ref.idx)[h])


def test_trace_with_culled_intersect(culled_setup):
    _, culled, o, d = culled_setup
    fn = make_culled_intersect(culled)
    key = jax.random.PRNGKey(5)
    ref = trace_rays(culled.scene, o, d, key, 6)
    with pltpu.force_tpu_interpret_mode():
        got = trace_rays(culled.scene, o, d, key, 6, intersect_fn=fn)
    close = np.isclose(np.asarray(got), np.asarray(ref), atol=1e-2).all(axis=-1)
    assert close.mean() > 0.95


def test_culled_vjp_matches_dense_grads(culled_setup):
    _, culled, o, d = culled_setup
    fn = make_culled_intersect(culled)
    scene = culled.scene

    def loss_culled(c):
        s = scene.replace(centers=c)
        with pltpu.force_tpu_interpret_mode():
            res = fn(o, d, s)
        return jnp.sum(jnp.where(res.hit, res.t, 0.0))

    def loss_dense(c):
        s = scene.replace(centers=c)
        res = closest_hit(o, d, s)
        return jnp.sum(jnp.where(res.hit, res.t, 0.0))

    g1 = jax.grad(loss_culled)(scene.centers)
    g2 = jax.grad(loss_dense)(scene.centers)
    scale = float(jnp.abs(g2).max()) + 1e-6
    np.testing.assert_allclose(
        np.asarray(g1) / scale, np.asarray(g2) / scale, atol=2e-4
    )
