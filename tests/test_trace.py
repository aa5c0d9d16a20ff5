"""Bounce-loop semantics (camera.rs:118-144 / 264-282), masked-scan form."""

import jax
import jax.numpy as jnp
import numpy as np

from distributed_raytracer_tpu.models.scene import SceneBuilder
from distributed_raytracer_tpu.ops.trace import sky_color, trace_rays, trace_rays_fast


def test_sky_color_values():
    # camera.rs:141-143: a = 0.5*(unit_y+1); lerp(white, (.5,.7,1))
    d = jnp.asarray([[0.0, 1.0, 0.0], [0.0, -1.0, 0.0], [1.0, 0.0, 0.0]])
    out = np.asarray(sky_color(d))
    np.testing.assert_allclose(out[0], [0.5, 0.7, 1.0], rtol=1e-6)  # straight up
    np.testing.assert_allclose(out[1], [1.0, 1.0, 1.0], rtol=1e-6)  # straight down
    np.testing.assert_allclose(out[2], [0.75, 0.85, 1.0], rtol=1e-6)  # horizon


def test_miss_gives_sky():
    scene = SceneBuilder().add_lambertian((0, -100, 0), 1.0, (0.5, 0.5, 0.5)).build()
    d = jnp.asarray([[0.0, 1.0, 0.0]])
    o = jnp.zeros((1, 3))
    c = trace_rays(scene, o, d, jax.random.PRNGKey(0), 5)
    np.testing.assert_allclose(np.asarray(c)[0], [0.5, 0.7, 1.0], rtol=1e-6)


def test_absorb_gives_black():
    scene = SceneBuilder().add_absorbing((0, 0, -2), 1.0).build()
    o = jnp.zeros((1, 3))
    d = jnp.asarray([[0.0, 0.0, -1.0]])
    c = trace_rays(scene, o, d, jax.random.PRNGKey(0), 5)
    np.testing.assert_array_equal(np.asarray(c)[0], [0, 0, 0])


def test_depth_zero_gives_black():
    # camera.rs:120-123: depth exhausted -> black, even pointing at the sky
    scene = SceneBuilder().add_absorbing((0, 0, -100), 1.0).build()
    o = jnp.zeros((1, 3))
    d = jnp.asarray([[0.0, 1.0, 0.0]])
    c = trace_rays(scene, o, d, jax.random.PRNGKey(0), 0)
    np.testing.assert_array_equal(np.asarray(c)[0], [0, 0, 0])


def test_depth_exhaustion_inside_mirror_box():
    # two big facing mirrors: ray never escapes -> black after max_depth
    scene = (
        SceneBuilder()
        .add_metal((0, 0, -1002), 1000.0, (0.9, 0.9, 0.9), 0.0)
        .add_metal((0, 0, 1002), 1000.0, (0.9, 0.9, 0.9), 0.0)
        .build()
    )
    o = jnp.zeros((1, 3))
    d = jnp.asarray([[0.0, 0.0, -1.0]])
    c = trace_rays(scene, o, d, jax.random.PRNGKey(0), 4)
    np.testing.assert_array_equal(np.asarray(c)[0], [0, 0, 0])


def test_single_bounce_attenuation():
    # lambertian floor then sky: color = albedo * sky(scattered)
    scene = SceneBuilder().add_lambertian((0, -1000, 0), 999.0, (0.5, 0.25, 0.125)).build()
    o = jnp.tile(jnp.asarray([[0.0, 0.0, 0.0]]), (512, 1))
    d = jnp.tile(jnp.asarray([[0.0, -1.0, 0.0]]), (512, 1))
    c = np.asarray(trace_rays(scene, o, d, jax.random.PRNGKey(0), 8))
    # every path: hit floor, scatter up into sky (some may bounce twice off
    # the floor; albedo halves each time). colors must be componentwise
    # <= albedo * max sky and tinted in ratio ~ (4:2:1)
    assert np.all(c[:, 0] <= 0.5 + 1e-6)
    ratio = c.mean(0)
    assert ratio[0] > 1.5 * ratio[1] > 1.5 * 1.5 * ratio[2] * 0.9


def test_scan_and_while_agree():
    scene = (
        SceneBuilder()
        .add_lambertian((0, -100.5, -1), 100.0, (0.8, 0.8, 0.0))
        .add_metal((1, 0, -1), 0.5, (0.8, 0.6, 0.2), 0.2)
        .add_dielectric((-1, 0, -1), 0.5, 1.5)
        .build()
    )
    rng = np.random.default_rng(0)
    o = jnp.asarray(rng.uniform(-2, 2, (256, 3)), jnp.float32)
    d = jnp.asarray(rng.normal(size=(256, 3)), jnp.float32)
    k = jax.random.PRNGKey(42)
    c1 = trace_rays(scene, o, d, k, 16)
    c2 = trace_rays_fast(scene, o, d, k, 16)
    np.testing.assert_array_equal(np.asarray(c1), np.asarray(c2))


def test_energy_bounded():
    # attenuations are all <= 1, sky <= 1 -> colors in [0, 1]
    scene = (
        SceneBuilder()
        .add_lambertian((0, -100.5, -1), 100.0, (0.9, 0.9, 0.9))
        .add_metal((1, 0, -1), 0.5, (1.0, 1.0, 1.0), 0.1)
        .add_dielectric((-1, 0, -1), 0.5, 1.5)
        .build()
    )
    rng = np.random.default_rng(1)
    o = jnp.asarray(rng.uniform(-3, 3, (512, 3)), jnp.float32)
    d = jnp.asarray(rng.normal(size=(512, 3)), jnp.float32)
    c = np.asarray(trace_rays(scene, o, d, jax.random.PRNGKey(7), 20))
    assert np.all(c >= 0) and np.all(c <= 1 + 1e-5)
    assert np.all(np.isfinite(c))
