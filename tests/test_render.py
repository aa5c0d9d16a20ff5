"""End-to-end render tests: determinism, chunking-invariance, golden image vs
the independent f64 NumPy reference (np_reference.py)."""

import jax
import jax.numpy as jnp
import numpy as np

from distributed_raytracer_tpu.models.presets import config1, get_config
from distributed_raytracer_tpu.models.scene import SceneBuilder
from distributed_raytracer_tpu.ops.camera import make_camera
from distributed_raytracer_tpu.render.renderer import render_image, render_sample_batch

from np_reference import NPScene, camera_np, render as np_render


def small_setup():
    scene = (
        SceneBuilder()
        .add_lambertian((0, -100.5, -1), 100.0, (0.8, 0.8, 0.0))
        .add_lambertian((0, 0, -1.2), 0.5, (0.1, 0.2, 0.5))
        .add_metal((1, 0, -1), 0.5, (0.8, 0.6, 0.2), 0.2)
        .add_dielectric((-1, 0, -1), 0.5, 1.5)
        .build()
    )
    cam = make_camera(aspect_ratio=2.0, image_width=64, samples_per_pixel=8, max_depth=8)
    return scene, cam


def test_deterministic():
    scene, cam = small_setup()
    a = render_image(scene, cam, seed=3, spp=4)
    b = render_image(scene, cam, seed=3, spp=4)
    np.testing.assert_array_equal(a, b)


def test_seed_changes_noise():
    scene, cam = small_setup()
    a = render_image(scene, cam, seed=3, spp=2)
    b = render_image(scene, cam, seed=4, spp=2)
    assert not np.array_equal(a, b)


def test_batch_chunking_invariant():
    # sample keys depend only on (seed, sample index) -> chunking must not
    # change the result (the resumability property)
    scene, cam = small_setup()
    a = render_image(scene, cam, seed=0, spp=8, batch=8)
    b = render_image(scene, cam, seed=0, spp=8, batch=3)
    np.testing.assert_allclose(a, b, atol=1e-6)


def test_sample_batch_sums_split():
    scene, cam = small_setup()
    key = jax.random.PRNGKey(0)
    full = render_sample_batch(scene, cam, key, jnp.arange(6, dtype=jnp.int32))
    p1 = render_sample_batch(scene, cam, key, jnp.arange(0, 3, dtype=jnp.int32))
    p2 = render_sample_batch(scene, cam, key, jnp.arange(3, 6, dtype=jnp.int32))
    np.testing.assert_allclose(np.asarray(full), np.asarray(p1 + p2), atol=1e-5)


def test_tile_size_does_not_change_shape():
    scene, cam = small_setup()
    img = render_image(scene, cam, seed=0, spp=1, tile_size=500)  # non-divisor tile
    assert img.shape == (32, 64, 3)
    assert np.all(np.isfinite(img))


def test_golden_vs_numpy_reference():
    """Statistical golden test: JAX f32 render vs independent NumPy f64
    renderer with a different RNG stream, compared at the MC-noise level."""
    scene, _ = small_setup()
    cam = make_camera(aspect_ratio=2.0, image_width=48, samples_per_pixel=64, max_depth=8)
    img = render_image(scene, cam, seed=0, spp=64)

    ref = np_render(NPScene.from_scene(scene), camera_np(cam), spp=64, max_depth=8, seed=99)

    diff = np.abs(img - ref)
    # per-pixel MC noise at 64 spp is ~0.05-0.1; mean error must be well below
    assert diff.mean() < 0.02, f"mean abs diff {diff.mean():.4f}"
    assert np.quantile(diff, 0.99) < 0.12, f"p99 {np.quantile(diff, 0.99):.4f}"


def test_config1_renders():
    scene, cam = config1()
    img = render_image(scene, cam, seed=0, spp=2)
    assert img.shape == (225, 400, 3)
    # sky at top, sphere visible in middle
    assert img[0, 200, 2] > 0.9  # blue sky
    assert img[110, 200, 2] < 0.6  # sphere blocks sky


def test_all_configs_construct():
    for name in ["config1", "config2", "config3"]:
        scene, cam = get_config(name)
        assert scene.num_spheres >= 2
        assert cam.image_width >= 400
