"""Fused bounce kernel (ops/pallas/bounce_kernel.py).

Interpret-mode caveat: pltpu.prng_random_bits returns ZEROS under the CPU
interpreter, so RNG-dependent behavior (scatter direction distributions,
Schlick choice) can only be validated on real TPU — done by
scripts/tpu_validation.py-style runs (statistical parity vs the threefry
wavefront, recorded in commit messages).  These tests cover everything
deterministic: miss/sky, absorb, winner selection, pool bookkeeping.
"""

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental.pallas import tpu as pltpu

from distributed_raytracer_tpu.models.scene import SceneBuilder
from distributed_raytracer_tpu.ops.camera import make_camera
from distributed_raytracer_tpu.ops.pallas.bounce_kernel import fused_bounce
from distributed_raytracer_tpu.ops.trace import sky_color
from distributed_raytracer_tpu.render.wavefront import render_wavefront_sum_fused


def test_miss_gives_sky_and_finished():
    scene = SceneBuilder().add_lambertian((0, 0, 1000.0), 1.0, (0.5, 0.5, 0.5)).build()
    n = 256
    o = jnp.zeros((n, 3), jnp.float32)
    d = jnp.tile(jnp.asarray([[0.0, 0.3, -1.0]], jnp.float32), (n, 1))
    with pltpu.force_tpu_interpret_mode():
        out = fused_bounce(o, d, jnp.ones((n,), bool), scene, jnp.int32(1))
    assert np.all(np.asarray(out.finished) == 1)
    np.testing.assert_allclose(
        np.asarray(out.color), np.asarray(sky_color(d)), rtol=1e-5
    )


def test_absorb_black_and_finished():
    scene = SceneBuilder().add_absorbing((0, 0, -2), 1.0).build()
    n = 128
    o = jnp.zeros((n, 3), jnp.float32)
    d = jnp.tile(jnp.asarray([[0.0, 0.0, -1.0]], jnp.float32), (n, 1))
    with pltpu.force_tpu_interpret_mode():
        out = fused_bounce(o, d, jnp.ones((n,), bool), scene, jnp.int32(2))
    assert np.all(np.asarray(out.finished) == 1)
    np.testing.assert_array_equal(np.asarray(out.color), 0.0)


def test_winner_selection_closest_of_chunked_scene():
    # two spheres in different chunks: transparent in front, absorbing behind;
    # transparent passthrough (deterministic) proves the closer sphere's
    # attributes won the cross-chunk selection
    b = SceneBuilder()
    b.add_transparent((0, 0, -2), 0.5)
    for i in range(140):  # push the absorber into chunk 2
        b.add_absorbing((1000 + i, 0, 0), 0.1)
    b.add_absorbing((0, 0, -10), 0.5)
    scene = b.build()
    n = 128
    o = jnp.zeros((n, 3), jnp.float32)
    d = jnp.tile(jnp.asarray([[0.0, 0.0, -1.0]], jnp.float32), (n, 1))
    with pltpu.force_tpu_interpret_mode():
        out = fused_bounce(o, d, jnp.ones((n,), bool), scene, jnp.int32(3))
    # transparent: continues with unchanged direction and ORIGINAL origin
    assert np.all(np.asarray(out.finished) == 0)
    np.testing.assert_allclose(np.asarray(out.new_d), np.asarray(d), atol=1e-6)
    np.testing.assert_allclose(np.asarray(out.new_o), np.asarray(o), atol=1e-6)
    np.testing.assert_allclose(np.asarray(out.atten), 1.0)


def test_inactive_lanes_untouched():
    scene = SceneBuilder().add_lambertian((0, 0, -2), 1.0, (0.5, 0.5, 0.5)).build()
    n = 128
    o = jnp.zeros((n, 3), jnp.float32)
    d = jnp.tile(jnp.asarray([[0.0, 0.0, -1.0]], jnp.float32), (n, 1))
    act = jnp.zeros((n,), bool)
    with pltpu.force_tpu_interpret_mode():
        out = fused_bounce(o, d, act, scene, jnp.int32(4))
    assert np.all(np.asarray(out.finished) == 0)
    np.testing.assert_array_equal(np.asarray(out.new_o), np.asarray(o))
    np.testing.assert_array_equal(np.asarray(out.new_d), np.asarray(d))


def test_pos_drain_matches_planar_fallback():
    # the pos-gather drain and the planar-scatter fallback must produce
    # IDENTICAL sums (same bounces, same draws — only the color routing
    # differs)
    scene = (
        SceneBuilder()
        .add_lambertian((0, -100.5, -1), 100.0, (0.6, 0.7, 0.2))
        .add_lambertian((0, 0, -1.5), 0.5, (0.7, 0.3, 0.3))
        .build()
    )
    cam = make_camera(aspect_ratio=2.0, image_width=32, samples_per_pixel=2, max_depth=4)
    with pltpu.force_tpu_interpret_mode():
        a = np.asarray(
            jax.jit(
                lambda s, k: render_wavefront_sum_fused(s, cam, k, 2, 512, pos_drain=True)
            )(scene, jax.random.PRNGKey(0))
        )
        b = np.asarray(
            jax.jit(
                lambda s, k: render_wavefront_sum_fused(s, cam, k, 2, 512, pos_drain=False)
            )(scene, jax.random.PRNGKey(0))
        )
    np.testing.assert_array_equal(a, b)


def test_pool_sky_only_render_exact():
    # all-sky scene: deterministic colors regardless of PRNG -> the pool's
    # refill/drain bookkeeping is exactly checkable in interpret mode
    scene = SceneBuilder().add_absorbing((0, 0, 1000.0), 1.0).build()
    cam = make_camera(aspect_ratio=2.0, image_width=32, samples_per_pixel=2, max_depth=3)
    with pltpu.force_tpu_interpret_mode():
        got = np.asarray(
            jax.jit(
                lambda s, k: render_wavefront_sum_fused(s, cam, k, 2, 512)
            )(scene, jax.random.PRNGKey(0))
        )
    assert got.shape == (cam.num_pixels, 3)
    assert np.all(np.isfinite(got))
    # 2 samples of sky each: sum within jitter bounds of 2*sky
    assert got[:, 2].min() > 1.2  # blue channel of 2 sky samples


def test_auto_chunk_selection():
    from distributed_raytracer_tpu.ops.pallas.bounce_kernel import _auto_chunk

    assert _auto_chunk(4) == 128      # tiny scene: one lane-padded chunk
    assert _auto_chunk(128) == 128
    assert _auto_chunk(480) == 512    # flagship: whole scene in one cell
    assert _auto_chunk(512) == 512
    assert _auto_chunk(8320) == 512   # big scenes cap at 512


def test_chunk_sizes_agree():
    """Winner selection is chunk-partition invariant: the first-min rule
    gives identical (t, idx, shading) whether the sweep runs as 4x128 or
    1x512 chunks."""
    rng = np.random.default_rng(5)
    sb = SceneBuilder()
    for _ in range(200):
        sb.add_lambertian(rng.uniform(-4, 4, 3), rng.uniform(0.1, 0.6),
                          rng.uniform(0.1, 0.9, 3))
    scene = sb.build()
    n = 256
    key = jax.random.PRNGKey(0)
    o = jax.random.normal(key, (n, 3)) * 3.0
    d = jax.random.normal(jax.random.fold_in(key, 1), (n, 3))
    live = jnp.ones((n,), bool)
    with pltpu.force_tpu_interpret_mode():
        a = fused_bounce(o, d, live, scene, jnp.int32(3), chunk=128)
        b = fused_bounce(o, d, live, scene, jnp.int32(3), chunk=512)
    np.testing.assert_array_equal(np.asarray(a.idx), np.asarray(b.idx))
    np.testing.assert_array_equal(np.asarray(a.hit), np.asarray(b.hit))
    np.testing.assert_array_equal(np.asarray(a.new_o), np.asarray(b.new_o))
    np.testing.assert_array_equal(np.asarray(a.atten), np.asarray(b.atten))
