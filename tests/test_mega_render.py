"""Mega RENDER kernel (ops/pallas/mega_render_kernel.py): the whole
forward render — in-kernel camera ray generation + refill + fused bounce
+ dense color drain — as one Pallas program per image sample.

All RNG is the (rid, depth)-keyed integer hash (plain vector arithmetic),
so interpret-mode tests see REAL noise and can check the kernel BIT-
EXACTLY against a dense host oracle: generate_rays with the same hash
draws + the shared shading body per bounce (the culled-fused test's
oracle, test_culled_fused._oracle_bounce).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental.pallas import tpu as pltpu

from test_culled_fused import _oracle_bounce

from distributed_raytracer_tpu.models.presets import get_config, make_camera
from distributed_raytracer_tpu.ops.camera import generate_rays
from distributed_raytracer_tpu.ops.pallas.culled_bounce_kernel import _hash_u01
from distributed_raytracer_tpu.ops.pallas.mega_render_kernel import (
    _CAM_D0,
    mega_render_budget,
    mega_render_colors,
    render_wavefront_sum_mega,
)


def _small_camera(width=32, depth=8, defocus=2.0):
    # defocus > 0 exercises the in-kernel disk-sample path
    return make_camera(
        aspect_ratio=16.0 / 9.0, image_width=width, samples_per_pixel=1,
        max_depth=depth, vfov=20.0, lookfrom=(13.0, 2.0, 3.0),
        lookat=(0.0, 0.0, 0.0), vup=(0.0, 1.0, 0.0),
        defocus_angle=defocus, focus_dist=10.0,
    )


def _oracle_sample(scene, camera, sample, bounce_seed, cam_seed):
    """Dense fixed-depth host trace with the kernel's exact draw keying:
    camera draws (cam_seed, rid, 8..11); bounce draws
    (bounce_seed + depth*65537, rid, 0..4)."""
    n_pix = camera.num_pixels
    w = camera.image_width
    pix = jnp.arange(n_pix, dtype=jnp.int32)
    rid = sample * n_pix + pix
    cam_draws = tuple(_hash_u01(rid, cam_seed, _CAM_D0 + dd) for dd in range(4))
    o, d = generate_rays(camera, jax.random.PRNGKey(0), pix % w, pix // w,
                         draws=cam_draws)
    atten = jnp.ones((n_pix, 3), jnp.float32)
    color = jnp.zeros((n_pix, 3), jnp.float32)
    act = jnp.ones((n_pix,), bool)
    for depth in range(camera.max_depth):
        seed = bounce_seed + jnp.int32(depth) * jnp.int32(65537)
        vals, _idx, _hit = _oracle_bounce(scene, o, d, act, rid, seed)
        (nox, noy, noz, ndx, ndy, ndz, atr, atg, atb,
         cor, cog, cob, fin, _i, _rx, _ry, _rz, _u) = vals
        fin_b = (fin[0] > 0) & act
        contrib = atten * jnp.stack([cor[0], cog[0], cob[0]], axis=-1)
        color = jnp.where(fin_b[:, None], contrib, color)
        o = jnp.stack([nox[0], noy[0], noz[0]], axis=-1)
        d = jnp.stack([ndx[0], ndy[0], ndz[0]], axis=-1)
        atten = atten * jnp.stack([atr[0], atg[0], atb[0]], axis=-1)
        act = act & ~fin_b
    # rays still active after max_depth bounces contribute black
    return color


@pytest.fixture(scope="module")
def setup():
    scene, _ = get_config("config2")
    camera = _small_camera()
    return scene, camera


def test_matches_host_oracle(setup):
    """NOT bit-exact by design limit: the camera math runs in two
    different XLA compilation contexts (kernel interpreter vs host
    generate_rays) and this toolchain allows FMA/excess-precision
    contraction, so primary rays differ by <= 1 ulp (measured 6e-8 at
    depth 1), which bounce recursion amplifies to ~5e-5 by depth 8.  The
    draw streams and semantics are identical — asserted tightly here;
    pool/block/budget invariance below IS bit-exact."""
    scene, camera = setup
    s, bs, cs = jnp.int32(3), jnp.int32(123456), jnp.int32(987654)
    with pltpu.force_tpu_interpret_mode():
        got = mega_render_colors(scene, camera, s, bs, cs, pool=128,
                                 block_rays=128)
    want = _oracle_sample(scene, camera, s, bs, cs)
    d = np.abs(np.asarray(got) - np.asarray(want))
    assert d.max() < 5e-4, d.max()
    assert d.mean() < 5e-6, d.mean()


def test_matches_host_oracle_depth1(setup):
    """At depth 1 (no recursion to amplify the 1-ulp camera difference)
    the kernel matches the host oracle to float-epsilon."""
    scene, _ = setup
    camera = _small_camera(width=32, depth=1)
    s, bs, cs = jnp.int32(3), jnp.int32(123456), jnp.int32(987654)
    with pltpu.force_tpu_interpret_mode():
        got = mega_render_colors(scene, camera, s, bs, cs, pool=128,
                                 block_rays=128)
    want = _oracle_sample(scene, camera, s, bs, cs)
    d = np.abs(np.asarray(got) - np.asarray(want))
    assert d.max() < 1e-6, d.max()


def test_pool_block_budget_invariant(setup):
    """(rid, depth)-keyed draws make pool size, block_rays, and the tight-
    budget fallback pure performance knobs — images bit-identical."""
    scene, camera = setup
    s, bs, cs = jnp.int32(0), jnp.int32(42), jnp.int32(77)
    with pltpu.force_tpu_interpret_mode():
        base = mega_render_colors(scene, camera, s, bs, cs, pool=128,
                                  block_rays=128)
        other_pool = mega_render_colors(scene, camera, s, bs, cs, pool=256,
                                        block_rays=128)
        other_block = mega_render_colors(scene, camera, s, bs, cs, pool=256,
                                         block_rays=256)
    np.testing.assert_array_equal(np.asarray(base), np.asarray(other_pool))
    np.testing.assert_array_equal(np.asarray(base), np.asarray(other_block))


def test_truncation_fallback(setup):
    """A budget too tight to finish trips the clean flag and the lax.cond
    fallback re-renders with the worst case — bit-identical output."""
    scene, camera = setup
    s, bs, cs = jnp.int32(1), jnp.int32(5), jnp.int32(6)
    worst = mega_render_budget(camera.num_pixels, camera.max_depth, 128)
    with pltpu.force_tpu_interpret_mode():
        full = mega_render_colors(scene, camera, s, bs, cs, pool=128,
                                  block_rays=128)
        tight = mega_render_colors(scene, camera, s, bs, cs, pool=128,
                                   block_rays=128, budget=2)
        ok = mega_render_colors(scene, camera, s, bs, cs, pool=128,
                                block_rays=128, budget=worst - 8)
    assert 2 < worst - 8 < worst
    np.testing.assert_array_equal(np.asarray(full), np.asarray(tight))
    np.testing.assert_array_equal(np.asarray(full), np.asarray(ok))


def test_estimator_matches_threefry_renderer(setup):
    """Different noise stream, same integral: the spp-summed mega image
    agrees with the threefry wavefront renderer within MC error."""
    from distributed_raytracer_tpu.render.wavefront import render_wavefront_sum

    scene, _ = setup
    camera = _small_camera(width=16, depth=6, defocus=0.0)
    spp = 96
    with pltpu.force_tpu_interpret_mode():
        got = render_wavefront_sum_mega(
            scene, camera, jax.random.PRNGKey(9), spp, pool_size=128,
            block_rays=128,
        )
    want = render_wavefront_sum(scene, camera, jax.random.PRNGKey(5), spp,
                                pool_size=256)
    g = np.asarray(got) / spp
    w_ = np.asarray(want) / spp
    assert np.abs(g - w_).mean() < 0.03, np.abs(g - w_).mean()
    assert np.abs(g.mean(0) - w_.mean(0)).max() < 0.02
