"""Mega WALK kernel (ops/pallas/mega_walk_kernel.py): the whole-render
mega program with the in-kernel front-to-back chunk walk — the flagship
engine past one VMEM sweep chunk.

The anchor is BIT-IDENTITY against the dense mega render kernel at equal
scene content: both engines key every draw by GLOBAL (rid, depth) hash
and binary min over sphere t's is order-independent, so reordering the
spheres into Morton chunks and walking them with occlusion culling must
not change a single bit of the image (ties between distinct spheres
aside — the random test scene has none).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental.pallas import tpu as pltpu

from distributed_raytracer_tpu.models.presets import make_camera, rtiow_final_scene
from distributed_raytracer_tpu.ops.pallas.culled_kernel import build_culled_scene
from distributed_raytracer_tpu.ops.pallas.mega_render_kernel import (
    mega_render_budget,
    mega_render_colors,
    render_wavefront_sum_mega,
)
from distributed_raytracer_tpu.ops.pallas.mega_walk_kernel import (
    build_walk_pack,
    mega_walk_colors,
    render_wavefront_sum_mega_walk,
)


def _small_camera(width=32, depth=8, defocus=2.0):
    return make_camera(
        aspect_ratio=16.0 / 9.0, image_width=width, samples_per_pixel=1,
        max_depth=depth, vfov=20.0, lookfrom=(13.0, 2.0, 3.0),
        lookat=(0.0, 0.0, 0.0), vup=(0.0, 1.0, 0.0),
        defocus_angle=defocus, focus_dist=10.0,
    )


@pytest.fixture(scope="module")
def setup():
    # RTiOW final scene: ground sphere (r=1000 -> always-swept big chunk)
    # + ~480 random spheres -> 5 chunks at 128
    scene = rtiow_final_scene(seed=3, pad_to=512)
    camera = _small_camera()
    culled = build_culled_scene(scene, chunk=128)
    pack = build_walk_pack(culled, np.asarray(camera.center))
    return scene, camera, pack


def test_walk_matches_dense_mega_bit_exact(setup):
    """Same scene content, same (rid, depth)-keyed draws -> the walked
    multi-chunk render equals the dense single-chunk render bit-for-bit."""
    scene, camera, pack = setup
    s, bs, cs = jnp.int32(3), jnp.int32(123456), jnp.int32(987654)
    with pltpu.force_tpu_interpret_mode():
        dense = mega_render_colors(scene, camera, s, bs, cs, pool=128,
                                   block_rays=128)
        walk = mega_walk_colors(pack, camera, s, bs, cs, pool=128,
                                block_rays=128)
    np.testing.assert_array_equal(np.asarray(dense), np.asarray(walk))


def test_walk_pool_block_chunk_invariant(setup):
    """pool / block_rays / chunk size are pure performance knobs."""
    scene, camera, pack = setup
    culled64 = build_culled_scene(scene, chunk=256)
    pack256 = build_walk_pack(culled64, np.asarray(camera.center))
    s, bs, cs = jnp.int32(0), jnp.int32(42), jnp.int32(77)
    with pltpu.force_tpu_interpret_mode():
        base = mega_walk_colors(pack, camera, s, bs, cs, pool=128,
                                block_rays=128)
        other_pool = mega_walk_colors(pack, camera, s, bs, cs, pool=256,
                                      block_rays=128)
        other_chunk = mega_walk_colors(pack256, camera, s, bs, cs, pool=128,
                                       block_rays=128)
    np.testing.assert_array_equal(np.asarray(base), np.asarray(other_pool))
    np.testing.assert_array_equal(np.asarray(base), np.asarray(other_chunk))


def test_walk_truncation_fallback(setup):
    """A too-tight budget trips the clean flag; the lax.cond worst-case
    re-render is bit-identical."""
    scene, camera, pack = setup
    s, bs, cs = jnp.int32(1), jnp.int32(5), jnp.int32(6)
    worst = mega_render_budget(camera.num_pixels, camera.max_depth, 128)
    with pltpu.force_tpu_interpret_mode():
        full = mega_walk_colors(pack, camera, s, bs, cs, pool=128,
                                block_rays=128)
        tight = mega_walk_colors(pack, camera, s, bs, cs, pool=128,
                                 block_rays=128, budget=2)
    assert 2 < worst
    np.testing.assert_array_equal(np.asarray(full), np.asarray(tight))


def test_walk_multichunk_scene_matches_oracle(monkeypatch):
    """Past the dense kernel's 512-sphere cap: (a) the walk is BIT-EXACT
    against the dense mega kernel run with a DRAY_FORCE_CHUNK big enough
    to hold the whole scene (the dense kernel is itself oracle-validated,
    test_mega_render.py), and (b) statistically matches the scene-size-
    agnostic host oracle.  The per-pixel oracle bound is loose by design:
    at 601 spheres a 1-ulp camera-context difference (kernel interpreter
    vs host generate_rays, FMA contraction) flips edge hits at a handful
    of pixels — identical for dense and walk, so (a) is the rigorous
    check."""
    from test_mega_render import _oracle_sample

    from distributed_raytracer_tpu.models.presets import random_sphere_field

    scene = random_sphere_field(600, seed=7, extent=12.0)  # 601 > 512
    camera = make_camera(
        aspect_ratio=16.0 / 9.0, image_width=24, samples_per_pixel=1,
        max_depth=6, vfov=40.0, lookfrom=(0.0, 6.0, 25.0),
        lookat=(0.0, 0.0, 0.0), vup=(0.0, 1.0, 0.0),
        defocus_angle=0.0, focus_dist=10.0,
    )
    culled = build_culled_scene(scene, chunk=128)
    pack = build_walk_pack(culled, np.asarray(camera.center))
    s, bs, cs = jnp.int32(2), jnp.int32(31337), jnp.int32(271828)
    monkeypatch.setenv("DRAY_FORCE_CHUNK", "768")
    with pltpu.force_tpu_interpret_mode():
        walk = mega_walk_colors(pack, camera, s, bs, cs, pool=128,
                                block_rays=128)
        dense = mega_render_colors(scene, camera, s, bs, cs, pool=128,
                                   block_rays=128)
    np.testing.assert_array_equal(np.asarray(walk), np.asarray(dense))
    want = _oracle_sample(scene, camera, s, bs, cs)
    d = np.abs(np.asarray(walk) - np.asarray(want))
    assert d.mean() < 5e-3, d.mean()
    assert (d.max(-1) > 1e-3).mean() < 0.05  # edge-flip pixels are rare


def test_progressive_mega_routes_multichunk_to_walk():
    """render_progressive(engine='mega') on a multi-chunk scene runs the
    walk engine (no fused fallback) and matches the walk sum directly."""
    from distributed_raytracer_tpu.models.presets import random_sphere_field
    from distributed_raytracer_tpu.ops.pallas.mega_walk_kernel import (
        walk_pack_for,
    )
    from distributed_raytracer_tpu.render.progressive import render_progressive

    scene = random_sphere_field(600, seed=7, extent=12.0)
    camera = make_camera(
        aspect_ratio=16.0 / 9.0, image_width=24, samples_per_pixel=2,
        max_depth=4, vfov=40.0, lookfrom=(0.0, 6.0, 25.0),
        lookat=(0.0, 0.0, 0.0), vup=(0.0, 1.0, 0.0),
        defocus_angle=0.0, focus_dist=10.0,
    )
    seed = 5
    with pltpu.force_tpu_interpret_mode():
        state = render_progressive(
            scene, camera, seed=seed, spp=2, batch=2, engine="mega",
            pool_size=128,
        )
        pack = walk_pack_for(scene, camera, chunk=256)
        from distributed_raytracer_tpu.ops.pallas.mega_render_kernel import (
            mega_render_budget_tight,
        )

        budget = mega_render_budget_tight(camera.num_pixels,
                                          camera.max_depth, 128)
        want = render_wavefront_sum_mega_walk(
            pack, camera, jax.random.fold_in(jax.random.PRNGKey(seed), 0),
            2, pool_size=128, budget=budget, block_rays=128,
        )
    np.testing.assert_array_equal(state.raw_sum, np.asarray(want))


def test_walk_spp_sum_matches_mega_engine(setup):
    """render_wavefront_sum_mega_walk derives seeds exactly like
    render_wavefront_sum_mega -> equal spp-summed images, bit-for-bit."""
    scene, camera, pack = setup
    key = jax.random.PRNGKey(11)
    with pltpu.force_tpu_interpret_mode():
        dense = render_wavefront_sum_mega(scene, camera, key, 2,
                                          pool_size=128, block_rays=128)
        walk = render_wavefront_sum_mega_walk(pack, camera, key, 2,
                                              pool_size=128, block_rays=128)
    np.testing.assert_array_equal(np.asarray(dense), np.asarray(walk))


def test_walk_tiled_permutation_bit_identical(setup):
    """Tiled lane->pixel permutation (pix_tab): draws key on the GLOBAL
    pixel, so the rendered image is bit-identical to the untiled walk —
    tiling is a pure culling-rate knob."""
    scene, camera, pack = setup
    key = jax.random.PRNGKey(11)
    with pltpu.force_tpu_interpret_mode():
        plain = render_wavefront_sum_mega_walk(pack, camera, key, 2,
                                               pool_size=128, block_rays=128)
        tiled = render_wavefront_sum_mega_walk(pack, camera, key, 2,
                                               pool_size=128, block_rays=128,
                                               tiled=True)
    np.testing.assert_array_equal(np.asarray(plain), np.asarray(tiled))
