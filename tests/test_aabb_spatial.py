"""AABB (correct slab test — the reference's is buggy) and spatial sharding."""

import jax
import jax.numpy as jnp
import numpy as np

from distributed_raytracer_tpu.core.interval import EMPTY, Interval, UNIVERSE
from distributed_raytracer_tpu.core.ray import Ray
from distributed_raytracer_tpu.models.aabb import AABB, grid_cells, hit_interval, intersect_sphere
from distributed_raytracer_tpu.models.presets import rtiow_final_scene
from distributed_raytracer_tpu.models.scene import SceneBuilder
from distributed_raytracer_tpu.ops.intersect import closest_hit
from distributed_raytracer_tpu.parallel.spatial import shard_scene_spatial


def unit_box():
    return AABB(lo=jnp.asarray([-1.0, -1.0, -1.0]), hi=jnp.asarray([1.0, 1.0, 1.0]))


def test_slab_hit_straight_through():
    box = unit_box()
    o = jnp.asarray([[0.0, 0.0, -5.0]])
    d = jnp.asarray([[0.0, 0.0, 1.0]])
    hit, t_in, t_out = hit_interval(box, o, d)
    assert bool(hit[0])
    np.testing.assert_allclose(float(t_in[0]), 4.0, rtol=1e-5)
    np.testing.assert_allclose(float(t_out[0]), 6.0, rtol=1e-5)


def test_slab_tests_z_axis():
    # the reference's bug: z-axis never tested (bounding_box.rs:53) would
    # accept this ray; the correct test rejects it
    box = unit_box()
    o = jnp.asarray([[0.0, 0.0, -5.0]])
    d = jnp.asarray([[0.0, 0.0, -1.0]])  # pointing AWAY along z
    hit, _, _ = hit_interval(box, o, d)
    assert not bool(hit[0])


def test_slab_diagonal_and_miss():
    box = unit_box()
    o = jnp.asarray([[-3.0, -3.0, -3.0], [5.0, 0.0, -5.0]])
    d = jnp.asarray([[1.0, 1.0, 1.0], [0.0, 0.0, 1.0]])
    hit, _, _ = hit_interval(box, o, d)
    assert bool(hit[0]) and not bool(hit[1])


def test_intersect_sphere():
    box = unit_box()
    assert bool(intersect_sphere(box, jnp.asarray([0.0, 0.0, 0.0]), 0.5))
    assert bool(intersect_sphere(box, jnp.asarray([1.5, 0.0, 0.0]), 0.6))  # overlap
    assert not bool(intersect_sphere(box, jnp.asarray([3.0, 0.0, 0.0]), 0.5))


def test_grid_cells_cover_plane():
    cells = grid_cells()
    assert cells.lo.shape == (36, 3)
    # any x/z point is covered by at least one cell (edge extension)
    rng = np.random.default_rng(0)
    pts = rng.uniform(-50, 50, (100, 3)).astype(np.float32)
    inside = (
        (pts[:, None, :] >= np.asarray(cells.lo)[None]).all(-1)
        & (pts[:, None, :] <= np.asarray(cells.hi)[None]).all(-1)
    )
    assert inside.any(axis=1).all()


def test_spatial_sharding_preserves_closest_hit():
    scene = rtiow_final_scene(seed=0)
    spatial = shard_scene_spatial(scene, n_shards=4)
    assert spatial.num_spheres % 4 == 0
    rng = np.random.default_rng(1)
    o = jnp.asarray(rng.uniform(-10, 10, (256, 3)), jnp.float32)
    d = jnp.asarray(rng.normal(size=(256, 3)), jnp.float32)
    a = closest_hit(o, d, scene)
    b = closest_hit(o, d, spatial)  # duplicated spheres, different indices
    np.testing.assert_array_equal(np.asarray(a.hit), np.asarray(b.hit))
    h = np.asarray(a.hit)
    np.testing.assert_allclose(
        np.asarray(b.t)[h], np.asarray(a.t)[h], rtol=1e-5
    )
    # winning spheres are the same physical spheres (match by center)
    ca = np.asarray(scene.centers)[np.asarray(a.idx)[h]]
    cb = np.asarray(spatial.centers)[np.asarray(b.idx)[h]]
    np.testing.assert_allclose(ca, cb, atol=1e-6)


def test_spatial_shards_are_compact():
    scene = rtiow_final_scene(seed=0)
    spatial = shard_scene_spatial(scene, n_shards=4)
    ss = spatial.num_spheres // 4
    for k in range(4):
        c = np.asarray(spatial.centers[k * ss : (k + 1) * ss])
        r = np.asarray(spatial.radii[k * ss : (k + 1) * ss])
        real = r > 0
        # exclude the huge ground sphere from the extent check
        small = real & (r < 10)
        if small.sum() < 2:
            continue
        ext = c[small].max(0) - c[small].min(0)
        # full scene spans ~22 in x/z; each shard's small spheres must not
        # span the whole scene in BOTH axes (cells are x/z stripes)
        assert not (ext[0] > 20 and ext[2] > 20), ext


# --- core parity types ---


def test_ray_at():
    r = Ray(jnp.asarray([[1.0, 2.0, 3.0]]), jnp.asarray([[0.0, 1.0, 0.0]]))
    np.testing.assert_allclose(np.asarray(r.at(jnp.asarray([2.0])))[0], [1, 4, 3])


def test_interval_semantics():
    iv = Interval(jnp.float32(1.0), jnp.float32(3.0))
    assert float(iv.size()) == 2.0
    assert bool(iv.contains(1.0)) and bool(iv.contains(3.0))
    assert not bool(iv.surrounds(1.0)) and bool(iv.surrounds(2.0))  # strict
    assert float(iv.clamp(5.0)) == 3.0 and float(iv.clamp(0.0)) == 1.0
    assert not bool(EMPTY.contains(0.0))
    assert bool(UNIVERSE.contains(1e30))
