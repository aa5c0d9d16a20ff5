"""Minimal probe: dense vs WALK culled kernel only (one fresh compile)."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from distributed_raytracer_tpu.models.presets import random_sphere_field
from distributed_raytracer_tpu.ops.camera import generate_rays, make_camera
from distributed_raytracer_tpu.ops.pallas.culled_kernel import (
    _culled_walk_fwd,
    build_culled_scene,
)
from distributed_raytracer_tpu.ops.pallas.intersect_kernel import closest_hit_pallas


def timed(fn, *a, iters=5):
    out = fn(*a)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*a)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


br = int(sys.argv[1]) if len(sys.argv) > 1 else 512
big = random_sphere_field(8192, seed=3)
culled = build_culled_scene(big, chunk=128)
print(f"scene: {big.num_spheres} spheres, {len(culled.bounds_r2)} chunks, br={br}",
      flush=True)
cam = make_camera(aspect_ratio=16 / 9, image_width=1024, vfov=55.0,
                  lookfrom=(0.0, 35.0, 90.0), lookat=(0.0, 0.0, 0.0))
R = 131072
ids = jnp.asarray(np.arange(R, dtype=np.int64) * cam.num_pixels // R, jnp.int32)
o, d = jax.block_until_ready(
    generate_rays(cam, jax.random.PRNGKey(0), ids % cam.image_width,
                  ids // cam.image_width)
)

f_dense = jax.jit(lambda o, d: closest_hit_pallas(o, d, culled.scene))
t_dense = timed(f_dense, o, d)
r1 = jax.block_until_ready(f_dense(o, d))
h = np.asarray(r1.hit)
print(f"dense: {t_dense*1e3:.2f} ms (hit rate {h.mean():.2f})", flush=True)

f_walk = jax.jit(
    lambda o, d: _culled_walk_fwd(
        o, d, culled.scene, culled.bounds_c, culled.bounds_r2, culled.chunk,
        block_rays=br,
    )
)
t0 = time.perf_counter()
tw, iw = jax.block_until_ready(f_walk(o, d))
print(f"walk compile+first: {time.perf_counter()-t0:.0f}s", flush=True)
t_walk = timed(f_walk, o, d)
okw = (np.asarray(iw)[h] == np.asarray(r1.idx)[h]).mean()
print(f"WALK br={br}: {t_walk*1e3:.2f} ms  speedup {t_dense/t_walk:.2f}x  idx={okw:.4f}",
      flush=True)
