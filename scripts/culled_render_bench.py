"""End-to-end render benchmark: dense sweep vs walk-culled intersect with
tiled ray ordering, on the 8k-sphere field with a covering camera."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import numpy as np

from distributed_raytracer_tpu.models.presets import random_sphere_field
from distributed_raytracer_tpu.ops.camera import make_camera
from distributed_raytracer_tpu.ops.pallas.culled_kernel import (
    build_culled_scene,
    make_culled_intersect,
)
from distributed_raytracer_tpu.render.wavefront import render_image_wavefront

n_spheres = int(os.environ.get("DRAY_SPHERES", "8192"))
big = random_sphere_field(n_spheres, seed=3)
culled = build_culled_scene(big, chunk=256)
cam = make_camera(aspect_ratio=16 / 9, image_width=1024, samples_per_pixel=8,
                  vfov=55.0, lookfrom=(0.0, 35.0, 90.0), lookat=(0.0, 0.0, 0.0),
                  max_depth=8)
print(f"{n_spheres} spheres, {cam.image_width}x{cam.image_height} @ 8spp depth 8",
      flush=True)

runs = {}
for name, kw in (
    ("dense+row", dict(use_pallas=True)),
    ("culled-walk+tiled", dict(
        intersect_fn=make_culled_intersect(culled, mode="walk"),
        ray_order="tiled",
    )),
):
    scene = culled.scene  # same (reordered) scene for both: identical images
    t0 = time.time()
    img = render_image_wavefront(scene, cam, seed=0, spp=8, batch=8,
                                 pool_size=131072, **kw)
    warm = time.time() - t0
    t0 = time.time()
    img = render_image_wavefront(scene, cam, seed=0, spp=8, batch=8,
                                 pool_size=131072, **kw)
    dt = time.time() - t0
    rays = cam.num_pixels * 8
    runs[name] = (dt, img)
    print(f"{name}: {dt*1e3:.0f} ms ({rays/dt/1e6:.2f} M rays/s; first {warm:.0f}s)",
          flush=True)

d = np.abs(runs["dense+row"][1] - runs["culled-walk+tiled"][1]).mean()
print(f"mean image diff {d:.4f} (noise-level expected: different ray orders)",
      flush=True)
print(f"SPEEDUP {runs['dense+row'][0]/runs['culled-walk+tiled'][0]:.2f}x", flush=True)
