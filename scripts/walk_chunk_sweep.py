"""Walk-engine CHUNK-SIZE sweep at 32k spheres (VERDICT r4 item 2 probe):
finer chunks give the occlusion flag test finer culling granularity —
the decomposition (DESIGN §16) says selectivity, not glue, binds, so
chunk is the one untried cheap knob on the mega walk.

    DRAY_SPHERES=32768 timeout 2400 python -u scripts/walk_chunk_sweep.py
"""
import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
import jax.numpy as jnp

from distributed_raytracer_tpu.models.presets import random_sphere_field
from distributed_raytracer_tpu.ops.camera import make_camera
from distributed_raytracer_tpu.ops.pallas.culled_kernel import build_culled_scene
from distributed_raytracer_tpu.ops.pallas.mega_walk_kernel import (
    build_walk_pack, render_wavefront_sum_mega_walk)
from distributed_raytracer_tpu.utils.metrics import timed_best
import numpy as np

n_spheres = int(os.environ.get("DRAY_SPHERES", "32768"))
spp = int(os.environ.get("DRAY_SPP", "8"))
big = random_sphere_field(n_spheres, seed=3)
cam = make_camera(aspect_ratio=16 / 9, image_width=1024, samples_per_pixel=spp,
                  vfov=55.0, lookfrom=(0.0, 35.0, 90.0), lookat=(0.0, 0.0, 0.0),
                  max_depth=8)
rays = cam.num_pixels * spp
key = jax.random.PRNGKey(0)
print(f"{n_spheres} spheres, {cam.image_width}x{cam.image_height} @ {spp}spp",
      flush=True)

for chunk in (128, 256, 512):
    pack = build_walk_pack(build_culled_scene(big, chunk=chunk),
                           np.asarray(cam.center))
    f = jax.jit(lambda k: render_wavefront_sum_mega_walk(
        pack, cam, k, spp, pool_size=2048, block_rays=512))
    t = timed_best(f, key, iters=2, reps=2)
    print(f"chunk {chunk:4d} ({pack.n_chunks:4d} chunks): {t*1e3:8.0f} ms "
          f"-> {rays/t/1e6:6.2f} M rays/s", flush=True)
