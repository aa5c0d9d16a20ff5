"""Probe: wavefront lane re-sort x block-culled kernels on a big scene.

The walk/grid culled kernels only skip work when the rays in a 512-lane
block are coherent; primary rays enter coherent (tiled stream) but
scattering destroys that within a few bounces.  This probe measures a FULL
wavefront render (primary + secondary rays) of a large sphere field with:

    python scripts/resort_probe.py dense            # dense Pallas sweep
    python scripts/resort_probe.py grid  [RESORT_K] # 2D-grid culled
    python scripts/resort_probe.py walk  [RESORT_K] # in-kernel walk culled

RESORT_K = lane re-sort period (0/absent = off).  One config per process:
the remote compile service caches by HLO hash and two TPU processes
serialize on the chip.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from distributed_raytracer_tpu.models.presets import random_sphere_field
from distributed_raytracer_tpu.ops.camera import make_camera
from distributed_raytracer_tpu.ops.pallas.culled_kernel import (
    build_culled_scene,
    make_culled_intersect,
)
from distributed_raytracer_tpu.ops.pallas.intersect_kernel import closest_hit_pallas
from distributed_raytracer_tpu.render.order import tile_permutation
from distributed_raytracer_tpu.render.wavefront import render_wavefront_sum

mode = sys.argv[1] if len(sys.argv) > 1 else "dense"
resort_k = int(sys.argv[2]) if len(sys.argv) > 2 else 0
n_spheres = int(os.environ.get("DRAY_SPHERES", "32768"))
extent = float(os.environ.get("DRAY_EXTENT", "80"))
chunk_sz = int(os.environ.get("DRAY_CHUNK", "128"))
spp = int(os.environ.get("DRAY_SPP", "2"))
depth = int(os.environ.get("DRAY_DEPTH", "16"))

field = random_sphere_field(n_spheres, seed=3, extent=extent)
culled = build_culled_scene(field, chunk=chunk_sz)
scene = culled.scene  # same sphere order for every mode
cam = make_camera(
    aspect_ratio=1.0, image_width=512, vfov=55.0,
    lookfrom=(0.0, extent * 0.7, extent * 1.8), lookat=(0.0, 0.0, 0.0),
    max_depth=depth,
)
perm = jnp.asarray(tile_permutation(cam.image_width, cam.image_height))

if mode == "dense":
    ifn = closest_hit_pallas
else:
    ifn = make_culled_intersect(culled, block_rays=512, mode=mode)

fn = jax.jit(
    lambda key: render_wavefront_sum(
        scene, cam, key, spp, pool_size=131072, intersect_fn=ifn,
        pixel_perm=perm, resort_every=resort_k,
    )
)

key = jax.random.PRNGKey(0)
t0 = time.perf_counter()
out = jax.block_until_ready(fn(key))
compile_s = time.perf_counter() - t0
iters = 3
t0 = time.perf_counter()
for _ in range(iters):
    out = jax.block_until_ready(fn(key))
dt = (time.perf_counter() - t0) / iters
total = cam.num_pixels * spp
print(
    f"RESULT mode={mode} resort={resort_k} spheres={n_spheres} chunk={chunk_sz} "
    f"spp={spp} depth={depth} ms={dt*1e3:.2f} rays_s={total/dt:,.0f} "
    f"compile_s={compile_s:.0f} mean={float(jnp.mean(out))/spp:.5f}",
    flush=True,
)
