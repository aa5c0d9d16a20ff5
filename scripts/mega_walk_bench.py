"""Whole-render benchmark at acceleration-structure scale: dense fused vs
culled-fused vs the mega WALK engine (VERDICT r3 items 2/6).

DRAY_SPHERES sets the field size (default 32768).  Every engine renders
the same (reordered) scene at 1024x576 @ 8 spp depth 8 with a covering
camera.  Each engine's jitted delta function is built ONCE and timed on
its 2nd/3rd calls (the 1st pays trace+compile) — timing through repeated
render_progressive calls would re-trace per call and hide the kernels.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import numpy as np

from distributed_raytracer_tpu.models.presets import random_sphere_field
from distributed_raytracer_tpu.ops.camera import make_camera
from distributed_raytracer_tpu.ops.pallas.culled_kernel import build_culled_scene
from distributed_raytracer_tpu.render.progressive import _wavefront_delta_fn

n_spheres = int(os.environ.get("DRAY_SPHERES", "32768"))
spp = int(os.environ.get("DRAY_SPP", "8"))
chunk = int(os.environ.get("DRAY_CHUNK", "256"))
big = random_sphere_field(n_spheres, seed=3)
culled = build_culled_scene(big, chunk=chunk)
scene = culled.scene
cam = make_camera(aspect_ratio=16 / 9, image_width=1024, samples_per_pixel=spp,
                  vfov=55.0, lookfrom=(0.0, 35.0, 90.0), lookat=(0.0, 0.0, 0.0),
                  max_depth=8)
rays = cam.num_pixels * spp
key = jax.random.PRNGKey(0)
print(f"{n_spheres} spheres, {cam.image_width}x{cam.image_height} @ {spp}spp "
      f"depth {cam.max_depth}; devices {jax.devices()}", flush=True)

runs = {}


def bench(name, delta):
    t0 = time.time()
    img = np.asarray(delta(key, spp))
    warm = time.time() - t0
    best = float("inf")
    for _ in range(2):
        t0 = time.time()
        img = np.asarray(delta(key, spp))
        best = min(best, time.time() - t0)
    runs[name] = (best, img)
    print(f"{name:30s} {best*1e3:7.0f} ms ({rays/best/1e6:6.2f} M rays/s; "
          f"first {warm:.0f}s)", flush=True)


bench("fused dense", _wavefront_delta_fn(
    scene, cam, "fused", 16384, False, None))
bench("fused culled+tiled+resort2", _wavefront_delta_fn(
    scene, cam, "fused", 16384, False, None, ray_order="tiled",
    resort_every=2, culled=culled))
import functools

from distributed_raytracer_tpu.ops.pallas.mega_render_kernel import (
    mega_render_budget_tight,
)
from distributed_raytracer_tpu.ops.pallas.mega_walk_kernel import (
    build_walk_pack,
    render_wavefront_sum_mega_walk,
)

pack = build_walk_pack(culled, np.asarray(cam.center))
budget = mega_render_budget_tight(cam.num_pixels, cam.max_depth, 2048)
for br, tiled in ((256, False), (512, False), (512, True), (256, True)):
    f = jax.jit(
        functools.partial(render_wavefront_sum_mega_walk, pack,
                          budget=budget, block_rays=br, tiled=tiled),
        static_argnames=("spp", "pool_size"),
    )
    tag = f"mega-walk br{br}" + ("+tiled" if tiled else "")
    bench(tag, lambda k, n, f=f: f(cam, k, spp=n, pool_size=2048))

base = runs["fused dense"][0]
for name, (dt, img) in runs.items():
    d = np.abs(img - runs["fused dense"][1]).mean() / spp
    print(f"{name:30s} speedup {base/dt:4.2f}x  mean-img-diff {d:.4f}",
          flush=True)
