"""Whole-render benchmark at acceleration-structure scale: dense fused vs
culled-fused vs the mega WALK engine (VERDICT r3 items 2/6).

DRAY_SPHERES sets the field size (default 32768).  Every engine renders
the same (reordered) scene at 1024x576 @ 8 spp depth 8 with a covering
camera; throughput is whole-render (compile excluded via a warm-up run).
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
from distributed_raytracer_tpu.ops.pallas.mega_walk_kernel import (
    build_walk_pack,
    render_wavefront_sum_mega_walk,
)
from distributed_raytracer_tpu.render.progressive import render_progressive

n_spheres = int(os.environ.get("DRAY_SPHERES", "32768"))
spp = int(os.environ.get("DRAY_SPP", "8"))
big = random_sphere_field(n_spheres, seed=3)
culled = build_culled_scene(big, chunk=256)
scene = culled.scene
cam = make_camera(aspect_ratio=16 / 9, image_width=1024, samples_per_pixel=spp,
                  vfov=55.0, lookfrom=(0.0, 35.0, 90.0), lookat=(0.0, 0.0, 0.0),
                  max_depth=8)
rays = cam.num_pixels * spp
print(f"{n_spheres} spheres, {cam.image_width}x{cam.image_height} @ {spp}spp "
      f"depth {cam.max_depth}; devices {jax.devices()}", flush=True)

runs = {}


def bench(name, fn):
    t0 = time.time()
    img = np.asarray(fn())
    warm = time.time() - t0
    t0 = time.time()
    img = np.asarray(fn())
    dt = time.time() - t0
    runs[name] = (dt, img)
    print(f"{name:28s} {dt*1e3:7.0f} ms ({rays/dt/1e6:6.2f} M rays/s; "
          f"first {warm:.0f}s)", flush=True)


def prog(engine, **kw):
    def run():
        st = render_progressive(scene, cam, seed=0, spp=spp, batch=spp,
                                engine=engine, **kw)
        return st.raw_sum
    return run


bench("fused dense", prog("fused", pool_size=16384))
bench("fused culled+tiled+resort2", prog("fused", pool_size=16384,
                                         culled=culled, ray_order="tiled",
                                         resort_every=2))

pack = build_walk_pack(culled, np.asarray(cam.center))
from distributed_raytracer_tpu.ops.pallas.mega_render_kernel import (
    mega_render_budget_tight,
)

budget = mega_render_budget_tight(cam.num_pixels, cam.max_depth, 2048)
for br in (256, 512, 1024):
    key = jax.random.PRNGKey(0)
    bench(f"mega-walk br{br}", lambda br=br: render_wavefront_sum_mega_walk(
        pack, cam, key, spp, pool_size=2048, budget=budget, block_rays=br))

base = runs["fused dense"][0]
for name, (dt, img) in runs.items():
    d = np.abs(img - runs["fused dense"][1]).mean() / spp
    print(f"{name:28s} speedup {base/dt:4.2f}x  mean-img-diff {d:.4f}",
          flush=True)
