"""Probe: dense fused engine vs CULLED fused engine (walk inside the
fused bounce kernel) — full wavefront renders at scale.

VERDICT round-3 target: --engine fused --accel culled >= 1.8x over dense
fused at 32k spheres with tiled (frustum-coherent) ray order, and no
regression at the 512-sphere RTiOW scene.

  DRAY_SPHERES=32768 timeout 1700 python scripts/culled_fused_probe.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from distributed_raytracer_tpu.models.presets import (
    final_scene_camera,
    random_sphere_field,
    rtiow_final_scene,
)
from distributed_raytracer_tpu.ops.camera import make_camera
from distributed_raytracer_tpu.ops.pallas.culled_kernel import build_culled_scene
from distributed_raytracer_tpu.render.order import tile_permutation
from distributed_raytracer_tpu.render.wavefront import (
    render_wavefront_sum_fused,
)


def timed(fn, *a, iters=3, **kw):
    out = fn(*a, **kw)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*a, **kw)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters, out


def bench(name, scene, cam, spp, pool, **kw):
    render = jax.jit(
        lambda s, k: render_wavefront_sum_fused(
            s, cam, k, spp=spp, pool_size=pool, **kw
        )
    )
    t, out = timed(render, scene, jax.random.PRNGKey(0))
    rays = cam.num_pixels * spp
    nan = bool(jnp.isnan(out).any())
    print(f"{name}: {t*1e3:.1f} ms ({rays/t/1e6:.2f}M rays/s) nan={nan}",
          flush=True)
    return t


def main():
    n_spheres = int(os.environ.get("DRAY_SPHERES", "32768"))
    chunk = int(os.environ.get("DRAY_CHUNK", "128"))
    pool = int(os.environ.get("DRAY_POOL", "16384"))
    spp = int(os.environ.get("DRAY_SPP", "2"))
    resort = int(os.environ.get("DRAY_RESORT", "4"))
    br = int(os.environ.get("DRAY_BR", "512"))

    big = random_sphere_field(n_spheres, seed=3, extent=50.0)
    culled = build_culled_scene(big, chunk=chunk)
    cam = make_camera(aspect_ratio=16 / 9, image_width=512, vfov=55.0,
                      lookfrom=(0.0, 35.0, 90.0), lookat=(0.0, 0.0, 0.0),
                      max_depth=16)
    perm = jnp.asarray(tile_permutation(cam.image_width, cam.image_height))
    print(f"scene: {big.num_spheres} spheres, {len(culled.bounds_r2)} chunks, "
          f"pool {pool}, spp {spp}", flush=True)

    t_dense = bench("dense fused          ", culled.scene, cam, spp, pool)
    t_culled = bench("culled fused         ", culled.scene, cam, spp, pool,
                     culled=culled, block_rays=br)
    t_tiled = bench("culled fused tiled   ", culled.scene, cam, spp, pool,
                    culled=culled, pixel_perm=perm, block_rays=br)
    t_resort = bench("culled fused t+resort", culled.scene, cam, spp, pool,
                     culled=culled, pixel_perm=perm, resort_every=resort,
                     block_rays=br)
    best = min(t_culled, t_tiled, t_resort)
    print(f"speedup vs dense fused: {t_dense/best:.2f}x "
          f"(culled {t_dense/t_culled:.2f}, tiled {t_dense/t_tiled:.2f}, "
          f"resort {t_dense/t_resort:.2f})", flush=True)

    # no-regression check at RTiOW scale (512 spheres)
    small = rtiow_final_scene(seed=0, pad_to=512)
    sc = build_culled_scene(small, chunk=chunk)
    cam2 = final_scene_camera(image_width=400, spp=4)
    t_d2 = bench("512-sphere dense     ", sc.scene, cam2, 4, pool)
    t_c2 = bench("512-sphere culled    ", sc.scene, cam2, 4, pool, culled=sc)
    print(f"512-sphere ratio dense/culled: {t_d2/t_c2:.2f}x", flush=True)


if __name__ == "__main__":
    main()
