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


def tile_order(w, h, tw, th, n):
    """Pixel ids grouped into tw x th tiles (frustum-coherent ray blocks),
    tiles sampled evenly over the WHOLE image."""
    tiles = [
        (ty, tx) for ty in range(0, h - th + 1, th) for tx in range(0, w - tw + 1, tw)
    ]
    need = n // (tw * th)
    pick = np.linspace(0, len(tiles) - 1, need).astype(int)
    ids = []
    for k in pick:
        ty, tx = tiles[k]
        for y in range(ty, ty + th):
            ids.extend(y * w + x for x in range(tx, tx + tw))
    return np.asarray(ids[:n], np.int64)


br = int(sys.argv[1]) if len(sys.argv) > 1 else 512
tw_, th_ = (int(sys.argv[2]), int(sys.argv[3])) if len(sys.argv) > 3 else (32, 16)
chunk_sz = int(os.environ.get("DRAY_CHUNK", "128"))
n_spheres = int(os.environ.get("DRAY_SPHERES", "8192"))
extent = float(os.environ.get("DRAY_EXTENT", "50"))
big = random_sphere_field(n_spheres, seed=3, extent=extent)
culled = build_culled_scene(big, chunk=chunk_sz)
print(f"scene: {big.num_spheres} spheres, {len(culled.bounds_r2)} chunks, br={br}",
      flush=True)
cam = make_camera(aspect_ratio=16 / 9, image_width=1024, vfov=55.0,
                  lookfrom=(0.0, 35.0, 90.0), lookat=(0.0, 0.0, 0.0))
R = 131072
W, H = cam.image_width, cam.image_height

for name, raw_ids in (
    ("strided", np.arange(R, dtype=np.int64) * cam.num_pixels // R),
    (f"tiled{tw_}x{th_}", tile_order(W, H, tw_, th_, R)),
):
    ids = jnp.asarray(raw_ids, jnp.int32)
    o, d = jax.block_until_ready(
        generate_rays(cam, jax.random.PRNGKey(0), ids % W, ids // W)
    )

    f_dense = jax.jit(lambda o, d: closest_hit_pallas(o, d, culled.scene))
    t_dense = timed(f_dense, o, d)
    r1 = jax.block_until_ready(f_dense(o, d))
    h = np.asarray(r1.hit)

    f_walk = jax.jit(
        lambda o, d: _culled_walk_fwd(
            o, d, culled.scene, culled.bounds_c, culled.bounds_r2, culled.chunk,
            block_rays=br,
        )
    )
    t_walk = timed(f_walk, o, d)
    tw_, iw = jax.block_until_ready(f_walk(o, d))
    okw = (np.asarray(iw)[h] == np.asarray(r1.idx)[h]).mean()

    # sweep fraction via the stats-enabled grid kernel (same ordering)
    from distributed_raytracer_tpu.ops.pallas.culled_kernel import _culled_fwd

    _, _, ns = jax.block_until_ready(
        jax.jit(
            lambda o, d: _culled_fwd(
                o, d, culled.scene, culled.bounds_c, culled.bounds_r2,
                culled.chunk, block_rays=br, stats=True,
            )
        )(o, d)
    )
    ns = np.asarray(ns)
    print(
        f"{name}: dense {t_dense*1e3:.2f} ms | WALK {t_walk*1e3:.2f} ms "
        f"speedup {t_dense/t_walk:.2f}x hit={h.mean():.2f} idx={okw:.4f} "
        f"swept {ns.mean():.1f}/{len(culled.bounds_r2)} (p95 {np.quantile(ns,0.95):.0f})",
        flush=True,
    )
