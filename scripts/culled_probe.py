"""Culled-kernel probe: dense vs front-to-back culled sweep with a camera
that actually COVERS the sphere field, plus per-block sweep statistics.

The round-1/2 validation aimed the narrow RTiOW camera (vfov 20, looking
at the origin) at a 100x100 field and shot the top image rows — mostly
misses, so t_best stayed at BIG, the occlusion term never engaged, and
culling measured ~1x by construction.  Here the camera overlooks the
field, rays stride the full image, and the kernel reports how many chunks
each ray block actually swept.

    timeout 595 python scripts/culled_probe.py [block_rays ...]
"""

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
    _culled_fwd,
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


def main():
    blocks = [int(x) for x in sys.argv[1:]] or [512, 256, 128]
    chunk = int(os.environ.get("DRAY_CHUNK", "128"))
    big = random_sphere_field(8192, seed=3)
    culled = build_culled_scene(big, chunk=chunk)
    n_chunks = len(culled.bounds_r2)
    print(f"scene: {big.num_spheres} spheres, {n_chunks} chunks (chunk={chunk})",
          flush=True)

    # camera overlooking the field (extent 50): wide fov, elevated
    cam = make_camera(
        aspect_ratio=16 / 9, image_width=1024, vfov=55.0,
        lookfrom=(0.0, 35.0, 90.0), lookat=(0.0, 0.0, 0.0),
    )
    R = 131072
    ids = jnp.asarray(
        np.arange(R, dtype=np.int64) * cam.num_pixels // R, jnp.int32
    )
    o, d = jax.block_until_ready(
        generate_rays(cam, jax.random.PRNGKey(0), ids % cam.image_width,
                      ids // cam.image_width)
    )

    f_dense = jax.jit(lambda o, d: closest_hit_pallas(o, d, culled.scene))
    t_dense = timed(f_dense, o, d)
    r1 = jax.block_until_ready(f_dense(o, d))
    h = np.asarray(r1.hit)
    print(f"dense: {t_dense*1e3:.2f} ms  (hit rate {h.mean():.2f})", flush=True)

    for br in blocks:
        f_cull = jax.jit(
            lambda o, d, br=br: _culled_fwd(
                o, d, culled.scene, culled.bounds_c, culled.bounds_r2,
                culled.chunk, block_rays=br,
            )
        )
        t_cull = timed(f_cull, o, d)
        t2, idx2 = jax.block_until_ready(f_cull(o, d))
        from distributed_raytracer_tpu.core.vecmath import BIG

        ok_hit = (np.asarray(t2) < BIG * 0.5).mean() == h.mean()
        ok_idx = (np.asarray(idx2)[h] == np.asarray(r1.idx)[h]).mean()
        # sweep stats
        _, _, nsweep = jax.block_until_ready(
            jax.jit(
                lambda o, d, br=br: _culled_fwd(
                    o, d, culled.scene, culled.bounds_c, culled.bounds_r2,
                    culled.chunk, block_rays=br, stats=True,
                )
            )(o, d)
        )
        ns = np.asarray(nsweep)
        print(
            f"culled br={br:4d}: {t_cull*1e3:.2f} ms  speedup {t_dense/t_cull:.2f}x"
            f"  swept {ns.mean():.1f}/{n_chunks} chunks/block"
            f" (p50 {np.median(ns):.0f}, p95 {np.quantile(ns, 0.95):.0f})"
            f"  correct hit={ok_hit} idx={ok_idx:.4f}",
            flush=True,
        )

        # lower bound: zero-radius bounds cull EVERYTHING — how much time
        # does @pl.when skipping actually save?
        zero_r2 = jnp.zeros_like(culled.bounds_r2)
        f_skip = jax.jit(
            lambda o, d, br=br: _culled_fwd(
                o, d, culled.scene, culled.bounds_c, zero_r2,
                culled.chunk, block_rays=br,
            )
        )
        t_skip = timed(f_skip, o, d)
        print(f"  all-culled lower bound br={br}: {t_skip*1e3:.2f} ms", flush=True)

        # in-kernel front-to-back WALK (manual double-buffered DMA)
        f_walk = jax.jit(
            lambda o, d, br=br: _culled_walk_fwd(
                o, d, culled.scene, culled.bounds_c, culled.bounds_r2,
                culled.chunk, block_rays=br,
            )
        )
        t_walk = timed(f_walk, o, d)
        tw, iw = jax.block_until_ready(f_walk(o, d))
        okw = (np.asarray(iw)[h] == np.asarray(r1.idx)[h]).mean()
        f_walk0 = jax.jit(
            lambda o, d, br=br: _culled_walk_fwd(
                o, d, culled.scene, culled.bounds_c, zero_r2,
                culled.chunk, block_rays=br,
            )
        )
        t_walk0 = timed(f_walk0, o, d)
        print(
            f"  WALK br={br}: {t_walk*1e3:.2f} ms  speedup {t_dense/t_walk:.2f}x"
            f"  idx={okw:.4f}  (all-culled floor {t_walk0*1e3:.2f} ms)",
            flush=True,
        )


if __name__ == "__main__":
    main()
