"""Scaling harness: rays/s vs device count on the mesh.

BASELINE target: >=85% rays/s scaling efficiency from 1 chip to a v5e-16.
Real multi-chip hardware isn't reachable from this environment (one chip
behind a tunnel), so this harness runs the REAL sharded program on
1/2/4/8-device meshes — on TPU when a slice is available, else on the
virtual-CPU fake backend (set FAKE_DEVICES=8) where it validates that the
sharded program's per-device work divides correctly and the collective
structure adds no serial bottleneck.  On a pod slice, run it unchanged.

Usage:
  FAKE_DEVICES=8 python scripts/scaling.py        # CPU functional check
  python scripts/scaling.py                       # real devices
"""

import os
import sys
import time

if os.environ.get("FAKE_DEVICES"):
    os.environ["XLA_FLAGS"] = (
        f"--xla_force_host_platform_device_count={os.environ['FAKE_DEVICES']} "
        + os.environ.get("XLA_FLAGS", "")
    )
    import jax

    jax.config.update("jax_platforms", "cpu")
else:
    import jax

import jax.numpy as jnp  # noqa: E402

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from distributed_raytracer_tpu.models.presets import (  # noqa: E402
    final_scene_camera,
    rtiow_final_scene,
)
from distributed_raytracer_tpu.ops.camera import make_camera  # noqa: E402
from distributed_raytracer_tpu.parallel import ShardedRenderer, make_mesh  # noqa: E402


def main():
    devices = jax.devices()
    n_dev = len(devices)
    print(f"platform={devices[0].platform} devices={n_dev}", file=sys.stderr)

    scene = rtiow_final_scene(seed=0, pad_to=512)
    if devices[0].platform == "cpu":
        camera = make_camera(
            aspect_ratio=16 / 9, image_width=320, samples_per_pixel=4, max_depth=8,
            vfov=20.0, lookfrom=(13.0, 2.0, 3.0), lookat=(0.0, 0.0, 0.0),
            defocus_angle=0.6, focus_dist=10.0,
        )
        spp = 2
    else:
        camera = final_scene_camera(image_width=1200, spp=500)
        spp = 4

    results = {}
    n = 1
    while n <= n_dev:
        mesh = make_mesh(n_rays=n, n_scene=1, devices=devices[:n])
        r = ShardedRenderer(mesh, camera)
        key = jax.random.PRNGKey(0)
        s = jnp.arange(spp, dtype=jnp.int32)
        out = r.render_sample_sum(scene, key, s)  # compile + warmup
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        for _ in range(3):
            out = r.render_sample_sum(scene, key, s)
        jax.block_until_ready(out)
        dt = (time.perf_counter() - t0) / 3
        rays = camera.num_pixels * spp
        rps = rays / dt
        results[n] = rps
        eff = rps / (results[1] * n) if n > 1 else 1.0
        print(
            f"devices={n}: {rps:,.0f} rays/s  "
            f"({rps / n:,.0f}/dev, efficiency {eff:.1%})"
        )
        n *= 2

    return results


if __name__ == "__main__":
    main()
