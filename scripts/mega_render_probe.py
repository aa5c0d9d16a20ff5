"""Hardware probe: forward-only MEGA RENDER kernel vs the production
fused wavefront renderer at the official forward workload (bench.py:
RTiOW final scene 512-pad, 1200x675 depth 50, spp_bench=4).

Usage (ONE TPU process at a time, background, raw output to file):
    timeout 595 python scripts/mega_render_probe.py baseline
    timeout 595 python scripts/mega_render_probe.py mega POOL BUDGET BR
    timeout 595 python scripts/mega_render_probe.py nit POOL       # trip count

`nit` runs one sample with a generous budget and prints n_it/clean so a
tight budget can be chosen for the timed `mega` runs (budget is static ->
each (pool, budget, br) combo is a separate remote compile).
"""

import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp


def main():
    mode = sys.argv[1]
    print("devices:", jax.devices(), flush=True)

    from distributed_raytracer_tpu.models.presets import (
        final_scene_camera,
        rtiow_final_scene,
    )
    from distributed_raytracer_tpu.utils.metrics import timed_best

    scene = rtiow_final_scene(seed=0, pad_to=512)
    camera = final_scene_camera(image_width=1200, spp=500)
    spp_bench = 4
    total = camera.num_pixels * spp_bench
    key = jax.random.PRNGKey(0)

    if mode == "baseline":
        from distributed_raytracer_tpu.render.wavefront import (
            render_wavefront_sum_fused,
        )

        @jax.jit
        def fwd(scene, key):
            return render_wavefront_sum_fused(
                scene, camera, key, spp_bench, pool_size=16384
            )

        t = timed_best(fwd, scene, key, iters=3, reps=2)
        print(
            f"baseline fused pool=16384: {t*1e3:.2f} ms/{total} rays -> "
            f"{total/t/1e6:.2f} M rays/s",
            flush=True,
        )
        return

    if mode == "nit":
        pool = int(sys.argv[2])
        from distributed_raytracer_tpu.ops.pallas.mega_render_kernel import (
            camera_scalar_row,
            mega_render_sample,
        )

        cam_row = camera_scalar_row(camera)
        budget = int(sys.argv[3]) if len(sys.argv) > 3 else 3000
        out = jax.block_until_ready(
            mega_render_sample(
                scene,
                cam_row,
                jnp.int32(0),
                jnp.int32(12345),
                jnp.int32(67890),
                n_pix=camera.num_pixels,
                w=camera.image_width,
                max_depth=camera.max_depth,
                pool=pool,
                budget=budget,
                block_rays=512,
            )
        )
        print(
            f"pool={pool} budget={budget}: n_it={int(out.n_it)} "
            f"clean={int(out.clean)}",
            flush=True,
        )
        return

    if mode == "mega":
        pool, budget, br = int(sys.argv[2]), int(sys.argv[3]), int(sys.argv[4])
        from distributed_raytracer_tpu.ops.pallas.mega_render_kernel import (
            render_wavefront_sum_mega,
        )

        @jax.jit
        def fwd(scene, key):
            return render_wavefront_sum_mega(
                scene, camera, key, spp_bench, pool_size=pool,
                budget=budget, block_rays=br,
            )

        t0 = time.perf_counter()
        img = jax.block_until_ready(fwd(scene, key))
        print(f"compile+first run: {time.perf_counter()-t0:.1f} s", flush=True)
        print(
            "image mean/max:", float(img.mean() / spp_bench),
            float(img.max() / spp_bench), flush=True,
        )
        t = timed_best(fwd, scene, key, iters=3, reps=2)
        print(
            f"mega pool={pool} budget={budget} br={br}: {t*1e3:.2f} ms/"
            f"{total} rays -> {total/t/1e6:.2f} M rays/s",
            flush=True,
        )
        return

    raise SystemExit(f"unknown mode {mode}")


if __name__ == "__main__":
    main()
