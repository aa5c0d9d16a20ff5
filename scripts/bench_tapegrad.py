"""Hardware sweep for the reverse-tape fwd+bwd tracer.

Times value_and_grad on the canonical bench workload (RTiOW final scene,
1200x675 camera rays, depth 50, 65536 rays) for a set of (pool, segsum)
configs.  Run ONE config per process (the remote compile service caches by
HLO hash, and two TPU processes serialize on the chip):

    timeout 595 python scripts/bench_tapegrad.py POOL SEGSUM [FUSED]

e.g. `python scripts/bench_tapegrad.py 16384 scatter fused`
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def bench_one(pool, segsum, use_fused, workload, split=True, budget=None,
              planar=False, refill=1, br=0, unroll=1):
    from distributed_raytracer_tpu.grad.diff_render import image_loss
    from distributed_raytracer_tpu.grad.tapegrad import _forward_tape, make_tape_tracer
    from distributed_raytracer_tpu.ops.intersect import closest_hit
    from distributed_raytracer_tpu.ops.pallas.intersect_kernel import closest_hit_pallas

    scene, ray_o, ray_d, params, depth, n_rays, on_tpu = workload
    ifn = closest_hit_pallas if on_tpu else closest_hit
    key = jax.random.PRNGKey(1)
    tracer = make_tape_tracer(
        key, depth, pool=pool, intersect_fn=ifn, use_fused=use_fused,
        segsum=segsum, budget=budget, planar=planar, refill_every=refill,
        block_rays=br, loop_unroll=unroll,
    )

    @jax.jit
    def fwd_bwd(params, scene, o, d):
        def loss_fn(p):
            s = scene.with_diff_params(p)
            colors = tracer(s, o, d)
            return image_loss(colors, jnp.zeros_like(colors))
        return jax.value_and_grad(loss_fn)(params)

    def timeit(fn, *a, iters=5):
        t0 = time.perf_counter()
        out = fn(*a)
        jax.block_until_ready(out)
        compile_s = time.perf_counter() - t0
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(*a)
        jax.block_until_ready(out)
        return (time.perf_counter() - t0) / iters, compile_s, out

    dt, compile_s, out = timeit(lambda *a: fwd_bwd(params, *a), scene, ray_o, ray_d)
    loss, grads = out
    msg = (f"RESULT pool={pool} segsum={segsum} fused={use_fused} budget={budget} "
           f"planar={planar} refill={refill} br={br} unroll={unroll} ms={dt*1e3:.2f} "
           f"rays_s={n_rays/dt:,.0f} "
           f"(compile {compile_s:.0f}s, loss={float(loss):.5f})")

    if split:
        fwd_only = jax.jit(
            lambda s, o, d: _forward_tape(s, o, d, key, depth, pool, ifn, use_fused,
                                          budget, planar, refill, br, unroll)
        )
        dtf, cf, res = timeit(fwd_only, scene, ray_o, ray_d)
        n_it = int(res[2])
        msg += (f" | fwd {dtf*1e3:.2f} ms ({n_rays/dtf:,.0f} rays/s, {n_it} iters)"
                f" -> bwd ~{(dt-dtf)*1e3:.2f} ms")
    print(msg, flush=True)


def main():
    from distributed_raytracer_tpu.models.presets import final_scene_camera, rtiow_final_scene
    from distributed_raytracer_tpu.ops.camera import generate_rays

    scene = rtiow_final_scene(seed=0, pad_to=512)
    camera = final_scene_camera(image_width=1200, spp=500)
    on_tpu = jax.devices()[0].platform != "cpu"
    print(f"devices={jax.devices()}", file=sys.stderr, flush=True)
    w = camera.image_width

    workloads = {}

    def workload(n_rays):
        if n_rays not in workloads:
            # STRIDED pixel ids: spread the rays over the whole image so the
            # bounce-depth mix matches a real render (the round-1 workload
            # used the first 65536 pixels = the top rows = mostly sky)
            import numpy as _np

            ids = jnp.asarray(
                _np.arange(n_rays, dtype=_np.int64) * camera.num_pixels // n_rays,
                jnp.int32,
            )
            ray_o, ray_d = jax.block_until_ready(
                jax.jit(lambda k: generate_rays(camera, k, ids % w, ids // w))(
                    jax.random.PRNGKey(0)
                )
            )
            workloads[n_rays] = (scene, ray_o, ray_d, scene.diff_params(),
                                 camera.max_depth, n_rays, on_tpu)
        return workloads[n_rays]

    # configs: "rays:pool:segsum[:fused[:planar[:budget[:refill[:br[:unroll]]]]]]"
    configs = sys.argv[1:] or ["65536:16384:matmul:fused"]
    for c in configs:
        parts = c.split(":")
        n_rays, pool, segsum = int(parts[0]), int(parts[1]), parts[2]
        fused = len(parts) > 3 and parts[3] == "fused"
        planar = len(parts) > 4 and parts[4] == "planar"
        def fld(i, default):
            return int(parts[i]) if len(parts) > i and parts[i] else default

        budget = fld(5, None)
        refill = fld(6, 1)
        br = fld(7, 0)
        unroll = fld(8, 1)
        bench_one(pool, segsum, fused, workload(n_rays), planar=planar,
                  budget=budget, refill=refill, br=br, unroll=unroll)


if __name__ == "__main__":
    main()
