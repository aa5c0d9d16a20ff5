"""Profile the mega-kernel fwd+bwd + sweep valid budgets/block widths.

Run: timeout 1700 python scripts/trace_mega.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from distributed_raytracer_tpu.grad.tapegrad import make_tape_tracer
from distributed_raytracer_tpu.models.presets import (
    final_scene_camera,
    rtiow_final_scene,
)
from distributed_raytracer_tpu.ops.camera import generate_rays

scene = rtiow_final_scene(seed=0, pad_to=512)
camera = final_scene_camera(image_width=1200, spp=500)
n_rays = 262144
stride = max(1, camera.num_pixels // n_rays)
ids = (jnp.arange(n_rays, dtype=jnp.int32) * stride) % camera.num_pixels
w = camera.image_width
ray_o, ray_d = jax.block_until_ready(
    generate_rays(camera, jax.random.PRNGKey(0), ids % w, ids // w)
)
g_color = jnp.ones((n_rays, 3), jnp.float32)


def timeit(f, *args, reps=5):
    out = jax.block_until_ready(f(*args))
    t0 = time.perf_counter()
    for _ in range(reps):
        out = f(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / reps


results = {}
for pool, budget, pad, br in [
    (2048, 576, 2, 1024),
    (2048, 576, 4, 1024),
    (2048, 576, 2, 512),
    (2048, 576, 2, 2048),
    (1024, 1152, 2, 1024),
]:
    try:
        tracer = make_tape_tracer(
            jax.random.PRNGKey(1), camera.max_depth, pool=pool, use_mega=True,
            segsum="matmul", budget=budget, mega_pad=pad, block_rays=br,
        )
        fwd = jax.jit(lambda s, oo, dd: tracer(s, oo, dd))
        vjp = jax.jit(jax.grad(
            lambda s, oo, dd: jnp.sum(tracer(s, oo, dd) * g_color),
            allow_int=True))
        t_f = timeit(fwd, scene, ray_o, ray_d)
        col = fwd(scene, ray_o, ray_d)
        nan = bool(jnp.isnan(col).any())
        t_g = timeit(vjp, scene, ray_o, ray_d)
        print(f"pool={pool} budget={budget} pad={pad} br={br}: "
              f"fwd {t_f*1e3:.2f} ms ({n_rays/t_f/1e6:.2f}M) "
              f"fwd+bwd {t_g*1e3:.2f} ms ({n_rays/t_g/1e6:.2f}M rays/s) "
              f"nan={nan}", flush=True)
        results[(pool, budget, pad, br)] = (t_g, nan, tracer, fwd, vjp)
    except Exception as e:
        print(f"pool={pool} budget={budget} pad={pad} br={br}: FAILED "
              f"{type(e).__name__}: {e}", flush=True)

valid = {k: v for k, v in results.items() if not v[1]}
if valid:
    best = min(valid, key=lambda k: valid[k][0])
    print(f"best valid: {best} -> {262144/valid[best][0]/1e6:.2f}M rays/s",
          flush=True)
    _, _, tracer, fwd, vjp = valid[best]
    trace_dir = "/root/repo/artifacts/trace_mega"
    with jax.profiler.trace(trace_dir):
        jax.block_until_ready(vjp(scene, ray_o, ray_d))
    print(f"trace written to {trace_dir}", flush=True)
