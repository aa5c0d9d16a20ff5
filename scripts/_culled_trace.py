import sys, os, time
sys.path.insert(0, "/root/repo")
import jax
import jax.numpy as jnp
from distributed_raytracer_tpu.models.presets import random_sphere_field
from distributed_raytracer_tpu.ops.camera import make_camera, generate_rays
from distributed_raytracer_tpu.ops.pallas.culled_kernel import build_culled_scene, _block_visit_plan
from distributed_raytracer_tpu.render.order import tile_permutation
from distributed_raytracer_tpu.render.wavefront import render_wavefront_sum_fused

big = random_sphere_field(32768, seed=3, extent=50.0)
culled = build_culled_scene(big, chunk=256)
cam = make_camera(aspect_ratio=16/9, image_width=512, vfov=55.0,
                  lookfrom=(0.0, 35.0, 90.0), lookat=(0.0, 0.0, 0.0), max_depth=16)
perm = jnp.asarray(tile_permutation(cam.image_width, cam.image_height))

def timeit(f, *a, reps=3):
    out = jax.block_until_ready(f(*a))
    t0 = time.perf_counter()
    for _ in range(reps):
        out = f(*a)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / reps

# 1) visit-plan cost alone at pool shape (32 blocks of 512)
ids = jnp.arange(16384, dtype=jnp.int32) % cam.num_pixels
o, d = generate_rays(cam, jax.random.PRNGKey(0), ids % cam.image_width, ids // cam.image_width)
plan = jax.jit(lambda o, d: _block_visit_plan(o, d, culled.bounds_c, culled.bounds_r2, 32, 512))
t_plan = timeit(plan, o, d)
print(f"visit plan (pool 16384, C={len(culled.bounds_r2)}): {t_plan*1e3:.2f} ms/bounce", flush=True)

# 2) whole culled render trace
render = jax.jit(lambda s, k: render_wavefront_sum_fused(
    s, cam, k, spp=2, pool_size=16384, culled=culled, pixel_perm=perm, resort_every=2))
t = timeit(render, culled.scene, jax.random.PRNGKey(0))
print(f"culled tiled+resort render: {t*1e3:.1f} ms", flush=True)
with jax.profiler.trace("/root/repo/artifacts/trace_culled"):
    jax.block_until_ready(render(culled.scene, jax.random.PRNGKey(0)))
print("trace written", flush=True)
