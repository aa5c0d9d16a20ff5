import os, time, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp, numpy as np
from distributed_raytracer_tpu.models.presets import rtiow_final_scene, final_scene_camera, random_sphere_field
from distributed_raytracer_tpu.ops.intersect import closest_hit
from distributed_raytracer_tpu.ops.pallas.intersect_kernel import closest_hit_pallas
from distributed_raytracer_tpu.ops.pallas.culled_kernel import build_culled_scene, make_culled_intersect
from distributed_raytracer_tpu.render.wavefront import render_wavefront_sum
from distributed_raytracer_tpu.render.image import write_ppm
from distributed_raytracer_tpu.ops.camera import generate_rays

def timed(fn, *a, iters=3):
    out = fn(*a); jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters): out = fn(*a)
    jax.block_until_ready(out)
    return (time.perf_counter()-t0)/iters

camera = final_scene_camera()
key = jax.random.PRNGKey(0)

# 1) culled vs dense on the big scene (8192 spheres)
big = random_sphere_field(8192, seed=3, pad_to=8192+192)  # ends 8384.. use pad below
big = random_sphere_field(8192, seed=3)
culled = build_culled_scene(big, chunk=128)
n = culled.scene.num_spheres
print(f"big scene: {big.num_spheres} spheres -> culled N={n}, chunks={len(culled.bounds_r2)}", flush=True)
R = 131072
ids = jnp.arange(R, dtype=jnp.int32) % camera.num_pixels
o, d = generate_rays(camera, key, ids % 1200, ids // 1200)
o, d = jax.block_until_ready((o,d))

f_dense = jax.jit(lambda o,d: closest_hit_pallas(o,d,culled.scene))
cfn = make_culled_intersect(culled)
f_cull = jax.jit(lambda o,d: cfn(o,d,culled.scene))
t1 = timed(f_dense, o, d)
print(f"dense  8k-sphere intersect: {t1*1e3:.1f} ms", flush=True)
t2 = timed(f_cull, o, d, iters=3)
print(f"culled 8k-sphere intersect: {t2*1e3:.1f} ms  speedup {t1/t2:.2f}x", flush=True)
r1 = jax.block_until_ready(f_dense(o,d)); r2 = jax.block_until_ready(f_cull(o,d))
h = np.asarray(r1.hit)
print("TPU culled correctness: hit", (np.asarray(r2.hit)==h).mean(), "idx", (np.asarray(r2.idx)[h]==np.asarray(r1.idx)[h]).mean(), flush=True)

# 2) flagship render: config4 at 64 spp on the chip, wavefront+pallas
scene = rtiow_final_scene(seed=0, pad_to=512)
f = jax.jit(lambda s, k: render_wavefront_sum(s, camera, k, 8, 65536, closest_hit_pallas))
acc = jnp.zeros((camera.num_pixels,3), jnp.float32)
t0=time.perf_counter()
for b in range(8):
    acc = acc + f(scene, jax.random.fold_in(key, b))
acc.block_until_ready()
dt = time.perf_counter()-t0
rays = camera.num_pixels*64
print(f"config4 64spp render: {dt:.1f}s ({rays/dt/1e6:.2f} M rays/s incl first compile)", flush=True)
img = np.asarray(acc/64).reshape(camera.image_height, camera.image_width, 3)
write_ppm("/root/repo/artifacts_config4_64spp.ppm", img)
print("saved artifact; mean rgb:", img.mean(axis=(0,1)), flush=True)
