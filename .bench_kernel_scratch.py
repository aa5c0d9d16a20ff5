import time
import jax, jax.numpy as jnp, numpy as np
from distributed_raytracer_tpu.models.presets import rtiow_final_scene, final_scene_camera
from distributed_raytracer_tpu.ops.intersect import closest_hit
from distributed_raytracer_tpu.ops.pallas.intersect_kernel import closest_hit_pallas
from distributed_raytracer_tpu.ops.trace import trace_rays_fast
from distributed_raytracer_tpu.ops.camera import generate_rays
from distributed_raytracer_tpu.render.wavefront import render_wavefront_sum

scene = rtiow_final_scene(seed=0, pad_to=512)
camera = final_scene_camera()
R = 131072
ids = jnp.arange(R, dtype=jnp.int32) % camera.num_pixels
key = jax.random.PRNGKey(0)
o, d = generate_rays(camera, key, ids % 1200, ids // 1200)
o, d = jax.block_until_ready((o, d))

def timed(fn, *a, iters=5):
    out = fn(*a); jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters): out = fn(*a)
    jax.block_until_ready(out)
    return (time.perf_counter()-t0)/iters

f_jax = jax.jit(lambda o,d: closest_hit(o,d,scene))
f_pal = jax.jit(lambda o,d: closest_hit_pallas(o,d,scene))
t1 = timed(f_jax, o, d); t2 = timed(f_pal, o, d)
print(f"intersect pure-JAX: {t1*1e3:.2f} ms ({R/t1/1e6:.1f} M/s)")
print(f"intersect pallas:   {t2*1e3:.2f} ms ({R/t2/1e6:.1f} M/s) speedup {t1/t2:.2f}x")
r1, r2 = jax.block_until_ready((f_jax(o,d), f_pal(o,d)))
h = np.asarray(r1.hit)
print("hit agree:", (np.asarray(r2.hit)==h).mean(), "idx agree:", (np.asarray(r2.idx)[h]==np.asarray(r1.idx)[h]).mean())

# wavefront fwd: full-image sample
wf_jax = jax.jit(lambda s, k: render_wavefront_sum(s, camera, k, 1, 131072))
wf_pal = jax.jit(lambda s, k: render_wavefront_sum(s, camera, k, 1, 131072, closest_hit_pallas))
t5 = timed(wf_jax, scene, key, iters=3); t6 = timed(wf_pal, scene, key, iters=3)
P = camera.num_pixels
print(f"wavefront fwd pure-JAX: {t5*1e3:.1f} ms ({P/t5/1e3:.0f}k rays/s)")
print(f"wavefront fwd pallas:   {t6*1e3:.1f} ms ({P/t6/1e3:.0f}k rays/s)")

g_fast = jax.jit(lambda o,d,k: trace_rays_fast(scene,o,d,k,50))
t3 = timed(g_fast, o, d, key, iters=3)
print(f"scan-trace fwd pure-JAX: {t3*1e3:.1f} ms ({R/t3/1e3:.0f}k rays/s)")
