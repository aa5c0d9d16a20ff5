"""Inverse rendering PAST ONE SWEEP CHUNK (VERDICT r4 item 10): recover
perturbed albedos of an 8,192-sphere field by gradient descent through
the WALK tape tracer — the differentiable multi-chunk engine end to end
(target rendered by the walk RENDER engine, gradients by the walk tape
fwd+bwd, both the same kernel body / same draws).

    timeout 1200 python -u scripts/inverse_walk_demo.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
ART = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "artifacts")

import jax
import jax.numpy as jnp
import numpy as np
import optax

from distributed_raytracer_tpu.grad.tapegrad import (
    make_tape_camera_walk_tracer,
)
from distributed_raytracer_tpu.models.presets import (
    make_camera,
    random_sphere_field,
)
from distributed_raytracer_tpu.ops.pallas.mega_walk_kernel import (
    render_wavefront_sum_mega_walk,
    walk_pack_for,
)
from distributed_raytracer_tpu.render.image import write_ppm

STEPS = int(os.environ.get("DRAY_INV_STEPS", "120"))
N_SPH = 8192

scene = random_sphere_field(N_SPH, seed=5, extent=30.0)
camera = make_camera(
    aspect_ratio=16.0 / 9.0, image_width=256, samples_per_pixel=32,
    max_depth=6, vfov=55.0, lookfrom=(0.0, 20.0, 60.0),
    lookat=(0.0, 0.0, 0.0), vup=(0.0, 1.0, 0.0),
    defocus_angle=0.0, focus_dist=10.0,
)
n_pix = camera.num_pixels
print(f"{N_SPH} spheres, {camera.image_width}x{camera.image_height}",
      flush=True)

# target: the shipping walk RENDER engine, 32 spp
pack = walk_pack_for(scene, camera, chunk=256)
tgt_sum = jax.block_until_ready(render_wavefront_sum_mega_walk(
    pack, camera, jax.random.PRNGKey(9), 32, pool_size=2048, block_rays=512
))
target = np.asarray(tgt_sum) / 32.0
write_ppm(os.path.join(ART, "inverse_walk_target.ppm"),
          target.reshape(camera.image_height, camera.image_width, 3))

# perturb every albedo
rng = np.random.default_rng(5)
start_albedo = jnp.clip(
    scene.albedo
    + jnp.asarray(rng.normal(0, 0.25, scene.albedo.shape), jnp.float32),
    0.02, 0.98,
)
err0 = float(jnp.abs(start_albedo - scene.albedo).mean())

tracer = make_tape_camera_walk_tracer(
    jax.random.PRNGKey(1), camera, scene, chunk=256, pool=2048,
    block_rays=512,
)
ids = jnp.zeros((n_pix,), jnp.int32)
tgt_j = jnp.asarray(target, jnp.float32)
opt = optax.adam(2e-2)


@jax.jit
def step(albedo, opt_state, k):
    def loss_fn(a):
        cols = tracer(scene.replace(albedo=a), ids, k=k)
        return jnp.mean((cols - tgt_j) ** 2)

    loss, g = jax.value_and_grad(loss_fn)(albedo)
    upd, opt_state = opt.update(g, opt_state)
    return optax.apply_updates(albedo, upd), opt_state, loss


albedo = start_albedo
opt_state = opt.init(albedo)
key = jax.random.PRNGKey(3)
t0 = time.time()
for i in range(STEPS):
    key, k = jax.random.split(key)
    albedo, opt_state, loss = step(albedo, opt_state, k)
    if i % 20 == 0 or i == STEPS - 1:
        print(f"step {i:4d}: loss {float(loss):.6f} "
              f"({time.time()-t0:.0f}s)", flush=True)
albedo = jnp.clip(albedo, 0.0, 1.0)
el = time.time() - t0
err1 = float(jnp.abs(albedo - scene.albedo).mean())
print(f"albedo MAE {err0:.4f} -> {err1:.4f} (all {N_SPH} spheres; "
      f"under-constrained off-screen spheres drift — image RMSE is the "
      f"meaningful metric)", flush=True)
print(f"{STEPS} steps in {el:.0f}s = "
      f"{STEPS * n_pix / el:,.0f} fwd+bwd rays/s sustained incl. update",
      flush=True)

rec_sum = jax.block_until_ready(render_wavefront_sum_mega_walk(
    walk_pack_for(scene.replace(albedo=albedo), camera, chunk=256),
    camera, jax.random.PRNGKey(9), 32, pool_size=2048, block_rays=512))
rec = np.asarray(rec_sum) / 32.0
write_ppm(os.path.join(ART, "inverse_walk_recovered.ppm"),
          rec.reshape(camera.image_height, camera.image_width, 3))
rmse0 = float(np.sqrt(np.mean((np.asarray(tgt_sum) / 32.0 - target) ** 2)))
start_sum = jax.block_until_ready(render_wavefront_sum_mega_walk(
    walk_pack_for(scene.replace(albedo=start_albedo), camera, chunk=256),
    camera, jax.random.PRNGKey(9), 32, pool_size=2048, block_rays=512))
rmse_start = float(np.sqrt(np.mean((np.asarray(start_sum) / 32.0 - target) ** 2)))
rmse_rec = float(np.sqrt(np.mean((rec - target) ** 2)))
print(f"image RMSE vs target: start {rmse_start:.4f} -> recovered "
      f"{rmse_rec:.4f}", flush=True)
