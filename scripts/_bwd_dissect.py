"""Backward cost attribution: ray_grads on/off at the official config."""
import sys, os, time
sys.path.insert(0, "/root/repo")
import jax
import jax.numpy as jnp
import numpy as np
from distributed_raytracer_tpu.grad.tapegrad import make_tape_tracer
from distributed_raytracer_tpu.grad.diff_render import image_loss
from distributed_raytracer_tpu.models.presets import final_scene_camera, rtiow_final_scene
from distributed_raytracer_tpu.ops.camera import generate_rays

scene = rtiow_final_scene(seed=0, pad_to=512)
camera = final_scene_camera(image_width=1200, spp=500)
n_rays = 262144
w = camera.image_width
ids = jnp.asarray(np.arange(n_rays, dtype=np.int64) * camera.num_pixels // n_rays, jnp.int32)
o, d = jax.block_until_ready(generate_rays(camera, jax.random.PRNGKey(0), ids % w, ids // w))
params0 = scene.diff_params()

def timeit(f, *args, reps=6):
    out = jax.block_until_ready(f(*args))
    t0 = time.perf_counter()
    for _ in range(reps):
        out = f(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / reps

for rg in (True, False):
    tracer = make_tape_tracer(jax.random.PRNGKey(1), camera.max_depth,
                              pool=2048, use_mega=True, segsum="matmul",
                              budget=704, ray_grads=rg)
    f = jax.jit(jax.value_and_grad(
        lambda p: image_loss(tracer(scene.with_diff_params(p), o, d),
                             jnp.zeros((n_rays, 3)))))
    t = timeit(f, params0)
    print(f"ray_grads={rg}: {t*1e3:.2f} ms ({n_rays/t/1e6:.2f}M rays/s)", flush=True)
