"""Knob sweep for the camera-mode recording tracer on hardware."""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from distributed_raytracer_tpu.grad.diff_render import image_loss
from distributed_raytracer_tpu.grad.tapegrad import (
    _forward_tape_camera_raw,
    make_tape_camera_tracer,
)
from distributed_raytracer_tpu.models.presets import (
    final_scene_camera,
    rtiow_final_scene,
)
from distributed_raytracer_tpu.utils.metrics import timed_best

scene = rtiow_final_scene(seed=0, pad_to=512)
camera = final_scene_camera(image_width=1200, spp=500)
n_rays = 262144
ids = jnp.asarray(
    np.arange(n_rays, dtype=np.int64) * camera.num_pixels // n_rays, jnp.int32
)
params = scene.diff_params()
print(f"devices: {jax.devices()}", flush=True)

for pool, budget, br in (
    (4096, 512, 1024),
    (8192, 384, 1024),
    (4096, 512, 512),
):
    _, _, n_it, _ = jax.jit(lambda s, i: _forward_tape_camera_raw(
        s, camera, i, jax.random.PRNGKey(1), pool, budget, br, 2))(scene, ids)
    tr = make_tape_camera_tracer(jax.random.PRNGKey(1), camera, pool=pool,
                                 budget=budget, block_rays=br, mega_pad=2)

    @jax.jit
    def fb(params, scene, i):
        def loss_fn(p):
            s = scene.with_diff_params(p)
            colors = tr(s, i)
            return image_loss(colors, jnp.zeros_like(colors))
        return jax.value_and_grad(loss_fn)(params)

    v = timed_best(fb, params, scene, ids, iters=8, reps=3)
    print(f"pool {pool} budget {budget} br {br}: n_it {int(n_it)} "
          f"{v*1e3:7.2f} ms -> {n_rays/v/1e6:6.2f} M rays/s", flush=True)
print("done", flush=True)
