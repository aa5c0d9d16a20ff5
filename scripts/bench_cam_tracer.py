"""Hardware probe: fwd+bwd decomposition at the official config.

Times (a) the ray-table mega recording forward, (b) the camera-mode
recording forward (in-kernel primary rays, no [C,B]x6 ray table), (c) the
mega backward alone, (d) the full value_and_grad(image_loss) pipeline on
both tracer variants (ray-table with/without ray_grads, camera tracer).
Run on the chip; writes raw timings to stdout.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from distributed_raytracer_tpu.grad.diff_render import image_loss
from distributed_raytracer_tpu.grad.tapegrad import (
    make_tape_camera_tracer,
    make_tape_tracer,
)
from distributed_raytracer_tpu.models.presets import (
    final_scene_camera,
    rtiow_final_scene,
)
from distributed_raytracer_tpu.ops.camera import generate_rays
from distributed_raytracer_tpu.utils.metrics import timed_best

scene = rtiow_final_scene(seed=0, pad_to=512)
camera = final_scene_camera(image_width=1200, spp=500)
w = camera.image_width
depth = camera.max_depth
n_rays = 262144
pool, budget, br, pad = 2048, 704, 512, 2
print(f"devices: {jax.devices()}", flush=True)

ids = jnp.asarray(
    np.arange(n_rays, dtype=np.int64) * camera.num_pixels // n_rays, jnp.int32
)
key = jax.random.PRNGKey(0)
ray_o, ray_d = jax.block_until_ready(
    jax.jit(lambda k: generate_rays(camera, k, ids % w, ids // w))(key)
)
params = scene.diff_params()


def t(name, fn, *a, iters=8, reps=3):
    v = timed_best(fn, *a, iters=iters, reps=reps)
    print(f"{name:42s} {v*1e3:8.2f} ms  -> {n_rays/v/1e6:6.2f} M rays/s",
          flush=True)
    return v


# (a)/(b) forward-only kernels
from distributed_raytracer_tpu.grad.tapegrad import (
    _forward_tape_camera_raw,
    _forward_tape_mega,
)

fwd_ray = jax.jit(lambda s, o, d: _forward_tape_mega(
    s, o, d, jax.random.PRNGKey(1), depth, pool, budget, br, pad)[0])
fwd_cam = jax.jit(lambda s, i: _forward_tape_camera_raw(
    s, camera, i, jax.random.PRNGKey(1), pool, budget, br, pad)[0])
_, _, n_it_r, _ = jax.jit(lambda s, o, d: _forward_tape_mega(
    s, o, d, jax.random.PRNGKey(1), depth, pool, budget, br, pad))(
        scene, ray_o, ray_d)
_, _, n_it_c, _ = jax.jit(lambda s, i: _forward_tape_camera_raw(
    s, camera, i, jax.random.PRNGKey(1), pool, budget, br, pad))(scene, ids)
print(f"n_it ray-table {int(n_it_r)} camera {int(n_it_c)} / budget {budget}")
t("fwd ray-table (record)", fwd_ray, scene, ray_o, ray_d)
t("fwd camera-mode (record)", fwd_cam, scene, ids)

# (d) full pipelines
def vag(tracer, *extra):
    @jax.jit
    def fb(params, scene, *args):
        def loss_fn(p):
            s = scene.with_diff_params(p)
            colors = tracer(s, *args)
            return image_loss(colors, jnp.zeros_like(colors))
        return jax.value_and_grad(loss_fn)(params)
    return fb

kw = dict(max_depth=depth, pool=pool, budget=budget, block_rays=br,
          mega_pad=pad, use_mega=True, mega_bwd=True)
tr_ray = make_tape_tracer(jax.random.PRNGKey(1), **kw)
tr_ray_ng = make_tape_tracer(jax.random.PRNGKey(1), ray_grads=False, **kw)
tr_cam = make_tape_camera_tracer(jax.random.PRNGKey(1), camera,
                                 pool=pool, budget=budget, block_rays=br,
                                 mega_pad=pad)

t("fwd+bwd ray-table ray_grads=True", vag(tr_ray), params, scene, ray_o, ray_d)
t("fwd+bwd ray-table ray_grads=False", vag(tr_ray_ng), params, scene, ray_o, ray_d)
t("fwd+bwd camera tracer", vag(tr_cam), params, scene, ids)
print("done", flush=True)
