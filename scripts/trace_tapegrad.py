"""Capture a jax.profiler trace of the official fwd+bwd tape program."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from distributed_raytracer_tpu.grad.diff_render import image_loss
from distributed_raytracer_tpu.grad.tapegrad import make_tape_tracer
from distributed_raytracer_tpu.models.presets import final_scene_camera, rtiow_final_scene
from distributed_raytracer_tpu.ops.camera import generate_rays
from distributed_raytracer_tpu.ops.pallas.intersect_kernel import closest_hit_pallas

scene = rtiow_final_scene(seed=0, pad_to=512)
camera = final_scene_camera(image_width=1200, spp=500)
n_rays = int(os.environ.get("DRAY_TRACE_RAYS", "65536"))
pool = int(os.environ.get("DRAY_TRACE_POOL", "4096"))
budget = os.environ.get("DRAY_TRACE_BUDGET")
budget = int(budget) if budget else None
refill = int(os.environ.get("DRAY_TRACE_REFILL", "1"))
w = camera.image_width
ids = jnp.asarray(np.arange(n_rays, dtype=np.int64) * camera.num_pixels // n_rays,
                  jnp.int32)
ray_o, ray_d = jax.block_until_ready(
    generate_rays(camera, jax.random.PRNGKey(0), ids % w, ids // w)
)
tracer = make_tape_tracer(jax.random.PRNGKey(1), camera.max_depth, pool=pool,
                          intersect_fn=closest_hit_pallas, use_fused=True,
                          segsum="matmul", budget=budget, refill_every=refill)


@jax.jit
def fwd_bwd(params, scene, o, d):
    def loss_fn(p):
        s = scene.with_diff_params(p)
        return image_loss(tracer(s, o, d), jnp.zeros((n_rays, 3), jnp.float32))
    return jax.value_and_grad(loss_fn)(params)


params = scene.diff_params()
out = fwd_bwd(params, scene, ray_o, ray_d)
jax.block_until_ready(out)
print("warm", flush=True)
trace_dir = "/root/repo/artifacts/trace_grad"
with jax.profiler.trace(trace_dir):
    jax.block_until_ready(fwd_bwd(params, scene, ray_o, ray_d))
print("trace ->", trace_dir, flush=True)
