"""Trace the production forward renderer (fused wavefront, planar drain)."""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from distributed_raytracer_tpu.models.presets import final_scene_camera, rtiow_final_scene
from distributed_raytracer_tpu.render.wavefront import render_wavefront_sum_fused

scene = rtiow_final_scene(seed=0, pad_to=512)
camera = final_scene_camera(image_width=1200, spp=500)
f = jax.jit(lambda s, k: render_wavefront_sum_fused(s, camera, k, 4, int(os.environ.get("DRAY_TRACE_POOL", "16384"))))
jax.block_until_ready(f(scene, jax.random.PRNGKey(0)))
print("warm", flush=True)
with jax.profiler.trace("/root/repo/artifacts/trace_fwd"):
    jax.block_until_ready(f(scene, jax.random.PRNGKey(1)))
print("done", flush=True)
