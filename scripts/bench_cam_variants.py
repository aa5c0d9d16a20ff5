"""TPU sweep: make_tape_camera_tracer variants at the official bench
config (810k pixel ids, pool 2048, br 512, snug deterministic budget) —
the VERDICT r4 item 3 ladder (homes -> unified -> flat).

Run: timeout 2400 python -u scripts/bench_cam_variants.py
"""
import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
import jax.numpy as jnp

from distributed_raytracer_tpu.grad.diff_render import image_loss
from distributed_raytracer_tpu.grad.tapegrad import (
    _forward_tape_camera_raw, make_tape_camera_tracer)
from distributed_raytracer_tpu.models.presets import (
    final_scene_camera, rtiow_final_scene)
from distributed_raytracer_tpu.utils.metrics import timed_best

scene = rtiow_final_scene(seed=0, pad_to=512)
camera = final_scene_camera(image_width=1200, spp=500)
n_rays = camera.num_pixels
ids = jnp.arange(n_rays, dtype=jnp.int32)
pool = 2048

_, _, n_it, _ = jax.jit(
    lambda s, i: _forward_tape_camera_raw(
        s, camera, i, jax.random.PRNGKey(1), pool, 1760, 512, 2,
        iota_pix=True)
)(scene, ids)
n_it = int(n_it)
budget = -(-(n_it + 16) // 2) * 2
print(f"trip count {n_it} -> budget {budget}", flush=True)
params = scene.diff_params()

for variant in ("unified",):
    tracer = make_tape_camera_tracer(
        jax.random.PRNGKey(1), camera, pool=pool, budget=budget,
        block_rays=512, mega_pad=2, iota_pix=True, variant=variant)

    @jax.jit
    def fwd_bwd(p, scene, ids):
        def loss_fn(pp):
            s = scene.with_diff_params(pp)
            colors = tracer(s, ids)
            return image_loss(colors, jnp.zeros_like(colors))
        return jax.value_and_grad(loss_fn)(p)

    t = timed_best(lambda *a: fwd_bwd(params, *a), scene, ids,
                   iters=8, reps=3)
    print(f"{variant:8s}: {t*1e3:7.2f} ms / {n_rays} rays -> "
          f"{n_rays/t:,.0f} rays/s", flush=True)
