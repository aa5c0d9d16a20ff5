"""Pipelined (bench.py-harness) comparison: xla backward vs mega backward
at the official 262k config — timed_best(iters=8, reps=3) like bench.py."""
import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
import jax.numpy as jnp
import numpy as np
from distributed_raytracer_tpu.grad.tapegrad import make_tape_tracer
from distributed_raytracer_tpu.grad.diff_render import image_loss
from distributed_raytracer_tpu.models.presets import final_scene_camera, rtiow_final_scene
from distributed_raytracer_tpu.ops.camera import generate_rays
from distributed_raytracer_tpu.ops.intersect import closest_hit
from distributed_raytracer_tpu.ops.pallas.intersect_kernel import closest_hit_pallas
from distributed_raytracer_tpu.utils.metrics import timed_best

scene = rtiow_final_scene(seed=0, pad_to=512)
camera = final_scene_camera(image_width=1200, spp=500)
n_rays = 262144
w = camera.image_width
ids = jnp.asarray(np.arange(n_rays, dtype=np.int64) * camera.num_pixels // n_rays, jnp.int32)
o, d = jax.block_until_ready(generate_rays(camera, jax.random.PRNGKey(0), ids % w, ids // w))
params0 = scene.diff_params()
target = jnp.zeros((n_rays, 3))

base_kw = dict(max_depth=camera.max_depth, pool=2048, budget=704)

for label, kw in [
    ("xla-bwd (official r3-mega)", dict(
        intersect_fn=closest_hit_pallas, use_fused=True, use_mega=True,
        segsum="matmul", refill_every=2)),
    ("mega-bwd rg=False", dict(use_mega=True, mega_bwd=True, ray_grads=False)),
    ("mega-bwd rg=True ", dict(use_mega=True, mega_bwd=True)),
]:
    tracer = make_tape_tracer(jax.random.PRNGKey(1), **base_kw, **kw)

    @jax.jit
    def fwd_bwd(params, o, d):
        def loss_fn(p):
            s = scene.with_diff_params(p)
            return image_loss(tracer(s, o, d), target)
        return jax.value_and_grad(loss_fn)(params)

    t = timed_best(fwd_bwd, params0, o, d, iters=8, reps=3)
    v, g = fwd_bwd(params0, o, d)
    bad = bool(jnp.isnan(g["centers"]).any()) or not bool(jnp.isfinite(v))
    print(f"{label}: {t*1e3:.2f} ms ({n_rays/t/1e6:.2f}M rays/s) bad={bad}",
          flush=True)
