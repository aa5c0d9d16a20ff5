"""TPU: fwd+bwd rays/s of the WALK tape tracer at 8k/32k spheres — the
VERDICT r4 item 1 acceptance number (gradients past one sweep chunk).

Workload: 1024x576 @ depth 8 (scripts/mega_walk_bench.py's whole-render
shape), full value_and_grad(image_loss) pipeline like bench.py.  Also
times the host-loop fused tape fallback (what >512-sphere gradients used
before round 5) at 8k for the speedup factor.

Run: timeout 2400 python -u scripts/bench_walk_tape.py
"""
import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
import jax.numpy as jnp

from distributed_raytracer_tpu.grad.diff_render import image_loss
from distributed_raytracer_tpu.grad.tapegrad import (
    make_tape_camera_walk_tracer, make_tape_tracer)
from distributed_raytracer_tpu.models.presets import (
    make_camera, random_sphere_field)
from distributed_raytracer_tpu.ops.camera import generate_rays
from distributed_raytracer_tpu.utils.metrics import timed_best

cam = make_camera(
    aspect_ratio=16.0 / 9.0, image_width=1024, samples_per_pixel=8,
    max_depth=8, vfov=55.0, lookfrom=(0.0, 20.0, 60.0),
    lookat=(0.0, 0.0, 0.0), vup=(0.0, 1.0, 0.0),
    defocus_angle=0.0, focus_dist=10.0,
)
n_pix = cam.num_pixels
ids = jnp.zeros((n_pix,), jnp.int32)
key = jax.random.PRNGKey(1)

for n_sph in (8192, 32768):
    scene = random_sphere_field(n_sph, seed=5, extent=30.0)
    tracer = make_tape_camera_walk_tracer(
        key, cam, scene, chunk=256, pool=2048, block_rays=512,
    )
    params = scene.diff_params()

    @jax.jit
    def fwd_bwd(p, scene):
        def loss_fn(pp):
            s = scene.with_diff_params(pp)
            colors = tracer(s, ids)
            return image_loss(colors, jnp.zeros_like(colors))
        return jax.value_and_grad(loss_fn)(p)

    t = timed_best(lambda s: fwd_bwd(params, s), scene, iters=4, reps=2)
    print(f"walk tape {n_sph:6d} spheres: {t*1e3:8.2f} ms / {n_pix} rays "
          f"-> {n_pix/t:,.0f} rays/s fwd+bwd", flush=True)

# fallback comparison at 8k: the host-loop fused tape (pre-round-5 path
# for >512-sphere gradients)
scene = random_sphere_field(8192, seed=5, extent=30.0)
w = cam.image_width
pid = jnp.arange(n_pix, dtype=jnp.int32)
o, d = jax.block_until_ready(
    jax.jit(lambda k: generate_rays(cam, k, pid % w, pid // w))(
        jax.random.PRNGKey(2)))
fused = make_tape_tracer(key, cam.max_depth, pool=2048, use_fused=True,
                         segsum="matmul", block_rays=512)
params = scene.diff_params()

@jax.jit
def fb2(p, scene, o, d):
    def loss_fn(pp):
        s = scene.with_diff_params(pp)
        colors = fused(s, o, d)
        return image_loss(colors, jnp.zeros_like(colors))
    return jax.value_and_grad(loss_fn)(p)

t = timed_best(lambda *a: fb2(params, *a), scene, o, d, iters=2, reps=2)
print(f"fused-tape fallback 8192 spheres: {t*1e3:8.2f} ms -> "
      f"{n_pix/t:,.0f} rays/s fwd+bwd", flush=True)
