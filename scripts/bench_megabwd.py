"""Hardware bench: mega forward + MEGA BACKWARD vs the XLA backward at the
official 262k-ray config-4 workload, through the honest value_and_grad
pipeline (DESIGN §10)."""
import sys, os, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
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

def timeit(f, *args, reps=8):
    out = jax.block_until_ready(f(*args))
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = f(*args)
        jax.block_until_ready(out)
        ts.append(time.perf_counter() - t0)
    return min(ts)

for label, kw in [
    ("xla-bwd          ", dict(use_mega=True, segsum="matmul")),
    ("mega-bwd         ", dict(use_mega=True, mega_bwd=True)),
    ("mega-bwd rg=False", dict(use_mega=True, mega_bwd=True, ray_grads=False)),
]:
    tracer = make_tape_tracer(jax.random.PRNGKey(1), camera.max_depth,
                              pool=2048, budget=704, **kw)
    f = jax.jit(jax.value_and_grad(
        lambda p: image_loss(tracer(scene.with_diff_params(p), o, d),
                             jnp.zeros((n_rays, 3)))))
    t = timeit(f, params0)
    v, g = f(params0)
    nan = bool(jnp.isnan(g["centers"]).any()) or not bool(jnp.isfinite(v))
    print(f"{label}: {t*1e3:.2f} ms ({n_rays/t/1e6:.2f}M rays/s) bad={nan}",
          flush=True)

# grad agreement across backends on hardware
t1 = make_tape_tracer(jax.random.PRNGKey(1), camera.max_depth, pool=2048,
                      budget=704, use_mega=True, segsum="matmul")
t2 = make_tape_tracer(jax.random.PRNGKey(1), camera.max_depth, pool=2048,
                      budget=704, use_mega=True, mega_bwd=True)
f1 = jax.jit(jax.grad(lambda p: image_loss(t1(scene.with_diff_params(p), o, d), jnp.zeros((n_rays, 3)))))
f2 = jax.jit(jax.grad(lambda p: image_loss(t2(scene.with_diff_params(p), o, d), jnp.zeros((n_rays, 3)))))
g1, g2 = f1(params0), f2(params0)
for k in g1:
    a, b = np.asarray(g1[k]), np.asarray(g2[k])
    s = np.abs(a).max() + 1e-12
    print(f"{k}: max rel diff {np.abs(a - b).max()/s:.2e}", flush=True)
