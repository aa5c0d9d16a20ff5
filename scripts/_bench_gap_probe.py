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

def timeit(f, *args, reps=6):
    out = jax.block_until_ready(f(*args))
    t0 = time.perf_counter()
    for _ in range(reps):
        out = f(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / reps

for ids_name, ids in [
    ("bench ids", jnp.asarray(np.arange(n_rays, dtype=np.int64) * camera.num_pixels // n_rays, jnp.int32)),
    ("sweep ids", (jnp.arange(n_rays, dtype=jnp.int32) * (camera.num_pixels // n_rays)) % camera.num_pixels),
]:
    o, d = jax.block_until_ready(generate_rays(camera, jax.random.PRNGKey(0), ids % w, ids // w))
    for budget in (640, 704):
        tracer = make_tape_tracer(jax.random.PRNGKey(1), camera.max_depth,
                                  pool=2048, use_mega=True, segsum="matmul",
                                  budget=budget)
        g_color = jnp.ones((n_rays, 3), jnp.float32)
        vjp_raw = jax.jit(jax.grad(lambda s, oo, dd: jnp.sum(tracer(s, oo, dd) * g_color), allow_int=True))
        params = scene.diff_params()
        def fwd_bwd(p, s, oo, dd):
            def loss_fn(pp):
                s2 = s.with_diff_params(pp)
                colors = tracer(s2, oo, dd)
                return image_loss(colors, jnp.zeros_like(colors))
            return jax.value_and_grad(loss_fn)(p)
        vjp_loss = jax.jit(fwd_bwd)
        col = tracer(scene, o, d)
        nan = bool(jnp.isnan(col).any())
        t_raw = timeit(vjp_raw, scene, o, d)
        t_loss = timeit(lambda s, oo, dd: vjp_loss(params, s, oo, dd), scene, o, d)
        print(f"{ids_name} budget={budget}: raw {t_raw*1e3:.2f} ms ({n_rays/t_raw/1e6:.2f}M) "
              f"loss-pipe {t_loss*1e3:.2f} ms ({n_rays/t_loss/1e6:.2f}M) nan={nan}", flush=True)
