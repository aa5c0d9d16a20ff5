import sys, time
import jax, jax.numpy as jnp
from distributed_raytracer_tpu.models.presets import rtiow_final_scene, final_scene_camera
from distributed_raytracer_tpu.ops.pallas.intersect_kernel import closest_hit_pallas
from distributed_raytracer_tpu.ops.camera import generate_rays
from distributed_raytracer_tpu.grad.pathgrad import make_pathgrad_tracer
from distributed_raytracer_tpu.grad.diff_render import image_loss

scene = rtiow_final_scene(seed=0, pad_to=512)
camera = final_scene_camera()
key = jax.random.PRNGKey(0)

def timed(fn, *a, iters=3):
    out = fn(*a); jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters): out = fn(*a)
    jax.block_until_ready(out)
    return (time.perf_counter()-t0)/iters

for R, pd in [(int(a), int(b)) for a, b in (p.split(",") for p in sys.argv[1:])]:
    ids = jnp.arange(R, dtype=jnp.int32) % camera.num_pixels
    o, d = generate_rays(camera, key, ids % 1200, ids // 1200)
    tracer = make_pathgrad_tracer(key, 50, pool_divisor=pd,
                                  intersect_fn=closest_hit_pallas, primal="fused")
    def loss(params, s, oo, dd):
        return image_loss(tracer(s.with_diff_params(params), oo, dd), jnp.zeros((R,3)))
    f = jax.jit(jax.value_and_grad(loss))
    t = timed(f, scene.diff_params(), scene, o, d)
    print(f"R={R} pd={pd} (pool={R//pd}): {t*1e3:.0f} ms -> {R/t/1e3:.0f}k rays/s", flush=True)
