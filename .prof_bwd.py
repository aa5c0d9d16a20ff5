import time
import jax, jax.numpy as jnp
from distributed_raytracer_tpu.models.presets import rtiow_final_scene, final_scene_camera
from distributed_raytracer_tpu.ops.pallas.intersect_kernel import closest_hit_pallas
from distributed_raytracer_tpu.ops.trace import bounce_step, init_state, trace_rays
from distributed_raytracer_tpu.ops.camera import generate_rays
from distributed_raytracer_tpu.grad.diff_render import image_loss

scene = rtiow_final_scene(seed=0, pad_to=512)
camera = final_scene_camera()
R = 131072
ids = jnp.arange(R, dtype=jnp.int32) % camera.num_pixels
key = jax.random.PRNGKey(0)
o, d = generate_rays(camera, key, ids % 1200, ids // 1200)
o, d = jax.block_until_ready((o, d))

def timed(fn, *a, iters=3):
    out = fn(*a); jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters): out = fn(*a)
    jax.block_until_ready(out)
    return (time.perf_counter()-t0)/iters*1e3

# single bounce fwd and fwd+bwd (pallas)
st = init_state(o, d)
def one_bounce_loss(c, st, k):
    s = scene.replace(centers=c)
    st2 = bounce_step(st, k, s, closest_hit_pallas)
    return jnp.sum(st2.color) + jnp.sum(st2.attenuation)
f_fwd = jax.jit(lambda c, st, k: one_bounce_loss(c, st, k))
f_vg = jax.jit(jax.value_and_grad(one_bounce_loss))
print(f"1 bounce fwd:     {timed(f_fwd, scene.centers, st, key):.2f} ms")
print(f"1 bounce fwd+bwd: {timed(f_vg, scene.centers, st, key):.2f} ms")

# depth-50 trace fwd+bwd, remat on vs off (R smaller for memory in off case)
for RR, remat in ((131072, True), (65536, True), (65536, False)):
    oo, dd = o[:RR], d[:RR]
    def loss(c, k, remat=remat, oo=oo, dd=dd):
        s = scene.replace(centers=c)
        cols = trace_rays(s, oo, dd, k, 50, remat=remat, intersect_fn=closest_hit_pallas)
        return image_loss(cols, jnp.zeros_like(cols))
    f = jax.jit(jax.value_and_grad(loss))
    try:
        t = timed(f, scene.centers, key)
        print(f"depth50 R={RR} remat={remat}: {t:.0f} ms -> {RR/t*1000/1e3:.0f}k rays/s")
    except Exception as e:
        print(f"depth50 R={RR} remat={remat}: FAILED {type(e).__name__}")
