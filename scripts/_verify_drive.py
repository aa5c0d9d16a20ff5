import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax, jax.numpy as jnp
import distributed_raytracer_tpu as dr
from distributed_raytracer_tpu.models.presets import get_config
from distributed_raytracer_tpu.render.image import write_ppm

scene, cam = get_config("config2")
cam = cam.replace(samples_per_pixel=16)
img = dr.render_image(scene, cam, seed=0, spp=16)
write_ppm("/tmp/verify_out.ppm", img)
print("top-center:", img[5, img.shape[1] // 2], flush=True)
print("bottom-center:", img[-5, img.shape[1] // 2], flush=True)

# exercise the CHANGED path end-to-end: official-config tracer with the
# mega backward through value_and_grad
from distributed_raytracer_tpu.grad.tapegrad import make_tape_tracer
from distributed_raytracer_tpu.grad.diff_render import image_loss
from distributed_raytracer_tpu.ops.camera import generate_rays

n = 8192
ids = jnp.arange(n, dtype=jnp.int32) * (cam.num_pixels // n)
o, d = generate_rays(cam, jax.random.PRNGKey(0), ids % cam.image_width,
                     ids // cam.image_width)
tracer = make_tape_tracer(jax.random.PRNGKey(1), cam.max_depth, pool=2048,
                          use_mega=True, mega_bwd=True)
p0 = scene.diff_params()
f = jax.jit(jax.value_and_grad(
    lambda p: image_loss(tracer(scene.with_diff_params(p), o, d),
                         jnp.zeros((n, 3)))))
v, g = f(p0)
print("loss:", float(v), "grad albedo norm:", float(jnp.linalg.norm(g["albedo"])),
      "finite:", bool(jnp.isfinite(v)) and all(bool(jnp.all(jnp.isfinite(x))) for x in g.values()),
      flush=True)
