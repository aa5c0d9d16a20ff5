"""Hardware image-parity check: render on the real TPU with the SHIPPING
engine (the mega render kernel, `--engine mega`'s path) plus the fused
fallback, and compare statistically against the independent f64 NumPy
reference renderer — the on-hardware version of tests/test_render.py's
golden test (which runs on CPU)."""
import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp, numpy as np
from distributed_raytracer_tpu.models.scene import SceneBuilder
from distributed_raytracer_tpu.ops.camera import make_camera
from distributed_raytracer_tpu.ops.pallas.mega_render_kernel import render_wavefront_sum_mega
from distributed_raytracer_tpu.render.wavefront import render_wavefront_sum_fused

scene = (SceneBuilder()
    .add_lambertian((0,-100.5,-1), 100.0, (0.8,0.8,0.0))
    .add_lambertian((0,0,-1.2), 0.5, (0.1,0.2,0.5))
    .add_metal((1,0,-1), 0.5, (0.8,0.6,0.2), 0.2)
    .add_dielectric((-1,0,-1), 0.5, 1.5)
    .build())
cam = make_camera(aspect_ratio=2.0, image_width=96, samples_per_pixel=128, max_depth=8)

m = jax.jit(lambda s,k: render_wavefront_sum_mega(s, cam, k, 128, pool_size=2048))
img_meg = np.asarray(jax.block_until_ready(m(scene, jax.random.PRNGKey(5))))/128
img_meg = img_meg.reshape(cam.image_height, cam.image_width, 3)
f = jax.jit(lambda s,k: render_wavefront_sum_fused(s, cam, k, 128, 65536))
img_fus = np.asarray(jax.block_until_ready(f(scene, jax.random.PRNGKey(3))))/128
img_fus = img_fus.reshape(cam.image_height, cam.image_width, 3)
print("TPU renders done", flush=True)

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests"))
from np_reference import NPScene, camera_np, render as np_render
ref = np_render(NPScene.from_scene(scene), camera_np(cam), spp=128, max_depth=8, seed=99)

for name, img in (("mega-render", img_meg), ("fused-kernel", img_fus)):
    d = np.abs(img - ref)
    print(f"{name} vs f64 reference @128spp: mean {d.mean():.4f} p99 {np.quantile(d,0.99):.4f}", flush=True)
