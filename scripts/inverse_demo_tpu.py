"""Inverse rendering AT SCALE on the chip (BASELINE config 5): perturb the
RTiOW final scene's albedos, then recover them by gradient descent on an
image loss, using the reverse-tape wavefront gradients (grad/tapegrad.py)
with the fused bounce kernel — the fast fwd+bwd path end to end.

    timeout 595 python scripts/inverse_demo_tpu.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
ART = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "artifacts")

import jax
import jax.numpy as jnp
import numpy as np

from distributed_raytracer_tpu.grad.diff_render import InverseRenderer
from distributed_raytracer_tpu.models.presets import final_scene_camera, rtiow_final_scene
from distributed_raytracer_tpu.render.image import write_ppm
from distributed_raytracer_tpu.render.wavefront import render_image_wavefront

STEPS = int(os.environ.get("DRAY_INV_STEPS", "150"))

scene = rtiow_final_scene(seed=0, pad_to=512)
camera = final_scene_camera(image_width=300, spp=64).replace(max_depth=12)
print(f"scene {scene.num_spheres} spheres, {camera.image_width}x{camera.image_height}",
      flush=True)

# ground-truth target image (fused production renderer)
target = render_image_wavefront(scene, camera, seed=9, spp=64, pool_size=16384,
                                use_pallas=True)
write_ppm(os.path.join(ART, "inverse_tpu_target.ppm"), target)

# perturb albedos of the real (non-pad) spheres
rng = np.random.default_rng(5)
mask = (np.asarray(scene.radii) > 0)[:, None]
start = scene.replace(
    albedo=jnp.clip(
        scene.albedo + jnp.asarray(rng.normal(0, 0.25, scene.albedo.shape) * mask,
                                   jnp.float32),
        0.02, 0.98,
    )
)
img0 = render_image_wavefront(start, camera, seed=9, spp=16, pool_size=16384,
                              use_pallas=True)
write_ppm(os.path.join(ART, "inverse_tpu_start.ppm"), img0)
err0 = float(jnp.abs(start.albedo - scene.albedo).mean())

inv = InverseRenderer(
    start, camera, jnp.asarray(target).reshape(-1, 3),
    fields=("albedo",), learning_rate=3e-2, spp_per_step=2, seed=1,
    engine="tape", pool=8192,
)
t0 = time.time()
for i in range(STEPS):
    loss = inv.step()
    if i % 20 == 0 or i == STEPS - 1:
        el = time.time() - t0
        print(f"step {i:4d}: loss {loss:.6f} ({el:.0f}s)", flush=True)

err1 = float(jnp.abs(inv.scene.albedo - scene.albedo).mean())
rays_per_step = camera.num_pixels * 2
el = time.time() - t0
# NOTE: raw parameter MAE typically RISES while the image converges —
# albedos of barely-visible spheres are under-constrained by the image
# loss and drift; recovered-image RMSE below is the meaningful metric
print(f"albedo MAE {err0:.4f} -> {err1:.4f} in {STEPS} steps, "
      f"{el:.0f}s ({STEPS * rays_per_step / el:,.0f} fwd+bwd rays/s sustained)",
      flush=True)
img1 = render_image_wavefront(inv.scene, camera, seed=9, spp=16, pool_size=16384,
                              use_pallas=True)
write_ppm(os.path.join(ART, "inverse_tpu_recovered.ppm"), img1)
rmse = float(np.sqrt(np.mean((img1 - target) ** 2)))
print(f"recovered-image RMSE vs target: {rmse:.4f}", flush=True)
