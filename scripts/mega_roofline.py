"""Roofline/MFU statement for the SHIPPING engines (VERDICT r4 item 6):
the mega RENDER kernel and the mega WALK kernel.

Method (measured, not modeled): time one full image sample at several
SCENE SIZES m and fit t(m) = a + b*m.  The slope b*m is the sweep path
(the only m-proportional work); the intercept a is everything
scene-size-independent (refill + camera math + shade + draws + color
homes + per-row grid/DMA fixed cost).  Report:

  - sweep-path throughput b in G sphere-tests/s, as a fraction of
    (1) the VPU issue model (21 ops/test at 3.85e12 slots/s = 183 G
    tests/s absolute ceiling) and (2) the fused kernel's measured
    steady-state bound (85 G tests/s, scripts/vpu_roofline.py — the
    realizable kernel-level speed of light on this hardware);
  - the fixed cost a per tape row, vs the total row time — what any
    further sweep acceleration CANNOT touch (Amdahl bound).

Run on hardware: timeout 2400 python -u scripts/mega_roofline.py
"""
import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
import jax.numpy as jnp
import numpy as np

from distributed_raytracer_tpu.models.presets import (
    final_scene_camera, rtiow_final_scene)
from distributed_raytracer_tpu.ops.pallas.mega_render_kernel import (
    mega_render_colors)
from distributed_raytracer_tpu.utils.metrics import timed_best

VPU_SLOTS = 8 * 128 * 4 * 0.94e9
OPS_PER_TEST = 21
KERNEL_BOUND_G = 85.0  # measured fused-kernel steady state (vpu_roofline)

camera = final_scene_camera(image_width=1200, spp=500)
n_pix = camera.num_pixels
pool, br = 2048, 1024

rows = []
for m in (128, 256, 512):
    # pad the SAME scene content to m spheres: sweeps cost O(m) regardless
    # of content (dense sweep is content-independent)
    scene = rtiow_final_scene(seed=0, pad_to=m) if m >= 489 else None
    if scene is None:
        # fewer spheres than the full scene: truncate (content changes the
        # RAY PATHS, so keep depth fixed and report n_it alongside)
        full = rtiow_final_scene(seed=0)
        import jax.tree_util as jtu
        scene = jtu.tree_map(lambda x: x[:m], full)
    s, bs, cs = jnp.int32(0), jnp.int32(31337), jnp.int32(99991)

    # n_it via the raw sample call, then time at a SNUG budget (the
    # worst-case grid pads ~18k dead rows whose copies would pollute the
    # fixed-cost intercept)
    from distributed_raytracer_tpu.ops.pallas.mega_render_kernel import (
        camera_scalar_row, mega_render_sample)
    raw = mega_render_sample(
        scene, camera_scalar_row(camera), s, bs, cs, n_pix,
        camera.image_width, camera.max_depth, pool=pool,
        block_rays=br)
    n_it = int(raw.n_it)
    budget = n_it + 16

    def one(sc):
        return mega_render_colors(sc, camera, s, bs, cs, pool=pool,
                                  budget=budget, block_rays=br)

    out = jax.block_until_ready(jax.jit(one)(scene))
    t = timed_best(jax.jit(one), scene, iters=3, reps=2)
    rows.append((m, n_it, t))
    print(f"m={m:4d}: n_it {n_it:5d}  t {t*1e3:8.2f} ms  "
          f"({t/n_it*1e6:6.2f} us/row)", flush=True)

# fit t_row(m) = a + b*m on per-row times (n_it varies slightly with
# content; per-row normalization removes it)
ms = np.array([r[0] for r in rows], float)
trow = np.array([r[2] / r[1] for r in rows], float)
A = np.stack([np.ones_like(ms), ms], -1)
(a, b), *_ = np.linalg.lstsq(A, trow, rcond=None)
tests_per_s = pool / b  # per row: pool*m tests in b*m seconds
print(f"\nfit: t_row = {a*1e6:.2f} us + {b*1e9:.3f} ns * m", flush=True)
print(f"sweep path: {tests_per_s/1e9:.1f} G tests/s "
      f"= {tests_per_s*OPS_PER_TEST/VPU_SLOTS*100:.0f}% of the VPU issue "
      f"model ({VPU_SLOTS*1e-12:.2f}T slots/s at {OPS_PER_TEST} ops/test), "
      f"{tests_per_s/1e9/KERNEL_BOUND_G*100:.0f}% of the measured "
      f"fused-kernel bound ({KERNEL_BOUND_G:.0f} G)", flush=True)
m512_row = a + b * 512
print(f"at m=512: fixed {a/m512_row*100:.0f}% of the "
      f"{m512_row*1e6:.1f} us row (Amdahl bound on sweep acceleration: "
      f"{m512_row/a:.2f}x)", flush=True)
