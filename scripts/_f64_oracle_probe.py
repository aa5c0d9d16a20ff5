import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
import jax.numpy as jnp
import numpy as np
from jax.experimental.pallas import tpu as pltpu

from distributed_raytracer_tpu.grad.tapegrad import (
    _Tape, _backward_tape, camera_pos_from_tape, replay_from_tape)
from distributed_raytracer_tpu.models.presets import make_camera as mk, random_sphere_field
from distributed_raytracer_tpu.ops.pallas.mega_walk_bwd_kernel import mega_walk_backward
from distributed_raytracer_tpu.ops.pallas.mega_walk_kernel import (
    mega_walk_forward_camera, walk_pack_arrays_from_scene, walk_pack_for)
from distributed_raytracer_tpu.ops.pallas.mega_render_kernel import camera_scalar_row

scene = random_sphere_field(8192, seed=11, extent=40.0)
cam = mk(aspect_ratio=1.0, image_width=16, samples_per_pixel=1, max_depth=3,
         vfov=55.0, lookfrom=(0.0, 25.0, 80.0), lookat=(0.0, 0.0, 0.0),
         vup=(0.0, 1.0, 0.0), defocus_angle=0.0, focus_dist=10.0)
pack = walk_pack_for(scene, cam, chunk=256)
key = jax.random.PRNGKey(5)
bs = jnp.asarray(jax.random.randint(key, (), 0, 2**31-1), jnp.int32)
cs = jnp.asarray(jax.random.randint(jax.random.fold_in(key, 0xCA3), (), 0, 2**31-1), jnp.int32)
r = cam.num_pixels
sp, at, rs = walk_pack_arrays_from_scene(scene, pack.slot_to_orig, pack.chunk)
with pltpu.force_tpu_interpret_mode():
    out = mega_walk_forward_camera(
        sp, at, pack.bounds, camera_scalar_row(cam), jnp.int32(0), bs, cs,
        n_pix=r, w=cam.image_width, max_depth=cam.max_depth,
        chunk=pack.chunk, n_chunks=pack.n_chunks, pool=128, block_rays=128)
    rng = np.random.default_rng(4)
    gc32 = jnp.asarray(rng.standard_normal((r, 3)), jnp.float32)
    n_slots = pack.slot_to_orig.shape[0]
    g_pm, _ = mega_walk_backward(out.tape_f, out.tape_i, out.n_it, gc32,
                                 n_slots=n_slots, ray_grads=False)
tape = _Tape(fdata=out.tape_f[:, :16, :].transpose(0, 2, 1),
             idata=out.tape_i[:, :3, :].transpose(0, 2, 1))
pos = camera_pos_from_tape(out.tape_i, out.n_it, r)
d_rs, _, _ = _backward_tape(rs, tape, out.n_it, pos, gc32, segsum="scatter",
                            unroll=1, ray_grads=False)
xla32 = np.concatenate([np.asarray(d_rs.centers), np.asarray(d_rs.radii)[:, None],
    np.asarray(d_rs.albedo), np.asarray(d_rs.fuzz)[:, None],
    np.asarray(d_rs.ior)[:, None]], axis=1)
walk32 = np.asarray(g_pm)[:n_slots]

# f64 oracle on the same tape
tape64 = _Tape(fdata=tape.fdata.astype(jnp.float64), idata=tape.idata)
rs64 = jax.tree.map(lambda x: x.astype(jnp.float64)
                    if x.dtype == jnp.float32 else x, rs)
gc64 = gc32.astype(jnp.float64)
og = jax.grad(lambda p: jnp.sum(replay_from_tape(
    rs64.replace(**p), jnp.zeros((r, 3), jnp.float64), jnp.ones((r, 3), jnp.float64),
    tape64, int(out.n_it), rays_from_tape=True) * gc64))(
    {"centers": rs64.centers, "radii": rs64.radii, "albedo": rs64.albedo,
     "fuzz": rs64.fuzz, "ior": rs64.ior})
f64 = np.concatenate([np.asarray(og["centers"]), np.asarray(og["radii"])[:, None],
    np.asarray(og["albedo"]), np.asarray(og["fuzz"])[:, None],
    np.asarray(og["ior"])[:, None]], axis=1)
for name, a in (("walk32", walk32), ("xla32", xla32)):
    d = np.abs(a - f64)
    print(f"{name} vs f64: max {d.max():.4e} rel {d.max()/(np.abs(f64).max()+1e-30):.3e} "
          f"bins>1e-3band {(d > 1e-3*(np.abs(f64)+1)).sum()}", flush=True)
print("walk vs xla max:", np.abs(walk32 - xla32).max(), flush=True)
i = np.unravel_index(np.abs(walk32 - f64).argmax(), f64.shape)
print("hot bin", i, "walk", walk32[i], "xla", xla32[i], "f64", f64[i], flush=True)
