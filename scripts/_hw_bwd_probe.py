import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, time
import jax.numpy as jnp
import numpy as np
from distributed_raytracer_tpu.grad.tapegrad import _Tape, _backward_tape, camera_pos_from_tape
from distributed_raytracer_tpu.models.presets import make_camera as mk, random_sphere_field
from distributed_raytracer_tpu.ops.pallas.mega_walk_bwd_kernel import mega_walk_backward
from distributed_raytracer_tpu.ops.pallas.mega_walk_kernel import (
    mega_walk_forward_camera, walk_pack_arrays_from_scene, walk_pack_for)
from distributed_raytracer_tpu.ops.pallas.mega_render_kernel import camera_scalar_row

scene = random_sphere_field(8192, seed=11, extent=40.0)
cam = mk(aspect_ratio=16.0/9.0, image_width=64, samples_per_pixel=1,
         max_depth=6, vfov=55.0, lookfrom=(0.0, 25.0, 80.0),
         lookat=(0.0, 0.0, 0.0), vup=(0.0, 1.0, 0.0),
         defocus_angle=0.0, focus_dist=10.0)
pack = walk_pack_for(scene, cam, chunk=256)
key = jax.random.PRNGKey(5)
bs = jnp.asarray(jax.random.randint(key, (), 0, 2**31-1), jnp.int32)
cs = jnp.asarray(jax.random.randint(jax.random.fold_in(key, 0xCA3), (), 0, 2**31-1), jnp.int32)
n_pix = cam.num_pixels
sp, at, rs = walk_pack_arrays_from_scene(scene, pack.slot_to_orig, pack.chunk)
out = jax.block_until_ready(mega_walk_forward_camera(
    sp, at, pack.bounds, camera_scalar_row(cam), jnp.int32(0), bs, cs,
    n_pix=n_pix, w=cam.image_width, max_depth=cam.max_depth,
    chunk=pack.chunk, n_chunks=pack.n_chunks, pool=256, block_rays=256))
print("clean", int(out.clean), "n_it", int(out.n_it), flush=True)
rng = np.random.default_rng(4)
gc = jnp.asarray(rng.standard_normal((n_pix, 3)), jnp.float32)
n_slots = pack.slot_to_orig.shape[0]
g_pm, _ = jax.block_until_ready(mega_walk_backward(
    out.tape_f, out.tape_i, out.n_it, gc, n_slots=n_slots, ray_grads=False))
tape = _Tape(fdata=out.tape_f[:, :16, :].transpose(0, 2, 1),
             idata=out.tape_i[:, :3, :].transpose(0, 2, 1))
pos = camera_pos_from_tape(out.tape_i, out.n_it, n_pix)
names = ["cx","cy","cz","r","ar","ag","ab","fz","io"]
for segsum in ("matmul", "scatter"):
    d_rs, _, _ = _backward_tape(rs, tape, out.n_it, pos, gc, segsum=segsum,
                                unroll=1, ray_grads=False)
    ref = np.concatenate([np.asarray(d_rs.centers), np.asarray(d_rs.radii)[:, None],
        np.asarray(d_rs.albedo), np.asarray(d_rs.fuzz)[:, None],
        np.asarray(d_rs.ior)[:, None]], axis=1)
    got = np.asarray(g_pm)[:n_slots]
    d = np.abs(got - ref)
    print(f"== {segsum}: global max {d.max():.4e} refmax {np.abs(ref).max():.4e}", flush=True)
    for j in range(9):
        rj = np.abs(ref[:, j]).max() + 1e-30
        k = d[:, j].argmax()
        print(f"  {names[j]}: max {d[:, j].max():.3e} (col-rel {d[:, j].max()/rj:.2e}) "
              f"bin {k} got {got[k, j]:.6f} ref {ref[k, j]:.6f}", flush=True)
    nbad = (d > 1e-3 * (np.abs(ref) + 1)).sum()
    print(f"  bins past 1e-3 band: {nbad}/{ref.size}", flush=True)
