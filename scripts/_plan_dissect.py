import sys, os, time
sys.path.insert(0, "/root/repo")
import jax
import jax.numpy as jnp
from distributed_raytracer_tpu.models.presets import random_sphere_field
from distributed_raytracer_tpu.ops.camera import make_camera, generate_rays
from distributed_raytracer_tpu.ops.pallas.culled_kernel import build_culled_scene
from distributed_raytracer_tpu.core.vecmath import T_MIN

big = random_sphere_field(32768, seed=3, extent=50.0)
culled = build_culled_scene(big, chunk=256)
cam = make_camera(aspect_ratio=16/9, image_width=512, vfov=55.0,
                  lookfrom=(0.0, 35.0, 90.0), lookat=(0.0, 0.0, 0.0), max_depth=16)
ids = jnp.arange(16384, dtype=jnp.int32) % cam.num_pixels
ray_o, ray_d = generate_rays(cam, jax.random.PRNGKey(0), ids % cam.image_width, ids // cam.image_width)
bounds_c, bounds_r2 = culled.bounds_c, culled.bounds_r2
n_blocks, br = 32, 512

def timeit(f, *a, reps=5):
    out = jax.block_until_ready(f(*a))
    t0 = time.perf_counter()
    for _ in range(reps):
        out = f(*a)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / reps

def part_dist(ray_o, ray_d):
    r = ray_o.shape[0]
    pad = n_blocks * br - r
    ob = jnp.pad(ray_o, ((0, pad), (0, 0))).reshape(n_blocks, br, 3)
    db = jnp.pad(ray_d, ((0, pad), (0, 0))).reshape(n_blocks, br, 3)
    o_mean = jnp.mean(ob, axis=1)
    d_mean = jnp.mean(db, axis=1)
    d_mean = d_mean / (jnp.linalg.norm(d_mean, axis=-1, keepdims=True) + 1e-12)
    rel = bounds_c[None] - o_mean[:, None, :]
    proj = jnp.einsum("bcx,bx->bc", rel, d_mean)
    return jnp.maximum(proj, 0.0)

def part_reach(ray_o, ray_d):
    r = ray_o.shape[0]
    pad = n_blocks * br - r
    ob = jnp.pad(ray_o, ((0, pad), (0, 0))).reshape(n_blocks, br, 3)
    db = jnp.pad(ray_d, ((0, pad), (0, 0))).reshape(n_blocks, br, 3)
    hi = jax.lax.Precision.HIGHEST
    r2_pad = jnp.where(jnp.isfinite(bounds_r2), bounds_r2 * 1.0001 + 1e-5, bounds_r2)
    a = jnp.sum(db * db, axis=-1)
    db_bc = jnp.einsum("brx,cx->brc", db, bounds_c, precision=hi)
    ob_bc = jnp.einsum("brx,cx->brc", ob, bounds_c, precision=hi)
    hb = db_bc - jnp.sum(db * ob, axis=-1)[..., None]
    cb = (jnp.sum(bounds_c * bounds_c, axis=-1)[None, None] - 2.0 * ob_bc
          + jnp.sum(ob * ob, axis=-1)[..., None] - r2_pad[None, None])
    disc = hb * hb - a[..., None] * cb
    ok = disc >= 0.0
    far = hb + jnp.sqrt(jnp.where(ok, disc, 0.0))
    return jnp.any(ok & (far > T_MIN * a[..., None]) & (a[..., None] > 0.0), axis=1)

def part_sort(dist, reach):
    always = ~jnp.isfinite(bounds_r2)[None, :]
    reach = reach | always
    key = jnp.where(always, -1.0, jnp.where(reach, dist, jnp.inf))
    order = jnp.argsort(key, axis=1).astype(jnp.int32)
    n_visit = jnp.sum(reach, axis=1).astype(jnp.int32)
    return order, n_visit

t1 = timeit(jax.jit(part_dist), ray_o, ray_d)
t2 = timeit(jax.jit(part_reach), ray_o, ray_d)
dist = jax.jit(part_dist)(ray_o, ray_d); reach = jax.jit(part_reach)(ray_o, ray_d)
t3 = timeit(jax.jit(part_sort), dist, reach)
print(f"dist {t1*1e3:.2f} ms   reach {t2*1e3:.2f} ms   sort {t3*1e3:.2f} ms", flush=True)

# reach without HIGHEST precision einsums
def part_reach_def(ray_o, ray_d):
    r = ray_o.shape[0]
    pad = n_blocks * br - r
    ob = jnp.pad(ray_o, ((0, pad), (0, 0))).reshape(n_blocks, br, 3)
    db = jnp.pad(ray_d, ((0, pad), (0, 0))).reshape(n_blocks, br, 3)
    r2_pad = jnp.where(jnp.isfinite(bounds_r2), bounds_r2 * 1.0001 + 1e-5, bounds_r2)
    a = jnp.sum(db * db, axis=-1)
    oc = bounds_c[None, None, :, :] - ob[:, :, None, :]
    hb = jnp.sum(db[:, :, None, :] * oc, axis=-1)
    cb = jnp.sum(oc * oc, axis=-1) - r2_pad[None, None]
    disc = hb * hb - a[..., None] * cb
    ok = disc >= 0.0
    far = hb + jnp.sqrt(jnp.where(ok, disc, 0.0))
    return jnp.any(ok & (far > T_MIN * a[..., None]) & (a[..., None] > 0.0), axis=1)

t4 = timeit(jax.jit(part_reach_def), ray_o, ray_d)
import numpy as np
r2 = jax.jit(part_reach_def)(ray_o, ray_d)
print(f"reach elementwise-form {t4*1e3:.2f} ms  agree={bool((r2 == reach).all())}", flush=True)
