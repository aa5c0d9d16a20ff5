"""Pallas TPU kernel: fused closest-hit ray×sphere intersection.

Why a kernel: the pure-JAX closest_hit (ops/intersect.py) materializes
several dense [R, N] f32 intermediates per bounce (candidate ts, masks,
discriminants).  At R=128k rays, N=512 spheres that is ~250 MB per buffer
per bounce — the whole bounce loop becomes HBM-bandwidth-bound.  This
kernel keeps the sphere-block sweep entirely in VMEM and writes only the
[R]-sized results (t, idx), cutting HBM traffic per bounce from O(R*N) to
O(R).

Layout: rays arrive as six [R, 1] component columns (SoA — a [R, 3] array
would tile terribly with its size-3 lane dim); the scene as five [1, Np]
rows (cx, cy, cz, |c|^2 - r^2 precombined, and radius for the caller).
Np must be a multiple of the lane width 128 (SceneBuilder pad_to /
shard_scene handle padding with never-hit spheres).

Inside the kernel each grid step owns a (BR, 1) ray block and sweeps the
sphere axis in (1, CHUNK) slices, carrying a running (t_min, argmin) pair —
the vectorized form of hittable_list.rs:60-74's closest-so-far scan.
The quadratic is sphere.rs:28-57's half-b form with strict surrounds
semantics (interval.rs:31-33), identical to ops/intersect.py.

Differentiability: pallas_call is opaque to AD, so closest_hit_pallas is a
custom_vjp whose backward re-derives t for the winning sphere only with
[R]-sized JAX math (the winner index is piecewise-constant, gradient
flows through t alone) and scatter-adds sphere cotangents with segment_sum.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from distributed_raytracer_tpu.core.vecmath import BIG, T_MIN
from distributed_raytracer_tpu.models.scene import Scene
from distributed_raytracer_tpu.ops.intersect import HitResult

LANE = 128
DEFAULT_BR = 256       # rays per grid step
DEFAULT_CHUNK = 512    # spheres per VMEM sweep slice


def _intersect_kernel(
    ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref,  # [BR, 1]
    cx_ref, cy_ref, cz_ref, c2mr2_ref,               # [1, Np]
    t_out, idx_out,                                   # [BR, 1]
    *, n_pad: int, chunk: int, t_min: float,
):
    ox, oy, oz = ox_ref[:], oy_ref[:], oz_ref[:]
    dx, dy, dz = dx_ref[:], dy_ref[:], dz_ref[:]

    # per-ray scalars, computed once per block (sphere.rs:31-34's a and
    # the o-dependent parts of h and c)
    a = dx * dx + dy * dy + dz * dz            # (BR,1)
    inv_a = 1.0 / a
    d_dot_o = dx * ox + dy * oy + dz * oz      # (BR,1)
    o_norm2 = ox * ox + oy * oy + oz * oz      # (BR,1)

    br = ox.shape[0]
    n_chunks = n_pad // chunk

    def sweep(ci, carry):
        t_best, i_best = carry
        cx = cx_ref[:, pl.ds(ci * chunk, chunk)]      # (1, CHUNK)
        cy = cy_ref[:, pl.ds(ci * chunk, chunk)]
        cz = cz_ref[:, pl.ds(ci * chunk, chunk)]
        c2mr2 = c2mr2_ref[:, pl.ds(ci * chunk, chunk)]

        d_dot_c = dx * cx + dy * cy + dz * cz         # (BR, CHUNK)
        o_dot_c = ox * cx + oy * cy + oz * cz
        h = d_dot_c - d_dot_o
        c_q = c2mr2 - 2.0 * o_dot_c + o_norm2
        disc = h * h - a * c_q
        ok = disc >= 0.0
        sqrtd = jnp.sqrt(jnp.where(ok, disc, 0.0))
        root_near = (h - sqrtd) * inv_a
        root_far = (h + sqrtd) * inv_a
        near_ok = ok & (root_near > t_min) & (root_near < BIG)
        far_ok = ok & (root_far > t_min) & (root_far < BIG)
        t = jnp.where(near_ok, root_near, jnp.where(far_ok, root_far, BIG))

        t_chunk = jnp.min(t, axis=1, keepdims=True)               # (BR,1)
        i_chunk = jnp.argmin(t, axis=1).astype(jnp.int32).reshape(br, 1)
        i_chunk = i_chunk + ci * chunk
        better = t_chunk < t_best
        return jnp.where(better, t_chunk, t_best), jnp.where(better, i_chunk, i_best)

    t0 = jnp.full((br, 1), BIG, jnp.float32)
    i0 = jnp.zeros((br, 1), jnp.int32)
    t_best, i_best = jax.lax.fori_loop(0, n_chunks, sweep, (t0, i0))
    t_out[:] = t_best
    idx_out[:] = i_best


def _pack_scene(scene: Scene):
    n = scene.num_spheres
    assert n % LANE == 0, f"scene must be lane-padded (N={n}); use pad_to/shard_scene"
    c = scene.centers
    c2mr2 = jnp.sum(c * c, axis=-1) - scene.radii * scene.radii
    return (
        c[:, 0].reshape(1, n),
        c[:, 1].reshape(1, n),
        c[:, 2].reshape(1, n),
        c2mr2.reshape(1, n),
    )


@functools.partial(jax.jit, static_argnames=("block_rays", "chunk"))
def _closest_hit_pallas_fwd_impl(
    ray_o: jnp.ndarray,
    ray_d: jnp.ndarray,
    scene: Scene,
    block_rays: int = DEFAULT_BR,
    chunk: int = DEFAULT_CHUNK,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    r = ray_o.shape[0]
    n = scene.num_spheres
    chunk = min(chunk, n)
    assert n % chunk == 0, (n, chunk)
    br = min(block_rays, r)
    pad = (-r) % br
    rp = r + pad

    def col(x):
        return jnp.pad(x, (0, pad)).reshape(rp, 1)

    cols = [col(ray_o[:, i]) for i in range(3)] + [col(ray_d[:, i]) for i in range(3)]
    srows = _pack_scene(scene)

    ray_spec = pl.BlockSpec((br, 1), lambda i: (i, 0), memory_space=pltpu.VMEM)
    scene_spec = pl.BlockSpec((1, n), lambda i: (0, 0), memory_space=pltpu.VMEM)

    t, idx = pl.pallas_call(
        functools.partial(
            _intersect_kernel, n_pad=n, chunk=chunk, t_min=T_MIN
        ),
        grid=(rp // br,),
        in_specs=[ray_spec] * 6 + [scene_spec] * 4,
        out_specs=[
            pl.BlockSpec((br, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((br, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((rp, 1), jnp.float32),
            jax.ShapeDtypeStruct((rp, 1), jnp.int32),
        ],
    )(*cols, *srows)
    return t[:r, 0], idx[:r, 0]


def _winner_t(ray_o, ray_d, centers_w, radii_w):
    """Re-derive the chosen root for the winning sphere with [R]-sized math —
    the differentiable surrogate used by the custom VJP."""
    oc = centers_w - ray_o
    a = jnp.sum(ray_d * ray_d, axis=-1)
    h = jnp.sum(ray_d * oc, axis=-1)
    c = jnp.sum(oc * oc, axis=-1) - radii_w * radii_w
    disc = h * h - a * c
    safe = jnp.where(disc > 0.0, disc, 1.0)
    sqrtd = jnp.where(disc > 0.0, jnp.sqrt(safe), 0.0)
    root_near = (h - sqrtd) / a
    root_far = (h + sqrtd) / a
    near_ok = (disc >= 0.0) & (root_near > T_MIN)
    return jnp.where(near_ok, root_near, root_far)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def closest_hit_pallas(
    ray_o: jnp.ndarray,
    ray_d: jnp.ndarray,
    scene: Scene,
    block_rays: int = DEFAULT_BR,
    chunk: int = DEFAULT_CHUNK,
) -> HitResult:
    """Drop-in closest_hit with the fused Pallas sweep (forward) and an
    analytic winner-only backward."""
    t, idx = _closest_hit_pallas_fwd_impl(ray_o, ray_d, scene, block_rays, chunk)
    return HitResult(t=t, idx=idx, hit=t < BIG * 0.5)


def _fwd(ray_o, ray_d, scene, block_rays, chunk):
    t, idx = _closest_hit_pallas_fwd_impl(ray_o, ray_d, scene, block_rays, chunk)
    hit = t < BIG * 0.5
    return HitResult(t=t, idx=idx, hit=hit), (ray_o, ray_d, scene, idx, hit)


def _bwd(block_rays, chunk, res, cot):
    ray_o, ray_d, scene, idx, hit = res
    dt = jnp.where(hit, cot.t, 0.0)  # idx/hit are integer/bool: no cotangent

    centers_w = scene.centers[idx]
    radii_w = scene.radii[idx]
    f = lambda o, d, c, rr: _winner_t(o, d, c, rr)
    _, vjp = jax.vjp(f, ray_o, ray_d, centers_w, radii_w)
    g_o, g_d, g_cw, g_rw = vjp(dt)

    n = scene.num_spheres
    seg = jnp.where(hit, idx, n)  # route misses to a dropped segment
    g_centers = jax.ops.segment_sum(g_cw, seg, num_segments=n + 1)[:n]
    g_radii = jax.ops.segment_sum(g_rw, seg, num_segments=n + 1)[:n]
    zeros = lambda x: jnp.zeros_like(x)
    g_scene = Scene(
        centers=g_centers,
        radii=g_radii,
        albedo=zeros(scene.albedo),
        mat_type=jnp.zeros_like(scene.mat_type),
        fuzz=zeros(scene.fuzz),
        ior=zeros(scene.ior),
    )
    return g_o, g_d, g_scene


closest_hit_pallas.defvjp(_fwd, _bwd)
