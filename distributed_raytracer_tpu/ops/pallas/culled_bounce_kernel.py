"""Culled fused bounce: the front-to-back chunk WALK inside the fused
bounce kernel — the production engine and the acceleration structure in
one pallas_call.

The plain fused kernel (bounce_kernel.py) sweeps every sphere chunk of
every ray block: its (ray blocks, chunks) grid streams each chunk's sweep
columns and attribute planes whether or not any ray can hit the chunk —
Pallas BlockSpec DMAs cannot be skipped, so at >= 8k spheres the repo's
own 1.5-1.9x culling win (culled_kernel.py mode="walk") was only reachable
on the slower unfused wavefront path.  This kernel moves the chunk loop
INSIDE the program, exactly like the walk intersect kernel, and shades at
the end:

  grid = (ray blocks,).  Per block: walk chunks in the prefetched
  front-to-back visit order (scalar-prefetch order + exact-reachability
  trip count, culled_kernel._block_visit_plan), test each chunk's bounding
  sphere against the block's current best-t in groups of 8 (one scalar
  bitmask per group), and only when some ray can still hit a chunk DMA its
  sweep columns ([chunk, LANE] f32) AND its attribute planes ([48, chunk]
  bf16) from HBM — double-buffered, one chunk ahead — then run the shared
  sweep + MXU winner select (_sweep_winner).  After the walk: the shared
  in-kernel shading (_shade_vals).  A culled chunk costs one vectorized
  bound test and NO memory traffic.

This is the reference's front-to-back traversal with early termination
(ray_server.rs:56-60 + hittable_list.rs:42-55, bounding_box.rs:50-76 with
its slab bugs fixed as in models/aabb.py) fused into the production
engine.

RNG — ray-identity-keyed, re-sort invariant: the plain fused kernel's
draws come from the on-core PRNG seeded per ray block, so a lane re-sort
(render/wavefront.warp_resort_permutation — needed to keep SECONDARY rays
frustum-coherent for the walk) would shift every ray's noise stream.
Here each of the five shading draws is a counter-mode integer hash of
(iteration seed, GLOBAL RAY ID, draw index) computed in vector code
(_hash_u01): a ray's draws are independent of which lane it sits in, so
re-sorting (or changing the pool size) leaves the rendered image
BIT-IDENTICAL — the re-sort becomes a pure performance knob, pinned by
tests/test_culled_fused.py.  (Bonus: hash draws are plain arithmetic, so
interpret-mode tests see real noise — pltpu.prng_random_bits returns
zeros on CPU.)
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from distributed_raytracer_tpu.core.vecmath import BIG, T_MIN
from distributed_raytracer_tpu.ops.pallas.bounce_kernel import (
    _A_ROWS,
    _shade_vals,
    _sweep_winner,
    BounceOut,
    DEFAULT_BR,
    LANE,
)
from distributed_raytracer_tpu.ops.pallas.culled_kernel import (
    GROUP,
    CulledScene,
    _block_visit_plan,
    visit_sorted_bounds,
)


class CulledPack(NamedTuple):
    """Scene-constant device arrays for the culled fused kernel — build
    ONCE (outside the render while_loop) with build_culled_pack; only the
    per-iteration visit plan depends on the rays."""

    scene_pack: jnp.ndarray  # [N, LANE] f32: lanes 0..3 = cx cy cz r2
    attrs: jnp.ndarray       # [n_chunks*48, chunk] bf16 attr planes, chunk-blocked
    bounds_c: jnp.ndarray    # [n_chunks, 3]
    bounds_r2: jnp.ndarray   # [n_chunks] (inf => always sweep)


def build_culled_pack(culled: CulledScene) -> CulledPack:
    """HBM-resident packs for the walk: sweep columns at [N, LANE] f32
    (lane-tiled so per-chunk DMA slices are legal; walk-kernel layout) and
    the winner-attribute bf16 planes chunk-blocked for [48, chunk] DMA
    tiles (bf16 tiling (16, 128): 48 = 3*16 rows, chunk a LANE multiple)."""
    from distributed_raytracer_tpu.ops.pallas.bounce_kernel import attr_planes

    scene = culled.scene
    n = scene.num_spheres
    chunk = culled.chunk
    assert n % chunk == 0, (n, chunk)
    n_chunks = n // chunk
    r2 = jnp.where(scene.radii > 0.0, scene.radii * scene.radii, -1.0)
    scene_pack = jnp.stack(
        [scene.centers[:, 0], scene.centers[:, 1], scene.centers[:, 2], r2],
        axis=-1,
    )
    scene_pack = jnp.pad(scene_pack, ((0, 0), (0, LANE - 4)))
    planes = attr_planes(scene, n)  # [48, n] bf16, global idx row = reordered idx
    attrs = (
        planes.reshape(3 * _A_ROWS, n_chunks, chunk)
        .transpose(1, 0, 2)
        .reshape(n_chunks * 3 * _A_ROWS, chunk)
    )
    return CulledPack(
        scene_pack=scene_pack,
        attrs=attrs,
        bounds_c=culled.bounds_c,
        bounds_r2=culled.bounds_r2,
    )


def _hash_u01(rid, seed, d):
    """Uniform (0,1) row from a counter-mode integer hash of (seed, ray id,
    draw index) — murmur3-style finalizer in i32 vector ops (multiplies
    wrap; right-shifts are masked non-negative first: Mosaic's i32 >> of
    negative values is not well-defined).  Quality: adjacent counters
    decorrelate through three multiply-xorshift rounds; distribution
    uniformity is asserted statistically in tests (which CAN run in
    interpret mode, unlike prng_random_bits draws)."""
    h = (
        rid * jnp.int32(-1640531527)        # 0x9E3779B9: golden-ratio spread
        + seed
        + jnp.int32(d) * jnp.int32(-1028477387)  # 0xC2B2AE35
    )
    h = h ^ ((h & jnp.int32(0x7FFFFFFF)) >> 16)
    h = h * jnp.int32(-2048144789)          # 0x85EBCA6B
    h = h ^ ((h & jnp.int32(0x7FFFFFFF)) >> 13)
    h = h * jnp.int32(-1028477387)          # 0xC2B2AE35
    h = h ^ ((h & jnp.int32(0x7FFFFFFF)) >> 16)
    u = (h & jnp.int32(0x007FFFFF)).astype(jnp.float32) * (1.0 / 8388608.0)
    return jnp.clip(u, 1e-7, 1.0 - 1e-7)


def _culled_bounce_kernel(
    order_ref,                                        # [n_blocks, C] SMEM (prefetch)
    nvis_ref,                                         # [n_blocks] SMEM (prefetch)
    seed_ref,                                         # [1, 1] SMEM
    ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref,   # [1, BR] VMEM
    act_ref,                                          # [1, BR] i32
    rid_ref,                                          # [1, BR] i32 global ray ids
    bsort_ref,                                        # [1, c_pad, LANE] VMEM visit-sorted bounds
    scene_ref,                                        # [N, LANE] HBM sweep cols
    attrs_ref,                                        # [n_chunks*48, chunk] HBM bf16
    t_out,                                            # [1, BR] f32 (doubles as t carry)
    no_x, no_y, no_z, nd_x, nd_y, nd_z,               # [1, BR] next ray
    at_r, at_g, at_b, co_r, co_g, co_b, fin,          # [1, BR]
    i_out, ru_x, ru_y, ru_z, u_out,                   # [1, BR] idx + draws
    sbuf, ssem, abuf, asem, w_ref,                    # scratch
    *, chunk: int, n_chunks: int, t_min: float,
):
    i = pl.program_id(0)
    n_vis = nvis_ref[i]
    ox, oy, oz = ox_ref[:], oy_ref[:], oz_ref[:]
    dx, dy, dz = dx_ref[:], dy_ref[:], dz_ref[:]
    a = dx * dx + dy * dy + dz * dz
    inv_a = 1.0 / a

    # carries: best-t in t_out, winner attrs in w_ref (defaults: rr/io = 1
    # safe divisors, mt = ABSORB, rest 0 — matches _bounce_kernel._init)
    from distributed_raytracer_tpu.models.scene import ABSORB
    from distributed_raytracer_tpu.ops.pallas.bounce_kernel import (
        _A_IO,
        _A_MT,
        _A_RR,
    )

    t_out[:] = jnp.full_like(t_out, BIG)
    rows = jax.lax.broadcasted_iota(jnp.int32, w_ref.shape, 0)
    w_ref[:] = jnp.where(
        (rows == _A_RR) | (rows == _A_IO),
        1.0,
        jnp.where(rows == _A_MT, float(ABSORB), 0.0),
    )

    # iota must span lanes on Mosaic; build [G, LANE] then slice
    pos_idx = jax.lax.broadcasted_iota(jnp.int32, (GROUP, LANE), 0)[:, 0:1]
    weights = jnp.left_shift(jnp.int32(1), pos_idx)

    def flag_bits(base):
        # batched occlusion-aware bound test for visit positions
        # base..base+GROUP-1 (culled_kernel._walk_kernel's shape): scalar
        # i32 bitmask, bit j = some ray might hit bound base+j closer than
        # its current best t.  Conservative under the staleness of t_out
        # (it only shrinks), so correctness is unconditional.
        t_best = t_out[:]
        btile = bsort_ref[0, pl.ds(base, GROUP), :]      # [G, LANE]
        bx = btile[:, 0:1]
        by = btile[:, 1:2]
        bz = btile[:, 2:3]
        br2v = btile[:, 3:4]
        obx = bx - ox
        oby = by - oy
        obz = bz - oz
        hb = dx * obx + dy * oby + dz * obz
        cb = obx * obx + oby * oby + obz * obz - br2v
        discb = hb * hb - a * cb
        okb = discb >= 0.0
        sq = jnp.sqrt(jnp.where(okb, discb, 0.0))
        nearb = (hb - sq) * inv_a
        farb = (hb + sq) * inv_a
        possible = okb & (farb > t_min) & (nearb < t_best)
        valid = (base + pos_idx) < n_vis
        flag = jnp.any(possible, axis=1, keepdims=True) & valid
        return jnp.sum(jnp.where(flag, weights, 0))

    def start_dma(slot, chunk_id):
        pltpu.make_async_copy(
            scene_ref.at[pl.ds(chunk_id * chunk, chunk), :],
            sbuf.at[slot],
            ssem.at[slot],
        ).start()
        pltpu.make_async_copy(
            attrs_ref.at[pl.ds(chunk_id * (3 * _A_ROWS), 3 * _A_ROWS), :],
            abuf.at[slot],
            asem.at[slot],
        ).start()

    bits0 = flag_bits(0)
    poss0 = (bits0 & 1) > 0

    @pl.when(poss0)
    def _():
        start_dma(0, order_ref[i, 0])

    n_groups = (n_vis + GROUP - 1) // GROUP

    def group_step(g, carry):
        started, bits_g = carry
        bits_gp1 = flag_bits((g + 1) * GROUP)

        for jj in range(GROUP):
            pos = g * GROUP + jj
            chunk_id = order_ref[i, jnp.minimum(pos, n_chunks - 1)]
            nxt = order_ref[i, jnp.minimum(pos + 1, n_chunks - 1)]
            nb = (bits_g >> (jj + 1)) if jj < GROUP - 1 else bits_gp1
            start_next = (nb & 1) > 0

            @pl.when(start_next)
            def _():
                start_dma((pos + 1) % 2, nxt)

            @pl.when(started)
            def _():
                slot = pos % 2
                pltpu.make_async_copy(
                    scene_ref.at[pl.ds(chunk_id * chunk, chunk), :],
                    sbuf.at[slot],
                    ssem.at[slot],
                ).wait()
                pltpu.make_async_copy(
                    attrs_ref.at[
                        pl.ds(chunk_id * (3 * _A_ROWS), 3 * _A_ROWS), :
                    ],
                    abuf.at[slot],
                    asem.at[slot],
                ).wait()
                t_c, wa = _sweep_winner(
                    ox, oy, oz, dx, dy, dz, a, inv_a,
                    sbuf[slot, :, 0:1], sbuf[slot, :, 1:2],
                    sbuf[slot, :, 2:3], sbuf[slot, :, 3:4],
                    abuf[slot],
                )
                t_best = t_out[:]
                better = t_c < t_best
                w_ref[:] = jnp.where(better, wa, w_ref[:])
                t_out[:] = jnp.where(better, t_c, t_best)

            started = start_next
        return (started, bits_gp1)

    jax.lax.fori_loop(0, n_groups, group_step, (poss0, bits0))

    # ---- shade with ray-identity-keyed draws (re-sort invariant) ----
    seed = seed_ref[0, 0]
    rid = rid_ref[:]
    draws = tuple(_hash_u01(rid, seed, d) for d in range(5))
    (nox, noy, noz, ndx, ndy, ndz, atr, atg, atb,
     cor, cog, cob, fin_row, idx_row, rux, ruy, ruz, u_choice) = _shade_vals(
        ox, oy, oz, dx, dy, dz, a, act_ref[:] > 0, t_out[:], w_ref[:],
        draws=draws,
    )
    i_out[:] = idx_row
    co_r[:] = cor
    co_g[:] = cog
    co_b[:] = cob
    no_x[:] = nox
    no_y[:] = noy
    no_z[:] = noz
    nd_x[:] = ndx
    nd_y[:] = ndy
    nd_z[:] = ndz
    at_r[:] = atr
    at_g[:] = atg
    at_b[:] = atb
    fin[:] = fin_row
    ru_x[:] = rux
    ru_y[:] = ruy
    ru_z[:] = ruz
    u_out[:] = u_choice


@functools.partial(jax.jit, static_argnames=("chunk", "block_rays"))
def _culled_fused_bounce_impl(
    ray_o, ray_d, active, ray_id,
    scene_pack, attrs, bounds_c, bounds_r2, seed,
    chunk: int, block_rays: int = DEFAULT_BR,
) -> BounceOut:
    r = ray_o.shape[0]
    n = scene_pack.shape[0]
    assert n % chunk == 0, (n, chunk)
    n_chunks = n // chunk
    br = min(block_rays, max(LANE, -(-r // LANE) * LANE))
    pad = (-r) % br
    rp = r + pad
    n_blocks = rp // br

    def row(x, dtype=jnp.float32):
        return jnp.pad(x.astype(dtype), (0, pad)).reshape(1, rp)

    rows = [row(ray_o[:, i]) for i in range(3)] + [row(ray_d[:, i]) for i in range(3)]
    act_row = row(active, jnp.int32)
    rid_row = row(ray_id, jnp.int32)

    order, n_visit = _block_visit_plan(
        ray_o, ray_d, bounds_c, bounds_r2, n_blocks, br
    )
    bounds_pack = visit_sorted_bounds(order, bounds_c, bounds_r2)
    c_pad = bounds_pack.shape[1]

    ray_spec = pl.BlockSpec(
        (1, br), lambda i, ord_, nv_: (0, i), memory_space=pltpu.VMEM
    )
    seed_spec = pl.BlockSpec(
        (1, 1), lambda i, ord_, nv_: (0, 0), memory_space=pltpu.SMEM
    )
    bound_spec = pl.BlockSpec(
        (1, c_pad, LANE), lambda i, ord_, nv_: (i, 0, 0), memory_space=pltpu.VMEM
    )
    hbm_spec = pl.BlockSpec(memory_space=pltpu.HBM)
    out_spec = pl.BlockSpec(
        (1, br), lambda i, ord_, nv_: (0, i), memory_space=pltpu.VMEM
    )
    f32 = jnp.float32
    i32 = jnp.int32
    out_shapes = (
        [jax.ShapeDtypeStruct((1, rp), f32)]            # t
        + [jax.ShapeDtypeStruct((1, rp), f32)] * 12     # next o/d, atten, color
        + [jax.ShapeDtypeStruct((1, rp), i32)]          # finished
        + [jax.ShapeDtypeStruct((1, rp), i32)]          # winner idx
        + [jax.ShapeDtypeStruct((1, rp), f32)] * 4      # draws (ruv, u)
    )

    outs = pl.pallas_call(
        functools.partial(
            _culled_bounce_kernel, chunk=chunk, n_chunks=n_chunks, t_min=T_MIN
        ),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(n_blocks,),
            in_specs=[seed_spec] + [ray_spec] * 8 + [bound_spec]
            + [hbm_spec, hbm_spec],
            out_specs=[out_spec] * 19,
            scratch_shapes=[
                pltpu.VMEM((2, chunk, LANE), jnp.float32),
                pltpu.SemaphoreType.DMA((2,)),
                pltpu.VMEM((2, 3 * _A_ROWS, chunk), jnp.bfloat16),
                pltpu.SemaphoreType.DMA((2,)),
                pltpu.VMEM((_A_ROWS, br), jnp.float32),
            ],
        ),
        out_shape=out_shapes,
    )(
        order, n_visit,
        jnp.asarray(seed, jnp.int32).reshape(1, 1),
        *rows, act_row, rid_row, bounds_pack, scene_pack, attrs,
    )

    (t_row, nox, noy, noz, ndx, ndy, ndz,
     atr, atg, atb, cor, cog, cob, finished,
     idx_row, rux, ruy, ruz, u_row) = outs

    stack3 = lambda x, y, z: jnp.stack(
        [x[0, :r], y[0, :r], z[0, :r]], axis=-1
    )
    return BounceOut(
        new_o=stack3(nox, noy, noz),
        new_d=stack3(ndx, ndy, ndz),
        atten=stack3(atr, atg, atb),
        color=stack3(cor, cog, cob),
        finished=finished[0, :r],
        idx=idx_row[0, :r],
        hit=t_row[0, :r] < BIG * 0.5,
        ruv=stack3(rux, ruy, ruz),
        u=u_row[0, :r],
    )


def culled_fused_bounce(
    ray_o: jnp.ndarray,
    ray_d: jnp.ndarray,
    active: jnp.ndarray,
    ray_id: jnp.ndarray,
    pack: CulledPack,
    chunk: int,
    seed: jnp.ndarray,
    block_rays: int = DEFAULT_BR,
) -> BounceOut:
    """One culled fused bounce.  active: [R] bool.  ray_id: [R] i32 GLOBAL
    ray ids (lane_ray in the wavefront loop) — the RNG key, so lane
    permutations don't change any ray's draws.  pack: build_culled_pack
    output (scene constants; hoist outside the render loop).  chunk: the
    CulledScene's chunk size (static)."""
    return _culled_fused_bounce_impl(
        ray_o, ray_d, active, ray_id,
        pack.scene_pack, pack.attrs, pack.bounds_c, pack.bounds_r2, seed,
        chunk=chunk, block_rays=block_rays,
    )
