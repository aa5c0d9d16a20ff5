"""Block-culled closest-hit sweep — the TPU-shaped acceleration structure.

A classic BVH traversal (per-ray stack walk, bounding_box.rs's intent) is
hostile to SIMD: every ray takes a different path.  The TPU-native
equivalent keeps the dense VMEM sweep of intersect_kernel.py but makes the
sphere axis HIERARCHICAL:

  1. Host side (build_culled_scene): spheres are Morton-ordered by the
     native cluster builder (native/dray_native.cpp) so each contiguous
     CHUNK of the sphere axis is spatially tight; "huge" spheres (the
     ground sphere) go in a leading always-swept chunk.  Each chunk gets a
     bounding sphere.
  2. Kernel side: before sweeping a chunk, one cheap (1, BR) test asks
     whether ANY ray in the block can hit the chunk's bound CLOSER than its
     current best t (occlusion-aware).  If not, `lax.cond` skips the whole
     chunk — a block-granular version of the reference's front-to-back
     cell traversal (ray_server.rs:56-60 + hittable_list.rs:42-55), with
     the broken AABB slab test (bounding_box.rs:53-56) replaced by an
     exact bounding-sphere test.

Wins scale with scene size and ray-block coherence: at RTiOW's ~500
spheres the dense sweep is already near-optimal.  Two kernel shapes
(docs/DESIGN.md §3 for measured numbers): "grid" — every (ray block,
chunk) pair a Mosaic grid cell, safe on incoherent rays; "walk" — an
in-kernel front-to-back chunk walk (scalar-prefetch visit order + exact
reachability pre-pass + group-of-8 bitmask bound tests + double-buffered
manual DMA) for frustum-coherent ray blocks.  See scripts/walk_probe.py
and scripts/resort_probe.py.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from distributed_raytracer_tpu.core.vecmath import BIG, T_MIN
from distributed_raytracer_tpu.models.scene import Scene
from distributed_raytracer_tpu.ops.intersect import HitResult

LANE = 128
DEFAULT_BR = 512


class CulledScene(NamedTuple):
    """A Scene reordered for the culled sweep + its chunk bounds."""

    scene: Scene           # Morton-ordered, chunk-padded
    bounds_c: jnp.ndarray  # [n_chunks, 3] chunk bound centers
    bounds_r2: jnp.ndarray  # [n_chunks] chunk bound radius^2 (inf => always sweep)
    chunk: int             # spheres per chunk (static)
    order: np.ndarray = None  # [n_slots] i64 ORIGINAL sphere index per
    # reordered slot, -1 for padding slots (maps gradients/winner ids of
    # the reordered scene back to the caller's sphere numbering)


def build_culled_scene(
    scene: Scene, chunk: int = LANE, big_threshold: float = 50.0
) -> CulledScene:
    """Reorder a scene for block culling.

    Spheres with radius >= big_threshold (or covering a large fraction of
    the scene, e.g. the RTiOW ground sphere) go into leading always-swept
    chunks; the rest are Morton-ordered via the native cluster builder and
    padded to a chunk multiple."""
    from distributed_raytracer_tpu import native

    centers = np.asarray(scene.centers)
    radii = np.asarray(scene.radii)
    real = radii > 0
    big = real & (radii >= big_threshold)
    small = real & ~big

    small_idx = np.where(small)[0]
    if len(small_idx):
        order_local, bounds = native.build_clusters(
            centers[small_idx], radii[small_idx], chunk
        )
        small_sorted = small_idx[order_local]
    else:
        small_sorted = small_idx
        bounds = np.zeros((0, 4), np.float32)

    big_idx = np.where(big)[0]
    n_big_chunks = -(-len(big_idx) // chunk) if len(big_idx) else 0
    n_small_chunks = -(-len(small_sorted) // chunk) if len(small_sorted) else 0
    n_chunks = max(n_big_chunks + n_small_chunks, 1)

    def pad_ids(ids, n_chunks_for):
        want = n_chunks_for * chunk
        return np.concatenate([ids, np.full(want - len(ids), -1, np.int64)])

    order = np.concatenate(
        [pad_ids(big_idx, n_big_chunks), pad_ids(small_sorted, max(n_small_chunks, 1 - n_big_chunks))]
    )

    take = lambda arr, fill: jnp.asarray(
        np.where(
            (order >= 0)[(...,) + (None,) * (np.asarray(arr).ndim - 1)],
            np.asarray(arr)[np.clip(order, 0, len(radii) - 1)],
            fill,
        )
    )
    reordered = Scene(
        centers=take(scene.centers, 0.0),
        radii=take(scene.radii, 0.0),
        albedo=take(scene.albedo, 0.0),
        mat_type=jnp.asarray(
            np.where(order >= 0, np.asarray(scene.mat_type)[np.clip(order, 0, len(radii) - 1)], 3)
        ).astype(jnp.int32),
        fuzz=take(scene.fuzz, 0.0),
        ior=take(scene.ior, 1.0),
    )

    bc = np.zeros((n_chunks, 3), np.float32)
    br2 = np.full((n_chunks,), np.float32(np.inf))
    for c in range(n_small_chunks):
        if c < len(bounds):
            bc[n_big_chunks + c] = bounds[c, :3]
            br2[n_big_chunks + c] = bounds[c, 3] ** 2
    # big chunks keep inf radius -> always swept
    return CulledScene(
        scene=reordered,
        bounds_c=jnp.asarray(bc),
        bounds_r2=jnp.asarray(br2),
        chunk=chunk,
        order=order,
    )


def _culled_kernel(
    order_ref,                                         # [n_blocks, C] SMEM (prefetch)
    ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref,   # [1, BR]
    cx_ref, cy_ref, cz_ref, r2_ref,                    # [CHUNK, 1] sphere block
    bx_ref, by_ref, bz_ref, br2_ref,                   # [C, 1] chunk bounds
    t_out, idx_out,                                     # [1, BR], revisited
    *stats_out,                                         # optional [1, BR] sweep count
    chunk: int, t_min: float,
):
    """2D grid (ray blocks, grid position), position fastest.  The chunk
    actually visited at position j is order_ref[i, j] — a per-ray-block
    FRONT-TO-BACK permutation (nearest chunks first, computed on device
    from the block's mean ray), so t_best tightens early and the
    occlusion-aware bound test (nearb < t_best) kills the far chunks.
    This is the reference's front-to-back cell traversal with early
    termination (ray_server.rs:56-60 + hittable_list.rs:42-55) in
    block-SIMD form; Pallas still pipelines the (data-dependent) sphere
    chunk DMAs via the scalar-prefetch index map."""
    i = pl.program_id(0)
    ci = pl.program_id(1)
    chunk_id = order_ref[i, ci]

    @pl.when(ci == 0)
    def _init():
        t_out[:] = jnp.full_like(t_out, BIG)
        idx_out[:] = jnp.zeros_like(idx_out)
        for s in stats_out:
            s[:] = jnp.zeros_like(s)

    ox, oy, oz = ox_ref[:], oy_ref[:], oz_ref[:]
    dx, dy, dz = dx_ref[:], dy_ref[:], dz_ref[:]
    a = dx * dx + dy * dy + dz * dz
    inv_a = 1.0 / a
    t_best = t_out[:]

    # chunk bounding-sphere test: can ANY ray hit the bound closer than its
    # current best?
    bx = bx_ref[chunk_id, 0]
    by = by_ref[chunk_id, 0]
    bz = bz_ref[chunk_id, 0]
    br2v = br2_ref[chunk_id, 0]
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
    any_hit = jnp.any(possible) | ~jnp.isfinite(br2v)  # inf bound: always

    @pl.when(any_hit)
    def _sweep():
        for s in stats_out:
            s[:] = s[:] + 1
        cx, cy, cz, r2 = cx_ref[:], cy_ref[:], cz_ref[:], r2_ref[:]
        ocx = cx - ox
        ocy = cy - oy
        ocz = cz - oz
        h = dx * ocx + dy * ocy + dz * ocz
        c_q = ocx * ocx + ocy * ocy + ocz * ocz - r2
        disc = h * h - a * c_q
        ok = disc >= 0.0
        sqrtd = jnp.sqrt(jnp.where(ok, disc, 0.0))
        root_near = (h - sqrtd) * inv_a
        root_far = (h + sqrtd) * inv_a
        near_ok = ok & (root_near > t_min)
        far_ok = ok & (root_far > t_min)
        t = jnp.where(near_ok, root_near, jnp.where(far_ok, root_far, BIG))
        t_chunk = jnp.min(t, axis=0, keepdims=True)
        i_chunk = jnp.argmin(t, axis=0).astype(jnp.int32)[None, :] + chunk_id * chunk
        better = t_chunk < t_best
        t_out[:] = jnp.where(better, t_chunk, t_best)
        idx_out[:] = jnp.where(better, i_chunk, idx_out[:])


def _block_visit_plan(ray_o, ray_d, bounds_c, bounds_r2, n_blocks, br):
    """Per-ray-block chunk visit plan: (order [n_blocks, C], n_visit [n_blocks]).

    order is a front-to-back permutation (sort key = distance along the
    block's mean ray to each chunk's bound center; always-swept inf-bound
    chunks, e.g. the ground sphere, go FIRST so t_best tightens
    immediately), with one refinement over a plain sort: chunks that NO ray
    in the block can geometrically reach — the t-independent part of the
    kernel's bound test, evaluated exactly per ray here — are pushed to the
    END, and n_visit counts only the reachable prefix.  The walk kernel
    loops `n_visit[i]` times instead of n_chunks, so an unreachable chunk
    costs nothing at all (the 2D-grid kernel ignores n_visit; its grid is
    static).  The reach test uses a slightly inflated bound radius so host
    rounding (matmul-form expansion here vs oc-form in the kernel) can only
    err toward visiting, never toward skipping — bit-correctness of the
    result is unconditional."""
    r = ray_o.shape[0]
    pad = n_blocks * br - r
    ob = jnp.pad(ray_o, ((0, pad), (0, 0))).reshape(n_blocks, br, 3)
    db = jnp.pad(ray_d, ((0, pad), (0, 0))).reshape(n_blocks, br, 3)
    o_mean = jnp.mean(ob, axis=1)                              # [B, 3]
    d_mean = jnp.mean(db, axis=1)
    d_mean = d_mean / (jnp.linalg.norm(d_mean, axis=-1, keepdims=True) + 1e-12)
    rel = bounds_c[None, :, :] - o_mean[:, None, :]            # [B, C, 3]
    proj = jnp.einsum("bcx,bx->bc", rel, d_mean)
    dist = jnp.maximum(proj, 0.0)

    # exact reachability, rays x chunks, via the expanded quadratic so the
    # [B, br, C] terms come from two MXU matmuls (no [B, br, C, 3] tensor).
    # farb > t_min is compared in the a-scaled form (hb + sq > t_min * a)
    # to stay NaN-free on zero-padded ray rows (a == 0 gates them off).
    hi = jax.lax.Precision.HIGHEST
    r2_pad = jnp.where(
        jnp.isfinite(bounds_r2), bounds_r2 * (1.0 + 1e-4) + 1e-5, bounds_r2
    )
    a = jnp.sum(db * db, axis=-1)                              # [B, br]
    db_bc = jnp.einsum("brx,cx->brc", db, bounds_c, precision=hi)
    ob_bc = jnp.einsum("brx,cx->brc", ob, bounds_c, precision=hi)
    hb = db_bc - jnp.sum(db * ob, axis=-1)[..., None]          # [B, br, C]
    cb = (
        jnp.sum(bounds_c * bounds_c, axis=-1)[None, None]
        - 2.0 * ob_bc
        + jnp.sum(ob * ob, axis=-1)[..., None]
        - r2_pad[None, None]
    )
    disc = hb * hb - a[..., None] * cb
    ok = disc >= 0.0
    far = hb + jnp.sqrt(jnp.where(ok, disc, 0.0))              # = farb * a
    reach = jnp.any(
        ok & (far > T_MIN * a[..., None]) & (a[..., None] > 0.0), axis=1
    )                                                          # [B, C]
    always = ~jnp.isfinite(bounds_r2)[None, :]
    reach = reach | always
    key = jnp.where(always, -1.0, jnp.where(reach, dist, jnp.inf))
    order = jnp.argsort(key, axis=1).astype(jnp.int32)
    n_visit = jnp.sum(reach, axis=1).astype(jnp.int32)
    return order, n_visit


@functools.partial(jax.jit, static_argnames=("chunk", "block_rays", "stats"))
def _culled_fwd(
    ray_o, ray_d, scene: Scene, bounds_c, bounds_r2, chunk: int,
    block_rays: int = DEFAULT_BR, stats: bool = False,
) -> Tuple[jnp.ndarray, ...]:
    r = ray_o.shape[0]
    n = scene.num_spheres
    assert n % chunk == 0, (n, chunk)
    n_chunks = n // chunk
    br = min(block_rays, max(LANE, -(-r // LANE) * LANE))
    pad = (-r) % br
    rp = r + pad
    n_blocks = rp // br

    def row(x):
        return jnp.pad(x, (0, pad)).reshape(1, rp)

    rows = [row(ray_o[:, i]) for i in range(3)] + [row(ray_d[:, i]) for i in range(3)]
    c = scene.centers
    r2 = jnp.where(scene.radii > 0.0, scene.radii * scene.radii, -1.0)
    srows = [
        c[:, 0].reshape(n, 1), c[:, 1].reshape(n, 1), c[:, 2].reshape(n, 1),
        r2.reshape(n, 1),
    ]
    brows = [
        bounds_c[:, 0].reshape(n_chunks, 1),
        bounds_c[:, 1].reshape(n_chunks, 1),
        bounds_c[:, 2].reshape(n_chunks, 1),
        bounds_r2.reshape(n_chunks, 1),
    ]
    order, _ = _block_visit_plan(ray_o, ray_d, bounds_c, bounds_r2, n_blocks, br)

    # index maps take the scalar-prefetch ref: the sphere chunk streamed at
    # grid position (i, j) is the j-th NEAREST chunk for ray block i
    ray_spec = pl.BlockSpec((1, br), lambda i, j, ord_: (0, i), memory_space=pltpu.VMEM)
    scene_spec = pl.BlockSpec(
        (chunk, 1), lambda i, j, ord_: (ord_[i, j], 0), memory_space=pltpu.VMEM
    )
    bound_spec = pl.BlockSpec(
        (n_chunks, 1), lambda i, j, ord_: (0, 0), memory_space=pltpu.VMEM
    )
    out_spec = pl.BlockSpec((1, br), lambda i, j, ord_: (0, i), memory_space=pltpu.VMEM)

    n_out = 3 if stats else 2
    outs = pl.pallas_call(
        functools.partial(_culled_kernel, chunk=chunk, t_min=T_MIN),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(n_blocks, n_chunks),
            in_specs=[ray_spec] * 6 + [scene_spec] * 4 + [bound_spec] * 4,
            out_specs=[out_spec] * n_out,
        ),
        out_shape=[
            jax.ShapeDtypeStruct((1, rp), jnp.float32),
            jax.ShapeDtypeStruct((1, rp), jnp.int32),
        ] + ([jax.ShapeDtypeStruct((1, rp), jnp.int32)] if stats else []),
    )(order, *rows, *srows, *brows)
    if stats:
        t, idx, nsweep = outs
        # one count per ray block (every lane carries the same value)
        return t[0, :r], idx[0, :r], nsweep[0, ::br]
    t, idx = outs
    return t[0, :r], idx[0, :r]


GROUP = 8  # chunk bound tests batched per vectorized [GROUP, BR] evaluation


def visit_sorted_bounds(order, bounds_c, bounds_r2):
    """[n_blocks, c_pad, LANE] bounds packed in each block's VISIT order
    (lanes 0..3 = bx by bz r2, rest zero), padded with guaranteed-miss rows
    (r2 = -1) so the walk kernels' group-of-GROUP flag slices never run off
    the end.  The packed layout satisfies the (8, 128)-tile block
    constraint that a [c_pad, 1]-blocked layout violates on hardware.
    Shared by _culled_walk_fwd and the culled fused bounce kernel."""
    n_blocks, n_chunks = order.shape
    c_pad = (-(-n_chunks // GROUP) + 1) * GROUP
    sorted_bc = jnp.take_along_axis(
        jnp.broadcast_to(bounds_c[None], (n_blocks, n_chunks, 3)),
        order[:, :, None], axis=1,
    )                                                   # [B, C, 3]
    sorted_r2 = jnp.take_along_axis(
        jnp.broadcast_to(bounds_r2[None], (n_blocks, n_chunks)), order, axis=1
    )                                                   # [B, C]
    bounds_pack = jnp.stack(
        [sorted_bc[:, :, 0], sorted_bc[:, :, 1], sorted_bc[:, :, 2], sorted_r2],
        axis=-1,
    )                                                   # [B, C, 4]
    bounds_pack = jnp.pad(
        bounds_pack,
        ((0, 0), (0, c_pad - n_chunks), (0, LANE - 4)),
        constant_values=0.0,
    )
    # padded positions: guaranteed-miss bound (r^2 = -1); the pad above
    # already zeroed everything else
    return bounds_pack.at[:, n_chunks:, 3].set(-1.0)


def _walk_kernel(
    order_ref,                                        # [n_blocks, C] SMEM (prefetch)
    nvis_ref,                                         # [n_blocks] SMEM (prefetch)
    ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref,  # [1, BR] VMEM
    bsort_ref,                                        # [1, C_pad, LANE] VMEM: VISIT-SORTED bounds, lanes 0..3 = bx by bz r2
    scene_ref,                                        # [N, 4] HBM (cx cy cz r2)
    t_out, idx_out,                                   # [1, BR] VMEM
    buf, sem,                                         # scratch: [2, chunk, LANE] VMEM, DMA((2,))
    *, chunk: int, n_chunks: int, t_min: float,
):
    """In-kernel front-to-back chunk WALK: grid = (ray blocks,) only.

    The 2D-grid culled kernel pays Mosaic's per-grid-cell orchestration
    for every (block, chunk) pair whether or not the chunk is swept — at
    8k spheres that fixed cost is ~2/3 of runtime, capping any possible
    culling win at ~1.4x (measured; scripts/culled_probe.py).  Here the
    chunk loop runs INSIDE the kernel: per ray block, walk chunks in the
    prefetched front-to-back order, test the chunk bound against the
    block's current best-t, and only when some ray can still hit it DMA
    the 2 KB sphere chunk from HBM (double-buffered: chunk j+1's copy is
    started, gated on ITS bound test, before chunk j is swept) and sweep.

    Cost shape (v3): bound tests run GROUP=8 chunks at a time as ONE
    vectorized [8, BR] evaluation — a [1, BR] row uses 1/8 of every vreg's
    sublanes, so batching 8 tests costs the same vector work as one, and
    the (slow) cross-lane any-reduction happens once per group instead of
    once per chunk.  The 8 flags are packed into ONE scalar bitmask
    (vector->scalar reduce) carried through the loop — scalar bit tests
    gate the DMAs; VMEM-scratch flags + per-position scalar reads abort
    the TPU runtime when mixed with in-kernel DMA, and SMEM cannot be
    written from vector code.  Each group's bitmask is computed one group
    AHEAD of its first possible use (the j+1 DMA prefetch), using the
    then-current t_best — slightly stale, therefore conservative (t_best
    only shrinks), so correctness is unconditional.  Chunks NO ray can
    reach at all (host-side exact reachability pre-pass,
    _block_visit_plan) are excluded from the trip count entirely.  This
    is the reference's front-to-back traversal with early termination
    (ray_server.rs:56-60, hittable_list.rs:42-55) as one persistent
    kernel per ray block."""
    i = pl.program_id(0)
    n_vis = nvis_ref[i]
    ox, oy, oz = ox_ref[:], oy_ref[:], oz_ref[:]
    dx, dy, dz = dx_ref[:], dy_ref[:], dz_ref[:]
    a = dx * dx + dy * dy + dz * dz
    inv_a = 1.0 / a

    # iota must span lanes on Mosaic; build [G, LANE] then slice
    pos_idx = jax.lax.broadcasted_iota(jnp.int32, (GROUP, LANE), 0)[:, 0:1]
    weights = jnp.left_shift(jnp.int32(1), pos_idx)

    def flag_bits(base):
        # batched bound test for visit positions base..base+GROUP-1: can
        # ANY ray in the block hit bound j closer than its current best t?
        # Bounds arrive visit-sorted per block, so this is a contiguous
        # sublane slice.  inf-radius bounds (always-swept chunks) give
        # disc = +inf -> possible on every live lane; zero-padded ray
        # lanes give NaN -> compare false, contributing nothing.  Returns
        # a scalar i32 bitmask (bit j = position base+j possible).
        t_best = t_out[:]
        # one dynamic-offset tile load, then static lane slices
        btile = bsort_ref[0, pl.ds(base, GROUP), :]      # [G, LANE]
        bx = btile[:, 0:1]                               # [G, 1]
        by = btile[:, 1:2]
        bz = btile[:, 2:3]
        br2v = btile[:, 3:4]
        obx = bx - ox                                     # [G, BR]
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
            buf.at[slot],
            sem.at[slot],
        ).start()

    t_out[:] = jnp.full_like(t_out, BIG)
    idx_out[:] = jnp.zeros_like(idx_out)

    bits0 = flag_bits(0)
    poss0 = (bits0 & 1) > 0

    @pl.when(poss0)
    def _():
        start_dma(0, order_ref[i, 0])

    n_groups = (n_vis + GROUP - 1) // GROUP

    def group_step(g, carry):
        started, bits_g = carry
        # bitmask for group g+1, one group ahead of any read of it (the
        # j+1 prefetch below reads at most position (g+1)*GROUP during
        # this group's inner loop)
        bits_gp1 = flag_bits((g + 1) * GROUP)

        for jj in range(GROUP):
            pos = g * GROUP + jj
            # clamp: the unrolled tail of the last group can exceed the
            # order table; such positions have flag 0, so chunk_id is unused
            chunk_id = order_ref[i, jnp.minimum(pos, n_chunks - 1)]

            # gate + launch position pos+1's copy before sweeping pos
            # (double buffer); slot = position parity, and two same-parity
            # started DMAs are >= 2 positions apart, so the earlier one
            # has always been waited on before the later one starts
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
                    buf.at[slot],
                    sem.at[slot],
                ).wait()
                cx = buf[slot, :, 0:1]
                cy = buf[slot, :, 1:2]
                cz = buf[slot, :, 2:3]
                r2 = buf[slot, :, 3:4]
                ocx = cx - ox
                ocy = cy - oy
                ocz = cz - oz
                h = dx * ocx + dy * ocy + dz * ocz
                c_q = ocx * ocx + ocy * ocy + ocz * ocz - r2
                disc = h * h - a * c_q
                ok = disc >= 0.0
                sqrtd = jnp.sqrt(jnp.where(ok, disc, 0.0))
                rn = (h - sqrtd) * inv_a
                rf = (h + sqrtd) * inv_a
                t = jnp.where(
                    ok & (rn > t_min), rn, jnp.where(ok & (rf > t_min), rf, BIG)
                )
                t_chunk = jnp.min(t, axis=0, keepdims=True)
                i_chunk = (
                    jnp.argmin(t, axis=0).astype(jnp.int32)[None, :]
                    + chunk_id * chunk
                )
                t_best = t_out[:]
                better = t_chunk < t_best
                t_out[:] = jnp.where(better, t_chunk, t_best)
                idx_out[:] = jnp.where(better, i_chunk, idx_out[:])

            started = start_next
        return (started, bits_gp1)

    # traced trip count (lowers to a while_loop): only reachable groups
    jax.lax.fori_loop(0, n_groups, group_step, (poss0, bits0))


@functools.partial(jax.jit, static_argnames=("chunk", "block_rays"))
def _culled_walk_fwd(
    ray_o, ray_d, scene: Scene, bounds_c, bounds_r2, chunk: int,
    block_rays: int = DEFAULT_BR,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    r = ray_o.shape[0]
    n = scene.num_spheres
    assert n % chunk == 0, (n, chunk)
    n_chunks = n // chunk
    br = min(block_rays, max(LANE, -(-r // LANE) * LANE))
    pad = (-r) % br
    rp = r + pad
    n_blocks = rp // br

    def row(x):
        return jnp.pad(x, (0, pad)).reshape(1, rp)

    rows = [row(ray_o[:, i]) for i in range(3)] + [row(ray_d[:, i]) for i in range(3)]
    r2 = jnp.where(scene.radii > 0.0, scene.radii * scene.radii, -1.0)
    scene_pack = jnp.stack(
        [scene.centers[:, 0], scene.centers[:, 1], scene.centers[:, 2], r2],
        axis=-1,
    )  # [N, 4]
    # pad the minor dim to the 128-lane tile: HBM memrefs keep lane tiling
    # and Mosaic rejects 4-lane DMA slices
    scene_pack = jnp.pad(scene_pack, ((0, 0), (0, LANE - 4)))
    order, n_visit = _block_visit_plan(
        ray_o, ray_d, bounds_c, bounds_r2, n_blocks, br
    )
    # bounds VISIT-SORTED per block, [C_pad, n_blocks] (block i = column i),
    # padded with guaranteed-miss rows (r2 = -1) so the kernel's group-of-8
    # flag slices never run off the end
    c_pad = (-(-n_chunks // GROUP) + 1) * GROUP
    sorted_bc = jnp.take_along_axis(
        jnp.broadcast_to(bounds_c[None], (n_blocks, n_chunks, 3)),
        order[:, :, None], axis=1,
    )                                                   # [B, C, 3]
    sorted_r2 = jnp.take_along_axis(
        jnp.broadcast_to(bounds_r2[None], (n_blocks, n_chunks)), order, axis=1
    )                                                   # [B, C]
    # one packed [n_blocks, c_pad, LANE] tensor (lanes 0..3 = bx by bz r2,
    # rest zero): satisfies the (8, 128)-tile block constraint that a
    # [c_pad, 1]-blocked layout violates on hardware
    bounds_pack = jnp.stack(
        [sorted_bc[:, :, 0], sorted_bc[:, :, 1], sorted_bc[:, :, 2], sorted_r2],
        axis=-1,
    )                                                   # [B, C, 4]
    bounds_pack = jnp.pad(
        bounds_pack,
        ((0, 0), (0, c_pad - n_chunks), (0, LANE - 4)),
        constant_values=0.0,
    )
    # padded rows must be guaranteed misses: r2 = -1
    # padded positions: guaranteed-miss bound (r^2 = -1); the pad above
    # already zeroed everything else
    bounds_pack = bounds_pack.at[:, n_chunks:, 3].set(-1.0)

    ray_spec = pl.BlockSpec(
        (1, br), lambda i, ord_, nv_: (0, i), memory_space=pltpu.VMEM
    )
    bound_spec = pl.BlockSpec(
        (1, c_pad, LANE), lambda i, ord_, nv_: (i, 0, 0), memory_space=pltpu.VMEM
    )
    # HBM explicitly: pl.ANY promotes a fitting array to VMEM, where the
    # tiled layout rejects the [chunk, 4] DMA slice (lane dim 4 != 128)
    scene_spec = pl.BlockSpec(memory_space=pltpu.HBM)
    out_spec = pl.BlockSpec(
        (1, br), lambda i, ord_, nv_: (0, i), memory_space=pltpu.VMEM
    )

    t, idx = pl.pallas_call(
        functools.partial(
            _walk_kernel, chunk=chunk, n_chunks=n_chunks, t_min=T_MIN
        ),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(n_blocks,),
            in_specs=[ray_spec] * 6 + [bound_spec] + [scene_spec],
            out_specs=[out_spec, out_spec],
            scratch_shapes=[
                pltpu.VMEM((2, chunk, LANE), jnp.float32),
                pltpu.SemaphoreType.DMA((2,)),
            ],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((1, rp), jnp.float32),
            jax.ShapeDtypeStruct((1, rp), jnp.int32),
        ],
    )(order, n_visit, *rows, bounds_pack, scene_pack)
    return t[0, :r], idx[0, :r]


def make_culled_intersect(
    culled: CulledScene, block_rays: int = DEFAULT_BR, mode: str = "grid"
):
    """intersect_fn for ops/trace: closest hit via the block-culled sweep.

    mode="grid" (default): the 2D-grid variant — every chunk is a grid
    cell, compute skipped under @pl.when.  Mosaic pipelines the cells, so
    the worst case (incoherent rays, nothing skippable) stays ~1x the
    dense sweep; wins are modest (~1.2x) because per-cell orchestration
    is paid regardless.

    mode="walk": in-kernel front-to-back chunk walk with double-buffered
    manual DMA — culled chunks cost only a bound test, giving 1.5x (8k
    spheres) to 1.9x (32k) over the dense sweep **on frustum-coherent ray
    blocks** (tiled pixel order, render/order.py).  On INCOHERENT blocks
    (post-bounce wavefront rays) every chunk is swept and the serialized
    walk loses badly (measured 8x slower) — use it for primary-ray /
    coherent workloads only.  A per-bounce lane re-sort (direction-octant
    keys) would restore coherence for the full path tracer; future work.

    The trace must be run with culled.scene (the reordered scene) so that
    material gathers see the same sphere order.  Differentiation uses the
    same winner-only custom VJP as the dense kernel."""
    from distributed_raytracer_tpu.ops.pallas.intersect_kernel import _bwd as _dense_bwd

    fwd_impl = _culled_walk_fwd if mode == "walk" else _culled_fwd

    @functools.partial(jax.custom_vjp, nondiff_argnums=())
    def intersect(ray_o, ray_d, scene):
        t, idx = fwd_impl(
            ray_o, ray_d, scene, culled.bounds_c, culled.bounds_r2,
            culled.chunk, block_rays,
        )
        return HitResult(t=t, idx=idx, hit=t < BIG * 0.5)

    def fwd(ray_o, ray_d, scene):
        res = intersect(ray_o, ray_d, scene)
        return res, (ray_o, ray_d, scene, res.idx, res.hit)

    def bwd(resid, cot):
        return _dense_bwd(None, None, resid, cot)

    intersect.defvjp(fwd, bwd)
    return intersect
