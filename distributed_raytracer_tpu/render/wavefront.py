"""Wavefront (persistent ray-pool) renderer.

The masked-scan tracer (ops/trace.py) pays for max_depth bounces on every
ray even though most paths terminate after 2-5 bounces — at the reference
workload's depth 50 (main.rs:59) that is ~10-20x wasted work in dead lanes.

This renderer keeps a fixed pool of B lanes ~100% full of LIVE rays:
each iteration (one `lax.while_loop` step, all static shapes):

  1. REFILL — free lanes take the next (pixel, sample) rays from the
     global ray stream (rank free lanes with a cumsum, cap by remaining).
     This is the TPU-native form of the reference's ray-server work queue:
     the orchestrator streaming rays into a server's mpsc channel
     (orchestrator_server.rs:59-68 -> ray_server.rs:145-147), except the
     "queue" is index arithmetic on a counter.
  2. BOUNCE — one masked bounce_step for the whole pool (the CheckHit
     round, camera.rs:118-144).
  3. DRAIN — lanes that finished this bounce store their color into a
     per-ray buffer keyed by global ray index (the SendPixel return path,
     ray_server.rs:93-103, as a unique-index scatter-set — measured ~100x
     cheaper on TPU than a duplicate-index scatter-add into the image);
     depth-exhausted lanes contribute black (camera.rs:120-123) and free
     up.  The per-pixel image is one reshape+sum at pass end.

Total work ~= total_rays * avg_path_length / pool_utilization, instead of
total_rays * max_depth.  Forward-only (while_loop): the production render
path.  Gradients use the fixed-depth scan.

RNG: draws are keyed per pool-iteration and consumed per lane, so every
(pixel, sample) gets independent jitter/scatter noise; renders are
reproducible for a fixed (seed, pool size, image size), but the noise
stream differs from the scan renderer's (both are valid MC estimators of
the same integral — verified statistically in tests).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from distributed_raytracer_tpu.models.scene import Scene
from distributed_raytracer_tpu.ops.camera import Camera, generate_rays
from distributed_raytracer_tpu.ops.intersect import closest_hit
from distributed_raytracer_tpu.ops.trace import RayState, bounce_step

# Round-2 hardware sweep at the config-4 workload (bench.py comment): pool
# 16384 beats 131072/65536/32768/8192/4096 — per-slot refill+drain overhead
# scales with pool x iterations while 16k stays fully occupied.
DEFAULT_POOL = 16384

# pos-gather drain contrib-buffer budget (bytes); beyond it the fused
# renderer falls back to planar scatters (~3x slower at scale)
POSDRAIN_HBM_CAP = 2_500_000_000


def pos_drain_fits(total: int, max_depth: int, pool: int,
                   k_sub: int = 2) -> bool:
    """Whether the fused renderer's pos-drain contrib buffer for `total`
    rays fits POSDRAIN_HBM_CAP — the ONE predicate shared by the renderer
    and the progressive sub-chunker (they must agree, or a sample batch
    silently lands on the planar-scatter fallback)."""
    b = min(pool, total)
    return fused_drain_rows(total, max_depth, b, k_sub) * b * 12 <= POSDRAIN_HBM_CAP


def fused_drain_rows(total: int, max_depth: int, b: int, k_sub: int = 2) -> int:
    """Worst-case pool-iteration rows for the fused renderer's pos-drain
    buffer.  Slack 2k: a packed boundary block + a ceil(max_depth/k)-block
    drain tail can need up to base + max_depth + 2k - 1 rows (k+2 was only
    safe for k <= 3 — review finding)."""
    return -(-total * (max_depth + k_sub - 1) // b) + max_depth + 2 * k_sub + 2


def render_wavefront_sum(
    scene: Scene,
    camera: Camera,
    key: jax.Array,
    spp: int,
    pool_size: int = DEFAULT_POOL,
    intersect_fn=closest_hit,
    pixel_perm=None,
    resort_every: int = 0,
    refill_every: int = 1,
) -> jnp.ndarray:
    """Color SUM image [num_pixels, 3] for spp samples per pixel.

    pixel_perm: optional [n_pix] i32 permutation of the ray STREAM's pixel
    order (stream position k renders pixel pixel_perm[k % n_pix]) — tile
    permutations (render/order.py) make in-flight ray blocks frustum-
    coherent, which the block-culled intersect kernels need to skip work.
    The returned sums are in PIXEL order either way.

    refill_every: bounces per refill block (see render_wavefront_sum_fused;
    measured a net win at k=2 on the fused path).  Default 1 here — culled
    workloads prefer per-bounce refill so fresh coherent stream rays enter
    as soon as lanes free up.  resort_every fires once per block whose
    window crosses a multiple.

    resort_every: if > 0, every K-th pool iteration re-sorts the lanes by a
    (origin Morton cell, direction octant) key — the TPU-native analogue of
    GPU wavefront ray re-sorting.  Primary rays enter coherent (tiled
    pixel_perm) but scattering destroys block locality within a few
    bounces; the re-sort restores it so the block-culled kernels keep
    skipping chunks on SECONDARY rays too.  Inactive lanes sink to the
    pool tail, so the subsequent refill writes fresh stream rays
    contiguously (they stay coherent for free).  The permutation moves
    whole lanes (ray id, depth, rng draw position move together), so the
    estimator is unchanged; only the noise stream shifts (same class of
    difference as choosing a different pool size)."""
    n_pix = camera.num_pixels
    w = camera.image_width
    total = n_pix * spp
    b = min(pool_size, total)
    max_depth = camera.max_depth

    if resort_every:
        # static scene bounding box for the Morton cell quantization;
        # the key/argsort itself is warp_resort_permutation (one
        # implementation for production, probes, and tests)
        real = scene.radii > 0.0
        safe_c = jnp.where(real[:, None], scene.centers, 0.0)
        safe_r = jnp.where(real, scene.radii, 0.0)
        bb_lo = jnp.min(safe_c - safe_r[:, None], axis=0)
        bb_hi = jnp.max(safe_c + safe_r[:, None], axis=0)

    k_sub = max(1, refill_every)

    def body(carry):
        st, lane_ray, depth, emitted, out, it = carry
        k = jax.random.fold_in(key, it)
        k_cam, k_bounce = jax.random.split(k)

        if resort_every:

            def do_resort(args):
                st, lane_ray, depth = args
                perm = warp_resort_permutation(
                    st.origin, st.direction, st.active, bb_lo, bb_hi
                )
                return (
                    RayState(
                        origin=st.origin[perm],
                        direction=st.direction[perm],
                        attenuation=st.attenuation[perm],
                        color=st.color[perm],
                        active=st.active[perm],
                    ),
                    lane_ray[perm],
                    depth[perm],
                )

            st, lane_ray, depth = jax.lax.cond(
                (it > 0) & (it % resort_every < k_sub),
                do_resort,
                lambda a: a,
                (st, lane_ray, depth),
            )

        # --- refill free lanes from the global ray stream ---
        free = ~st.active
        rank = jnp.cumsum(free.astype(jnp.int32)) - 1          # rank among free
        remaining = total - emitted
        take = free & (rank < remaining)
        ray_idx = emitted + jnp.where(take, rank, 0)
        pix = ray_idx % n_pix                                   # sample-major
        if pixel_perm is not None:
            pix = pixel_perm[pix]
        new_o, new_d = generate_rays(camera, k_cam, pix % w, pix // w)
        tk = take[:, None]
        st = RayState(
            origin=jnp.where(tk, new_o, st.origin),
            direction=jnp.where(tk, new_d, st.direction),
            attenuation=jnp.where(tk, 1.0, st.attenuation),
            color=jnp.where(tk, 0.0, st.color),
            active=st.active | take,
        )
        lane_ray = jnp.where(take, ray_idx, lane_ray)
        depth = jnp.where(take, 0, depth)
        emitted = emitted + jnp.sum(take.astype(jnp.int32))

        # --- k_sub masked bounces for the whole pool; a lane finishing
        # mid-block idles until the block ends (finishes at most one ray
        # per block: no refill mid-block) ---
        fin_any = jnp.zeros((b,), bool)
        fin_color = jnp.zeros((b, 3), jnp.float32)
        for s in range(k_sub):
            was_active = st.active
            st2 = bounce_step(
                st, jax.random.fold_in(k_bounce, s), scene, intersect_fn
            )
            depth = depth + was_active.astype(jnp.int32)
            finished = was_active & ~st2.active    # wrote a color this bounce
            exhausted = st2.active & (depth >= max_depth)  # depth out -> black
            fin_color = jnp.where(finished[:, None], st2.color, fin_color)
            fin_any = fin_any | finished
            st = st2._replace(active=st2.active & ~exhausted)

        # --- drain finished lanes ONCE per block, by GLOBAL RAY INDEX.
        # Ray indices are unique across the whole pass, so this is a cheap
        # unique-index scatter-set into the per-ray buffer (summed per
        # pixel at the end), not a slow duplicate-index scatter-add into
        # the image. ---
        slot = jnp.where(fin_any, lane_ray, total)     # non-finished: dropped
        # component-planar drain (see render_wavefront_sum_fused)
        out = tuple(
            out[c].at[slot].set(fin_color[:, c], mode="drop", unique_indices=True)
            for c in range(3)
        )
        return st, lane_ray, depth, emitted, out, it + k_sub

    def cond(carry):
        st, _, _, emitted, _, _ = carry
        return (emitted < total) | jnp.any(st.active)

    st0 = RayState(
        origin=jnp.zeros((b, 3), jnp.float32),
        direction=jnp.zeros((b, 3), jnp.float32),
        attenuation=jnp.ones((b, 3), jnp.float32),
        color=jnp.zeros((b, 3), jnp.float32),
        active=jnp.zeros((b,), bool),
    )
    carry0 = (
        st0,
        jnp.zeros((b,), jnp.int32),
        jnp.zeros((b,), jnp.int32),
        jnp.asarray(0, jnp.int32),
        tuple(jnp.zeros((total + 1,), jnp.float32) for _ in range(3)),
        jnp.asarray(0, jnp.int32),
    )
    *_, out, _ = jax.lax.while_loop(cond, body, carry0)
    # per-ray -> per-pixel: ray_idx = sample * n_pix + stream position
    planes = [jnp.sum(c[:total].reshape(spp, n_pix), axis=0) for c in out]
    sums = jnp.stack(planes, axis=-1)
    if pixel_perm is not None:
        sums = sums[jnp.argsort(pixel_perm)]  # stream order -> pixel order
    return sums


def render_wavefront_sum_fused(
    scene: Scene,
    camera: Camera,
    key: jax.Array,
    spp: int,
    pool_size: int = DEFAULT_POOL,
    block_rays: int = 512,
    pos_drain: Optional[bool] = None,
    sphere_chunk: int = 0,
    refill_every: int = 2,
    pixel_ids=None,
    culled=None,
    resort_every: int = 0,
    pixel_perm=None,
) -> jnp.ndarray:
    """Wavefront render with the FULLY FUSED bounce kernel
    (ops/pallas/bounce_kernel.py): one pallas_call per pool iteration does
    intersect + winner-attribute selection + shading + RNG on-core.  The
    host-side loop only handles refill/drain bookkeeping.

    refill_every: bounces per refill block (the tape forward's design,
    grad/tapegrad.py) — the refill machinery (cumsum rank + camera ray
    generation + merges) is paid once per k bounces; a lane that finishes
    mid-block idles until the block ends (~+9% idle bounce slots at k=2 on
    the RTiOW workload, a measured net win on the tape path).  The noise
    stream shifts with k (same estimator class as changing pool size).

    pixel_ids: optional [K] i32 — render only these pixels (sums returned
    in the SAME order, [K, 3]).  The shuffled progressive fill renders
    perm chunks through this (CameraRayIterator parity on the production
    engine, camera.rs:68-116).

    culled: optional CulledScene (ops/pallas/culled_kernel.py) — run the
    acceleration structure INSIDE the fused engine via the walk-mode
    culled fused bounce (ops/pallas/culled_bounce_kernel.py).  The culled
    scene's Morton-reordered `culled.scene` is traced (pass the SAME object
    the CulledScene was built from as `scene`; only `culled` is used when
    given).  RNG switches to ray-identity-keyed hash draws (kernel AND
    camera jitter), so resort_every / pool_size become pure performance
    knobs: the image is bit-identical for any value.

    resort_every: culled path only — every K-th pool iteration re-sort
    lanes by (origin Morton cell, direction octant) to keep post-bounce
    ray blocks frustum-coherent for the walk (GPU wavefront ray re-sorting,
    TPU-shaped).  Requires culled (the hash RNG); 0 = off.

    pixel_perm: optional [n_pix] i32 STREAM pixel permutation (tiled
    order for frustum-coherent primary blocks, render/order.py); sums are
    returned in pixel order.  Mutually exclusive with pixel_ids.

    Noise comes from the kernel's on-core PRNG (not threefry), so images
    differ from render_wavefront_sum at the noise level while estimating
    the same integral.  TPU only (compiled Mosaic; use interpret mode on
    CPU for tests)."""
    from distributed_raytracer_tpu.ops.pallas.bounce_kernel import fused_bounce

    assert not (pixel_ids is not None and pixel_perm is not None)
    n_pix = pixel_ids.shape[0] if pixel_ids is not None else camera.num_pixels
    w = camera.image_width
    total = n_pix * spp
    b = min(pool_size, total)
    max_depth = camera.max_depth
    seed_base = jnp.asarray(
        jax.random.randint(key, (), 0, 2**31 - 1), jnp.int32
    )
    if culled is not None:
        from distributed_raytracer_tpu.ops.pallas.culled_bounce_kernel import (
            _hash_u01,
            build_culled_pack,
            culled_fused_bounce,
        )

        # scene constants (HBM packs) hoisted out of the while_loop
        pack = build_culled_pack(culled)
        # camera-jitter hash seed: decorrelated from the kernel's bounce
        # seeds (a ray's camera draws are keyed by rid ONLY — stable even
        # if a re-sort shifted which iteration refills it)
        cam_seed = jnp.asarray(
            jax.random.randint(jax.random.fold_in(key, 0xCA3), (), 0, 2**31 - 1),
            jnp.int32,
        )
        if resort_every:
            csc = culled.scene
            real = csc.radii > 0.0
            safe_c = jnp.where(real[:, None], csc.centers, 0.0)
            safe_r = jnp.where(real, csc.radii, 0.0)
            bb_lo = jnp.min(safe_c - safe_r[:, None], axis=0)
            bb_hi = jnp.max(safe_c + safe_r[:, None], axis=0)
    elif resort_every:
        raise ValueError(
            "resort_every on the fused engine requires culled (the plain "
            "fused kernel's PRNG is lane-keyed; a re-sort would shift "
            "noise streams)"
        )
    # pos-gather drain (profiled: the three planar color scatters were 58%
    # of the forward program; TPU scatters ~43 ns/row vs ~1.5 ns/row for
    # gathers): finished colors go to a dense per-iteration buffer and only
    # a 1-D int32 position is scattered; per-ray colors are one gather at
    # the end.  Worst-case iterations = every ray at max depth; only
    # enabled when that buffer fits comfortably in HBM.
    k_sub = max(1, refill_every)
    t_worst = fused_drain_rows(total, max_depth, b, k_sub)
    if pos_drain is None:
        pos_drain = pos_drain_fits(total, max_depth, pool_size, k_sub)

    def body(carry):
        o, d, atten, lane_ray, depth, live, emitted, out, it = carry
        k = jax.random.fold_in(key, it)

        if culled is not None and resort_every:
            # lane re-sort for secondary-ray walk coherence; pure perf knob
            # (every draw is rid-keyed, so the image bits don't move)
            def do_resort(args):
                o, d, atten, lane_ray, depth, live = args
                perm = warp_resort_permutation(o, d, live, bb_lo, bb_hi)
                return (o[perm], d[perm], atten[perm], lane_ray[perm],
                        depth[perm], live[perm])

            o, d, atten, lane_ray, depth, live = jax.lax.cond(
                (it > 0) & (it % resort_every < k_sub),
                do_resort,
                lambda a: a,
                (o, d, atten, lane_ray, depth, live),
            )

        # refill — paid ONCE per k_sub bounces (tape-forward design)
        free = ~live
        rank = jnp.cumsum(free.astype(jnp.int32)) - 1
        remaining = total - emitted
        take = free & (rank < remaining)
        ray_idx = emitted + jnp.where(take, rank, 0)
        pix = ray_idx % n_pix
        if pixel_ids is not None:
            pix = pixel_ids[pix]
        if pixel_perm is not None:
            pix = pixel_perm[pix]
        if culled is not None:
            cam_draws = tuple(
                _hash_u01(ray_idx, cam_seed, 8 + dd) for dd in range(4)
            )
            new_o, new_d = generate_rays(
                camera, k, pix % w, pix // w, draws=cam_draws
            )
        else:
            new_o, new_d = generate_rays(camera, k, pix % w, pix // w)
        tk = take[:, None]
        o = jnp.where(tk, new_o, o)
        d = jnp.where(tk, new_d, d)
        atten = jnp.where(tk, 1.0, atten)
        lane_ray = jnp.where(take, ray_idx, lane_ray)
        depth = jnp.where(take, 0, depth)
        live = live | take
        emitted = emitted + jnp.sum(take.astype(jnp.int32))

        # k_sub fused bounces; a lane that finishes mid-block idles and a
        # single 1-D position scatter drains the whole block
        lane_iota = jnp.arange(b, dtype=jnp.int32)
        fin_flat = jnp.full((b,), -1, jnp.int32)
        fin_color = jnp.zeros((b, 3), jnp.float32)
        for s in range(k_sub):
            it_s = it + s
            if culled is not None:
                res = culled_fused_bounce(
                    o, d, live, lane_ray, pack, culled.chunk,
                    seed_base + it_s * jnp.int32(65537),
                    block_rays=block_rays,
                )
            else:
                res = fused_bounce(
                    o, d, live, scene, seed_base + it_s * jnp.int32(65537),
                    block_rays=block_rays, chunk=sphere_chunk,
                )
            depth = depth + live.astype(jnp.int32)
            fin = (res.finished == 1) & live
            keep = live & ~fin
            exhausted = keep & (depth >= max_depth)

            color = atten * res.color
            if pos_drain:
                # record WHERE (flat block position) and WHAT each lane
                # finished; one scatter + one dense row write per bounce
                fin_flat = jnp.where(fin, it_s * b + lane_iota, fin_flat)
                pos, contrib = out
                contrib = jax.lax.dynamic_update_index_in_dim(
                    contrib, color, it_s, 0
                )
                out = (pos, contrib)
            else:
                fin_color = jnp.where(fin[:, None], color, fin_color)
                fin_flat = jnp.where(fin, jnp.int32(0), fin_flat)
            # kernel outputs are already keep-merged; atten exactly 1.0 on
            # non-kept lanes (bit-identical to explicit keep-wheres)
            o = res.new_o
            d = res.new_d
            atten = atten * res.atten
            live = keep & ~exhausted

        # a lane finishes at most one ray per block (no refill mid-block)
        slot = jnp.where(fin_flat >= 0, lane_ray, total)
        if pos_drain:
            pos, contrib = out
            pos = pos.at[slot].set(fin_flat, mode="drop", unique_indices=True)
            out = (pos, contrib)
        else:
            out = tuple(
                out[c].at[slot].set(fin_color[:, c], mode="drop",
                                    unique_indices=True)
                for c in range(3)
            )
        return o, d, atten, lane_ray, depth, live, emitted, out, it + k_sub

    def cond(carry):
        live, emitted = carry[5], carry[6]
        return (emitted < total) | jnp.any(live)

    if pos_drain:
        out0 = (
            jnp.full((total + 1,), -1, jnp.int32),
            jnp.zeros((t_worst, b, 3), jnp.float32),
        )
    else:
        out0 = tuple(jnp.zeros((total + 1,), jnp.float32) for _ in range(3))
    carry0 = (
        jnp.zeros((b, 3), jnp.float32),
        jnp.ones((b, 3), jnp.float32),  # nonzero dir: avoid 0-length rays
        jnp.ones((b, 3), jnp.float32),
        jnp.zeros((b,), jnp.int32),
        jnp.zeros((b,), jnp.int32),
        jnp.zeros((b,), bool),
        jnp.asarray(0, jnp.int32),
        out0,
        jnp.asarray(0, jnp.int32),
    )
    *_, out, _ = jax.lax.while_loop(cond, body, carry0)
    if pos_drain:
        pos, contrib = out
        pos = pos[:total]
        flat = contrib.reshape(t_worst * b, 3)
        colors = jnp.where(
            (pos >= 0)[:, None], flat[jnp.clip(pos, 0, t_worst * b - 1)], 0.0
        )
        sums = jnp.sum(colors.reshape(spp, n_pix, 3), axis=0)
    else:
        planes = [jnp.sum(c[:total].reshape(spp, n_pix), axis=0) for c in out]
        sums = jnp.stack(planes, axis=-1)
    if pixel_perm is not None:
        sums = sums[jnp.argsort(pixel_perm)]  # stream order -> pixel order
    return sums


@functools.partial(
    jax.jit,
    static_argnames=("spp", "pool_size", "use_pallas", "refill_every",
                     "resort_every"),
)
def _render_wavefront_jit(scene, camera, key, spp, pool_size, use_pallas,
                          pixel_perm=None, refill_every=1, resort_every=0):
    if use_pallas:
        from distributed_raytracer_tpu.ops.pallas.intersect_kernel import (
            closest_hit_pallas,
        )

        ifn = closest_hit_pallas
    else:
        ifn = closest_hit
    return render_wavefront_sum(scene, camera, key, spp, pool_size, ifn,
                                pixel_perm, resort_every=resort_every,
                                refill_every=refill_every)


def warp_resort_permutation(origin, direction, active, bb_lo, bb_hi):
    """Standalone (origin-cell, direction-octant) lane sort key + argsort —
    exported for probes/tests; render_wavefront_sum inlines the same
    logic."""
    scale = 7.999 / jnp.maximum(bb_hi - bb_lo, 1e-6)
    cell = jnp.clip(((origin - bb_lo) * scale).astype(jnp.int32), 0, 7)

    def spread(v):
        return (v & 1) | ((v & 2) << 2) | ((v & 4) << 4)

    morton = spread(cell[:, 0]) | (spread(cell[:, 1]) << 1) | (spread(cell[:, 2]) << 2)
    octant = (
        (direction[:, 0] > 0).astype(jnp.int32)
        | ((direction[:, 1] > 0).astype(jnp.int32) << 1)
        | ((direction[:, 2] > 0).astype(jnp.int32) << 2)
    )
    k = jnp.where(active, (morton << 3) | octant, jnp.int32(1 << 30))
    return jnp.argsort(k)


def render_image_wavefront(
    scene: Scene,
    camera: Camera,
    seed: int = 0,
    spp: Optional[int] = None,
    batch: int = 32,
    pool_size: int = DEFAULT_POOL,
    use_pallas: bool = False,
    intersect_fn=None,
    progress_cb=None,
    ray_order: str = "row",
    resort_every: int = 0,
    refill_every: int = 1,
) -> np.ndarray:
    """Full-image wavefront render; returns linear mean [H, W, 3] on host.

    batch: samples per device program (one jit call renders batch spp).
    intersect_fn: custom closest-hit (e.g. the block-culled sweep); when
    given it overrides use_pallas.
    ray_order: "row" (scanline stream) or "tiled" (32x16 pixel tiles —
    frustum-coherent blocks, required for the culled kernels to win).
    resort_every: lane re-sort period for render_wavefront_sum (secondary-
    ray coherence for the culled kernels); 0 = off."""
    spp = spp if spp is not None else camera.samples_per_pixel
    key = jax.random.PRNGKey(seed)
    acc = jnp.zeros((camera.num_pixels, 3), jnp.float32)

    pixel_perm = None
    if ray_order == "tiled":
        from distributed_raytracer_tpu.render.order import tile_permutation

        pixel_perm = jnp.asarray(
            tile_permutation(camera.image_width, camera.image_height)
        )

    if intersect_fn is not None:
        render = jax.jit(
            functools.partial(
                render_wavefront_sum, intersect_fn=intersect_fn,
                resort_every=resort_every, refill_every=refill_every,
            ),
            static_argnames=("spp", "pool_size"),
        )
    else:
        render = functools.partial(
            _render_wavefront_jit, use_pallas=use_pallas,
            refill_every=refill_every, resort_every=resort_every,
        )

    done = 0
    while done < spp:
        n = min(batch, spp - done)
        k = jax.random.fold_in(key, done)
        acc = acc + render(scene, camera, k, spp=n, pool_size=pool_size,
                           pixel_perm=pixel_perm)
        done += n
        if progress_cb is not None:
            progress_cb(done, np.asarray(acc) / done)
    return (np.asarray(acc) / spp).reshape(camera.image_height, camera.image_width, 3)
