"""Progressive accumulation with checkpoint/resume.

The reference accumulates per-pixel running sums and counts on the client
(`write_color`'s raw_buffer/count_buffer, colors.rs:26-46; client-side
mirrors at client.rs:74-76,113-115) but can never snapshot or resume them.
Here the accumulation state is an explicit, order-independent value —
(raw_sum, samples_done, seed) — checkpointable at sample-batch granularity,
which is also the coarse-grained fault-tolerance story: a lost host restarts
and resumes from the last batch instead of the reference's
retry-forever-per-bounce loop (ray_server.rs:62-86).
"""

from __future__ import annotations

import dataclasses
import functools
import os
import tempfile
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from distributed_raytracer_tpu.models.scene import Scene
from distributed_raytracer_tpu.ops.camera import Camera
from distributed_raytracer_tpu.render.renderer import DEFAULT_TILE, _render_batch_jit


@dataclasses.dataclass
class AccumState:
    """Order-independent progressive render state."""

    raw_sum: np.ndarray  # [H*W, 3] f32 linear color sum
    samples_done: int
    seed: int
    image_width: int
    image_height: int
    # engine/batch pin resume bit-identity for the wavefront engines (their
    # RNG is keyed per sample-batch start, so the batch split must match);
    # the scan engine keys per global sample index and accepts any batch.
    engine: str = "scan"
    batch: int = 0

    def mean_image(self) -> np.ndarray:
        denom = max(self.samples_done, 1)  # colors.rs:40's zero-count guard
        return (self.raw_sum / denom).reshape(
            self.image_height, self.image_width, 3
        )

    def save(self, path: str) -> None:
        # Atomic write: crash mid-save must not corrupt the resume point.
        d = os.path.dirname(os.path.abspath(path)) or "."
        fd, tmp = tempfile.mkstemp(dir=d, suffix=".ckpt.tmp")
        try:
            with os.fdopen(fd, "wb") as f:
                np.savez(
                    f,
                    raw_sum=self.raw_sum,
                    samples_done=self.samples_done,
                    seed=self.seed,
                    image_width=self.image_width,
                    image_height=self.image_height,
                    engine=self.engine,
                    batch=self.batch,
                )
            os.replace(tmp, path)
        except BaseException:
            if os.path.exists(tmp):
                os.unlink(tmp)
            raise

    @classmethod
    def load(cls, path: str) -> "AccumState":
        z = np.load(path)
        return cls(
            raw_sum=z["raw_sum"],
            samples_done=int(z["samples_done"]),
            seed=int(z["seed"]),
            image_width=int(z["image_width"]),
            image_height=int(z["image_height"]),
            engine=str(z["engine"]) if "engine" in z.files else "scan",
            batch=int(z["batch"]) if "batch" in z.files else 0,
        )

    @classmethod
    def fresh(cls, camera: Camera, seed: int, engine: str = "scan", batch: int = 0) -> "AccumState":
        return cls(
            raw_sum=np.zeros((camera.num_pixels, 3), np.float32),
            samples_done=0,
            seed=seed,
            image_width=camera.image_width,
            image_height=camera.image_height,
            engine=engine,
            batch=batch,
        )


def _wavefront_delta_fn(scene, camera, engine, pool_size, use_pallas,
                        intersect_fn, ray_order="row", resort_every=0,
                        culled=None):
    """Jitted sample-batch renderer for the wavefront engines.

    culled: optional CulledScene — on the fused engine this selects the
    culled fused bounce (walk + shade in one kernel, rid-keyed RNG), where
    resort_every and tiled ray order become supported performance knobs."""
    import functools

    import jax.numpy as jnp

    from distributed_raytracer_tpu.render import wavefront as wf

    perm = None
    if ray_order == "tiled":
        from distributed_raytracer_tpu.render.order import tile_permutation

        perm = jnp.asarray(
            tile_permutation(camera.image_width, camera.image_height)
        )

    if engine == "mega":
        # forward-only MEGA RENDER kernel: the whole render (camera ray
        # generation + refill + bounce + drain) as ONE Pallas program per
        # image sample — no host-loop glue, no drain scatter/gather
        from distributed_raytracer_tpu.ops.pallas import mega_render_kernel as mrk
        from distributed_raytracer_tpu.ops.pallas import mega_walk_kernel as mwk

        if resort_every or ray_order == "tiled":
            import sys

            print(
                "[render] lane re-sort / tiled ray order are not needed on "
                "the mega engine (rays never leave the kernel); ignored",
                file=sys.stderr,
            )
        budget = mrk.mega_render_budget_tight(
            camera.num_pixels, camera.max_depth, pool_size
        )
        dense_ok = culled is None and mrk.mega_render_supported(
            scene, camera.num_pixels, pool_size
        )
        if dense_ok:
            # hardware sweep optimum (flagship workload): sub-block 1024
            # edges out 512/2048 (probe 33.6 vs 32.8/32.1 M rays/s)
            br = 1024 if pool_size % 1024 == 0 else pool_size
            render = jax.jit(
                functools.partial(mrk.render_wavefront_sum_mega,
                                  budget=budget, block_rays=br),
                static_argnames=("spp", "pool_size"),
            )
            return lambda k, n: render(
                scene, camera, k, spp=n, pool_size=pool_size
            )
        # multi-chunk scene (or an explicit --accel culled): the mega WALK
        # kernel — same program structure, scene streamed from HBM chunk by
        # chunk with in-kernel occlusion culling; image bit-identical to
        # the dense engine at equal scene content (same (rid, depth) keys)
        if not mwk.mega_walk_supported(camera.num_pixels, pool_size):
            raise ValueError(
                "mega engine unsupported here (color homes exceed VMEM) — "
                "use engine='fused'"
            )
        if culled is not None:
            import numpy as _np

            pack = mwk.build_walk_pack(culled, _np.asarray(camera.center))
        else:
            pack = mwk.walk_pack_for(scene, camera, chunk=256)
        # hardware sweep (scripts/mega_walk_bench.py, 32k spheres): br 512
        # (1.45x over dense fused) > 256 (1.38x) — wider sub-blocks
        # amortize the chunk DMA across more rays and the lost culling
        # selectivity costs less than the extra fetches saved.  Round-5
        # re-sweep: br512+TILED (each sub-block refills one 32x16 image
        # tile — frustum-coherent flag tests) measured +6% over untiled
        # in both same-session runs (1.48-1.51x vs 1.39-1.42x; r4 had
        # measured it neutral) and is bit-identical by the global pixel
        # draw keys — tiled is now the default when the image shape
        # supports the tile permutation.
        br = 512 if pool_size % 512 == 0 else (
            128 if pool_size % 128 == 0 else pool_size
        )
        tiled = br == 512 and camera.image_width % 32 == 0 and \
            camera.image_height % 16 == 0
        # pack binds as a closure constant (its chunk/n_chunks ints are
        # static kernel-shape parameters, not traceable leaves)
        render = jax.jit(
            functools.partial(mwk.render_wavefront_sum_mega_walk, pack,
                              budget=budget, block_rays=br, tiled=tiled),
            static_argnames=("spp", "pool_size"),
        )
        return lambda k, n: render(camera, k, spp=n, pool_size=pool_size)
    if engine == "fused":
        if culled is not None:
            render = jax.jit(
                functools.partial(
                    wf.render_wavefront_sum_fused, culled=culled,
                    resort_every=resort_every, pixel_perm=perm,
                ),
                static_argnames=("spp", "pool_size"),
            )
        else:
            if resort_every or ray_order == "tiled":
                import sys

                print(
                    "[render] lane re-sort / tiled ray order on the fused "
                    "engine requires --accel culled (the plain fused "
                    "kernel's on-core RNG is lane-keyed); ignored",
                    file=sys.stderr,
                )
            render = jax.jit(
                wf.render_wavefront_sum_fused,
                static_argnames=("spp", "pool_size"),
            )

        # Keep the pos-gather drain ON: its contrib buffer scales with the
        # spp passed per call, and a large sample batch (e.g. --batch 50 at
        # config 4) silently tripped the HBM cap into the 3x-slower planar-
        # scatter fallback (measured 6.2 vs ~20 M rays/s).  Render in
        # sub-chunks that fit and sum — the accumulation is order-
        # independent, so results only differ at the noise level (each
        # chunk folds its own key).
        depth = camera.max_depth

        def max_posdrain_spp():
            # largest spp whose drain buffer fits (shared predicate with the
            # renderer — wf.pos_drain_fits — so the two can't disagree);
            # None when even spp=1 falls back to planar scatters, in which
            # case chunking has no benefit and we render in one call
            if not wf.pos_drain_fits(camera.num_pixels, depth, pool_size):
                return None
            n = 1
            while n < 4096 and wf.pos_drain_fits(
                camera.num_pixels * (n + 1), depth, pool_size
            ):
                n += 1
            return n

        cap = max_posdrain_spp()

        def fused_delta(k, n):
            if cap is None or n <= cap:
                return render(scene, camera, k, spp=n, pool_size=pool_size)
            # Sub-chunk using ONLY spp sizes {cap, 1}: spp is a static jit
            # argument and a first-time remote compile of a changed kernel
            # costs 3-10 min on this toolchain, so a ragged tail chunk
            # (n % cap) would pay a full second compile per distinct tail
            # size (review finding).  The tail runs as spp=1 calls instead —
            # n > cap only happens at large images where cap is small, so
            # the tail is at most cap-1 (a handful of) cheap calls.
            acc = None
            done = 0
            i = 0
            while done < n:
                c = cap if n - done >= cap else 1
                part = render(scene, camera, jax.random.fold_in(k, i),
                              spp=c, pool_size=pool_size)
                acc = part if acc is None else acc + part
                done += c
                i += 1
            return acc

        return fused_delta
    if intersect_fn is not None:
        render = jax.jit(
            functools.partial(wf.render_wavefront_sum, intersect_fn=intersect_fn,
                              resort_every=resort_every),
            static_argnames=("spp", "pool_size"),
        )
        return lambda k, n: render(
            scene, camera, k, spp=n, pool_size=pool_size, pixel_perm=perm
        )
    return lambda k, n: wf._render_wavefront_jit(
        scene, camera, k, n, pool_size, use_pallas, perm,
        resort_every=resort_every,
    )


def _shuffled_fill_sample(
    scene, camera, key, fill_chunk: int, fill_cb, engine: str = "scan",
    pool_size: int = 16384,
) -> np.ndarray:
    """Render sample 0 in SHUFFLED pixel chunks — the TPU-native form of the
    reference's CameraRayIterator progressive fill-in (camera.rs:68-116):
    the image appears scattered-uniformly instead of top-down.  Returns the
    full sample-0 color sum [H*W, 3].  fill_cb (optional) receives the
    partially-filled mean image [H, W, 3] after each chunk (untouched pixels
    black, like the reference's window).

    engine="fused" renders each chunk through the production fused bounce
    kernel (render_wavefront_sum_fused pixel_ids path) — on TPU the fill
    runs at production speed instead of the ~4x-slower scan tracer, so
    `--fill shuffled --display` converges on screen in seconds at config 4
    (the reference's signature behavior, colors.rs:26-46)."""
    from distributed_raytracer_tpu import native
    from distributed_raytracer_tpu.ops.camera import generate_rays
    from distributed_raytracer_tpu.ops.trace import trace_rays_fast

    n_pix = camera.num_pixels
    w = camera.image_width
    perm = native.shuffled_indices(n_pix, seed=int(jax.random.randint(key, (), 0, 2**31 - 1)))
    chunk = min(fill_chunk, n_pix)

    if engine == "fused":
        from distributed_raytracer_tpu.render import wavefront as wf

        fused = jax.jit(
            functools.partial(wf.render_wavefront_sum_fused),
            static_argnames=("spp", "pool_size"),
        )

        def render_chunk(scene, k, ids):
            return fused(scene, camera, k, spp=1,
                         pool_size=min(pool_size, ids.shape[0]),
                         pixel_ids=ids)
    else:

        @jax.jit
        def render_chunk(scene, k, ids):
            k_cam, k_trace = jax.random.split(k)
            o, d = generate_rays(camera, k_cam, ids % w, ids // w)
            return trace_rays_fast(scene, o, d, k_trace, camera.max_depth)

    raw = np.zeros((n_pix, 3), np.float32)
    count = np.zeros((n_pix,), np.int32)
    for c0 in range(0, n_pix, chunk):
        ids = perm[c0 : c0 + chunk]
        pad = chunk - len(ids)
        # padding re-renders pixel 0; its colors are sliced off below
        ids_j = jnp.asarray(np.pad(ids, (0, pad)), jnp.int32)
        colors = np.asarray(render_chunk(scene, jax.random.fold_in(key, c0), ids_j))
        # write_color semantics via the native host runtime (colors.rs:26-46)
        native.accumulate(raw, count, colors[: len(ids)], ids)
        if fill_cb is not None:
            denom = np.maximum(count, 1).astype(np.float32)[:, None]
            fill_cb((raw / denom).reshape(camera.image_height, w, 3))
    return raw


def render_progressive(
    scene: Scene,
    camera: Camera,
    seed: int = 0,
    spp: Optional[int] = None,
    batch: int = 16,
    tile_size: int = DEFAULT_TILE,
    checkpoint_path: Optional[str] = None,
    checkpoint_every: int = 1,
    resume: bool = True,
    progress_cb: Optional[Callable[[AccumState], None]] = None,
    engine: str = "scan",
    pool_size: Optional[int] = None,
    use_pallas: bool = False,
    intersect_fn=None,
    fill: str = "row",
    fill_chunk: int = 16384,
    fill_cb=None,
    ray_order: str = "row",
    resort_every: int = 0,
    culled=None,
) -> AccumState:
    """Progressive render loop with optional checkpointing.

    engine:
      "scan"      masked fixed-depth scan (keys folded per global sample
                  index — resume is bit-identical for ANY batch split)
      "wavefront" persistent-pool renderer (optionally use_pallas /
                  a custom intersect_fn, e.g. the block-culled sweep)
      "fused"     wavefront + the fully fused bounce kernel (TPU) — the
                  production fast path, now with checkpoint/resume
      "mega"      the forward-only mega RENDER kernel (TPU): one Pallas
                  program per image sample, camera rays generated in-kernel
                  ((rid, depth)-keyed hash noise).  Falls back to "fused"
                  when the scene/image exceeds the kernel's limits.
    The wavefront engines key their noise per sample-batch start, so resume
    is bit-identical when (engine, batch) match the checkpoint; mismatches
    restart the render.

    fill="shuffled" renders sample 0 in shuffled pixel chunks (the
    reference's CameraRayIterator fill-in order, camera.rs:68-116) with
    fill_cb progressive partial images; later samples proceed sample-major.
    """
    spp = spp if spp is not None else camera.samples_per_pixel

    # pool default is engine-dependent: the hardware sweeps put the fused
    # host-loop optimum at 16384 and the mega kernel's at 2048 (small pools
    # lose occupancy more slowly than they win back per-row fixed cost —
    # scripts/mega_render_probe.py, docs/DESIGN.md §13)
    pool_defaulted = pool_size is None
    if pool_defaulted:
        pool_size = 2048 if engine == "mega" else 16384

    if engine == "mega":
        from distributed_raytracer_tpu.ops.pallas.mega_walk_kernel import (
            mega_walk_supported,
        )

        # scene size no longer limits the mega engine (multi-chunk scenes
        # run the mega WALK kernel); only a VMEM-bound image falls back
        if not mega_walk_supported(camera.num_pixels, pool_size):
            import sys

            print(
                "[render] mega engine unsupported for this workload "
                "(VMEM-bound image); falling back to fused",
                file=sys.stderr,
            )
            engine = "fused"
            if pool_defaulted:
                pool_size = 16384

    # the culled fused variant has a different (rid-keyed) noise stream
    # than plain fused — pin it separately so resume stays bit-identical
    engine_tag = engine + ("+culled" if culled is not None else "")
    state: Optional[AccumState] = None
    if resume and checkpoint_path and os.path.exists(checkpoint_path):
        state = AccumState.load(checkpoint_path)
        if (
            state.seed != seed
            or state.image_width != camera.image_width
            or state.image_height != camera.image_height
            or state.engine != engine_tag
            or (engine != "scan" and state.batch != batch)
        ):
            state = None  # incompatible checkpoint: start over
    if state is None:
        state = AccumState.fresh(camera, seed, engine=engine_tag, batch=batch)

    key = jax.random.PRNGKey(seed)
    if engine != "scan":
        delta_fn = _wavefront_delta_fn(
            scene, camera, engine, pool_size, use_pallas, intersect_fn, ray_order,
            resort_every, culled=culled,
        )

    # shuffled progressive fill-in: sample 0 only (the reference's
    # distributed mode renders exactly 1 spp, camera.rs:77,93-95)
    if fill == "shuffled" and state.samples_done == 0:
        fill_key = jax.random.fold_in(key, 0x5F111)  # distinct from sample keys
        state.raw_sum = state.raw_sum + _shuffled_fill_sample(
            scene, camera, fill_key, fill_chunk, fill_cb,
            engine=("fused" if engine in ("fused", "mega") else "scan"),
            pool_size=pool_size,
        )
        state.samples_done = 1
        if checkpoint_path:
            state.save(checkpoint_path)
        if progress_cb is not None:
            progress_cb(state)

    batches_since_ckpt = 0
    while state.samples_done < spp:
        n = min(batch, spp - state.samples_done)
        if engine == "scan":
            s = jnp.arange(state.samples_done, state.samples_done + n, dtype=jnp.int32)
            delta = _render_batch_jit(scene, camera, key, s, tile_size, False)
        else:
            delta = delta_fn(jax.random.fold_in(key, state.samples_done), n)
        state.raw_sum = state.raw_sum + np.asarray(delta)
        state.samples_done += n
        batches_since_ckpt += 1
        if checkpoint_path and batches_since_ckpt >= checkpoint_every:
            state.save(checkpoint_path)
            batches_since_ckpt = 0
        if progress_cb is not None:
            progress_cb(state)
    if checkpoint_path:
        state.save(checkpoint_path)
    return state
