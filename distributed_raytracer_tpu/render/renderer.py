"""Single-device render driver: sample batches over ray tiles.

Replaces the reference's sample-major triple loop `for sample { for j { for
i { get_ray; ray_color; write_color } } }` (camera.rs:208-236) with a jitted
scan: samples outermost (so accumulation stays progressive, matching the
reference's converge-on-screen behavior), rays tiled so the dense [tile, N]
intersection buffers stay comfortably in HBM/VMEM regardless of image size.

RNG discipline: the color of (pixel, sample) depends only on
(root_key, sample_index, tile partition) — renders are reproducible and
resumable at sample granularity, unlike the reference's unseeded global RNG
(prelude.rs:23-25).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from distributed_raytracer_tpu.models.scene import Scene
from distributed_raytracer_tpu.ops.camera import Camera, generate_rays
from distributed_raytracer_tpu.ops.trace import trace_rays, trace_rays_fast

DEFAULT_TILE = 32768


def _pixel_grid(camera: Camera) -> jnp.ndarray:
    """Flat pixel ids 0..W*H-1; id = j*W + i (row-major, camera.rs:217-219)."""
    return jnp.arange(camera.num_pixels, dtype=jnp.int32)


def render_sample_batch(
    scene: Scene,
    camera: Camera,
    key: jax.Array,
    sample_indices: jnp.ndarray,
    tile_size: int = DEFAULT_TILE,
    differentiable: bool = False,
) -> jnp.ndarray:
    """Render len(sample_indices) full-image passes and return the SUM of
    linear colors, shape [H*W, 3].

    sample_indices: i32 [S] — global sample numbers, folded into the key so
    any chunking of 0..spp yields the same total.  Jittable; reverse-mode
    differentiable when differentiable=True (fixed-depth scan instead of
    early-exit while loop).
    """
    w = camera.image_width
    n_pix = camera.num_pixels
    tile = min(tile_size, n_pix)
    n_tiles = -(-n_pix // tile)
    pad = n_tiles * tile - n_pix

    ids = jnp.pad(_pixel_grid(camera), (0, pad))  # padded ids re-render pixel 0
    ids_tiled = ids.reshape(n_tiles, tile)
    tile_idx = jnp.arange(n_tiles, dtype=jnp.int32)

    tracer = trace_rays if differentiable else trace_rays_fast

    def one_tile(sample_key, tids, tidx):
        k = jax.random.fold_in(sample_key, tidx)
        k_cam, k_trace = jax.random.split(k)
        pi = tids % w
        pj = tids // w
        o, d = generate_rays(camera, k_cam, pi, pj)
        return tracer(scene, o, d, k_trace, camera.max_depth)

    def one_sample(acc, s):
        sample_key = jax.random.fold_in(key, s)

        def tile_step(carry, xs):
            tids, tidx = xs
            return carry, one_tile(sample_key, tids, tidx)

        _, colors = jax.lax.scan(tile_step, None, (ids_tiled, tile_idx))
        colors = colors.reshape(n_tiles * tile, 3)[:n_pix]
        return acc + colors, None

    acc0 = jnp.zeros((n_pix, 3), jnp.float32)
    acc, _ = jax.lax.scan(one_sample, acc0, sample_indices)
    return acc


@functools.partial(jax.jit, static_argnames=("tile_size", "differentiable"))
def _render_batch_jit(scene, camera, key, sample_indices, tile_size, differentiable):
    return render_sample_batch(
        scene, camera, key, sample_indices, tile_size, differentiable
    )


def render_image(
    scene: Scene,
    camera: Camera,
    seed: int = 0,
    spp: Optional[int] = None,
    batch: int = 16,
    tile_size: int = DEFAULT_TILE,
    progress_cb=None,
) -> np.ndarray:
    """Render a full image; returns linear mean colors [H, W, 3] (f32, host).

    Host loop over sample batches (each batch is one jitted device program),
    with an optional progress callback receiving the running mean — the
    analogue of the reference's per-sample progressive window refresh
    (colors.rs:26-46), minus the window.
    """
    spp = spp if spp is not None else camera.samples_per_pixel
    key = jax.random.PRNGKey(seed)
    acc = jnp.zeros((camera.num_pixels, 3), jnp.float32)
    done = 0
    while done < spp:
        n = min(batch, spp - done)
        s = jnp.arange(done, done + n, dtype=jnp.int32)
        acc = acc + _render_batch_jit(scene, camera, key, s, tile_size, False)
        done += n
        if progress_cb is not None:
            mean = np.asarray(acc) / done
            progress_cb(done, mean.reshape(camera.image_height, camera.image_width, 3))
    img = np.asarray(acc) / spp
    return img.reshape(camera.image_height, camera.image_width, 3)
