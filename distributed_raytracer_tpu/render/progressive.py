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
        )

    @classmethod
    def fresh(cls, camera: Camera, seed: int) -> "AccumState":
        return cls(
            raw_sum=np.zeros((camera.num_pixels, 3), np.float32),
            samples_done=0,
            seed=seed,
            image_width=camera.image_width,
            image_height=camera.image_height,
        )


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
) -> AccumState:
    """Progressive render loop with optional checkpointing.

    Sample batch s..s+n uses keys folded from (seed, sample index) only, so a
    resumed render produces bit-identical output to an uninterrupted one.
    """
    spp = spp if spp is not None else camera.samples_per_pixel

    state: Optional[AccumState] = None
    if resume and checkpoint_path and os.path.exists(checkpoint_path):
        state = AccumState.load(checkpoint_path)
        if (
            state.seed != seed
            or state.image_width != camera.image_width
            or state.image_height != camera.image_height
        ):
            state = None  # incompatible checkpoint: start over
    if state is None:
        state = AccumState.fresh(camera, seed)

    key = jax.random.PRNGKey(seed)
    batches_since_ckpt = 0
    while state.samples_done < spp:
        n = min(batch, spp - state.samples_done)
        s = jnp.arange(state.samples_done, state.samples_done + n, dtype=jnp.int32)
        delta = _render_batch_jit(scene, camera, key, s, tile_size, False)
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
