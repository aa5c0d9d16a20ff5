"""Differentiable rendering: dL/dscene and dL/dcamera.

The reference has no gradient story at all — this is the capability the
TPU build adds on top of parity (BASELINE.json north star: "end-to-end
dL/dscene gradients ... pixel gradients matching finite-difference checks").

Design notes:

- The whole forward path (camera derivation -> ray gen -> fixed-depth
  masked scan -> accumulation) is built from traceable ops, so jax.grad
  works end-to-end; `render_diff` simply forces the scan-based tracer.
- Gradients use FIXED NOISE reparameterization: the same root key produces
  the same jitter/scatter/defocus draws for any parameter perturbation, so
  the estimator is the pathwise/reparameterization gradient.  This is what
  makes finite-difference checks meaningful.
- Discontinuity caveat (documented limitation, same as every pathwise
  differentiable ray tracer): visibility/silhouette changes are step
  functions in scene parameters; the pathwise gradient sees only the
  smooth shading/geometry terms, not the edge term.  Away from silhouettes
  gradients match finite differences tightly; integrated edge terms need
  edge sampling / reparameterized integrands, which is out of scope for
  parity with the reference.
- The dielectric's stochastic reflect/refract choice (material.rs:115) is
  reparameterized as a fixed uniform draw compared against the (smooth)
  Schlick reflectance: the branch *choice* is frozen per sample while the
  chosen branch's direction stays differentiable.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from distributed_raytracer_tpu.models.scene import Scene
from distributed_raytracer_tpu.ops.camera import Camera, reinitialize
from distributed_raytracer_tpu.render.renderer import (
    DEFAULT_TILE,
    render_sample_batch,
)

# Camera pose leaves exposed to differentiation.
CAMERA_POSE_FIELDS = ("vfov", "lookfrom", "lookat", "vup", "defocus_angle", "focus_dist")


def render_diff(
    scene: Scene,
    camera: Camera,
    key: jax.Array,
    sample_indices: jnp.ndarray,
    tile_size: int = DEFAULT_TILE,
) -> jnp.ndarray:
    """Differentiable mean-image render, [H*W, 3] linear color."""
    total = render_sample_batch(
        scene, camera, key, sample_indices, tile_size, differentiable=True
    )
    return total / sample_indices.shape[0]


def image_loss(img: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    """Mean-squared error in linear color space."""
    return jnp.mean((img - target.reshape(img.shape)) ** 2)


def _loss_from_scene_params(
    params: dict, scene: Scene, camera: Camera, key, sample_indices, target, tile_size
):
    img = render_diff(scene.with_diff_params(params), camera, key, sample_indices, tile_size)
    return image_loss(img, target)


@functools.partial(jax.jit, static_argnames=("tile_size",))
def scene_grads(
    scene: Scene,
    camera: Camera,
    key: jax.Array,
    sample_indices: jnp.ndarray,
    target: jnp.ndarray,
    tile_size: int = DEFAULT_TILE,
) -> Tuple[jnp.ndarray, dict]:
    """(loss, dL/d{centers, radii, albedo, fuzz, ior}) against a target image."""
    return jax.value_and_grad(_loss_from_scene_params)(
        scene.diff_params(), scene, camera, key, sample_indices, target, tile_size
    )


def _camera_with_pose(camera: Camera, pose: dict) -> Camera:
    return reinitialize(camera.replace(**pose))


def _loss_from_both(params, scene, camera, key, sample_indices, target, tile_size):
    scene_p, pose_p = params
    cam = _camera_with_pose(camera, pose_p)
    img = render_diff(scene.with_diff_params(scene_p), cam, key, sample_indices, tile_size)
    return image_loss(img, target)


@functools.partial(jax.jit, static_argnames=("tile_size",))
def scene_and_camera_grads(
    scene: Scene,
    camera: Camera,
    key: jax.Array,
    sample_indices: jnp.ndarray,
    target: jnp.ndarray,
    tile_size: int = DEFAULT_TILE,
):
    """(loss, (scene grads, camera-pose grads)) — full dL/dscene + dL/dpose."""
    pose = {f: getattr(camera, f) for f in CAMERA_POSE_FIELDS}
    return jax.value_and_grad(_loss_from_both)(
        (scene.diff_params(), pose), scene, camera, key, sample_indices, target, tile_size
    )


class InverseRenderer:
    """Gradient-descent scene recovery (BASELINE config 5): optimize chosen
    scene leaves to match a target image.

    Example:
        inv = InverseRenderer(scene0, camera, target, fields=("albedo",))
        for step in range(100):
            loss = inv.step()
        recovered = inv.scene
    """

    def __init__(
        self,
        scene: Scene,
        camera: Camera,
        target: jnp.ndarray,
        fields: Tuple[str, ...] = ("albedo", "centers"),
        learning_rate: float = 2e-2,
        spp_per_step: int = 4,
        seed: int = 0,
        tile_size: int = DEFAULT_TILE,
        optimizer: Optional[optax.GradientTransformation] = None,
        engine: str = "scan",
        pool: int = 4096,
    ):
        self.scene = scene
        self.camera = camera
        self.target = jnp.asarray(target).reshape(-1, 3)
        self.fields = fields
        self.spp = spp_per_step
        self.key = jax.random.PRNGKey(seed)
        self.tile_size = tile_size
        self.opt = optimizer or optax.adam(learning_rate)
        self._params = {f: getattr(scene, f) for f in fields}
        self._opt_state = self.opt.init(self._params)
        self._step = 0

        if engine == "tape":
            # reverse-tape wavefront gradients (grad/tapegrad.py) — the
            # fast fwd+bwd path; fused bounce kernel when on TPU
            from distributed_raytracer_tpu.grad.tapegrad import make_tape_tracer
            from distributed_raytracer_tpu.ops.camera import generate_rays

            on_tpu = jax.devices()[0].platform != "cpu"
            tracer = make_tape_tracer(
                jax.random.PRNGKey(seed + 1), camera.max_depth, pool=pool,
                use_fused=on_tpu, segsum="matmul" if on_tpu else "scatter",
            )
            n_pix = camera.num_pixels
            w = camera.image_width
            ids = jnp.arange(n_pix, dtype=jnp.int32)

            def loss_fn(params, scene, key, s):
                s2 = scene.replace(**params)

                def one(acc, si):
                    k = jax.random.fold_in(key, si)
                    k_cam, k_trace = jax.random.split(k)
                    o, d = generate_rays(self.camera, k_cam, ids % w, ids // w)
                    return acc + tracer(s2, o, d, k_trace), None

                acc, _ = jax.lax.scan(one, jnp.zeros((n_pix, 3), jnp.float32), s)
                return image_loss(acc / s.shape[0], self.target)

        else:

            def loss_fn(params, scene, key, s):
                img = render_diff(
                    scene.replace(**params), self.camera, key, s, self.tile_size
                )
                return image_loss(img, self.target)

        self._vg = jax.jit(jax.value_and_grad(loss_fn))

    def step(self) -> float:
        # fresh noise per step: fold the step index (stochastic gradient)
        k = jax.random.fold_in(self.key, self._step)
        s = jnp.arange(self.spp, dtype=jnp.int32)
        loss, grads = self._vg(self._params, self.scene, k, s)
        updates, self._opt_state = self.opt.update(grads, self._opt_state, self._params)
        self._params = optax.apply_updates(self._params, updates)
        self.scene = self.scene.replace(**self._params)
        self._step += 1
        return float(loss)
