"""Camera model and batched primary-ray generation.

TPU-native re-design of the reference camera (camera.rs:40-66 config surface,
camera.rs:169-206 `initialize`, camera.rs:238-262 `get_ray`/`sample_square`/
`defocus_disk_sample`).  Differences from the reference:

- derived geometry is computed with traceable jnp ops, so gradients flow
  into camera pose (lookfrom/lookat/vup/vfov/defocus/focus_dist);
- ray generation is batched: one call yields a whole wavefront [R] of
  jittered, defocus-sampled rays from per-ray pixel indices;
- the `if defocus_angle <= 0` branch (camera.rs:246) becomes a `jnp.where`
  so the function stays jittable.

Static ints (image size, spp, max depth) are non-pytree fields so shapes
stay compile-time constants.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
from flax import struct

from distributed_raytracer_tpu.core import rng as drng
from distributed_raytracer_tpu.core import vecmath as vm


@struct.dataclass
class Camera:
    # --- static config (compile-time) ---
    image_width: int = struct.field(pytree_node=False)
    image_height: int = struct.field(pytree_node=False)
    samples_per_pixel: int = struct.field(pytree_node=False)
    max_depth: int = struct.field(pytree_node=False)

    # --- differentiable pose/optics config ---
    vfov: jnp.ndarray          # scalar, degrees
    lookfrom: jnp.ndarray      # [3]
    lookat: jnp.ndarray        # [3]
    vup: jnp.ndarray           # [3]
    defocus_angle: jnp.ndarray  # scalar, degrees
    focus_dist: jnp.ndarray     # scalar

    # --- derived (camera.rs:169-206), traceable from the config above ---
    center: jnp.ndarray         # [3]
    pixel00_loc: jnp.ndarray    # [3]
    pixel_delta_u: jnp.ndarray  # [3]
    pixel_delta_v: jnp.ndarray  # [3]
    u: jnp.ndarray              # [3] camera basis
    v: jnp.ndarray              # [3]
    w: jnp.ndarray              # [3]
    defocus_disk_u: jnp.ndarray  # [3]
    defocus_disk_v: jnp.ndarray  # [3]

    @property
    def num_pixels(self) -> int:
        return self.image_width * self.image_height

    @property
    def pixel_samples_scale(self) -> float:
        # camera.rs:178
        return 1.0 / self.samples_per_pixel


def derive(
    image_width: int,
    image_height: int,
    vfov,
    lookfrom,
    lookat,
    vup,
    defocus_angle,
    focus_dist,
) -> dict:
    """The derived-geometry computation of Camera::initialize (camera.rs:169-206),
    expressed traceably so it can sit under jit/grad."""
    vfov = jnp.asarray(vfov, jnp.float32)
    lookfrom = jnp.asarray(lookfrom, jnp.float32)
    lookat = jnp.asarray(lookat, jnp.float32)
    vup = jnp.asarray(vup, jnp.float32)
    defocus_angle = jnp.asarray(defocus_angle, jnp.float32)
    focus_dist = jnp.asarray(focus_dist, jnp.float32)

    center = lookfrom

    theta = jnp.deg2rad(vfov)
    h = jnp.tan(theta / 2.0)
    viewport_height = 2.0 * h * focus_dist
    viewport_width = viewport_height * (image_width / image_height)

    w = vm.unit_vector(lookfrom - lookat)
    u = vm.unit_vector(vm.cross(vup, w))
    v = vm.cross(w, u)

    viewport_u = viewport_width * u
    viewport_v = viewport_height * (-v)

    pixel_delta_u = viewport_u / image_width
    pixel_delta_v = viewport_v / image_height

    viewport_upper_left = center - focus_dist * w - viewport_u / 2.0 - viewport_v / 2.0
    pixel00_loc = viewport_upper_left + 0.5 * (pixel_delta_u + pixel_delta_v)

    defocus_radius = focus_dist * jnp.tan(jnp.deg2rad(defocus_angle / 2.0))
    defocus_disk_u = u * defocus_radius
    defocus_disk_v = v * defocus_radius

    return dict(
        vfov=vfov,
        lookfrom=lookfrom,
        lookat=lookat,
        vup=vup,
        defocus_angle=defocus_angle,
        focus_dist=focus_dist,
        center=center,
        pixel00_loc=pixel00_loc,
        pixel_delta_u=pixel_delta_u,
        pixel_delta_v=pixel_delta_v,
        u=u,
        v=v,
        w=w,
        defocus_disk_u=defocus_disk_u,
        defocus_disk_v=defocus_disk_v,
    )


def make_camera(
    aspect_ratio: float = 1.0,
    image_width: int = 100,
    samples_per_pixel: int = 10,
    max_depth: int = 10,
    vfov: float = 90.0,
    lookfrom=(0.0, 0.0, 0.0),
    lookat=(0.0, 0.0, -1.0),
    vup=(0.0, 1.0, 0.0),
    defocus_angle: float = 0.0,
    focus_dist: float = 10.0,
) -> Camera:
    """Build an initialized camera.  Defaults match Camera::new (camera.rs:147-163)."""
    image_height = max(int(image_width / aspect_ratio), 1)  # camera.rs:174-176
    d = derive(
        image_width, image_height, vfov, lookfrom, lookat, vup, defocus_angle, focus_dist
    )
    return Camera(
        image_width=image_width,
        image_height=image_height,
        samples_per_pixel=samples_per_pixel,
        max_depth=max_depth,
        **d,
    )


def reinitialize(camera: Camera) -> Camera:
    """Recompute derived geometry from the pose/optics leaves.

    Use after mutating pose leaves (e.g. a camera-pose gradient step) — the
    analogue of calling Camera::initialize again."""
    d = derive(
        camera.image_width,
        camera.image_height,
        camera.vfov,
        camera.lookfrom,
        camera.lookat,
        camera.vup,
        camera.defocus_angle,
        camera.focus_dist,
    )
    return camera.replace(**d)


def generate_rays(
    camera: Camera, key: jax.Array, pixel_i: jnp.ndarray, pixel_j: jnp.ndarray,
    draws=None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Batched Camera::get_ray (camera.rs:238-251).

    pixel_i, pixel_j: integer arrays [R] of pixel coordinates (i = column,
    j = row, matching the reference's loop order camera.rs:217-219).
    Returns (origins [R,3], directions [R,3]).  Directions are deliberately
    NOT normalized — the reference's intersection math handles a != 1
    (sphere.rs:31) and normalizing would change the defocus sampling.

    draws: optional (jx, jy, u1, u2) uniform [R] rows replacing the
    threefry draws — the culled fused wavefront passes ray-identity-keyed
    hash draws so lane re-sorting leaves every ray's camera jitter (and
    hence the whole image) bit-identical.  jx/jy feed the pixel jitter;
    u1/u2 the defocus disk via the sqrt-polar closed form (the same
    distribution as drng.in_unit_disk).
    """
    r = pixel_i.shape[0]
    if draws is None:
        k_jitter, k_disk = jax.random.split(key)
        offset = drng.square_jitter(k_jitter, r)  # [R,3], z=0
        off_x, off_y = offset[:, 0], offset[:, 1]
        p = drng.in_unit_disk(k_disk, r)  # [R,3]
        p_x, p_y = p[:, 0], p[:, 1]
    else:
        jx, jy, u1, u2 = draws
        off_x, off_y = jx - 0.5, jy - 0.5
        rr = jnp.sqrt(u1)
        th = 6.2831853 * u2
        p_x, p_y = rr * jnp.cos(th), rr * jnp.sin(th)
    fi = pixel_i.astype(jnp.float32) + off_x
    fj = pixel_j.astype(jnp.float32) + off_y
    pixel_sample = (
        camera.pixel00_loc[None, :]
        + fi[:, None] * camera.pixel_delta_u[None, :]
        + fj[:, None] * camera.pixel_delta_v[None, :]
    )

    disk_sample = (
        camera.center[None, :]
        + p_x[:, None] * camera.defocus_disk_u[None, :]
        + p_y[:, None] * camera.defocus_disk_v[None, :]
    )
    use_disk = camera.defocus_angle > 0.0  # camera.rs:246, as a where
    origin = jnp.where(use_disk, disk_sample, camera.center[None, :])
    direction = pixel_sample - origin
    return origin, direction
