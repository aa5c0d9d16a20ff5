"""distributed_raytracer_tpu — a TPU-native differentiable path-tracing framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
notrandomath/distributed-raytracer (a Rust "Ray Tracing in One Weekend"
renderer with a socket-distributed worker fleet).  Instead of per-bounce
RPCs between ray servers and object servers, the bounce loop is a masked
on-chip `lax.scan` / wavefront pool; instead of TCP scene sharding, the
scene is an SoA pytree replicated (or sphere-axis-sharded) over a
`jax.sharding.Mesh`; instead of UDP discovery, membership comes from the
TPU runtime.

Reference layer map: /root/reference/src/lib.rs:1-2 (raytracer + distributed).
"""

from distributed_raytracer_tpu.models.scene import (
    Scene,
    LAMBERTIAN,
    METAL,
    DIELECTRIC,
    ABSORB,
    TRANSPARENT,
    SceneBuilder,
)
from distributed_raytracer_tpu.ops.camera import Camera, make_camera
from distributed_raytracer_tpu.render.renderer import (
    render_image,
    render_sample_batch,
)
from distributed_raytracer_tpu.render.wavefront import render_image_wavefront

__version__ = "0.1.0"

__all__ = [
    "Scene",
    "SceneBuilder",
    "Camera",
    "make_camera",
    "render_image",
    "render_image_wavefront",
    "render_sample_batch",
    "LAMBERTIAN",
    "METAL",
    "DIELECTRIC",
    "ABSORB",
    "TRANSPARENT",
]
