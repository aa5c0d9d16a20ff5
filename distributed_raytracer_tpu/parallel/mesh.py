"""Device mesh construction.

The TPU-native replacement for the reference's socket fleet topology
(config.rs:12-14: 50 object servers + 5 ray servers discovered over UDP
multicast, distributed_common.rs:88-116).  Membership comes from the TPU
runtime (`jax.devices()` / `jax.distributed.initialize`), not discovery;
topology is a named `jax.sharding.Mesh`:

  - axis "rays":  data parallelism over the pixel/sample grid — the ray
    servers' role (orchestrator_server.rs:59-68 fan-out).
  - axis "scene": parameter (tensor) parallelism over the sphere axis —
    the object servers' role (orchestrator_server.rs:119-163 sharding).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

RAYS_AXIS = "rays"
SCENE_AXIS = "scene"


def make_mesh(
    n_rays: Optional[int] = None,
    n_scene: int = 1,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """2D ("rays", "scene") mesh.  Defaults to all devices on "rays".

    DRAY_MESH_DEVICE_CAP (env): opt-in cap of the DEFAULT device list at
    the first K devices.  Interpret-mode shard_map wedge classes have
    OPPOSITE device-layout preferences (DMA-walk kernels need a
    proper-subset mesh, large non-DMA programs need a full mesh —
    root-caused round 5, docs/DESIGN.md §18), so no global default is
    safe for both; tests pin explicit meshes instead and the cap remains
    a knob.  Explicit `devices=` arguments are never capped."""
    import os

    if devices is None:
        devices = jax.devices()
        cap = os.environ.get("DRAY_MESH_DEVICE_CAP")
        if cap:
            devices = devices[: int(cap)]
    devices = list(devices)
    if n_rays is None:
        n_rays = len(devices) // n_scene
    need = n_rays * n_scene
    if need > len(devices) or need == 0:
        raise ValueError(f"mesh {n_rays}x{n_scene} needs {need} of {len(devices)} devices")
    arr = np.asarray(devices[:need]).reshape(n_rays, n_scene)
    return Mesh(arr, (RAYS_AXIS, SCENE_AXIS))


def ray_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (ray/pixel) axis over the rays axis."""
    return NamedSharding(mesh, P(RAYS_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def scene_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (sphere) axis over the scene axis."""
    return NamedSharding(mesh, P(SCENE_AXIS))


def pad_to_multiple(n: int, m: int) -> int:
    return -(-n // m) * m
