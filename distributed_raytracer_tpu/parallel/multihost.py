"""Multi-host orchestration.

The reference's control plane is a hand-rolled socket stack: UDP multicast
discovery (distributed_common.rs:88-116), an orchestrator SPOF
(orchestrator_server.rs:18-49), per-ray TCP dispatch and a WebSocket pixel
stream back to the client (§2.5 of SURVEY.md).  On TPU pods all of that
collapses into the runtime:

  - membership/discovery  -> jax.distributed.initialize (no multicast; the
    coordinator address comes from the scheduler)
  - scene upload          -> host-0 builds the Scene pytree; device_put with
    a replicated sharding broadcasts it over DCN/ICI
  - render fan-out        -> the global mesh spans all hosts' devices; each
    host feeds its addressable shard of the pixel grid
  - pixel fan-in          -> process_allgather of per-host partial sums
    (the WS pixel stream, minus the sockets)

Single-host (and the CI fake-device mesh) is the degenerate case of the
same code path, so everything here runs unmodified from 1 chip to a pod.
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np


def initialize(coordinator_address: Optional[str] = None) -> None:
    """Join the multi-host job (no-op when single-process).

    Replaces the reference's discovery protocol: there is nothing to
    discover — the runtime hands every process the full device set."""
    if jax.process_count() > 1 or coordinator_address is None:
        return  # already initialized or single-process
    jax.distributed.initialize(coordinator_address=coordinator_address)


def process_info() -> dict:
    return {
        "process_index": jax.process_index(),
        "process_count": jax.process_count(),
        "local_devices": len(jax.local_devices()),
        "global_devices": len(jax.devices()),
    }


def replicate_scene(scene, mesh):
    """Broadcast the scene to every device — the SendObject fan-out
    (orchestrator_server.rs:150-163) as one device_put."""
    from distributed_raytracer_tpu.parallel.mesh import replicated

    return jax.device_put(scene, replicated(mesh))


def gather_image(partial_sum: jax.Array) -> np.ndarray:
    """Host-side image fan-in: fully-addressable arrays come back directly;
    multi-host sharded results go through process_allgather (the pixel
    return path, ray_server.rs:93-103 + orchestrator_server.rs:253-256)."""
    if jax.process_count() == 1:
        return np.asarray(jax.device_get(partial_sum))
    from jax.experimental import multihost_utils

    return np.asarray(multihost_utils.process_allgather(partial_sum, tiled=True))
