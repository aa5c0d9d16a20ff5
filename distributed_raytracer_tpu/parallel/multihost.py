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

import os

import jax
import numpy as np

_initialized = False


def initialize(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
    local_device_ids=None,
) -> None:
    """Join the multi-host job.

    Replaces the reference's multicast discovery protocol
    (distributed_common.rs:88-116): there is nothing to discover — the
    coordinator address comes from the environment/scheduler and the
    runtime hands every process the full device set.

    MUST run before any JAX backend use (device queries included — a
    backend query would initialize the local runtime and break the
    subsequent distributed init).  Idempotence is tracked with a module
    flag, never by querying the backend.  Args not given are taken from
    the standard env vars (JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES /
    JAX_PROCESS_ID) or scheduler auto-detection."""
    global _initialized
    if _initialized:
        return
    if coordinator_address is None:
        coordinator_address = os.environ.get("JAX_COORDINATOR_ADDRESS")
    if num_processes is None and os.environ.get("JAX_NUM_PROCESSES"):
        num_processes = int(os.environ["JAX_NUM_PROCESSES"])
    if process_id is None and os.environ.get("JAX_PROCESS_ID"):
        process_id = int(os.environ["JAX_PROCESS_ID"])
    if coordinator_address is None and num_processes is None:
        return  # single-process run: nothing to join
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
        local_device_ids=local_device_ids,
    )
    _initialized = True


def process_info() -> dict:
    return {
        "process_index": jax.process_index(),
        "process_count": jax.process_count(),
        "local_devices": len(jax.local_devices()),
        "global_devices": len(jax.devices()),
    }


def put_global(x, sharding) -> jax.Array:
    """Place host-replicated data as a global array on a (possibly
    multi-process) sharding.  Every process passes the SAME full array;
    each fills only its addressable shards (make_array_from_callback), so
    this works identically from 1 process to a pod — the TPU-native form
    of the orchestrator's share_params push (orchestrator_server.rs:225-232)."""
    import numpy as _np

    x = _np.asarray(x)
    return jax.make_array_from_callback(x.shape, sharding, lambda idx: x[idx])


def replicate_scene(scene, mesh):
    """Broadcast the scene to every device — the SendObject fan-out
    (orchestrator_server.rs:150-163) as one device_put."""
    from distributed_raytracer_tpu.parallel.mesh import replicated

    return jax.device_put(scene, replicated(mesh))


def gather_image(partial_sum: jax.Array) -> np.ndarray:
    """Host-side image fan-in: fully-addressable arrays come back directly;
    multi-host sharded results go through process_allgather (the pixel
    return path, ray_server.rs:93-103 + orchestrator_server.rs:253-256)."""
    if getattr(partial_sum, "is_fully_addressable", True):
        return np.asarray(jax.device_get(partial_sum))
    from jax.experimental import multihost_utils

    return np.asarray(multihost_utils.process_allgather(partial_sum, tiled=True))
