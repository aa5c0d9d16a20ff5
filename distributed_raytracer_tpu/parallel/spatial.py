"""Spatial scene sharding: grid cells -> mesh shards.

The reference's object-server model: the orchestrator builds 360 x/z grid
AABBs, round-robins them over 50 object servers, and sends every sphere to
every server whose cells it overlaps (orchestrator_server.rs:119-163).
Rays then query only intersected cells front-to-back.

TPU-native translation: assign spheres to mesh "scene" shards by grid cell
(duplicating boundary-straddling spheres, exactly like the reference's
multi-cell sends), so each device's shard is SPATIALLY COMPACT.  The
collective closest-hit (parallel/scene_sharded.py) is unchanged —
duplicates resolve to the same winning t, and the masked-psum parameter
gather is duplicate-safe.  A spatially compact shard is what makes
per-shard early-outs and cluster culling effective; index-striped sharding
(shard_scene) remains the fallback for scenes without spatial structure.
"""

from __future__ import annotations

from typing import List

import jax.numpy as jnp
import numpy as np

from distributed_raytracer_tpu.models.aabb import AABB, grid_cells, intersect_sphere
from distributed_raytracer_tpu.models.scene import ABSORB, Scene
from distributed_raytracer_tpu.parallel.mesh import pad_to_multiple


def shard_scene_spatial(
    scene: Scene,
    n_shards: int,
    n_x: int = 6,
    n_z: int = 6,
) -> Scene:
    """Rebuild the scene with spheres grouped by grid cell, cells
    round-robined over n_shards (orchestrator_server.rs:133-139's
    assignment), spheres duplicated into every overlapping cell's shard
    (orchestrator_server.rs:150-163), and every shard padded to equal size.

    Returns a new Scene whose sphere axis is [n_shards * shard_size]; shard
    k owns slice [k*shard_size : (k+1)*shard_size].  Use with
    parallel/scene_sharded.py by sharding the sphere axis over the mesh.
    """
    cells = grid_cells(n_x=n_x, n_z=n_z)
    n_cells = cells.lo.shape[0]
    centers = np.asarray(scene.centers)
    radii = np.asarray(scene.radii)

    # sphere -> cells overlap matrix [n_cells, N]
    overlap = np.asarray(
        intersect_sphere(
            AABB(lo=cells.lo[:, None, :], hi=cells.hi[:, None, :]),
            jnp.asarray(centers)[None, :, :],
            jnp.asarray(radii)[None, :],
        )
    )

    # cell -> shard by CONTIGUOUS ranges (x stripes), deviating from the
    # reference's round-robin (orchestrator_server.rs:133-139) on purpose:
    # round-robin scatters a shard's cells across the whole scene, while
    # contiguous ranges keep each shard spatially compact, which is what
    # makes per-shard culling effective on TPU.
    all_cells = np.arange(n_cells)
    per_shard: List[np.ndarray] = []
    for k in range(n_shards):
        cell_ids = all_cells[(all_cells * n_shards) // n_cells == k]
        mask = overlap[cell_ids].any(axis=0)
        idx = np.where(mask)[0]
        # real (radius > 0) spheres only; padding re-added below
        idx = idx[radii[idx] > 0]
        per_shard.append(idx)

    # orphan guard: a sphere overlapping no cell (shouldn't happen with
    # edge-extended cells, but guard anyway) goes to shard 0
    covered = np.zeros(len(radii), bool)
    for idx in per_shard:
        covered[idx] = True
    orphans = np.where(~covered & (radii > 0))[0]
    if len(orphans):
        per_shard[0] = np.concatenate([per_shard[0], orphans])

    shard_size = pad_to_multiple(max(max(len(i) for i in per_shard), 1), 1)

    def build_shard(idx: np.ndarray):
        pad = shard_size - len(idx)
        take = lambda arr: np.concatenate(
            [np.asarray(arr)[idx], np.zeros((pad,) + np.asarray(arr).shape[1:],
                                            np.asarray(arr).dtype)]
        )
        return dict(
            centers=take(scene.centers),
            radii=take(scene.radii),
            albedo=take(scene.albedo),
            mat_type=np.concatenate(
                [np.asarray(scene.mat_type)[idx], np.full(pad, ABSORB, np.int32)]
            ),
            fuzz=take(scene.fuzz),
            ior=np.concatenate(
                [np.asarray(scene.ior)[idx], np.ones(pad, np.float32)]
            ),
        )

    shards = [build_shard(i) for i in per_shard]
    cat = lambda key: jnp.asarray(np.concatenate([s[key] for s in shards]))
    return Scene(
        centers=cat("centers"),
        radii=cat("radii"),
        albedo=cat("albedo"),
        mat_type=cat("mat_type").astype(jnp.int32),
        fuzz=cat("fuzz"),
        ior=cat("ior"),
    )
