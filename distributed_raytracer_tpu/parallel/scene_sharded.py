"""Scene (sphere-axis) sharding: the object-server role as ICI collectives.

The reference shards the scene across 50 object servers (360 AABB cells
round-robined, orchestrator_server.rs:119-143) and a ray server asks each
relevant shard owner "does my ray hit your objects?" over a per-bounce TCP
round-trip (`CheckHit`, ray_server.rs:63-66 -> object_server.rs:34-38),
ANDing the per-shard results (ray_server.rs:88-91).

TPU-native: shard the sphere axis of the Scene SoA over the mesh's "scene"
axis.  Inside shard_map, every device intersects the whole ray wavefront
against ITS sphere shard, then one `all_gather` of per-shard (t, local idx)
pairs replaces all CheckHit round-trips; the global closest hit is a min
over shards, and the winner's material parameters are fetched with a masked
`psum` (exactly one shard contributes nonzero).  Per bounce that is two
small collectives over ICI instead of O(shards) TCP connections.

Replication for fault tolerance (NUM_REPEAT_OBJECT=10, config.rs:13) is
unnecessary: the TPU runtime restarts the whole slice on chip loss and the
render resumes from the progressive checkpoint (render/progressive.py).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from distributed_raytracer_tpu.core import vecmath as vm
from distributed_raytracer_tpu.models.scene import Scene
from distributed_raytracer_tpu.ops import materials
from distributed_raytracer_tpu.ops.camera import Camera, generate_rays
from distributed_raytracer_tpu.ops.intersect import HitResult, candidate_ts
from distributed_raytracer_tpu.ops.trace import RayState, init_state, sky_color
from distributed_raytracer_tpu.parallel.mesh import RAYS_AXIS, SCENE_AXIS, pad_to_multiple


def closest_hit_sharded(
    ray_o: jnp.ndarray,
    ray_d: jnp.ndarray,
    scene_shard: Scene,
    axis_name: str = SCENE_AXIS,
    local_intersect=None,
) -> HitResult:
    """Global closest hit from per-shard local intersections.

    Call inside shard_map with scene_shard = this device's sphere shard.
    Returns GLOBAL sphere indices (shard_id * shard_size + local idx).

    local_intersect: optional per-shard closest-hit fn (o, d, scene) ->
    HitResult — pass ops.pallas.intersect_kernel.closest_hit_pallas on TPU
    so each shard's sweep runs the VMEM kernel instead of the pure-JAX
    [R, N_local] expansion (the object-server CheckHit compute, at
    production kernel speed).
    """
    if local_intersect is not None:
        loc = local_intersect(ray_o, ray_d, scene_shard)
        t_loc, i_loc = loc.t, loc.idx
    else:
        t_all = candidate_ts(ray_o, ray_d, scene_shard)      # [R, N_local]
        t_loc = jnp.min(t_all, axis=-1)                      # [R]
        i_loc = jnp.argmin(t_all, axis=-1).astype(jnp.int32)  # [R]

    # one collective replaces the per-shard CheckHit round-trips
    t_gall = jax.lax.all_gather(t_loc, axis_name)        # [S, R]
    i_gall = jax.lax.all_gather(i_loc, axis_name)        # [S, R]
    winner = jnp.argmin(t_gall, axis=0).astype(jnp.int32)  # [R]
    t = jnp.min(t_gall, axis=0)
    n_local = scene_shard.num_spheres
    idx_local_win = jnp.take_along_axis(i_gall, winner[None, :], axis=0)[0]
    idx_global = winner * n_local + idx_local_win
    return HitResult(t=t, idx=idx_global, hit=t < vm.BIG * 0.5)


def gather_params_sharded(
    scene_shard: Scene,
    idx_global: jnp.ndarray,
    axis_name: str = SCENE_AXIS,
) -> dict:
    """Winning-sphere attributes via ONE masked psum: the shard owning the
    winner contributes its values, everyone else zeros.

    All 10 per-sphere attributes are stacked into a single [R, 10] payload
    so the whole fetch is one collective per bounce (round-1 issued six —
    at depth 50 that was 300 collectives per sample on the scene axis)."""
    n_local = scene_shard.num_spheres
    my_shard = jax.lax.axis_index(axis_name)
    owner = idx_global // n_local
    local_idx = jnp.where(owner == my_shard, idx_global - owner * n_local, 0)
    mine = (owner == my_shard).astype(jnp.float32)

    stacked = jnp.concatenate(
        [
            scene_shard.centers,                               # 0:3
            scene_shard.radii[:, None],                        # 3
            scene_shard.albedo,                                # 4:7
            scene_shard.fuzz[:, None],                         # 7
            scene_shard.ior[:, None],                          # 8
            scene_shard.mat_type.astype(jnp.float32)[:, None],  # 9 (exact small ints)
        ],
        axis=-1,
    )  # [N_local, 10] — loop-invariant; XLA hoists it out of the bounce scan
    g = jax.lax.psum(stacked[local_idx] * mine[:, None], axis_name)
    return dict(
        centers=g[:, 0:3],
        radii=g[:, 3],
        albedo=g[:, 4:7],
        mat=g[:, 9].astype(jnp.int32),
        fuzz=g[:, 7],
        ior=g[:, 8],
    )


def bounce_step_sharded(
    state: RayState, key: jax.Array, scene_shard: Scene, axis_name: str = SCENE_AXIS,
    local_intersect=None,
) -> RayState:
    """One masked bounce with the scene sharded — the collective form of
    ops/trace.bounce_step (one ray_color_iteration, camera.rs:118-144)."""
    hit_res = closest_hit_sharded(state.origin, state.direction, scene_shard,
                                  axis_name, local_intersect)
    params = gather_params_sharded(scene_shard, hit_res.idx, axis_name)
    t_safe = jnp.where(hit_res.hit, hit_res.t, 1.0)
    # ior=0 for rays that missed every shard (psum of zeros); make it safe
    params["ior"] = jnp.where(hit_res.hit, params["ior"], 1.0)
    params["radii"] = jnp.where(hit_res.hit, params["radii"], 1.0)
    sc = materials.scatter_gathered(
        key, state.origin, state.direction, t_safe, params
    )

    finish_miss = state.active & ~hit_res.hit
    keep_going = state.active & hit_res.hit & sc.scattered

    sky = sky_color(state.direction)
    color = jnp.where(finish_miss[:, None], state.attenuation * sky, state.color)
    return RayState(
        origin=jnp.where(keep_going[:, None], sc.origin, state.origin),
        direction=jnp.where(keep_going[:, None], sc.direction, state.direction),
        attenuation=jnp.where(
            keep_going[:, None], state.attenuation * sc.attenuation, state.attenuation
        ),
        color=color,
        active=keep_going,
    )


def trace_rays_sharded(
    scene_shard: Scene,
    ray_o: jnp.ndarray,
    ray_d: jnp.ndarray,
    key: jax.Array,
    max_depth: int,
    axis_name: str = SCENE_AXIS,
    local_intersect=None,
) -> jnp.ndarray:
    """Fixed-depth trace with scene sharded over axis_name (inside shard_map)."""
    state = init_state(ray_o, ray_d)
    keys = jax.random.split(key, max_depth) if max_depth > 0 else jnp.zeros(
        (0, 2), jnp.uint32
    )

    def step(s, k):
        return bounce_step_sharded(s, k, scene_shard, axis_name,
                                   local_intersect), None

    final, _ = jax.lax.scan(step, state, keys)
    return final.color


def shard_scene(scene: Scene, n_shards: int) -> Scene:
    """Pad the sphere axis to a multiple of n_shards (padding spheres never
    hit — see SceneBuilder.build) so shards are equal-sized."""
    n = scene.num_spheres
    m = pad_to_multiple(n, n_shards)
    if m == n:
        return scene
    pad = m - n
    return Scene(
        centers=jnp.concatenate(
            [scene.centers, jnp.zeros((pad, 3), jnp.float32)]
        ),
        radii=jnp.concatenate([scene.radii, jnp.zeros((pad,), jnp.float32)]),
        albedo=jnp.concatenate([scene.albedo, jnp.zeros((pad, 3), jnp.float32)]),
        mat_type=jnp.concatenate(
            [scene.mat_type, jnp.full((pad,), 3, jnp.int32)]  # ABSORB
        ),
        fuzz=jnp.concatenate([scene.fuzz, jnp.zeros((pad,), jnp.float32)]),
        ior=jnp.concatenate([scene.ior, jnp.ones((pad,), jnp.float32)]),
    )


def _trace_sample_sum_local(
    scene_shard: Scene, key: jax.Array, sample_indices, ids, camera: Camera,
    depth: int, local_intersect=None,
) -> jnp.ndarray:
    """Sum of per-sample colors for this device's ray tile, scanning the
    sample axis INSIDE the program (mirrors sharded._render_ids) — one
    dispatch per sample batch instead of one per sample."""
    w = camera.image_width

    def one_sample(acc, s):
        # per-ray-shard key: fold in the rays-axis index so different ray
        # tiles draw independent noise, while scene-axis members stay in
        # lockstep (they must agree on every draw).
        k = jax.random.fold_in(key, s)
        k = jax.random.fold_in(k, jax.lax.axis_index(RAYS_AXIS))
        k_cam, k_trace = jax.random.split(k)
        o, d = generate_rays(camera, k_cam, ids % w, ids // w)
        return acc + trace_rays_sharded(
            scene_shard, o, d, k_trace, depth, local_intersect=local_intersect
        ), None

    acc0 = jnp.zeros((ids.shape[0], 3), jnp.float32)
    acc, _ = jax.lax.scan(one_sample, acc0, sample_indices)
    return acc


def _default_local_intersect(local_intersect):
    """"auto" -> the Pallas VMEM sweep on TPU, pure JAX elsewhere (the
    kernel needs compiled Mosaic; interpret mode is test-only)."""
    if local_intersect != "auto":
        return local_intersect
    if jax.devices()[0].platform in ("tpu", "axon"):  # NOT gpu: Mosaic only
        from distributed_raytracer_tpu.ops.pallas.intersect_kernel import (
            closest_hit_pallas,
        )

        return closest_hit_pallas
    return None


def make_scene_sharded_render(mesh: Mesh, camera: Camera, max_depth: Optional[int] = None,
                              local_intersect="auto"):
    """Jitted sample-batched renderer with rays sharded over "rays" AND the
    scene sharded over "scene" — the full 2D (ray servers x object servers)
    topology of the reference, as one shard_mapped program.

    Returns render(scene, key, sample_indices, ids) -> color SUM over the
    given samples, [len(ids), 3]; ids must be length-padded to a multiple
    of mesh.shape["rays"].
    """
    depth = max_depth if max_depth is not None else camera.max_depth
    li = _default_local_intersect(local_intersect)

    def local_fn(scene_shard, key, sample_indices, ids):
        return _trace_sample_sum_local(
            scene_shard, key, sample_indices, ids, camera, depth, li
        )

    smapped = shard_map(
        local_fn,
        mesh=mesh,
        in_specs=(P(SCENE_AXIS), P(), P(), P(RAYS_AXIS)),
        out_specs=P(RAYS_AXIS),
        check_vma=False,
    )
    return jax.jit(smapped)


def _replicate_scene_slice_vjp(axis_name: str, n_shards: int):
    """all_gather a block-sharded Scene into the full Scene, with a custom
    SLICE transpose: the backward takes this shard's own block of the full
    cotangent instead of jax's reduce-scatter-of-contributions.

    Why: the tape tracer's custom VJP computes the FULL d_scene identically
    on every scene-axis member (they replay the same tape against the same
    gathered params).  The cotangents are therefore REPLICATED, not partial
    sums — jax's all_gather transpose (a psum-scatter) would multiply the
    stripe grads by the shard count.  Slicing one's own block is the
    correct transpose under that replication invariant (pinned exact
    against the replicated tracer in tests/test_parallel.py)."""

    def gather_leaf(x):
        g = jax.lax.all_gather(x, axis_name)  # [S, n_local, ...]
        return g.reshape((g.shape[0] * g.shape[1],) + g.shape[2:])

    @jax.custom_vjp
    def replicate(scene_shard: Scene) -> Scene:
        return jax.tree_util.tree_map(gather_leaf, scene_shard)

    def fwd(scene_shard):
        return replicate(scene_shard), scene_shard.num_spheres

    def bwd(n_local, d_full: Scene):
        me = jax.lax.axis_index(axis_name)

        def slice_leaf(g):
            return jax.lax.dynamic_slice_in_dim(g, me * n_local, n_local, 0)

        return (jax.tree_util.tree_map(slice_leaf, d_full),)

    replicate.defvjp(fwd, bwd)
    return replicate


def make_tape_2d_tracer(
    mesh: Mesh,
    key: jax.Array,
    max_depth: int,
    pool: int = 2048,
    segsum: str = "matmul",
    budget=None,
    refill_every: int = 1,
    local_intersect="auto",
):
    """The PRODUCTION gradient path (reverse-tape wavefront) over the FULL
    2D (rays x scene) mesh: rays data-parallel AND the per-bounce sweep
    split over the scene axis — the object-server CheckHit role under
    gradients (object_server.rs:34-38) at tape speed.

    Per shard, per pool iteration: sweep MY sphere block (optionally the
    Pallas VMEM kernel), one all_gather + min for the global winner
    (closest_hit_sharded), then shade/record against the all_gather'd
    param table (a local gather — cheaper than a per-iteration masked
    psum, and the [N, 10] table is tiny next to the sweep).  The tape
    backward replays with the same full table and finishes with the
    slice transpose of _replicate_scene_slice_vjp, so grads come back
    sharded like the scene.

    Exactness: scene-axis members share draws (key folded by the RAYS
    index only) and the per-sphere sweep arithmetic is columnwise
    identical to the replicated tracer's, so winners, tapes, and grads
    match the rays-DP tracer bit-for-bit (tests/test_parallel.py).

    Why not the fused/mega kernels here: their value is fusing intersect
    + winner-select + SHADE + RNG into one program; a scene-axis split
    needs a cross-shard min BETWEEN intersect and shade, which re-opens
    the kernel at exactly the seam the fusion removed (docs/DESIGN.md §5).
    The per-shard sweep still runs the production Pallas intersect.

    Returns f(scene_padded, ray_o, ray_d) -> colors [R,3], differentiable
    w.r.t. scene and rays; scene grads land block-sharded over "scene".
    Pad the scene with shard_scene(scene, mesh.shape["scene"]) first; rays
    must divide mesh.shape["rays"]."""
    from distributed_raytracer_tpu.grad.tapegrad import make_tape_tracer

    li = _default_local_intersect(local_intersect)
    n_scene = mesh.shape[SCENE_AXIS]
    replicate = _replicate_scene_slice_vjp(SCENE_AXIS, n_scene)

    def local(scene_shard: Scene, o, d):
        n_local = scene_shard.num_spheres
        scene_full = replicate(scene_shard)

        def isect(ro, rd, scene_f):
            # winner selection: re-slice MY block out of the (replicated)
            # scene argument — NOT a closure over scene_shard, which is a
            # tracer of the enclosing shard_map scope and would leak into
            # the tape's custom-VJP retrace under jax.grad — then one
            # all_gather + min.  The tape's VJP never differentiates
            # through intersect (winner-only design).
            me = jax.lax.axis_index(SCENE_AXIS)
            block = jax.tree_util.tree_map(
                lambda x: jax.lax.dynamic_slice_in_dim(
                    x, me * n_local, n_local, 0
                ),
                scene_f,
            )
            return closest_hit_sharded(ro, rd, block, SCENE_AXIS, li)

        tracer = make_tape_tracer(
            key, max_depth, pool=pool, intersect_fn=isect, segsum=segsum,
            budget=budget, refill_every=refill_every,
        )
        k = jax.random.fold_in(key, jax.lax.axis_index(RAYS_AXIS))
        return tracer(scene_full, o, d, k)

    smapped = shard_map(
        local,
        mesh=mesh,
        in_specs=(P(SCENE_AXIS), P(RAYS_AXIS), P(RAYS_AXIS)),
        out_specs=P(RAYS_AXIS),
        check_vma=False,
    )
    return smapped


def make_scene_sharded_grad_fn(mesh: Mesh, camera: Camera, max_depth: Optional[int] = None):
    """(loss, scene-grads) over the FULL 2D mesh: rays data-parallel, scene
    tensor-parallel over the sphere axis.  The backward runs through the
    shard_map transpose: the all_gather of per-shard hits transposes to a
    reduce-scatter of t-cotangents, and the masked param psum transposes to
    the owning shard keeping its cotangent — each shard ends with the grads
    of ITS spheres only (grads come back sharded like the scene).

    Returns grad_fn(padded_scene, key, sample_indices, target) ->
    (loss, grads dict sharded over the scene axis)."""
    depth = max_depth if max_depth is not None else camera.max_depth
    n_rays_axis = mesh.shape[RAYS_AXIS]
    n_pix = camera.num_pixels
    m = pad_to_multiple(n_pix, n_rays_axis)

    def local_loss(params, scene_shard, key, sample_indices, ids, target, weight):
        sc = scene_shard.replace(**params)
        total = _trace_sample_sum_local(sc, key, sample_indices, ids, camera, depth)
        img = total / sample_indices.shape[0]
        se = jnp.sum((img - target) ** 2, axis=-1) * weight
        # mean over ALL pixels: local sum + psum over the rays axis
        return jax.lax.psum(jnp.sum(se), RAYS_AXIS) / (3.0 * n_pix)

    smapped_loss = shard_map(
        local_loss,
        mesh=mesh,
        in_specs=(P(SCENE_AXIS), P(SCENE_AXIS), P(), P(), P(RAYS_AXIS),
                  P(RAYS_AXIS), P(RAYS_AXIS)),
        out_specs=P(),
        check_vma=False,
    )
    # differentiate OUTSIDE the shard_map: the shard_map transpose inserts
    # the correct collectives (all_gather -> psum_scatter on the scene axis,
    # the rays-axis grad reduction) — differentiating inside with
    # check_vma=False over-counts because psum transposes to psum there
    jitted = jax.jit(jax.value_and_grad(smapped_loss))

    import numpy as np

    ids = jnp.asarray(np.r_[np.arange(n_pix), np.zeros(m - n_pix)], jnp.int32)
    weight = jnp.asarray(np.arange(m) < n_pix, jnp.float32)

    def grad_fn(padded_scene: Scene, key, sample_indices, target):
        tgt = jnp.zeros((m, 3), jnp.float32).at[:n_pix].set(
            jnp.asarray(target).reshape(-1, 3)
        )
        params = {
            "centers": padded_scene.centers,
            "albedo": padded_scene.albedo,
            "radii": padded_scene.radii,
            "fuzz": padded_scene.fuzz,
            "ior": padded_scene.ior,
        }
        return jitted(params, padded_scene, key, sample_indices, ids, tgt, weight)

    return grad_fn
