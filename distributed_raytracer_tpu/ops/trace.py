"""The bounce loop: a fixed-depth, masked, on-chip scan.

This is the TPU-native re-design of the reference's core distributable
abstraction — `ray_color_iteration` (camera.rs:118-144), whose loop state is
externalized in `RayColorEntry {attenuation, ray, depth, color}`
(camera.rs:15-32) so each bounce can run on a remote object server via a
`CheckHit` TCP round-trip (object_server.rs:34-38, ray_server.rs:46-106).

Here the same state is the carry of a `lax.scan` over bounces, vectorized
over a wavefront of rays: what the reference pays a network RTT per bounce
for, XLA fuses into one compiled loop that never leaves VMEM/HBM.

Two drivers:
- trace_rays(..., unroll via lax.scan): reverse-mode differentiable.
- trace_rays_fast(..., lax.while_loop with an all-done early exit):
  forward-only, skips trailing bounces once every ray has terminated.

Termination semantics match camera.rs:118-144 exactly:
  - depth exhausted           -> contribute black       (camera.rs:120-123)
  - hit + scatter             -> attenuate and continue (camera.rs:130-134)
  - hit + absorb              -> contribute black       (camera.rs:136-138)
  - miss                      -> sky gradient * attenuation (camera.rs:141-144)
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from distributed_raytracer_tpu.core import vecmath as vm
from distributed_raytracer_tpu.models.scene import Scene
from distributed_raytracer_tpu.ops import materials
from distributed_raytracer_tpu.ops.intersect import closest_hit

SKY_WHITE = (1.0, 1.0, 1.0)
SKY_BLUE = (0.5, 0.7, 1.0)


def sky_color(ray_d: jnp.ndarray) -> jnp.ndarray:
    """White-to-blue background gradient (camera.rs:141-143)."""
    unit_d = vm.unit_vector(ray_d)
    a = 0.5 * (unit_d[..., 1] + 1.0)
    white = jnp.asarray(SKY_WHITE, ray_d.dtype)
    blue = jnp.asarray(SKY_BLUE, ray_d.dtype)
    return vm.lerp(jnp.broadcast_to(white, ray_d.shape), jnp.broadcast_to(blue, ray_d.shape), a)


class RayState(NamedTuple):
    """The wavefront carry — RayColorEntry (camera.rs:15-32), vectorized.

    `active` replaces the per-entry `depth` countdown: the scan index is the
    shared depth counter, and a lane that has produced its color goes
    inactive (its `color` is final; its other fields are dont-care).
    """

    origin: jnp.ndarray       # [R,3]
    direction: jnp.ndarray    # [R,3]
    attenuation: jnp.ndarray  # [R,3]
    color: jnp.ndarray        # [R,3]
    active: jnp.ndarray       # [R] bool


def init_state(ray_o: jnp.ndarray, ray_d: jnp.ndarray) -> RayState:
    r = ray_o.shape[0]
    return RayState(
        origin=ray_o,
        direction=ray_d,
        attenuation=jnp.ones((r, 3), ray_o.dtype),  # RayColorEntry::new, camera.rs:24-31
        color=jnp.zeros((r, 3), ray_o.dtype),
        active=jnp.ones((r,), bool),
    )


def bounce_step(
    state: RayState, key: jax.Array, scene: Scene, intersect_fn=closest_hit
) -> RayState:
    """One masked bounce for the whole wavefront = one ray_color_iteration
    (camera.rs:118-144) = one object-server CheckHit (object_server.rs:34-38),
    minus the network.

    intersect_fn: closest-hit implementation — pure-JAX dense (default) or
    the fused Pallas kernel (ops/pallas/intersect_kernel.closest_hit_pallas).
    """
    hit_res = intersect_fn(state.origin, state.direction, scene)
    # Missing rays carry t = BIG; feeding that into scatter() overflows f32
    # (p ~ 1e30, |p|^2 = inf) and the resulting NaNs leak back through the
    # masked where()s under reverse-mode AD (0 cotangent * inf = NaN).
    # Scatter results are only consumed when hit, so give misses a safe t.
    t_safe = jnp.where(hit_res.hit, hit_res.t, 1.0)
    sc = materials.scatter(
        key, state.origin, state.direction, t_safe, hit_res.idx, scene
    )

    finish_miss = state.active & ~hit_res.hit
    finish_absorb = state.active & hit_res.hit & ~sc.scattered
    keep_going = state.active & hit_res.hit & sc.scattered

    sky = sky_color(state.direction)
    color = jnp.where(
        finish_miss[:, None], state.attenuation * sky, state.color
    )
    # absorb contributes attenuation * black = 0 (camera.rs:136-138): color
    # stays at its initial zero, so finish_absorb needs no write.
    del finish_absorb

    new_attenuation = jnp.where(
        keep_going[:, None], state.attenuation * sc.attenuation, state.attenuation
    )
    new_origin = jnp.where(keep_going[:, None], sc.origin, state.origin)
    new_direction = jnp.where(keep_going[:, None], sc.direction, state.direction)

    return RayState(
        origin=new_origin,
        direction=new_direction,
        attenuation=new_attenuation,
        color=color,
        active=keep_going,
    )


def trace_rays(
    scene: Scene,
    ray_o: jnp.ndarray,
    ray_d: jnp.ndarray,
    key: jax.Array,
    max_depth: int,
    remat: bool = True,
    intersect_fn=closest_hit,
    early_skip: bool = True,
) -> jnp.ndarray:
    """Differentiable fixed-depth trace.  Returns colors [R,3].

    Rays still active after max_depth bounces contribute black
    (camera.rs:120-123: `depth <= 0` -> black), which the masked scan gets
    for free because inactive-at-exit lanes never wrote a color.

    remat: checkpoint each bounce so the backward pass stores only the
    [R]-sized carry per step instead of the dense [R, N] intersection
    residuals — O(depth*R) memory instead of O(depth*R*N), the standard
    HBM-for-FLOPs trade on TPU.  With the Pallas intersect kernel the
    non-carry residuals are [R]-sized too, so remat=False (store, don't
    recompute) is usually faster when memory allows.

    early_skip: wrap each bounce in lax.cond(any(active), ...) so once the
    whole batch has terminated the remaining steps reduce to a no-op at
    runtime — in both the forward scan and its transpose (lax.cond is
    reverse-differentiable and its transpose conds on the same predicate).
    A batch whose longest path is 20 pays ~20 bounces of a depth-50 scan.
    """
    state = init_state(ray_o, ray_d)
    keys = jax.random.split(key, max_depth)

    def bounce(s: RayState, k: jax.Array) -> RayState:
        return bounce_step(s, k, scene, intersect_fn)

    if early_skip:

        def step(s: RayState, k: jax.Array):
            s2 = jax.lax.cond(jnp.any(s.active), bounce, lambda s, _: s, s, k)
            return s2, None

    else:

        def step(s: RayState, k: jax.Array):
            return bounce(s, k), None

    if remat:
        step = jax.checkpoint(step)
    final, _ = jax.lax.scan(step, state, keys)
    return final.color


def trace_rays_fast(
    scene: Scene,
    ray_o: jnp.ndarray,
    ray_d: jnp.ndarray,
    key: jax.Array,
    max_depth: int,
    intersect_fn=closest_hit,
) -> jnp.ndarray:
    """Forward-only trace with an early exit once every lane terminated.

    Same semantics and same per-bounce RNG stream as trace_rays (keys are
    fold_in(key, depth_index)), but uses lax.while_loop so a batch whose
    rays all died at depth 3 does not pay for 50 bounces.  Not reverse-mode
    differentiable — use trace_rays under jax.grad.
    """
    state = init_state(ray_o, ray_d)
    keys = jax.random.split(key, max_depth)

    def cond(carry: Tuple[int, RayState]):
        i, s = carry
        return (i < max_depth) & jnp.any(s.active)

    def body(carry: Tuple[int, RayState]):
        i, s = carry
        return i + 1, bounce_step(s, keys[i], scene, intersect_fn)

    _, final = jax.lax.while_loop(cond, body, (jnp.asarray(0), state))
    return final.color
