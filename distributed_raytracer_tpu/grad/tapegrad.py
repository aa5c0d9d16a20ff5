"""Reverse-tape wavefront gradients: fwd+bwd at wavefront efficiency.

Round-1's path-replay backward (grad/pathgrad.py) kept a lane pool fed by
a longest-path-first queue and, per iteration, gathered 14 recorded arrays
at random (bounce, ray) indices from [depth*R]-row stacks — the gathers
and the queue bookkeeping, not the math, dominated the backward (the
official fwd+bwd was ~10x below the forward path).

This module removes both:

  FORWARD   a persistent-pool wavefront (the production renderer's shape,
            render/wavefront.py) that RECORDS AN ITERATION TAPE: one
            [B]-row record per pool iteration, written at the iteration
            index (a dynamic-update-slice — sequential, in-place inside
            the while_loop; no scatters).  Work ~ sum of path lengths.

  BACKWARD  replays the tape IN REVERSE ITERATION ORDER.  A lane's
            cotangent at iteration `it` flows from the same lane at
            `it+1`; a lane that finished a ray at `it` seeds its color
            cotangent there; a lane that was refilled at `it` emits the
            primary-ray cotangent and zeroes its carry.  Trip count and
            occupancy are EXACTLY the forward's — no queue, no
            longest-path-first sort, no random gathers (tape reads are
            dynamic slices at the loop index).

Per-iteration cost is [B]-sized elementwise VJP math plus one stacked
segment-sum of sphere-parameter cotangents ([B,9] -> [N+1,9]; optionally
as a one-hot MXU matmul instead of a scatter-add).

The semantics differentiated are the reference's bounce loop
(camera.rs:118-144 / ray_color_iteration) — identical to pathgrad's
`_local_bounce`; the oracle test autodiffs a pure-JAX replay of the same
tape and must match this backward exactly.

Tape budget: iterations <= ceil(R*max_depth / B) + max_depth + 2 (full
occupancy while the ray queue is non-empty; the drain tail advances every
remaining lane each iteration, so it lasts < max_depth).  The tape is
allocated at that worst case and the while_loop exits early at the real
trip count, which the backward consumes.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from distributed_raytracer_tpu.grad.pathgrad import (
    _draws,
    _gather_params,
    _local_bounce,
)
from distributed_raytracer_tpu.models.scene import Scene
from distributed_raytracer_tpu.ops.intersect import closest_hit


class _Tape(NamedTuple):
    """Per-pool-iteration records, PACKED into two arrays so each forward
    iteration issues 2 dynamic-update-slices instead of 11 (per-op
    dispatch overhead inside the while_loop was a measurable fraction of
    the per-iteration cost at small pools).

    fdata columns: o(0:3) d(3:6) atten(6:9) ruv(9:12) u(12) contrib(13:16)
    idata columns: idx(0) lane_ray(1) flags(2) = hit | live<<1 | take<<2
                   | finished<<3

    contrib is the terminal color a finishing lane emitted this iteration:
    recording it on the tape (a dense slice write) lets the forward
    scatter only a 1-D int32 position per iteration and GATHER the per-ray
    colors once at the end — profiled: TPU scatters cost ~43 ns/row vs
    ~1.5 ns/row for gathers, and the per-iteration [B,3] color scatter was
    40% of the whole fwd+bwd program.
    """

    fdata: jnp.ndarray  # [T, B, 16] float
    idata: jnp.ndarray  # [T, B, 3] int32


class _Rec(NamedTuple):
    """One unpacked tape row, [B, ...]."""

    o: jnp.ndarray
    d: jnp.ndarray
    atten: jnp.ndarray
    idx: jnp.ndarray
    lane_ray: jnp.ndarray
    hit: jnp.ndarray
    live: jnp.ndarray
    take: jnp.ndarray
    finished: jnp.ndarray
    ruv: jnp.ndarray
    u: jnp.ndarray
    contrib: jnp.ndarray


def _pack_rec(rec: _Rec):
    f = jnp.concatenate(
        [rec.o, rec.d, rec.atten, rec.ruv, rec.u[:, None], rec.contrib], axis=-1
    )
    flags = (
        rec.hit.astype(jnp.int32)
        | (rec.live.astype(jnp.int32) << 1)
        | (rec.take.astype(jnp.int32) << 2)
        | (rec.finished.astype(jnp.int32) << 3)
    )
    i = jnp.stack([rec.idx, rec.lane_ray, flags], axis=-1)
    return f, i


def _unpack_rec(f: jnp.ndarray, i: jnp.ndarray) -> _Rec:
    flags = i[:, 2]
    return _Rec(
        o=f[:, 0:3], d=f[:, 3:6], atten=f[:, 6:9], ruv=f[:, 9:12], u=f[:, 12],
        idx=i[:, 0], lane_ray=i[:, 1],
        hit=(flags & 1) != 0,
        live=(flags & 2) != 0,
        take=(flags & 4) != 0,
        finished=(flags & 8) != 0,
        contrib=f[:, 13:16],
    )


def tape_budget(
    n_rays: int, max_depth: int, pool: int, refill_every: int = 1
) -> int:
    """Worst-case tape rows.  With refill_every=k > 1, a lane that finishes
    mid-block idles up to k-1 rows before the next refill (+ r*(k-1)/b rows
    worst case) and the drain tail can overshoot by up to k-1 rows; the
    result is rounded up to a multiple of k so the outer loop can use the
    whole allocation."""
    k = refill_every
    base = -(-n_rays * (max_depth + k - 1) // pool)
    raw = base + max_depth + 2 * k + 2  # 2k slack: packed boundary block +
    # drain tail can need base + max_depth + 2k - 1 rows (k+2 safe only k<=3)
    return -(-raw // k) * k


def _forward_tape(
    scene: Scene,
    ray_o: jnp.ndarray,
    ray_d: jnp.ndarray,
    key: jax.Array,
    max_depth: int,
    pool: int,
    intersect_fn=closest_hit,
    use_fused: bool = False,
    budget: Optional[int] = None,
    planar: bool = False,
    refill_every: int = 1,
    block_rays: int = 0,
    loop_unroll: int = 1,
):
    """Recording wavefront forward.

    Returns (color [R,3], tape, n_it).  use_fused routes the bounce through
    the fully fused Pallas kernel (intersect + winner select + shade + RNG
    on-core, ops/pallas/bounce_kernel.py); otherwise intersect_fn + the
    pure-JAX shade (CPU-testable, threefry draws).

    budget: tape length override.  The default is the proven worst case
    (every ray runs to max_depth); real scenes terminate in a few bounces,
    so production callers pass a tight budget and check for overflow
    (n_it == budget with work remaining would truncate gradients — the
    tracer's caller re-runs with the worst case if flagged).

    refill_every: bounces per refill.  The refill machinery (window slice +
    local gathers + merges) and the finish-position scatter cost ~85 us per
    pool iteration at B=8192 on v5e — comparable to the fused bounce kernel
    itself.  Running k bounces per refill pays them once per k tape rows; a
    lane whose ray finishes mid-block idles until the block ends (~+12%
    bounce slots at k=2 on the RTiOW workload — a net win, measured).  The
    TAPE FORMAT IS UNCHANGED: rows where a dead lane idles carry live=False
    and are pass-through in the backward and the oracle replay.
    """
    r = ray_o.shape[0]
    b = min(pool, r)
    k_sub = max(1, refill_every)
    t_budget = budget if budget is not None else tape_budget(r, max_depth, b, k_sub)

    if use_fused:
        from distributed_raytracer_tpu.ops.pallas.bounce_kernel import fused_bounce

        seed_base = jax.random.randint(key, (), 0, 2**31 - 1, dtype=jnp.int32)

    # Refill reads rays through a [B]-row dynamic-slice WINDOW at the
    # emitted counter instead of gathering from the full [R,3] table: the
    # taken ray ids are consecutive (emitted + rank), and a profiler trace
    # at R=262144/B=8192 showed the two full-table row gathers cost
    # 110 us/iteration EACH (~13 ns/row HBM gather) — 2.75x the fused
    # bounce kernel.  A window slice plus a local [B]-row gather runs at
    # small-table gather cost (~1.5 ns/row).  Rays are padded by B rows so
    # the slice never clamps (clamping would silently shift the window).
    pad = jnp.zeros((b, 3), ray_o.dtype)
    ray_o_w = jnp.concatenate([ray_o, pad])
    ray_d_w = jnp.concatenate([ray_d, pad])

    ft = ray_o.dtype  # f32 in production; f64 under x64 oracle checks
    tape0 = _Tape(
        fdata=jnp.zeros((t_budget, b, 16), ft),
        idata=jnp.zeros((t_budget, b, 3), jnp.int32),
    )

    def one_block(carry):
        (o, d, atten, lane_ray, lane_depth, live, emitted, pos, tape, it) = carry

        # --- refill free lanes from the ray queue (rank by cumsum);
        # paid ONCE per k_sub bounces ---
        free = ~live
        rank = jnp.cumsum(free.astype(jnp.int32)) - 1
        remaining = r - emitted
        take = free & (rank < remaining)
        nr = jnp.clip(emitted + jnp.where(take, rank, 0), 0, r - 1)
        tk = take[:, None]
        win_o = jax.lax.dynamic_slice_in_dim(ray_o_w, emitted, b, 0)
        win_d = jax.lax.dynamic_slice_in_dim(ray_d_w, emitted, b, 0)
        rk = jnp.clip(jnp.where(take, rank, 0), 0, b - 1)
        new_o, new_d = win_o[rk], win_d[rk]
        o = jnp.where(tk, new_o, o)
        d = jnp.where(tk, new_d, d)
        atten = jnp.where(tk, 1.0, atten)
        lane_ray = jnp.where(take, nr, lane_ray)
        lane_depth = jnp.where(take, 0, lane_depth)
        live = live | take
        emitted = emitted + jnp.sum(take, dtype=jnp.int32)

        # --- k_sub bounces for the pool; a lane that finishes mid-block
        # idles (live=False rows are pass-through in the backward) ---
        lane_iota = jnp.arange(b, dtype=jnp.int32)
        fin_flat = jnp.full((b,), -1, jnp.int32)  # tape-flat finish position
        for s in range(k_sub):
            it_s = it + s
            if use_fused:
                res = fused_bounce(
                    o, d, live, scene, seed_base + it_s * jnp.int32(65537),
                    **({"block_rays": block_rays} if block_rays else {}),
                )
                hit = res.hit & live
                idx, ruv, u = res.idx, res.ruv, res.u
                fin = (res.finished == 1) & live
                keep = live & ~fin
                # the kernel already emits MERGED next-ray state (new_o/new_d
                # are the original ray on non-kept lanes, bounce_kernel.py
                # _shade's keep-wheres) and per-bounce atten exactly 1.0
                # there — the host-side keep-wheres this replaces were
                # redundant per-slot work (bit-identical by IEEE x*1.0 == x)
                o2 = res.new_o
                d2 = res.new_d
                atten2 = atten * res.atten
                contrib = atten * res.color
            else:
                res = intersect_fn(o, d, scene)
                hit = res.hit & live
                idx = res.idx
                params = _gather_params(scene, idx, hit)
                ruv, u = _draws(jax.random.split(jax.random.fold_in(key, it_s), b))
                ruv, u = ruv.astype(ft), u.astype(ft)
                zero_c = jnp.zeros((b, 3), ft)
                o2, d2, atten2, contrib, keep = _local_bounce(
                    o, d, atten, zero_c, params, ruv, u, hit, live
                )
                fin = live & ~keep

            lane_depth2 = lane_depth + live.astype(jnp.int32)
            exhausted = keep & (lane_depth2 >= max_depth)

            # --- record this bounce, contrib included (2 slice writes) ---
            rec_f, rec_i = _pack_rec(_Rec(
                o=o, d=d, atten=atten, idx=idx, lane_ray=lane_ray,
                hit=hit, live=live, take=take, finished=fin, ruv=ruv, u=u,
                contrib=contrib,
            ))
            tape = _Tape(
                fdata=jax.lax.dynamic_update_index_in_dim(tape.fdata, rec_f, it_s, 0),
                idata=jax.lax.dynamic_update_index_in_dim(tape.idata, rec_i, it_s, 0),
            )
            # a lane finishes at most once per block (no refill mid-block)
            fin_flat = jnp.where(fin, it_s * b + lane_iota, fin_flat)
            o, d, atten = o2, d2, atten2
            lane_depth = lane_depth2
            live = keep & ~exhausted
            take = jnp.zeros_like(take)  # only the first row of a block refills

        # --- drain: record only WHERE each ray finished (ONE 1-D int
        # scatter per block; the colors themselves live on the tape and are
        # gathered once at the end — scatters are ~30x/row costlier than
        # gathers) ---
        slot = jnp.where(fin_flat >= 0, lane_ray, r + 1)
        pos = pos.at[slot].set(fin_flat, mode="drop", unique_indices=True)
        return (o, d, atten, lane_ray, lane_depth, live, emitted, pos,
                tape, it + k_sub)

    u_blocks = max(1, loop_unroll)

    def body(carry):
        # loop_unroll > 1 is a MEASURED NEGATIVE on v5e (36.6 ms vs 21.4 ms
        # forward at the official config): four dynamic-update-slices into
        # the same 100 MB tape carry per body defeat XLA's in-place while
        # aliasing and force buffer copies.  The knob stays for re-testing
        # on future toolchains; the backward's unroll (small carries) wins
        # and is on by default.
        for _ in range(u_blocks):
            carry = one_block(carry)
        return carry

    def cond(carry):
        live, emitted, it = carry[5], carry[6], carry[9]
        return ((emitted < r) | jnp.any(live)) & (
            it + k_sub * u_blocks <= t_budget
        )

    carry0 = (
        jnp.zeros((b, 3), ft),
        jnp.ones((b, 3), ft),   # nonzero dir: no 0-length rays pre-refill
        jnp.ones((b, 3), ft),
        jnp.zeros((b,), jnp.int32),
        jnp.zeros((b,), jnp.int32),
        jnp.zeros((b,), bool),
        jnp.asarray(0, jnp.int32),
        jnp.full((r + 2,), -1, jnp.int32),
        tape0,
        jnp.asarray(0, jnp.int32),
    )
    out = jax.lax.while_loop(cond, body, carry0)
    pos, tape, n_it = out[7][:r], out[8], out[9]
    # BUDGET OVERFLOW IS LOUD, not silent: if the loop exited at the budget
    # cap with work remaining (rays unemitted or lanes live), the render is
    # truncated and its gradients would be silently wrong — poison the
    # colors with NaN so any downstream loss/grad screams immediately.
    # Production callers (bench.py) pre-check the trip count untimed and
    # fall back to the worst-case budget.
    truncated = (out[6] < r) | jnp.any(out[5])
    # assemble per-ray colors with one gather from the tape's contrib
    # columns; depth-exhausted rays never finished (pos -1) -> black
    flat_contrib = tape.fdata[:, :, 13:16].reshape(t_budget * b, 3)
    flat_contrib = jnp.where(truncated, jnp.nan, flat_contrib)
    color = jnp.where(
        (pos >= 0)[:, None],
        flat_contrib[jnp.clip(pos, 0, t_budget * b - 1)],
        0.0,
    )
    return color, tape, n_it, pos


def _forward_tape_mega(
    scene: Scene,
    ray_o: jnp.ndarray,
    ray_d: jnp.ndarray,
    key: jax.Array,
    max_depth: int,
    pool: int,
    budget: Optional[int] = None,
    block_rays: int = 512,
    pad_rows: int = 2,
):
    """Recording wavefront forward as ONE Pallas mega-kernel
    (ops/pallas/mega_kernel.py): refill + fused bounce + tape record per
    grid step, pool state in VMEM scratch — the while-loop self time,
    refill machinery, keep/atten glue and tape pack of `_forward_tape`
    all disappear into the kernel.  Same (color, tape, n_it, pos)
    contract; the tape feeds the UNCHANGED `_backward_tape`/
    `replay_from_tape`.  Ray->lane assignment differs (private per-lane
    queues — a valid estimator of the same integral, like changing pool
    size).  TPU only (interpret mode on CPU for tests)."""
    from distributed_raytracer_tpu.ops.pallas.mega_kernel import (
        mega_forward,
    )

    r = ray_o.shape[0]
    b = min(pool, -(-r // 128) * 128)
    seed = jax.random.randint(key, (), 0, 2**31 - 1, dtype=jnp.int32)
    out = mega_forward(
        scene, ray_o, ray_d, seed, max_depth, pool=b,
        budget=(budget or 0), block_rays=block_rays, pad_rows=pad_rows,
    )
    t_budget = out.tape_f.shape[0]
    # one bulk transpose into the packed layouts the XLA backward consumes
    # (rows beyond n_it are uninitialized memory — never read: the backward
    # walks n_it..1 and pos only points below n_it*b).  The kernel's packed
    # [T, 16, B] sublane order IS the _Tape column order.
    fdata = out.tape_f.transpose(0, 2, 1)
    idata = out.tape_i[:, :3, :].transpose(0, 2, 1)
    tape = _Tape(fdata=fdata, idata=idata)
    pos = out.pos_cb.reshape(-1)[:r]
    # budget overflow is LOUD (same contract as _forward_tape): clean=0
    # means rays were left unfinished at the budget cap
    truncated = out.clean == 0
    flat_contrib = fdata[:, :, 13:16].reshape(t_budget * b, 3)
    flat_contrib = jnp.where(truncated, jnp.nan, flat_contrib)
    color = jnp.where(
        (pos >= 0)[:, None],
        flat_contrib[jnp.clip(pos, 0, t_budget * b - 1)],
        0.0,
    )
    return color, tape, out.n_it, pos


def camera_pos_from_tape(tape_i: jnp.ndarray, n_it, r: int,
                         flag_bit: int = 8) -> jnp.ndarray:
    """Per-ray flat tape finish positions [r] derived from the packed
    tape's fin flags — the camera-mode mega kernels skip the in-kernel
    dense pos update (a [C, B]-wide select per row, ~0.8 us at the
    production shape) since nothing in the camera fwd+bwd pipeline
    consumes pos; the replay-oracle entries rebuild it here with ONE bulk
    scatter.  -1 where a ray never finished (depth-exhausted).  Rows past
    n_it are uninitialized kernel memory and are masked out.

    flag_bit 8 (finished) -> finish positions; flag_bit 4 (take) ->
    REFILL positions (rpos — where the backward's dense primary-cotangent
    rows hold a ray's d_o/d_d, the camera-pose gradient hook)."""
    t, _, b = tape_i.shape
    flags = tape_i[:, 2, :]
    lray = tape_i[:, 1, :]
    live_rows = (
        jax.lax.broadcasted_iota(jnp.int32, (t, b), 0)
        < jnp.asarray(n_it, jnp.int32)
    )
    fin = ((flags & flag_bit) != 0) & live_rows
    flat = (
        jax.lax.broadcasted_iota(jnp.int32, (t, b), 0) * b
        + jax.lax.broadcasted_iota(jnp.int32, (t, b), 1)
    )
    idxs = jnp.where(fin, lray, r).reshape(-1)
    vals = jnp.where(fin, flat, -1).reshape(-1)
    out = jnp.full((r + 1,), -1, jnp.int32).at[idxs].set(vals, mode="drop")
    return out[:r]


def _forward_tape_camera_raw(
    scene: Scene,
    camera,
    pixel_ids: jnp.ndarray,
    key: jax.Array,
    pool: int = 2048,
    budget: Optional[int] = None,
    block_rays: int = 512,
    pad_rows: int = 2,
    iota_pix: bool = False,
):
    """Camera-mode recording forward (mega_forward_camera) unpacked into
    the (color, _Tape, n_it, pos) contract — the oracle/test entry for
    make_tape_camera_tracer (replay with rays_from_tape=True)."""
    from distributed_raytracer_tpu.ops.pallas.mega_kernel import (
        mega_forward_camera,
    )
    from distributed_raytracer_tpu.ops.pallas.mega_render_kernel import (
        camera_scalar_row,
    )

    r = pixel_ids.shape[0]
    b = min(pool, -(-r // 128) * 128)
    seed = jax.random.randint(key, (), 0, 2**31 - 1, dtype=jnp.int32)
    cam_seed = jax.random.randint(
        jax.random.fold_in(key, 0xCA3), (), 0, 2**31 - 1, dtype=jnp.int32
    )
    out = mega_forward_camera(
        scene, pixel_ids, seed, cam_seed, camera_scalar_row(camera),
        camera.image_width, camera.max_depth, pool=b, budget=(budget or 0),
        block_rays=block_rays, pad_rows=pad_rows, iota_pix=iota_pix,
    )
    fdata = out.tape_f.transpose(0, 2, 1)
    idata = out.tape_i[:, :3, :].transpose(0, 2, 1)
    tape = _Tape(fdata=fdata, idata=idata)
    # the camera kernel skips the in-kernel pos update; rebuild from flags
    pos = camera_pos_from_tape(out.tape_i, out.n_it, r)
    # camera mode emits DENSE [C, B] color homes — per-ray colors by pure
    # reshape, no tape-flat gather; truncation still NaN-poisons (loud)
    color = jnp.where(out.clean == 0, jnp.nan,
                      out.colors.reshape(-1, 3)[:r])
    return color, tape, out.n_it, pos


def _local_f(o, d, atten, color, cw, rw, aw, fw, iw, mat, ruv, u, hit, active):
    """The differentiable local bounce with unpacked winner params — shared
    with pathgrad's backward so the two estimators stay in lockstep."""
    params = dict(centers=cw, radii=rw, albedo=aw, fuzz=fw, ior=iw, mat=mat)
    o2, d2, atten2, color2, _ = _local_bounce(
        o, d, atten, color, params, ruv, u, hit, active
    )
    return o2, d2, atten2, color2


def _backward_tape(
    scene: Scene,
    tape: _Tape,
    n_it: jnp.ndarray,
    pos: jnp.ndarray,
    g_color: jnp.ndarray,
    segsum: str = "scatter",
    planar: bool = False,
    unroll: int = 1,
    ray_grads: bool = True,
):
    """Reverse replay of the iteration tape -> (d_scene, g_ray_o, g_ray_d).

    segsum: "scatter" (one stacked [B,9] -> [N+1,9] scatter-add per
    iteration) or "matmul" (one-hot on the MXU: segment-sum as
    one_hot(seg)^T @ d_params — TPUs do matmuls far faster than
    random-index scatters).

    pos [R] i32: per-ray flat tape position (it*B + lane) where the ray
    finished, -1 for depth-exhausted rays (from the forward).  The color
    cotangent is scattered ONCE into a tape-flat buffer at these unique
    positions and each backward iteration reads its [B,3] slice densely —
    a trace at R=262144/B=8192 showed the per-iteration
    g_color[lane_ray] full-table gather this replaces cost 68 us/iter
    (9.5 ms of a 15.3 ms backward).
    """
    r = g_color.shape[0]
    b = tape.fdata.shape[1]
    n = scene.num_spheres
    t_budget = tape.fdata.shape[0]
    flatn = t_budget * b
    posc = jnp.where(pos >= 0, pos, flatn)
    # always component-planar: a 2-D row scatter costs ~43 ns/row on TPU
    # (measured +11 ms at R=262144) vs ~5 ns/row for 1-D scatter-sets
    gc_flat = tuple(
        jnp.zeros((flatn + 1,), g_color.dtype)
        .at[posc].set(g_color[:, c], mode="drop", unique_indices=True)
        for c in range(3)
    )

    # ONE [N,10] winner-param table: per iteration a single 2-D row gather
    # replaces six per-field gathers — profiled on v5e, a 1-D gather from a
    # [512] table costs ~8 ns/row while a 2-D row gather costs ~1.5 ns/row;
    # the four scalar-field gathers were 80% of the backward loop.
    param_tab = jnp.concatenate(
        [
            scene.centers,                                # 0:3
            scene.radii[:, None],                         # 3
            scene.albedo,                                 # 4:7
            scene.fuzz[:, None],                          # 7
            scene.ior[:, None],                           # 8
            scene.mat_type.astype(tape.fdata.dtype)[:, None],  # 9
        ],
        axis=-1,
    )

    def one_row(carry):
        (it, cot_o, cot_d, cot_at, g_pm, g_ray_o, g_ray_d) = carry
        it = it - 1
        rec = _unpack_rec(
            jax.lax.dynamic_index_in_dim(tape.fdata, it, 0, keepdims=False),
            jax.lax.dynamic_index_in_dim(tape.idata, it, 0, keepdims=False),
        )

        # color cotangent enters where the ray finished: a dense [B,3]
        # slice of the pre-scattered tape-flat buffer (zero everywhere a
        # lane didn't finish, g_color[ray] exactly at its finish position)
        cot_c = jnp.stack(
            [
                jax.lax.dynamic_slice_in_dim(gc_flat[c], it * b, b, 0)
                for c in range(3)
            ],
            axis=-1,
        )

        g = param_tab[jnp.clip(rec.idx, 0, n - 1)]  # [B, 10] single row gather
        # numerically-safe values where the lane missed (results masked out)
        radii_s = jnp.where(rec.hit, g[:, 3], 1.0)
        ior_s = jnp.where(rec.hit, g[:, 8], 1.0)
        mat = g[:, 9].astype(jnp.int32)
        _, vjp = jax.vjp(
            _local_f,
            rec.o, rec.d, rec.atten, jnp.zeros((b, 3), rec.o.dtype),
            g[:, 0:3], radii_s, g[:, 4:7],
            g[:, 7], ior_s,
            mat, rec.ruv, rec.u, rec.hit, rec.live,
        )
        (d_o, d_d, d_at, _d_c, d_cw, d_rw, d_aw, d_fw, d_iw, *_rest) = vjp(
            (cot_o, cot_d, cot_at, cot_c)
        )

        # sphere-parameter cotangents, one stacked segment-sum
        seg = jnp.where(rec.hit, rec.idx, n)
        d_pm = jnp.concatenate(
            [d_cw, d_rw[:, None], d_aw, d_fw[:, None], d_iw[:, None]], axis=-1
        )  # [B, 9]
        if segsum == "matmul":
            # one-hot built directly in [N+1, B] orientation and contracted
            # over B — no [B, N+1] -> [N+1, B] transpose materializes
            oh_eq = jnp.arange(n + 1, dtype=jnp.int32)[:, None] == seg[None, :]
            dn = (((1,), (0,)), ((), ()))
            if d_pm.dtype == jnp.float32:
                # EXACT at DEFAULT-matmul cost, the bounce kernel's bf16x3
                # trick: split d_pm into hi/mid/lo bf16 planes (24 mantissa
                # bits), concat on the 9-wide axis (pads to 128 lanes either
                # way, so 27 is free), multiply by the exactly-bf16 one-hot
                # with f32 accumulation, recombine.  DEFAULT precision alone
                # would truncate the cotangents to bf16.
                # reduce_precision, NOT astype round-trips: under
                # --xla_allow_excess_precision=true XLA elides
                # f32->bf16->f32 casts, zeroing mid/lo (the same silent
                # truncation bug found in the bounce kernel's attr planes)
                hi_f = jax.lax.reduce_precision(d_pm, 8, 7)
                r1 = d_pm - hi_f
                mid_f = jax.lax.reduce_precision(r1, 8, 7)
                lo_f = r1 - mid_f
                planes = jnp.concatenate(
                    [hi_f.astype(jnp.bfloat16), mid_f.astype(jnp.bfloat16),
                     lo_f.astype(jnp.bfloat16)], axis=1
                )  # [B,27] bf16
                oh_t = oh_eq.astype(jnp.bfloat16)
                part = jax.lax.dot_general(
                    oh_t, planes, dimension_numbers=dn,
                    preferred_element_type=jnp.float32,
                )  # [N+1, 27] f32
                g_pm = g_pm + part[:, 0:9] + part[:, 9:18] + part[:, 18:27]
            else:
                # f64 oracle path (CPU x64): plain exact contraction
                g_pm = g_pm + jax.lax.dot_general(
                    oh_eq.astype(d_pm.dtype), d_pm, dimension_numbers=dn,
                    precision=jax.lax.Precision.HIGHEST,
                )
        else:
            g_pm = g_pm.at[seg].add(d_pm, mode="drop")

        # refill backward: ray born here -> emit primary cotangent, cut carry
        tk = rec.take[:, None]
        slot = jnp.where(rec.take, rec.lane_ray, r + 1)
        if not ray_grads:
            pass  # scene-only optimization: skip the per-row g_ray scatters
        elif planar:
            g_ray_o = tuple(
                g_ray_o[c].at[slot].set(d_o[:, c], mode="drop", unique_indices=True)
                for c in range(3)
            )
            g_ray_d = tuple(
                g_ray_d[c].at[slot].set(d_d[:, c], mode="drop", unique_indices=True)
                for c in range(3)
            )
        else:
            g_ray_o = g_ray_o.at[slot].set(d_o, mode="drop", unique_indices=True)
            g_ray_d = g_ray_d.at[slot].set(d_d, mode="drop", unique_indices=True)
        cot_o = jnp.where(tk, 0.0, d_o)
        cot_d = jnp.where(tk, 0.0, d_d)
        cot_at = jnp.where(tk, 0.0, d_at)
        return (it, cot_o, cot_d, cot_at, g_pm, g_ray_o, g_ray_d)

    def body(carry):
        # UNROLL rows per while iteration: the loop's fixed overhead
        # (carry bookkeeping, cond eval, scheduling) measured ~tens of us
        # per iteration; n_it is a multiple of the forward's refill_every
        # by construction, so unroll=refill_every divides it exactly.
        for _ in range(max(1, unroll)):
            carry = one_row(carry)
        return carry

    def cond(carry):
        return carry[0] > 0

    ft = tape.fdata.dtype
    if not ray_grads:
        # token-sized stand-ins: the big per-row g_ray carries (and their
        # ~10 us/row scatters) vanish from the loop entirely
        gr0 = (jnp.zeros((2,), ft),) * 3 if planar else jnp.zeros((2, 3), ft)
        gd0 = (jnp.zeros((2,), ft),) * 3 if planar else jnp.zeros((2, 3), ft)
    else:
        gr0 = (
            tuple(jnp.zeros((r + 2,), ft) for _ in range(3))
            if planar
            else jnp.zeros((r + 2, 3), ft)
        )
        gd0 = (
            tuple(jnp.zeros((r + 2,), ft) for _ in range(3))
            if planar
            else jnp.zeros((r + 2, 3), ft)
        )
    carry0 = (
        n_it,
        jnp.zeros((b, 3), ft),
        jnp.zeros((b, 3), ft),
        jnp.zeros((b, 3), ft),
        jnp.zeros((n + 1, 9), ft),
        gr0,
        gd0,
    )
    (_, _, _, _, g_pm, g_ray_o, g_ray_d) = jax.lax.while_loop(cond, body, carry0)

    d_scene = Scene(
        centers=g_pm[:n, 0:3],
        radii=g_pm[:n, 3],
        albedo=g_pm[:n, 4:7],
        mat_type=jnp.zeros_like(scene.mat_type),
        fuzz=g_pm[:n, 7],
        ior=g_pm[:n, 8],
    )
    if not ray_grads:
        g_o = jnp.zeros((r, 3), ft)
        g_d = jnp.zeros((r, 3), ft)
    elif planar:
        g_o = jnp.stack([c[:r] for c in g_ray_o], axis=-1)
        g_d = jnp.stack([c[:r] for c in g_ray_d], axis=-1)
    else:
        g_o, g_d = g_ray_o[:r], g_ray_d[:r]
    return d_scene, g_o, g_d


def replay_from_tape(scene: Scene, ray_o, ray_d, tape: _Tape, n_iters: int,
                     rays_from_tape: bool = False):
    """Pure-JAX re-execution of a recorded run with the control flow
    (take/idx/hit/live/finished) and draws frozen — differentiable by
    jax.grad; the ORACLE for `_backward_tape` (exact-match test).

    rays_from_tape=True: take rows use the RECORDED post-refill o/d
    instead of re-reading ray_o/ray_d — the camera-mode tapes
    (mega_forward_camera) generate primary rays in-kernel, so there are
    no ray inputs to re-read (pass anything [R, 3]-shaped; only its
    leading dim is used)."""
    r = ray_o.shape[0]
    b = tape.fdata.shape[1]

    def step(carry, packed):
        o, d, atten, out = carry
        rec = _unpack_rec(*packed)
        tk = rec.take[:, None]
        if rays_from_tape:
            o = jnp.where(tk, rec.o, o)
            d = jnp.where(tk, rec.d, d)
        else:
            nr = jnp.clip(rec.lane_ray, 0, r - 1)
            o = jnp.where(tk, ray_o[nr], o)
            d = jnp.where(tk, ray_d[nr], d)
        atten = jnp.where(tk, 1.0, atten)
        params = _gather_params(scene, rec.idx, rec.hit)
        o2, d2, atten2, contrib = _local_f(
            o, d, atten, jnp.zeros((b, 3), o.dtype),
            params["centers"], params["radii"], params["albedo"],
            params["fuzz"], params["ior"], params["mat"],
            rec.ruv, rec.u, rec.hit, rec.live,
        )
        slot = jnp.where(rec.finished, rec.lane_ray, r + 1)
        out = out.at[slot].set(contrib, mode="drop", unique_indices=True)
        return (o2, d2, atten2, out), None

    sl = (tape.fdata[:n_iters], tape.idata[:n_iters])
    ft = tape.fdata.dtype
    carry0 = (
        jnp.zeros((b, 3), ft),
        jnp.ones((b, 3), ft),
        jnp.ones((b, 3), ft),
        jnp.zeros((r + 2, 3), ft),
    )
    (_, _, _, out), _ = jax.lax.scan(step, carry0, sl)
    return out[:r]


def _make_mega_bwd_tracer(
    key: jax.Array,
    max_depth: int,
    pool: int,
    budget: Optional[int],
    block_rays: int,
    mega_pad: int,
    ray_grads: bool,
):
    """Tracer with BOTH directions as single Pallas programs: the mega
    forward (ops/pallas/mega_kernel.py) and the mega backward
    (ops/pallas/mega_bwd_kernel.py).  See make_tape_tracer(mega_bwd=True)."""
    from distributed_raytracer_tpu.ops.pallas.bounce_kernel import _auto_chunk
    from distributed_raytracer_tpu.ops.pallas.mega_bwd_kernel import (
        mega_backward,
    )
    from distributed_raytracer_tpu.ops.pallas.mega_kernel import (
        mega_forward,
        scene_sweep_arrays,
    )

    def run_fwd_raw(scene, ray_o, ray_d, k):
        r = ray_o.shape[0]
        b = min(pool, -(-r // 128) * 128)
        seed = jax.random.randint(k, (), 0, 2**31 - 1, dtype=jnp.int32)
        out = mega_forward(
            scene, ray_o, ray_d, seed, max_depth, pool=b,
            budget=(budget or 0), block_rays=block_rays, pad_rows=mega_pad,
        )
        t_budget = out.tape_f.shape[0]
        pos = out.pos_cb.reshape(-1)[:r]
        truncated = out.clean == 0
        # contrib sublanes 13:16 of the packed tape, flattened tape-major
        flat = out.tape_f[:, 13:16, :].transpose(0, 2, 1).reshape(-1, 3)
        flat = jnp.where(truncated, jnp.nan, flat)
        color = jnp.where(
            (pos >= 0)[:, None],
            flat[jnp.clip(pos, 0, t_budget * b - 1)],
            0.0,
        )
        return color, out

    @jax.custom_vjp
    def traced_k(scene, ray_o, ray_d, k):
        color, _ = run_fwd_raw(scene, ray_o, ray_d, k)
        return color

    def traced_fwd(scene, ray_o, ray_d, k):
        color, out = run_fwd_raw(scene, ray_o, ray_d, k)
        return color, (scene, out)

    def traced_bwd(res, g_color):
        scene, out = res
        n = scene.num_spheres
        m = _auto_chunk(n)
        # attr planes recomputed from the scene residual (cheap elementwise
        # vs carrying another [48, m] residual)
        _, attrs = scene_sweep_arrays(scene, m)
        g_pm, dd_rows = mega_backward(
            out.tape_f, out.tape_i, out.n_it, g_color, attrs, n=n,
            ray_grads=ray_grads,
        )
        d_scene = Scene(
            centers=g_pm[:n, 0:3],
            radii=g_pm[:n, 3],
            albedo=g_pm[:n, 4:7],
            mat_type=jnp.zeros_like(scene.mat_type),
            fuzz=g_pm[:n, 7],
            ior=g_pm[:n, 8],
        )
        r = g_color.shape[0]
        if ray_grads:
            tb, _, b = out.tape_f.shape
            rpos = out.rpos_cb.reshape(-1)[:r]

            def gather3(lo):
                # dd_rows [T, 8, B]: sublanes lo:lo+3, flattened tape-major
                flat = dd_rows[:, lo:lo + 3, :].transpose(0, 2, 1).reshape(-1, 3)
                return jnp.where(
                    (rpos >= 0)[:, None],
                    flat[jnp.clip(rpos, 0, tb * b - 1)],
                    0.0,
                )

            g_o, g_d = gather3(0), gather3(3)
        else:
            g_o = jnp.zeros((r, 3), g_color.dtype)
            g_d = jnp.zeros((r, 3), g_color.dtype)
        import numpy as _np

        d_k = _np.zeros(key.shape, dtype=jax.dtypes.float0)
        return d_scene, g_o, g_d, d_k

    traced_k.defvjp(traced_fwd, traced_bwd)

    def traced(scene, ray_o, ray_d, k=None):
        return traced_k(scene, ray_o, ray_d, key if k is None else k)

    return traced


def make_tape_camera_tracer(
    key: jax.Array,
    camera,
    max_depth: Optional[int] = None,
    pool: int = 2048,
    budget: Optional[int] = None,
    block_rays: int = 512,
    mega_pad: int = 2,
    iota_pix: bool = False,
    variant: str = "homes",
):
    """PRODUCTION fwd+bwd tracer with camera-mode primary rays: f(scene,
    pixel_ids [R] i32, k=None) -> colors [R, 3], scene-differentiable.

    Both directions are single Pallas programs (mega_forward_camera +
    mega_backward ray_grads=False); primary rays are generated IN-KERNEL
    from pixel ids + 24 SMEM camera scalars with (ray, cam_seed)-keyed
    hash jitter/defocus draws — no host-side ray pregen, no [C, B] x 6
    ray table (VERDICT r3 item 3).  The camera itself and the rays are
    NOT differentiated (the scene-optimization production shape; camera
    pose gradients live in grad/diff_render.py).

    variant (round 5):
      - "homes": dense [C, B] color homes + the attr-fetch mega backward
        (the round-4 shipping shape).
      - "unified": winner params recorded ON the tape (sublanes 16..25)
        and the WALK backward (mega_walk_bwd_kernel) replays it — no
        resident attr planes, no one-hot param fetch, factored MXU
        segment-sum; colors still from the homes.
      - "pos": "unified" but with NO color homes — the kernel keeps
        only the cheap [C, B] pos update; colors come from ONE bulk tape
        gather at pos (bulk GATHERS are bandwidth-class, DESIGN §4).
        Kills the 3 color-home selects + pending-color scratch per row.
      - "flat": like "pos" but pos is derived post-hoc from the fin
        flags.  MEASURED LOSS (bulk 3M-element scatter-sets are not
        bandwidth-class, ~14 ms at the official shape) — kept for the
        record.
    Colors are bit-identical across variants (same kernel body, same
    draws); gradients agree to f32 accumulation order."""
    import numpy as _np

    from distributed_raytracer_tpu.ops.camera import Camera
    from distributed_raytracer_tpu.ops.pallas.bounce_kernel import _auto_chunk
    from distributed_raytracer_tpu.ops.pallas.mega_bwd_kernel import (
        mega_backward,
    )
    from distributed_raytracer_tpu.ops.pallas.mega_kernel import (
        mega_forward_camera,
        scene_sweep_arrays,
    )
    from distributed_raytracer_tpu.ops.pallas.mega_render_kernel import (
        camera_scalar_row,
    )

    assert isinstance(camera, Camera)
    if variant not in ("homes", "unified", "pos", "flat"):
        raise ValueError(variant)
    depth = max_depth if max_depth is not None else camera.max_depth
    w = camera.image_width
    cam_row = camera_scalar_row(camera)
    record_params = variant != "homes"
    pack_ti = record_params  # ONE tape stream per row (i32 planes bitcast
    # onto tf sublanes 26..28) — per-row DMA issue, not bytes, is the cost
    cam_out = {"homes": "homes", "unified": "homes",
               "pos": "pos", "flat": "flat"}[variant]

    def run_fwd_raw(scene, pixel_ids, k, pix0):
        r = pixel_ids.shape[0]
        b = min(pool, -(-r // 128) * 128)
        seed = jax.random.randint(k, (), 0, 2**31 - 1, dtype=jnp.int32)
        cam_seed = jax.random.randint(
            jax.random.fold_in(k, 0xCA3), (), 0, 2**31 - 1, dtype=jnp.int32
        )
        out = mega_forward_camera(
            scene, pixel_ids, seed, cam_seed, cam_row, w, depth, pool=b,
            budget=(budget or 0), block_rays=block_rays, pad_rows=mega_pad,
            iota_pix=iota_pix, pix0=pix0, record_params=record_params,
            cam_out=cam_out, pack_ti=pack_ti,
        )
        if cam_out != "homes":
            # colors via the tape: pos (in-kernel for "pos", flag-derived
            # for "flat") + ONE bulk gather of the contrib sublanes
            t_budget2 = out.tape_f.shape[0]
            if cam_out == "pos":
                pos = out.pos_cb.reshape(-1)[:r]
            else:
                pos = camera_pos_from_tape(out.tape_i, out.n_it, r)
            flat = out.tape_f[:, 13:16, :].transpose(0, 2, 1).reshape(-1, 3)
            color = jnp.where(
                (pos >= 0)[:, None],
                flat[jnp.clip(pos, 0, t_budget2 * b - 1)],
                0.0,
            )
            color = jnp.where(out.clean == 0, jnp.nan, color)
        else:
            # dense [C, B] color homes: per-ray colors by pure reshape —
            # the tape-flat HBM gather this replaces cost ~13 ns/ray;
            # truncation NaN-poisons
            color = jnp.where(out.clean == 0, jnp.nan,
                              out.colors.reshape(-1, 3)[:r])
        return color, out

    @jax.custom_vjp
    def traced_k(scene, pixel_ids, k, pix0):
        color, _ = run_fwd_raw(scene, pixel_ids, k, pix0)
        return color

    def traced_fwd(scene, pixel_ids, k, pix0):
        color, out = run_fwd_raw(scene, pixel_ids, k, pix0)
        return color, (scene, out)

    def traced_bwd(res, g_color):
        scene, out = res
        n = scene.num_spheres
        if record_params:
            # the WALK backward replays the params-on-tape format: no
            # resident attrs, no one-hot param fetch, factored seg-sum;
            # idx is the scene index directly (identity "permutation")
            from distributed_raytracer_tpu.ops.pallas.mega_walk_bwd_kernel import (
                mega_walk_backward,
            )

            g_pm, _ = mega_walk_backward(
                out.tape_f, None, out.n_it, g_color, n_slots=n,
                ray_grads=False, packed_ti=True,
            )
        else:
            m = _auto_chunk(n)
            _, attrs = scene_sweep_arrays(scene, m)
            g_pm, _ = mega_backward(
                out.tape_f, out.tape_i, out.n_it, g_color, attrs, n=n,
                ray_grads=False,
            )
        d_scene = Scene(
            centers=g_pm[:n, 0:3],
            radii=g_pm[:n, 3],
            albedo=g_pm[:n, 4:7],
            mat_type=jnp.zeros_like(scene.mat_type),
            fuzz=g_pm[:n, 7],
            ior=g_pm[:n, 8],
        )
        d_ids = _np.zeros(g_color.shape[0], dtype=jax.dtypes.float0)
        d_k = _np.zeros(key.shape, dtype=jax.dtypes.float0)
        d_p0 = _np.zeros((), dtype=jax.dtypes.float0)
        return d_scene, d_ids, d_k, d_p0

    traced_k.defvjp(traced_fwd, traced_bwd)

    def traced(scene, pixel_ids, k=None, pix0=None):
        if pix0 is not None and not iota_pix:
            # the kernel only reads the pix0 scalar in the iota branch; a
            # table-mode caller passing a shard offset would silently get
            # wrong pixels (fold the offset into pixel_ids instead)
            raise ValueError(
                "pix0 requires iota_pix=True (table mode derives pixels "
                "from pixel_ids alone; add the offset to pixel_ids)")
        return traced_k(scene, pixel_ids, key if k is None else k,
                        jnp.zeros((), jnp.int32) if pix0 is None
                        else jnp.asarray(pix0, jnp.int32))

    return traced


def make_tape_camera_pose_tracer(
    key: jax.Array,
    camera,
    max_depth: Optional[int] = None,
    pool: int = 2048,
    budget: Optional[int] = None,
    block_rays: int = 512,
    mega_pad: int = 2,
):
    """CAMERA-POSE gradients on the PRODUCTION tape path (VERDICT r4
    item 9; camera.rs:238-262 as differentiable state): f(scene, cam_row)
    -> colors [n_pix, 3], differentiable w.r.t. the scene AND the (1, 24)
    camera-scalar row (center, pixel00, pixel deltas, defocus disk).

    Pass cam_row = camera_scalar_row(traced_camera) built from traced
    pose parameters (ops/camera.make_camera is jnp — XLA chains the
    cam_row cotangents to lookfrom/vfov/... automatically).  `camera` is
    the SHAPE TEMPLATE (width/height/depth statics); its values are
    superseded by cam_row.

    Machinery: the recording forward runs with winner params on tape
    (variant "unified"); the walk backward emits the dense primary-ray
    cotangent rows (ray_grads=True), which are gathered at each ray's
    REFILL position (derived from the take flags) and pushed through
    jax.vjp of camera_rays_host — the bit-exact host mirror of the
    in-kernel ray generation."""
    import numpy as _np

    from distributed_raytracer_tpu.ops.camera import Camera
    from distributed_raytracer_tpu.ops.pallas.mega_kernel import (
        mega_forward_camera,
    )
    from distributed_raytracer_tpu.ops.pallas.mega_walk_bwd_kernel import (
        mega_walk_backward,
    )
    from distributed_raytracer_tpu.ops.pallas.mega_render_kernel import (
        camera_rays_host,
    )

    assert isinstance(camera, Camera)
    depth = max_depth if max_depth is not None else camera.max_depth
    w = camera.image_width
    n_pix = camera.num_pixels

    def run_fwd_raw(scene, cam_row, k):
        r = n_pix
        b = min(pool, -(-r // 128) * 128)
        seed = jax.random.randint(k, (), 0, 2**31 - 1, dtype=jnp.int32)
        cam_seed = jax.random.randint(
            jax.random.fold_in(k, 0xCA3), (), 0, 2**31 - 1, dtype=jnp.int32
        )
        ids = jnp.zeros((r,), jnp.int32)  # shape stub (iota mode)
        out = mega_forward_camera(
            scene, ids, seed, cam_seed, cam_row, w, depth, pool=b,
            budget=(budget or 0), block_rays=block_rays, pad_rows=mega_pad,
            iota_pix=True, record_params=True, cam_out="pos",
            pack_ti=True,
        )
        t_budget2 = out.tape_f.shape[0]
        pos = out.pos_cb.reshape(-1)[:r]
        flat = out.tape_f[:, 13:16, :].transpose(0, 2, 1).reshape(-1, 3)
        color = jnp.where(
            (pos >= 0)[:, None],
            flat[jnp.clip(pos, 0, t_budget2 * b - 1)],
            0.0,
        )
        color = jnp.where(out.clean == 0, jnp.nan, color)
        return color, (out, cam_seed)

    @jax.custom_vjp
    def traced_k(scene, cam_row, k):
        color, _ = run_fwd_raw(scene, cam_row, k)
        return color

    def traced_fwd(scene, cam_row, k):
        color, (out, cam_seed) = run_fwd_raw(scene, cam_row, k)
        return color, (scene, cam_row, out, cam_seed)

    def traced_bwd(res, g_color):
        scene, cam_row, out, cam_seed = res
        n = scene.num_spheres
        g_pm, dd_rows = mega_walk_backward(
            out.tape_f, None, out.n_it, g_color, n_slots=n,
            ray_grads=True, packed_ti=True,
        )
        d_scene = Scene(
            centers=g_pm[:n, 0:3],
            radii=g_pm[:n, 3],
            albedo=g_pm[:n, 4:7],
            mat_type=jnp.zeros_like(scene.mat_type),
            fuzz=g_pm[:n, 7],
            ior=g_pm[:n, 8],
        )
        # primary-ray cotangents: gather the dense d_o/d_d rows at each
        # ray's REFILL position (take flags), then transpose through the
        # host camera-ray mirror into cam_row cotangents
        tb, _, b = out.tape_f.shape
        rpos = camera_pos_from_tape(out.tape_i, out.n_it, n_pix, flag_bit=4)

        def gather3(lo):
            flat = dd_rows[:, lo:lo + 3, :].transpose(0, 2, 1).reshape(-1, 3)
            return jnp.where(
                (rpos >= 0)[:, None],
                flat[jnp.clip(rpos, 0, tb * b - 1)],
                0.0,
            )

        g_o, g_d = gather3(0), gather3(3)
        pix = jnp.arange(n_pix, dtype=jnp.int32)
        _, vjp_cam = jax.vjp(
            lambda cr: camera_rays_host(cr, pix, pix, cam_seed, w), cam_row
        )
        (d_cam_row,) = vjp_cam((g_o, g_d))
        d_k = _np.zeros(key.shape, dtype=jax.dtypes.float0)
        return d_scene, d_cam_row, d_k

    traced_k.defvjp(traced_fwd, traced_bwd)

    def traced(scene, cam_row, k=None):
        return traced_k(scene, cam_row, key if k is None else k)

    return traced


def make_tape_camera_walk_tracer(
    key: jax.Array,
    camera,
    scene0: Scene,
    chunk: int = 256,
    max_depth: Optional[int] = None,
    pool: int = 2048,
    budget: Optional[int] = None,
    block_rays: int = 256,
    bound_slack: float = 0.0,
):
    """PRODUCTION fwd+bwd tracer for scenes PAST ONE SWEEP CHUNK: the
    recording WALK forward (mega_walk_kernel.mega_walk_forward_camera —
    the multi-chunk flagship render engine plus tape outputs) and the
    scene-size-independent walk backward (mega_walk_bwd_kernel), both
    single Pallas programs.  Lifts the dense camera tracer's 512-sphere
    cap (VERDICT r4 item 1; the reference's size-agnostic engine,
    hittable_list.rs:60-74 + object_server.rs:34-38, differentiable).

    f(scene, pixel_ids [R] i32, k=None, pix0=None) -> colors [R, 3],
    scene-differentiable.  pixel_ids is a SHAPE-ONLY stub (the walk
    kernel always derives pixels as pix0 + lane index — the iota_pix
    production shape); colors are BIT-IDENTICAL to the mega-walk render
    engine at equal seeds.

    scene0: the REFERENCE scene the static pack skeleton (Morton cluster
    permutation + chunk bounds + camera visit order) is built from, on
    the host, once.  The pack's VALUE arrays are rebuilt from the traced
    scene each call (walk_pack_arrays_from_scene), so gradients flow and
    param updates take effect — but the BOUNDS stay scene0's: rebuild the
    tracer when optimizing geometry far enough to escape a chunk bound
    (bound_slack inflates every bound radius by that much as headroom);
    albedo/fuzz/ior/material optimization never invalidates bounds."""
    import numpy as _np

    from distributed_raytracer_tpu.ops.camera import Camera
    from distributed_raytracer_tpu.ops.pallas.mega_walk_bwd_kernel import (
        mega_walk_backward,
    )
    from distributed_raytracer_tpu.ops.pallas.mega_walk_kernel import (
        mega_walk_forward_camera,
        walk_pack_arrays_from_scene,
        walk_pack_for,
    )
    from distributed_raytracer_tpu.ops.pallas.mega_render_kernel import (
        camera_scalar_row,
    )

    assert isinstance(camera, Camera)
    depth = max_depth if max_depth is not None else camera.max_depth
    w = camera.image_width
    cam_row = camera_scalar_row(camera)

    pack0 = walk_pack_for(scene0, camera, chunk=chunk)
    sto = _np.asarray(pack0.slot_to_orig)
    n_slots = int(sto.shape[0])
    n_orig = scene0.num_spheres
    # original -> slot; spheres absent from the pack (radius <= 0 padding
    # of scene0) map to the appended ZERO row, NOT the no-hit sentinel bin
    # (which accumulates miss-lane garbage cotangents)
    inv = _np.full(n_orig, n_slots, _np.int64)
    vmask = sto >= 0
    inv[sto[vmask]] = _np.where(vmask)[0]
    inv_j = jnp.asarray(inv, jnp.int32)
    bounds = pack0.bounds
    if bound_slack:
        b_np = _np.asarray(bounds).copy()
        finite = b_np[:, 3] > 0.0
        b_np[finite, 3] = (_np.sqrt(b_np[finite, 3]) + bound_slack) ** 2
        bounds = jnp.asarray(b_np)

    def run_fwd_raw(scene, pixel_ids, k, pix0):
        r = pixel_ids.shape[0]
        b = min(pool, -(-r // 128) * 128)
        seed = jax.random.randint(k, (), 0, 2**31 - 1, dtype=jnp.int32)
        cam_seed = jax.random.randint(
            jax.random.fold_in(k, 0xCA3), (), 0, 2**31 - 1, dtype=jnp.int32
        )
        scene_pack, attrs, _ = walk_pack_arrays_from_scene(
            scene, sto, chunk
        )
        out = mega_walk_forward_camera(
            scene_pack, attrs, bounds, cam_row, jnp.int32(0), seed,
            cam_seed, n_pix=r, w=w, max_depth=depth, chunk=chunk,
            n_chunks=pack0.n_chunks, pool=b, budget=(budget or 0),
            block_rays=block_rays, pix0=pix0, rid_base=jnp.int32(0),
        )
        color = jnp.where(out.clean == 0, jnp.nan,
                          out.colors.reshape(-1, 3)[:r])
        return color, out

    @jax.custom_vjp
    def traced_k(scene, pixel_ids, k, pix0):
        color, _ = run_fwd_raw(scene, pixel_ids, k, pix0)
        return color

    def traced_fwd(scene, pixel_ids, k, pix0):
        color, out = run_fwd_raw(scene, pixel_ids, k, pix0)
        return color, (scene, out)

    def traced_bwd(res, g_color):
        scene, out = res
        g_pm, _ = mega_walk_backward(
            out.tape_f, out.tape_i, out.n_it, g_color, n_slots=n_slots,
            ray_grads=False,
        )
        # per-slot -> per-original-sphere: drop the sentinel bin, append a
        # zero row for absent spheres, gather by the inverse permutation
        g_full = jnp.concatenate(
            [g_pm[:n_slots], jnp.zeros((1, 9), g_pm.dtype)], axis=0
        )
        g_orig = g_full[inv_j]
        d_scene = Scene(
            centers=g_orig[:, 0:3],
            radii=g_orig[:, 3],
            albedo=g_orig[:, 4:7],
            mat_type=jnp.zeros_like(scene.mat_type),
            fuzz=g_orig[:, 7],
            ior=g_orig[:, 8],
        )
        import numpy as __np

        d_ids = __np.zeros(g_color.shape[0], dtype=jax.dtypes.float0)
        d_k = __np.zeros(key.shape, dtype=jax.dtypes.float0)
        d_p0 = __np.zeros((), dtype=jax.dtypes.float0)
        return d_scene, d_ids, d_k, d_p0

    traced_k.defvjp(traced_fwd, traced_bwd)

    def traced(scene, pixel_ids, k=None, pix0=None):
        return traced_k(scene, pixel_ids, key if k is None else k,
                        jnp.zeros((), jnp.int32) if pix0 is None
                        else jnp.asarray(pix0, jnp.int32))

    return traced


def make_tape_tracer(
    key: jax.Array,
    max_depth: int,
    pool: int = 16384,
    intersect_fn=closest_hit,
    use_fused: bool = False,
    segsum: str = "scatter",
    budget: Optional[int] = None,
    planar: bool = False,
    refill_every: int = 1,
    block_rays: int = 0,
    loop_unroll: int = 1,
    use_mega: bool = False,
    mega_pad: int = 2,
    ray_grads: bool = True,
    mega_bwd: bool = False,
):
    """f(scene, ray_o, ray_d, k=None) -> colors [R,3] with the reverse-tape
    VJP.  The TPU production config is use_mega=True (the whole recording
    forward as ONE Pallas program, ops/pallas/mega_kernel.py); use_fused
    routes the host-loop forward through the fused bounce kernel (the
    round-2 production path, still the fallback for scenes larger than
    one sweep chunk).  block_rays: kernel ray-block width override
    (0 = kernel default).

    ray_grads=False: scene-only optimization (camera/rays fixed, the
    production inverse-rendering shape) — the backward skips the per-row
    primary-cotangent scatters into the [R]-sized g_ray buffers (measured
    ~10 us/row on v5e, the dominant share of the backward loop's self
    time) and returns ZERO d_ray_o/d_ray_d.  Differentiating w.r.t. rays
    with ray_grads=False silently yields zeros — only set it when rays
    are not optimized.

    mega_bwd=True (requires use_mega): the reverse tape walk ALSO runs as
    one Pallas program (ops/pallas/mega_bwd_kernel.py) — cotangent
    carries in VMEM scratch, color cotangents fetched in-kernel from the
    private-queue [C, B] layout (no scatter), winner params and the
    segment-sum via MXU one-hots.  Grads match the XLA backward to f32
    accumulation order (the rows-native VJP reassociates sums)."""
    if mega_bwd and not use_mega:
        raise ValueError("mega_bwd requires use_mega (private-queue tape)")
    if mega_bwd:
        return _make_mega_bwd_tracer(
            key, max_depth, pool, budget, block_rays or 512, mega_pad,
            ray_grads,
        )
    # the mega forward pads n_it to a multiple of mega_pad so the
    # backward's unrolled replay divides it exactly
    bwd_unroll = mega_pad if use_mega else max(1, refill_every)

    def run_fwd(scene, ray_o, ray_d, k):
        if use_mega:
            return _forward_tape_mega(
                scene, ray_o, ray_d, k, max_depth, pool, budget,
                block_rays or 512, mega_pad,
            )
        return _forward_tape(
            scene, ray_o, ray_d, k, max_depth, pool, intersect_fn, use_fused,
            budget, planar, refill_every, block_rays, loop_unroll,
        )

    @jax.custom_vjp
    def traced_k(scene, ray_o, ray_d, k):
        color, _, _, _ = run_fwd(scene, ray_o, ray_d, k)
        return color

    def traced_fwd(scene, ray_o, ray_d, k):
        color, tape, n_it, pos = run_fwd(scene, ray_o, ray_d, k)
        return color, (scene, tape, n_it, pos)

    def traced_bwd(res, g_color):
        scene, tape, n_it, pos = res
        d_scene, g_o, g_d = _backward_tape(
            scene, tape, n_it, pos, g_color, segsum, planar,
            unroll=bwd_unroll,
        )
        import numpy as _np

        d_k = _np.zeros(key.shape, dtype=jax.dtypes.float0)
        return d_scene, g_o, g_d, d_k

    traced_k.defvjp(traced_fwd, traced_bwd)

    def traced(scene, ray_o, ray_d, k=None):
        return traced_k(scene, ray_o, ray_d, key if k is None else k)

    return traced
