"""Pool-iteration MEGA-KERNEL: refill + fused bounce + tape record in ONE
Pallas program (the round-3 project scoped in docs/DESIGN.md §9).

The round-2 tape forward (grad/tapegrad.py::_forward_tape) spends ~10 ms
of its 21 ms outside the bounce kernel: lax.while_loop self time
(~21 us/iteration), refill machinery (cumsum rank + window slice +
merges), keep/atten glue, and the tape pack (2 dynamic-update-slices +
a 1-D position scatter per row).  This kernel eliminates ALL of those
classes: the grid dimension IS the tape-row loop, pool state lives in
VMEM scratch across grid steps, tape rows are ordinary blocked outputs,
and the per-ray finish position comes out as a DENSE array.

Two structural departures from the host-level wavefront make it possible:

1. PRIVATE PER-LANE RAY QUEUES.  The host refill assigns consecutive
   stream rays to scattered free lanes — needing a cumsum rank and a
   rank-indexed gather, both hostile inside Mosaic.  Here lane L owns
   rays L, L+B, L+2B, ...: its next ray is row c_L of the [C, B] ray
   table (C = ceil(R/B)) resident in VMEM, fetched with an iota-compare
   sublane select — no cumsum, no gather, no dynamic DMA.  The ray->lane
   assignment changes (a valid estimator of the same integral — the same
   class of difference as choosing another pool size); the TAPE FORMAT
   IS UNCHANGED (take/lane_ray record whatever assignment happened), so
   the reverse-tape backward and the replay oracle run unmodified.

2. DENSE POSITION OUTPUT.  A ray's id is c*B + lane, so its finish
   position has a HOME at [c, lane] of a [C, B] output updated with a
   masked dense write per row (the per-row 1-D scatter — ~5 ns/row, ~3 ms
   per render at production scale — disappears; pos[ray] is just
   reshape(pos_cb)[ray]).

Worst-case rows: each lane serially runs its <= C rays at <= max_depth
bounces -> T <= C * max_depth (tighter than the shared queue's bound).
Rows after all work completes are skipped via an SMEM done flag (each
skipped row costs only the grid-step block copies).  n_it is rounded up
to a multiple of `pad_rows` by letting the loop run dead rows (all lanes
idle — the backward treats live=0 rows as pass-through), so the
backward's unrolled replay divides n_it exactly.

Semantics: bounce = camera.rs:118-144 (ray_color_iteration), identical to
ops/pallas/bounce_kernel.py whose _sweep_winner/_shade_vals bodies are
shared.  RNG: on-core PRNG seeded per (row, sub-block).  Forward-only;
gradients = grad/tapegrad.py's reverse tape walk over this kernel's
outputs.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from distributed_raytracer_tpu.core.vecmath import BIG
from distributed_raytracer_tpu.models.scene import ABSORB, Scene
from distributed_raytracer_tpu.ops.pallas.bounce_kernel import (
    _A_ROWS,
    _auto_chunk,
    _shade_vals,
    _sweep_winner,
    LANE,
)
from distributed_raytracer_tpu.ops.pallas.culled_bounce_kernel import _hash_u01


class MegaOut(NamedTuple):
    """Raw kernel outputs (PACKED tape rows + dense pos + meta).

    Round-4 repack: the round-3 kernel emitted 19 separate [T, 1, B] row
    planes — 19 block copy-outs per grid step; the per-step DMA issue
    overhead (not the bytes) was the dominant fixed cost of a tape row
    (16.6 us/row vs the 3-output render kernel's 5.6 us/row at the same
    sweep+shade work).  Packing the 16 f32 planes into ONE [T, 16, B]
    output (sublane = plane — the same tiling bytes) and the 3 i32 planes
    into ONE [T, 8, B] cuts a row's copy-outs from 19 to 2.
    """

    tape_f: jnp.ndarray  # [T, 16, B] f32, sublanes: o3 d3 atten3 ruv3 u contrib3
    tape_i: jnp.ndarray  # [T, 8, B] i32, sublanes: idx lane_ray flags (5 pad)
    pos_cb: jnp.ndarray  # [C, B] i32 flat tape finish position, -1 = none;
    # None in camera mode (derive via tapegrad.camera_pos_from_tape)
    rpos_cb: jnp.ndarray  # [C, B] i32 flat tape REFILL position, -1 = none
    # (ray c*B+lane was taken at row rpos//B, lane rpos%B — where the
    # mega backward's dense primary-cotangent rows hold its d_o/d_d);
    # None in camera mode (flag_bit=4 derivation)
    n_it: jnp.ndarray    # scalar i32 rows recorded
    clean: jnp.ndarray   # scalar i32: 1 = all rays accounted (no truncation)
    colors: jnp.ndarray = None  # camera mode only: [C, B, 3] f32 dense
    # color homes (ray c*B+lane at [c, lane]) — per-ray colors WITHOUT the
    # tape-flat gather; None in ray mode


# tape_f sublane indices (matches grad/tapegrad._Tape's fdata column order)
_TF_O, _TF_D, _TF_AT, _TF_RU, _TF_U, _TF_CO = 0, 3, 6, 9, 12, 13
# tape_i sublane indices
_TI_IDX, _TI_LRAY, _TI_FLG = 0, 1, 2


def _mega_kernel(
    scal_ref,                                   # (1,4) SMEM i32: seed cam_seed
    #                                             rid_base (pad)
    *refs,
    r: int, b: int, br: int, c_rows: int, max_depth: int,
    pad_rows: int, camera_mode: bool = False, w: int = 0,
    iota_pix: bool = False, record_params: bool = False,
    cam_out: str = "homes", pack_ti: bool = False,
):
    """Body shared by the ray-table and camera modes.

    ray mode operands: 6 x [C, B] ray tables then scene.
    camera mode (round 4): a (1, 24) SMEM camera-scalar row + ONE [C, B]
    i32 pixel-id table replace the 6 f32 ray tables — the primary ray is
    generated IN-KERNEL at refill (mega_render_kernel.camera_ray_rows,
    camera.rs:238-251), freeing 5 [C, B] planes of VMEM and 5/6 of the
    refill's one-hot fetch work.

    ALL draws are the (rid, depth)-keyed hash (_hash_u01), the render
    kernel's exact scheme: camera jitter/defocus keyed (rid, cam_seed,
    8..11), bounce draws keyed (rid, seed + depth*65537, 0..4), where rid
    = rid_base + pixel id in camera mode (GLOBAL pixel identity — the
    dp-sharded tape path draws shard-invariant noise) and rid_base + ray
    index in ray mode.  Consequences: the recording camera forward is
    BIT-IDENTICAL to the mega render kernel at equal seeds (pinned in
    tests), pool/block/budget become pure performance knobs for the tape
    path too, and interpret-mode tests see real noise
    (pltpu.prng_random_bits returns zeros on CPU).  The draws are still
    RECORDED on the tape (ruv/u planes): the packed [1, 16, B] block's
    HBM tiles pad 12 -> 16 sublanes anyway, so dropping them saves no
    bandwidth, and stored draws keep the XLA backward and the replay
    oracle exact on every backend.
    """
    if camera_mode:
        # camera mode adds DENSE [C, B] color-home outputs (the render
        # kernel's drain) + pending-color scratch: per-ray colors come
        # out positionally instead of through a tape-flat HBM gather
        # (~13 ns/row — several ms at production ray counts).
        # camera mode has no pos/rpos outputs (round 5): nothing in the
        # fwd+bwd pipeline consumes them — finish/refill positions are
        # derivable from the tape's fin/take flags
        # (tapegrad.camera_pos_from_tape) — and the dead [C, B] outputs
        # cost scoped VMEM the kernel needs at production budgets
        # iota_pix drops the pix_tab operand outright: pixels are derived
        # arithmetically and the dead [C, B] table costs scoped VMEM
        rest = list(refs)
        cam_ref = rest.pop(0)
        pix_tab = None if iota_pix else rest.pop(0)
        if pack_ti:
            # ONE tape output: the i32 planes (idx/lane_ray/flags) ride
            # tf_o sublanes 26..28 as BITCAST f32 — one block copy-out
            # per row instead of two (per-row DMA issue overhead, not
            # bytes, is the fixed cost — DESIGN §15 step 1)
            (cx_ref, cy_ref, cz_ref, r2_ref, attr_ref, tf_o) = rest[0:6]
            del rest[0:6]
            ti_o = None
        else:
            (cx_ref, cy_ref, cz_ref, r2_ref, attr_ref, tf_o, ti_o) = rest[0:7]
            del rest[0:7]
        # cam_out (round 5 sweep, DESIGN §20):
        #   "homes" — [C, B] color homes (round 4; pos derivable);
        #   "flat"  — no homes, no pos: colors from the tape via a post-
        #             hoc pos scatter.  MEASURED LOSS (bulk 3M-element
        #             scatter-sets are NOT bandwidth-class, ~14 ms) —
        #             kept for the record;
        #   "pos"   — no homes, but the cheap in-kernel [C, B] pos update
        #             stays; colors come from ONE bulk tape gather (bulk
        #             GATHERS are bandwidth-class).  Kills the 3 color-
        #             home selects + pending-color scratch per row.
        pos_o = None
        if cam_out == "homes":
            (col_r, col_g, col_b) = rest[0:3]
            del rest[0:3]
        else:
            col_r = col_g = col_b = None
            if cam_out == "pos":
                pos_o = rest.pop(0)
        (meta_o,
         sox, soy, soz, sdx, sdy, sdz,
         sar, sag, sab,
         scur, snext, sdepth, slive, sfin, spix,
         rbx, rby, rbz, rcx, rcy, rcz) = rest[0:22]
        del rest[0:22]
        if cam_out == "homes":
            (ccr, ccg, ccb) = rest[0:3]
            del rest[0:3]
        else:
            ccr = ccg = ccb = None
        (done_s,) = rest
    else:
        (tox, toy, toz, tdx, tdy, tdz,
         cx_ref, cy_ref, cz_ref, r2_ref, attr_ref,
         tf_o, ti_o, pos_o, rpos_o, meta_o,
         sox, soy, soz, sdx, sdy, sdz,
         sar, sag, sab,
         scur, snext, sdepth, slive, sfin, spix,
         rbx, rby, rbz, rcx, rcy, rcz,
         done_s) = refs
    it = pl.program_id(0)
    i32 = jnp.int32

    @pl.when(it == 0)
    def _init():
        z = jnp.zeros((1, b), jnp.float32)
        one = jnp.ones((1, b), jnp.float32)
        zi = jnp.zeros((1, b), i32)
        sox[:], soy[:], soz[:] = z, z, z
        sdx[:], sdy[:], sdz[:] = one, one, one  # nonzero dir pre-refill
        sar[:], sag[:], sab[:] = one, one, one
        scur[:], snext[:], sdepth[:], slive[:], sfin[:] = zi, zi, zi, zi, zi
        spix[:] = zi
        done_s[0, 0] = 0
        meta_o[0, 0] = 0
        meta_o[0, 1] = 0
        if camera_mode and cam_out == "homes":
            ccr[:], ccg[:], ccb[:] = z, z, z
            col_r[:] = jnp.zeros_like(col_r)
            col_g[:] = jnp.zeros_like(col_g)
            col_b[:] = jnp.zeros_like(col_b)
        if camera_mode and cam_out == "pos":
            pos_o[:] = jnp.full_like(pos_o, -1)
        if not camera_mode:
            pos_o[:] = jnp.full_like(pos_o, -1)
            rpos_o[:] = jnp.full_like(rpos_o, -1)

    @pl.when(done_s[0, 0] == 0)
    def _row():
        lane = jax.lax.broadcasted_iota(i32, (1, b), 1)
        live0 = slive[:] > 0
        cnext = snext[:]
        has_next = cnext * b + lane < r
        take = (~live0) & has_next
        n_take = jnp.sum(take.astype(i32))

        # --- refill: private-queue fetch, skipped entirely when no lane
        # takes (drain tail / post-exhaust rows) ---
        @pl.when(n_take > 0)
        def _refill():
            rows_i = jax.lax.broadcasted_iota(i32, (c_rows, b), 0)
            tk = take

            if camera_mode:
                from distributed_raytracer_tpu.ops.pallas.mega_render_kernel import (
                    camera_ray_rows,
                )

                if iota_pix:
                    # pixel_ids == pix0 + arange(R): pixel = offset + ray
                    # index, no table scan (the full-image / contiguous-
                    # shard production shapes — saves a [C, B] one-hot
                    # fetch per refill row)
                    pix = scal_ref[0, 3] + jnp.minimum(cnext * b + lane, r - 1)
                else:
                    pix = jnp.sum(
                        jnp.where(rows_i == cnext, pix_tab[:], 0),
                        axis=0, keepdims=True,
                    )
                # GLOBAL pixel identity keys the camera draws — the render
                # kernel's exact keying (rid_base + pix), so the recording
                # forward's primaries are bit-identical to the render
                # engine's and shard-invariant under dp pixel sharding
                rid = scal_ref[0, 2] + pix
                spix[:] = jnp.where(take, pix, spix[:])
                nox_r, noy_r, noz_r, ndx_r, ndy_r, ndz_r = camera_ray_rows(
                    cam_ref, pix, rid, scal_ref[0, 1], w
                )
            else:
                sel = (rows_i == cnext).astype(jnp.float32)  # (C, B) one-hot

                def fetch(tab):
                    return jnp.sum(sel * tab[:], axis=0, keepdims=True)

                nox_r, noy_r, noz_r = fetch(tox), fetch(toy), fetch(toz)
                ndx_r, ndy_r, ndz_r = fetch(tdx), fetch(tdy), fetch(tdz)
                # ray index keys the bounce draws in ray mode
                spix[:] = jnp.where(take, cnext * b + lane, spix[:])

            sox[:] = jnp.where(tk, nox_r, sox[:])
            soy[:] = jnp.where(tk, noy_r, soy[:])
            soz[:] = jnp.where(tk, noz_r, soz[:])
            sdx[:] = jnp.where(tk, ndx_r, sdx[:])
            sdy[:] = jnp.where(tk, ndy_r, sdy[:])
            sdz[:] = jnp.where(tk, ndz_r, sdz[:])
            sar[:] = jnp.where(tk, 1.0, sar[:])
            sag[:] = jnp.where(tk, 1.0, sag[:])
            sab[:] = jnp.where(tk, 1.0, sab[:])
            scur[:] = jnp.where(tk, cnext, scur[:])
            sdepth[:] = jnp.where(tk, 0, sdepth[:])
            slive[:] = (live0 | tk).astype(i32)
            snext[:] = cnext + tk.astype(i32)
            # record WHERE each ray was refilled (dense, like pos_o): the
            # mega backward's dense d_o/d_d rows are gathered here.  Camera
            # mode has no ray inputs, hence no ray grads — skip the update
            # (rpos_o keeps its init fill, never read)
            if not camera_mode:
                sel_take = (rows_i == cnext) & tk
                rpos_o[:] = jnp.where(sel_take, it * b + lane, rpos_o[:])

        # --- post-refill state (source of truth: scratch) ---
        ox, oy, oz = sox[:], soy[:], soz[:]
        dx, dy, dz = sdx[:], sdy[:], sdz[:]
        ar, ag, ab = sar[:], sag[:], sab[:]
        live = slive[:] > 0
        c_cur = scur[:]
        lane_ray = c_cur * b + lane
        rid_full = scal_ref[0, 2] + spix[:] if camera_mode else lane_ray
        dep_full = sdepth[:]

        # --- tape row: PRE-bounce state (matches _forward_tape's record),
        # written as sublane rows of the single packed block ---
        tf_o[0, _TF_O + 0:_TF_O + 1, :] = ox
        tf_o[0, _TF_O + 1:_TF_O + 2, :] = oy
        tf_o[0, _TF_O + 2:_TF_O + 3, :] = oz
        tf_o[0, _TF_D + 0:_TF_D + 1, :] = dx
        tf_o[0, _TF_D + 1:_TF_D + 2, :] = dy
        tf_o[0, _TF_D + 2:_TF_D + 3, :] = dz
        tf_o[0, _TF_AT + 0:_TF_AT + 1, :] = ar
        tf_o[0, _TF_AT + 1:_TF_AT + 2, :] = ag
        tf_o[0, _TF_AT + 2:_TF_AT + 3, :] = ab
        if pack_ti:
            tf_o[0, 27:28, :] = jax.lax.bitcast_convert_type(
                lane_ray, jnp.float32)
        else:
            ti_o[0, _TI_LRAY:_TI_LRAY + 1, :] = lane_ray

        # --- one fused bounce, sub-block by sub-block ---
        for sb in range(b // br):
            sl = slice(sb * br, (sb + 1) * br)
            # REBASE the sub-block's ray rows to lane offset 0 through
            # (1, BR) scratch: a lane-sliced row keeps its source offset in
            # its Mosaic layout, and vector.broadcast (1,BR)->(m,BR) — the
            # sweep's column expansion — rejects non-zero offsets
            # ("Invalid input layout", found on hardware)
            rbx[:] = ox[:, sl]
            rby[:] = oy[:, sl]
            rbz[:] = oz[:, sl]
            rcx[:] = dx[:, sl]
            rcy[:] = dy[:, sl]
            rcz[:] = dz[:, sl]
            oxs, oys, ozs = rbx[:], rby[:], rbz[:]
            dxs, dys, dzs = rcx[:], rcy[:], rcz[:]
            a_s = dxs * dxs + dys * dys + dzs * dzs
            inv_s = 1.0 / a_s
            act = live[:, sl]

            t_c, wa = _sweep_winner(
                oxs, oys, ozs, dxs, dys, dzs, a_s, inv_s,
                cx_ref[:], cy_ref[:], cz_ref[:], r2_ref[:], attr_ref[:],
            )
            # (rid, depth)-keyed hash draws — the render kernel's scheme
            seed_row = scal_ref[0, 0] + dep_full[:, sl] * jnp.int32(65537)
            rid_sl = rid_full[:, sl]
            draws = tuple(_hash_u01(rid_sl, seed_row, dd) for dd in range(5))
            (nox, noy, noz, ndx, ndy, ndz, atr, atg, atb,
             cor, cog, cob, fin_row, idx_row,
             rux, ruy, ruz, u_ch) = _shade_vals(
                oxs, oys, ozs, dxs, dys, dzs, a_s, act, t_c, wa, draws=draws
            )
            hit_row = ((t_c < BIG * 0.5) & act).astype(i32)

            # draws + results onto the tape (contrib = atten * color)
            tf_o[0, _TF_RU + 0:_TF_RU + 1, sl] = rux
            tf_o[0, _TF_RU + 1:_TF_RU + 2, sl] = ruy
            tf_o[0, _TF_RU + 2:_TF_RU + 3, sl] = ruz
            tf_o[0, _TF_U:_TF_U + 1, sl] = u_ch
            if pack_ti:
                tf_o[0, 26:27, sl] = jax.lax.bitcast_convert_type(
                    idx_row, jnp.float32)
            else:
                ti_o[0, _TI_IDX:_TI_IDX + 1, sl] = idx_row
            tf_o[0, _TF_CO + 0:_TF_CO + 1, sl] = ar[:, sl] * cor
            tf_o[0, _TF_CO + 1:_TF_CO + 2, sl] = ag[:, sl] * cog
            tf_o[0, _TF_CO + 2:_TF_CO + 3, sl] = ab[:, sl] * cob
            fin_b = (fin_row > 0) & act
            flags_row = (
                hit_row
                | (act.astype(i32) << 1)
                | (take[:, sl].astype(i32) << 2)
                | (fin_b.astype(i32) << 3)
            )
            if pack_ti:
                tf_o[0, 28:29, sl] = jax.lax.bitcast_convert_type(
                    flags_row, jnp.float32)
            else:
                ti_o[0, _TI_FLG:_TI_FLG + 1, sl] = flags_row
            if record_params:
                # WINNER PARAMS onto tape sublanes 16..25 (the walk tape's
                # layout, mega_walk_kernel.MegaWalkTapeOut): the backward
                # becomes mega_walk_bwd_kernel — no resident attr planes,
                # no O(m*B) one-hot param fetch per row
                for j in range(10):
                    tf_o[0, 16 + j:17 + j, sl] = wa[j:j + 1, :]
            if camera_mode and cam_out == "homes":
                ccr[0, sl] = jnp.where(fin_b, ar[:, sl] * cor, ccr[:, sl])[0]
                ccg[0, sl] = jnp.where(fin_b, ag[:, sl] * cog, ccg[:, sl])[0]
                ccb[0, sl] = jnp.where(fin_b, ab[:, sl] * cob, ccb[:, sl])[0]

            # state update (shade outputs are already keep-merged; atten is
            # exactly 1.0 on non-kept lanes)
            keep = act & ~fin_b
            depth2 = sdepth[:, sl] + act.astype(i32)
            exhausted = keep & (depth2 >= max_depth)
            sox[0, sl] = nox[0]
            soy[0, sl] = noy[0]
            soz[0, sl] = noz[0]
            sdx[0, sl] = ndx[0]
            sdy[0, sl] = ndy[0]
            sdz[0, sl] = ndz[0]
            sar[0, sl] = (ar[:, sl] * atr)[0]
            sag[0, sl] = (ag[:, sl] * atg)[0]
            sab[0, sl] = (ab[:, sl] * atb)[0]
            sdepth[0, sl] = depth2[0]
            slive[0, sl] = (keep & ~exhausted).astype(i32)[0]
            sfin[0, sl] = fin_b.astype(i32)[0]

        # --- dense finish-position update: ray (c, lane) finished at flat
        # tape position it*B + lane.  Camera mode SKIPS it (round 5): the
        # camera backward fetches g_color by [C, B] table + fin flags and
        # colors come from the dense homes, so nothing consumes pos — and
        # the [C, B]-wide select costs ~0.8 us/row at the production
        # shape (396 x 2048).  The oracle entry derives pos from the
        # tape's fin flags post-hoc (tapegrad.camera_pos_from_tape). ---
        if not (camera_mode and cam_out == "flat"):
            fin_full = sfin[:] > 0
            rows_i = jax.lax.broadcasted_iota(i32, (c_rows, b), 0)
            sel_fin = (rows_i == c_cur) & fin_full
            if camera_mode and cam_out == "homes":
                col_r[:] = jnp.where(sel_fin, ccr[:], col_r[:])
                col_g[:] = jnp.where(sel_fin, ccg[:], col_g[:])
                col_b[:] = jnp.where(sel_fin, ccb[:], col_b[:])
            else:
                pos_o[:] = jnp.where(sel_fin, it * b + lane, pos_o[:])

        # --- termination (+ parity pad so n_it % pad_rows == 0: the extra
        # rows run with every lane idle and record as pass-through) ---
        live2 = slive[:] > 0
        rem = jnp.sum((snext[:] * b + lane < r).astype(i32))
        natural_done = (rem == 0) & (jnp.sum(live2.astype(i32)) == 0)
        meta_o[0, 0] = it + 1
        meta_o[0, 1] = natural_done.astype(i32)
        done_s[0, 0] = (
            natural_done & (((it + 1) % pad_rows) == 0)
        ).astype(i32)


def scene_sweep_arrays(scene: Scene, m: int):
    """Sweep columns [m,1] x4 + attr planes [48, m] bf16 for a SINGLE
    chunk of m (lane-padded) spheres — the same construction as
    fused_bounce_rows' (bounce_kernel.py), without the per-chunk blocking.
    reduce_precision (not astype round-trips) keeps the hi/mid/lo split
    exact under --xla_allow_excess_precision=true."""
    n0 = scene.num_spheres
    pad_s = m - n0
    if pad_s < 0:
        raise ValueError(f"scene {n0} spheres > mega chunk {m}")

    def spad(x, fill=0.0):
        return jnp.pad(x, (0, pad_s), constant_values=fill)

    def scol(x, fill=0.0):
        return spad(x, fill).reshape(m, 1)

    r2 = jnp.where(scene.radii > 0.0, scene.radii * scene.radii, -1.0)
    scene_cols = [
        scol(scene.centers[:, 0]),
        scol(scene.centers[:, 1]),
        scol(scene.centers[:, 2]),
        scol(r2, fill=-1.0),
    ]
    zero_m = jnp.zeros((m,), jnp.float32)
    attr_rows = jnp.stack(
        [
            spad(scene.centers[:, 0]),
            spad(scene.centers[:, 1]),
            spad(scene.centers[:, 2]),
            spad(scene.radii, fill=1.0),
            spad(scene.albedo[:, 0]),
            spad(scene.albedo[:, 1]),
            spad(scene.albedo[:, 2]),
            spad(scene.fuzz),
            spad(scene.ior, fill=1.0),
            spad(scene.mat_type.astype(jnp.float32), fill=float(ABSORB)),
            jnp.arange(m, dtype=jnp.float32),
        ]
        + [zero_m] * (_A_ROWS - 11),
        axis=0,
    )
    hi_f = jax.lax.reduce_precision(attr_rows, 8, 7)
    r1 = attr_rows - hi_f
    mid_f = jax.lax.reduce_precision(r1, 8, 7)
    lo_f = r1 - mid_f
    attrs = jnp.concatenate(
        [hi_f.astype(jnp.bfloat16), mid_f.astype(jnp.bfloat16),
         lo_f.astype(jnp.bfloat16)], axis=0
    )  # [48, m]
    return scene_cols, attrs


def mega_budget(r: int, max_depth: int, pool: int, pad_rows: int = 2) -> int:
    """Worst-case tape rows for the private-queue pool: each lane serially
    runs its ceil(R/B) rays at <= max_depth bounces."""
    c_rows = -(-r // pool)
    t = c_rows * max_depth + 1
    return -(-t // pad_rows) * pad_rows


@functools.partial(
    jax.jit, static_argnames=("max_depth", "pool", "budget", "block_rays",
                              "pad_rows")
)
def mega_forward(
    scene: Scene,
    ray_o: jnp.ndarray,
    ray_d: jnp.ndarray,
    seed: jnp.ndarray,
    max_depth: int,
    pool: int = 2048,
    budget: int = 0,
    block_rays: int = 512,
    pad_rows: int = 2,
) -> MegaOut:
    """Run the whole recording wavefront as one pallas_call.

    budget=0 -> the proven worst case (mega_budget).  The ray table
    (ceil(R/B) x B x 6 f32) must fit VMEM alongside the scene — at the
    production config (262,144 rays, pool 2048) it is 6 MB."""
    r = ray_o.shape[0]
    b = pool
    if b % LANE:
        raise ValueError(f"pool must be a multiple of {LANE}")
    br = min(block_rays, b)
    if b % br:
        raise ValueError(f"pool {b} not a multiple of block_rays {br}")
    c_rows = -(-r // b)
    t_budget = budget or mega_budget(r, max_depth, b, pad_rows)
    if t_budget % pad_rows:
        raise ValueError(f"budget {t_budget} % pad_rows {pad_rows} != 0")

    m = _auto_chunk(scene.num_spheres)
    if m < -(-scene.num_spheres // LANE) * LANE:
        raise ValueError(
            f"mega kernel sweeps one chunk: scene {scene.num_spheres} "
            f"exceeds chunk {m}")
    scene_cols, attrs = scene_sweep_arrays(scene, m)

    # ray table [C, B]: ray id c*B + lane at [c, lane]; padding rays have
    # d=(1,1,1) (never taken: has_next masks ids >= R)
    pad_n = c_rows * b - r

    def tab(x, fill):
        return jnp.pad(x, (0, pad_n), constant_values=fill).reshape(c_rows, b)

    tables = [
        tab(ray_o[:, 0], 0.0), tab(ray_o[:, 1], 0.0), tab(ray_o[:, 2], 0.0),
        tab(ray_d[:, 0], 1.0), tab(ray_d[:, 1], 1.0), tab(ray_d[:, 2], 1.0),
    ]
    whole = lambda shape: pl.BlockSpec(shape, lambda i: tuple(0 for _ in shape),
                                       memory_space=pltpu.VMEM)
    scal = jnp.stack(
        [jnp.asarray(seed, jnp.int32)] + [jnp.zeros((), jnp.int32)] * 3
    ).reshape(1, 4)
    return _mega_call(
        scal, tables, [whole((c_rows, b))] * 6, scene_cols, attrs,
        r=r, b=b, br=br, c_rows=c_rows, max_depth=max_depth,
        pad_rows=pad_rows, t_budget=t_budget, m=m,
        camera_mode=False, w=0,
    )


@functools.partial(
    jax.jit,
    static_argnames=("w", "max_depth", "pool", "budget", "block_rays",
                     "pad_rows", "iota_pix", "record_params",
                     "cam_out", "pack_ti"),
)
def mega_forward_camera(
    scene: Scene,
    pixel_ids: jnp.ndarray,
    seed: jnp.ndarray,
    cam_seed: jnp.ndarray,
    cam_row: jnp.ndarray,
    w: int,
    max_depth: int,
    pool: int = 2048,
    budget: int = 0,
    block_rays: int = 512,
    pad_rows: int = 2,
    rid_base=None,
    iota_pix: bool = False,
    pix0=None,
    record_params: bool = False,
    cam_out: str = "homes",
    pack_ti: bool = False,
) -> MegaOut:
    """Camera-mode recording forward: primary rays are generated IN-KERNEL
    from pixel ids + 24 SMEM camera scalars at refill (the mega render
    kernel's move back-ported to the tape path, VERDICT r3 item 3) — the
    [C, B] x 6 f32 VMEM ray table becomes ONE i32 pixel-id table and the
    host-side ray pregen disappears from the fwd+bwd pipeline.

    pixel_ids: [R] i32 flat pixel indices (any order/striding).  cam_row:
    camera_scalar_row(camera).  Draws are keyed by rid = rid_base + PIXEL
    ID (camera: hash (rid, cam_seed, 8..11); bounces: hash (rid,
    seed + depth*65537, 0..4)) — the mega render kernel's exact scheme, so
    with rid_base = sample * num_pixels and equal seeds this recording
    forward's colors are BIT-IDENTICAL to mega_render_colors, and draws
    are shard-invariant under dp pixel sharding.  Ray gradients do not
    exist in this mode (rays are not inputs); use mega_backward
    ray_grads=False."""
    r = pixel_ids.shape[0]
    b = pool
    if b % LANE:
        raise ValueError(f"pool must be a multiple of {LANE}")
    br = min(block_rays, b)
    if b % br:
        raise ValueError(f"pool {b} not a multiple of block_rays {br}")
    c_rows = -(-r // b)
    t_budget = budget or mega_budget(r, max_depth, b, pad_rows)
    if t_budget % pad_rows:
        raise ValueError(f"budget {t_budget} % pad_rows {pad_rows} != 0")
    m = _auto_chunk(scene.num_spheres)
    if m < -(-scene.num_spheres // LANE) * LANE:
        raise ValueError(
            f"mega kernel sweeps one chunk: scene {scene.num_spheres} "
            f"exceeds chunk {m}")
    scene_cols, attrs = scene_sweep_arrays(scene, m)

    whole = lambda shape: pl.BlockSpec(shape, lambda i: tuple(0 for _ in shape),
                                       memory_space=pltpu.VMEM)
    rb = (jnp.zeros((), jnp.int32) if rid_base is None
          else jnp.asarray(rid_base, jnp.int32))
    p0 = (jnp.zeros((), jnp.int32) if pix0 is None
          else jnp.asarray(pix0, jnp.int32))
    scal = jnp.stack(
        [jnp.asarray(seed, jnp.int32), jnp.asarray(cam_seed, jnp.int32),
         rb, p0]
    ).reshape(1, 4)
    cam_spec = pl.BlockSpec((1, 24), lambda i: (0, 0), memory_space=pltpu.SMEM)
    if iota_pix:
        # the pixel table is never read (pixels derive from pix0 + ray
        # index); dropping the operand frees [C, B] i32 of scoped VMEM
        mode_inputs, mode_specs = [cam_row], [cam_spec]
    else:
        pad_n = c_rows * b - r
        pix_tab = jnp.pad(pixel_ids.astype(jnp.int32), (0, pad_n)).reshape(
            c_rows, b
        )
        mode_inputs = [cam_row, pix_tab]
        mode_specs = [cam_spec, whole((c_rows, b))]
    return _mega_call(
        scal, mode_inputs, mode_specs,
        scene_cols, attrs,
        r=r, b=b, br=br, c_rows=c_rows, max_depth=max_depth,
        pad_rows=pad_rows, t_budget=t_budget, m=m,
        camera_mode=True, w=w, iota_pix=iota_pix,
        record_params=record_params, cam_out=cam_out, pack_ti=pack_ti,
    )


def _mega_call(scal, mode_inputs, mode_specs, scene_cols, attrs, *,
               r, b, br, c_rows, max_depth, pad_rows, t_budget, m,
               camera_mode, w, iota_pix=False, record_params=False,
               cam_out="homes", pack_ti=False):
    """Shared pallas_call construction for both mega-forward modes.
    Camera mode adds three dense [C, B] color-home outputs (and their
    pending-color scratch rows) — see _mega_kernel.  record_params: tape_f
    grows 16 -> 32 sublanes (winner params at 16..25, the walk tape's
    layout) so the backward can be mega_walk_bwd_kernel."""
    f32, i32 = jnp.float32, jnp.int32
    whole = lambda shape: pl.BlockSpec(shape, lambda i: tuple(0 for _ in shape),
                                       memory_space=pltpu.VMEM)
    # camera mode: 3 color homes, NO pos/rpos (derivable from tape flags;
    # the dead [C, B] outputs cost scoped VMEM).  ray mode: pos + rpos.
    n_col = 3 if (camera_mode and cam_out == "homes") else 0
    n_pos = 2 if not camera_mode else (1 if cam_out == "pos" else 0)
    tf_rows = 32 if record_params else 16
    if pack_ti:
        assert record_params and camera_mode
        ti_specs, ti_shapes = [], []
    else:
        ti_specs = [pl.BlockSpec((1, 8, b), lambda i: (i, 0, 0),
                                 memory_space=pltpu.VMEM)]
        ti_shapes = [jax.ShapeDtypeStruct((t_budget, 8, b), i32)]
    out_specs = (
        [pl.BlockSpec((1, tf_rows, b), lambda i: (i, 0, 0),
                      memory_space=pltpu.VMEM)]
        + ti_specs
        + [whole((c_rows, b))] * (n_col + n_pos)
        + [pl.BlockSpec((1, 2), lambda i: (0, 0), memory_space=pltpu.SMEM)]
    )
    out_shape = (
        [jax.ShapeDtypeStruct((t_budget, tf_rows, b), f32)]
        + ti_shapes
        + [jax.ShapeDtypeStruct((c_rows, b), f32)] * n_col
        + [jax.ShapeDtypeStruct((c_rows, b), i32)] * n_pos
        + [jax.ShapeDtypeStruct((1, 2), i32)]
    )
    outs = pl.pallas_call(
        functools.partial(
            _mega_kernel, r=r, b=b, br=br, c_rows=c_rows,
            max_depth=max_depth, pad_rows=pad_rows,
            camera_mode=camera_mode, w=w, iota_pix=iota_pix,
            record_params=record_params, cam_out=cam_out, pack_ti=pack_ti,
        ),
        grid=(t_budget,),
        in_specs=[pl.BlockSpec((1, 4), lambda i: (0, 0),
                               memory_space=pltpu.SMEM)]
        + mode_specs
        + [whole((m, 1))] * 4
        + [whole((3 * _A_ROWS, m))],
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=(
            [pltpu.VMEM((1, b), f32)] * 9
            + [pltpu.VMEM((1, b), i32)] * 6
            + [pltpu.VMEM((1, br), f32)] * 6
            + [pltpu.VMEM((1, b), f32)] * n_col
            + [pltpu.SMEM((1, 1), i32)]
        ),
    )(scal, *mode_inputs, *scene_cols, attrs)
    if pack_ti:
        # re-expose the i32 planes as a bitcast VIEW so every tape
        # consumer (backward, pos derivation, oracles) is format-agnostic;
        # XLA materializes the slice only where consumed
        tf0 = outs[0]
        ti_view = jax.lax.bitcast_convert_type(
            jnp.concatenate(
                [tf0[:, 26:29, :],
                 jnp.zeros((tf0.shape[0], 5, b), f32)], axis=1
            ),
            i32,
        )
        outs = (tf0, ti_view) + tuple(outs[1:])
    if camera_mode and cam_out == "flat":
        tape_f, tape_i, meta = outs
        colors = None
        pos_cb = rpos_cb = None
    elif camera_mode and cam_out == "pos":
        tape_f, tape_i, pos_cb, meta = outs
        colors = None
        rpos_cb = None
    elif camera_mode:
        tape_f, tape_i, cr, cg, cb, meta = outs
        colors = jnp.stack([cr, cg, cb], axis=-1)
        pos_cb = rpos_cb = None
    else:
        tape_f, tape_i, pos_cb, rpos_cb, meta = outs
        colors = None
    return MegaOut(
        tape_f=tape_f,
        tape_i=tape_i,
        pos_cb=pos_cb,
        rpos_cb=rpos_cb,
        n_it=meta[0, 0],
        clean=meta[0, 1],
        colors=colors,
    )
