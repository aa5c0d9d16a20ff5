"""Multi-chunk MEGA RENDER kernel: the whole-render mega program with an
in-kernel front-to-back sphere-chunk WALK — the flagship engine at scene
scales past one VMEM sweep chunk (8k-32k spheres).

The round-3 mega render kernel (mega_render_kernel.py) holds the whole
scene as ONE resident sweep chunk and raises past 512 spheres; large
scenes fell back to the fused host-loop engine, where the chunk walk's
kernel-level 1.7x win was diluted to 1.46x by refill/drain glue the walk
cannot touch.  This kernel keeps the mega structure — grid = pool rows,
in-kernel camera ray generation at refill, pool state in VMEM scratch,
dense [C, B] color homes — and replaces the row's single resident sweep
with the culled fused kernel's chunk walk, run per ray sub-block:

  - the scene lives in HBM as the walk pack (sweep columns [N, LANE] f32 +
    chunk-blocked winner-attr planes [n_chunks*48, chunk] bf16,
    culled_bounce_kernel.build_culled_pack's layout) with its chunk blocks
    PRE-SORTED into visit order: always-swept big chunks (ground sphere)
    first, then Morton clusters front-to-back from the camera center — so
    the kernel walks chunk ids 0..n_chunks-1 with no order table.  Primary
    rays see an exact front-to-back order; bounced rays keep it as a
    heuristic, and correctness never depends on it (the flag test is
    conservative under any order).
  - per sub-block of `block_rays` lanes (consecutive lanes = consecutive
    pixels at refill — frustum-coherent for primaries, loosely coherent
    for bounces since co-born rays advance together), chunks are tested in
    groups of 8 against the sub-block's live rays and current best-t
    (one scalar bitmask per group, culled_bounce_kernel's flag shape) and
    only chunks some live ray can still hit closer are DMA'd — double-
    buffered, one chunk ahead — swept, and winner-merged.  A culled chunk
    costs one vectorized bound test and NO memory traffic; occlusion from
    already-swept front chunks culls the back of the scene.
  - shading draws are the GLOBAL (rid, depth)-keyed hash
    (culled_bounce_kernel._hash_u01) — identical keying to the dense mega
    render kernel, so at equal scene content the two engines render
    BIT-IDENTICAL images (pinned in tests/test_mega_walk.py), and pool /
    block_rays / budget / chunk size stay pure performance knobs.

This is the reference's front-to-back shard traversal with early
termination (ray_server.rs:56-60 + hittable_list.rs:42-55) and its
size-agnostic engine (hittable_list.rs:60-74) fused into one program.
TPU-only (compiled Mosaic); tests run interpret mode.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from distributed_raytracer_tpu.core.vecmath import BIG, T_MIN
from distributed_raytracer_tpu.models.scene import ABSORB, Scene
from distributed_raytracer_tpu.ops.camera import Camera
from distributed_raytracer_tpu.ops.pallas.bounce_kernel import (
    _A_IO,
    _A_MT,
    _A_ROWS,
    _A_RR,
    _shade_vals,
    _sweep_winner,
    LANE,
)
from distributed_raytracer_tpu.ops.pallas.culled_bounce_kernel import (
    _hash_u01,
    build_culled_pack,
)
from distributed_raytracer_tpu.ops.pallas.culled_kernel import (
    GROUP,
    CulledScene,
)
from distributed_raytracer_tpu.ops.pallas.mega_render_kernel import (
    MegaRenderOut,
    _c_rows,
    camera_ray_rows,
    camera_scalar_row,
    mega_render_budget,
    mega_render_budget_tight,
)


class WalkPack(NamedTuple):
    """Scene-constant arrays for the mega walk, chunk blocks in VISIT
    order (big always-swept chunks first, then front-to-back from the
    camera center).

    TIE CAVEAT: the walk merges chunk sweeps with strict `t_c < t_best`
    in this camera-dependent visit order, while the dense mega kernel
    sweeps in builder order — an EXACT float-t tie between spheres in
    different chunks would pick different winners (the advertised
    bit-identity to the dense engine holds ties aside).  Real scenes
    never produce exact f32 ties between distinct spheres; adversarial
    scenes that do should use the dense engine or add an index tie-break
    to the winner merge."""

    scene_pack: jnp.ndarray  # [N, LANE] f32: lanes 0..3 = cx cy cz r2
    attrs: jnp.ndarray       # [n_chunks*48, chunk] bf16, chunk-blocked
    bounds: jnp.ndarray      # [c_pad, LANE] f32: lanes 0..3 = bx by bz r2
    #                          (pad rows r2 = -1 => guaranteed miss)
    chunk: int
    n_chunks: int
    slot_to_orig: np.ndarray = None  # [n_chunks*chunk] i64 ORIGINAL sphere
    # index per visit-ordered slot, -1 pad (tape winner ids / gradients of
    # the walked pack map back through this; None for packs built from a
    # CulledScene that predates the order field)


def build_walk_pack(culled: CulledScene, cam_center) -> WalkPack:
    """Visit-ordered walk pack from a CulledScene: reorder its chunk
    blocks once on the host (inf-bound chunks first, then ascending
    |chunk_center - camera_center|) so the kernel walks ids 0..n-1
    front-to-back with no per-row order table."""
    pack = build_culled_pack(culled)
    bc = np.asarray(pack.bounds_c)
    br2 = np.asarray(pack.bounds_r2)
    n_chunks = br2.shape[0]
    chunk = culled.chunk
    cam = np.asarray(cam_center, np.float64).reshape(3)
    dist = np.linalg.norm(bc.astype(np.float64) - cam, axis=-1)
    dist = np.where(np.isinf(br2), -1.0, dist)  # big chunks lead
    order = np.argsort(dist, kind="stable").astype(np.int64)

    sp = np.asarray(pack.scene_pack).reshape(n_chunks, chunk, LANE)[order]
    at = np.asarray(pack.attrs).reshape(n_chunks, 3 * _A_ROWS, chunk)[order]
    c_pad = (-(-n_chunks // GROUP) + 1) * GROUP
    bounds = np.zeros((c_pad, LANE), np.float32)
    bounds[:n_chunks, 0:3] = bc[order]
    bounds[:n_chunks, 3] = br2[order]
    bounds[n_chunks:, 3] = -1.0  # guaranteed-miss pad rows
    sto = None
    if culled.order is not None:
        sto = np.asarray(culled.order).reshape(n_chunks, chunk)[order]
        sto = sto.reshape(-1)
    return WalkPack(
        scene_pack=jnp.asarray(sp.reshape(n_chunks * chunk, LANE)),
        attrs=jnp.asarray(at.reshape(n_chunks * 3 * _A_ROWS, chunk)),
        bounds=jnp.asarray(bounds),
        chunk=chunk,
        n_chunks=n_chunks,
        slot_to_orig=sto,
    )


def walk_pack_arrays_from_scene(scene: Scene, slot_to_orig: np.ndarray,
                                chunk: int):
    """TRACEABLE (scene_pack, attrs, reordered_scene) for a FIXED
    slot->original permutation — the differentiable walk-pack path.

    walk_pack_for builds the pack on the HOST (native Morton clusters +
    camera visit order) and cannot run on a traced scene; under jax.grad
    the scene params ARE tracers.  This splits the build: the PERMUTATION
    (and the chunk bounds) stay static host artifacts of the reference
    scene, while the pack's VALUE arrays are rebuilt here with plain jnp
    gathers/where — XLA differentiates nothing special (the tape tracer's
    custom_vjp maps gradients back through the same permutation).  Padding
    slots (-1) get the standard padding values (r=0, mat=ABSORB, ior=1).

    NOTE bounds are NOT rebuilt: if the traced scene's GEOMETRY (centers/
    radii) drifts from the scene the pack was built for, stale bounds can
    cull a chunk whose sphere moved out of its bound — rebuild the pack
    (or pass bound_slack) when optimizing geometry; material/albedo/fuzz/
    ior optimization never invalidates bounds."""
    from distributed_raytracer_tpu.ops.pallas.bounce_kernel import attr_planes

    n_slots = int(slot_to_orig.shape[0])
    if n_slots % chunk:
        raise ValueError((n_slots, chunk))
    n_chunks = n_slots // chunk
    sto = np.asarray(slot_to_orig)
    idx_c = jnp.asarray(np.clip(sto, 0, scene.num_spheres - 1), jnp.int32)
    v = jnp.asarray(sto >= 0)
    v3 = v[:, None]
    rs = Scene(
        centers=jnp.where(v3, scene.centers[idx_c], 0.0),
        radii=jnp.where(v, scene.radii[idx_c], 0.0),
        albedo=jnp.where(v3, scene.albedo[idx_c], 0.0),
        mat_type=jnp.where(v, scene.mat_type[idx_c], ABSORB),
        fuzz=jnp.where(v, scene.fuzz[idx_c], 0.0),
        ior=jnp.where(v, scene.ior[idx_c], 1.0),
    )
    r2 = jnp.where(rs.radii > 0.0, rs.radii * rs.radii, -1.0)
    scene_pack = jnp.stack(
        [rs.centers[:, 0], rs.centers[:, 1], rs.centers[:, 2], r2], axis=-1
    )
    scene_pack = jnp.pad(scene_pack, ((0, 0), (0, LANE - 4)))
    planes = attr_planes(rs, n_slots)  # [48, n_slots] bf16, idx = slot
    attrs = (
        planes.reshape(3 * _A_ROWS, n_chunks, chunk)
        .transpose(1, 0, 2)
        .reshape(n_chunks * 3 * _A_ROWS, chunk)
    )
    return scene_pack, attrs, rs


def _mega_walk_kernel(
    scal_ref,                        # (1, 6) SMEM i32: bounce_seed cam_seed
    #                                  rid_base n_valid pix0 (pad)
    cam_ref,                         # (1, 24) SMEM f32 camera scalars
    bounds_ref,                      # [c_pad, LANE] VMEM visit-order bounds
    *refs,
    # with use_pix_tab, a [C, B] i32 pixel table precedes scene_ref in
    # refs: lane q renders pixel pix_tab[q // B, q % B] (a TILE
    # permutation makes each br sub-block a 2D image tile — frustum
    # coherence for the walk's flag tests); draws stay keyed by GLOBAL
    # pixel, so the permutation cannot change the image, only the culling
    # rate.  refs then: scene [N,LANE] HBM, attrs HBM, outputs (col_r/g/b
    # [C,B] f32 + meta SMEM), scratch (pool rows; spix = pixel of the
    # current ray per lane; rebase buffers; pending colors; t_w best-t;
    # rfl live-lane gate (+BIG live, -BIG dead — routed through scratch so
    # the flag test's (1,BR)->(G,BR) broadcast sees an offset-0 layout);
    # w_ref winner carry; double-buffered chunk DMA; done flag).
    b: int, br: int, c_rows: int, max_depth: int, w: int,
    chunk: int, n_chunks: int, use_pix_tab: bool = False,
    record: bool = False,
):
    rest = list(refs)
    pix_tab = rest.pop(0) if use_pix_tab else None
    scene_ref, attrs_ref = rest.pop(0), rest.pop(0)
    if record:
        # RECORDING mode (the walk tape forward, round 5): two packed tape
        # row outputs precede the color homes — tf_o [1, 32, B] f32
        # (sublanes 0..15 = the mega tape layout o3 d3 atten3 ruv3 u
        # contrib3; 16..25 = the WINNER PARAMS cw3 r alb3 fuzz ior mt, so
        # the backward needs NO scene-resident attr planes and no one-hot
        # param fetch at any scene size) and ti_o [1, 8, B] i32 (idx
        # lane_ray flags) — plus dense pos/rpos homes (mega_kernel.py's).
        tf_o, ti_o = rest.pop(0), rest.pop(0)
    (col_r, col_g, col_b) = rest[0:3]
    del rest[0:3]
    (meta_o,
     sox, soy, soz, sdx, sdy, sdz,
     sar, sag, sab,
     scur, snext, sdepth, slive, sfin, spix,
     rbx, rby, rbz, rcx, rcy, rcz,
     ccr, ccg, ccb,
     t_w, rfl, w_ref,
     sbuf, ssem, abuf, asem,
     done_s) = rest
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
        ccr[:], ccg[:], ccb[:] = z, z, z
        done_s[0, 0] = 0
        meta_o[0, 0] = 0
        meta_o[0, 1] = 0
        col_r[:] = jnp.zeros_like(col_r)
        col_g[:] = jnp.zeros_like(col_g)
        col_b[:] = jnp.zeros_like(col_b)

    @pl.when(done_s[0, 0] == 0)
    def _row():
        bounce_seed = scal_ref[0, 0]
        cam_seed = scal_ref[0, 1]
        rid_base = scal_ref[0, 2]
        n_valid = scal_ref[0, 3]
        pix0 = scal_ref[0, 4]
        lane = jax.lax.broadcasted_iota(i32, (1, b), 1)
        live0 = slive[:] > 0
        cnext = snext[:]
        has_next = cnext * b + lane < n_valid
        take = (~live0) & has_next
        n_take = jnp.sum(take.astype(i32))

        # --- refill: in-kernel camera ray generation (camera.rs:238-251),
        # shared with the dense mega render kernel — IDENTICAL draws ---
        @pl.when(n_take > 0)
        def _refill():
            if use_pix_tab:
                rows_cb = jax.lax.broadcasted_iota(i32, (c_rows, b), 0)
                pix = jnp.sum(
                    jnp.where(rows_cb == cnext, pix_tab[:], 0),
                    axis=0, keepdims=True,
                )
            else:
                pix = pix0 + jnp.minimum(cnext * b + lane, n_valid - 1)
            spix[:] = jnp.where(take, pix, spix[:])
            rid = rid_base + pix
            ox_new, oy_new, oz_new, dx_new, dy_new, dz_new = camera_ray_rows(
                cam_ref, pix, rid, cam_seed, w
            )
            sox[:] = jnp.where(take, ox_new, sox[:])
            soy[:] = jnp.where(take, oy_new, soy[:])
            soz[:] = jnp.where(take, oz_new, soz[:])
            sdx[:] = jnp.where(take, dx_new, sdx[:])
            sdy[:] = jnp.where(take, dy_new, sdy[:])
            sdz[:] = jnp.where(take, dz_new, sdz[:])
            sar[:] = jnp.where(take, 1.0, sar[:])
            sag[:] = jnp.where(take, 1.0, sag[:])
            sab[:] = jnp.where(take, 1.0, sab[:])
            scur[:] = jnp.where(take, cnext, scur[:])
            sdepth[:] = jnp.where(take, 0, sdepth[:])
            slive[:] = (live0 | take).astype(i32)
            snext[:] = cnext + take.astype(i32)

        # --- post-refill state ---
        ox_f, oy_f, oz_f = sox[:], soy[:], soz[:]
        dx_f, dy_f, dz_f = sdx[:], sdy[:], sdz[:]
        ar, ag, ab = sar[:], sag[:], sab[:]
        live = slive[:] > 0
        c_cur = scur[:]
        # draws key on the GLOBAL pixel of each lane's CURRENT ray (spix)
        # — identical in both pix modes for live lanes, so a pixel
        # permutation cannot change the image
        rid_full = rid_base + spix[:]
        dep_full = sdepth[:]

        if record:
            # tape row: PRE-bounce state (the mega kernel's exact record —
            # sublane indices mega_kernel._TF_O/_TF_D/_TF_AT/_TI_LRAY)
            tf_o[0, 0:1, :] = ox_f
            tf_o[0, 1:2, :] = oy_f
            tf_o[0, 2:3, :] = oz_f
            tf_o[0, 3:4, :] = dx_f
            tf_o[0, 4:5, :] = dy_f
            tf_o[0, 5:6, :] = dz_f
            tf_o[0, 6:7, :] = ar
            tf_o[0, 7:8, :] = ag
            tf_o[0, 8:9, :] = ab
            ti_o[0, 1:2, :] = c_cur * b + lane

        # iota must span lanes on Mosaic; build [G, LANE] then slice
        pos_idx = jax.lax.broadcasted_iota(i32, (GROUP, LANE), 0)[:, 0:1]
        weights = jnp.left_shift(jnp.int32(1), pos_idx)
        n_groups = -(-n_chunks // GROUP)

        # --- one walked bounce, sub-block by sub-block ---
        for sb in range(b // br):
            sl = slice(sb * br, (sb + 1) * br)
            rbx[:] = ox_f[:, sl]
            rby[:] = oy_f[:, sl]
            rbz[:] = oz_f[:, sl]
            rcx[:] = dx_f[:, sl]
            rcy[:] = dy_f[:, sl]
            rcz[:] = dz_f[:, sl]
            ox, oy, oz = rbx[:], rby[:], rbz[:]
            dx, dy, dz = rcx[:], rcy[:], rcz[:]
            a = dx * dx + dy * dy + dz * dz
            inv_a = 1.0 / a
            act = live[:, sl]
            rfl[:] = jnp.where(act, jnp.float32(BIG), jnp.float32(-BIG))

            # winner carries (defaults: rr/io = 1 safe divisors, mt =
            # ABSORB, rest 0 — the culled fused kernel's init)
            t_w[:] = jnp.full_like(t_w, BIG)
            rows16 = jax.lax.broadcasted_iota(i32, w_ref.shape, 0)
            w_ref[:] = jnp.where(
                (rows16 == _A_RR) | (rows16 == _A_IO),
                1.0,
                jnp.where(rows16 == _A_MT, float(ABSORB), 0.0),
            )

            def flag_bits(base):
                # occlusion-aware bound test for visit positions
                # base..base+GROUP-1: bit j = some LIVE ray might hit
                # bound base+j closer than its current best t.
                # Conservative under the staleness of t_w (it only
                # shrinks), so correctness is unconditional.  Dead lanes
                # carry t_best = -BIG (rfl) and never flag.
                t_best = jnp.minimum(t_w[:], rfl[:])
                btile = bounds_ref[pl.ds(base, GROUP), :]  # [G, LANE]
                bx = btile[:, 0:1]
                by = btile[:, 1:2]
                bz = btile[:, 2:3]
                br2v = btile[:, 3:4]
                obx = bx - ox
                oby = by - oy
                obz = bz - oz
                hb = dx * obx + dy * oby + dz * obz
                cb = obx * obx + oby * oby + obz * obz - br2v
                discb = hb * hb - a * cb
                okb = discb >= 0.0
                sq = jnp.sqrt(jnp.where(okb, discb, 0.0))
                nearb = (hb - sq) * inv_a
                farb = (hb + sq) * inv_a
                possible = okb & (farb > T_MIN) & (nearb < t_best)
                valid = (base + pos_idx) < n_chunks
                flag = jnp.any(possible, axis=1, keepdims=True) & valid
                return jnp.sum(jnp.where(flag, weights, 0))

            def start_dma(slot, chunk_id):
                pltpu.make_async_copy(
                    scene_ref.at[pl.ds(chunk_id * chunk, chunk), :],
                    sbuf.at[slot],
                    ssem.at[slot],
                ).start()
                pltpu.make_async_copy(
                    attrs_ref.at[
                        pl.ds(chunk_id * (3 * _A_ROWS), 3 * _A_ROWS), :
                    ],
                    abuf.at[slot],
                    asem.at[slot],
                ).start()

            bits0 = flag_bits(0)
            poss0 = (bits0 & 1) > 0

            @pl.when(poss0)
            def _():
                start_dma(0, jnp.int32(0))

            def group_step(g, carry):
                started, bits_g = carry
                bits_gp1 = flag_bits((g + 1) * GROUP)

                for jj in range(GROUP):
                    pos = g * GROUP + jj
                    nb = (bits_g >> (jj + 1)) if jj < GROUP - 1 else bits_gp1
                    start_next = (nb & 1) > 0

                    @pl.when(start_next)
                    def _():
                        start_dma((pos + 1) % 2, pos + 1)

                    @pl.when(started)
                    def _():
                        slot = pos % 2
                        pltpu.make_async_copy(
                            scene_ref.at[pl.ds(pos * chunk, chunk), :],
                            sbuf.at[slot],
                            ssem.at[slot],
                        ).wait()
                        pltpu.make_async_copy(
                            attrs_ref.at[
                                pl.ds(pos * (3 * _A_ROWS), 3 * _A_ROWS), :
                            ],
                            abuf.at[slot],
                            asem.at[slot],
                        ).wait()
                        t_c, wa = _sweep_winner(
                            ox, oy, oz, dx, dy, dz, a, inv_a,
                            sbuf[slot, :, 0:1], sbuf[slot, :, 1:2],
                            sbuf[slot, :, 2:3], sbuf[slot, :, 3:4],
                            abuf[slot],
                        )
                        t_best = t_w[:]
                        better = t_c < t_best
                        w_ref[:] = jnp.where(better, wa, w_ref[:])
                        t_w[:] = jnp.where(better, t_c, t_best)

                    started = start_next
                return (started, bits_gp1)

            jax.lax.fori_loop(0, n_groups, group_step, (poss0, bits0))

            # --- shade with the GLOBAL (rid, depth)-keyed hash draws —
            # same keying as the dense mega render kernel ---
            seed_row = bounce_seed + dep_full[:, sl] * jnp.int32(65537)
            rid_sl = rid_full[:, sl]
            draws = tuple(_hash_u01(rid_sl, seed_row, dd) for dd in range(5))
            (nox, noy, noz, ndx, ndy, ndz, atr, atg, atb,
             cor, cog, cob, fin_row, idx_row,
             rux, ruy, ruz, u_ch) = _shade_vals(
                ox, oy, oz, dx, dy, dz, a, act, t_w[:], w_ref[:], draws=draws
            )
            fin_b = (fin_row > 0) & act

            if record:
                # draws + results + WINNER PARAMS onto the tape.  The
                # params (w_ref rows 0..9 = cw3 r alb3 fuzz ior mt,
                # hi+mid+lo-exact f32 of the walked pack's attrs) ride the
                # tape so the backward is scene-size-independent: no
                # resident attr planes, no one-hot param fetch.
                hit_row = ((t_w[:] < BIG * 0.5) & act).astype(jnp.int32)
                tf_o[0, 9:10, sl] = rux
                tf_o[0, 10:11, sl] = ruy
                tf_o[0, 11:12, sl] = ruz
                tf_o[0, 12:13, sl] = u_ch
                tf_o[0, 13:14, sl] = ar[:, sl] * cor
                tf_o[0, 14:15, sl] = ag[:, sl] * cog
                tf_o[0, 15:16, sl] = ab[:, sl] * cob
                for j in range(10):
                    tf_o[0, 16 + j:17 + j, sl] = w_ref[j:j + 1, :]
                ti_o[0, 0:1, sl] = idx_row
                ti_o[0, 2:3, sl] = (
                    hit_row
                    | (act.astype(jnp.int32) << 1)
                    | (take[:, sl].astype(jnp.int32) << 2)
                    | (fin_b.astype(jnp.int32) << 3)
                )

            ccr[0, sl] = jnp.where(fin_b, ar[:, sl] * cor, ccr[:, sl])[0]
            ccg[0, sl] = jnp.where(fin_b, ag[:, sl] * cog, ccg[:, sl])[0]
            ccb[0, sl] = jnp.where(fin_b, ab[:, sl] * cob, ccb[:, sl])[0]

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

        # --- dense color drain: ray (c, lane) finished -> home [c, lane] ---
        fin_full = sfin[:] > 0
        rows_i = jax.lax.broadcasted_iota(i32, (c_rows, b), 0)
        sel_fin = (rows_i == c_cur) & fin_full
        col_r[:] = jnp.where(sel_fin, ccr[:], col_r[:])
        col_g[:] = jnp.where(sel_fin, ccg[:], col_g[:])
        col_b[:] = jnp.where(sel_fin, ccb[:], col_b[:])
        # record mode does NOT maintain pos/rpos homes in-kernel: nothing
        # in the fwd+bwd pipeline consumes them, and the [C, B]-wide
        # selects cost ~1 us/row at production shapes.  Oracle consumers
        # derive both from the tape's fin/take flags post-hoc
        # (tapegrad.camera_pos_from_tape).

        # --- termination ---
        live2 = slive[:] > 0
        rem = jnp.sum((snext[:] * b + lane < n_valid).astype(i32))
        natural_done = (rem == 0) & (jnp.sum(live2.astype(i32)) == 0)
        meta_o[0, 0] = it + 1
        meta_o[0, 1] = natural_done.astype(i32)
        done_s[0, 0] = natural_done.astype(i32)


@functools.partial(
    jax.jit,
    static_argnames=("n_pix", "w", "max_depth", "pool", "budget",
                     "block_rays", "chunk", "n_chunks"),
)
def mega_walk_sample(
    scene_pack: jnp.ndarray,
    attrs: jnp.ndarray,
    bounds: jnp.ndarray,
    cam_row: jnp.ndarray,
    sample: jnp.ndarray,
    bounce_seed: jnp.ndarray,
    cam_seed: jnp.ndarray,
    n_pix: int,
    w: int,
    max_depth: int,
    chunk: int,
    n_chunks: int,
    pool: int = 2048,
    budget: int = 0,
    block_rays: int = 256,
    pix0=None,
    n_valid=None,
    n_global=None,
    pix_tab=None,
) -> MegaRenderOut:
    """Render ONE full image sample against a WalkPack's arrays as one
    pallas_call.  Same contract as mega_render_kernel.mega_render_sample
    (shard-mode pix0/n_valid/n_global included); scene arrives as the
    visit-ordered HBM pack instead of resident VMEM columns.

    pix_tab: optional [C, B] i32 pixel table — lane q renders pixel
    pix_tab[q // B, q % B] instead of pixel q (a tile permutation, for
    frustum-coherent sub-blocks).  Draws key on the global pixel, so the
    image content per PIXEL is unchanged; only the lane->pixel layout
    (and thus the color-home order, which the caller un-permutes) and the
    culling rate change.  Mutually exclusive with shard mode (pix0)."""
    b = pool
    if b % LANE:
        raise ValueError(f"pool must be a multiple of {LANE}")
    br = min(block_rays, b)
    if b % br:
        raise ValueError(f"pool {b} not a multiple of block_rays {br}")
    c_rows = _c_rows(n_pix, b)
    t_budget = budget or mega_render_budget(n_pix, max_depth, b)
    if pix0 is None:
        pix0 = jnp.int32(0)
    if n_valid is None:
        n_valid = jnp.int32(n_pix)
    if n_global is None:
        n_global = jnp.int32(n_pix)

    f32, i32 = jnp.float32, jnp.int32
    whole = lambda shape: pl.BlockSpec(shape, lambda i: tuple(0 for _ in shape),
                                       memory_space=pltpu.VMEM)
    rid_base = jnp.asarray(sample, i32) * jnp.asarray(n_global, i32)
    scal = jnp.stack(
        [jnp.asarray(bounce_seed, i32), jnp.asarray(cam_seed, i32),
         rid_base, jnp.asarray(n_valid, i32), jnp.asarray(pix0, i32),
         jnp.zeros((), i32)]
    ).reshape(1, 6)

    c_pad = bounds.shape[0]
    use_pix_tab = pix_tab is not None
    tab_ops = [pix_tab] if use_pix_tab else []
    tab_specs = [whole((c_rows, b))] if use_pix_tab else []
    outs = pl.pallas_call(
        functools.partial(
            _mega_walk_kernel, b=b, br=br, c_rows=c_rows,
            max_depth=max_depth, w=w, chunk=chunk, n_chunks=n_chunks,
            use_pix_tab=use_pix_tab,
        ),
        grid=(t_budget,),
        in_specs=[
            pl.BlockSpec((1, 6), lambda i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 24), lambda i: (0, 0), memory_space=pltpu.SMEM),
            whole((c_pad, LANE)),
        ]
        + tab_specs
        + [
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec(memory_space=pltpu.HBM),
        ],
        out_specs=(
            [whole((c_rows, b))] * 3
            + [pl.BlockSpec((1, 2), lambda i: (0, 0), memory_space=pltpu.SMEM)]
        ),
        out_shape=(
            [jax.ShapeDtypeStruct((c_rows, b), f32)] * 3
            + [jax.ShapeDtypeStruct((1, 2), i32)]
        ),
        scratch_shapes=(
            [pltpu.VMEM((1, b), f32)] * 9
            + [pltpu.VMEM((1, b), i32)] * 6
            + [pltpu.VMEM((1, br), f32)] * 6
            + [pltpu.VMEM((1, b), f32)] * 3
            + [pltpu.VMEM((1, br), f32)] * 2
            + [pltpu.VMEM((_A_ROWS, br), f32)]
            + [
                pltpu.VMEM((2, chunk, LANE), f32),
                pltpu.SemaphoreType.DMA((2,)),
                pltpu.VMEM((2, 3 * _A_ROWS, chunk), jnp.bfloat16),
                pltpu.SemaphoreType.DMA((2,)),
            ]
            + [pltpu.SMEM((1, 1), i32)]
        ),
    )(scal, cam_row, bounds, *tab_ops, scene_pack, attrs)
    cr, cg, cb, meta = outs
    return MegaRenderOut(
        colors=jnp.stack([cr, cg, cb], axis=-1),
        n_it=meta[0, 0],
        clean=meta[0, 1],
    )


class MegaWalkTapeOut(NamedTuple):
    """Recording walk forward outputs (the mega tape contract + params).

    tape_f sublanes 0..15 are EXACTLY mega_kernel's packed layout (o3 d3
    atten3 ruv3 u contrib3 — _Tape-compatible via tape_f[:, :16]); 16..25
    add the winner params (cw3 r alb3 fuzz ior mt) so the walk backward
    (mega_walk_bwd_kernel.py) runs without scene-resident attrs at any
    scene size.  idx (tape_i sublane 0) is the WALK-PACK SLOT index of the
    winner (the visit-ordered reordered scene) — map back to original
    sphere ids with the pack's slot->original permutation."""

    tape_f: jnp.ndarray   # [T, 32, B] f32
    tape_i: jnp.ndarray   # [T, 8, B] i32: idx lane_ray flags (5 pad)
    colors: jnp.ndarray   # [C, B, 3] f32 dense color homes
    # (no pos/rpos homes: finish/refill positions are derivable from the
    # tape's fin/take flags — tapegrad.camera_pos_from_tape)
    n_it: jnp.ndarray     # scalar i32 rows recorded
    clean: jnp.ndarray    # scalar i32: 1 = all rays accounted


@functools.partial(
    jax.jit,
    static_argnames=("n_pix", "w", "max_depth", "pool", "budget",
                     "block_rays", "chunk", "n_chunks"),
)
def mega_walk_forward_camera(
    scene_pack: jnp.ndarray,
    attrs: jnp.ndarray,
    bounds: jnp.ndarray,
    cam_row: jnp.ndarray,
    sample: jnp.ndarray,
    bounce_seed: jnp.ndarray,
    cam_seed: jnp.ndarray,
    n_pix: int,
    w: int,
    max_depth: int,
    chunk: int,
    n_chunks: int,
    pool: int = 2048,
    budget: int = 0,
    block_rays: int = 256,
    pix0=None,
    n_valid=None,
    n_global=None,
    rid_base=None,
) -> MegaWalkTapeOut:
    """RECORDING walk forward: mega_walk_sample + the packed tape outputs
    (see MegaWalkTapeOut) — the camera-mode recording forward for scenes
    past one sweep chunk (VERDICT r4 item 1; the reference's size-agnostic
    bounce engine, hittable_list.rs:60-74, as a differentiable whole-render
    program).  Colors are BIT-IDENTICAL to mega_walk_sample at equal
    seeds/args (same draws, same walk); the tape feeds mega_walk_backward
    or (sublanes 0..15) the XLA reverse-tape backward / replay oracle.

    budget=0 -> the proven worst case (each lane serially runs its
    ceil(n_pix/pool) rays at <= max_depth bounces)."""
    b = pool
    if b % LANE:
        raise ValueError(f"pool must be a multiple of {LANE}")
    br = min(block_rays, b)
    if b % br:
        raise ValueError(f"pool {b} not a multiple of block_rays {br}")
    c_rows = _c_rows(n_pix, b)
    t_budget = budget or (c_rows * max_depth + 1)
    if pix0 is None:
        pix0 = jnp.int32(0)
    if n_valid is None:
        n_valid = jnp.int32(n_pix)
    if n_global is None:
        n_global = jnp.int32(n_pix)

    f32, i32 = jnp.float32, jnp.int32
    whole = lambda shape: pl.BlockSpec(shape, lambda i: tuple(0 for _ in shape),
                                       memory_space=pltpu.VMEM)
    if rid_base is None:
        rid_base = jnp.asarray(sample, i32) * jnp.asarray(n_global, i32)
    scal = jnp.stack(
        [jnp.asarray(bounce_seed, i32), jnp.asarray(cam_seed, i32),
         jnp.asarray(rid_base, i32), jnp.asarray(n_valid, i32),
         jnp.asarray(pix0, i32), jnp.zeros((), i32)]
    ).reshape(1, 6)

    c_pad = bounds.shape[0]
    outs = pl.pallas_call(
        functools.partial(
            _mega_walk_kernel, b=b, br=br, c_rows=c_rows,
            max_depth=max_depth, w=w, chunk=chunk, n_chunks=n_chunks,
            use_pix_tab=False, record=True,
        ),
        grid=(t_budget,),
        in_specs=[
            pl.BlockSpec((1, 6), lambda i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 24), lambda i: (0, 0), memory_space=pltpu.SMEM),
            whole((c_pad, LANE)),
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec(memory_space=pltpu.HBM),
        ],
        out_specs=(
            [pl.BlockSpec((1, 32, b), lambda i: (i, 0, 0),
                          memory_space=pltpu.VMEM),
             pl.BlockSpec((1, 8, b), lambda i: (i, 0, 0),
                          memory_space=pltpu.VMEM)]
            + [whole((c_rows, b))] * 3
            + [pl.BlockSpec((1, 2), lambda i: (0, 0),
                            memory_space=pltpu.SMEM)]
        ),
        out_shape=(
            [jax.ShapeDtypeStruct((t_budget, 32, b), f32),
             jax.ShapeDtypeStruct((t_budget, 8, b), i32)]
            + [jax.ShapeDtypeStruct((c_rows, b), f32)] * 3
            + [jax.ShapeDtypeStruct((1, 2), i32)]
        ),
        scratch_shapes=(
            [pltpu.VMEM((1, b), f32)] * 9
            + [pltpu.VMEM((1, b), i32)] * 6
            + [pltpu.VMEM((1, br), f32)] * 6
            + [pltpu.VMEM((1, b), f32)] * 3
            + [pltpu.VMEM((1, br), f32)] * 2
            + [pltpu.VMEM((_A_ROWS, br), f32)]
            + [
                pltpu.VMEM((2, chunk, LANE), f32),
                pltpu.SemaphoreType.DMA((2,)),
                pltpu.VMEM((2, 3 * _A_ROWS, chunk), jnp.bfloat16),
                pltpu.SemaphoreType.DMA((2,)),
            ]
            + [pltpu.SMEM((1, 1), i32)]
        ),
    )(scal, cam_row, bounds, scene_pack, attrs)
    tf, ti, cr, cg, cb, meta = outs
    return MegaWalkTapeOut(
        tape_f=tf,
        tape_i=ti,
        colors=jnp.stack([cr, cg, cb], axis=-1),
        n_it=meta[0, 0],
        clean=meta[0, 1],
    )


def mega_walk_colors(
    pack: WalkPack,
    camera: Camera,
    sample: jnp.ndarray,
    bounce_seed: jnp.ndarray,
    cam_seed: jnp.ndarray,
    pool: int = 2048,
    budget: int = 0,
    block_rays: int = 256,
    n_cap: int = 0,
    pix0=None,
    n_valid=None,
    n_global=None,
    pix_tab=None,
    inv_perm=None,
) -> jnp.ndarray:
    """Per-pixel colors [n_cap, 3] for one image sample, with the same
    lax.cond truncation fallback as mega_render_colors (bit-identical —
    draws are (rid, depth)-keyed; exact float-t ties between spheres in
    different chunks excepted, see WalkPack).

    pix_tab + inv_perm: tiled lane->pixel permutation (see
    mega_walk_sample); colors are un-permuted with inv_perm so the return
    stays pixel-ordered."""
    n_cap = n_cap or camera.num_pixels
    w = camera.image_width
    kw = dict(n_pix=n_cap, w=w, max_depth=camera.max_depth,
              chunk=pack.chunk, n_chunks=pack.n_chunks, pool=pool,
              block_rays=block_rays, pix0=pix0, n_valid=n_valid,
              n_global=n_global, pix_tab=pix_tab)
    cam_row = camera_scalar_row(camera)
    args = (pack.scene_pack, pack.attrs, pack.bounds, cam_row, sample,
            bounce_seed, cam_seed)
    out = mega_walk_sample(*args, budget=budget, **kw)
    if budget and budget < mega_render_budget(n_cap, camera.max_depth, pool):
        colors = jax.lax.cond(
            out.clean == 1,
            lambda _: out.colors,
            lambda _: mega_walk_sample(*args, budget=0, **kw).colors,
            None,
        )
    else:
        colors = out.colors
    flat = colors.reshape(-1, 3)
    if inv_perm is not None:
        return flat[inv_perm]
    return flat[:n_cap]


def tile_pix_tables(camera: Camera, pool: int):
    """(pix_tab [C, B] i32, inv_perm [n_pix] i32) for the tiled
    lane->pixel mapping (render/order.tile_permutation 32x16 tiles = one
    br-512 sub-block each).  Padding stream positions map to the last
    pixel (never taken: has_next masks positions >= n_pix)."""
    from distributed_raytracer_tpu.render.order import (
        inverse_permutation,
        tile_permutation,
    )

    n_pix = camera.num_pixels
    perm = tile_permutation(camera.image_width, camera.image_height)
    c_rows = _c_rows(n_pix, pool)
    pad = c_rows * pool - n_pix
    tab = np.concatenate([perm, np.full(pad, perm[-1], np.int32)])
    return (jnp.asarray(tab.reshape(c_rows, pool)),
            jnp.asarray(inverse_permutation(perm)))


def render_wavefront_sum_mega_walk(
    pack: WalkPack,
    camera: Camera,
    key: jax.Array,
    spp: int,
    pool_size: int = 2048,
    budget: int = 0,
    block_rays: int = 256,
    tiled: bool = False,
) -> jnp.ndarray:
    """Color SUM image [n_pix, 3] for spp samples on the mega-walk engine
    — drop-in for render_wavefront_sum_mega at multi-chunk scene scale.
    Seed derivation matches render_wavefront_sum_mega exactly, so at equal
    scene content the two engines' images are bit-identical."""
    bounce_seed = jnp.asarray(
        jax.random.randint(key, (), 0, 2**31 - 1), jnp.int32
    )
    cam_seed = jnp.asarray(
        jax.random.randint(jax.random.fold_in(key, 0xCA3), (), 0, 2**31 - 1),
        jnp.int32,
    )

    pix_tab, inv_perm = (tile_pix_tables(camera, pool_size) if tiled
                         else (None, None))

    def one(s):
        return mega_walk_colors(
            pack, camera, s, bounce_seed, cam_seed, pool=pool_size,
            budget=budget, block_rays=block_rays, pix_tab=pix_tab,
            inv_perm=inv_perm,
        )

    per_sample = jax.lax.map(one, jnp.arange(spp, dtype=jnp.int32))
    return jnp.sum(per_sample, axis=0)


def mega_walk_supported(n_pix: int, pool: int = 2048) -> bool:
    """True when the dense [C, B] x 3 color homes fit the conservative
    VMEM budget (scene size is no longer a constraint — chunks stream
    from HBM)."""
    return 3 * _c_rows(n_pix, pool) * pool * 4 <= 64 * 2**20


def walk_pack_for(scene: Scene, camera: Camera, chunk: int = 256) -> WalkPack:
    """Host-side scene prep: Morton clusters (native builder) + camera
    visit order.  The one-stop constructor progressive/CLI callers use."""
    from distributed_raytracer_tpu.ops.pallas.culled_kernel import (
        build_culled_scene,
    )

    culled = build_culled_scene(scene, chunk=chunk)
    return build_walk_pack(culled, np.asarray(camera.center))
