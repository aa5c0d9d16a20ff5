"""Forward-only MEGA RENDER kernel: the whole wavefront render — camera
ray generation + refill + fused bounce + color drain — as ONE Pallas
program per image sample.

The production fused renderer (render/wavefront.py::
render_wavefront_sum_fused) spends ~44% of its time in host-loop glue
(while-loop self time, cumsum-rank refill, keep/atten merges, drain
scatters) and ~12% in the final pos-gather — the same overhead classes
the tape-path mega kernel (mega_kernel.py) eliminated.  This kernel is
the render-only sibling, with three further structural moves:

1. NO RAY TABLE.  The tape mega kernel holds a [C, B] x 6 f32 ray table
   in VMEM.  Here the private-queue ray id IS the pixel id (one kernel
   call renders ONE full image sample, so lane L's c-th ray is pixel
   c*B + L), and the camera ray is generated IN-KERNEL from scalar camera
   parameters (SMEM) — Camera::get_ray (camera.rs:238-251) as vector
   code: pixel jitter, sqrt-polar defocus-disk sample, ray = pixel_sample
   - origin.  pix -> (i, j) uses an exact f32-reciprocal divmod
   (pix < 2^23 so the floor is within 1; one integer correction step).

2. (rid, depth)-KEYED HASH RNG.  Every draw — camera jitter and the five
   shading draws — is culled_bounce_kernel._hash_u01 of (seed, global ray
   id, draw index), with the bounce seed offset by the ray's OWN depth
   (seed + depth * 65537).  A ray's noise is a pure function of
   (seed, rid, depth): the image is BIT-IDENTICAL across pool size,
   block_rays, budget, and chunking, and interpret-mode tests see real
   noise (pltpu.prng_random_bits returns zeros on CPU).

3. DENSE [C, B] COLOR HOMES.  A finishing ray writes atten*color to its
   private-queue home [c, lane] with a one-hot row select — no drain
   scatter, no contrib buffer, no final gather.  Depth-exhausted rays
   contribute black (camera.rs:120-123) by never writing (outputs are
   zero-initialised).

Budget: worst case is C * max_depth + 1 rows (each lane serially runs its
<= C rays).  A tight `budget` renders faster; the wrapper re-renders with
the worst case under lax.cond when the kernel reports truncation (clean
flag) — pure correctness fallback, and because draws are (rid, depth)-
keyed the fallback image is bit-identical, not just statistically equal.

Bounce semantics: camera.rs:118-144, shared _sweep_winner/_shade_vals
bodies (ops/pallas/bounce_kernel.py).  TPU-only (compiled Mosaic); tests
run the same program in interpret mode.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from distributed_raytracer_tpu.core.vecmath import BIG
from distributed_raytracer_tpu.models.scene import Scene
from distributed_raytracer_tpu.ops.camera import Camera
from distributed_raytracer_tpu.ops.pallas.bounce_kernel import (
    _A_ROWS,
    _auto_chunk,
    _shade_vals,
    _sweep_winner,
    LANE,
)
from distributed_raytracer_tpu.ops.pallas.culled_bounce_kernel import _hash_u01
from distributed_raytracer_tpu.ops.pallas.mega_kernel import scene_sweep_arrays

# camera scalar-row layout (cam_ref, (1, 24) f32 SMEM)
_C_CTR, _C_P00, _C_PDU, _C_PDV, _C_DDU, _C_DDV, _C_ANG = 0, 3, 6, 9, 12, 15, 18
# camera-jitter draw indices: 8..11 (the culled fused engine's convention,
# decorrelated from the bounce draws d = 0..4)
_CAM_D0 = 8


class MegaRenderOut(NamedTuple):
    colors: jnp.ndarray  # [C, B, 3] f32 — ray c*B+lane's color at [c, lane]
    n_it: jnp.ndarray    # scalar i32 rows executed
    clean: jnp.ndarray   # scalar i32: 1 = every ray finished (no truncation)


def _divmod_w(pix, w: int):
    """Exact (pix // w, pix % w) for 0 <= pix < 2^23 via f32 reciprocal +
    one integer correction (Mosaic has no vector i32 divide; the f32
    quotient is within 1 of truth at this range)."""
    q = jnp.floor(pix.astype(jnp.float32) * (1.0 / w)).astype(jnp.int32)
    r = pix - q * w
    q = q + (r >= w).astype(jnp.int32) - (r < 0).astype(jnp.int32)
    return q, pix - q * w


def camera_ray_rows(cam_ref, pix, rid, cam_seed, w: int):
    """IN-KERNEL camera ray generation (camera.rs:238-251, the exact
    arithmetic of ops/camera.py::generate_rays with hash draws): pixel
    jitter + sqrt-polar defocus-disk sample from 24 SMEM camera scalars,
    draws keyed (rid, cam_seed, 8..11).  Returns six [1, B] rows
    (ox, oy, oz, dx, dy, dz).  Shared by the mega render kernel's refill
    and the recording mega forward's camera mode (mega_kernel.py)."""
    jx = _hash_u01(rid, cam_seed, _CAM_D0 + 0)
    jy = _hash_u01(rid, cam_seed, _CAM_D0 + 1)
    u1 = _hash_u01(rid, cam_seed, _CAM_D0 + 2)
    u2 = _hash_u01(rid, cam_seed, _CAM_D0 + 3)
    j_row, i_row = _divmod_w(pix, w)
    fi = i_row.astype(jnp.float32) + (jx - 0.5)
    fj = j_row.astype(jnp.float32) + (jy - 0.5)
    # pixel_sample = p00 + fi*pdu + fj*pdv (component rows)
    psx = cam_ref[0, _C_P00 + 0] + fi * cam_ref[0, _C_PDU + 0] \
        + fj * cam_ref[0, _C_PDV + 0]
    psy = cam_ref[0, _C_P00 + 1] + fi * cam_ref[0, _C_PDU + 1] \
        + fj * cam_ref[0, _C_PDV + 1]
    psz = cam_ref[0, _C_P00 + 2] + fi * cam_ref[0, _C_PDU + 2] \
        + fj * cam_ref[0, _C_PDV + 2]
    # defocus-disk origin (sqrt-polar closed form)
    rr = jnp.sqrt(u1)
    th = 6.2831853 * u2
    p_x = rr * jnp.cos(th)
    p_y = rr * jnp.sin(th)
    use_disk = cam_ref[0, _C_ANG] > 0.0
    ctr_x = cam_ref[0, _C_CTR + 0]
    ctr_y = cam_ref[0, _C_CTR + 1]
    ctr_z = cam_ref[0, _C_CTR + 2]
    ox_new = jnp.where(
        use_disk,
        ctr_x + p_x * cam_ref[0, _C_DDU + 0] + p_y * cam_ref[0, _C_DDV + 0],
        ctr_x,
    )
    oy_new = jnp.where(
        use_disk,
        ctr_y + p_x * cam_ref[0, _C_DDU + 1] + p_y * cam_ref[0, _C_DDV + 1],
        ctr_y,
    )
    oz_new = jnp.where(
        use_disk,
        ctr_z + p_x * cam_ref[0, _C_DDU + 2] + p_y * cam_ref[0, _C_DDV + 2],
        ctr_z,
    )
    return ox_new, oy_new, oz_new, psx - ox_new, psy - oy_new, psz - oz_new


def camera_rays_host(cam_row, pix, rid, cam_seed, w: int):
    """HOST-side mirror of camera_ray_rows: the SAME arithmetic (same
    _hash_u01 draw keys, same divmod, same formulas) on [R] vectors with
    cam_row as a differentiable (1, 24) array — the camera-pose gradient
    hook (VERDICT r4 item 9; camera.rs:238-262).  Bit-identical (o, d) to
    the in-kernel generation at equal (pix, rid, cam_seed); jax.vjp of
    this function transposes primary-ray cotangents into cam_row
    cotangents, and XLA chains them through camera_scalar_row to pose
    parameters when the camera itself is traced."""
    jx = _hash_u01(rid, cam_seed, _CAM_D0 + 0)
    jy = _hash_u01(rid, cam_seed, _CAM_D0 + 1)
    u1 = _hash_u01(rid, cam_seed, _CAM_D0 + 2)
    u2 = _hash_u01(rid, cam_seed, _CAM_D0 + 3)
    j_row, i_row = _divmod_w(pix, w)
    fi = i_row.astype(jnp.float32) + (jx - 0.5)
    fj = j_row.astype(jnp.float32) + (jy - 0.5)
    c = lambda k: cam_row[0, k]
    psx = c(_C_P00 + 0) + fi * c(_C_PDU + 0) + fj * c(_C_PDV + 0)
    psy = c(_C_P00 + 1) + fi * c(_C_PDU + 1) + fj * c(_C_PDV + 1)
    psz = c(_C_P00 + 2) + fi * c(_C_PDU + 2) + fj * c(_C_PDV + 2)
    rr = jnp.sqrt(u1)
    th = 6.2831853 * u2
    p_x = rr * jnp.cos(th)
    p_y = rr * jnp.sin(th)
    use_disk = c(_C_ANG) > 0.0
    ox = jnp.where(use_disk,
                   c(_C_CTR + 0) + p_x * c(_C_DDU + 0) + p_y * c(_C_DDV + 0),
                   c(_C_CTR + 0))
    oy = jnp.where(use_disk,
                   c(_C_CTR + 1) + p_x * c(_C_DDU + 1) + p_y * c(_C_DDV + 1),
                   c(_C_CTR + 1))
    oz = jnp.where(use_disk,
                   c(_C_CTR + 2) + p_x * c(_C_DDU + 2) + p_y * c(_C_DDV + 2),
                   c(_C_CTR + 2))
    o = jnp.stack([ox, oy, oz], axis=-1)
    d = jnp.stack([psx - ox, psy - oy, psz - oz], axis=-1)
    return o, d


def _mega_render_kernel(
    scal_ref,                        # (1, 6) SMEM i32: bounce_seed cam_seed
                                     #   rid_base n_valid pix0 (pad)
    cam_ref,                         # (1, 24) SMEM f32 camera scalars
    cx_ref, cy_ref, cz_ref, r2_ref,  # [m, 1] VMEM sweep columns
    attr_ref,                        # [48, m] VMEM bf16 planes
    # --- outputs ---
    col_r, col_g, col_b,             # [C, B] f32 (constant block)
    meta_o,                          # (1, 2) SMEM i32: n_it, clean
    # --- scratch (pool state persisting across grid steps) ---
    sox, soy, soz, sdx, sdy, sdz,    # (1, B) f32
    sar, sag, sab,                   # (1, B) f32
    scur, snext, sdepth, slive, sfin,  # (1, B) i32
    rbx, rby, rbz, rcx, rcy, rcz,    # (1, BR) f32 rebase buffers
    ccr, ccg, ccb,                   # (1, B) f32 pending finish colors
    done_s,                          # (1, 1) SMEM i32
    *, b: int, br: int, c_rows: int, max_depth: int, w: int,
):
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
        # rid_base = sample * n_global: a ray's GLOBAL id is rid_base +
        # pix0 + local pixel index, so a device rendering the pixel shard
        # [pix0, pix0 + n_valid) draws the SAME noise as the single-device
        # whole-image render — the mesh size becomes a pure performance
        # knob (bit-identical image), like pool/block/budget.
        rid_base = scal_ref[0, 2]
        n_valid = scal_ref[0, 3]
        pix0 = scal_ref[0, 4]
        lane = jax.lax.broadcasted_iota(i32, (1, b), 1)
        live0 = slive[:] > 0
        cnext = snext[:]
        has_next = cnext * b + lane < n_valid
        take = (~live0) & has_next
        n_take = jnp.sum(take.astype(i32))

        # --- refill: IN-KERNEL camera ray generation (camera.rs:238-251,
        # the exact arithmetic of ops/camera.py::generate_rays with hash
        # draws) ---
        @pl.when(n_take > 0)
        def _refill():
            pix = pix0 + jnp.minimum(cnext * b + lane, n_valid - 1)
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
        ox, oy, oz = sox[:], soy[:], soz[:]
        dx, dy, dz = sdx[:], sdy[:], sdz[:]
        ar, ag, ab = sar[:], sag[:], sab[:]
        live = slive[:] > 0
        c_cur = scur[:]
        rid_full = rid_base + pix0 + c_cur * b + lane
        dep_full = sdepth[:]

        # --- one fused bounce, sub-block by sub-block ---
        for sb in range(b // br):
            sl = slice(sb * br, (sb + 1) * br)
            # rebase through (1, BR) scratch (Mosaic layout-offset rule,
            # see mega_kernel.py)
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
            # (rid, depth)-keyed draws: pool/block/budget-invariant noise
            seed_row = bounce_seed + dep_full[:, sl] * jnp.int32(65537)
            rid_sl = rid_full[:, sl]
            draws = tuple(_hash_u01(rid_sl, seed_row, dd) for dd in range(5))
            (nox, noy, noz, ndx, ndy, ndz, atr, atg, atb,
             cor, cog, cob, fin_row, _idx_row,
             _rux, _ruy, _ruz, _u_ch) = _shade_vals(
                oxs, oys, ozs, dxs, dys, dzs, a_s, act, t_c, wa, draws=draws
            )
            fin_b = (fin_row > 0) & act

            # pending finish color (atten * terminal color)
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

        # --- termination ---
        live2 = slive[:] > 0
        rem = jnp.sum((snext[:] * b + lane < n_valid).astype(i32))
        natural_done = (rem == 0) & (jnp.sum(live2.astype(i32)) == 0)
        meta_o[0, 0] = it + 1
        meta_o[0, 1] = natural_done.astype(i32)
        done_s[0, 0] = natural_done.astype(i32)


def camera_scalar_row(camera: Camera) -> jnp.ndarray:
    """(1, 24) f32 camera-parameter row for the kernel's SMEM input."""
    row = jnp.concatenate(
        [
            jnp.asarray(camera.center, jnp.float32).reshape(3),
            jnp.asarray(camera.pixel00_loc, jnp.float32).reshape(3),
            jnp.asarray(camera.pixel_delta_u, jnp.float32).reshape(3),
            jnp.asarray(camera.pixel_delta_v, jnp.float32).reshape(3),
            jnp.asarray(camera.defocus_disk_u, jnp.float32).reshape(3),
            jnp.asarray(camera.defocus_disk_v, jnp.float32).reshape(3),
            jnp.asarray(camera.defocus_angle, jnp.float32).reshape(1),
            jnp.zeros((5,), jnp.float32),
        ]
    )
    return row.reshape(1, 24)


def mega_render_budget(n_pix: int, max_depth: int, pool: int) -> int:
    """Proven worst-case rows: each lane serially runs its ceil(n_pix/B)
    pixels at <= max_depth bounces each."""
    c_rows = _c_rows(n_pix, pool)
    return c_rows * max_depth + 1


def mega_render_budget_tight(n_pix: int, max_depth: int, pool: int) -> int:
    """Heuristic production budget: the flagship workload (RTiOW final,
    depth 50) measures n_it = 3.53 x c_rows at pool 2048 (~2.5 mean
    bounces/ray + refill/tail inefficiency), so 5 x c_rows leaves ~40%
    headroom.  Purely a performance knob — when a scene bounces more than
    that, the kernel's clean flag trips and mega_render_colors re-renders
    at the proven worst case under lax.cond, bit-identically."""
    return min(5 * _c_rows(n_pix, pool) + 1,
               mega_render_budget(n_pix, max_depth, pool))


def mega_render_supported(scene: Scene, n_pix: int, pool: int = 2048) -> bool:
    """True when the mega render kernel can run this workload: the scene
    fits ONE sweep chunk (<= _auto_chunk's cap unless DRAY_FORCE_CHUNK
    raises it) and the dense [C, B] x 3 color homes fit a conservative
    VMEM budget.  Callers (render_progressive) fall back to the fused
    host-loop engine otherwise."""
    m = _auto_chunk(scene.num_spheres)
    if m < -(-scene.num_spheres // LANE) * LANE:
        return False
    return 3 * _c_rows(n_pix, pool) * pool * 4 <= 64 * 2**20


def _c_rows(n_pix: int, pool: int) -> int:
    """Queue rows, padded to a sublane multiple for the [C, B] outputs."""
    return -(-(-(-n_pix // pool)) // 8) * 8


@functools.partial(
    jax.jit,
    static_argnames=("n_pix", "w", "max_depth", "pool", "budget",
                     "block_rays"),
)
def mega_render_sample(
    scene: Scene,
    cam_row: jnp.ndarray,
    sample: jnp.ndarray,
    bounce_seed: jnp.ndarray,
    cam_seed: jnp.ndarray,
    n_pix: int,
    w: int,
    max_depth: int,
    pool: int = 2048,
    budget: int = 0,
    block_rays: int = 512,
    pix0=None,
    n_valid=None,
    n_global=None,
) -> MegaRenderOut:
    """Render ONE full image sample (n_pix rays, pixel p = ray p) as one
    pallas_call.  budget=0 -> the proven worst case.  Returns per-ray
    colors at private-queue homes plus the clean flag; use
    mega_render_colors for the cond-fallback flat view.

    Shard mode (parallel/sharded.py::make_mega_dp_render): n_pix is the
    LOCAL capacity; pix0 (traced i32) is the shard's global pixel offset,
    n_valid (traced i32, <= n_pix) its real pixel count, n_global the
    whole image's pixel count.  Draws stay keyed by GLOBAL (rid, depth),
    so the sharded image is bit-identical to the single-device render —
    the reference's 5 ray servers each driving their own rays' bounce
    loops (ray_server.rs:46-106) without its noise non-reproducibility."""
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

    m = _auto_chunk(scene.num_spheres)
    if m < -(-scene.num_spheres // LANE) * LANE:
        raise ValueError(
            f"mega render kernel sweeps one chunk: scene "
            f"{scene.num_spheres} exceeds chunk {m}")
    scene_cols, attrs = scene_sweep_arrays(scene, m)

    f32, i32 = jnp.float32, jnp.int32
    whole = lambda shape: pl.BlockSpec(shape, lambda i: tuple(0 for _ in shape),
                                       memory_space=pltpu.VMEM)
    rid_base = jnp.asarray(sample, i32) * jnp.asarray(n_global, i32)
    scal = jnp.stack(
        [jnp.asarray(bounce_seed, i32), jnp.asarray(cam_seed, i32),
         rid_base, jnp.asarray(n_valid, i32), jnp.asarray(pix0, i32),
         jnp.zeros((), i32)]
    ).reshape(1, 6)

    outs = pl.pallas_call(
        functools.partial(
            _mega_render_kernel, b=b, br=br, c_rows=c_rows,
            max_depth=max_depth, w=w,
        ),
        grid=(t_budget,),
        in_specs=[
            pl.BlockSpec((1, 6), lambda i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 24), lambda i: (0, 0), memory_space=pltpu.SMEM),
        ]
        + [whole((m, 1))] * 4
        + [whole((3 * _A_ROWS, m))],
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
            + [pltpu.VMEM((1, b), i32)] * 5
            + [pltpu.VMEM((1, br), f32)] * 6
            + [pltpu.VMEM((1, b), f32)] * 3
            + [pltpu.SMEM((1, 1), i32)]
        ),
    )(scal, cam_row, *scene_cols, attrs)
    cr, cg, cb, meta = outs
    return MegaRenderOut(
        colors=jnp.stack([cr, cg, cb], axis=-1),
        n_it=meta[0, 0],
        clean=meta[0, 1],
    )


def mega_render_colors(
    scene: Scene,
    camera: Camera,
    sample: jnp.ndarray,
    bounce_seed: jnp.ndarray,
    cam_seed: jnp.ndarray,
    pool: int = 2048,
    budget: int = 0,
    block_rays: int = 512,
    n_cap: int = 0,
    pix0=None,
    n_valid=None,
    n_global=None,
) -> jnp.ndarray:
    """Per-pixel colors [n_cap, 3] for one image sample, with the
    truncation fallback: when a tight `budget` truncates (clean == 0) the
    worst-case kernel re-renders under lax.cond — same bits, since draws
    are (rid, depth)-keyed.  n_cap=0 -> the whole image (num_pixels);
    shard mode passes the local capacity + pix0/n_valid/n_global (see
    mega_render_sample)."""
    n_cap = n_cap or camera.num_pixels
    w = camera.image_width
    kw = dict(n_pix=n_cap, w=w, max_depth=camera.max_depth, pool=pool,
              block_rays=block_rays, pix0=pix0, n_valid=n_valid,
              n_global=n_global)
    cam_row = camera_scalar_row(camera)
    out = mega_render_sample(
        scene, cam_row, sample, bounce_seed, cam_seed, budget=budget, **kw
    )
    if budget and budget < mega_render_budget(n_cap, camera.max_depth, pool):
        colors = jax.lax.cond(
            out.clean == 1,
            lambda _: out.colors,
            lambda _: mega_render_sample(
                scene, cam_row, sample, bounce_seed, cam_seed, budget=0, **kw
            ).colors,
            None,
        )
    else:
        colors = out.colors
    return colors.reshape(-1, 3)[:n_cap]


def render_wavefront_sum_mega(
    scene: Scene,
    camera: Camera,
    key: jax.Array,
    spp: int,
    pool_size: int = 2048,
    budget: int = 0,
    block_rays: int = 512,
) -> jnp.ndarray:
    """Color SUM image [n_pix, 3] for spp samples — the mega-render
    engine (one pallas_call per sample via lax.map).  Drop-in for
    render_wavefront_sum_fused's dense path at full-image workloads; the
    noise stream is the (rid, depth)-keyed hash (a distinct, valid MC
    estimator of the same integral)."""
    bounce_seed = jnp.asarray(
        jax.random.randint(key, (), 0, 2**31 - 1), jnp.int32
    )
    cam_seed = jnp.asarray(
        jax.random.randint(jax.random.fold_in(key, 0xCA3), (), 0, 2**31 - 1),
        jnp.int32,
    )

    def one(s):
        return mega_render_colors(
            scene, camera, s, bounce_seed, cam_seed, pool=pool_size,
            budget=budget, block_rays=block_rays,
        )

    per_sample = jax.lax.map(one, jnp.arange(spp, dtype=jnp.int32))
    return jnp.sum(per_sample, axis=0)
