"""Reverse-tape MEGA-BACKWARD: the whole tape replay as ONE Pallas program.

The XLA backward (grad/tapegrad.py::_backward_tape) costs ~7 ms at the
official config, of which ~5.8 ms is lax.while_loop self time — per-row op
dispatch the unroll knob cannot remove (measured: unroll 4 ≈ unroll 2) —
plus a ~4 ms g_color pre-scatter.  This kernel moves the whole reverse
walk into one pallas_call:

  - grid = tape rows, streamed in REVERSE via a scalar-prefetch index map
    (block (n_it-1-i) at step i); rows past n_it are masked no-ops.
  - cotangent carries (cot_o / cot_d / cot_atten rows) live in VMEM
    scratch across grid steps — no while carry, no per-row dispatch.
  - the COLOR COTANGENT needs no scatter at all: the mega forward's
    private per-lane queues put ray c*B+lane at [c, lane] of a [C, B]
    table, so g_color is reshaped once and fetched in-kernel with the
    same iota-compare one-hot select the forward's refill uses, gated by
    the row's `finished` flag (replaces the 1-D posc scatter,
    ~4 ms/262k rays at 5 ns/row).
  - winner params are fetched with the forward's MXU trick: attr planes
    [48, m] bf16 (exact hi/mid/lo f32 split) times a one-hot built from
    the RECORDED winner index — no gather.
  - the VJP math is jax.vjp of a ROWS-NATIVE mirror of the replay bounce
    (_local_f_rows ≡ grad/tapegrad._local_f componentwise), traced inside
    the kernel.
  - sphere-parameter cotangents accumulate as one MXU one-hot
    contraction per row into a VMEM [N+1, 27] f32 accumulator (bf16x3
    exact planes — reduce_precision, never astype round-trips); the
    hi/mid/lo groups are summed once outside.
  - primary-ray cotangents come out as DENSE row outputs; the caller
    gathers them at each ray's refill position (a [C, B] output the mega
    forward records) — XLA drops the gather entirely when ray grads are
    unused (the scene-only production shape).

Semantics differentiated: camera.rs:118-144 via _local_f (the replay
oracle's own function); this kernel's grads match jax.grad of
replay_from_tape to float32 accumulation order (tests/test_mega_bwd.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from distributed_raytracer_tpu.core.vecmath import NEAR_ZERO_EPS, T_MIN
from distributed_raytracer_tpu.models.scene import (
    ABSORB,
    DIELECTRIC,
    LAMBERTIAN,
    METAL,
    TRANSPARENT,
)
from distributed_raytracer_tpu.ops.pallas.bounce_kernel import _A_ROWS, LANE
from distributed_raytracer_tpu.ops.pallas.mega_kernel import (
    _TF_AT,
    _TF_D,
    _TF_O,
    _TF_RU,
    _TF_U,
    _TI_FLG,
    _TI_IDX,
    _TI_LRAY,
)

SKY_WHITE = (1.0, 1.0, 1.0)
SKY_BLUE = (0.5, 0.7, 1.0)


def _local_f_rows(
    ox, oy, oz, dx, dy, dz, ar, ag, ab,
    cwx, cwy, cwz, rw, awr, awg, awb, fw, iw,
    mt, rux, ruy, ruz, u, hit, act,
):
    """ROWS-NATIVE mirror of grad/tapegrad._local_f (= pathgrad's
    _local_bounce): one differentiable bounce from gathered winner params
    and recorded draws, every operation transcribed componentwise so the
    VJP matches the [B,3] original to float32 rounding.  All inputs are
    [1, B] rows; mt is the material code as f32 (exact small ints); hit /
    act are i1 rows (nondiff).  Returns 12 rows:
    (o2x..z, d2x..z, at2r..b, c2r..b)."""
    # ---- _winner_t (intersect_kernel.py:157-170), componentwise ----
    ocx = cwx - ox
    ocy = cwy - oy
    ocz = cwz - oz
    a = dx * dx + dy * dy + dz * dz
    h = dx * ocx + dy * ocy + dz * ocz
    c = ocx * ocx + ocy * ocy + ocz * ocz - rw * rw
    disc = h * h - a * c
    dpos = disc > 0.0
    safe = jnp.where(dpos, disc, 1.0)
    sqrtd = jnp.where(dpos, jnp.sqrt(safe), 0.0)
    root_near = (h - sqrtd) / a
    root_far = (h + sqrtd) / a
    near_ok = (disc >= 0.0) & (root_near > T_MIN)
    t = jnp.where(near_ok, root_near, root_far)
    th = jnp.where(hit, t, 1.0)

    # ---- surface_geometry (materials.py:48-60) ----
    px = ox + th * dx
    py = oy + th * dy
    pz = oz + th * dz
    safe_r = jnp.where(rw > 0.0, rw, 1.0)
    owx = (px - cwx) / safe_r
    owy = (py - cwy) / safe_r
    owz = (pz - cwz) / safe_r
    front = (dx * owx + dy * owy + dz * owz) < 0.0
    fs = jnp.where(front, 1.0, -1.0)
    nx, ny, nz = owx * fs, owy * fs, owz * fs

    # ---- Lambertian (materials.py:126-127) ----
    lx, ly, lz = nx + rux, ny + ruy, nz + ruz
    near0 = (
        (jnp.abs(lx) < NEAR_ZERO_EPS)
        & (jnp.abs(ly) < NEAR_ZERO_EPS)
        & (jnp.abs(lz) < NEAR_ZERO_EPS)
    )
    lx = jnp.where(near0, nx, lx)
    ly = jnp.where(near0, ny, ly)
    lz = jnp.where(near0, nz, lz)

    def unit3(vx, vy, vz):
        # vecmath.unit_vector's guarded form (double-where, rsqrt)
        n2 = vx * vx + vy * vy + vz * vz
        pos = n2 > 0.0
        inv = jnp.where(pos, jax.lax.rsqrt(jnp.where(pos, n2, 1.0)), 0.0)
        return vx * inv, vy * inv, vz * inv

    # ---- Metal (materials.py:129-132): reflect then normalize ----
    d_dot_n = dx * nx + dy * ny + dz * nz
    rfx = dx - 2.0 * d_dot_n * nx
    rfy = dy - 2.0 * d_dot_n * ny
    rfz = dz - 2.0 * d_dot_n * nz
    rfx, rfy, rfz = unit3(rfx, rfy, rfz)
    mx = rfx + fw * rux
    my = rfy + fw * ruy
    mz = rfz + fw * ruz
    metal_ok = (mx * nx + my * ny + mz * nz) > 0.0

    # ---- Dielectric (materials.py:134-151) ----
    ri = jnp.where(front, 1.0 / iw, iw)
    ux, uy, uz = unit3(dx, dy, dz)
    cos_t = jnp.minimum(-(ux * nx + uy * ny + uz * nz), 1.0)
    sin2 = 1.0 - cos_t * cos_t
    s2pos = sin2 > 0.0
    sin_t = jnp.where(s2pos, jnp.sqrt(jnp.where(s2pos, sin2, 1.0)), 0.0)
    cannot = ri * sin_t > 1.0
    r0 = (1.0 - ri) / (1.0 + ri)
    r0 = r0 * r0
    refl = r0 + (1.0 - r0) * (1.0 - cos_t) ** 5
    choose_refl = cannot | (refl > u)
    # vm.reflect of the unit dir
    u_dot_n = ux * nx + uy * ny + uz * nz
    gx = ux - 2.0 * u_dot_n * nx
    gy = uy - 2.0 * u_dot_n * ny
    gz = uz - 2.0 * u_dot_n * nz
    # vm.refract (vecmath.py:76-88): cos from the refract formula itself
    cos_r = jnp.minimum(-(ux * nx + uy * ny + uz * nz), 1.0)
    perp_x = ri * (ux + cos_r * nx)
    perp_y = ri * (uy + cos_r * ny)
    perp_z = ri * (uz + cos_r * nz)
    k = jnp.abs(1.0 - (perp_x * perp_x + perp_y * perp_y + perp_z * perp_z))
    kpos = k > 0.0
    para = -jnp.where(kpos, jnp.sqrt(jnp.where(kpos, k, 1.0)), 0.0)
    fx2 = perp_x + para * nx
    fy2 = perp_y + para * ny
    fz2 = perp_z + para * nz
    dlx = jnp.where(choose_refl, gx, fx2)
    dly = jnp.where(choose_refl, gy, fy2)
    dlz = jnp.where(choose_refl, gz, fz2)

    # ---- select by material (materials.py:153-176) ----
    is_lam = mt == LAMBERTIAN
    is_met = mt == METAL
    is_die = mt == DIELECTRIC
    is_tra = mt == TRANSPARENT
    is_abs = mt == ABSORB
    ndx = jnp.where(is_lam, lx, jnp.where(is_met, mx, jnp.where(is_die, dlx, dx)))
    ndy = jnp.where(is_lam, ly, jnp.where(is_met, my, jnp.where(is_die, dly, dy)))
    ndz = jnp.where(is_lam, lz, jnp.where(is_met, mz, jnp.where(is_die, dlz, dz)))
    white = jnp.ones_like(awr)
    scr = jnp.where(is_die | is_tra, white, awr)
    scg = jnp.where(is_die | is_tra, white, awg)
    scb = jnp.where(is_die | is_tra, white, awb)
    scattered = (~is_abs) & (metal_ok | ~is_met)
    nox = jnp.where(is_tra, ox, px)
    noy = jnp.where(is_tra, oy, py)
    noz = jnp.where(is_tra, oz, pz)

    # ---- _local_bounce's merge (pathgrad.py:98-105) ----
    finish_miss = act & ~hit
    keep = act & hit & scattered
    # sky_color (ops/trace.py:41-47): lerp(white, blue, a) on the unit dir
    sa = 0.5 * (uy + 1.0)
    skyr = (1.0 - sa) * SKY_WHITE[0] + sa * SKY_BLUE[0]
    skyg = (1.0 - sa) * SKY_WHITE[1] + sa * SKY_BLUE[1]
    skyb = (1.0 - sa) * SKY_WHITE[2] + sa * SKY_BLUE[2]
    c2r = jnp.where(finish_miss, ar * skyr, 0.0)
    c2g = jnp.where(finish_miss, ag * skyg, 0.0)
    c2b = jnp.where(finish_miss, ab * skyb, 0.0)
    o2x = jnp.where(keep, nox, ox)
    o2y = jnp.where(keep, noy, oy)
    o2z = jnp.where(keep, noz, oz)
    d2x = jnp.where(keep, ndx, dx)
    d2y = jnp.where(keep, ndy, dy)
    d2z = jnp.where(keep, ndz, dz)
    at2r = jnp.where(keep, ar * scr, ar)
    at2g = jnp.where(keep, ag * scg, ag)
    at2b = jnp.where(keep, ab * scb, ab)
    return (o2x, o2y, o2z, d2x, d2y, d2z, at2r, at2g, at2b, c2r, c2g, c2b)


def _mega_bwd_kernel(
    nit_ref,                                            # [1] SMEM (prefetch)
    tf,                                                 # (1,16,B) packed tape row
    ti,                                                 # (1,8,B) packed i32 row
    gtr, gtg, gtb,                                      # [C,B] g_color tables
    attr_ref,                                           # [48,m] bf16
    gpm_out,                                            # [np,32] f32
    *rest,                                              # [dd_o?] + 10 scratch
    b: int, n: int, m: int, c_rows: int, np_pad: int,
    ray_grads: bool,
):
    # outputs/scratch split: the dense primary-cotangent row output only
    # exists when ray grads are consumed — the production scene-only shape
    # emits NOTHING per row (the single copy-out is gpm at the last step)
    if ray_grads:
        dd_o, *rest = rest
    (sco_x, sco_y, sco_z, scd_x, scd_y, scd_z,
     sca_r, sca_g, sca_b, gpm_s) = rest
    i = pl.program_id(0)
    n_it = nit_ref[0]
    i32 = jnp.int32

    @pl.when(i == 0)
    def _init():
        z = jnp.zeros((1, b), jnp.float32)
        sco_x[:], sco_y[:], sco_z[:] = z, z, z
        scd_x[:], scd_y[:], scd_z[:] = z, z, z
        sca_r[:], sca_g[:], sca_b[:] = z, z, z
        gpm_s[:] = jnp.zeros_like(gpm_s)

    @pl.when(i < n_it)
    def _row():
        ox, oy, oz = (tf[0, _TF_O + 0:_TF_O + 1, :],
                      tf[0, _TF_O + 1:_TF_O + 2, :],
                      tf[0, _TF_O + 2:_TF_O + 3, :])
        dx, dy, dz = (tf[0, _TF_D + 0:_TF_D + 1, :],
                      tf[0, _TF_D + 1:_TF_D + 2, :],
                      tf[0, _TF_D + 2:_TF_D + 3, :])
        ar, ag, ab = (tf[0, _TF_AT + 0:_TF_AT + 1, :],
                      tf[0, _TF_AT + 1:_TF_AT + 2, :],
                      tf[0, _TF_AT + 2:_TF_AT + 3, :])
        rux = tf[0, _TF_RU + 0:_TF_RU + 1, :]
        ruy = tf[0, _TF_RU + 1:_TF_RU + 2, :]
        ruz = tf[0, _TF_RU + 2:_TF_RU + 3, :]
        u = tf[0, _TF_U:_TF_U + 1, :]
        idx = ti[0, _TI_IDX:_TI_IDX + 1, :]
        lray = ti[0, _TI_LRAY:_TI_LRAY + 1, :]
        flg = ti[0, _TI_FLG:_TI_FLG + 1, :]
        hit = (flg & 1) != 0
        act = (flg & 2) != 0
        take = (flg & 4) != 0
        fin = (flg & 8) != 0

        # ---- color cotangent: in-kernel fetch from the [C, B] g_color
        # table at this lane's current queue row (ray = c*B + lane, so
        # c = lane_ray // B), gated by `finished` — no scatter anywhere ----
        c_cur = lray // b
        rows_i = jax.lax.broadcasted_iota(i32, (c_rows, b), 0)
        sel = (rows_i == c_cur).astype(jnp.float32)
        fin_f = fin.astype(jnp.float32)
        cot_cr = jnp.sum(sel * gtr[:], axis=0, keepdims=True) * fin_f
        cot_cg = jnp.sum(sel * gtg[:], axis=0, keepdims=True) * fin_f
        cot_cb = jnp.sum(sel * gtb[:], axis=0, keepdims=True) * fin_f

        # ---- winner params via the MXU one-hot (exact bf16x3 planes) ----
        mrows = jax.lax.broadcasted_iota(i32, (m, b), 0)
        onehot = (mrows == jnp.clip(idx, 0, m - 1)).astype(jnp.float32)
        wa3 = jax.lax.dot_general(
            attr_ref[:], onehot.astype(jnp.bfloat16),
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [48, B]
        w = wa3[0:_A_ROWS] + wa3[_A_ROWS:2 * _A_ROWS] + wa3[2 * _A_ROWS:]
        cwx, cwy, cwz = w[0:1], w[1:2], w[2:3]
        rw = jnp.where(hit, w[3:4], 1.0)
        awr, awg, awb = w[4:5], w[5:6], w[6:7]
        fw = w[7:8]
        iw = jnp.where(hit, w[8:9], 1.0)
        mt = w[9:10]

        # ---- VJP of the rows-native replay bounce ----
        _, vjp = jax.vjp(
            _local_f_rows,
            ox, oy, oz, dx, dy, dz, ar, ag, ab,
            cwx, cwy, cwz, rw, awr, awg, awb, fw, iw,
            mt, rux, ruy, ruz, u, hit, act,
        )
        cots = vjp((
            sco_x[:], sco_y[:], sco_z[:],
            scd_x[:], scd_y[:], scd_z[:],
            sca_r[:], sca_g[:], sca_b[:],
            cot_cr, cot_cg, cot_cb,
        ))
        (d_ox, d_oy, d_oz, d_dx, d_dy, d_dz, d_ar, d_ag, d_ab,
         d_cwx, d_cwy, d_cwz, d_rw, d_awr, d_awg, d_awb, d_fw, d_iw,
         *_nondiff) = cots

        # ---- sphere-param cotangents: one MXU one-hot contraction ----
        seg = jnp.where(hit, idx, n)
        srows = jax.lax.broadcasted_iota(i32, (np_pad, b), 0)
        oh_seg = (srows == seg).astype(jnp.float32).astype(jnp.bfloat16)
        d_pm = jnp.concatenate(
            [d_cwx, d_cwy, d_cwz, d_rw, d_awr, d_awg, d_awb, d_fw, d_iw],
            axis=0,
        )  # [9, B]
        # exact bf16x3 split via TRUNCATION (bitcast + mantissa mask):
        # Mosaic has no reduce_precision lowering, and astype round-trips
        # are the excess-precision elision hazard.  Masking the low 16
        # mantissa bits IS the bf16 value we emit (round-to-zero), so
        # hi_f == f32(bf16(hi_f)) by construction; each step strips >= 8
        # leading significant bits, so lo (<= 8 bits) is exact in bf16 and
        # hi + mid + lo == d_pm bit-for-bit.
        mask = jnp.int32(-65536)  # 0xFFFF0000

        def trunc_bf16(x):
            xi = jax.lax.bitcast_convert_type(x, jnp.int32)
            return jax.lax.bitcast_convert_type(xi & mask, jnp.float32)

        hi_f = trunc_bf16(d_pm)
        r1 = d_pm - hi_f
        mid_f = trunc_bf16(r1)
        lo_f = r1 - mid_f
        planes = jnp.concatenate(
            [hi_f.astype(jnp.bfloat16), mid_f.astype(jnp.bfloat16),
             lo_f.astype(jnp.bfloat16)], axis=0
        )  # [27, B]
        part = jax.lax.dot_general(
            oh_seg, planes,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [np_pad, 27]
        acc = gpm_s[:, 0:32]
        pad27 = jnp.concatenate(
            [part, jnp.zeros((np_pad, 5), jnp.float32)], axis=1
        )
        gpm_s[:] = acc + pad27

        # ---- dense primary-cotangent rows + carry cut at refills ----
        if ray_grads:
            dd_o[0, 0:1, :] = d_ox
            dd_o[0, 1:2, :] = d_oy
            dd_o[0, 2:3, :] = d_oz
            dd_o[0, 3:4, :] = d_dx
            dd_o[0, 4:5, :] = d_dy
            dd_o[0, 5:6, :] = d_dz
        sco_x[:] = jnp.where(take, 0.0, d_ox)
        sco_y[:] = jnp.where(take, 0.0, d_oy)
        sco_z[:] = jnp.where(take, 0.0, d_oz)
        scd_x[:] = jnp.where(take, 0.0, d_dx)
        scd_y[:] = jnp.where(take, 0.0, d_dy)
        scd_z[:] = jnp.where(take, 0.0, d_dz)
        sca_r[:] = jnp.where(take, 0.0, d_ar)
        sca_g[:] = jnp.where(take, 0.0, d_ag)
        sca_b[:] = jnp.where(take, 0.0, d_ab)

    @pl.when(i == pl.num_programs(0) - 1)
    def _emit():
        gpm_out[:] = gpm_s[:]


@functools.partial(jax.jit, static_argnames=("n", "ray_grads"))
def mega_backward(
    tape_f: jnp.ndarray,
    tape_i: jnp.ndarray,
    n_it: jnp.ndarray,
    g_color: jnp.ndarray,
    attrs: jnp.ndarray,
    n: int,
    ray_grads: bool = True,
):
    """Run the reverse tape walk as one pallas_call.

    tape_f/tape_i: the mega forward's PACKED [T, 16, B] f32 / [T, 8, B]
    i32 tape outputs (MegaOut) — one block copy-in per row each instead of
    round 3's 16 (the per-row DMA issue overhead was the backward's
    dominant fixed cost, like the forward's copy-outs).
    g_color: [R, 3] color cotangents.  attrs: [48, m] bf16 winner-attr
    planes of the SAME scene the forward swept (scene_sweep_arrays).
    Returns (g_pm [n+1, 9], dd_rows) where dd_rows is the packed
    [T, 8, B] dense primary-cotangent rows (sublanes 0:3 d_o, 3:6 d_d) —
    or None with ray_grads=False (the production scene-only shape: the
    kernel then emits NOTHING per grid step; its single copy-out is the
    gpm accumulator at the last step)."""
    t_budget, _, b = tape_f.shape
    m = attrs.shape[1]
    r = g_color.shape[0]
    c_rows = -(-r // b)
    np_pad = -(-(n + 1) // 8) * 8

    # g_color -> [C, B] tables (ray c*B + lane at [c, lane]); one reshape,
    # no scatter
    pad_n = c_rows * b - r
    gt = jnp.pad(g_color, ((0, pad_n), (0, 0)))
    gtr = gt[:, 0].reshape(c_rows, b)
    gtg = gt[:, 1].reshape(c_rows, b)
    gtb = gt[:, 2].reshape(c_rows, b)

    i32 = jnp.int32
    f32 = jnp.float32
    # reverse row streaming: block (n_it-1-i), clamped; steps i >= n_it
    # are masked in-kernel and revisit block 0 without writing
    rev = lambda i, nit: (jnp.maximum(nit[0] - 1 - i, 0), 0, 0)
    tf_spec = pl.BlockSpec((1, 16, b), rev, memory_space=pltpu.VMEM)
    ti_spec = pl.BlockSpec((1, 8, b), rev, memory_space=pltpu.VMEM)
    dd_spec = pl.BlockSpec((1, 8, b), rev, memory_space=pltpu.VMEM)
    whole = lambda shape: pl.BlockSpec(
        shape, lambda i, nit: tuple(0 for _ in shape), memory_space=pltpu.VMEM
    )
    out_specs = [whole((np_pad, 32))]
    out_shape = [jax.ShapeDtypeStruct((np_pad, 32), f32)]
    if ray_grads:
        out_specs.append(dd_spec)
        out_shape.append(jax.ShapeDtypeStruct((t_budget, 8, b), f32))
    outs = pl.pallas_call(
        functools.partial(
            _mega_bwd_kernel, b=b, n=n, m=m, c_rows=c_rows, np_pad=np_pad,
            ray_grads=ray_grads,
        ),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(t_budget,),
            in_specs=[tf_spec, ti_spec]
            + [whole((c_rows, b))] * 3
            + [whole((3 * _A_ROWS, m))],
            out_specs=out_specs,
            scratch_shapes=[pltpu.VMEM((1, b), f32)] * 9
            + [pltpu.VMEM((np_pad, 32), f32)],
        ),
        out_shape=out_shape,
    )(
        n_it.reshape(1).astype(i32),
        tape_f, tape_i,
        gtr, gtg, gtb, attrs,
    )
    gpm_raw = outs[0]
    dd_rows = outs[1] if ray_grads else None
    # hi/mid/lo plane groups summed once (the in-kernel accumulator keeps
    # them separate to avoid lane-sliced adds per row)
    g_pm = (
        gpm_raw[: n + 1, 0:9]
        + gpm_raw[: n + 1, 9:18]
        + gpm_raw[: n + 1, 18:27]
    )
    return g_pm, dd_rows
