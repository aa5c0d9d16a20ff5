"""Reverse-tape MEGA-BACKWARD for the WALK tape: scene-size-independent
gradient replay as ONE Pallas program (VERDICT r4 item 1 — gradients past
one sweep chunk, the reference's size-agnostic engine
hittable_list.rs:60-74 made differentiable).

Two structural departures from the dense mega backward
(mega_bwd_kernel.py) remove its 512-sphere coupling:

1. WINNER PARAMS FROM THE TAPE.  The dense backward re-fetches the
   winner's 10 parameters per row with an MXU one-hot against resident
   [48, m] attr planes — O(m * B) compare + matmul work per row, and m is
   capped by VMEM.  The recording walk forward already holds the winner
   attrs in its carry when it shades, so it writes them to tape sublanes
   16..25 (hi+mid+lo-exact f32 of the pack's bf16 planes == the scene's
   f32 params bit-for-bit); this backward just reads them.  No attr
   operand, no fetch matmul, no scene-size term anywhere but the
   segment-sum.

2. TWO-LEVEL FACTORED SEGMENT-SUM.  The dense [N+1, B] one-hot costs
   O(N*B) VPU compares per row to build (17 us/row at 8k spheres — more
   than the whole rest of the row) and O(N*B) bf16 VMEM.  Factor the slot
   id s = hi*K + lo (K = 32 lanes of the low digit): build oh_lo [K, B]
   and oh_hi [H, B] one-hots (O((K + H)*B) compares), form
   vp[j*K+l, b] = planes[j, b] * oh_lo[l, b] (27*K*B cheap bf16 VPU
   mults, exact — one factor is 0/1), and contract ONE MXU matmul
   oh_hi @ vp^T into a [H, 27*K] f32 accumulator whose (h, j*K+l) cell
   IS the (hi*K+lo, j) cotangent cell.  The matmul's O(N*B*27) MACs per
   row are the only N-scaling left and ride the MXU (~5 us/row at 8k,
   b=2048); the accumulator is unscrambled ONCE outside the kernel.

Cotangent carries, color-cotangent fetch, carry cut at refills and the
VJP body (_local_f_rows) are the dense mega backward's, unchanged.  idx
on the walk tape is the WALK-PACK SLOT index; the caller maps the
returned per-slot cotangents back to original sphere ids through
WalkPack.slot_to_orig.

Exactness: every product is bf16-exact (0/1 one-hots x exact bf16
planes), accumulated in f32 — the same guarantee as the dense backward's
bf16x3 TRUNCATION split (hi == bf16(hi) by construction; hi + mid + lo
== d_pm bit-for-bit), different accumulation order.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from distributed_raytracer_tpu.ops.pallas.mega_bwd_kernel import _local_f_rows

# tape_f sublane indices of the walk tape's winner-param block
_TP_CW, _TP_RW, _TP_AW, _TP_FW, _TP_IW, _TP_MT = 16, 19, 20, 23, 24, 25
K_LO = 32  # low-digit width of the factored segment-sum (power of two)


def _walk_bwd_kernel(
    nit_ref,                     # [1] SMEM (prefetch)
    *refs,                       # tf [+ ti] gtr gtg gtb | outs | scratch
    b: int, c_rows: int, n_sent: int, h_rows: int, ray_grads: bool,
    packed_ti: bool = False,
):
    rest = list(refs)
    tf = rest.pop(0)
    # packed_ti: the forward wrote idx/lane_ray/flags as bitcast f32 on
    # tf sublanes 26..28 (ONE tape stream per row in both directions)
    ti = None if packed_ti else rest.pop(0)
    gtr, gtg, gtb, gacc_out, *rest = rest
    if ray_grads:
        dd_o, *rest = rest
    (sco_x, sco_y, sco_z, scd_x, scd_y, scd_z,
     sca_r, sca_g, sca_b, gacc_s, vp_s) = rest
    i = pl.program_id(0)
    n_it = nit_ref[0]
    i32 = jnp.int32
    k = K_LO

    @pl.when(i == 0)
    def _init():
        z = jnp.zeros((1, b), jnp.float32)
        sco_x[:], sco_y[:], sco_z[:] = z, z, z
        scd_x[:], scd_y[:], scd_z[:] = z, z, z
        sca_r[:], sca_g[:], sca_b[:] = z, z, z
        gacc_s[:] = jnp.zeros_like(gacc_s)

    @pl.when(i < n_it)
    def _row():
        ox, oy, oz = tf[0, 0:1, :], tf[0, 1:2, :], tf[0, 2:3, :]
        dx, dy, dz = tf[0, 3:4, :], tf[0, 4:5, :], tf[0, 5:6, :]
        ar, ag, ab = tf[0, 6:7, :], tf[0, 7:8, :], tf[0, 8:9, :]
        rux, ruy, ruz = tf[0, 9:10, :], tf[0, 10:11, :], tf[0, 11:12, :]
        u = tf[0, 12:13, :]
        if packed_ti:
            bc = lambda x: jax.lax.bitcast_convert_type(x, jnp.int32)
            idx = bc(tf[0, 26:27, :])
            lray = bc(tf[0, 27:28, :])
            flg = bc(tf[0, 28:29, :])
        else:
            idx = ti[0, 0:1, :]
            lray = ti[0, 1:2, :]
            flg = ti[0, 2:3, :]
        hit = (flg & 1) != 0
        act = (flg & 2) != 0
        take = (flg & 4) != 0
        fin = (flg & 8) != 0

        # ---- color cotangent: in-kernel fetch from the [C, B] g_color
        # table at this lane's queue row, gated by `finished` (the dense
        # backward's scheme — no scatter anywhere) ----
        c_cur = lray // b
        rows_i = jax.lax.broadcasted_iota(i32, (c_rows, b), 0)
        sel = (rows_i == c_cur).astype(jnp.float32)
        fin_f = fin.astype(jnp.float32)
        cot_cr = jnp.sum(sel * gtr[:], axis=0, keepdims=True) * fin_f
        cot_cg = jnp.sum(sel * gtg[:], axis=0, keepdims=True) * fin_f
        cot_cb = jnp.sum(sel * gtb[:], axis=0, keepdims=True) * fin_f

        # ---- winner params straight off the tape ----
        cwx = tf[0, _TP_CW + 0:_TP_CW + 1, :]
        cwy = tf[0, _TP_CW + 1:_TP_CW + 2, :]
        cwz = tf[0, _TP_CW + 2:_TP_CW + 3, :]
        rw = jnp.where(hit, tf[0, _TP_RW:_TP_RW + 1, :], 1.0)
        awr = tf[0, _TP_AW + 0:_TP_AW + 1, :]
        awg = tf[0, _TP_AW + 1:_TP_AW + 2, :]
        awb = tf[0, _TP_AW + 2:_TP_AW + 3, :]
        fw = tf[0, _TP_FW:_TP_FW + 1, :]
        iw = jnp.where(hit, tf[0, _TP_IW:_TP_IW + 1, :], 1.0)
        mt = tf[0, _TP_MT:_TP_MT + 1, :]

        # ---- VJP of the rows-native replay bounce (the dense backward's
        # exact body) ----
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

        # ---- factored segment-sum (module docstring, departure 2) ----
        d_pm = jnp.concatenate(
            [d_cwx, d_cwy, d_cwz, d_rw, d_awr, d_awg, d_awb, d_fw, d_iw],
            axis=0,
        )  # [9, B]
        mask = jnp.int32(-65536)  # 0xFFFF0000: truncation-split (exact)

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

        seg = jnp.where(hit, idx, n_sent)
        seg_lo = seg & jnp.int32(k - 1)
        seg_hi = jax.lax.shift_right_logical(seg, jnp.int32(k.bit_length() - 1))
        lo_rows = jax.lax.broadcasted_iota(i32, (k, b), 0)
        oh_lo = (lo_rows == seg_lo).astype(jnp.float32).astype(jnp.bfloat16)
        hi_rows = jax.lax.broadcasted_iota(i32, (h_rows, b), 0)
        oh_hi = (hi_rows == seg_hi).astype(jnp.float32).astype(jnp.bfloat16)
        for j in range(27):
            vp_s[j * k:(j + 1) * k, :] = planes[j:j + 1, :] * oh_lo
        part = jax.lax.dot_general(
            oh_hi, vp_s[:],
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [H, 27*K]: cell (h, j*K+l) = sum over lanes with seg = h*K+l
        gacc_s[:] = gacc_s[:] + part

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
        gacc_out[:] = gacc_s[:]


@functools.partial(jax.jit,
                   static_argnames=("n_slots", "ray_grads", "packed_ti"))
def mega_walk_backward(
    tape_f: jnp.ndarray,
    tape_i: jnp.ndarray,
    n_it: jnp.ndarray,
    g_color: jnp.ndarray,
    n_slots: int,
    ray_grads: bool = False,
    packed_ti: bool = False,
):
    """Run the walk-tape reverse replay as one pallas_call.

    tape_f/tape_i: the recording walk forward's PACKED [T, 32, B] /
    [T, 8, B] outputs (mega_walk_kernel.MegaWalkTapeOut).  g_color:
    [R, 3] color cotangents.  n_slots: walk-pack slot count (the
    segment-sum's id space; slot n_slots is the no-hit sentinel bin).
    Returns (g_pm [n_slots + 1, 9] per-SLOT cotangents — map to original
    sphere ids via WalkPack.slot_to_orig — and dd_rows [T, 8, B] dense
    primary-cotangent rows or None with ray_grads=False)."""
    t_budget, _, b = tape_f.shape
    r = g_color.shape[0]
    c_rows = -(-r // b)
    k = K_LO
    h_rows = -(-(n_slots + 1) // k)
    h_rows = -(-h_rows // 8) * 8

    pad_n = c_rows * b - r
    gt = jnp.pad(g_color, ((0, pad_n), (0, 0)))
    gtr = gt[:, 0].reshape(c_rows, b)
    gtg = gt[:, 1].reshape(c_rows, b)
    gtb = gt[:, 2].reshape(c_rows, b)

    i32, f32 = jnp.int32, jnp.float32
    rev = lambda i, nit: (jnp.maximum(nit[0] - 1 - i, 0), 0, 0)
    tf_spec = pl.BlockSpec((1, 32, b), rev, memory_space=pltpu.VMEM)
    ti_spec = pl.BlockSpec((1, 8, b), rev, memory_space=pltpu.VMEM)
    dd_spec = pl.BlockSpec((1, 8, b), rev, memory_space=pltpu.VMEM)
    ti_specs = [] if packed_ti else [ti_spec]
    ti_ops = [] if packed_ti else [tape_i]
    whole = lambda shape: pl.BlockSpec(
        shape, lambda i, nit: tuple(0 for _ in shape), memory_space=pltpu.VMEM
    )
    out_specs = [whole((h_rows, 27 * k))]
    out_shape = [jax.ShapeDtypeStruct((h_rows, 27 * k), f32)]
    if ray_grads:
        out_specs.append(dd_spec)
        out_shape.append(jax.ShapeDtypeStruct((t_budget, 8, b), f32))
    outs = pl.pallas_call(
        functools.partial(
            _walk_bwd_kernel, b=b, c_rows=c_rows, n_sent=n_slots,
            h_rows=h_rows, ray_grads=ray_grads, packed_ti=packed_ti,
        ),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(t_budget,),
            in_specs=[tf_spec] + ti_specs + [whole((c_rows, b))] * 3,
            out_specs=out_specs,
            scratch_shapes=[pltpu.VMEM((1, b), f32)] * 9
            + [pltpu.VMEM((h_rows, 27 * k), f32)]
            + [pltpu.VMEM((27 * k, b), jnp.bfloat16)],
        ),
        out_shape=out_shape,
    )(
        n_it.reshape(1).astype(i32),
        tape_f, *ti_ops,
        gtr, gtg, gtb,
    )
    gacc = outs[0]
    dd_rows = outs[1] if ray_grads else None
    # unscramble ONCE: (h, j*K+l) -> (h*K+l, j), then sum the hi/mid/lo
    # plane groups (j = plane*9 + param)
    g27 = (gacc.reshape(h_rows, 27, k)
           .transpose(0, 2, 1)
           .reshape(h_rows * k, 27))[: n_slots + 1]
    g_pm = g27[:, 0:9] + g27[:, 9:18] + g27[:, 18:27]
    return g_pm, dd_rows
