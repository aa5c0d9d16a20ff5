"""Fully fused bounce kernel: intersect + winner select + shade in one pass.

The wavefront renderer's iteration splits into a Pallas intersect and a
pure-JAX shading step; the seam costs six dynamic gathers of winner-sphere
attributes, external threefry draws, and a dozen [B]-array HBM round
trips.  This kernel fuses the whole of `ops/trace.bounce_step`
(= ray_color_iteration, camera.rs:118-144) into one pallas_call:

  - grid = (ray blocks, sphere chunks); during the chunk sweep the kernel
    keeps not just the running (t, idx) but the WINNING SPHERE'S ATTRIBUTES
    as a (16, BR) VMEM block, updated under the same `better` mask — no
    gather ever happens; selection rides the sweep.  The per-chunk winner
    attributes come from ONE MXU matmul, attrs[48, CHUNK] @ one_hot[CHUNK,
    BR], replacing ten masked [CHUNK, BR] max-reductions that were ~40% of
    the sweep's VPU issue slots (profiled on v5e).  EXACTNESS without the
    6-pass f32 decomposition (HIGHEST precision measured +10 us/grid-cell —
    poison): each f32 attribute is pre-split host-side into three bf16
    planes (hi/mid/lo, 8+8+8 >= 24 mantissa bits), the one-hot is exactly
    representable in bf16, MXU products accumulate in f32, and the kernel
    recombines hi+mid+lo — a bit-exact select at DEFAULT-precision cost.
  - on the last chunk it shades in-kernel: surface geometry, Lambertian/
    metal/dielectric scatter with the on-core PRNG (Box-Muller gaussians
    from pltpu.prng_random_bits), absorb/transparent handling, sky color
    for misses — emitting the next ray state, per-bounce attenuation,
    terminal color and status rows.

RNG: seeded per (ray block, iteration) from a scalar input; draws are NOT
bit-compatible with the threefry streams of the JAX tracers (different
generator), but every (pixel, sample) still gets independent noise — a
valid estimator of the same integral, verified statistically in tests.
Forward-only: the gradient paths keep the unfused kernels + custom VJPs.

Status codes (st_out): 0 = continue (scattered), 1 = finished (color
valid: miss -> sky, absorb -> black), matching the termination rules of
camera.rs:118-144.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from distributed_raytracer_tpu.core.vecmath import BIG, NEAR_ZERO_EPS, T_MIN
from distributed_raytracer_tpu.models.scene import (
    ABSORB,
    DIELECTRIC,
    LAMBERTIAN,
    METAL,
    TRANSPARENT,
    Scene,
)

LANE = 128
DEFAULT_BR = 512
SKY_TOP = (0.5, 0.7, 1.0)


class BounceOut(NamedTuple):
    new_o: jnp.ndarray     # [R,3]
    new_d: jnp.ndarray     # [R,3]
    atten: jnp.ndarray     # [R,3] per-bounce attenuation (1 where inactive)
    color: jnp.ndarray     # [R,3] terminal color (valid where finished==1)
    finished: jnp.ndarray  # [R] int32: 1 terminal, 0 continue
    idx: jnp.ndarray       # [R] i32 winning sphere index (junk when no hit)
    hit: jnp.ndarray       # [R] bool
    ruv: jnp.ndarray       # [R,3] the unit-vector draw used (for grad replay)
    u: jnp.ndarray         # [R] the uniform draw used (dielectric choice)


def _u01(shape):
    """uniform (0,1) rows from the on-core PRNG."""
    # prng_random_bits yields SIGNED int32 and Mosaic supports neither
    # uint32->f32 casts nor well-defined right-shifts of negative values
    # (found the hard way as an always-reflect dielectric): keep the low 23
    # bits, which are non-negative in int32, and scale by 2^-23.
    bits = pltpu.prng_random_bits(shape)
    u = (bits & jnp.int32(0x007FFFFF)).astype(jnp.float32) * (1.0 / 8388608.0)
    return jnp.clip(u, 1e-7, 1.0 - 1e-7)


# winner-attribute row indices in the [16, CHUNK] attr matrix / the
# [16, BR] winner carry (rows 11-15 are alignment padding)
_A_CX, _A_CY, _A_CZ, _A_RR = 0, 1, 2, 3
_A_AR, _A_AG, _A_AB, _A_FZ, _A_IO, _A_MT, _A_IDX = 4, 5, 6, 7, 8, 9, 10
_A_ROWS = 16


def _sweep_winner(ox, oy, oz, dx, dy, dz, a, inv_a, cx, cy, cz, r2, attrs):
    """One sphere-chunk sweep + MXU winner-attribute selection.

    Inputs: ray rows [1, BR], scene columns [CHUNK, 1], attr planes
    [48, CHUNK] bf16 (hi/mid/lo).  Returns (t_c [1, BR] chunk-min t,
    wa [16, BR] the chunk winner's attributes, zero rows when no sphere in
    the chunk hits).  Shared by the per-chunk grid kernel (_bounce_kernel)
    and the pool-iteration mega kernel (mega_kernel.py)."""
    ocx = cx - ox
    ocy = cy - oy
    ocz = cz - oz
    h = dx * ocx + dy * ocy + dz * ocz
    c_q = ocx * ocx + ocy * ocy + ocz * ocz - r2
    disc = h * h - a * c_q
    ok = disc >= 0.0
    sqrtd = jnp.sqrt(jnp.where(ok, disc, 0.0))
    rn = (h - sqrtd) * inv_a
    rf = (h + sqrtd) * inv_a
    t = jnp.where(
        ok & (rn > T_MIN), rn, jnp.where(ok & (rf > T_MIN), rf, BIG)
    )
    t_c = jnp.min(t, axis=0, keepdims=True)
    # Exactly one-hot winner mask: gate to the argmin sublane so that when two
    # DISTINCT spheres tie for the chunk minimum, every carried attribute (and
    # the index row) comes from the same sphere — the first-min row, matching
    # jnp.argmin's tie rule.  (A plain t == t_c mask could mix fields.)
    i_min = jnp.argmin(t, axis=0).astype(jnp.int32)[None, :]  # (1, BR)
    row = jax.lax.broadcasted_iota(jnp.int32, t.shape, 0)

    # All ten winner attributes (and the global sphere index, row _A_IDX) in
    # ONE MXU matmul: attrs[48, CHUNK] @ one_hot[CHUNK, BR], bf16 operands,
    # f32 accumulation.  Exact: the one-hot is exact in bf16, each product
    # is attr_plane * 1.0, and the hi/mid/lo planes (split host-side) sum
    # back to the f32 attribute bit-for-bit.  When no sphere in the chunk
    # hits, the one-hot is all-zero -> wa is zero.
    # The one-hot is built by f32 arithmetic (masks stay in 32-bit tiling)
    # then cast: selecting bf16 literals under a (CHUNK, BR) i1 mask asks
    # Mosaic for an i1 relayout (8,128)->(16,128) it cannot do ("Invalid
    # relayout: non-singleton dim replicated in destination").
    sel_f = (row == i_min).astype(jnp.float32) * (
        t_c < BIG * 0.5
    ).astype(jnp.float32)  # (CHUNK, BR) exact one-hot, first-min row only
    selm = sel_f.astype(jnp.bfloat16)
    wa3 = jax.lax.dot_general(
        attrs,
        selm,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [48, BR] = the three bf16 planes, selected
    wa = (
        wa3[0:_A_ROWS]
        + wa3[_A_ROWS:2 * _A_ROWS]
        + wa3[2 * _A_ROWS:3 * _A_ROWS]
    )  # [16, BR]
    return t_c, wa


def _shade_vals(ox, oy, oz, dx, dy, dz, a, act, t_best, w, draws=None):
    """In-kernel shading of the pool against the winner attributes [16, BR]
    — surface geometry, Lambertian/metal/dielectric scatter with the
    on-core PRNG (caller must pltpu.prng_seed first), absorb/transparent
    handling, sky for misses (camera.rs:118-144 semantics).

    draws: optional (u1, u2, u3, u4, u_choice) precomputed uniform rows —
    the culled fused kernel passes ray-identity-keyed hash draws
    (culled_bounce_kernel._hash_u01) so lane re-sorting leaves the
    estimator bit-identical; None = consume the on-core PRNG (caller
    seeded it), the plain fused/mega kernels' behavior.

    Returns rows (no_x, no_y, no_z, nd_x, nd_y, nd_z, at_r, at_g, at_b,
    co_r, co_g, co_b, fin_i32, idx_i32, rux, ruy, ruz, u_choice).
    Shared by _bounce_kernel, the mega kernel, and the culled fused
    kernel."""
    br = ox.shape[1]
    hit = (t_best < BIG * 0.5) & act
    th = jnp.where(hit, t_best, 1.0)

    wcx, wcy, wcz = w[_A_CX:_A_CX + 1], w[_A_CY:_A_CY + 1], w[_A_CZ:_A_CZ + 1]
    wrr = w[_A_RR:_A_RR + 1]
    war, wag, wab = w[_A_AR:_A_AR + 1], w[_A_AG:_A_AG + 1], w[_A_AB:_A_AB + 1]
    wfz, wio = w[_A_FZ:_A_FZ + 1], w[_A_IO:_A_IO + 1]
    idx_row = w[_A_IDX:_A_IDX + 1].astype(jnp.int32)

    px = ox + th * dx
    py = oy + th * dy
    pz = oz + th * dz
    saferr = jnp.where(wrr > 0.0, wrr, 1.0)
    nx = (px - wcx) / saferr
    ny = (py - wcy) / saferr
    nz = (pz - wcz) / saferr
    d_dot_n = dx * nx + dy * ny + dz * nz
    front = d_dot_n < 0.0
    fs = jnp.where(front, 1.0, -1.0)
    nx, ny, nz = nx * fs, ny * fs, nz * fs

    # gaussians via Box-Muller -> random unit vector
    if draws is None:
        u1 = _u01((1, br))
        u2 = _u01((1, br))
        u3 = _u01((1, br))
        u4 = _u01((1, br))
        u_choice = _u01((1, br))
    else:
        u1, u2, u3, u4, u_choice = draws
    rad1 = jnp.sqrt(-2.0 * jnp.log(u1))
    g1 = rad1 * jnp.cos(6.2831853 * u2)
    g2 = rad1 * jnp.sin(6.2831853 * u2)
    g3 = jnp.sqrt(-2.0 * jnp.log(u3)) * jnp.cos(6.2831853 * u4)
    gn = jax.lax.rsqrt(g1 * g1 + g2 * g2 + g3 * g3 + 1e-20)
    rux, ruy, ruz = g1 * gn, g2 * gn, g3 * gn

    # Lambertian (material.rs:46-56)
    lx, ly, lz = nx + rux, ny + ruy, nz + ruz
    near0 = (
        (jnp.abs(lx) < NEAR_ZERO_EPS)
        & (jnp.abs(ly) < NEAR_ZERO_EPS)
        & (jnp.abs(lz) < NEAR_ZERO_EPS)
    )
    lx = jnp.where(near0, nx, lx)
    ly = jnp.where(near0, ny, ly)
    lz = jnp.where(near0, nz, lz)

    # Metal (material.rs:73-80)
    rx = dx - 2.0 * d_dot_n * fs * nx  # reflect about oriented normal
    ry = dy - 2.0 * d_dot_n * fs * ny
    rz = dz - 2.0 * d_dot_n * fs * nz
    rinv = jax.lax.rsqrt(rx * rx + ry * ry + rz * rz + 1e-20)
    mx = rx * rinv + wfz * rux
    my = ry * rinv + wfz * ruy
    mz = rz * rinv + wfz * ruz
    metal_ok = (mx * nx + my * ny + mz * nz) > 0.0

    # Dielectric (material.rs:103-122)
    ior = jnp.where(wio > 0.0, wio, 1.0)
    ri = jnp.where(front, 1.0 / ior, ior)
    dinv = jax.lax.rsqrt(a)
    ux, uy, uz = dx * dinv, dy * dinv, dz * dinv
    cos_t = jnp.minimum(-(ux * nx + uy * ny + uz * nz), 1.0)
    sin2 = jnp.maximum(1.0 - cos_t * cos_t, 0.0)
    cannot = ri * ri * sin2 > 1.0
    r0 = (1.0 - ri) / (1.0 + ri)
    r0 = r0 * r0
    one_m_cos = 1.0 - cos_t
    schlick = r0 + (1.0 - r0) * one_m_cos * one_m_cos * one_m_cos * one_m_cos * one_m_cos
    choose_refl = cannot | (schlick > u_choice)
    # refract
    perp_x = ri * (ux + cos_t * nx)
    perp_y = ri * (uy + cos_t * ny)
    perp_z = ri * (uz + cos_t * nz)
    k = jnp.abs(1.0 - (perp_x * perp_x + perp_y * perp_y + perp_z * perp_z))
    para = -jnp.sqrt(k)
    fx = perp_x + para * nx
    fy = perp_y + para * ny
    fz2 = perp_z + para * nz
    # reflect of unit dir
    u_dot_n = ux * nx + uy * ny + uz * nz
    gx = ux - 2.0 * u_dot_n * nx
    gy = uy - 2.0 * u_dot_n * ny
    gz = uz - 2.0 * u_dot_n * nz
    dielx = jnp.where(choose_refl, gx, fx)
    diely = jnp.where(choose_refl, gy, fy)
    dielz = jnp.where(choose_refl, gz, fz2)

    mt = w[_A_MT:_A_MT + 1]  # material code as f32 (exact small ints)
    is_lam = mt == LAMBERTIAN
    is_met = mt == METAL
    is_die = mt == DIELECTRIC
    is_tra = mt == TRANSPARENT
    is_abs = mt == ABSORB

    ndx = jnp.where(is_lam, lx, jnp.where(is_met, mx, jnp.where(is_die, dielx, dx)))
    ndy = jnp.where(is_lam, ly, jnp.where(is_met, my, jnp.where(is_die, diely, dy)))
    ndz = jnp.where(is_lam, lz, jnp.where(is_met, mz, jnp.where(is_die, dielz, dz)))
    white = jnp.ones_like(war)
    attr = jnp.where(is_die | is_tra, white, war)
    attg = jnp.where(is_die | is_tra, white, wag)
    attb = jnp.where(is_die | is_tra, white, wab)
    # pure i1 logic: where() with bool literal vectors trips Mosaic's
    # integer-truncation lowering
    scattered = (~is_abs) & (metal_ok | ~is_met)

    # transparent keeps the original origin (material.rs:28)
    nox = jnp.where(is_tra, ox, px)
    noy = jnp.where(is_tra, oy, py)
    noz = jnp.where(is_tra, oz, pz)

    # sky for misses (camera.rs:141-143)
    uy_n = dy * dinv
    sky_a = 0.5 * (uy_n + 1.0)
    sky_r = (1.0 - sky_a) + sky_a * SKY_TOP[0]
    sky_g = (1.0 - sky_a) + sky_a * SKY_TOP[1]
    sky_b = (1.0 - sky_a) + sky_a * SKY_TOP[2]

    keep = act & hit & scattered
    miss = act & ~hit
    # absorbed -> black (zeros)
    co_r = jnp.where(miss, sky_r, 0.0)
    co_g = jnp.where(miss, sky_g, 0.0)
    co_b = jnp.where(miss, sky_b, 0.0)
    no_x = jnp.where(keep, nox, ox)
    no_y = jnp.where(keep, noy, oy)
    no_z = jnp.where(keep, noz, oz)
    nd_x = jnp.where(keep, ndx, dx)
    nd_y = jnp.where(keep, ndy, dy)
    nd_z = jnp.where(keep, ndz, dz)
    at_r = jnp.where(keep, attr, 1.0)
    at_g = jnp.where(keep, attg, 1.0)
    at_b = jnp.where(keep, attb, 1.0)
    fin = jnp.where(act & ~keep, 1, 0).astype(jnp.int32)
    return (no_x, no_y, no_z, nd_x, nd_y, nd_z, at_r, at_g, at_b,
            co_r, co_g, co_b, fin, idx_row, rux, ruy, ruz, u_choice)


def _bounce_kernel(
    seed_ref,                                            # [1,1] SMEM int32
    ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref,      # [1,BR]
    act_ref,                                              # [1,BR] int32
    cx_ref, cy_ref, cz_ref, r2_ref,                       # [CHUNK,1] sweep cols
    attr_ref,                                             # [48,CHUNK] bf16 attr planes
    t_ref,                                                # [1,BR] out (hit test)
    no_x, no_y, no_z, nd_x, nd_y, nd_z,                   # [1,BR] next ray
    at_r, at_g, at_b, co_r, co_g, co_b, fin,              # [1,BR]
    i_out, ru_x, ru_y, ru_z, u_out,                       # [1,BR] idx + draws
    w_ref,                                                # [16,BR] VMEM scratch:
    # winner-attribute carry (persists across the sequential TPU grid;
    # re-initialized at chunk 0 of every ray block)
    *, chunk: int, n_chunks: int,
):
    ci = pl.program_id(1)

    @pl.when(ci == 0)
    def _init():
        t_ref[:] = jnp.full_like(t_ref, BIG)
        # per-row defaults: rr/io -> 1 (safe divisors), mt -> ABSORB, rest 0
        rows = jax.lax.broadcasted_iota(jnp.int32, w_ref.shape, 0)
        w_ref[:] = jnp.where(
            (rows == _A_RR) | (rows == _A_IO),
            1.0,
            jnp.where(rows == _A_MT, float(ABSORB), 0.0),
        )

    ox, oy, oz = ox_ref[:], oy_ref[:], oz_ref[:]
    dx, dy, dz = dx_ref[:], dy_ref[:], dz_ref[:]
    a = dx * dx + dy * dy + dz * dz
    inv_a = 1.0 / a

    # ---- sweep this chunk (shared helper; see _sweep_winner) ----
    t_c, wa = _sweep_winner(
        ox, oy, oz, dx, dy, dz, a, inv_a,
        cx_ref[:], cy_ref[:], cz_ref[:], r2_ref[:], attr_ref[:],
    )

    better = t_c < t_ref[:]
    w_ref[:] = jnp.where(better, wa, w_ref[:])
    t_ref[:] = jnp.where(better, t_c, t_ref[:])

    # ---- after the last chunk: shade (shared helper; see _shade_vals) ----
    @pl.when(ci == n_chunks - 1)
    def _shade():
        pltpu.prng_seed(seed_ref[0, 0] + pl.program_id(0))
        (nox, noy, noz, ndx, ndy, ndz, atr, atg, atb,
         cor, cog, cob, fin_row, idx_row, rux, ruy, ruz, u_choice) = _shade_vals(
            ox, oy, oz, dx, dy, dz, a, act_ref[:] > 0, t_ref[:], w_ref[:]
        )
        i_out[:] = idx_row
        co_r[:] = cor
        co_g[:] = cog
        co_b[:] = cob
        no_x[:] = nox
        no_y[:] = noy
        no_z[:] = noz
        nd_x[:] = ndx
        nd_y[:] = ndy
        nd_z[:] = ndz
        at_r[:] = atr
        at_g[:] = atg
        at_b[:] = atb
        fin[:] = fin_row
        ru_x[:] = rux
        ru_y[:] = ruy
        ru_z[:] = ruz
        u_out[:] = u_choice


class BounceRows(NamedTuple):
    """Raw [1, RP] row outputs of the fused bounce kernel (RP = R padded to
    the ray-block multiple).  The rows-native pipeline consumes these
    directly — no [R,3] interleave at the kernel boundary (each stack of
    three [1,R] rows into a [R,3] costs a lane->sublane relayout; a planar
    loop carries rows end-to-end)."""
    no: tuple   # (x, y, z) next origin rows
    nd: tuple   # (x, y, z) next direction rows
    at: tuple   # (r, g, b) per-bounce attenuation rows (1 where inactive)
    co: tuple   # (r, g, b) terminal color rows (valid where finished)
    fin: jnp.ndarray   # [1,RP] i32
    idx: jnp.ndarray   # [1,RP] i32
    t: jnp.ndarray     # [1,RP] f32 (hit ⇔ t < BIG/2)
    ru: tuple   # (x, y, z) unit-vector draw rows
    u: jnp.ndarray     # [1,RP] f32 uniform draw


def _auto_chunk(n0: int) -> int:
    """Sphere-chunk default: as large as the (lane-padded) scene up to 512.
    Fewer grid cells per ray block amortizes the per-cell fixed work (init,
    winner matmul issue, carry update) and grows the one-hot matmul toward
    MXU-efficient shapes — measured +8% end-to-end at 512 spheres (chunk
    512 vs 128: 16.95 vs 15.64 M rays/s, same padded sweep size).
    DRAY_FORCE_CHUNK overrides for hardware A/B debugging — set it BEFORE
    the process's first fused_bounce call (the jit caches on chunk=0, so a
    later change is silently ignored) and use a multiple of 128."""
    import os

    forced = int(os.environ.get("DRAY_FORCE_CHUNK", "0"))
    if forced:
        if forced % LANE:
            raise ValueError(f"DRAY_FORCE_CHUNK must be a multiple of {LANE}")
        return forced
    return min(512, -(-n0 // LANE) * LANE)


def attr_planes(scene: Scene, m: int) -> jnp.ndarray:
    """[48, m] bf16 winner-attribute planes for the MXU one-hot select:
    the 16 attribute rows (_A_CX.._A_IDX + padding) of a scene padded to m
    spheres, each f32 row split into three bf16 planes (hi/mid/lo, exact
    24-bit reconstruction) via lax.reduce_precision — NEVER astype
    round-trips; see the excess-precision note below.  Shared by
    fused_bounce_rows and the culled fused kernel (which chunk-blocks the
    planes for HBM streaming)."""
    n0 = scene.num_spheres
    pad_s = m - n0

    def spad(x, fill=0.0):
        return jnp.pad(x, (0, pad_s), constant_values=fill)

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
            jnp.arange(m, dtype=jnp.float32),  # global sphere index (exact in f32)
        ]
        + [zero_m] * (_A_ROWS - 11),
        axis=0,
    )  # [16, m]
    # Split via lax.reduce_precision, NOT astype(bf16).astype(f32): under
    # --xla_allow_excess_precision=true (set by this TPU toolchain) XLA may
    # elide the f32->bf16->f32 round-trip, which makes hi == attr exactly
    # and ZEROES the mid/lo planes — on hardware that silently truncated
    # every selected attribute to bf16 and rounded odd sphere indices
    # >= 257 to even (found as an inverse-rendering regression; pinned by
    # tests/test_tpu_hw.py::test_winner_idx_exact_512_spheres).
    # reduce_precision is semantic rounding the compiler must honor.
    hi_f = jax.lax.reduce_precision(attr_rows, 8, 7)
    r1 = attr_rows - hi_f
    mid_f = jax.lax.reduce_precision(r1, 8, 7)
    lo_f = r1 - mid_f
    return jnp.concatenate(
        [hi_f.astype(jnp.bfloat16), mid_f.astype(jnp.bfloat16),
         lo_f.astype(jnp.bfloat16)], axis=0
    )  # [48, m] bf16, hi+mid+lo == attr exactly (24 mantissa bits)


@functools.partial(jax.jit, static_argnames=("block_rays", "chunk"))
def fused_bounce_rows(
    ox, oy, oz, dx, dy, dz,
    act_row: jnp.ndarray,
    scene: Scene,
    seed: jnp.ndarray,
    block_rays: int = DEFAULT_BR,
    chunk: int = 0,
) -> BounceRows:
    """Rows-native fused bounce: six [1, RP] f32 ray rows + [1, RP] i32
    active row in, raw row outputs back (RP must be a multiple of the ray
    block).  `fused_bounce` wraps this with the [R,3] interleave for
    callers that carry lane-major state.  chunk=0 -> _auto_chunk."""
    rp = ox.shape[1]
    n0 = scene.num_spheres
    chunk = chunk or _auto_chunk(n0)
    m = -(-n0 // chunk) * chunk
    pad_s = m - n0

    def spad(x, fill=0.0):
        return jnp.pad(x, (0, pad_s), constant_values=fill)

    def scol(x, fill=0.0):
        return spad(x, fill).reshape(m, 1)

    r2 = jnp.where(scene.radii > 0.0, scene.radii * scene.radii, -1.0)
    # sweep columns ([m,1], spheres on sublanes): only the quadratic's inputs
    scene_cols = [
        scol(scene.centers[:, 0]),
        scol(scene.centers[:, 1]),
        scol(scene.centers[:, 2]),
        scol(r2, fill=-1.0),
    ]
    # attribute matrix for the in-kernel winner matmul: [48, m] bf16 planes
    # (attr_planes; exact 24-bit hi/mid/lo split), chunk-blocked to
    # [n_chunks*48, chunk] so a BlockSpec can stream one [48, chunk] tile
    # per grid step alongside the sweep columns
    planes = attr_planes(scene, m)
    n_chunks_s = m // chunk
    attrs = (
        planes.reshape(3 * _A_ROWS, n_chunks_s, chunk)
        .transpose(1, 0, 2)
        .reshape(n_chunks_s * 3 * _A_ROWS, chunk)
    )

    br = min(block_rays, max(LANE, rp))
    assert rp % br == 0, (rp, br)
    rows = [ox, oy, oz, dx, dy, dz, act_row]

    n_chunks = n_chunks_s  # one derived value; attr blocking must agree
    ray_spec = pl.BlockSpec((1, br), lambda i, j: (0, i), memory_space=pltpu.VMEM)
    scene_spec = pl.BlockSpec((chunk, 1), lambda i, j: (j, 0), memory_space=pltpu.VMEM)
    attr_spec = pl.BlockSpec(
        (3 * _A_ROWS, chunk), lambda i, j: (j, 0), memory_space=pltpu.VMEM
    )
    out_spec = pl.BlockSpec((1, br), lambda i, j: (0, i), memory_space=pltpu.VMEM)
    f32 = jnp.float32
    i32 = jnp.int32
    out_shapes = (
        [jax.ShapeDtypeStruct((1, rp), f32)]            # t
        + [jax.ShapeDtypeStruct((1, rp), f32)] * 12     # next o/d, atten, color
        + [jax.ShapeDtypeStruct((1, rp), i32)]          # finished
        + [jax.ShapeDtypeStruct((1, rp), i32)]          # winner idx
        + [jax.ShapeDtypeStruct((1, rp), f32)] * 4      # draws (ruv, u)
    )

    outs = pl.pallas_call(
        functools.partial(_bounce_kernel, chunk=chunk, n_chunks=n_chunks),
        grid=(rp // br, n_chunks),
        in_specs=[pl.BlockSpec((1, 1), lambda i, j: (0, 0), memory_space=pltpu.SMEM)]
        + [ray_spec] * 7
        + [scene_spec] * 4
        + [attr_spec],
        out_specs=[out_spec] * 19,
        out_shape=out_shapes,
        scratch_shapes=[pltpu.VMEM((_A_ROWS, br), jnp.float32)],
    )(jnp.asarray(seed, jnp.int32).reshape(1, 1), *rows, *scene_cols, attrs)

    (t_row, nox, noy, noz, ndx, ndy, ndz,
     atr, atg, atb, cor, cog, cob, finished,
     idx_row, rux, ruy, ruz, u_row) = outs

    return BounceRows(
        no=(nox, noy, noz),
        nd=(ndx, ndy, ndz),
        at=(atr, atg, atb),
        co=(cor, cog, cob),
        fin=finished,
        idx=idx_row,
        t=t_row,
        ru=(rux, ruy, ruz),
        u=u_row,
    )


@functools.partial(jax.jit, static_argnames=("block_rays", "chunk"))
def fused_bounce(
    ray_o: jnp.ndarray,
    ray_d: jnp.ndarray,
    active: jnp.ndarray,
    scene: Scene,
    seed: jnp.ndarray,
    block_rays: int = DEFAULT_BR,
    chunk: int = 0,
) -> BounceOut:
    """One fused bounce for a wavefront.  active: [R] bool.  seed: i32
    scalar (vary per pool iteration).  Lane-major convenience wrapper over
    fused_bounce_rows (interleaves rows back into [R,3] arrays).
    chunk=0 -> _auto_chunk."""
    r = ray_o.shape[0]
    br = min(block_rays, max(LANE, -(-r // LANE) * LANE))
    pad_r = (-r) % br
    rp = r + pad_r

    def row(x):
        return jnp.pad(x, (0, pad_r)).reshape(1, rp)

    res = fused_bounce_rows(
        row(ray_o[:, 0]), row(ray_o[:, 1]), row(ray_o[:, 2]),
        row(ray_d[:, 0]), row(ray_d[:, 1]), row(ray_d[:, 2]),
        row(active.astype(jnp.int32)),
        scene, seed, block_rays=br, chunk=chunk,
    )

    stack3 = lambda t3: jnp.stack([t3[0][0, :r], t3[1][0, :r], t3[2][0, :r]], axis=-1)
    return BounceOut(
        new_o=stack3(res.no),
        new_d=stack3(res.nd),
        atten=stack3(res.at),
        color=stack3(res.co),
        finished=res.fin[0, :r],
        idx=res.idx[0, :r],
        hit=res.t[0, :r] < BIG * 0.5,
        ruv=stack3(res.ru),
        u=res.u[0, :r],
    )
