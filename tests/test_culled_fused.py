"""Culled fused bounce kernel (ops/pallas/culled_bounce_kernel.py).

The walk + MXU winner select + in-kernel shade is checked BIT-EXACTLY
against a dense pure-JAX oracle that reuses the kernel's own shared
shading body (_shade_vals) with the same ray-identity-keyed hash draws —
possible on CPU because the culled kernel's RNG is plain vector
arithmetic, not pltpu.prng_random_bits (which returns zeros in interpret
mode).  Front-to-back traversal semantics: ray_server.rs:56-60 +
hittable_list.rs:42-55.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental.pallas import tpu as pltpu

from distributed_raytracer_tpu.core.vecmath import BIG, T_MIN
from distributed_raytracer_tpu.models.presets import (
    final_scene_camera,
    rtiow_final_scene,
)
from distributed_raytracer_tpu.models.scene import ABSORB
from distributed_raytracer_tpu.ops.pallas.bounce_kernel import _shade_vals
from distributed_raytracer_tpu.ops.pallas.culled_bounce_kernel import (
    CulledPack,
    _hash_u01,
    build_culled_pack,
    culled_fused_bounce,
)
from distributed_raytracer_tpu.ops.pallas.culled_kernel import (
    build_culled_scene,
)


def _rays(n, key, spread=0.1):
    o = jax.random.normal(key, (n, 3)) * 2 + jnp.array([13.0, 2.0, 3.0])
    d = -o / jnp.linalg.norm(o, axis=-1, keepdims=True)
    d = d + spread * jax.random.normal(jax.random.fold_in(key, 1), (n, 3))
    return o, d


def _oracle_bounce(scene, o, d, act, rid, seed):
    """Dense [R, N] closest-hit in the kernel's own oc-form arithmetic +
    the SHARED shading body with the SAME hash draws — bit-exact oracle."""
    r2 = jnp.where(scene.radii > 0.0, scene.radii * scene.radii, -1.0)
    oc = scene.centers[None, :, :] - o[:, None, :]        # [R, N, 3]
    a = jnp.sum(d * d, axis=-1)                           # [R]
    h = jnp.sum(oc * d[:, None, :], axis=-1)              # [R, N]
    c_q = jnp.sum(oc * oc, axis=-1) - r2[None, :]
    disc = h * h - a[:, None] * c_q
    ok = disc >= 0.0
    sq = jnp.sqrt(jnp.where(ok, disc, 0.0))
    inv_a = 1.0 / a  # multiply by reciprocal, as the kernel does (not /)
    rn = (h - sq) * inv_a[:, None]
    rf = (h + sq) * inv_a[:, None]
    t = jnp.where(ok & (rn > T_MIN), rn, jnp.where(ok & (rf > T_MIN), rf, BIG))
    t_best = jnp.min(t, axis=1)
    idx = jnp.argmin(t, axis=1).astype(jnp.int32)
    hit = t_best < BIG * 0.5

    # winner attrs [16, R]: kernel defaults where no hit (rr/io=1, mt=ABSORB)
    def pick(x, default):
        return jnp.where(hit, x[idx], default)

    w = jnp.stack(
        [
            pick(scene.centers[:, 0], 0.0),
            pick(scene.centers[:, 1], 0.0),
            pick(scene.centers[:, 2], 0.0),
            pick(scene.radii, 1.0),
            pick(scene.albedo[:, 0], 0.0),
            pick(scene.albedo[:, 1], 0.0),
            pick(scene.albedo[:, 2], 0.0),
            pick(scene.fuzz, 0.0),
            pick(scene.ior, 1.0),
            pick(scene.mat_type.astype(jnp.float32), float(ABSORB)),
            pick(jnp.arange(scene.num_spheres, dtype=jnp.float32), 0.0),
        ]
        + [jnp.zeros_like(t_best)] * 5,
        axis=0,
    )
    row = lambda x: x.reshape(1, -1)
    draws = tuple(_hash_u01(row(rid), seed, dd) for dd in range(5))
    return (
        _shade_vals(
            row(o[:, 0]), row(o[:, 1]), row(o[:, 2]),
            row(d[:, 0]), row(d[:, 1]), row(d[:, 2]),
            row(a), row(act)[0:1] > 0, row(t_best), w, draws=draws,
        ),
        idx, hit,
    )


@pytest.fixture(scope="module")
def setup():
    scene = rtiow_final_scene(seed=0, pad_to=512)
    culled = build_culled_scene(scene, chunk=128)
    pack = build_culled_pack(culled)
    key = jax.random.PRNGKey(3)
    o, d = _rays(640, key)
    act = jnp.ones((640,), bool)
    rid = jnp.arange(640, dtype=jnp.int32) * 7 + 13
    return culled, pack, o, d, act, rid


def test_matches_dense_oracle_bitexact(setup):
    culled, pack, o, d, act, rid = setup
    seed = jnp.int32(987654)
    with pltpu.force_tpu_interpret_mode():
        out = culled_fused_bounce(o, d, act, rid, pack, culled.chunk, seed)
    (vals, idx, hit) = _oracle_bounce(culled.scene, o, d, act, rid, seed)
    (nox, noy, noz, ndx, ndy, ndz, atr, atg, atb,
     cor, cog, cob, fin, idx_row, rux, ruy, ruz, u_c) = vals
    np.testing.assert_array_equal(np.asarray(out.hit), np.asarray(hit))
    # winner index: bit-correct on every hit lane (the MXU one-hot select
    # must reconstruct the f32 index exactly through the bf16 planes)
    np.testing.assert_array_equal(
        np.asarray(out.idx)[np.asarray(hit)], np.asarray(idx)[np.asarray(hit)]
    )
    np.testing.assert_array_equal(np.asarray(out.finished), np.asarray(fin)[0])
    # attenuation (pure selects of exact MXU-reconstructed attrs) and the
    # hash draws are EXACT; t-derived positions/directions and the
    # Box-Muller transcendentals land within FMA-contraction slack (the
    # kernel and the oracle are separately compiled XLA programs — same
    # formulas, different fusion/contraction choices)
    np.testing.assert_array_equal(
        np.asarray(out.atten),
        np.stack([np.asarray(v)[0] for v in (atr, atg, atb)], -1),
    )
    np.testing.assert_array_equal(np.asarray(out.u), np.asarray(u_c)[0])
    for got, want, tol in [
        (out.new_o, (nox, noy, noz), 2e-3),
        (out.new_d, (ndx, ndy, ndz), 8e-3),
        (out.color, (cor, cog, cob), 1e-6),
        (out.ruv, (rux, ruy, ruz), 1e-5),
    ]:
        np.testing.assert_allclose(
            np.asarray(got),
            np.stack([np.asarray(v)[0] for v in want], -1),
            atol=tol,
        )


def test_culling_changes_nothing(setup):
    """Real bounds vs all-inf bounds (sweep everything): culling is a pure
    work-skipping optimization — outputs are bit-identical."""
    culled, pack, o, d, act, rid = setup
    seed = jnp.int32(24680)
    dense_pack = CulledPack(
        scene_pack=pack.scene_pack,
        attrs=pack.attrs,
        bounds_c=pack.bounds_c,
        bounds_r2=jnp.full_like(pack.bounds_r2, jnp.inf),
    )
    with pltpu.force_tpu_interpret_mode():
        a = culled_fused_bounce(o, d, act, rid, pack, culled.chunk, seed)
        b = culled_fused_bounce(o, d, act, rid, dense_pack, culled.chunk, seed)
    for x, y in zip(a, b):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_inactive_lanes_passthrough(setup):
    culled, pack, o, d, _, rid = setup
    act = jnp.arange(640) % 3 == 0
    with pltpu.force_tpu_interpret_mode():
        out = culled_fused_bounce(o, d, act, rid, pack, culled.chunk,
                                  jnp.int32(5))
    dead = ~np.asarray(act)
    np.testing.assert_array_equal(np.asarray(out.new_o)[dead], np.asarray(o)[dead])
    np.testing.assert_array_equal(np.asarray(out.new_d)[dead], np.asarray(d)[dead])
    np.testing.assert_array_equal(np.asarray(out.atten)[dead], 1.0)
    np.testing.assert_array_equal(np.asarray(out.color)[dead], 0.0)
    np.testing.assert_array_equal(np.asarray(out.finished)[dead], 0)


def test_hash_u01_distribution():
    """The counter-mode hash draws are uniform and decorrelated enough for
    MC: mean/var within 1%, adjacent-counter correlation < 2%, bins flat."""
    rid = jnp.arange(1 << 16, dtype=jnp.int32)
    u = np.asarray(_hash_u01(rid, jnp.int32(42), 0))
    assert abs(u.mean() - 0.5) < 5e-3
    assert abs(u.var() - 1.0 / 12.0) < 1e-3
    # adjacent ray ids decorrelate
    c = np.corrcoef(u[:-1], u[1:])[0, 1]
    assert abs(c) < 0.02
    hist, _ = np.histogram(u, bins=64, range=(0, 1))
    assert hist.min() > 0.8 * (len(u) / 64)
    # distinct draw indices give distinct streams
    u1 = np.asarray(_hash_u01(rid[:1024], jnp.int32(42), 1))
    assert abs(np.corrcoef(u[:1024], u1)[0, 1]) < 0.05


def test_render_resort_bitidentical():
    """The headline property: with every draw keyed by ray identity, the
    lane re-sort (and its period) is a pure performance knob — the
    rendered sums are BIT-IDENTICAL with re-sorting on or off."""
    from distributed_raytracer_tpu.models.presets import get_config
    from distributed_raytracer_tpu.render.wavefront import (
        render_wavefront_sum_fused,
    )

    scene, cam = get_config("config1")
    cam = cam.replace(image_width=24, max_depth=8)
    culled = build_culled_scene(scene, chunk=128)
    key = jax.random.PRNGKey(7)
    with pltpu.force_tpu_interpret_mode():
        plain = render_wavefront_sum_fused(
            scene, cam, key, spp=2, pool_size=256, culled=culled,
        )
        resorted = render_wavefront_sum_fused(
            scene, cam, key, spp=2, pool_size=256, culled=culled,
            resort_every=2,
        )
    assert np.isfinite(np.asarray(plain)).all()
    np.testing.assert_array_equal(np.asarray(plain), np.asarray(resorted))


def test_render_tiled_perm_pixel_order():
    """pixel_perm changes the STREAM order (and, with rid-keyed draws, the
    noise), but sums come back in pixel order and stay finite/plausible."""
    from distributed_raytracer_tpu.models.presets import get_config
    from distributed_raytracer_tpu.render.order import tile_permutation
    from distributed_raytracer_tpu.render.wavefront import (
        render_wavefront_sum_fused,
    )

    scene, cam = get_config("config1")
    cam = cam.replace(image_width=32, max_depth=8)
    culled = build_culled_scene(scene, chunk=128)
    perm = jnp.asarray(tile_permutation(cam.image_width, cam.image_height))
    key = jax.random.PRNGKey(9)
    with pltpu.force_tpu_interpret_mode():
        sums = render_wavefront_sum_fused(
            scene, cam, key, spp=2, pool_size=256, culled=culled,
            pixel_perm=perm,
        )
        plain = render_wavefront_sum_fused(
            scene, cam, key, spp=2, pool_size=256, culled=culled,
        )
    sums, plain = np.asarray(sums), np.asarray(plain)
    assert np.isfinite(sums).all()
    # same estimator: the two images agree to MC noise at 2 spp
    assert abs(sums.mean() - plain.mean()) < 0.25
