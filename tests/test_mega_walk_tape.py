"""Walk TAPE engine tests: the recording multi-chunk forward + the
scene-size-independent walk backward (VERDICT r4 item 1 — gradients past
one sweep chunk; the reference's size-agnostic bounce engine,
/root/reference/src/raytracer/hittable_list.rs:60-74, differentiable).

Oracles, strongest first:
  - the recording forward must be BIT-IDENTICAL to the shipping mega-walk
    render engine at equal seeds (the fwd+bwd pipeline differentiates the
    engine, not a sibling estimator);
  - the walk backward must match the XLA reverse-tape backward
    (_backward_tape) on the SAME tape against the reordered scene, to the
    dense engine's f32 accumulation band;
  - the full tracer's gradients (through the slot->original permutation)
    must match jax.grad of the frozen replay oracle.  Geometry grads
    (centers/radii) get a looser band: the XLA backward itself differs
    from the oracle by ~2.5e-3 rel there (cancellation-heavy sums; the
    walk backward is CLOSER to the XLA backward, ~7e-5, than either is to
    the oracle — measured round 5).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental.pallas import tpu as pltpu

from distributed_raytracer_tpu.grad.tapegrad import (
    _backward_tape,
    _Tape,
    camera_pos_from_tape,
    make_tape_camera_walk_tracer,
    replay_from_tape,
)
from distributed_raytracer_tpu.models.scene import Scene
from distributed_raytracer_tpu.ops.camera import make_camera
from distributed_raytracer_tpu.ops.pallas.mega_walk_bwd_kernel import (
    mega_walk_backward,
)
from distributed_raytracer_tpu.ops.pallas.mega_walk_kernel import (
    mega_walk_colors,
    mega_walk_forward_camera,
    walk_pack_arrays_from_scene,
    walk_pack_for,
)
from distributed_raytracer_tpu.ops.pallas.mega_render_kernel import (
    camera_scalar_row,
)

POOL, BR = 128, 128


def _field_scene(n=640, seed=0):
    rng = np.random.default_rng(seed)
    c = rng.uniform(-12, 12, (n, 3))
    c[:, 1] = rng.uniform(0.2, 2.5, n)
    mats = rng.integers(0, 3, n)
    return Scene(
        centers=jnp.asarray(c, jnp.float32),
        radii=jnp.asarray(rng.uniform(0.3, 0.7, n), jnp.float32),
        albedo=jnp.asarray(rng.uniform(0.1, 0.9, (n, 3)), jnp.float32),
        mat_type=jnp.asarray(mats, jnp.int32),
        fuzz=jnp.asarray(rng.uniform(0, 0.4, n) * (mats == 1), jnp.float32),
        ior=jnp.asarray(np.where(mats == 2, 1.5, 1.0), jnp.float32),
    )


@pytest.fixture(scope="module")
def walk_tape_run():
    """One recorded run shared by every test: scene (3 walk chunks),
    camera, pack, the recording forward's outputs, and the _Tape view."""
    scene = _field_scene()
    cam = make_camera(
        aspect_ratio=1.0, image_width=24, samples_per_pixel=1, max_depth=4
    )
    pack = walk_pack_for(scene, cam, chunk=256)
    assert pack.n_chunks >= 2  # multi-chunk or the test proves nothing
    key = jax.random.PRNGKey(7)
    bounce_seed = jnp.asarray(
        jax.random.randint(key, (), 0, 2**31 - 1), jnp.int32
    )
    cam_seed = jnp.asarray(
        jax.random.randint(jax.random.fold_in(key, 0xCA3), (), 0, 2**31 - 1),
        jnp.int32,
    )
    with pltpu.force_tpu_interpret_mode():
        sp, at, rs = walk_pack_arrays_from_scene(
            scene, pack.slot_to_orig, pack.chunk
        )
        out = mega_walk_forward_camera(
            sp, at, pack.bounds, camera_scalar_row(cam), jnp.int32(0),
            bounce_seed, cam_seed, n_pix=cam.num_pixels, w=cam.image_width,
            max_depth=cam.max_depth, chunk=pack.chunk,
            n_chunks=pack.n_chunks, pool=POOL, block_rays=BR,
        )
        out = jax.tree.map(jax.block_until_ready, out)
    assert int(out.clean) == 1
    tape = _Tape(
        fdata=out.tape_f[:, :16, :].transpose(0, 2, 1),
        idata=out.tape_i[:, :3, :].transpose(0, 2, 1),
    )
    return dict(
        scene=scene, cam=cam, pack=pack, rs=rs, out=out, tape=tape,
        key=key, bounce_seed=bounce_seed, cam_seed=cam_seed,
    )


def test_recording_walk_forward_equals_render_engine(walk_tape_run):
    """The recording forward IS the shipping engine: colors bit-identical
    to mega_walk_colors at equal seeds (mega_walk_kernel.py record mode)."""
    t = walk_tape_run
    with pltpu.force_tpu_interpret_mode():
        ren = mega_walk_colors(
            t["pack"], t["cam"], jnp.int32(0), t["bounce_seed"],
            t["cam_seed"], pool=POOL, block_rays=BR,
        )
    rec = np.asarray(t["out"].colors.reshape(-1, 3)[: t["cam"].num_pixels])
    assert np.array_equal(rec, np.asarray(ren))


def test_walk_forward_tape_replays_exactly(walk_tape_run):
    """replay_from_tape (frozen take/hit/live/finished + recorded draws)
    reproduces the recorded colors from the tape alone.

    Only the OUTER control flow is frozen on the tape; internal discrete
    branches (reflect-vs-refract at refl ~ u, metal_ok, near-zero
    Lambertian) are recomputed from params — the replay's [B,3] vector
    math rounds differently from the kernel's componentwise rows, so a
    knife-edge branch can flip on isolated lanes (measured: 4/1728
    elements at 24x24 depth 4).  Assert the bulk at the dense band and
    bound the knife-edge fraction."""
    t = walk_tape_run
    r = t["cam"].num_pixels
    cols = np.asarray(replay_from_tape(
        t["rs"], jnp.zeros((r, 3)), jnp.ones((r, 3)), t["tape"],
        int(t["out"].n_it), rays_from_tape=True,
    ))
    rec = np.asarray(t["out"].colors.reshape(-1, 3)[:r])
    diff = np.abs(cols - rec)
    bad = diff > (1e-5 * np.abs(rec) + 1e-5)
    assert bad.mean() < 0.005, (bad.sum(), diff.max())
    assert diff.max() < 0.05, diff.max()


def test_walk_backward_matches_xla_backward(walk_tape_run):
    """mega_walk_backward (params-from-tape + factored segment-sum) vs the
    XLA reverse-tape backward on the SAME tape, reordered-scene param
    space.  Band: the dense mega backward's own interpret-mode band."""
    t = walk_tape_run
    r = t["cam"].num_pixels
    rng = np.random.default_rng(3)
    gc = jnp.asarray(rng.standard_normal((r, 3)), jnp.float32)
    n_slots = t["pack"].slot_to_orig.shape[0]
    with pltpu.force_tpu_interpret_mode():
        g_pm, _ = mega_walk_backward(
            t["out"].tape_f, t["out"].tape_i, t["out"].n_it, gc,
            n_slots=n_slots, ray_grads=False,
        )
    pos = camera_pos_from_tape(t["out"].tape_i, t["out"].n_it, r)
    d_rs, _, _ = _backward_tape(
        t["rs"], t["tape"], t["out"].n_it, pos, gc, segsum="scatter",
        unroll=1, ray_grads=False,
    )
    ref = np.concatenate(
        [np.asarray(d_rs.centers), np.asarray(d_rs.radii)[:, None],
         np.asarray(d_rs.albedo), np.asarray(d_rs.fuzz)[:, None],
         np.asarray(d_rs.ior)[:, None]], axis=1,
    )
    got = np.asarray(g_pm)[:n_slots]
    rel = np.abs(got - ref).max() / (np.abs(ref).max() + 1e-30)
    assert rel < 5e-4, rel


def test_walk_tracer_grads_match_replay_oracle(walk_tape_run):
    """make_tape_camera_walk_tracer end to end: gradients w.r.t. EVERY
    scene parameter, mapped through the slot->original permutation, match
    jax.grad of the replay oracle."""
    t = walk_tape_run
    scene, cam, pack = t["scene"], t["cam"], t["pack"]
    r = cam.num_pixels
    rng = np.random.default_rng(3)
    gc = jnp.asarray(rng.standard_normal((r, 3)), jnp.float32)
    ids = jnp.zeros((r,), jnp.int32)
    tr = make_tape_camera_walk_tracer(
        t["key"], cam, scene, chunk=256, pool=POOL, block_rays=BR
    )
    params = {"albedo": scene.albedo, "centers": scene.centers,
              "radii": scene.radii, "fuzz": scene.fuzz, "ior": scene.ior}
    with pltpu.force_tpu_interpret_mode():
        val, grads = jax.value_and_grad(
            lambda p: jnp.sum(tr(scene.replace(**p), ids) * gc)
        )(params)
    assert np.isfinite(float(val))

    rs = t["rs"]
    oparams = {"albedo": rs.albedo, "centers": rs.centers,
               "radii": rs.radii, "fuzz": rs.fuzz, "ior": rs.ior}
    og = jax.grad(
        lambda p: jnp.sum(
            replay_from_tape(
                rs.replace(**p), jnp.zeros((r, 3)), jnp.ones((r, 3)),
                t["tape"], int(t["out"].n_it), rays_from_tape=True,
            ) * gc
        )
    )(oparams)
    sto = np.asarray(pack.slot_to_orig)
    vm = sto >= 0
    for k2, got_j in grads.items():
        got = np.asarray(got_j)
        want = np.zeros_like(got)
        want[sto[vm]] = np.asarray(og[k2])[vm]
        rel = np.abs(got - want).max() / (np.abs(want).max() + 1e-30)
        # geometry grads: the XLA backward itself sits ~2.5e-3 rel from
        # the oracle here (f32 cancellation); material grads are tight
        band = 5e-3 if k2 in ("centers", "radii") else 5e-4
        assert rel < band, (k2, rel)


def test_walk_tracer_dp_shards_bit_identical(walk_tape_run):
    """make_tape_camera_walk_dp_tracer: sharded colors == the
    single-device walk tracer (global pixel-keyed draws), grads finite.

    Uses dryrun_multichip's proven shape (depth 2, 32x32, 8 shards):
    deeper/odd-shard interpret dp-walk-tape configurations can starve the
    XLA:CPU client (docs/DESIGN.md §18 residual limitation — this shape
    is measured reliable, 14 s/run)."""
    from distributed_raytracer_tpu.parallel import (
        make_tape_camera_walk_dp_tracer,
    )
    from distributed_raytracer_tpu.parallel.mesh import make_mesh

    t = walk_tape_run
    scene = t["scene"]
    cam = make_camera(
        aspect_ratio=1.0, image_width=32, samples_per_pixel=1, max_depth=2
    )
    n_pix = cam.num_pixels
    mesh = make_mesh(n_rays=8, n_scene=1)
    with pltpu.force_tpu_interpret_mode():
        dp = make_tape_camera_walk_dp_tracer(
            mesh, t["key"], cam, scene, chunk=256, pool=POOL, block_rays=BR
        )
        wl, g = jax.jit(jax.value_and_grad(
            lambda p: jnp.mean(dp(scene.replace(**p))[:n_pix] ** 2)
        ))({"albedo": scene.albedo})
        cols_dp = jax.jit(dp)(scene)
        single = make_tape_camera_walk_tracer(
            t["key"], cam, scene, chunk=256, pool=POOL, block_rays=BR
        )
        cols_1 = single(scene, jnp.zeros((n_pix,), jnp.int32))
    assert np.array_equal(
        np.asarray(cols_dp)[:n_pix], np.asarray(cols_1)
    )
    assert np.isfinite(float(wl))
    assert bool(jnp.all(jnp.isfinite(g["albedo"])))
    assert float(jnp.sum(jnp.abs(g["albedo"]))) > 0.0


@pytest.mark.slow
def test_walk_tracer_8192_spheres_matches_oracle():
    """VERDICT r4 item 1 acceptance: the walk tape tracer at 8,192
    spheres (16x the dense cap) matches the replay_from_tape oracle on
    CPU.  Tiny image/depth — interpret mode walks 30+ chunks per row."""
    from distributed_raytracer_tpu.models.presets import random_sphere_field

    scene = random_sphere_field(8192, seed=11, extent=40.0)
    cam = make_camera(
        aspect_ratio=1.0, image_width=16, samples_per_pixel=1, max_depth=3,
        vfov=55.0, lookfrom=(0.0, 25.0, 80.0), lookat=(0.0, 0.0, 0.0),
        vup=(0.0, 1.0, 0.0), defocus_angle=0.0, focus_dist=10.0,
    )
    pack = walk_pack_for(scene, cam, chunk=256)
    assert pack.n_chunks >= 32
    key = jax.random.PRNGKey(5)
    r = cam.num_pixels
    ids = jnp.zeros((r,), jnp.int32)
    rng = np.random.default_rng(4)
    gc = jnp.asarray(rng.standard_normal((r, 3)), jnp.float32)
    tr = make_tape_camera_walk_tracer(key, cam, scene, chunk=256, pool=POOL,
                                      block_rays=BR)
    params = {"albedo": scene.albedo, "centers": scene.centers,
              "radii": scene.radii}
    with pltpu.force_tpu_interpret_mode():
        val, grads = jax.value_and_grad(
            lambda p: jnp.sum(tr(scene.replace(**p), ids) * gc)
        )(params)
        # the same recorded run, for the oracle
        sp, at, rs = walk_pack_arrays_from_scene(
            scene, pack.slot_to_orig, pack.chunk
        )
        bounce_seed = jnp.asarray(
            jax.random.randint(key, (), 0, 2**31 - 1), jnp.int32
        )
        cam_seed = jnp.asarray(
            jax.random.randint(jax.random.fold_in(key, 0xCA3), (), 0,
                               2**31 - 1), jnp.int32,
        )
        out = mega_walk_forward_camera(
            sp, at, pack.bounds, camera_scalar_row(cam), jnp.int32(0),
            bounce_seed, cam_seed, n_pix=r, w=cam.image_width,
            max_depth=cam.max_depth, chunk=pack.chunk,
            n_chunks=pack.n_chunks, pool=POOL, block_rays=BR,
        )
    assert np.isfinite(float(val))
    tape = _Tape(
        fdata=out.tape_f[:, :16, :].transpose(0, 2, 1),
        idata=out.tape_i[:, :3, :].transpose(0, 2, 1),
    )
    og = jax.grad(
        lambda p: jnp.sum(
            replay_from_tape(
                rs.replace(**p), jnp.zeros((r, 3)), jnp.ones((r, 3)),
                tape, int(out.n_it), rays_from_tape=True,
            ) * gc
        )
    )({"albedo": rs.albedo, "centers": rs.centers, "radii": rs.radii})
    # geometry reference: the XLA reverse-tape backward on the SAME tape.
    # At 8k spheres a few cancellation-heavy geometry bins carry ~1% f32
    # accumulation error in EVERY f32 backend (walk backward and XLA
    # backward measured EQUIDISTANT, 0.17091 vs 0.17092 max, from an f64
    # replay oracle — scripts/_f64_oracle_probe.py, docs/DESIGN.md §19),
    # so the f32 ORACLE is the wrong geometry reference at this scale;
    # the XLA backward shares the tape and isolates our kernel's error.
    pos = camera_pos_from_tape(out.tape_i, out.n_it, r)
    d_rs, _, _ = _backward_tape(rs, tape, out.n_it, pos, gc,
                                segsum="scatter", unroll=1, ray_grads=False)
    xg = {"albedo": d_rs.albedo, "centers": d_rs.centers,
          "radii": d_rs.radii}
    sto = np.asarray(pack.slot_to_orig)
    vm = sto >= 0
    for k2, got_j in grads.items():
        got = np.asarray(got_j)
        ref_slot = og[k2] if k2 == "albedo" else xg[k2]
        want = np.zeros_like(got)
        want[sto[vm]] = np.asarray(ref_slot)[vm]
        if k2 in ("centers", "radii"):
            rel = (np.linalg.norm(got - want)
                   / (np.linalg.norm(want) + 1e-30))
            assert rel < 1e-3, (k2, rel)
        else:
            rel = np.abs(got - want).max() / (np.abs(want).max() + 1e-30)
            assert rel < 5e-4, (k2, rel)
