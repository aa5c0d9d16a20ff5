"""Pool-iteration mega-kernel (ops/pallas/mega_kernel.py) + its tapegrad
integration.

Runs under the Pallas TPU interpreter on CPU.  Round 4: every draw is the
(rid, depth)-keyed hash (the render kernel's scheme), so interpret-mode
tests see REAL noise, the tape must replay and differentiate exactly with
that noise, and the recording CAMERA forward must agree with the mega
RENDER kernel bit-for-bit at equal seeds (they are the same program up to
the tape outputs).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental.pallas import tpu as pltpu

from distributed_raytracer_tpu.grad.tapegrad import (
    _backward_tape,
    _forward_tape,
    _forward_tape_mega,
    make_tape_tracer,
    replay_from_tape,
)
from distributed_raytracer_tpu.models.scene import SceneBuilder
from distributed_raytracer_tpu.ops.camera import generate_rays, make_camera
from distributed_raytracer_tpu.ops.pallas.mega_kernel import mega_budget


def setup(width=24, depth=8, seed=7):
    scene = (
        SceneBuilder()
        .add_lambertian((0, -100.5, -1), 100.0, (0.6, 0.7, 0.2))
        .add_lambertian((0, 0, -1.5), 0.5, (0.7, 0.3, 0.3))
        .add_metal((1.1, 0, -1.5), 0.4, (0.8, 0.8, 0.8), 0.15)
        .add_dielectric((-1.1, 0, -1.5), 0.4, 1.5)
        .add_transparent((0.3, 0.4, -1.2), 0.15)
        .build()
    )
    cam = make_camera(aspect_ratio=1.0, image_width=width, max_depth=depth)
    ids = jnp.arange(cam.num_pixels, dtype=jnp.int32)
    o, d = generate_rays(cam, jax.random.PRNGKey(seed), ids % width,
                         ids // width)
    return scene, o, d


@pytest.mark.parametrize("pool,r_cut", [(128, None), (128, 300), (256, 500)])
def test_mega_accounting_and_replay(pool, r_cut):
    """Every ray is accounted for exactly once; the recorded tape replays
    to the kernel's own colors; n_it is even (backward-unroll contract)."""
    scene, o, d = setup()
    if r_cut:
        o, d = o[:r_cut], d[:r_cut]
    r = o.shape[0]
    depth = 8
    key = jax.random.PRNGKey(3)

    with pltpu.force_tpu_interpret_mode():
        color, tape, n_it, pos = _forward_tape_mega(
            scene, o, d, key, depth, pool
        )
        color, tape, n_it, pos = jax.tree.map(np.asarray,
                                              (color, tape, n_it, pos))
    n_iters = int(n_it)
    assert n_iters % 2 == 0
    assert 0 < n_iters <= mega_budget(r, depth, min(pool, r))
    assert np.isfinite(color).all()

    # accounting: pos >= 0 iff the ray finished (depth-exhausted rays are
    # the only pos == -1 case and contribute black)
    fin_rays = pos >= 0
    assert np.all(color[~fin_rays] == 0.0)
    # every finished position is a distinct tape slot with the fin flag
    b = tape.fdata.shape[1]
    its, lanes = pos[fin_rays] // b, pos[fin_rays] % b
    assert len(set(map(tuple, np.stack([its, lanes], -1)))) == fin_rays.sum()
    flags = tape.idata[its, lanes, 2]
    assert np.all((flags & 8) != 0), "pos points at non-finishing rows"
    # the finishing lane's recorded ray id is the ray
    assert np.array_equal(tape.idata[its, lanes, 1], np.nonzero(fin_rays)[0])

    # tape replay reproduces the kernel's colors (recorded draws)
    re_color = np.asarray(replay_from_tape(scene, o, d,
                                           jax.tree.map(jnp.asarray, tape),
                                           n_iters))
    np.testing.assert_allclose(color, re_color, rtol=1e-5, atol=1e-6)


def test_recording_camera_forward_equals_render_kernel():
    """THE round-4 anchor: with draws keyed by GLOBAL (rid, depth) hash in
    both programs, the recording camera forward (mega_forward_camera with
    rid_base = sample * num_pixels) renders colors BIT-IDENTICAL to the
    production mega render kernel — the fwd+bwd pipeline's forward is the
    shipping forward, not a sibling estimator."""
    from distributed_raytracer_tpu.ops.pallas.mega_kernel import (
        mega_forward_camera,
    )
    from distributed_raytracer_tpu.ops.pallas.mega_render_kernel import (
        camera_scalar_row,
        mega_render_colors,
    )

    scene, _, _ = setup()
    cam = make_camera(
        aspect_ratio=1.0, image_width=16, max_depth=6, vfov=30.0,
        lookfrom=(0.0, 0.5, 2.0), lookat=(0.0, 0.0, -1.5),
        vup=(0.0, 1.0, 0.0), defocus_angle=1.0, focus_dist=3.0,
    )
    n_pix = cam.num_pixels
    ids = jnp.arange(n_pix, dtype=jnp.int32)
    s = jnp.int32(3)
    bs, cs = jnp.int32(123456), jnp.int32(987654)

    with pltpu.force_tpu_interpret_mode():
        render = mega_render_colors(scene, cam, s, bs, cs, pool=128,
                                    block_rays=128)
        out = mega_forward_camera(
            scene, ids, bs, cs, camera_scalar_row(cam), cam.image_width,
            cam.max_depth, pool=128, block_rays=128,
            rid_base=s * jnp.int32(n_pix),
        )
    # unpack the recording forward's colors from its tape positions (the
    # camera kernel skips the in-kernel pos update; derive from flags)
    from distributed_raytracer_tpu.grad.tapegrad import camera_pos_from_tape

    t_budget, _, b = out.tape_f.shape
    pos = np.asarray(camera_pos_from_tape(out.tape_i, out.n_it, n_pix))
    flat = np.asarray(out.tape_f[:, 13:16, :].transpose(0, 2, 1)).reshape(-1, 3)
    colors = np.where((pos >= 0)[:, None],
                      flat[np.clip(pos, 0, t_budget * b - 1)], 0.0)
    np.testing.assert_array_equal(colors, np.asarray(render))


@pytest.mark.parametrize("segsum", ["scatter", "matmul"])
def test_mega_backward_matches_replay_autodiff(segsum):
    scene, o, d = setup(width=16, depth=6)
    key = jax.random.PRNGKey(11)

    with pltpu.force_tpu_interpret_mode():
        color, tape, n_it, pos = _forward_tape_mega(scene, o, d, key, 6, 128)
    n_iters = int(n_it)
    g_color = jax.random.normal(jax.random.PRNGKey(2), color.shape)

    def oracle_loss(s, oo, dd):
        return jnp.sum(replay_from_tape(s, oo, dd, tape, n_iters) * g_color)

    go_scene, go_o, go_d = jax.grad(
        oracle_loss, argnums=(0, 1, 2), allow_int=True
    )(scene, o, d)
    # unroll=2 mirrors the production wiring (mega pads n_it to even)
    d_scene, g_o, g_d = jax.jit(
        lambda s, g: _backward_tape(s, tape, n_it, pos, g, segsum,
                                    unroll=2)
    )(scene, g_color)

    for name in ("centers", "radii", "albedo", "fuzz", "ior"):
        a = np.asarray(getattr(d_scene, name))
        b = np.asarray(getattr(go_scene, name))
        scale = np.abs(b).max() + 1e-8
        # 5e-4: real hash noise (round 4) exposes f32 accumulation-order
        # differences between the stacked segment-sum and replay autodiff
        np.testing.assert_allclose(a / scale, b / scale, atol=5e-4,
                                   err_msg=name)
    for a, b, name in ((g_o, go_o, "ray_o"), (g_d, go_d, "ray_d")):
        scale = np.abs(np.asarray(b)).max() + 1e-8
        np.testing.assert_allclose(
            np.asarray(a) / scale, np.asarray(b) / scale, atol=5e-4,
            err_msg=name,
        )


def test_mega_tracer_end_to_end():
    """make_tape_tracer(use_mega=True): value + grad runs and the value
    matches the raw forward."""
    scene, o, d = setup(width=12, depth=6)
    key = jax.random.PRNGKey(9)
    tracer = make_tape_tracer(key, 6, pool=128, use_mega=True)

    with pltpu.force_tpu_interpret_mode():
        loss, g = jax.value_and_grad(
            lambda s: jnp.sum(tracer(s, o, d) ** 2), allow_int=True
        )(scene)
        want, _, _, _ = _forward_tape_mega(scene, o, d, key, 6, 128)
    assert np.isfinite(float(loss)) and float(loss) > 0
    np.testing.assert_allclose(float(loss), float(jnp.sum(want ** 2)),
                               rtol=1e-5)
    for name in ("centers", "radii", "albedo", "fuzz", "ior"):
        assert np.isfinite(np.asarray(getattr(g, name))).all(), name


def test_mega_budget_overflow_is_loud():
    """A budget too small to finish must poison the colors with NaN, not
    silently truncate."""
    scene, o, d = setup(width=12, depth=6)
    key = jax.random.PRNGKey(4)
    with pltpu.force_tpu_interpret_mode():
        color, _, _, _ = _forward_tape_mega(
            scene, o, d, key, 6, 128, budget=2
        )
    assert np.isnan(np.asarray(color)).any()


def test_camera_tracer_matches_ray_tracer():
    """make_tape_camera_tracer (in-kernel camera rays from pixel ids,
    round-4 VERDICT item 3) vs the ray-table mega tracer fed host-generated
    rays with the SAME hash camera draws: same seeds, same bounce control
    flow — colors agree to the documented ~1-ulp camera-context tolerance
    (test_mega_render's bound), scene grads allclose."""
    from distributed_raytracer_tpu.grad.tapegrad import make_tape_camera_tracer
    from distributed_raytracer_tpu.ops.pallas.culled_bounce_kernel import (
        _hash_u01,
    )
    from distributed_raytracer_tpu.ops.pallas.mega_render_kernel import _CAM_D0

    scene, _, _ = setup()
    cam = make_camera(
        aspect_ratio=1.0, image_width=16, max_depth=6, vfov=30.0,
        lookfrom=(0.0, 0.5, 2.0), lookat=(0.0, 0.0, -1.5),
        vup=(0.0, 1.0, 0.0), defocus_angle=1.0, focus_dist=3.0,
    )
    ids = jnp.arange(cam.num_pixels, dtype=jnp.int32)
    key = jax.random.PRNGKey(13)

    cam_tracer = make_tape_camera_tracer(key, cam, pool=128, block_rays=128)
    ray_tracer = make_tape_tracer(key, cam.max_depth, pool=128,
                                  use_mega=True, mega_bwd=True,
                                  block_rays=128, ray_grads=False)

    # host-side camera rays with the KERNEL's draw keying (rid = ray index)
    cam_seed = jax.random.randint(
        jax.random.fold_in(key, 0xCA3), (), 0, 2**31 - 1, dtype=jnp.int32
    )
    draws = tuple(_hash_u01(ids, cam_seed, _CAM_D0 + dd) for dd in range(4))
    o, d = generate_rays(cam, jax.random.PRNGKey(0), ids % cam.image_width,
                         ids // cam.image_width, draws=draws)

    with pltpu.force_tpu_interpret_mode():
        c_cam = np.asarray(cam_tracer(scene, ids))
        c_ray = np.asarray(ray_tracer(scene, o, d))
    assert np.isfinite(c_cam).all()
    np.testing.assert_allclose(c_cam, c_ray, atol=5e-4)

    with pltpu.force_tpu_interpret_mode():
        g_cam = jax.grad(
            lambda s: jnp.sum(cam_tracer(s, ids) ** 2), allow_int=True
        )(scene)
        g_ray = jax.grad(
            lambda s: jnp.sum(ray_tracer(s, o, d) ** 2), allow_int=True
        )(scene)
    for name in ("centers", "radii", "albedo", "fuzz", "ior"):
        a = np.asarray(getattr(g_cam, name))
        b = np.asarray(getattr(g_ray, name))
        scale = np.abs(b).max() + 1e-8
        np.testing.assert_allclose(a / scale, b / scale, atol=5e-3,
                                   err_msg=name)


def test_camera_tracer_replay_oracle_exact():
    """The camera-mode tape replays EXACTLY through replay_from_tape
    (rays_from_tape=True: take rows use the recorded in-kernel rays), and
    the mega backward's scene grads match jax.grad of that replay — the
    same oracle contract as the ray-table path."""
    from distributed_raytracer_tpu.grad.tapegrad import (
        _forward_tape_camera_raw,
    )

    scene, _, _ = setup()
    cam = make_camera(aspect_ratio=1.0, image_width=16, max_depth=6)
    ids = jnp.arange(cam.num_pixels, dtype=jnp.int32)
    key = jax.random.PRNGKey(21)

    with pltpu.force_tpu_interpret_mode():
        color, tape, n_it, _pos = _forward_tape_camera_raw(
            scene, cam, ids, key, pool=128, block_rays=128
        )
    n_iters = int(n_it)
    dummy = jnp.zeros((ids.shape[0], 3), jnp.float32)
    re_color = np.asarray(
        replay_from_tape(scene, dummy, dummy, tape, n_iters,
                         rays_from_tape=True)
    )
    np.testing.assert_allclose(np.asarray(color), re_color, rtol=1e-5,
                               atol=1e-6)


def test_camera_tracer_variants_bit_identical():
    """Round-5 variant ladder: "unified" (winner params on ONE packed tape
    stream + the walk backward) and "pos" produce BIT-IDENTICAL colors and
    grads to the round-4 "homes" shape (same kernel body, same draws)."""
    from distributed_raytracer_tpu.grad.tapegrad import (
        make_tape_camera_tracer,
    )
    from distributed_raytracer_tpu.models.presets import rtiow_final_scene
    from distributed_raytracer_tpu.ops.camera import make_camera as mkc

    scene = rtiow_final_scene(seed=0, pad_to=512)
    cam = mkc(aspect_ratio=1.0, image_width=16, samples_per_pixel=1,
              max_depth=3)
    key = jax.random.PRNGKey(7)
    r = cam.num_pixels
    ids = jnp.arange(r, dtype=jnp.int32)
    rng = np.random.default_rng(3)
    gc = jnp.asarray(rng.standard_normal((r, 3)), jnp.float32)
    res = {}
    with pltpu.force_tpu_interpret_mode():
        for v in ("homes", "unified", "pos"):
            tr = make_tape_camera_tracer(key, cam, pool=128, block_rays=128,
                                         iota_pix=True, variant=v)
            val, g = jax.value_and_grad(
                lambda p: jnp.sum(tr(scene.replace(**p), ids) * gc)
            )({"albedo": scene.albedo, "centers": scene.centers})
            res[v] = (np.asarray(tr(scene, ids)), float(val),
                      np.asarray(g["albedo"]), np.asarray(g["centers"]))
    for v in ("unified", "pos"):
        assert np.array_equal(res[v][0], res["homes"][0]), v
        assert res[v][1] == res["homes"][1], v
        np.testing.assert_allclose(res[v][2], res["homes"][2],
                                   rtol=1e-5, atol=1e-7)
        np.testing.assert_allclose(res[v][3], res["homes"][3],
                                   rtol=1e-4, atol=1e-4)
