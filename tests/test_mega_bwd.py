"""Mega-backward kernel (ops/pallas/mega_bwd_kernel.py).

The whole reverse tape walk as one Pallas program.  Checked in interpret
mode against (a) jax.grad of the pure-JAX replay oracle on the SAME tape
(replay_from_tape — the ground truth the XLA backward is also held to)
and (b) the XLA `_backward_tape` itself.  Interpret-mode forward draws
are zeros (pltpu.prng_random_bits), which only fixes the noise — the
tape, winners and all gradient paths are fully exercised.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental.pallas import tpu as pltpu

from distributed_raytracer_tpu.grad.tapegrad import (
    _backward_tape,
    _forward_tape_mega,
    _local_f,
    _Tape,
    make_tape_tracer,
    replay_from_tape,
)
from distributed_raytracer_tpu.models.presets import rtiow_final_scene
from distributed_raytracer_tpu.models.scene import SceneBuilder
from distributed_raytracer_tpu.ops.camera import generate_rays, make_camera


def _scene_cam():
    scene = (
        SceneBuilder()
        .add_lambertian((0, -100.5, -1), 100.0, (0.6, 0.7, 0.2))
        .add_lambertian((0, 0, -1.5), 0.5, (0.7, 0.3, 0.3))
        .add_metal((1.1, 0, -1.4), 0.4, (0.8, 0.6, 0.2), 0.15)
        .add_dielectric((-1.1, 0, -1.4), 0.4, 1.5)
        .build()
    )
    cam = make_camera(aspect_ratio=1.0, image_width=16, max_depth=6)
    return scene, cam


@pytest.fixture(scope="module")
def setup():
    scene, cam = _scene_cam()
    ids = jnp.arange(cam.num_pixels, dtype=jnp.int32)
    o, d = generate_rays(cam, jax.random.PRNGKey(7), ids % 16, ids // 16)
    key = jax.random.PRNGKey(2)
    with pltpu.force_tpu_interpret_mode():
        color, tape, n_it, pos = _forward_tape_mega(
            scene, o, d, key, cam.max_depth, 128
        )
        jax.block_until_ready(tape)
    return scene, cam, o, d, key, color, tape, int(n_it), pos


def _mega_bwd_grads(scene, o, d, tape, n_it, g_color, pool=128):
    """Drive the kernel directly from a packed tape (planes rebuilt)."""
    from distributed_raytracer_tpu.ops.pallas.bounce_kernel import _auto_chunk
    from distributed_raytracer_tpu.ops.pallas.mega_bwd_kernel import (
        mega_backward,
    )
    from distributed_raytracer_tpu.ops.pallas.mega_kernel import (
        scene_sweep_arrays,
    )

    tape_f = tape.fdata.transpose(0, 2, 1)  # [T, 16, B] packed sublanes
    ti3 = tape.idata.transpose(0, 2, 1)     # [T, 3, B]
    tape_i = jnp.pad(ti3, ((0, 0), (0, 5), (0, 0)))  # pad sublanes to 8
    _, attrs = scene_sweep_arrays(scene, _auto_chunk(scene.num_spheres))
    with pltpu.force_tpu_interpret_mode():
        g_pm, dd_rows = mega_backward(
            tape_f, tape_i, jnp.asarray(n_it, jnp.int32), g_color, attrs,
            n=scene.num_spheres,
        )
    return jax.block_until_ready((g_pm, dd_rows))


def test_scene_grads_match_replay_oracle(setup):
    scene, cam, o, d, key, color, tape, n_it, pos = setup
    r = o.shape[0]
    g_color = jnp.asarray(
        np.random.default_rng(3).normal(size=(r, 3)), jnp.float32
    )
    g_pm, _ = _mega_bwd_grads(scene, o, d, tape, n_it, g_color)

    def replay_loss(s):
        out = replay_from_tape(s, o, d, tape, n_it)
        return jnp.sum(out * g_color)

    g_ref = jax.grad(replay_loss, allow_int=True)(scene)
    ref = np.concatenate(
        [
            np.asarray(g_ref.centers),
            np.asarray(g_ref.radii)[:, None],
            np.asarray(g_ref.albedo),
            np.asarray(g_ref.fuzz)[:, None],
            np.asarray(g_ref.ior)[:, None],
        ],
        axis=-1,
    )
    got = np.asarray(g_pm[: scene.num_spheres])
    scale = np.abs(ref).max() + 1e-8
    np.testing.assert_allclose(got / scale, ref / scale, atol=1e-4)


def test_matches_xla_backward(setup):
    scene, cam, o, d, key, color, tape, n_it, pos = setup
    r = o.shape[0]
    g_color = jnp.ones((r, 3), jnp.float32)
    g_pm, dd_rows = _mega_bwd_grads(scene, o, d, tape, n_it, g_color)
    d_scene, g_o, g_d = _backward_tape(
        scene, tape, jnp.asarray(n_it, jnp.int32), pos, g_color,
        segsum="scatter",
    )
    ref = np.concatenate(
        [
            np.asarray(d_scene.centers),
            np.asarray(d_scene.radii)[:, None],
            np.asarray(d_scene.albedo),
            np.asarray(d_scene.fuzz)[:, None],
            np.asarray(d_scene.ior)[:, None],
        ],
        axis=-1,
    )
    got = np.asarray(g_pm[: scene.num_spheres])
    scale = np.abs(ref).max() + 1e-8
    np.testing.assert_allclose(got / scale, ref / scale, atol=1e-4)


def test_end_to_end_tracer_matches_xla_path(setup):
    """make_tape_tracer(mega_bwd=True) vs the XLA-backward mega tracer:
    same colors (identical forward), grads equal to accumulation order."""
    scene, cam, o, d, key, *_ = setup

    f_xla = make_tape_tracer(key, cam.max_depth, pool=128, use_mega=True,
                             segsum="scatter")
    f_meg = make_tape_tracer(key, cam.max_depth, pool=128, use_mega=True,
                             mega_bwd=True)
    with pltpu.force_tpu_interpret_mode():
        c_x = f_xla(scene, o, d)
        c_m = f_meg(scene, o, d)
        np.testing.assert_array_equal(np.asarray(c_x), np.asarray(c_m))

        loss_x = lambda s: jnp.sum(f_xla(s, o, d) ** 2)
        loss_m = lambda s: jnp.sum(f_meg(s, o, d) ** 2)
        g_x = jax.grad(loss_x, allow_int=True)(scene)
        g_m = jax.grad(loss_m, allow_int=True)(scene)
    for name in ("centers", "radii", "albedo", "fuzz", "ior"):
        a = np.asarray(getattr(g_m, name))
        b = np.asarray(getattr(g_x, name))
        scale = np.abs(b).max() + 1e-8
        np.testing.assert_allclose(a / scale, b / scale, atol=1e-4,
                                   err_msg=name)


def test_ray_grads_via_refill_positions(setup):
    """d_o/d_d gathered at the forward's recorded refill positions match
    the XLA backward's scatter-assembled primary cotangents."""
    scene, cam, o, d, key, *_ = setup

    f_xla = make_tape_tracer(key, cam.max_depth, pool=128, use_mega=True,
                             segsum="scatter")
    f_meg = make_tape_tracer(key, cam.max_depth, pool=128, use_mega=True,
                             mega_bwd=True)
    with pltpu.force_tpu_interpret_mode():
        g_d_x = jax.grad(lambda dd: jnp.sum(f_xla(scene, o, dd) ** 2))(d)
        g_d_m = jax.grad(lambda dd: jnp.sum(f_meg(scene, o, dd) ** 2))(d)
        g_o_x = jax.grad(lambda oo: jnp.sum(f_xla(scene, oo, d) ** 2))(o)
        g_o_m = jax.grad(lambda oo: jnp.sum(f_meg(scene, oo, d) ** 2))(o)
    scale = np.abs(np.asarray(g_d_x)).max() + 1e-8
    np.testing.assert_allclose(
        np.asarray(g_d_m) / scale, np.asarray(g_d_x) / scale, atol=1e-4
    )
    scale = np.abs(np.asarray(g_o_x)).max() + 1e-8
    np.testing.assert_allclose(
        np.asarray(g_o_m) / scale, np.asarray(g_o_x) / scale, atol=1e-4
    )


def test_local_f_rows_matches_local_f():
    """The rows-native VJP body is a faithful mirror of _local_f: forward
    outputs agree bitwise on random inputs across all material codes."""
    from distributed_raytracer_tpu.ops.pallas.mega_bwd_kernel import (
        _local_f_rows,
    )

    rng = np.random.default_rng(0)
    b = 256
    o = jnp.asarray(rng.normal(size=(b, 3)), jnp.float32)
    d = jnp.asarray(rng.normal(size=(b, 3)), jnp.float32)
    at = jnp.asarray(rng.uniform(0.2, 1.0, (b, 3)), jnp.float32)
    cw = o + jnp.asarray(rng.normal(size=(b, 3)), jnp.float32) * 2.0
    rw = jnp.asarray(rng.uniform(0.3, 2.0, (b,)), jnp.float32)
    aw = jnp.asarray(rng.uniform(0, 1, (b, 3)), jnp.float32)
    fw = jnp.asarray(rng.uniform(0, 0.5, (b,)), jnp.float32)
    iw = jnp.asarray(rng.uniform(1.1, 2.0, (b,)), jnp.float32)
    mat = jnp.asarray(rng.integers(0, 5, (b,)), jnp.int32)
    ruv = jnp.asarray(rng.normal(size=(b, 3)), jnp.float32)
    ruv = ruv / jnp.linalg.norm(ruv, axis=-1, keepdims=True)
    u = jnp.asarray(rng.uniform(0, 1, (b,)), jnp.float32)
    hit = jnp.asarray(rng.integers(0, 2, (b,)), bool)
    act = jnp.asarray(rng.integers(0, 2, (b,)), bool) | hit

    o2, d2, at2, c2 = _local_f(
        o, d, at, jnp.zeros((b, 3), jnp.float32),
        cw, rw, aw, fw, iw, mat, ruv, u, hit, act,
    )
    row = lambda x: x.reshape(1, b)
    rows = _local_f_rows(
        row(o[:, 0]), row(o[:, 1]), row(o[:, 2]),
        row(d[:, 0]), row(d[:, 1]), row(d[:, 2]),
        row(at[:, 0]), row(at[:, 1]), row(at[:, 2]),
        row(cw[:, 0]), row(cw[:, 1]), row(cw[:, 2]), row(rw),
        row(aw[:, 0]), row(aw[:, 1]), row(aw[:, 2]), row(fw), row(iw),
        row(mat.astype(jnp.float32)),
        row(ruv[:, 0]), row(ruv[:, 1]), row(ruv[:, 2]), row(u),
        row(hit)[0:1] > 0, row(act)[0:1] > 0,
    )
    want = [o2[:, 0], o2[:, 1], o2[:, 2], d2[:, 0], d2[:, 1], d2[:, 2],
            at2[:, 0], at2[:, 1], at2[:, 2], c2[:, 0], c2[:, 1], c2[:, 2]]
    for k, (got, ref) in enumerate(zip(rows, want)):
        np.testing.assert_allclose(
            np.asarray(got)[0], np.asarray(ref), atol=1e-6,
            err_msg=f"row {k}",
        )
