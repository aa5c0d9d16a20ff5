"""Path-replay backward (grad/pathgrad.py) vs autodiff through the same
recording forward — must match to numerical precision."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from distributed_raytracer_tpu.grad.pathgrad import make_pathgrad_tracer
from distributed_raytracer_tpu.models.scene import SceneBuilder
from distributed_raytracer_tpu.ops.camera import generate_rays, make_camera


def setup(width=24, depth=8):
    scene = (
        SceneBuilder()
        .add_lambertian((0, -100.5, -1), 100.0, (0.6, 0.7, 0.2))
        .add_lambertian((0, 0, -1.5), 0.5, (0.7, 0.3, 0.3))
        .add_metal((1.1, 0, -1.5), 0.4, (0.8, 0.8, 0.8), 0.15)
        .add_dielectric((-1.1, 0, -1.5), 0.4, 1.5)
        .build()
    )
    cam = make_camera(aspect_ratio=1.0, image_width=width, max_depth=depth)
    ids = jnp.arange(cam.num_pixels, dtype=jnp.int32)
    o, d = generate_rays(cam, jax.random.PRNGKey(7), ids % width, ids // width)
    return scene, o, d


@pytest.mark.parametrize("pool_divisor", [1, 4])
def test_matches_autodiff_oracle(pool_divisor):
    scene, o, d = setup()
    key = jax.random.PRNGKey(3)
    fast = make_pathgrad_tracer(key, 8, pool_divisor=pool_divisor)
    oracle = make_pathgrad_tracer(key, 8, use_custom_vjp=False)

    # identical primal
    np.testing.assert_array_equal(
        np.asarray(fast(scene, o, d)), np.asarray(oracle(scene, o, d))
    )

    def loss_fast(s, oo, dd):
        return jnp.sum(fast(s, oo, dd) ** 2)

    def loss_oracle(s, oo, dd):
        return jnp.sum(oracle(s, oo, dd) ** 2)

    gf = jax.grad(loss_fast, argnums=(0, 1, 2), allow_int=True)(scene, o, d)
    go = jax.grad(loss_oracle, argnums=(0, 1, 2), allow_int=True)(scene, o, d)

    for name in ("centers", "radii", "albedo", "fuzz", "ior"):
        a, b = np.asarray(getattr(gf[0], name)), np.asarray(getattr(go[0], name))
        scale = np.abs(b).max() + 1e-8
        np.testing.assert_allclose(a / scale, b / scale, atol=2e-5, err_msg=name)
    for a, b, name in ((gf[1], go[1], "ray_o"), (gf[2], go[2], "ray_d")):
        scale = np.abs(np.asarray(b)).max() + 1e-8
        np.testing.assert_allclose(
            np.asarray(a) / scale, np.asarray(b) / scale, atol=2e-5, err_msg=name
        )


def test_depth_exhausted_rays_zero_grad():
    # mirror box: all rays exhaust depth -> colors 0, grads 0, no NaNs
    scene = (
        SceneBuilder()
        .add_metal((0, 0, -1002), 1000.0, (0.9, 0.9, 0.9), 0.0)
        .add_metal((0, 0, 1002), 1000.0, (0.9, 0.9, 0.9), 0.0)
        .build()
    )
    o = jnp.zeros((64, 3), jnp.float32)
    d = jnp.tile(jnp.asarray([[0.0, 0.0, -1.0]], jnp.float32), (64, 1))
    f = make_pathgrad_tracer(jax.random.PRNGKey(0), 4)
    g = jax.grad(lambda s: jnp.sum(f(s, o, d)), allow_int=True)(scene)
    for name in ("centers", "radii", "albedo"):
        arr = np.asarray(getattr(g, name))
        assert np.all(np.isfinite(arr))
        np.testing.assert_array_equal(arr, 0.0)


def test_wavefront_primal_bit_identical_and_grads_match():
    scene, o, d = setup(width=20, depth=10)
    key = jax.random.PRNGKey(9)
    scan_t = make_pathgrad_tracer(key, 10, primal="scan")
    wf_t = make_pathgrad_tracer(key, 10, primal="wavefront", primal_pool=128)

    # schedule-independent draws -> bit-identical colors
    np.testing.assert_array_equal(
        np.asarray(scan_t(scene, o, d)), np.asarray(wf_t(scene, o, d))
    )

    g1 = jax.grad(
        lambda s: jnp.sum(scan_t(s, o, d) ** 2), allow_int=True
    )(scene)
    g2 = jax.grad(
        lambda s: jnp.sum(wf_t(s, o, d) ** 2), allow_int=True
    )(scene)
    for name in ("centers", "radii", "albedo", "fuzz", "ior"):
        np.testing.assert_allclose(
            np.asarray(getattr(g1, name)),
            np.asarray(getattr(g2, name)),
            rtol=1e-5,
            atol=1e-6,
            err_msg=name,
        )


def test_fused_primal_fd_albedo():
    # fused-kernel primal (interpret mode: constant PRNG draws — still a
    # fixed-noise estimator, so FD against the same function is valid)
    from jax.experimental.pallas import tpu as pltpu

    scene = (
        SceneBuilder()
        .add_lambertian((0, -100.5, -1), 100.0, (0.6, 0.7, 0.2))
        .add_lambertian((0, 0, -1.5), 0.5, (0.7, 0.3, 0.3))
        .build()
    )
    cam = make_camera(aspect_ratio=1.0, image_width=12, max_depth=4)
    ids = jnp.arange(cam.num_pixels, dtype=jnp.int32)
    o, d = generate_rays(cam, jax.random.PRNGKey(7), ids % 12, ids // 12)
    f = make_pathgrad_tracer(jax.random.PRNGKey(2), 4, primal="fused")

    def loss(v):
        s = scene.replace(albedo=scene.albedo.at[1, 0].set(v))
        with pltpu.force_tpu_interpret_mode():
            return jnp.sum(f(s, o, d) ** 2)

    with pltpu.force_tpu_interpret_mode():
        g = jax.grad(lambda v: loss(v))(jnp.float32(0.7))
    eps = 1e-2
    fd = (float(loss(0.7 + eps)) - float(loss(0.7 - eps))) / (2 * eps)
    np.testing.assert_allclose(float(g), fd, rtol=0.08, atol=1e-5)


def test_image_grad_fn_albedo_fd():
    from distributed_raytracer_tpu.grad.pathgrad import make_image_grad_fn

    scene = (
        SceneBuilder()
        .add_lambertian((0, -100.5, -1), 100.0, (0.6, 0.7, 0.2))
        .add_lambertian((0, 0, -1.5), 0.5, (0.7, 0.3, 0.3))
        .build()
    )
    cam = make_camera(aspect_ratio=1.0, image_width=16, max_depth=6)
    grad_fn = make_image_grad_fn(cam, seed=4)
    target = jnp.zeros((cam.num_pixels, 3))
    s = [0, 1]
    loss, grads = grad_fn(scene, target, s)
    assert np.isfinite(float(loss)) and float(loss) > 0
    an = float(grads["albedo"][1, 0])
    assert np.isfinite(an) and an != 0

    def f(v):
        s2 = scene.replace(albedo=scene.albedo.at[1, 0].set(v))
        l2, _ = grad_fn(s2, target, s)
        return float(l2)

    eps = 1e-2
    fd = (f(0.7 + eps) - f(0.7 - eps)) / (2 * eps)
    np.testing.assert_allclose(an, fd, rtol=0.1, atol=1e-5)


def test_jit_wrapped():
    scene, o, d = setup(width=16, depth=6)
    key = jax.random.PRNGKey(1)
    f = make_pathgrad_tracer(key, 6)

    @jax.jit
    def vg(s, oo, dd):
        return jax.value_and_grad(lambda s_: jnp.mean(f(s_, oo, dd)), allow_int=True)(s)

    loss, g = vg(scene, o, d)
    assert np.isfinite(float(loss))
    assert np.all(np.isfinite(np.asarray(g.centers)))
    assert np.any(np.asarray(g.albedo) != 0)
