"""Hardware-only assertions (`pytest -m tpu` via scripts/run_tpu_tests.sh).

These collect the checks that CANNOT run in CI: pltpu.prng_random_bits
returns zeros in interpret mode on CPU (CLAUDE.md), so the fused kernel's
RNG-dependent behavior — draw statistics, estimator parity against the
threefry renderers, tape-tracer gradients with real noise — is only
testable on the chip.  One compiled program each; keep shapes small.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from distributed_raytracer_tpu.models.scene import SceneBuilder
from distributed_raytracer_tpu.ops.camera import generate_rays, make_camera

pytestmark = pytest.mark.tpu

requires_tpu = pytest.mark.skipif(
    jax.devices()[0].platform == "cpu", reason="needs real TPU"
)


def three_sphere_scene():
    return (
        SceneBuilder()
        .add_lambertian((0, -100.5, -1), 100.0, (0.8, 0.8, 0.0))
        .add_lambertian((0, 0, -1.2), 0.5, (0.1, 0.2, 0.5))
        .add_metal((1, 0, -1), 0.5, (0.8, 0.6, 0.2), 0.2)
        .add_dielectric((-1, 0, -1), 0.5, 1.5)
        .build()
    )


@requires_tpu
def test_fused_kernel_draws_are_uniform():
    """The on-core PRNG's uniform draws must look uniform (mean ~0.5,
    std ~0.289) and the unit-vector draws unit-length and isotropic."""
    from distributed_raytracer_tpu.ops.pallas.bounce_kernel import fused_bounce

    scene = three_sphere_scene()
    r = 4096
    o = jnp.zeros((r, 3), jnp.float32)
    d = jnp.tile(jnp.asarray([[0.0, 0.0, -1.0]], jnp.float32), (r, 1))
    res = jax.block_until_ready(
        fused_bounce(o, d, jnp.ones((r,), bool), scene, jnp.int32(1234))
    )
    u = np.asarray(res.u)
    assert abs(u.mean() - 0.5) < 0.02, u.mean()
    assert abs(u.std() - 0.2887) < 0.02, u.std()
    ruv = np.asarray(res.ruv)
    np.testing.assert_allclose(np.linalg.norm(ruv, axis=-1), 1.0, atol=1e-3)
    assert np.abs(ruv.mean(0)).max() < 0.05  # isotropic


@requires_tpu
def test_fused_estimator_matches_threefry_renderer():
    """Fused-kernel wavefront image vs the threefry wavefront image: same
    integral, independent noise — means agree at the MC-noise level."""
    from distributed_raytracer_tpu.render.wavefront import (
        render_image_wavefront,
        render_wavefront_sum_fused,
    )

    scene = three_sphere_scene()
    cam = make_camera(aspect_ratio=2.0, image_width=96, samples_per_pixel=64, max_depth=8)
    img_ref = render_image_wavefront(
        scene, cam, seed=0, spp=64, use_pallas=True, pool_size=65536
    )
    f = jax.jit(lambda s, k: render_wavefront_sum_fused(s, cam, k, 64, 65536))
    img_fus = np.asarray(jax.block_until_ready(f(scene, jax.random.PRNGKey(3)))) / 64
    img_fus = img_fus.reshape(cam.image_height, cam.image_width, 3)
    diff = np.abs(img_fus - img_ref).mean()
    assert diff < 0.02, diff


@requires_tpu
def test_tape_tracer_grads_on_hardware():
    """Fused-forward tape tracer with REAL kernel RNG: gradients finite,
    nonzero, and FD-consistent for an edge-free albedo perturbation."""
    from distributed_raytracer_tpu.grad.tapegrad import make_tape_tracer

    scene = (
        SceneBuilder()
        .add_lambertian((0, -100.5, -1), 100.0, (0.6, 0.7, 0.2))
        .add_lambertian((0, 0, -1.5), 0.5, (0.7, 0.3, 0.3))
        .build()
    )
    cam = make_camera(aspect_ratio=1.0, image_width=32, max_depth=6)
    ids = jnp.arange(cam.num_pixels, dtype=jnp.int32)
    o, d = generate_rays(cam, jax.random.PRNGKey(7), ids % 32, ids // 32)
    f = make_tape_tracer(jax.random.PRNGKey(2), 6, pool=512, use_fused=True,
                         segsum="matmul")

    @jax.jit
    def loss(v):
        s = scene.replace(albedo=scene.albedo.at[1, 0].set(v))
        return jnp.sum(f(s, o, d) ** 2)

    g = float(jax.grad(loss)(jnp.float32(0.7)))
    eps = 1e-2
    fd = (float(loss(jnp.float32(0.7 + eps))) - float(loss(jnp.float32(0.7 - eps)))) / (2 * eps)
    assert np.isfinite(g) and g != 0
    np.testing.assert_allclose(g, fd, rtol=0.08, atol=1e-5)


@requires_tpu
def test_culled_matches_dense_on_hardware():
    from distributed_raytracer_tpu.models.presets import random_sphere_field
    from distributed_raytracer_tpu.ops.pallas.culled_kernel import (
        build_culled_scene,
        make_culled_intersect,
    )
    from distributed_raytracer_tpu.ops.pallas.intersect_kernel import closest_hit_pallas

    scene = random_sphere_field(2000, seed=2)
    culled = build_culled_scene(scene, chunk=128)
    rng = np.random.default_rng(1)
    o = jnp.asarray(rng.uniform(-40, 40, (1024, 3)), jnp.float32)
    d = jnp.asarray(rng.normal(size=(1024, 3)), jnp.float32)
    fn = make_culled_intersect(culled)
    got = jax.block_until_ready(jax.jit(fn)(o, d, culled.scene))
    ref = jax.block_until_ready(
        jax.jit(lambda o, d: closest_hit_pallas(o, d, culled.scene))(o, d)
    )
    h = np.asarray(ref.hit)
    np.testing.assert_array_equal(np.asarray(got.hit), h)
    np.testing.assert_array_equal(np.asarray(got.idx)[h], np.asarray(ref.idx)[h])


@requires_tpu
def test_winner_idx_exact_512_spheres():
    """Pins the excess-precision plane-split bug: with 512 spheres on a
    line and ray i aimed at sphere i, the fused kernel must return idx == i
    for ALL i — the broken split (astype round-trips elided under
    --xla_allow_excess_precision=true) zeroed the mid/lo bf16 planes and
    rounded every odd index >= 257 to even."""
    import numpy as np

    from distributed_raytracer_tpu.ops.pallas.bounce_kernel import fused_bounce

    sb = SceneBuilder()
    for i in range(512):
        sb.add_lambertian((3.0 * i, 0.0, -5.0), 0.5, (0.5, 0.5, 0.5))
    scene = sb.build()
    n = 512
    o = jnp.stack([jnp.arange(n, dtype=jnp.float32) * 3.0,
                   jnp.zeros(n), jnp.full((n,), 5.0)], axis=-1)
    d = jnp.tile(jnp.asarray([[0.0, 0.0, -1.0]], jnp.float32), (n, 1))
    for chunk in (128, 512):
        out = fused_bounce(o, d, jnp.ones((n,), bool), scene, jnp.int32(7),
                           chunk=chunk)
        idx = np.asarray(out.idx)
        assert np.asarray(out.hit).all(), f"chunk={chunk}: missing hits"
        bad = np.where(idx != np.arange(n))[0]
        assert len(bad) == 0, (
            f"chunk={chunk}: {len(bad)} wrong winner indices, "
            f"first: {[(int(b), int(idx[b])) for b in bad[:8]]}"
        )
