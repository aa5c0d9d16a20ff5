"""Camera-POSE gradients on the production tape path (VERDICT r4 item 9).

make_tape_camera_pose_tracer differentiates f(scene, cam_row): the walk
backward's dense primary-ray cotangent rows are gathered at each ray's
refill position and pushed through camera_rays_host — the bit-exact host
mirror of the kernel's in-kernel ray generation — then XLA chains to pose
parameters (lookfrom/vfov/...) through the traceable camera.derive.

FD checks use COMMON RANDOM NUMBERS (the tracer's draws are keyed by
(pixel, seed) hashes, independent of the camera), so pathwise FD is
well-defined; the configs keep silhouettes soft (low depth, big spheres)
to keep discrete-branch flips negligible at the FD step size.
"""

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental.pallas import tpu as pltpu

from distributed_raytracer_tpu.grad.tapegrad import (
    make_tape_camera_pose_tracer,
    make_tape_camera_tracer,
)
from distributed_raytracer_tpu.models.scene import SceneBuilder
from distributed_raytracer_tpu.ops.camera import derive, make_camera
from distributed_raytracer_tpu.ops.pallas.mega_render_kernel import (
    camera_scalar_row,
)


def _scene():
    return (
        SceneBuilder()
        .add_lambertian((0, -100.5, -1), 100.0, (0.6, 0.7, 0.2))
        .add_lambertian((0, 0, -1.5), 0.6, (0.7, 0.3, 0.3))
        .add_metal((1.2, 0, -1.5), 0.5, (0.8, 0.6, 0.2), 0.1)
        .build()
    )


CAM_KW = dict(
    aspect_ratio=1.0, image_width=24, samples_per_pixel=1, max_depth=4,
    vfov=55.0, lookfrom=(0.0, 0.4, 1.5), lookat=(0.0, 0.0, -1.5),
    vup=(0.0, 1.0, 0.0), defocus_angle=0.8, focus_dist=3.0,
)


def test_pose_tracer_forward_matches_camera_tracer():
    """Same kernel, same seeds: the pose tracer's colors are bit-identical
    to the scene-only camera tracer's."""
    scene = _scene()
    cam = make_camera(**CAM_KW)
    key = jax.random.PRNGKey(11)
    ids = jnp.arange(cam.num_pixels, dtype=jnp.int32)
    with pltpu.force_tpu_interpret_mode():
        base = make_tape_camera_tracer(key, cam, pool=128, block_rays=128,
                                       iota_pix=True)
        c0 = base(scene, ids)
        pose = make_tape_camera_pose_tracer(key, cam, pool=128,
                                            block_rays=128)
        c1 = pose(scene, camera_scalar_row(cam))
    assert np.array_equal(np.asarray(c0), np.asarray(c1))


def test_pose_tracer_cam_row_grads_match_oracle():
    """d(loss)/d(cam_row) matches the replay oracle chained through the
    host camera-ray mirror — the strong pathwise check (FD on arbitrary
    scenes is polluted by visibility-edge terms that pathwise gradients
    exclude by construction, DESIGN §4 estimator limits)."""
    from distributed_raytracer_tpu.grad.tapegrad import (
        _forward_tape_camera_raw,
        _Tape,
        replay_from_tape,
    )
    from distributed_raytracer_tpu.ops.pallas.mega_render_kernel import (
        camera_rays_host,
    )

    scene = _scene()
    cam = make_camera(**CAM_KW)
    key = jax.random.PRNGKey(11)
    cam_row = camera_scalar_row(cam)
    r = cam.num_pixels
    rng = np.random.default_rng(2)
    gw = jnp.asarray(rng.standard_normal((r, 3)), jnp.float32)

    with pltpu.force_tpu_interpret_mode():
        pose = make_tape_camera_pose_tracer(key, cam, pool=128,
                                            block_rays=128)
        g = np.asarray(jax.grad(
            lambda cr: jnp.sum(pose(scene, cr) * gw)
        )(cam_row))

        # oracle: the same recorded run replayed with rays re-read from
        # differentiable inputs, chained through the same host mirror
        _, tape, n_it, _ = _forward_tape_camera_raw(
            scene, cam, jnp.arange(r, dtype=jnp.int32), key, 128, None,
            128, 2, iota_pix=True,
        )
    cam_seed = jax.random.randint(
        jax.random.fold_in(key, 0xCA3), (), 0, 2**31 - 1, dtype=jnp.int32
    )
    pix = jnp.arange(r, dtype=jnp.int32)

    def oracle_loss(cr):
        o, d = camera_rays_host(cr, pix, pix, cam_seed, cam.image_width)
        cols = replay_from_tape(scene, o, d, tape, int(n_it),
                                rays_from_tape=False)
        return jnp.sum(cols * gw)

    want = np.asarray(jax.grad(oracle_loss)(cam_row))
    rel = np.abs(g - want).max() / (np.abs(want).max() + 1e-30)
    assert rel < 5e-4, rel
    assert np.abs(want).max() > 1.0  # non-trivial gradients


def test_pose_tracer_fd_edge_free():
    """FD-allclose on an EDGE-FREE configuration (one giant sphere fills
    the whole viewport — no silhouette inside the frame, so the pathwise
    gradient IS the total derivative)."""
    scene = (
        SceneBuilder()
        .add_lambertian((0, 0, -52.0), 50.0, (0.6, 0.4, 0.3))
        .build()
    )
    cam = make_camera(
        aspect_ratio=1.0, image_width=16, samples_per_pixel=1, max_depth=3,
        vfov=40.0, lookfrom=(0.0, 0.0, 1.0), lookat=(0.0, 0.0, -1.0),
        vup=(0.0, 1.0, 0.0), defocus_angle=0.0, focus_dist=3.0,
    )
    key = jax.random.PRNGKey(4)
    cam_row = camera_scalar_row(cam)
    rng = np.random.default_rng(5)
    gw = jnp.asarray(rng.standard_normal((cam.num_pixels, 3)), jnp.float32)

    with pltpu.force_tpu_interpret_mode():
        pose = make_tape_camera_pose_tracer(key, cam, pool=128,
                                            block_rays=128)

        def loss(cr):
            return jnp.sum(pose(scene, cr) * gw)

        g = np.asarray(jax.grad(loss)(cam_row))[0]
        for k in (0, 2, 3, 6):  # center.x/.z, pixel00.x, pixel_delta_u.x
            eps = 1e-3
            e = jnp.zeros_like(cam_row).at[0, k].set(eps)
            fd = (float(loss(cam_row + e)) - float(loss(cam_row - e))) / (
                2 * eps
            )
            assert np.isfinite(g[k])
            np.testing.assert_allclose(g[k], fd, rtol=0.08, atol=0.05)


def test_pose_grads_chain_to_lookfrom():
    """End to end through the traceable camera.derive: d(loss)/d(lookfrom)
    is finite, nonzero, and FD-consistent — the reference's camera state
    (camera.rs:238-262) as a first-class gradient target."""
    scene = _scene()
    cam = make_camera(**CAM_KW)
    key = jax.random.PRNGKey(11)
    rng = np.random.default_rng(3)
    gw = jnp.asarray(rng.standard_normal((cam.num_pixels, 3)), jnp.float32)

    with pltpu.force_tpu_interpret_mode():
        pose = make_tape_camera_pose_tracer(key, cam, pool=128,
                                            block_rays=128)

        def loss_of_lookfrom(lf):
            d = derive(cam.image_width, cam.image_height, CAM_KW["vfov"],
                       lf, CAM_KW["lookat"], CAM_KW["vup"],
                       CAM_KW["defocus_angle"], CAM_KW["focus_dist"])
            traced_cam = cam.replace(**d)
            return jnp.sum(pose(scene, camera_scalar_row(traced_cam)) * gw)

        lf0 = jnp.asarray(CAM_KW["lookfrom"], jnp.float32)
        g = np.asarray(jax.grad(loss_of_lookfrom)(lf0))
        assert np.isfinite(g).all() and np.abs(g).sum() > 0
        eps = 2e-3
        e = jnp.zeros(3).at[2].set(eps)
        fd = (float(loss_of_lookfrom(lf0 + e))
              - float(loss_of_lookfrom(lf0 - e))) / (2 * eps)
        np.testing.assert_allclose(g[2], fd, rtol=0.08, atol=0.3)
