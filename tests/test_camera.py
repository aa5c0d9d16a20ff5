"""Camera derivation parity vs f64 hand-computation of camera.rs:169-206,
and batched ray-generation properties (camera.rs:238-262)."""

import jax
import jax.numpy as jnp
import numpy as np

from distributed_raytracer_tpu.models.presets import final_scene_camera
from distributed_raytracer_tpu.ops.camera import generate_rays, make_camera, reinitialize


def ref_derive_f64(width, height, vfov, lookfrom, lookat, vup, defocus_angle, focus_dist):
    lookfrom, lookat, vup = map(np.asarray, (lookfrom, lookat, vup))
    center = lookfrom.astype(np.float64)
    theta = np.deg2rad(vfov)
    h = np.tan(theta / 2)
    vh = 2 * h * focus_dist
    vw = vh * (width / height)
    w = (lookfrom - lookat) / np.linalg.norm(lookfrom - lookat)
    u = np.cross(vup, w)
    u = u / np.linalg.norm(u)
    v = np.cross(w, u)
    viewport_u = vw * u
    viewport_v = vh * -v
    pdu = viewport_u / width
    pdv = viewport_v / height
    upper_left = center - focus_dist * w - viewport_u / 2 - viewport_v / 2
    p00 = upper_left + 0.5 * (pdu + pdv)
    dr = focus_dist * np.tan(np.deg2rad(defocus_angle / 2))
    return dict(
        center=center, u=u, v=v, w=w, pixel00_loc=p00,
        pixel_delta_u=pdu, pixel_delta_v=pdv,
        defocus_disk_u=u * dr, defocus_disk_v=v * dr,
    )


def test_final_scene_camera_geometry():
    cam = final_scene_camera()
    assert cam.image_width == 1200 and cam.image_height == 675  # main.rs:56, 16:9
    ref = ref_derive_f64(
        1200, 675, 20.0, (13.0, 2.0, 3.0), (0.0, 0.0, 0.0), (0.0, 1.0, 0.0), 0.6, 10.0
    )
    for k, v in ref.items():
        np.testing.assert_allclose(
            np.asarray(getattr(cam, k)), v, rtol=1e-5, atol=1e-6, err_msg=k
        )


def test_default_camera_matches_reference_defaults():
    cam = make_camera()  # Camera::new defaults, camera.rs:147-163
    assert cam.image_width == 100 and cam.image_height == 100
    assert cam.samples_per_pixel == 10 and cam.max_depth == 10
    assert float(cam.vfov) == 90.0
    np.testing.assert_allclose(np.asarray(cam.lookfrom), [0, 0, 0])


def test_height_at_least_one():
    cam = make_camera(aspect_ratio=1000.0, image_width=10)
    assert cam.image_height == 1  # camera.rs:175-176 clamp


def test_rays_land_in_pixel_square():
    cam = make_camera(image_width=16, aspect_ratio=1.0)
    key = jax.random.PRNGKey(0)
    pi = jnp.full((512,), 5, jnp.int32)
    pj = jnp.full((512,), 7, jnp.int32)
    o, d = generate_rays(cam, key, pi, pj)
    # no defocus: origin == center exactly
    np.testing.assert_array_equal(np.asarray(o), np.tile(np.asarray(cam.center), (512, 1)))
    # target points lie within the pixel square around pixel00 + 5*du + 7*dv
    target = np.asarray(o) + np.asarray(d)
    exp = (
        np.asarray(cam.pixel00_loc)
        + 5 * np.asarray(cam.pixel_delta_u)
        + 7 * np.asarray(cam.pixel_delta_v)
    )
    du = np.linalg.norm(np.asarray(cam.pixel_delta_u))
    dv = np.linalg.norm(np.asarray(cam.pixel_delta_v))
    err = np.abs(target - exp)
    assert np.all(err[:, 0] <= 0.5 * du + 1e-6)
    assert np.all(err[:, 1] <= 0.5 * dv + 1e-6)


def test_defocus_origins_on_disk():
    cam = make_camera(image_width=16, defocus_angle=2.0, focus_dist=5.0)
    key = jax.random.PRNGKey(1)
    pi = jnp.zeros((1024,), jnp.int32)
    pj = jnp.zeros((1024,), jnp.int32)
    o, _ = generate_rays(cam, key, pi, pj)
    r = np.linalg.norm(np.asarray(o) - np.asarray(cam.center), axis=-1)
    defocus_radius = 5.0 * np.tan(np.deg2rad(1.0))
    assert np.all(r <= defocus_radius + 1e-5)
    assert r.max() > 0.5 * defocus_radius  # actually spread over the disk


def test_reinitialize_after_pose_change():
    cam = make_camera(image_width=32)
    moved = cam.replace(lookfrom=jnp.asarray([0.0, 0.0, 5.0], jnp.float32))
    moved = reinitialize(moved)
    np.testing.assert_allclose(np.asarray(moved.center), [0, 0, 5])
    # w should now point from lookat to new lookfrom
    np.testing.assert_allclose(np.asarray(moved.w), [0, 0, 1], atol=1e-6)


def test_camera_pose_is_differentiable():
    cam = make_camera(image_width=8)

    def f(lookfrom):
        c = reinitialize(cam.replace(lookfrom=lookfrom))
        o, d = generate_rays(
            c, jax.random.PRNGKey(0), jnp.zeros((4,), jnp.int32), jnp.zeros((4,), jnp.int32)
        )
        return jnp.sum(d)

    g = jax.grad(f)(jnp.asarray([0.0, 0.0, 2.0], jnp.float32))
    assert np.all(np.isfinite(np.asarray(g)))
    assert np.any(np.asarray(g) != 0)
