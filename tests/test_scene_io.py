"""Scene serialization (models/scene_io.py): the reference's
arbitrary-scene ingestion (AddObject over the wire, messages.rs:41-94 /
client.rs:18-50) as a file format.

Covers: JSON and NPZ round-trips (exact), camera round-trip, builder
clamps on load, validation errors, `render --scene` through the engines,
and a golden check on a NON-preset scene against the independent numpy
reference renderer.
"""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from distributed_raytracer_tpu.models import scene_io
from distributed_raytracer_tpu.models.presets import config2, get_config
from distributed_raytracer_tpu.models.scene import (
    ABSORB,
    DIELECTRIC,
    LAMBERTIAN,
    METAL,
    SceneBuilder,
)
from distributed_raytracer_tpu.ops.camera import make_camera


def _assert_scene_equal(a, b):
    for f in ("centers", "radii", "albedo", "mat_type", "fuzz", "ior"):
        np.testing.assert_array_equal(
            np.asarray(getattr(a, f)), np.asarray(getattr(b, f)), err_msg=f
        )


def _custom_scene():
    """A scene no preset produces (authored by hand)."""
    return (
        SceneBuilder()
        .add_lambertian((0.0, -200.5, -1.0), 200.0, (0.7, 0.3, 0.3))
        .add_metal((0.9, 0.0, -1.3), 0.45, (0.9, 0.9, 0.2), 0.15)
        .add_dielectric((-0.9, 0.0, -0.8), 0.45, 1.33)
        .add_transparent((0.0, 0.6, -1.0), 0.2)
        .add_absorbing((0.0, -0.3, -0.6), 0.1)
        .build()
    )


def test_json_roundtrip_exact():
    scene = _custom_scene()
    back, cam = scene_io.scene_from_json(scene_io.scene_to_json(scene))
    assert cam is None
    _assert_scene_equal(scene, back)


def test_json_roundtrip_camera():
    scene, cam = config2()
    s = scene_io.scene_to_json(scene, cam)
    back, cam2 = scene_io.scene_from_json(s)
    _assert_scene_equal(scene, back)
    assert cam2 is not None
    assert (cam2.image_width, cam2.image_height) == (cam.image_width, cam.image_height)
    assert cam2.samples_per_pixel == cam.samples_per_pixel
    assert cam2.max_depth == cam.max_depth
    np.testing.assert_allclose(
        np.asarray(cam2.pixel00_loc), np.asarray(cam.pixel00_loc), rtol=1e-6
    )


def test_npz_roundtrip_exact(tmp_path):
    scene, cam = get_config("config4")
    p = str(tmp_path / "s.npz")
    scene_io.save_scene(p, scene, cam)
    back, cam2 = scene_io.load_scene(p)
    _assert_scene_equal(scene, back)
    assert cam2 is not None and cam2.image_width == cam.image_width


def test_padding_dropped_and_repadded():
    scene = _custom_scene()
    n = scene.num_spheres
    padded = (
        SceneBuilder()
        .add_lambertian((0.0, 0.0, -1.0), 0.5, (0.5, 0.5, 0.5))
        .build(pad_to=128)
    )
    d = scene_io.scene_to_dict(padded)
    assert len(d["spheres"]) == 1  # pad spheres dropped
    back, _ = scene_io.scene_from_dict(d, pad_to=64)
    assert back.num_spheres == 64
    assert int(np.sum(np.asarray(back.radii) > 0)) == 1
    # keep_padding preserves everything verbatim
    d2 = scene_io.scene_to_dict(padded, keep_padding=True)
    assert len(d2["spheres"]) == 128
    del n


def test_load_clamps_like_builder():
    d = {
        "format": scene_io.FORMAT,
        "spheres": [
            {"type": "metal", "center": [0, 0, -1], "radius": -2.0,
             "albedo": [1, 1, 1], "fuzz": 7.5},
        ],
    }
    scene, _ = scene_io.scene_from_dict(d)
    assert float(scene.radii[0]) == 0.0      # sphere.rs:14 clamp
    assert float(scene.fuzz[0]) == 1.0       # material.rs:66 clamp


@pytest.mark.parametrize(
    "bad,msg",
    [
        ({"format": "nope", "spheres": [{}]}, "not a dray-scene-v1"),
        ({"format": scene_io.FORMAT, "spheres": []}, "no spheres"),
        ({"format": scene_io.FORMAT,
          "spheres": [{"type": "plane", "center": [0, 0, 0], "radius": 1}]},
         "unknown type"),
        ({"format": scene_io.FORMAT,
          "spheres": [{"type": "metal", "center": [0, 0, 0]}]},
         "missing required"),
        ({"format": scene_io.FORMAT,
          "spheres": [{"type": "metal", "center": [0, 0], "radius": 1}]},
         "3 components"),
    ],
)
def test_validation_errors(bad, msg):
    with pytest.raises(ValueError, match=msg):
        scene_io.scene_from_dict(bad)


def test_unknown_camera_field_rejected():
    with pytest.raises(ValueError, match="unknown camera fields"):
        scene_io.camera_from_dict({"image_width": 10, "shutter": 0.1})


def test_material_codes_covered():
    # every material code must serialize (a new material without a tag
    # would silently break scene export)
    from distributed_raytracer_tpu.models import scene as sc

    codes = {
        getattr(sc, n)
        for n in ("LAMBERTIAN", "METAL", "DIELECTRIC", "ABSORB", "TRANSPARENT")
    }
    assert codes == set(scene_io._MAT_NAMES)


def test_render_scene_file_golden(tmp_path):
    """A NON-preset, user-authored scene rendered through the scan engine
    matches the independent numpy reference renderer."""
    from np_reference import NPScene, camera_np, render

    from distributed_raytracer_tpu.render.renderer import render_image

    scene = _custom_scene()
    cam = make_camera(
        aspect_ratio=2.0, image_width=48, samples_per_pixel=32, max_depth=8,
        vfov=60.0, lookfrom=(0.0, 0.3, 1.2), lookat=(0.0, 0.0, -1.0),
    )
    p = str(tmp_path / "custom.json")
    scene_io.save_scene(p, scene, cam)
    loaded, lcam = scene_io.load_scene(p)

    img = render_image(loaded, lcam, seed=5)
    ref = render(NPScene.from_scene(loaded), camera_np(lcam), spp=32,
                 max_depth=lcam.max_depth, seed=17)
    # independent RNG streams: agree to MC noise at 32 spp
    assert np.mean(np.abs(img - ref)) < 0.035


@pytest.mark.parametrize("engine", ["scan", "wavefront", "fused"])
def test_cli_render_scene_file_engines(tmp_path, engine, monkeypatch):
    """`render --scene file` produces an image through every engine."""
    if engine == "fused":
        # the fused kernel is TPU Mosaic; run it in the Pallas interpreter
        from jax.experimental.pallas import tpu as pltpu

        ctx = pltpu.force_tpu_interpret_mode()
    else:
        import contextlib

        ctx = contextlib.nullcontext()

    from distributed_raytracer_tpu.cli import main
    from distributed_raytracer_tpu.render.image import read_ppm

    scene = _custom_scene()
    cam = make_camera(aspect_ratio=2.0, image_width=32, samples_per_pixel=2,
                      max_depth=4)
    sp = str(tmp_path / "s.json")
    scene_io.save_scene(sp, scene, cam)
    out = str(tmp_path / f"{engine}.ppm")
    with ctx:
        main(["render", "--scene", sp, "--engine", engine, "--batch", "2",
              "--out", out])
    img = read_ppm(out)
    assert img.shape == (16, 32, 3) and np.isfinite(img).all()
    assert img.max() > 0.05  # not a black frame


def test_cli_export_then_render(tmp_path):
    """export-scene -> edit -> render --scene: the authoring loop."""
    from distributed_raytracer_tpu.cli import main
    from distributed_raytracer_tpu.render.image import read_ppm

    sp = str(tmp_path / "c1.json")
    main(["export-scene", "--config", "config1", sp])
    with open(sp) as f:
        d = json.load(f)
    assert d["format"] == scene_io.FORMAT and len(d["spheres"]) == 2
    # author an edit: recolor the small sphere
    d["spheres"][1]["albedo"] = [0.9, 0.1, 0.1]
    with open(sp, "w") as f:
        json.dump(d, f)
    out = str(tmp_path / "edited.ppm")
    main(["render", "--scene", sp, "--spp", "2", "--width", "32",
          "--out", out])
    img = read_ppm(out)
    assert np.isfinite(img).all() and img.max() > 0.05


def test_job_config_scene_path(tmp_path):
    from distributed_raytracer_tpu.utils.config import RenderJobConfig

    scene = _custom_scene()
    cam = make_camera(image_width=20, samples_per_pixel=3)
    sp = str(tmp_path / "s.json")
    scene_io.save_scene(sp, scene, cam)
    cfg = RenderJobConfig(scene_path=sp, spp=5)
    back = RenderJobConfig.from_json(cfg.to_json())
    s2, c2 = back.build()
    _assert_scene_equal(scene, s2)
    assert c2.samples_per_pixel == 5  # spp override still applies
