"""Scene serialization: user-authored scene files in and out.

The reference accepts arbitrary scenes at runtime: a client streams typed
sphere objects over the wire (`AddObject` carrying `Arc<dyn Hittable>`
with typetag's ``{"type": ...}`` polymorphic encoding —
messages.rs:41-94, client.rs:18-50, hittable.rs:25-28).  This module is
that capability as a file format: a scene (plus, optionally, an
initialized camera — the reference serializes the camera including its
derived fields, camera.rs:40 + client.rs:69) round-trips through JSON or
NPZ and feeds every engine via ``render --scene file``.

Two formats, chosen by extension:

- ``.json`` — human-authorable.  Each sphere is a typed object mirroring
  the reference's tag names::

      {"format": "dray-scene-v1",
       "camera": {...CameraConfig fields...},          # optional
       "spheres": [
         {"type": "lambertian", "center": [0,-100.5,-1], "radius": 100,
          "albedo": [0.8, 0.8, 0.0]},
         {"type": "metal", ..., "fuzz": 0.3},
         {"type": "dielectric", ..., "refraction_index": 1.5},
         {"type": "absorb", ...}, {"type": "transparent", ...}]}

- ``.npz`` — the SoA arrays verbatim (centers/radii/albedo/mat_type/
  fuzz/ior) for scenes too large for JSON; the optional camera rides
  along as a JSON string entry.

Build-time clamps (radius >= 0, sphere.rs:14; fuzz <= 1, material.rs:66)
are applied on load, so a hand-written file cannot construct states the
builder API forbids.
"""

from __future__ import annotations

import dataclasses
import json
from typing import Optional, Tuple

import jax.numpy as jnp
import numpy as np

from distributed_raytracer_tpu.models.scene import (
    ABSORB,
    DIELECTRIC,
    LAMBERTIAN,
    METAL,
    TRANSPARENT,
    Scene,
    SceneBuilder,
)
from distributed_raytracer_tpu.ops.camera import Camera, make_camera

FORMAT = "dray-scene-v1"

_MAT_NAMES = {
    LAMBERTIAN: "lambertian",
    METAL: "metal",
    DIELECTRIC: "dielectric",
    ABSORB: "absorb",
    TRANSPARENT: "transparent",
}
_MAT_CODES = {v: k for k, v in _MAT_NAMES.items()}


# ---------------------------------------------------------------------------
# camera <-> dict
# ---------------------------------------------------------------------------

def camera_to_dict(camera: Camera) -> dict:
    """CameraConfig-shaped dict (the full config surface, camera.rs:42-53)."""
    return {
        "aspect_ratio": camera.image_width / camera.image_height,
        "image_width": camera.image_width,
        "samples_per_pixel": camera.samples_per_pixel,
        "max_depth": camera.max_depth,
        "vfov": float(camera.vfov),
        "lookfrom": [float(x) for x in np.asarray(camera.lookfrom)],
        "lookat": [float(x) for x in np.asarray(camera.lookat)],
        "vup": [float(x) for x in np.asarray(camera.vup)],
        "defocus_angle": float(camera.defocus_angle),
        "focus_dist": float(camera.focus_dist),
    }


def camera_from_dict(d: dict) -> Camera:
    from distributed_raytracer_tpu.utils.config import CameraConfig

    known = {f.name for f in dataclasses.fields(CameraConfig)}
    unknown = set(d) - known
    if unknown:
        raise ValueError(f"unknown camera fields: {sorted(unknown)}")
    d = dict(d)
    for k in ("lookfrom", "lookat", "vup"):
        if k in d:
            d[k] = tuple(float(x) for x in d[k])
    return CameraConfig(**d).build()


# ---------------------------------------------------------------------------
# JSON
# ---------------------------------------------------------------------------

def scene_to_dict(
    scene: Scene, camera: Optional[Camera] = None, keep_padding: bool = False
) -> dict:
    """Scene (and optional camera) as a plain dict.

    Padding spheres (radius <= 0 with the ABSORB material — the build()
    pad convention) are dropped unless keep_padding; they are
    unreachable geometry, and the loader can re-pad with pad_to."""
    centers = np.asarray(scene.centers, np.float64)
    radii = np.asarray(scene.radii, np.float64)
    albedo = np.asarray(scene.albedo, np.float64)
    mat = np.asarray(scene.mat_type)
    fuzz = np.asarray(scene.fuzz, np.float64)
    ior = np.asarray(scene.ior, np.float64)

    spheres = []
    for i in range(centers.shape[0]):
        code = int(mat[i])
        if not keep_padding and radii[i] <= 0.0 and code == ABSORB:
            continue
        if code not in _MAT_NAMES:
            raise ValueError(f"sphere {i}: unknown material code {code}")
        s = {
            "type": _MAT_NAMES[code],
            "center": [float(x) for x in centers[i]],
            "radius": float(radii[i]),
        }
        if code in (LAMBERTIAN, METAL):
            s["albedo"] = [float(x) for x in albedo[i]]
        if code == METAL:
            s["fuzz"] = float(fuzz[i])
        if code == DIELECTRIC:
            s["refraction_index"] = float(ior[i])
        spheres.append(s)

    d = {"format": FORMAT, "spheres": spheres}
    if camera is not None:
        d["camera"] = camera_to_dict(camera)
    return d


def scene_to_json(
    scene: Scene, camera: Optional[Camera] = None, keep_padding: bool = False
) -> str:
    return json.dumps(scene_to_dict(scene, camera, keep_padding), indent=2)


def builder_from_dicts(spheres: list) -> SceneBuilder:
    """SceneBuilder from a list of typed sphere dicts — the AddObject
    ingestion path (object_server.rs:31-33) as an API."""
    b = SceneBuilder()
    for i, s in enumerate(spheres):
        try:
            kind = s["type"]
            center = tuple(float(x) for x in s["center"])
            if len(center) != 3:
                raise ValueError(f"center must have 3 components, got {len(center)}")
            radius = float(s["radius"])
        except KeyError as e:
            raise ValueError(f"sphere {i}: missing required field {e}") from None
        if kind == "lambertian":
            b.add_lambertian(center, radius, _color(s, i))
        elif kind == "metal":
            b.add_metal(center, radius, _color(s, i), float(s.get("fuzz", 0.0)))
        elif kind == "dielectric":
            b.add_dielectric(center, radius, float(s.get("refraction_index", 1.5)))
        elif kind == "absorb":
            b.add_absorbing(center, radius)
        elif kind == "transparent":
            b.add_transparent(center, radius)
        else:
            raise ValueError(
                f"sphere {i}: unknown type {kind!r}; "
                f"have {sorted(_MAT_CODES)}"
            )
    return b


def _color(s: dict, i: int) -> Tuple[float, float, float]:
    a = s.get("albedo", (1.0, 1.0, 1.0))
    t = tuple(float(x) for x in a)
    if len(t) != 3:
        raise ValueError(f"sphere {i}: albedo must have 3 components")
    return t


def scene_from_dict(
    d: dict, pad_to: Optional[int] = None
) -> Tuple[Scene, Optional[Camera]]:
    if d.get("format") != FORMAT:
        raise ValueError(
            f"not a {FORMAT} file (format={d.get('format')!r})"
        )
    spheres = d.get("spheres", [])
    if not spheres:
        raise ValueError("scene has no spheres")
    scene = builder_from_dicts(spheres).build(pad_to=pad_to)
    cam = camera_from_dict(d["camera"]) if "camera" in d else None
    return scene, cam


def scene_from_json(
    text: str, pad_to: Optional[int] = None
) -> Tuple[Scene, Optional[Camera]]:
    return scene_from_dict(json.loads(text), pad_to=pad_to)


# ---------------------------------------------------------------------------
# NPZ (bulk scenes)
# ---------------------------------------------------------------------------

def _scene_to_npz_dict(scene: Scene, camera: Optional[Camera]) -> dict:
    d = {
        "format": np.asarray(FORMAT),
        "centers": np.asarray(scene.centers, np.float32),
        "radii": np.asarray(scene.radii, np.float32),
        "albedo": np.asarray(scene.albedo, np.float32),
        "mat_type": np.asarray(scene.mat_type, np.int32),
        "fuzz": np.asarray(scene.fuzz, np.float32),
        "ior": np.asarray(scene.ior, np.float32),
    }
    if camera is not None:
        d["camera_json"] = np.asarray(json.dumps(camera_to_dict(camera)))
    return d


def _scene_from_npz(f, pad_to: Optional[int]) -> Tuple[Scene, Optional[Camera]]:
    if str(f["format"]) != FORMAT:
        raise ValueError(f"not a {FORMAT} npz (format={f['format']!r})")
    n = int(f["radii"].shape[0])
    m = pad_to if pad_to is not None else n
    if m < n:
        raise ValueError(f"pad_to={m} < num spheres {n}")
    pad = m - n

    def p2(x):  # [N,3]
        return np.pad(np.asarray(x, np.float32), ((0, pad), (0, 0)))

    def p1(x, fill, dt=np.float32):
        return np.pad(np.asarray(x, dt), (0, pad), constant_values=fill)

    scene = Scene(
        centers=jnp.asarray(p2(f["centers"])),
        radii=jnp.asarray(np.maximum(p1(f["radii"], 0.0), 0.0)),
        albedo=jnp.asarray(p2(f["albedo"])),
        mat_type=jnp.asarray(p1(f["mat_type"], ABSORB, np.int32)),
        fuzz=jnp.asarray(np.minimum(p1(f["fuzz"], 0.0), 1.0)),
        ior=jnp.asarray(p1(f["ior"], 1.0)),
    )
    cam = None
    if "camera_json" in getattr(f, "files", f):
        cam = camera_from_dict(json.loads(str(f["camera_json"])))
    return scene, cam


# ---------------------------------------------------------------------------
# file dispatch
# ---------------------------------------------------------------------------

def save_scene(path: str, scene: Scene, camera: Optional[Camera] = None) -> None:
    """Write a scene file; format chosen by extension (.json / .npz)."""
    if path.endswith(".npz"):
        np.savez(path, **_scene_to_npz_dict(scene, camera))
    elif path.endswith(".json"):
        with open(path, "w") as fh:
            fh.write(scene_to_json(scene, camera))
    else:
        raise ValueError(f"unknown scene extension (want .json or .npz): {path}")


def load_scene(
    path: str, pad_to: Optional[int] = None
) -> Tuple[Scene, Optional[Camera]]:
    """Read a scene file (.json or .npz); returns (scene, camera-or-None)."""
    if path.endswith(".npz"):
        with np.load(path) as f:
            return _scene_from_npz(f, pad_to)
    elif path.endswith(".json"):
        with open(path) as fh:
            return scene_from_json(fh.read(), pad_to=pad_to)
    raise ValueError(f"unknown scene extension (want .json or .npz): {path}")
