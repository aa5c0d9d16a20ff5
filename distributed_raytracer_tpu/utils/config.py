"""Config system: dataclasses + env/CLI overrides.

The reference's "config system" is a handful of consts (config.rs:3-14) and
public struct fields assigned in code (main.rs:55-66).  Here every render is
described by a RenderJobConfig that can be built from presets, kwargs, or
CLI flags, and serialized alongside checkpoints for reproducibility.
"""

from __future__ import annotations

import dataclasses
import json
from typing import Optional, Tuple

from distributed_raytracer_tpu.models import presets
from distributed_raytracer_tpu.models.scene import Scene
from distributed_raytracer_tpu.ops.camera import Camera, make_camera


@dataclasses.dataclass
class CameraConfig:
    aspect_ratio: float = 1.0
    image_width: int = 100
    samples_per_pixel: int = 10
    max_depth: int = 10
    vfov: float = 90.0
    lookfrom: Tuple[float, float, float] = (0.0, 0.0, 0.0)
    lookat: Tuple[float, float, float] = (0.0, 0.0, -1.0)
    vup: Tuple[float, float, float] = (0.0, 1.0, 0.0)
    defocus_angle: float = 0.0
    focus_dist: float = 10.0

    def build(self) -> Camera:
        return make_camera(**dataclasses.asdict(self))


@dataclasses.dataclass
class RenderJobConfig:
    preset: Optional[str] = None      # config1..config5 or None for custom
    scene_path: Optional[str] = None  # scene file (models/scene_io.py); wins
                                      # over preset for the scene (and camera
                                      # when the file carries one)
    camera: CameraConfig = dataclasses.field(default_factory=CameraConfig)
    seed: int = 0
    scene_seed: int = 0
    spp: Optional[int] = None         # override camera.samples_per_pixel
    batch: int = 16                   # samples per device program
    tile_size: int = 32768
    checkpoint_path: Optional[str] = None
    checkpoint_every: int = 1
    output: Optional[str] = None      # .ppm path
    n_scene_shards: int = 1           # sphere-axis (object-server) sharding
    engine: str = "auto"              # auto | scan | wavefront | fused
    fill: str = "row"                 # row | shuffled (progressive fill order)

    def build(self) -> Tuple[Scene, Camera]:
        if self.scene_path:
            from distributed_raytracer_tpu.models.scene_io import load_scene

            scene, cam = load_scene(self.scene_path)
            if cam is None:
                cam = (presets.get_config(self.preset)[1] if self.preset
                       else self.camera.build())
        elif self.preset:
            scene, cam = presets.get_config(self.preset)
        else:
            raise ValueError(
                "custom scenes: set scene_path (scene_io file), a preset, "
                "or use the SceneBuilder API")
        if self.spp is not None:
            cam = cam.replace(samples_per_pixel=self.spp)
        return scene, cam

    def to_json(self) -> str:
        return json.dumps(dataclasses.asdict(self), indent=2)

    @classmethod
    def from_json(cls, s: str) -> "RenderJobConfig":
        d = json.loads(s)
        cam = d.pop("camera", None)
        cfg = cls(**d)
        if cam:
            cfg.camera = CameraConfig(**cam)
        return cfg
