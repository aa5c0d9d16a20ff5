from distributed_raytracer_tpu.models.scene import (  # noqa: F401
    Scene,
    SceneBuilder,
    LAMBERTIAN,
    METAL,
    DIELECTRIC,
    ABSORB,
    TRANSPARENT,
)
from distributed_raytracer_tpu.models import presets  # noqa: F401
